"""Randomized differential soak of the JS and C# binding decoders.

Random (shape, dtype, depth, bands, mask, maxZError, version, texture)
configs are reference-encoded; the blob is decoded by the reference C++
library, by js_sim (operator-exact twin of bindings/js/lerc.js) and by
cs_sim (statement-exact twin of bindings/csharp/LercDecode.cs). Any
valid-pixel disagreement stops the run with the blob saved to
/tmp/soak_bindings_bad.bin. The fixed conformance matrices
(tests/test_js_binding.py, tests/test_cs_binding.py) cover each wire
feature once; this harness covers their interactions.

  python tools/soak_bindings.py [seed] [seconds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bindings", "js"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bindings", "csharp"))

import numpy as np

import cs_sim
import js_sim
from tests import oracle

DTYPES = [np.int8, np.uint8, np.int16, np.uint16, np.int32, np.uint32,
          np.float32, np.float64]
DT_CODE = {np.int8: 0, np.uint8: 1, np.int16: 2, np.uint16: 3, np.int32: 4,
           np.uint32: 5, np.float32: 6, np.float64: 7}


def make_case(rng):
    h = int(rng.integers(8, 90))
    w = int(rng.integers(8, 90))
    d = int(rng.choice([1, 1, 1, 2, 3]))
    nb = int(rng.choice([1, 1, 1, 2, 3]))
    dt = DTYPES[int(rng.integers(0, 8))]
    kind = int(rng.integers(0, 5))
    x, y = np.meshgrid(np.linspace(0, rng.uniform(1, 12), w),
                       np.linspace(0, rng.uniform(1, 9), h))
    base = np.sin(x)[None, :, :, None] * np.cos(y)[None, :, :, None]
    base = np.broadcast_to(base, (nb, h, w, d)).copy()
    base *= rng.uniform(1, 1000)
    base += rng.standard_normal((nb, h, w, d)) * rng.uniform(0, 20)
    if kind == 1:  # segmented (LUT-friendly)
        base = np.floor(base / rng.uniform(10, 100)) * rng.uniform(5, 50)
    elif kind == 2:  # random-walk rows (Huffman-friendly for 8-bit)
        base = np.cumsum(rng.integers(-2, 3, base.shape), axis=2).astype(np.float64)
    elif kind == 3:  # constant / near-constant
        base = np.full(base.shape, rng.uniform(-100, 100))
        if rng.random() < 0.5:
            base += rng.integers(0, 2, base.shape) * rng.uniform(0, 0.001)
    if np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        arr = np.clip(np.round(base), info.min, info.max).astype(dt)
        mze = float(rng.choice([0.0, 0.0, 0.5, 1.0, 4.0]))
    else:
        arr = base.astype(dt)
        mze = float(rng.choice([0.0, 0.001, 0.01, 0.5]))
    mask = None
    mk = int(rng.integers(0, 4))
    if mk == 1:  # one shared mask
        mask = (rng.random((h, w)) > rng.uniform(0.05, 0.6)).astype(np.uint8)
        mask = np.broadcast_to(mask, (nb, h, w)).copy()
    elif mk == 2:  # per-band masks
        mask = (rng.random((nb, h, w)) > rng.uniform(0.05, 0.6)).astype(np.uint8)
    elif mk == 3 and rng.random() < 0.3:  # a fully-invalid band 0
        mask = np.ones((nb, h, w), np.uint8)
        mask[0] = 0
    version = int(rng.choice([-1, -1, -1, 2, 3, 4, 5, 6]))
    if d > 1 and version in (2, 3):
        version = -1  # depth>1 needs v>=4
    if mask is not None:
        arr = arr * mask[:, :, :, None].astype(arr.dtype)
    uses_nd = nd = None
    if version in (-1, 6) and rng.random() < 0.15:
        # noData passthrough (v6): poke noData holes into some bands
        ndv = float(rng.choice([-9999.0, 255.0, -1.0]))
        if np.issubdtype(arr.dtype, np.integer):
            ndv = float(np.clip(ndv, np.iinfo(arr.dtype).min,
                                np.iinfo(arr.dtype).max))
        uses_nd = rng.integers(0, 2, nb).astype(np.uint8)
        if uses_nd.sum() == 0:
            uses_nd[0] = 1
        nd = np.full(nb, ndv, np.float64)
        for b in range(nb):
            if uses_nd[b]:
                holes = rng.random((arr.shape[1], arr.shape[2])) < 0.05
                arr[b][holes] = arr.dtype.type(ndv)
    return arr, d, nb, mask, mze, version, uses_nd, nd


def run(seed, seconds):
    rng = np.random.default_rng(seed)
    t_end = time.time() + seconds
    n = 0
    while time.time() < t_end:
        arr, d, nb, mask, mze, version, uses_nd, nd = make_case(rng)
        h, w = arr.shape[1], arr.shape[2]
        try:
            blob = oracle.encode(arr.reshape(nb, h, w, d), d, w, h, nb,
                                 mask, mze, version=version,
                                 uses_nodata=uses_nd, nodata=nd)
        except RuntimeError:
            continue  # config the reference rejects (e.g. lossless f64 v<6)
        info = oracle.blob_info(blob)
        ref, masks, ref_uses_nd, ref_nd = oracle.decode(blob, info)
        n_masks = info["nMasks"]

        # --- js_sim
        got = js_sim.decode(blob, {"returnInterleaved": True})
        assert got["width"] == w and got["height"] == h
        for b in range(nb):
            exp = np.ascontiguousarray(ref[b]).reshape(-1)
            gp = np.asarray(got["pixels"][b])
            if n_masks > 0:
                m = np.repeat(masks[min(b, n_masks - 1)].reshape(-1).astype(bool), d)
                same = np.array_equal(gp[m], exp[m])
            else:
                same = np.array_equal(gp, exp)
            if not same:
                open("/tmp/soak_bindings_bad.bin", "wb").write(blob)
                raise SystemExit(f"JS mismatch seed={seed} case={n} band={b}")

        # --- cs_sim (always the 4D call: noData blobs with nDepth>1
        # require the passthrough arrays, like the reference C API)
        data = np.zeros(nb * h * w * d, DTYPES[info["dataType"]])
        pv = np.zeros(max(n_masks, 1) * h * w, np.uint8)
        cs_uses = np.zeros(nb, np.uint8)
        cs_nd = np.zeros(nb, np.float64)
        rc = cs_sim.lerc_decode_4D(blob, len(blob), n_masks,
                                   pv if n_masks else None, d, w, h, nb,
                                   info["dataType"], data, cs_uses, cs_nd)
        if rc != 0:
            open("/tmp/soak_bindings_bad.bin", "wb").write(blob)
            raise SystemExit(f"C# decode rc={rc} seed={seed} case={n}")
        if info["nUsesNoDataValue"] and d > 1:
            if not (np.array_equal(cs_uses, ref_uses_nd)
                    and np.array_equal(cs_nd, ref_nd)):
                open("/tmp/soak_bindings_bad.bin", "wb").write(blob)
                raise SystemExit(f"C# noData mismatch seed={seed} case={n}")
        got_cs = data.reshape(nb, h, w, d)
        if n_masks > 0:
            if not np.array_equal(pv.reshape(n_masks, h, w), masks):
                open("/tmp/soak_bindings_bad.bin", "wb").write(blob)
                raise SystemExit(f"C# mask mismatch seed={seed} case={n}")
        for b in range(nb):
            if n_masks > 0:
                m = masks[min(b, n_masks - 1)].astype(bool)
                same = np.array_equal(got_cs[b][m], ref[b][m])
            else:
                same = np.array_equal(got_cs[b], ref[b])
            if not same:
                open("/tmp/soak_bindings_bad.bin", "wb").write(blob)
                raise SystemExit(f"C# mismatch seed={seed} case={n} band={b}")
        n += 1
        if n % 50 == 0:
            print(f"{n} cases OK ({time.time() - t_end + seconds:.0f}s)", flush=True)
    print(f"soak PASS: {n} random configs, seed {seed}")
    return n


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 600
    run(seed, seconds)
