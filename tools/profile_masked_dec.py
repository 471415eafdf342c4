"""Masked-vs-unmasked decode_tiles_fast gap on the real TPU (r4), with
the exact-f32 softfloat dequant toggled to apportion the cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lerc_tpu.constants import DataType
from lerc_tpu.ops import device_decode, device_encode, device_softf64 as sf

H = W = 2048
CHAIN = 32
MZE = 0.001


def timeit(name, fn, reps=3):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3 / CHAIN
    print(f"{name:52s} {ms:8.2f} ms  ({H*W*4/1e6/(ms/1e3):6.0f} MB/s)", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    x, y = np.meshgrid(np.linspace(0, 20, W), np.linspace(0, 15, H))
    data = (1500 * np.exp(-((x - 10) ** 2 + (y - 7) ** 2) / 20)
            + 0.5 * rng.standard_normal((H, W))).astype(np.float32)[:, :, None]
    mask = np.ones((H, W), bool)
    mask[300:800, 500:1500] = False
    mask[rng.random((H, W)) > 0.98] = False

    data_d = jnp.asarray(data)
    cap = 1 << 24
    inv = sf.decompose_scalar(2 * MZE)

    blobs = {}
    for name, m, av in (("full", jnp.ones((H, W), bool), True),
                        ("masked", jnp.asarray(mask), False)):
        stream, total, zmin, zmax, starts, fits = device_encode.encode_tiles(
            data_d, m, jnp.float32(MZE), H, W, 1, DataType.FLOAT, av, 6, cap,
            enable_lut=True, nb_cap=16)
        assert bool(np.asarray(fits))
        blobs[name] = (stream, starts, np.asarray(zmax).astype(np.float32),
                       None if av else m)

    for name in ("full", "masked"):
        stream, starts, zmax, m = blobs[name]
        for label, kw in (("exact f32", dict(inv_limbs=inv[0], inv_bexp=inv[1])),
                          ("f32 dequant", {})):
            fn = jax.jit(lambda s=stream, st=starts, zm=jnp.asarray(zmax),
                         mm=m, kw=kw: device_decode.decode_tiles_fast(
                             s, st, jnp.float32(MZE), zm, H, W, 1,
                             DataType.FLOAT, 6, nb_cap=16, mask=mm, **kw))
            timeit(f"decode {name} / {label}", fn)


if __name__ == "__main__":
    main()
