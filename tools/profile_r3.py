"""Round-3 TPU measurement session (run when the tunnel is back).

Order matters: bench.py FIRST (banks the driver numbers + warms
.jax_cache), then the exploratory measurements. Every timed fetch is a
dependent scalar (block_until_ready does not wait on this tunnel).

  python tools/profile_r3.py            # everything
  python tools/profile_r3.py foreign    # just the foreign-blob decode
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _t(fn, n=3):
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def foreign_huffman():
    """Foreign 8-bit blob end-to-end: native scan (host) + device decode."""
    import jax.numpy as jnp

    from lerc_tpu.codec import device_codec, huffman as hh
    from lerc_tpu import native

    rng = np.random.default_rng(1)
    h = w = 2048
    img = (np.cumsum(rng.integers(-2, 3, h * w)).astype(np.int64) % 200
           ).astype(np.uint8).reshape(h, w)
    blob = device_codec.encode_band_device(img[:, :, None].copy(), None, 0.5)
    buf = np.frombuffer(blob, np.uint8)
    # warm
    out = device_codec.decode_band_device(buf)
    assert out is not None and np.array_equal(np.asarray(out.data)[:, :, 0], img)
    dt = _t(lambda: device_codec.decode_band_device(buf))
    print(f"foreign 8-bit {h}x{w}: {h * w / dt / 1e6:.0f} Mpx/s "
          f"({h * w / dt / 1e6:.0f} MB/s) end-to-end")


def mosaic():
    from lerc_tpu.parallel.sharding import MosaicEncoder, decode_mosaic_device, make_mesh

    mesh = make_mesh(1)
    h = w = 4096
    x, y = np.meshgrid(np.linspace(0, 20, w), np.linspace(0, 15, h))
    data = (1500 * np.exp(-((x - 10) ** 2 + (y - 7) ** 2) / 20)
            + 0.5 * np.random.default_rng(0).standard_normal((h, w))
            ).astype(np.float32)[:, :, None]
    enc = MosaicEncoder(mesh, 2048, 2048, np.float32, n_depth=1)
    blob = enc.encode(data, None, 0.001)
    decode_mosaic_device(blob)  # warm
    dt = _t(lambda: decode_mosaic_device(blob))
    mb = h * w * 4 / 1e6
    print(f"mosaic batched decode {h}x{w}: {mb / dt:.0f} MB/s")


def decode_breakdown():
    """Split decode_tiles_fast cost: full decode vs gather-only variant
    (informs the pair-gather / sw=32 decision, CLAUDE.md round-3 note)."""
    import jax
    import jax.numpy as jnp

    from lerc_tpu.codec.resident import FusedResidentCodec

    h = w = 2048
    x, y = np.meshgrid(np.linspace(0, 20, w), np.linspace(0, 15, h))
    data = (1500 * np.exp(-((x - 10) ** 2 + (y - 7) ** 2) / 20)
            + 0.5 * np.random.default_rng(0).standard_normal((h, w))
            ).astype(np.float32)[:, :, None]
    for nb_cap in (0, 16):
        codec = FusedResidentCodec(h, w, 1, np.float32, 0.001, nb_cap=nb_cap)
        out = codec._encode_fused(jnp.asarray(data))
        if nb_cap and not bool(np.asarray(out[2])[2]):
            print(f"nb_cap={nb_cap}: data does not fit, skipped")
            continue
        dec = codec._decode_fused_fast(out[0], out[1], out[3])
        np.asarray(dec[1])
        CH = 10
        def run():
            for _ in range(CH):
                d2 = codec._decode_fused_fast(out[0], out[1], out[3])
            np.asarray(d2[1])
        dt = _t(run) / CH
        print(f"decode nb_cap={nb_cap}: {h * w * 4 / 1e6 / dt:.0f} MB/s")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "bench"):
        print("== run `python bench.py` FIRST (driver numbers + cache) ==")
    if which in ("all", "foreign"):
        foreign_huffman()
    if which in ("all", "mosaic"):
        mosaic()
    if which in ("all", "breakdown"):
        decode_breakdown()


if __name__ == "__main__":
    main()
