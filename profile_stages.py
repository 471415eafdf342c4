"""Stage-level profiling of the device codec on the real TPU.

block_until_ready does not block on this platform; every measurement
fetches a dependent scalar/array probe to force completion.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lerc_tpu.codec.resident import FusedResidentCodec
from lerc_tpu.constants import DataType
from lerc_tpu.ops import device_decode, device_encode, device_scan

TILE = 2048
MZE = 0.001


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0:1])


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 20, TILE)[None, :]
    y = np.linspace(0, 15, TILE)[:, None]
    dem = (1500 * np.exp(-((x - 10) ** 2 + (y - 7) ** 2) / 20)
           + 50 * np.sin(x) * np.cos(y)
           + 0.5 * rng.standard_normal((TILE, TILE))).astype(np.float32)
    data = jnp.asarray(dem[:, :, None])
    fetch(data)

    timeit("rtt baseline", jax.jit(lambda a: a[0, 0, 0] + 1), data)

    codec = FusedResidentCodec(TILE, TILE, 1, np.float32, MZE)

    header, stream, meta, starts = timeit("encode_fused total", codec.encode_fast, data)

    ones = jnp.ones((TILE, TILE), bool)
    enc = lambda d: device_encode.encode_tiles(
        d, ones, jnp.float32(MZE), TILE, TILE, 1, DataType.FLOAT, True, 6, codec.cap)
    timeit("  encode_tiles", enc, data)

    fl = lambda s, t: device_scan.fletcher32_device(header[54:], s, t)
    timeit("  fletcher32_device", fl, stream, meta[0])

    img, ok = timeit("decode_fused_fast total",
                     lambda h, s, st: codec.decode_fast(h, s, st), header, stream, starts)

    zmx = jnp.asarray([float(np.asarray(img).max())], np.float32)
    timeit("  index_records_device",
           lambda s, st: device_decode.index_records_device(s, st, DataType.FLOAT, 6),
           stream, starts)
    timeit("  decode_tiles_fast",
           lambda s, st: device_decode.decode_tiles_fast(
               s, st, jnp.float32(MZE), zmx, TILE, TILE, 1, DataType.FLOAT, 6),
           stream, starts)

    print(f"total bytes: {int(np.asarray(meta)[0])}, cap {codec.cap}, n_rec {codec.n_rec}")


if __name__ == "__main__":
    main()
