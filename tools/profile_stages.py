"""Stage-level profiling of the device codec on the real TPU.

block_until_ready does not block on this platform; measurements fetch a
dependent probe. back-to-back variants (xN) amortize the ~25ms tunnel RTT.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def timeit(name, fn, *args, reps=3, chain=1):
    out = fn(*args)
    fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(*args)
        fetch(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3/chain:9.1f} ms", flush=True)
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

    header, stream, meta, starts = timeit(
        "encode_fused (x4 chained)", codec.encode_fast, data, chain=4)

    ones = jnp.ones((TILE, TILE), bool)
    enc = lambda d: device_encode.encode_tiles(
        d, ones, jnp.float32(MZE), TILE, TILE, 1, DataType.FLOAT, True, 6, codec.cap)
    timeit("  encode_tiles (x4)", enc, data, chain=4)

    fl = lambda s, t: device_scan.fletcher32_device(header[54:], s, t)
    timeit("  fletcher32 (x4)", fl, stream, meta[0], chain=4)

    img, ok = timeit("decode_fused_fast (x4 chained)",
                     lambda h, s, st: codec.decode_fast(h, s, st),
                     header, stream, starts, chain=4)

    zmx = jnp.asarray([float(np.asarray(img).max())], np.float32)
    timeit("  decode_tiles_fast full (x4)",
           lambda s, st: device_decode.decode_tiles_fast(
               s, st, jnp.float32(MZE), zmx, TILE, TILE, 1, DataType.FLOAT, 6),
           stream, starts, chain=4)
    timeit("  decode_tiles_fast nb_cap=16 (x4)",
           lambda s, st: device_decode.decode_tiles_fast(
               s, st, jnp.float32(MZE), zmx, TILE, TILE, 1, DataType.FLOAT, 6,
               nb_cap=16),
           stream, starts, chain=4)

    # encode sub-stages at bench shapes
    n_rec = codec.n_rec
    vb = jnp.ones((n_rec, 64), bool)
    xb = jnp.asarray(rng.normal(1000, 50, (n_rec, 64)).astype(np.float32))

    def quantize(fb):
        zmin = fb.min(axis=1)
        dx = fb - zmin[:, None]
        scale = jnp.float32(1 / 0.002)
        inv = jnp.float32(0.002)
        q0 = jnp.round(dx * scale)
        best = q0
        best_err = jnp.abs(fb - (zmin[:, None] + q0 * inv))
        for delta in (-1.0, 1.0):
            qc = jnp.maximum(q0 + delta, 0.0)
            errc = jnp.abs(fb - (zmin[:, None] + qc * inv))
            best = jnp.where(errc < best_err, qc, best)
            best_err = jnp.minimum(errc, best_err)
        return jnp.clip(best, 0, 2.0**31).astype(jnp.uint32), zmin

    q, zmin = timeit("  quantize+fixup (x4)", jax.jit(quantize), xb, chain=4)
    nb = jnp.asarray(rng.integers(8, 15, n_rec).astype(np.int32))
    timeit("  pack matmul full (x4)",
           jax.jit(lambda cq, nb: device_encode._pack_words(cq, nb, n_rec, 63)),
           q, nb, chain=4)
    timeit("  pack matmul grouped (x4)",
           jax.jit(lambda cq, nb: device_encode._pack_words_grouped(cq, nb, n_rec, 33)),
           q, nb, chain=4)

    rec = jnp.asarray(rng.integers(0, 2**31, (n_rec, 67), dtype=np.uint32))
    lens = rng.integers(80, 140, n_rec).astype(np.int64)
    st = jnp.asarray((np.cumsum(lens) - lens).astype(np.int32))

    def assembly(rec, starts):
        q_ = starts >> 2
        lane = (q_ & 127)[:, None]
        rec256 = jnp.concatenate([rec, jnp.zeros((n_rec, 189), jnp.uint32)], axis=1)
        for b in range(7):
            rec256 = jnp.where((lane >> b) & 1 == 1, jnp.roll(rec256, 1 << b, axis=1), rec256)
        rows_idx = (q_ >> 7)[:, None] + jnp.arange(2, dtype=jnp.int32)[None, :]
        out2 = jnp.zeros((codec.cap // 512, 128), jnp.uint32)
        return out2.at[rows_idx].add(rec256.reshape(n_rec, 2, 128), mode="drop")

    timeit("  roll+rowscatter (x4)", jax.jit(assembly), rec, st, chain=4)

    def rollonly(rec, starts):
        lane = ((starts >> 2) & 127)[:, None]
        rec256 = jnp.concatenate([rec, jnp.zeros((n_rec, 189), jnp.uint32)], axis=1)
        for b in range(7):
            rec256 = jnp.where((lane >> b) & 1 == 1, jnp.roll(rec256, 1 << b, axis=1), rec256)
        return rec256

    timeit("  roll only (x4)", jax.jit(rollonly), rec, st, chain=4)

    print(f"total bytes: {int(np.asarray(meta)[0])}, cap {codec.cap}, n_rec {n_rec}")


if __name__ == "__main__":
    main()
