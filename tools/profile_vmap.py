"""Measure the vmap batching penalty of the fused resident codec.

bench.py runs 4 tiles as one vmapped call per phase; profile_stages
suggests per-tile sequential calls are much faster (batched row
scatter/gather under vmap lose indices_are_sorted / degrade to generic
scatters). Compare directly, plus a properly-chained fletcher32 timing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lerc_tpu.codec.resident import FusedResidentCodec
from lerc_tpu.ops import device_scan

TILE = 2048
MZE = 0.001


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0:1])


def timeit(name, fn, *args, reps=3, chain=8):
    out = fn(*args)
    fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(*args)
        fetch(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} {min(ts)*1e3/chain:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 20, TILE)[None, :]
    y = np.linspace(0, 15, TILE)[:, None]
    tiles_np = np.stack([
        (1500 * np.exp(-((x - 10) ** 2 + (y - 7) ** 2) / 20)
         + 50 * np.sin(x + s) * np.cos(y)
         + 0.5 * rng.standard_normal((TILE, TILE))).astype(np.float32)[:, :, None]
        for s in range(4)
    ])
    tiles = jnp.asarray(tiles_np)
    fetch(tiles)

    timeit("rtt/chain baseline", jax.jit(lambda a: a[0, 0, 0, 0] + 1), tiles)

    codec = FusedResidentCodec(TILE, TILE, 1, np.float32, MZE, nb_cap=16)
    enc_b = jax.jit(jax.vmap(codec._encode_fused))

    def dec_one(header, stream, starts):
        img, ok = codec._decode_fused_fast(header, stream, starts)
        return img, ok, img[0, 0, 0]

    dec_b = jax.jit(jax.vmap(dec_one))

    hs, ss, ms, sts = timeit("encode vmap x4 (per batch)", enc_b, tiles, chain=4)
    timeit("decode vmap x4 (per batch)", dec_b, hs, ss, sts, chain=4)

    h1, s1, m1, st1 = timeit("encode single tile", codec._encode_fused, tiles[0], chain=8)
    timeit("decode single tile", lambda *a: codec._decode_fused_fast(*a),
           h1, s1, st1, chain=8)

    def enc4_seq(tiles):
        outs = [codec._encode_fused(tiles[i]) for i in range(4)]
        return outs

    def dec4_seq(outs):
        return [codec._decode_fused_fast(h, s, st) for (h, s, m, st) in outs]

    outs = timeit("encode 4x sequential (per 4)", enc4_seq, tiles, chain=2)
    timeit("decode 4x sequential (per 4)", dec4_seq, outs, chain=2)

    timeit("fletcher32 (17.5MB cap)", device_scan.fletcher32_device,
           h1[54:], s1, m1[0], chain=8)


if __name__ == "__main__":
    main()
