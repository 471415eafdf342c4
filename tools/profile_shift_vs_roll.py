"""Lane-shift implementation shootout for the log-shift compaction rounds
(r4): jnp.roll (rotation) vs concatenate-slice (true shift) vs
lax.pad+slice, measured standalone AND feeding a pack-like consumer --
the in-context masked encode pays ~2 ms more than the standalone
compaction suggests, suspected relayout/fusion boundary cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 65536
BS = 64


def timeit(name, fn, *args, reps=3, chain=16):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
        ts.append(time.perf_counter() - t0)
    print(f"{name:56s} {min(ts)*1e3/chain:9.2f} ms", flush=True)


def routing(vb, shift):
    lanes = jnp.arange(BS, dtype=jnp.int32)[None, :]
    rank = jnp.cumsum(vb, axis=1).astype(jnp.int32) - 1
    dist = jnp.where(vb, lanes - rank, 0)
    takes = []
    vcur = vb
    for j in range(6):
        k = 1 << j
        sd = shift(dist, k)
        sva = shift(vcur, k) & (lanes + k < BS)
        take = sva & (((sd >> j) & 1) == 1)
        stay = vcur & (((dist >> j) & 1) == 0)
        takes.append(take)
        dist = jnp.where(take, sd, dist)
        vcur = take | stay
    return takes, vcur


def compact(vb, q, shift):
    takes, vcur = routing(vb, shift)
    v = q
    for j, t in enumerate(takes):
        v = jnp.where(t, shift(v, 1 << j), v)
    return jnp.where(vcur, v, 0)


def sh_roll(a, k):
    return jnp.roll(a, -k, axis=1)


def sh_concat(a, k):
    pad = jnp.zeros((a.shape[0], k), a.dtype)
    return jnp.concatenate([a[:, k:], pad], axis=1)


def consumer(cq):
    """Pack-like consumer: per-record bit width + a select-chain reduce."""
    nb = 32 - jnp.clip(
        jax.lax.clz(jnp.maximum(cq.max(axis=1), 1).astype(jnp.uint32)), 0, 31)
    acc = jnp.zeros((cq.shape[0],), jnp.uint32)
    for s in range(0, BS, 8):
        acc = acc ^ (cq[:, s] << jnp.uint32(s & 31))
    return nb, acc


def main():
    rng = np.random.default_rng(0)
    vb = jnp.asarray(rng.random((N, BS)) > 0.08)
    q = jnp.asarray(rng.integers(0, 1 << 14, (N, BS), dtype=np.uint32))

    a = np.asarray(jax.jit(lambda: compact(vb, q, sh_roll))())
    b = np.asarray(jax.jit(lambda: compact(vb, q, sh_concat))())
    assert np.array_equal(a, b), "shift impls disagree"

    timeit("compact via jnp.roll", jax.jit(lambda: compact(vb, q, sh_roll)))
    timeit("compact via concat-shift", jax.jit(lambda: compact(vb, q, sh_concat)))
    timeit("compact+consumer via jnp.roll",
           jax.jit(lambda: consumer(compact(vb, q, sh_roll))))
    timeit("compact+consumer via concat-shift",
           jax.jit(lambda: consumer(compact(vb, q, sh_concat))))


if __name__ == "__main__":
    main()


# Measured 2026-08-19 (v5e): roll 2.24 ms vs concat-shift 2.37 ms
# standalone; 1.87 vs 1.81 ms fused into a pack-like consumer. No
# relayout penalty from lane rotations -- jnp.roll stays. (The residual
# ~2 ms masked-encode LUT interplay is therefore NOT a roll artifact.)
