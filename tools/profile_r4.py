"""Round-4 masked-path kernel experiments (real TPU).

The r4 bench gap: masked encode 1357 vs unmasked 4247 MB/s (32%), masked
decode 1912 vs 4091 (47%). profile_masked.py showed the one-hot compact /
expand dots cost ~6.8 ms per 65536x64 tile -- the entire gap.

Candidate: LOG-SHIFT routing. Valid-lane compaction moves element i left
by d_i = i - rank_i; d is non-decreasing along the row, so routing bit j
of d (low to high, 6 rounds for 64 lanes) is collision-free:
a collision at round 2^j needs two valid elements whose invalid-gap
count d'-d >= orig'-orig, impossible with both valid (gap <= orig'-orig-1).
Each round is one static roll + selects. With a STATIC mask (the resident
codec's case) the per-round take/stay masks precompute on host, leaving
6 rolls + 6 selects of the value array -- vs a [N,64,64] bf16 one-hot dot
(compact) or a 64-step select chain (expand).

  python tools/profile_r4.py            # all experiments
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


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


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
    print(f"{name:52s} {min(ts)*1e3/chain:9.2f} ms", flush=True)
    return out


# ---------------------------------------------------------------------------
# log-shift compaction: dynamic (mask on device) and static (host masks)
# ---------------------------------------------------------------------------

def compact_logshift(vb, q):
    """Valid lanes of q compacted left, invalid slots zeroed."""
    lanes = jnp.arange(BS, dtype=jnp.int32)[None, :]
    rank = jnp.cumsum(vb, axis=1).astype(jnp.int32) - 1
    d = jnp.where(vb, lanes - rank, 0)
    v, dist, valid = q, d, vb
    for j in range(6):
        k = 1 << j
        sv = jnp.roll(v, -k, axis=1)
        sd = jnp.roll(dist, -k, axis=1)
        sva = jnp.roll(valid, -k, axis=1) & (lanes + k < BS)
        take = sva & (((sd >> j) & 1) == 1)
        stay = valid & (((dist >> j) & 1) == 0)
        v = jnp.where(take, sv, v)
        dist = jnp.where(take, sd, dist)
        valid = take | stay
    return jnp.where(valid, v, 0)


def precompute_routing(mask_np):
    """Host-side per-round (take, stay) masks for a static mask."""
    lanes = np.arange(BS, dtype=np.int32)[None, :]
    rank = np.cumsum(mask_np, axis=1).astype(np.int32) - 1
    d = np.where(mask_np, lanes - rank, 0)
    valid = mask_np.copy()
    dist = d.copy()
    takes, stays = [], []
    v_pos = None
    for j in range(6):
        k = 1 << j
        sd = np.roll(dist, -k, axis=1)
        sva = np.roll(valid, -k, axis=1) & (lanes + k < BS)
        take = sva & (((sd >> j) & 1) == 1)
        stay = valid & (((dist >> j) & 1) == 0)
        takes.append(take)
        stays.append(stay)
        dist = np.where(take, sd, dist)
        valid = take | stay
    return takes, stays, valid


def compact_static(q, takes, final_valid):
    v = q
    for j in range(6):
        k = 1 << j
        v = jnp.where(takes[j], jnp.roll(v, -k, axis=1), v)
    return jnp.where(final_valid, v, 0)


# expansion: value at slot rank[p] -> position p. The inverse circuit of
# compaction: replay the recorded compaction take-masks SHIFTED by k
# (destination i took from i+k forward => i+k takes from i inverted) in
# REVERSE round order. Guaranteed correct because the forward rounds are
# collision-free muxes -- reversing a mux circuit is exact.

def precompute_routing_expand(mask_np):
    takes, _stays, _fv = precompute_routing(mask_np)
    e_takes = [np.roll(t, 1 << j, axis=1) for j, t in enumerate(takes)]
    return e_takes, mask_np


def expand_static(cq, e_takes, mask):
    v = cq
    for j in range(5, -1, -1):
        k = 1 << j
        v = jnp.where(e_takes[j], jnp.roll(v, k, axis=1), v)
    return jnp.where(mask, v, 0)


# ---------------------------------------------------------------------------
# baselines from the current kernels
# ---------------------------------------------------------------------------

def compact_onehot(vb, q):
    rank = jnp.cumsum(vb, axis=1).astype(jnp.int32) - 1
    slots = jnp.arange(BS, dtype=jnp.int32)
    oh = (jnp.where(vb, rank, -1)[:, :, None] == slots[None, None, :]
          ).astype(jnp.bfloat16)
    lanes = jnp.stack(
        [((q >> (8 * b)) & 0xFF).astype(jnp.bfloat16) for b in range(4)], axis=2)
    out = jax.lax.dot_general(
        oh, lanes, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(jnp.uint32)
    acc = jnp.zeros(q.shape, jnp.uint32)
    for b in range(4):
        acc = acc | (out[:, :, b] << (8 * b))
    return acc


def expand_chain(vb, cq):
    rank = jnp.cumsum(vb, axis=1).astype(jnp.int32) - 1
    rank = jnp.where(vb, rank, -1)
    vex = jnp.zeros(cq.shape, jnp.uint32)
    for s in range(BS):
        vex = jnp.where(rank == s, cq[:, s : s + 1], vex)
    return jax.lax.optimization_barrier(vex)


def main():
    rng = np.random.default_rng(0)
    mask_np = rng.random((N, BS)) > 0.08
    vb = jnp.asarray(mask_np)
    q_np = rng.integers(0, 1 << 14, (N, BS), dtype=np.uint32)
    q = jnp.asarray(q_np)

    # ---- correctness first (numpy reference)
    want = np.zeros_like(q_np)
    cnts = mask_np.sum(axis=1)
    for r in range(256):  # spot rows
        want[r, : cnts[r]] = q_np[r, mask_np[r]]
    got = np.asarray(jax.jit(compact_logshift)(vb, q))
    assert np.array_equal(got[:256], want[:256]), "logshift compact WRONG"
    takes, _stays, fv = precompute_routing(mask_np)
    takes_d = [jnp.asarray(t) for t in takes]
    fv_d = jnp.asarray(fv)
    got2 = np.asarray(jax.jit(compact_static)(q, takes_d, fv_d))
    assert np.array_equal(got2[:256], want[:256]), "static compact WRONG"
    etakes, efv = precompute_routing_expand(mask_np)
    etakes_d = [jnp.asarray(t) for t in etakes]
    efv_d = jnp.asarray(efv)
    exp = np.asarray(jax.jit(expand_static)(jnp.asarray(got2), etakes_d, efv_d))
    want_x = np.where(mask_np, np.zeros_like(q_np), 0)
    for r in range(256):
        want_x[r][mask_np[r]] = q_np[r][mask_np[r]]
    assert np.array_equal(exp[:256], want_x[:256]), "static expand WRONG"
    print("correctness OK (compact dyn/static, expand static)")

    timeit("rtt baseline", jax.jit(lambda a: a[0, 0] + 1), q)
    timeit("compact: one-hot dot (current)", jax.jit(compact_onehot), vb, q)
    timeit("compact: log-shift dynamic", jax.jit(compact_logshift), vb, q)
    timeit("compact: log-shift static masks", jax.jit(compact_static), q,
           takes_d, fv_d)
    cq = jnp.asarray(got2)
    timeit("expand: select chain (current)", jax.jit(expand_chain), vb, cq)
    timeit("expand: log-shift static masks", jax.jit(expand_static), cq,
           etakes_d, efv_d)


if __name__ == "__main__":
    main()


# Pallas SOL pass (VERDICT r3 #8), measured 2026-08-19 via
# tools/profile_pallas.py on v5e behind the tunnel:
#   - dynamic sublane write+= (the bitstream-assembly primitive): 32 ms
#     for ONE 512-iteration program -- orders of magnitude off the XLA
#     stride-window scatter (whole 2048^2 encode = ~4.1 ms).
#   - pltpu.roll rejects dynamic (traced) shifts ("shift must be
#     non-negative"), so the per-record lane alignment must fall back to
#     the same 6-step static-roll select chain XLA already runs.
#   - the roll + dynamic-RMW assembly kernel fails remote compilation
#     outright (tpu_compile_helper HTTP 500).
# Conclusion: on this toolchain Pallas cannot express the codec's
# dynamic-offset bit-assembly any better than XLA's fused elementwise
# kernels; the one-hot-MXU / static-per-nb-chain / stride-window design
# is retained. (Same conclusion as the r2 probes, now with numbers.)
