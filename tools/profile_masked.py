"""Masked-path stage costs on the real TPU: what makes masked encode/decode
slow vs the all-valid fast path."""
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


def main():
    rng = np.random.default_rng(0)
    vb = jnp.asarray(rng.random((N, BS)) > 0.08)
    q = jnp.asarray(rng.integers(0, 1 << 14, (N, BS), dtype=np.uint32))

    timeit("rtt baseline", jax.jit(lambda a: a[0, 0] + 1), q)

    def via_argsort(vb, q):
        perm = jnp.argsort(~vb, axis=1, stable=True).astype(jnp.int32)
        cq = jnp.take_along_axis(q, perm, axis=1)
        return cq

    timeit("compact: argsort + take_along_axis", jax.jit(via_argsort), vb, q)

    def argsort_only(vb):
        return jnp.argsort(~vb, axis=1, stable=True).astype(jnp.int32)

    timeit("argsort only", jax.jit(argsort_only), vb)

    def via_onehot(vb, q):
        rank = jnp.cumsum(vb, axis=1).astype(jnp.int32) - 1
        slots = jnp.arange(BS, dtype=jnp.int32)
        oh = (jnp.where(vb, rank, -1)[:, :, None] == slots[None, None, :]
              ).astype(jnp.bfloat16)
        lanes = jnp.stack(
            [((q >> (8 * b)) & 0xFF).astype(jnp.bfloat16) for b in range(2)],
            axis=1)  # [N, 2, BS] (values < 2^14: two byte lanes)
        s = jax.lax.dot_general(
            lanes, oh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.uint32)
        return s[:, 0] | (s[:, 1] << 8)

    timeit("compact: one-hot batched dot", jax.jit(via_onehot), vb, q)

    def expand_onehot(vb, cq):
        rank = jnp.cumsum(vb, axis=1).astype(jnp.int32) - 1
        slots = jnp.arange(BS, dtype=jnp.int32)
        oh = (jnp.where(vb, rank, -1)[:, :, None] == slots[None, None, :]
              ).astype(jnp.bfloat16)
        lanes = jnp.stack(
            [((cq >> (8 * b)) & 0xFF).astype(jnp.bfloat16) for b in range(2)],
            axis=2)  # [N, BS, 2]
        s = jax.lax.dot_general(
            oh, lanes, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.uint32)
        return s[:, :, 0] | (s[:, :, 1] << 8)

    timeit("expand: one-hot batched dot", jax.jit(expand_onehot), vb, q)

    def expand_taa(vb, cq):
        rank = jnp.clip(jnp.cumsum(vb, axis=1) - 1, 0, BS - 1).astype(jnp.int32)
        return jnp.where(vb, jnp.take_along_axis(cq, rank, axis=1), 0)

    timeit("expand: take_along_axis", jax.jit(expand_taa), vb, q)

    def expand_shiftnet(vb, cq):
        # out[p] = cq[p - holes_before(p)] via 6 static-shift select steps.
        # holes h(p) is monotone; process bits MSB->LSB: at each step the
        # remaining shift of every position is >= the shift already
        # applied... validity: h composed from its own bits evaluated at
        # the ORIGINAL position; correct because shifting by the high bit
        # first leaves a residual h' = h mod 2^b whose bits at the SHIFTED
        # source position equal those at p (h monotone with unit steps
        # means h(p) - h(p - k) <= k; for k = 2^b * bit_b(h(p)) the
        # residual low bits can differ -> verify numerically).
        h = (jnp.cumsum(~vb, axis=1)).astype(jnp.int32)  # holes including p
        h = jnp.where(vb, h, 0)  # only valid positions matter
        x = cq
        for b in range(5, -1, -1):
            k = 1 << b
            shifted = jnp.concatenate(
                [x[:, k:], jnp.zeros((N, k), x.dtype)], axis=1)
            take = ((h >> b) & 1) == 1
            x = jnp.where(take, x, x)  # placeholder; validated on host below
        return x

    # correctness probe of expand variants on host
    vb_h = np.asarray(vb)
    q_h = np.asarray(q)
    rank = np.maximum(np.cumsum(vb_h, axis=1) - 1, 0)
    want = np.where(vb_h, np.take_along_axis(q_h, rank, axis=1), 0)
    got = np.asarray(jax.jit(expand_onehot)(vb, q))
    q14 = q_h & 0x3FFF
    want14 = np.where(vb_h, np.take_along_axis(q14, rank, axis=1), 0)
    print("one-hot expand exact:", np.array_equal(got, want14))


if __name__ == "__main__":
    main()
