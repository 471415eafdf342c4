"""Microbench XLA primitives on the TPU (axon tunnel: block_until_ready does
not block, so every measurement fetches a dependent scalar; subtract rtt)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N_REC = 65536
CAP = 1 << 25
S = CAP


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0:1])


def timeit(name, fn, *args, reps=3):
    fetch(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {min(ts)*1e3:9.1f} ms", flush=True)


rng = np.random.default_rng(0)
stream = jnp.asarray(rng.integers(0, 256, S, dtype=np.uint8))
starts = jnp.asarray(np.sort(rng.integers(0, S, N_REC)).astype(np.int32))
lens = jnp.asarray(rng.integers(1, 257, N_REC).astype(np.int32))
vals = jnp.asarray(rng.integers(0, 2**20, (N_REC, 64), dtype=np.uint32))
nb = jnp.asarray(rng.integers(1, 25, N_REC).astype(np.int32))
recmat = jnp.asarray(rng.integers(0, 256, (N_REC, 257), dtype=np.uint8))
idx33 = jnp.asarray(rng.integers(0, S, S, dtype=np.int32))
k = jax.random.PRNGKey(0)
a = jax.random.normal(k, (8192, 8192), jnp.bfloat16)

timeit("rtt baseline (x[0]+1)", jax.jit(lambda x: x + 1), jnp.zeros(8))
timeit("matmul 8192^3 bf16 (1.1 TFLOP, ~5.6ms roofline)", jax.jit(lambda a: a @ a), a)
timeit("elementwise 33M u8 -> u32 <<,| (4 passes)", jax.jit(
    lambda s: (s.astype(jnp.uint32) << 8) | s.astype(jnp.uint32)), stream)
timeit("cumsum u32 over 33M", jax.jit(lambda x: jnp.cumsum(x.astype(jnp.uint32))), stream)
timeit("gather 33M from 33M (random u8)", jax.jit(lambda s, i: s[i]), stream, idx33)
timeit("gather 33M from 33M (random u8, clip)", jax.jit(
    lambda s, i: s[jnp.clip(i, 0, S - 1)]), stream, idx33)
timeit("gather [65K,64]x5 bytes from 33M", jax.jit(
    lambda s, st: sum(s[jnp.clip(st[:, None] + jnp.arange(64) * 4 + i, 0, S - 1)].astype(jnp.uint32) for i in range(5))), stream, starts)
timeit("searchsorted 33M queries in 65K table", jax.jit(
    lambda st: jnp.searchsorted(st, jnp.arange(S, dtype=jnp.int32), side="right")), starts)
timeit("scatter-ones 65K into 33M", jax.jit(
    lambda st: jnp.zeros(S, jnp.int32).at[st].add(1)), starts)
timeit("scatter-ones 65K into 33M + cumsum", jax.jit(
    lambda st: jnp.cumsum(jnp.zeros(S, jnp.int32).at[st].add(1))), starts)
timeit("scatter-add 4.2M u32 into 4.2M (rowwise)", jax.jit(
    lambda v: jnp.zeros(N_REC * 64, jnp.uint32).at[
        (jnp.arange(N_REC)[:, None] * 64 + (jnp.arange(64)[None, :] * 13 % 64)).ravel()
    ].add(v.ravel())), vals)
timeit("scatter-set 16.8M u8 into 33M (drop)", jax.jit(
    lambda m, st: jnp.zeros(S, jnp.uint8).at[
        jnp.where(jnp.arange(257)[None, :] < lens[:, None], st[:, None] + jnp.arange(257)[None, :], S).ravel()
    ].set(m.ravel(), mode="drop")), recmat, starts)
timeit("take_along_axis [65K,257]", jax.jit(
    lambda m: jnp.take_along_axis(m, (jnp.arange(257)[None, :] + jnp.zeros((N_REC, 1), jnp.int32)) % 257, axis=1)), recmat)
timeit("6x where-pass over [65K,257]", jax.jit(
    lambda m: m + jnp.where(m > 1, m, 1) + jnp.where(m > 2, m, 2) + jnp.where(m > 3, m, 3)
    + jnp.where(m > 4, m, 4) + jnp.where(m > 5, m, 5)), recmat)
timeit("cumsum u32 axis1 [65K,64]", jax.jit(lambda v: jnp.cumsum(v, axis=1)), vals)
timeit("i32 divide [65K,62]", jax.jit(
    lambda n: (32 * jnp.arange(62)[None, :] + n[:, None] - 1) // n[:, None]), nb)
E = jnp.asarray(rng.integers(0, S, S, dtype=np.int32))
def chain(E):
    def body(x, _):
        return E[x], x
    x, xs = jax.lax.scan(body, jnp.int32(0), None, length=1024)
    return xs
timeit("serial chain 1024 x 1-elem gather", jax.jit(chain), E)
timeit("J=J[J] doubling x16 over 33M", jax.jit(
    lambda J: jax.lax.fori_loop(0, 16, lambda i, J: J[jnp.clip(J, 0, S - 1)], J)), E)
