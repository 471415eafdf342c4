"""Compare bit-pack / assembly strategies on the TPU at bench shapes."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 65536
BS = 64
PW = 63
REC_W = 67
CAP_W = 17567744 // 4


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0:1])


def timeit(name, fn, *args, reps=3):
    fetch(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {min(ts)*1e3:9.1f} ms", flush=True)


rng = np.random.default_rng(0)
nb = jnp.asarray(rng.integers(8, 15, N).astype(np.int32))
cq = jnp.asarray(rng.integers(0, 1 << 14, (N, BS), dtype=np.uint32))
rec = jnp.asarray(rng.integers(0, 2**31, (N, REC_W), dtype=np.uint32))
lens = rng.integers(80, 140, N).astype(np.int64)
starts = jnp.asarray((np.cumsum(lens) - lens).astype(np.int32))


def pack_scatter(cq, nb, sorted_flag):
    bitpos = jnp.arange(BS, dtype=jnp.int32)[None, :] * nb[:, None]
    w_idx = bitpos >> 5
    sh = (bitpos & 31).astype(jnp.uint32)
    lo = cq << sh
    spill = jnp.where(sh > 0, cq >> (jnp.uint32(32) - sh), 0)
    rows = jnp.arange(N, dtype=jnp.int32)[:, None] * PW
    flat_lo = (rows + w_idx).ravel()
    guard = (w_idx + 1 < PW).ravel()
    flat_hi = jnp.where(guard, (rows + w_idx + 1).ravel(), N * PW)
    words = jnp.zeros(N * PW, jnp.uint32)
    words = words.at[flat_lo].add(lo.ravel(), mode="drop",
                                  indices_are_sorted=sorted_flag)
    words = words.at[flat_hi].add(jnp.where(guard, spill.ravel(), 0), mode="drop",
                                  indices_are_sorted=sorted_flag)
    return words


def pack_matmul(cq, nb):
    """One-hot MXU pack: words = sum_v onehot(w_idx)[r,v,w] * contrib."""
    bitpos = jnp.arange(BS, dtype=jnp.int32)[None, :] * nb[:, None]
    w_idx = bitpos >> 5
    sh = (bitpos & 31).astype(jnp.uint32)
    lo = cq << sh
    spill = jnp.where(sh > 0, cq >> (jnp.uint32(32) - sh), 0)
    wr = jnp.arange(PW, dtype=jnp.int32)
    oh_lo = (w_idx[:, :, None] == wr[None, None, :]).astype(jnp.bfloat16)
    oh_hi = ((w_idx + 1)[:, :, None] == wr[None, None, :]).astype(jnp.bfloat16)
    out = jnp.zeros((N, PW), jnp.uint32)
    for b in range(4):
        lob = ((lo >> (8 * b)) & 0xFF).astype(jnp.bfloat16)
        spb = ((spill >> (8 * b)) & 0xFF).astype(jnp.bfloat16)
        s = jnp.einsum("rv,rvw->rw", lob, oh_lo,
                       preferred_element_type=jnp.float32)
        s = s + jnp.einsum("rv,rvw->rw", spb, oh_hi,
                           preferred_element_type=jnp.float32)
        out = out + (s.astype(jnp.uint32) << (8 * b))
    return out


def pack_selectsum(cq, nb):
    """For each word w: sum contributions via compare+where reduction."""
    bitpos = jnp.arange(BS, dtype=jnp.int32)[None, :] * nb[:, None]
    w_idx = bitpos >> 5
    sh = (bitpos & 31).astype(jnp.uint32)
    lo = cq << sh
    spill = jnp.where(sh > 0, cq >> (jnp.uint32(32) - sh), 0)
    cums_lo = jnp.cumsum(lo, axis=1)
    cums_sp = jnp.cumsum(spill, axis=1)
    zero = jnp.zeros((N, 1), jnp.uint32)
    S_lo = jnp.concatenate([zero, cums_lo], axis=1)  # S[v] = sum lo[:v]
    S_sp = jnp.concatenate([zero, cums_sp], axis=1)
    w = jnp.arange(PW, dtype=jnp.int32)[None, :]
    nb2 = nb[:, None]
    # values with w_idx == w are v in [ceil(32w/nb), ceil(32(w+1)/nb))
    v0 = jnp.clip((32 * w + nb2 - 1) // nb2, 0, BS)
    v1 = jnp.clip((32 * (w + 1) + nb2 - 1) // nb2, 0, BS)
    # spill into w comes from w_idx == w-1
    u0 = jnp.clip((32 * (w - 1) + nb2 - 1) // nb2, 0, BS)
    u1 = v0
    gl0 = jnp.take_along_axis(S_lo, v0, axis=1)
    gl1 = jnp.take_along_axis(S_lo, v1, axis=1)
    gs0 = jnp.take_along_axis(S_sp, u0, axis=1)
    gs1 = jnp.take_along_axis(S_sp, u1, axis=1)
    return (gl1 - gl0) + (gs1 - gs0)


def asm_scatter(rec, starts, sorted_flag):
    base = (starts >> 2)[:, None] + jnp.arange(REC_W, dtype=jnp.int32)[None, :]
    out = jnp.zeros(CAP_W, jnp.uint32)
    return out.at[base.ravel()].add(rec.ravel(), mode="drop",
                                    indices_are_sorted=sorted_flag)


timeit("pack scatter (unsorted)", jax.jit(lambda a, b: pack_scatter(a, b, False)), cq, nb)
timeit("pack scatter (sorted hint)", jax.jit(lambda a, b: pack_scatter(a, b, True)), cq, nb)
timeit("pack one-hot bf16 matmul", jax.jit(pack_matmul), cq, nb)
timeit("pack cumsum-diff + row gather", jax.jit(pack_selectsum), cq, nb)
a = jax.jit(lambda a, b: pack_scatter(a, b, False))(cq, nb).reshape(N, PW)
c = jax.jit(pack_matmul)(cq, nb)
d = jax.jit(pack_selectsum)(cq, nb)
print("matmul == scatter:", bool(jnp.array_equal(a, c)))
print("cumsum == scatter:", bool(jnp.array_equal(a, d)))

timeit("assembly scatter (unsorted)", jax.jit(lambda r, s: asm_scatter(r, s, False)), rec, starts)
timeit("assembly scatter (sorted hint)", jax.jit(lambda r, s: asm_scatter(r, s, True)), rec, starts)
