"""Round-2 perf experiments on the real TPU.

Candidates measured against the round-1 kernels at bench shapes
(2048^2 f32 tile, 65536 records, nb ~ 8..14):

1. decode extract: static-per-nb select chain vs one-hot MXU dot.
   eff_nb has <= 17 distinct values; for a FIXED nb the word index and
   shift of every value are compile-time constants, so extraction is
   elementwise slices + shifts. A 17-way select chain trades the
   [nRec, 64, pw] one-hot dot (~300 MB traffic + bf16 conversions)
   for fused elementwise passes.
2. encode assembly: stride-64 window scatter. Scatter each record row
   into V[j] = out[64j : 64j+128] at lane q%64 (6 static rolls over 128
   lanes instead of 7 over 256), then combine out[64j+t] =
   V[j, t] + V[j-1, t+64] elementwise. Half the roll traffic, half the
   scatter rows vs the round-1 [2, 128]-span scatter.
3. encode pack: static-per-nb pack chain vs grouped one-hot pack.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lerc_tpu.ops import device_encode

BS = 64


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0:1])


def timeit(name, fn, *args, reps=3, chain=4):
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
# 1. decode extraction variants
# ---------------------------------------------------------------------------

def extract_onehot(win, eff_nb, n_rec, pw):
    """Round-1: one-hot MXU routing (device_decode.decode_tiles_fast body)."""
    nb_u = eff_nb[:, None].astype(jnp.uint32)
    mask_bits = jnp.where(
        nb_u >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << nb_u) - jnp.uint32(1)
    )
    bitpos = jnp.arange(BS, dtype=jnp.int32)[None, :] * eff_nb[:, None]
    m_idx = bitpos >> 5
    sh = (bitpos & 31).astype(jnp.uint32)
    wr = jnp.arange(pw, dtype=jnp.int32)
    oh = (m_idx[:, :, None] == wr[None, None, :]).astype(jnp.bfloat16)
    win_n = jnp.concatenate([win[:, 1:], jnp.zeros((n_rec, 1), jnp.uint32)], axis=1)
    wl = jnp.stack(
        [((win >> (8 * b)) & 0xFF).astype(jnp.bfloat16) for b in range(4)]
        + [((win_n >> (8 * b)) & 0xFF).astype(jnp.bfloat16) for b in range(4)],
        axis=2,
    )
    s = jax.lax.dot_general(
        oh, wl, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint32)
    lo = jnp.zeros((n_rec, BS), jnp.uint32)
    hi = jnp.zeros((n_rec, BS), jnp.uint32)
    for b in range(4):
        lo = lo | (s[:, :, b] << (8 * b))
        hi = hi | (s[:, :, 4 + b] << (8 * b))
    return ((lo >> sh) | jnp.where(sh > 0, hi << (jnp.uint32(32) - sh), 0)) & mask_bits


def extract_static(win, eff_nb, n_rec, pw, max_nb=16):
    """Static-per-nb select chain."""
    winx = jnp.concatenate([win, jnp.zeros((n_rec, 1), jnp.uint32)], axis=1)
    out = jnp.zeros((n_rec, BS), jnp.uint32)
    for nb in range(1, max_nb + 1):
        cols_lo = [(j * nb) >> 5 for j in range(BS)]
        shs = [(j * nb) & 31 for j in range(BS)]
        mask = jnp.uint32(0xFFFFFFFF if nb >= 32 else (1 << nb) - 1)
        vals = []
        for j in range(BS):
            v = winx[:, cols_lo[j]] >> jnp.uint32(shs[j])
            if shs[j] and shs[j] + nb > 32:
                v = v | (winx[:, cols_lo[j] + 1] << jnp.uint32(32 - shs[j]))
            vals.append(v & mask)
        cand = jnp.stack(vals, axis=1)
        out = jnp.where(eff_nb[:, None] == nb, cand, out)
    return out


def extract_static32(win, eff_nb, n_rec, pw):
    """Raw mode (nb=32) on top of the static chain."""
    out = extract_static(win, eff_nb, n_rec, pw, max_nb=16)
    w32 = win[:, :BS] if win.shape[1] >= BS else jnp.concatenate(
        [win, jnp.zeros((n_rec, BS - win.shape[1]), jnp.uint32)], axis=1)
    return jnp.where(eff_nb[:, None] == 32, w32, out)


# ---------------------------------------------------------------------------
# 2. encode assembly variants
# ---------------------------------------------------------------------------

def assembly_r1(rec, starts, n_rec, rec_w, cap_w):
    """Round-1: byte shift -> 7-step roll over 256 -> 2 span scatters."""
    sh = starts & 3
    shifted = device_encode._shift_words_1b(rec, 0)
    for k in (1, 2, 3):
        shifted = jnp.where((sh == k)[:, None], device_encode._shift_words_1b(rec, k), shifted)
    q = starts >> 2
    span = rec_w + 1
    lane = (q & 127)[:, None]
    rec128 = jnp.concatenate([shifted, jnp.zeros((n_rec, 128 - span), jnp.uint32)], axis=1)
    for b in range(5):
        rec128 = jnp.where((lane >> b) & 1 == 1, jnp.roll(rec128, 1 << b, axis=1), rec128)
    rec256 = jnp.concatenate([rec128, jnp.zeros((n_rec, 128), jnp.uint32)], axis=1)
    for b in (5, 6):
        rec256 = jnp.where((lane >> b) & 1 == 1, jnp.roll(rec256, 1 << b, axis=1), rec256)
    r_row = q >> 7
    spans = rec256.reshape(n_rec, 2, 128)
    out2 = jnp.zeros((cap_w // 128, 128), jnp.uint32)
    for k in range(2):
        out2 = out2.at[r_row + k].add(spans[:, k], mode="drop", indices_are_sorted=True)
    return out2


def assembly_stride64(rec, starts, n_rec, rec_w, cap_w):
    """Stride-64 window scatter: 6 rolls over 128 lanes, 1 row scatter,
    elementwise combine. Requires rec_w + 1 + 63 <= 128."""
    span = rec_w + 1
    assert span + 63 <= 128
    sh = starts & 3
    shifted = device_encode._shift_words_1b(rec, 0)
    for k in (1, 2, 3):
        shifted = jnp.where((sh == k)[:, None], device_encode._shift_words_1b(rec, k), shifted)
    q = starts >> 2
    lane = (q & 63)[:, None]
    rec128 = jnp.concatenate([shifted, jnp.zeros((n_rec, 128 - span), jnp.uint32)], axis=1)
    for b in range(6):
        rec128 = jnp.where((lane >> b) & 1 == 1, jnp.roll(rec128, 1 << b, axis=1), rec128)
    n_vrow = cap_w // 64 + 2
    v = jnp.zeros((n_vrow, 128), jnp.uint32)
    v = v.at[q >> 6].add(rec128, mode="drop", indices_are_sorted=True)
    # out[64j + t] = v[j, t] + v[j-1, t+64]
    out = v[: cap_w // 64, :64] + jnp.concatenate(
        [jnp.zeros((1, 64), jnp.uint32), v[: cap_w // 64 - 1, 64:]], axis=0
    )
    return out


# ---------------------------------------------------------------------------
# 3. encode pack variants
# ---------------------------------------------------------------------------

def pack_static(cq, nb, n_rec, pw, max_nb=16):
    """Static-per-nb pack: for fixed nb every value's target word/shift is
    constant; accumulate per word with ors, select by record nb."""
    out = jnp.zeros((n_rec, pw), jnp.uint32)
    for nbv in range(1, max_nb + 1):
        words = []
        for wi in range((BS * nbv + 31) // 32):
            acc = None
            for j in range(BS):
                lo_bit = j * nbv
                if lo_bit + nbv <= wi * 32 or lo_bit >= (wi + 1) * 32:
                    continue
                bit = lo_bit - wi * 32
                if bit >= 0:
                    t = cq[:, j] << jnp.uint32(bit)
                else:
                    t = cq[:, j] >> jnp.uint32(-bit)
                acc = t if acc is None else (acc | t)
            words.append(acc)
        cand = jnp.stack(words, axis=1)
        if cand.shape[1] < pw:
            cand = jnp.concatenate(
                [cand, jnp.zeros((n_rec, pw - cand.shape[1]), jnp.uint32)], axis=1)
        out = jnp.where(nb[:, None] == nbv, cand, out)
    return out


def main():
    rng = np.random.default_rng(0)
    n_rec = 65536
    pw = 33

    timeit("rtt baseline", jax.jit(lambda a: a[0, 0] + 1), jnp.zeros((8, 8)))

    # realistic decode windows: random payload + nb in [8, 14]
    win = jnp.asarray(rng.integers(0, 2**32, (n_rec, pw), dtype=np.uint32))
    nb = jnp.asarray(rng.integers(8, 15, n_rec).astype(np.int32))

    e1 = timeit("decode extract one-hot dot", jax.jit(
        lambda w, n: extract_onehot(w, n, n_rec, pw)), win, nb)
    e2 = timeit("decode extract static chain", jax.jit(
        lambda w, n: extract_static(w, n, n_rec, pw)), win, nb)
    ok = np.array_equal(np.asarray(e1), np.asarray(e2))
    print(f"  extract variants agree: {ok}")

    # encode assembly at capped record width (rec_w=35 for nb_cap=16)
    rec_w = 35
    cap_w = (2048 * 2048 * 4 + 65536 * 12 + 4096) // 4
    cap_w = -(-cap_w // 128) * 128
    rec = jnp.asarray(rng.integers(0, 2**32, (n_rec, rec_w), dtype=np.uint32))
    lens = rng.integers(80, 136, n_rec).astype(np.int64)
    st = jnp.asarray((np.cumsum(lens) - lens).astype(np.int32))
    # tail-mask records to their lengths so variants agree bytewise
    jb = jnp.arange(rec_w, dtype=jnp.int32)[None, :] * 4
    keep = jnp.clip(jnp.asarray(lens.astype(np.int32))[:, None] - jb, 0, 4)
    bmask = jnp.where(keep >= 4, jnp.uint32(0xFFFFFFFF),
                      (jnp.uint32(1) << (jnp.uint32(8) * keep.astype(jnp.uint32))) - 1)
    rec = rec & bmask

    a1 = timeit("encode assembly r1 (roll256 + 2 scatters)", jax.jit(
        lambda r, s: assembly_r1(r, s, n_rec, rec_w, cap_w)), rec, st)
    a2 = timeit("encode assembly stride64", jax.jit(
        lambda r, s: assembly_stride64(r, s, n_rec, rec_w, cap_w)), rec, st)
    o1 = np.asarray(a1).reshape(-1)[: cap_w]
    o2 = np.asarray(a2).reshape(-1)[: cap_w]
    print(f"  assembly variants agree: {np.array_equal(o1, o2)}")

    # encode pack
    nb_np = np.asarray(nb)
    cq_np = rng.integers(0, 2**14, (n_rec, BS), dtype=np.uint32)
    cqm = jnp.asarray(cq_np & (((1 << nb_np) - 1).astype(np.uint32))[:, None])
    p1 = timeit("encode pack grouped one-hot", jax.jit(
        lambda c, n: device_encode._pack_words_grouped(c, n, n_rec, pw)), cqm, nb)
    p2 = timeit("encode pack static chain", jax.jit(
        lambda c, n: pack_static(c, n, n_rec, pw)), cqm, nb)
    print(f"  pack variants agree: {np.array_equal(np.asarray(p1), np.asarray(p2))}")


if __name__ == "__main__":
    main()
