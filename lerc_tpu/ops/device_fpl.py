"""Device-side fpl lossless float encoding (Lerc2 v6 "Analytical Raster
Compression", reference fpl_Lerc2Ext.cpp).

Pipeline (reference fpl_Lerc2Ext.cpp:458-464), re-designed for TPU:
  1. float transform of the bit pattern (elementwise, fpl_UnitTypes.cpp:39-81)
  2. predictor {none, delta1 rows, cross} and per-plane extra delta level
     0..MAX_DELTA chosen from SAMPLED rows (prime stride, like the
     reference's PRIME_MULT=7 block sampling) scored with Shannon-entropy
     estimates over nibble-matmul histograms -- a small, fast-compiling
     program (`fpl_choose_device`)
  3. full-size finalize (`fpl_finalize_device`, one variant per static
     predictor): split-field predictor, sequential byte-plane delta with a
     running select on the chosen level, exact full histograms, and an
     exact PackBits output-size computation from the run structure
     (cummax/cummin scans, no gathers)
  4. per-plane payloads: canonical Huffman packed with the one-hot MXU
     router from ops/device_huffman.py; PackBits-winning planes are
     encoded exactly on host from the fetched plane; raw/RLE-const
     fallbacks decided on host from the fetched histograms

Only the per-plane 256-symbol tree builds run on host (one ~4 KB fetch of
histograms + choices per image). Any method/predictor/level choice is
wire-valid -- decoders dispatch on the stored codes.

float64 stays on the host path (the split-field arithmetic needs u64).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import device_huffman

MAX_DELTA = 5
_MANT = jnp.uint32(0x007FFFFF)


def float_transform_dev(u):
    mant = u & _MANT
    ae = (u >> jnp.uint32(23)) & jnp.uint32(0xFF)
    sign = u >> jnp.uint32(31)
    return mant | (ae << jnp.uint32(24)) | (sign << jnp.uint32(23))


def split_sub_dev(a, b):
    """Split-field subtract: mantissa (23b) and exp+sign (9b) wrap
    independently (fpl_UnitTypes.cpp:83-113)."""
    am, ah = a & _MANT, a >> jnp.uint32(23)
    bm, bh = b & _MANT, b >> jnp.uint32(23)
    return ((am - bm) & _MANT) | (((ah - bh) & jnp.uint32(0x1FF)) << jnp.uint32(23))


def apply_predictor_dev(img, pred: int):
    """img [rows, cols] u32; pred 0/1/2 static."""
    if pred == 0:
        return img
    left = img[:, :-1]
    d1 = jnp.concatenate([img[:, :1], split_sub_dev(img[:, 1:], left)], axis=1)
    if pred == 1:
        return d1
    up = d1[:-1, :]
    return jnp.concatenate([d1[:1, :], split_sub_dev(d1[1:, :], up)], axis=0)


def _byte_deriv1(plane, lev: int):
    """One more derivative level: out[i] -= out[i-1] for i >= lev
    (set_derivative's inner step, fpl_Lerc2Ext restoreSequence inverse)."""
    n = plane.shape[0]
    prev = jnp.concatenate([jnp.zeros(lev, jnp.uint32), plane[lev - 1 : -1]])
    keep = jnp.arange(n, dtype=jnp.int32) < lev
    return jnp.where(keep, plane, (plane - prev) & 0xFF)


def _entropy_bits(hist):
    """Shannon size estimate in bits from a [256] u32 histogram
    (fpl_Compression.cpp:85-113)."""
    h = hist.astype(jnp.float32)
    total = h.sum()
    p = jnp.where(h > 0, h, 1.0)
    return jnp.where(h > 0, h * (jnp.log2(total) - jnp.log2(p)), 0.0).sum()


def packbits_size_device(plane):
    """PackBits output size of a flat byte plane (u32 lanes) from the run
    structure, gather-free (native cumulative scans). Mirrors the
    reference encodePackBits (fpl_EsriHuffman.cpp:83-165): repeat segments
    of 2..129 bytes cost 2; leftover singles become literal stretches of 1
    byte each plus one header per <=128-byte stretch (long-stretch header
    correction approximated by +lit//128 -- affects method choice only)."""
    n = plane.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    change = jnp.concatenate([jnp.ones(1, bool), plane[1:] != plane[:-1]])
    run_start = jax.lax.cummax(jnp.where(change, idx, 0))
    # min change index >= p, then shifted: next change strictly after p
    ncv = jnp.where(change, idx, n)
    rc = jnp.flip(jax.lax.cummin(jnp.flip(ncv)))
    next_change = jnp.concatenate([rc[1:], jnp.full(1, n, jnp.int32)])
    L = next_change - run_start  # per-position run length (no change inside runs)

    Ls = jnp.where(change, L, 0)  # evaluate per-run quantities at run starts
    segs = jnp.where(change, Ls // 129 + ((Ls % 129) >= 2), 0)
    lit_pos = (L % 129) == 1  # this position's run leaves a trailing literal
    lit = change & lit_pos
    lit_from_repeats = change & (L >= 130)
    prev_run_lit = jnp.concatenate([jnp.zeros(1, bool), lit_pos[:-1]])
    stretch_start = lit & (lit_from_repeats | ~prev_run_lit)

    lit_total = lit.sum()
    return (2 * segs.sum() + lit_total + stretch_start.sum()
            + lit_total // 128).astype(jnp.int32)


def _slice_shape(h, w, d):
    return (h * w, d) if d > 1 else (h, w)


@functools.partial(jax.jit, static_argnames=("h", "w", "d"))
def fpl_choose_device(data, h: int, w: int, d: int):
    """(pred i32, levels [4] i32) chosen from sampled rows (fast, small)."""
    words = jax.lax.bitcast_convert_type(data.astype(jnp.float32), jnp.uint32)
    words = float_transform_dev(words.reshape(-1))
    rows, cols = _slice_shape(h, w, d)
    img = words.reshape(rows, cols)
    # sample whole rows at a prime stride so row-delta structure survives
    target = max(1, (rows * cols) // (1 << 19))
    stride = 1
    for p in (1, 3, 7, 13, 31, 61, 127, 251):
        if p <= target:
            stride = p
    img = img[::stride, :]

    cands = [apply_predictor_dev(img, p).reshape(-1) for p in (0, 1, 2)]
    ests = []
    per_pred_levels = []
    for pi, t in enumerate(cands):
        max_delta_eff = 5 - (0 if pi == 0 else (1 if pi == 1 else 2))
        est = jnp.float32(0)
        levels_p = []
        for b in range(4):
            plane = (t >> (8 * b)) & 0xFF
            derivs = [plane]
            for k in range(1, MAX_DELTA + 1):
                derivs.append(_byte_deriv1(derivs[-1], k))
            es = jnp.stack([
                _entropy_bits(device_huffman.histogram256(
                    derivs[k][::7].astype(jnp.uint8)))
                if k <= max_delta_eff else jnp.inf
                for k in range(MAX_DELTA + 1)
            ])
            levels_p.append(jnp.argmin(es).astype(jnp.int32))
            est = est + es.min()
        ests.append(est)
        per_pred_levels.append(jnp.stack(levels_p))
    pred = jnp.argmin(jnp.stack(ests)).astype(jnp.int32)
    levels = jnp.where(
        pred == 0, per_pred_levels[0],
        jnp.where(pred == 1, per_pred_levels[1], per_pred_levels[2]),
    )
    return pred, levels


@functools.partial(jax.jit, static_argnames=("h", "w", "d", "pred"))
def fpl_finalize_device(data, levels, h: int, w: int, d: int, pred: int):
    """Full-size pass for a STATIC predictor: chosen-level byte planes,
    exact histograms, exact PackBits sizes.
    Returns (histos [4,256] u32, planes [4,N] u8, pb_sizes [4] i32)."""
    words = jax.lax.bitcast_convert_type(data.astype(jnp.float32), jnp.uint32)
    words = float_transform_dev(words.reshape(-1))
    rows, cols = _slice_shape(h, w, d)
    t = apply_predictor_dev(words.reshape(rows, cols), pred).reshape(-1)

    histos, planes, pb_sizes = [], [], []
    for b in range(4):
        plane = (t >> (8 * b)) & 0xFF
        final = plane
        cur = plane
        for k in range(1, MAX_DELTA + 1):
            cur = _byte_deriv1(cur, k)
            final = jnp.where(levels[b] == k, cur, final)
        histos.append(device_huffman.histogram256(final.astype(jnp.uint8)))
        pb_sizes.append(packbits_size_device(final))
        planes.append(final.astype(jnp.uint8))
    return jnp.stack(histos), jnp.stack(planes), jnp.stack(pb_sizes)


@functools.partial(jax.jit, static_argnames=("cap", "pwh"))
def fpl_pack_planes_device(planes, lens_codes, cap: int, pwh: int):
    """Batched Huffman packing of the 4 byte planes.

    planes [4, N] u8, lens_codes [4, 256, 5] f32 -> (streams [4, cap] u8,
    total_bits [4] i32, sbits [4, nGroups] i32). Planes whose host-side
    method is raw/const/PackBits are packed too (cheap) and simply
    ignored by the host."""
    return jax.vmap(
        lambda p, t: device_huffman.encode_stream_device(p, t, cap, pwh)
    )(planes, lens_codes)
