"""Device-side (JAX/XLA) Lerc2 tile encoding.

TPU-first re-design of the reference's serial byte-cursor WriteTiles
(Lerc2.cpp:1475-1668): micro-blocks become the vector axis, the two-pass
"count then write" becomes stats -> quantize -> per-record sizes ->
exclusive scan -> gather assembly, all fixed-shape and jit-compiled.

Differences from the host encoder (both produce valid wire format):
  - no LUT block mode (simple bit-stuffing only; LUT wins mainly on
    segmented data and is a planned addition)
  - quantization runs in f32 with a +/-1 candidate fixup against the f32
    reconstruction instead of exact f64 (TPU has no fast f64); the error
    bound still holds to within a float cast, like the reference's own
    ENCODE_VERIFY tolerance (Lerc.cpp:1081-1211 uses maxZErr * 1.1)
  - micro block is always 8x8 (no 16x16 retrial yet)

The host wrapper (lerc_tpu.codec.device_codec) adds header/mask/ranges and
the Fletcher32 checksum.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DataType
from .pack_tables import MAX_BITS

MB = 8
BS = MB * MB  # 64 values per block

# per-record capacity upper bounds (uint8 columns in the record matrix)
_MAX_REC = {4: 1 + BS * 4, 2: 1 + BS * 2, 1: 1 + BS}
_PACK_BYTES = (BS * MAX_BITS + 7) // 8  # 248
_PACK_WORDS = (BS * MAX_BITS + 31) // 32  # 62


def _bit_len(x):
    """ceil(log2(x+1)) for uint32 x, exact integer arithmetic."""
    n = jnp.zeros(x.shape, jnp.int32)
    for i in range(MAX_BITS + 1):
        n = n + (x >> i > 0).astype(jnp.int32)
    return n


def _blockize(img, h, w):
    """[H, W] -> [nB, 64] padded; returns (blocks, nbv, nbh)."""
    nbv, nbh = -(-h // MB), -(-w // MB)
    padded = jnp.zeros((nbv * MB, nbh * MB), img.dtype).at[:h, :w].set(img)
    blocks = padded.reshape(nbv, MB, nbh, MB).transpose(0, 2, 1, 3).reshape(nbv * nbh, BS)
    return blocks, nbv, nbh


def _reduce_offset_float(zmin):
    """(tc, width) for a float32 block offset (Lerc2.h:493-499)."""
    is_int = (zmin == jnp.round(zmin)) & (jnp.abs(zmin) < 2.0**31)
    tc = jnp.where(
        is_int & (zmin >= 0) & (zmin <= 255), 2,
        jnp.where(is_int & (zmin >= -32768) & (zmin <= 32767), 1, 0),
    ).astype(jnp.int32)
    width = jnp.where(tc == 2, 1, jnp.where(tc == 1, 2, 4)).astype(jnp.int32)
    return tc, width


def _reduce_offset_int(zmin, dt: DataType):
    """(tc, width) for integer dtypes (Lerc2.h:457-492)."""
    z = zmin.astype(jnp.int32)
    fits_byte = (z >= 0) & (z <= 255)
    fits_char = (z >= -128) & (z <= 127)
    fits_short = (z >= -32768) & (z <= 32767)
    fits_ushort = (z >= 0) & (z <= 65535)
    if dt in (DataType.CHAR, DataType.BYTE):
        tc = jnp.zeros(z.shape, jnp.int32)
        width = jnp.ones(z.shape, jnp.int32)
    elif dt == DataType.SHORT:
        tc = jnp.where(fits_char, 2, jnp.where(fits_byte, 1, 0)).astype(jnp.int32)
        width = jnp.where(tc > 0, 1, 2).astype(jnp.int32)
    elif dt == DataType.USHORT:
        tc = jnp.where(fits_byte, 1, 0).astype(jnp.int32)
        width = jnp.where(tc > 0, 1, 2).astype(jnp.int32)
    elif dt == DataType.INT:
        tc = jnp.where(fits_byte, 3, jnp.where(fits_short, 2, jnp.where(fits_ushort, 1, 0))).astype(jnp.int32)
        width = jnp.where(tc == 3, 1, jnp.where(tc > 0, 2, 4)).astype(jnp.int32)
    elif dt == DataType.UINT:
        tc = jnp.where(fits_byte, 2, jnp.where(fits_ushort, 1, 0)).astype(jnp.int32)
        width = jnp.where(tc == 2, 1, jnp.where(tc == 1, 2, 4)).astype(jnp.int32)
    else:
        raise ValueError(dt)
    return tc, width


def _offset_bytes_float(zmin, tc):
    """4 LE bytes of the offset under its reduced dtype (unused lanes 0)."""
    as_u32 = jax.lax.bitcast_convert_type(zmin, jnp.uint32)
    as_i = jnp.round(zmin).astype(jnp.int32)
    u_byte = (as_i & 0xFF).astype(jnp.uint32)
    u_short = (as_i & 0xFFFF).astype(jnp.uint32)
    word = jnp.where(tc == 2, u_byte, jnp.where(tc == 1, u_short, as_u32))
    return jnp.stack([(word >> (8 * i)) & 0xFF for i in range(4)], axis=-1).astype(jnp.uint8)


def _offset_bytes_int(zmin, tc):
    word = zmin.astype(jnp.int32).astype(jnp.uint32)  # two's complement LE
    return jnp.stack([(word >> (8 * i)) & 0xFF for i in range(4)], axis=-1).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "d", "dt", "all_valid", "version", "cap"),
)
def encode_tiles(
    data,  # [H, W, D] float32 or int32
    mask,  # [H, W] bool (ignored when all_valid)
    max_z_error,  # f32 scalar; 0.5 for int lossless
    h: int,
    w: int,
    d: int,
    dt: DataType,
    all_valid: bool,
    version: int,
    cap: int,
):
    """Returns (out_bytes [cap] uint8, total_len, z_min_vec [D], z_max_vec [D])."""
    is_int = dt < DataType.FLOAT
    size_t = {DataType.CHAR: 1, DataType.BYTE: 1, DataType.SHORT: 2, DataType.USHORT: 2,
              DataType.INT: 4, DataType.UINT: 4, DataType.FLOAT: 4}[dt]
    max_rec = _MAX_REC[size_t]
    maxq_cap = float((1 << 15) - 1 if size_t <= 2 else (1 << 30) - 1)

    mze = max_z_error.astype(jnp.float32)
    scale = jnp.where(mze > 0, 1.0 / (2.0 * mze), 0.0).astype(jnp.float32)
    inv_scale = (2.0 * mze).astype(jnp.float32)
    int_lossless = is_int & (mze == 0.5)

    vb, nbv, nbh = _blockize(
        jnp.ones((h, w), bool) if all_valid else mask, h, w
    )
    n_blocks = nbv * nbh
    cnt = vb.sum(axis=1).astype(jnp.int32)  # [nB]

    # compaction permutation: valid positions first, stable. Even in the
    # all-valid case edge blocks need compaction (padding positions are
    # interleaved row-major when H or W is not a multiple of 8).
    if all_valid and h % MB == 0 and w % MB == 0:
        perm = jnp.broadcast_to(jnp.arange(BS, dtype=jnp.int32), (n_blocks, BS))
    else:
        perm = jnp.argsort(~vb, axis=1, stable=True).astype(jnp.int32)

    # per-block j0 for the integrity bits
    j0 = (jnp.arange(n_blocks, dtype=jnp.int32) % nbh) * MB
    integ = ((j0 >> 3) & 15) << 2
    if version >= 5:
        integ = integ & 0b111000

    rec_flag = []
    rec_len = []
    rec_off_bytes = []
    rec_off_w = []
    rec_nb = []
    rec_mode = []
    rec_packed = []
    rec_rawb = []
    z_min_out = []
    z_max_out = []

    for di in range(d):
        xb, _, _ = _blockize(data[:, :, di], h, w)  # native dtype blocks
        fb = xb.astype(jnp.float32)
        big = jnp.where(vb, fb, jnp.inf)
        small = jnp.where(vb, fb, -jnp.inf)
        zmin = jnp.where(cnt > 0, big.min(axis=1), 0.0)
        zmax = jnp.where(cnt > 0, small.max(axis=1), 0.0)
        # per-depth image range for the ranges section (exact dtype arithmetic)
        if is_int:
            xi32 = xb.astype(jnp.int32)
            z_min_out.append(jnp.where(vb, xi32, 2**31 - 1).min())  # int32, exact
            z_max_out.append(jnp.where(vb, xi32, -(2**31)).max())
        else:
            z_min_out.append(jnp.where(cnt > 0, big.min(axis=1), jnp.inf).min())
            z_max_out.append(jnp.where(cnt > 0, small.max(axis=1), -jnp.inf).max())

        # ---- quantize with fixup
        if is_int:
            xi = xb.astype(jnp.int32)
            zmin_i = jnp.where(cnt > 0, jnp.where(vb, xi, 2**31 - 1).min(axis=1), 0)
            q_ll = (xi - zmin_i[:, None]).astype(jnp.int32)
            # lossy int: f32 + fixup against integer reconstruction
            q0 = jnp.round((xi - zmin_i[:, None]).astype(jnp.float32) * scale).astype(jnp.int32)
            inv_i = jnp.round(inv_scale).astype(jnp.int32)
            best = q0
            best_err = jnp.abs(xi - (zmin_i[:, None] + q0 * inv_i))
            for delta in (-1, 1):
                qc = jnp.maximum(q0 + delta, 0)
                errc = jnp.abs(xi - (zmin_i[:, None] + qc * inv_i))
                best = jnp.where(errc < best_err, qc, best)
                best_err = jnp.minimum(errc, best_err)
            q = jnp.where(int_lossless, q_ll, best).astype(jnp.uint32)
            zmin = zmin_i.astype(jnp.float32)  # only used for mode heuristics
            zmin_store = zmin_i
        else:
            dx = fb - zmin[:, None]
            q0 = jnp.round(dx * scale)
            best = q0
            best_err = jnp.abs(fb - (zmin[:, None] + q0 * inv_scale))
            for delta in (-1.0, 1.0):
                qc = jnp.maximum(q0 + delta, 0.0)
                errc = jnp.abs(fb - (zmin[:, None] + qc * inv_scale))
                best = jnp.where(errc < best_err, qc, best)
                best_err = jnp.minimum(errc, best_err)
            q = jnp.clip(best, 0.0, 2.0**31).astype(jnp.uint32)
            zmin_store = zmin

        q = jnp.where(vb, q, 0)
        cq = jnp.take_along_axis(q, perm, axis=1)
        pos = jnp.broadcast_to(jnp.arange(BS, dtype=jnp.int32), (n_blocks, BS))
        cq = jnp.where(pos < cnt[:, None], cq, 0)  # zero the tail

        max_q = cq.max(axis=1)
        nb = _bit_len(max_q)

        # ---- mode selection (NumBytesTile semantics, no LUT)
        max_val = (zmax - zmin) * scale
        is_const0 = (cnt == 0) | ((zmin == 0) & (zmax == 0))
        force_raw = ((mze == 0) & (zmax > zmin)) | ((mze > 0) & (max_val > maxq_cap))

        if is_int:
            tc, off_w = _reduce_offset_int(zmin_store, dt)
            off_b = _offset_bytes_int(zmin_store, tc)
        else:
            tc, off_w = _reduce_offset_float(zmin)
            off_b = _offset_bytes_float(zmin, tc)

        cntw = jnp.where(cnt < 256, 1, 2).astype(jnp.int32)
        stuff_bytes = (cnt * nb + 7) // 8
        stuff_len = 1 + off_w + jnp.where(max_q > 0, 1 + cntw + stuff_bytes, 0)
        raw_len = 1 + cnt * size_t
        use_stuff = (~force_raw) & (stuff_len < raw_len)
        mode = jnp.where(
            is_const0, 2,
            jnp.where(use_stuff, jnp.where(max_q > 0, 1, 3), 0),
        ).astype(jnp.int32)
        length = jnp.where(
            mode == 2, 1, jnp.where(mode == 0, raw_len, stuff_len)
        ).astype(jnp.int32)

        flag = (integ | jnp.where(mode == 0, 0, jnp.where(mode == 2, 2, jnp.where(max_q > 0, 1, 3)))
                | jnp.where(mode == 2, 0, jnp.where(mode == 0, 0, tc << 6))).astype(jnp.uint8)

        # ---- packed payload as u32 words (LSB-first bitstream): each value
        # contributes (q << sh) to word bitpos>>5 and its spill to the next
        # word; contributions never overlap bits, so scatter-ADD assembles
        # the stream. Word-level arithmetic keeps shapes 2D (no 16x TPU
        # lane padding from bit-granular tensors).
        bitpos = jnp.arange(BS, dtype=jnp.int32)[None, :] * nb[:, None]
        w_idx = bitpos >> 5
        sh = (bitpos & 31).astype(jnp.uint32)
        lo = cq << sh
        spill = jnp.where(sh > 0, cq >> (jnp.uint32(32) - sh), 0)
        rows = jnp.arange(n_blocks, dtype=jnp.int32)[:, None] * _PACK_WORDS
        flat_lo = (rows + w_idx).ravel()
        flat_hi = (rows + w_idx + 1).ravel()
        guard = (w_idx + 1 < _PACK_WORDS).ravel()
        words = jnp.zeros(n_blocks * _PACK_WORDS, jnp.uint32)
        words = words.at[flat_lo].add(lo.ravel(), mode="drop")
        words = words.at[jnp.where(guard, flat_hi, n_blocks * _PACK_WORDS)].add(
            jnp.where(guard, spill.ravel(), 0), mode="drop"
        )
        packed = words.reshape(n_blocks, _PACK_WORDS)  # u32 words, not bytes

        # ---- raw payload bytes (compacted native values, LE)
        cx = jnp.take_along_axis(xb, perm, axis=1)
        if size_t == 4:
            if is_int:
                word = cx.astype(jnp.int32).astype(jnp.uint32)
            else:
                word = jax.lax.bitcast_convert_type(cx.astype(jnp.float32), jnp.uint32)
            lanes = jnp.stack([(word >> (8 * i)) & 0xFF for i in range(4)], axis=2)
            rawb = lanes.reshape(n_blocks, BS * 4).astype(jnp.uint8)
        elif size_t == 2:
            word = cx.astype(jnp.int32).astype(jnp.uint32)
            lanes = jnp.stack([(word >> (8 * i)) & 0xFF for i in range(2)], axis=2)
            rawb = lanes.reshape(n_blocks, BS * 2).astype(jnp.uint8)
        else:
            rawb = cx.astype(jnp.int32).astype(jnp.uint8).reshape(n_blocks, BS)

        rec_flag.append(flag)
        rec_len.append(length)
        rec_off_bytes.append(off_b)
        rec_off_w.append(off_w)
        rec_nb.append(nb)
        rec_mode.append(mode)
        rec_packed.append(packed)
        rec_rawb.append(rawb)

    # ---- interleave records block-major, depth inner: r = b*D + d
    def inter(parts):
        return jnp.stack(parts, axis=1).reshape((n_blocks * d,) + parts[0].shape[1:])

    flag = inter(rec_flag)
    length = inter(rec_len)
    off_b = inter(rec_off_bytes)
    off_w = inter(rec_off_w)
    nb = inter(rec_nb)
    mode = inter(rec_mode)
    packed = inter(rec_packed)
    rawb = inter(rec_rawb)
    cnt_r = jnp.repeat(cnt, d)
    cntw_r = jnp.where(cnt_r < 256, 1, 2).astype(jnp.int32)
    n_rec = n_blocks * d

    # ---- fill the record byte matrix
    col = jnp.arange(max_rec, dtype=jnp.int32)[None, :]
    off_w2 = off_w[:, None]
    mode2 = mode[:, None]
    cntw2 = cntw_r[:, None]
    has_stuff = (mode2 == 1)
    hdr_off_start = 1
    stuff_hdr_pos = 1 + off_w2
    cnt_pos = stuff_hdr_pos + 1
    pay_pos = jnp.where(mode2 == 0, 1, cnt_pos + cntw2)

    num_bits_byte = (nb | jnp.where(cntw_r == 1, 2, 1) << 6).astype(jnp.uint8)

    out = jnp.zeros((n_rec, max_rec), jnp.uint8)
    # flag byte
    out = jnp.where(col == 0, flag[:, None], out)
    # offset bytes (modes 1 and 3)
    off_sel = (mode2 % 2 == 1) & (col >= 1) & (col < 1 + off_w2)
    off_idx = jnp.clip(col - 1, 0, 3)
    out = jnp.where(off_sel, jnp.take_along_axis(off_b, off_idx, axis=1), out)
    # stuff header byte + count bytes
    out = jnp.where(has_stuff & (col == stuff_hdr_pos), num_bits_byte[:, None], out)
    cnt_bytes = jnp.stack([(cnt_r >> (8 * i)) & 0xFF for i in range(2)], axis=1).astype(jnp.uint8)
    cnt_sel = has_stuff & (col >= cnt_pos) & (col < cnt_pos + cntw2)
    out = jnp.where(cnt_sel, jnp.take_along_axis(cnt_bytes, jnp.clip(col - cnt_pos, 0, 1), axis=1), out)
    # packed payload: gather the u32 word, extract the byte lane
    pk_idx = jnp.clip(col - pay_pos, 0, _PACK_BYTES - 1)
    pk_sel = has_stuff & (col >= pay_pos) & (col < length[:, None])
    pk_word = jnp.take_along_axis(packed, pk_idx >> 2, axis=1)
    pk_byte = ((pk_word >> (8 * (pk_idx & 3)).astype(jnp.uint32)) & 0xFF).astype(jnp.uint8)
    out = jnp.where(pk_sel, pk_byte, out)
    # raw payload
    raw_sel = (mode2 == 0) & (col >= 1) & (col < length[:, None])
    raw_idx = jnp.clip(col - 1, 0, rawb.shape[1] - 1)
    out = jnp.where(raw_sel, jnp.take_along_axis(rawb, raw_idx, axis=1), out)

    # ---- assembly: exclusive scan + gather
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(length)[:-1].astype(jnp.int32)])
    total = starts[-1] + length[-1]
    p = jnp.arange(cap, dtype=jnp.int32)
    rid = jnp.clip(jnp.searchsorted(starts, p, side="right") - 1, 0, n_rec - 1)
    local = p - starts[rid]
    stream = out[rid, jnp.clip(local, 0, max_rec - 1)]
    stream = jnp.where(p < total, stream, 0)

    return stream, total, jnp.stack(z_min_out), jnp.stack(z_max_out)
