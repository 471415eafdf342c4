"""Device-side (JAX/XLA) Lerc2 tile decoding.

The host-side native scanner (lerc_tpu.native.tile_scan) resolves the serial
record-offset chain; everything else -- bit-unpack, LUT lookup, dequantize,
clamp, scatter back to the image -- is data-parallel and runs here as one
jit-compiled gather pipeline over [nRecords, 64] lanes.

Supported record modes: raw, bit-stuffed (simple + LUT), const-0,
const-offset. Depth-diff records (int lossless nDepth > 1) fall back to the
host decoder, flagged by the scanner.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DataType
from .pack_tables import MAX_BITS

MB = 8
BS = MB * MB


def _unpack_records(stream, payload_pos, num_bits, max_vals: int):
    """Gather-decode bit-stuffed values: [nRec] descriptors -> [nRec, max_vals].

    stream: [S] uint32 (byte values), payload_pos: absolute byte offsets.
    Value v's bits [v*nb, v*nb+nb) span at most 5 bytes; assemble them with
    five flat gathers and word-level shifts (keeps shapes 2D; avoids TPU
    lane padding of bit-granular tensors).
    """
    nb_u = num_bits[:, None].astype(jnp.uint32)
    bitpos = jnp.arange(max_vals, dtype=jnp.int32)[None, :] * num_bits[:, None]
    byte0 = payload_pos[:, None] + (bitpos >> 3)
    sh = (bitpos & 7).astype(jnp.uint32)
    smax = stream.shape[0] - 1
    acc = jnp.zeros(byte0.shape, jnp.uint32)
    for i in range(4):
        acc = acc | stream[jnp.clip(byte0 + i, 0, smax)] << jnp.uint32(8 * i)
    b4 = stream[jnp.clip(byte0 + 4, 0, smax)]
    lo = acc >> sh
    hi = jnp.where(sh > 0, b4 << (jnp.uint32(32) - sh), 0)
    mask_bits = jnp.where(
        nb_u >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << nb_u) - jnp.uint32(1)
    )
    return (lo | hi) & mask_bits


@functools.partial(
    jax.jit, static_argnames=("h", "w", "d", "dt", "all_valid", "has_lut")
)
def decode_tiles(
    stream,        # [S] uint8 tile-stream bytes (absolute offsets match scanner)
    mode,          # [nRec] int32 (0 raw, 1 stuff, 2 const0, 3 const-offset, 4 LUT)
    payload_pos,   # [nRec] int64/int32 absolute byte offset
    offset,        # [nRec] float32 block offset (zMin)
    num_bits,      # [nRec] int32
    num_elements,  # [nRec] int32
    lut_pos,       # [nRec] absolute LUT byte offset (mode 4)
    n_lut,         # [nRec] int32
    nbits_lut,     # [nRec] int32
    mask,          # [H, W] bool
    max_z_error,   # f32 scalar
    z_max_vec,     # [D] f32 clamp values
    h: int, w: int, d: int, dt: DataType, all_valid: bool, has_lut: bool,
):
    """Returns data [H, W, D] in the native dtype."""
    is_int = dt < DataType.FLOAT
    np_out = {DataType.CHAR: jnp.int8, DataType.BYTE: jnp.uint8,
              DataType.SHORT: jnp.int16, DataType.USHORT: jnp.uint16,
              DataType.INT: jnp.int32, DataType.UINT: jnp.uint32,
              DataType.FLOAT: jnp.float32}[dt]

    nbv, nbh = -(-h // MB), -(-w // MB)
    n_blocks = nbv * nbh
    n_rec = n_blocks * d
    inv_scale = (2.0 * max_z_error).astype(jnp.float32)

    stream_u32 = stream.astype(jnp.uint32)
    payload_pos = payload_pos.astype(jnp.int32)

    # effective validity per block position: real-image area and mask
    vmask_full = jnp.ones((h, w), bool) if all_valid else mask
    padded = jnp.zeros((nbv * MB, nbh * MB), bool).at[:h, :w].set(vmask_full)
    vb = padded.reshape(nbv, MB, nbh, MB).transpose(0, 2, 1, 3).reshape(n_blocks, BS)
    in_img = (
        jnp.zeros((nbv * MB, nbh * MB), bool).at[:h, :w].set(True)
        .reshape(nbv, MB, nbh, MB).transpose(0, 2, 1, 3).reshape(n_blocks, BS)
    )
    area = in_img.sum(axis=1).astype(jnp.int32)  # real pixels per block

    # per-record "use all real positions" flag (stuffed count == block area)
    area_r = jnp.repeat(area, d)
    fill_all = (mode % 8 == 1) | (mode % 8 == 4)
    use_all = fill_all & (num_elements == area_r)

    # value rank per position: over mask-valid (normal) or all real positions
    vb_r = jnp.repeat(vb, d, axis=0) if d > 1 else vb
    in_img_r = jnp.repeat(in_img, d, axis=0) if d > 1 else in_img
    eff_valid = jnp.where(use_all[:, None], in_img_r, vb_r & in_img_r)
    rank = jnp.cumsum(eff_valid, axis=1).astype(jnp.int32) - 1
    rank = jnp.clip(rank, 0, BS - 1)

    # ---- bit-stuffed values
    q = _unpack_records(stream_u32, payload_pos, num_bits, BS)
    if has_lut:
        idx = _unpack_records(stream_u32, payload_pos, nbits_lut, BS)
        lut_vals = _unpack_records(stream_u32, lut_pos.astype(jnp.int32), num_bits, 256)
        # full LUT = [0] + lut_vals
        lut_full = jnp.concatenate(
            [jnp.zeros((n_rec, 1), jnp.uint32), lut_vals[:, :255]], axis=1
        )
        q_lut = jnp.take_along_axis(lut_full, jnp.clip(idx, 0, 255).astype(jnp.int32), axis=1)
        q = jnp.where((mode[:, None] % 8) == 4, q_lut, q)

    qv = jnp.take_along_axis(q, rank, axis=1)  # value per position

    # ---- raw values + mode combine
    m8 = (mode % 8)[:, None]
    if not is_int:
        b0 = payload_pos[:, None] + rank * 4
        word = (
            stream_u32[jnp.clip(b0, 0, stream.shape[0] - 1)]
            | stream_u32[jnp.clip(b0 + 1, 0, stream.shape[0] - 1)] << 8
            | stream_u32[jnp.clip(b0 + 2, 0, stream.shape[0] - 1)] << 16
            | stream_u32[jnp.clip(b0 + 3, 0, stream.shape[0] - 1)] << 24
        )
        raw_vals = jax.lax.bitcast_convert_type(word.astype(jnp.uint32), jnp.float32)
        off2 = offset[:, None]
        zmax_r = jnp.tile(z_max_vec.astype(jnp.float32), n_blocks)[:, None]
        z_stuff = jnp.minimum(off2 + qv.astype(jnp.float32) * inv_scale, zmax_r)
        z = jnp.where(
            m8 == 0, raw_vals,
            jnp.where(m8 == 2, 0.0, jnp.where(m8 == 3, off2, z_stuff)),
        )
        write = jnp.where((m8 == 3) | (m8 == 0), vb_r & in_img_r, eff_valid)
        out_vals = jnp.where(write, z, 0.0).astype(np_out)
    else:
        # exact integer arithmetic (invScale and offsets are integral for ints)
        nbytes = np.dtype(np_out).itemsize
        b0 = payload_pos[:, None] + rank * nbytes
        word = jnp.zeros(b0.shape, jnp.uint32)
        for i in range(nbytes):
            word = word | stream_u32[jnp.clip(b0 + i, 0, stream.shape[0] - 1)] << (8 * i)
        if np_out in (jnp.int8, jnp.int16, jnp.int32):
            shift = 32 - 8 * nbytes
            raw_i = (word << shift).astype(jnp.int32) >> shift if shift else word.astype(jnp.int32)
        else:
            raw_i = word.astype(jnp.int32)
        off_i = offset.astype(jnp.int32)[:, None]  # caller passes exact int32 offsets
        inv_i = jnp.round(inv_scale).astype(jnp.int32)
        zmax_i = z_max_vec.astype(jnp.int32)
        zmax_i = jnp.tile(zmax_i, n_blocks)[:, None]
        z_stuff = jnp.minimum(off_i + qv.astype(jnp.int32) * inv_i, zmax_i)
        z = jnp.where(
            m8 == 0, raw_i,
            jnp.where(m8 == 2, 0, jnp.where(m8 == 3, off_i, z_stuff)),
        )
        write = jnp.where((m8 == 3) | (m8 == 0), vb_r & in_img_r, eff_valid)
        out_vals = jnp.where(write, z, 0).astype(np_out)

    # ---- scatter back: records [nB*d, 64] -> [H, W, D]
    blocks = out_vals.reshape(n_blocks, d, BS).transpose(0, 2, 1)  # [nB, 64, D]
    img = (
        blocks.reshape(nbv, nbh, MB, MB, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(nbv * MB, nbh * MB, d)[:h, :w, :]
    )
    return img
