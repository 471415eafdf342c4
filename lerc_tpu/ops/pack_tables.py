"""Static index tables for vectorized LSB-first bit packing/unpacking.

The Lerc2 v3+ bit stream packs each block's quantized values LSB-first
(BitStuffer2.cpp:432-472): stream bit g holds bit (g % nb) of value
(g // nb). Packing a whole block then becomes two gathers with static
tables instead of a serial cursor:

  pack:   payload_byte[k] = sum_i ((q[VIDX[nb,k,i]] >> VSHIFT[nb,k,i]) & 1) << i
  unpack: q[v] = sum_j ((payload_byte[BIDX[nb,v,j]] >> BSHIFT[nb,v,j]) & 1) << j

Tables are built once per (max bits, block size) and baked into the jitted
computation as constants.
"""
from __future__ import annotations

import functools

import numpy as np

MAX_BITS = 31


@functools.lru_cache(maxsize=None)
def pack_tables(block_size: int = 64):
    """VIDX/VSHIFT [MAX_BITS+1, 8*MAX_BITS*block_size//64, 8] int32.

    Row nb covers payload bytes 0..ceil(block_size*nb/8)-1; entries beyond a
    row's byte count point at value 0 / bit 31 (harmless, dropped later).
    """
    max_bytes = (block_size * MAX_BITS + 7) // 8
    vidx = np.zeros((MAX_BITS + 1, max_bytes, 8), dtype=np.int32)
    vshift = np.full((MAX_BITS + 1, max_bytes, 8), 31, dtype=np.int32)
    for nb in range(1, MAX_BITS + 1):
        nbytes = (block_size * nb + 7) // 8
        g = np.arange(nbytes * 8)
        v = g // nb
        s = g % nb
        ok = v < block_size
        vidx[nb, : nbytes, :] = np.where(ok, v, 0).reshape(nbytes, 8)
        vshift[nb, : nbytes, :] = np.where(ok, s, 31).reshape(nbytes, 8)
    return vidx, vshift


@functools.lru_cache(maxsize=None)
def unpack_tables(block_size: int = 64):
    """BIDX/BSHIFT [MAX_BITS+1, block_size, MAX_BITS] int32.

    For value v, bit j (j < nb): byte (v*nb+j)//8, bit (v*nb+j)%8.
    Entries with j >= nb point at byte 0 with a sentinel shift of 8 (masked
    out by the caller via bit-j < nb masking).
    """
    bidx = np.zeros((MAX_BITS + 1, block_size, MAX_BITS), dtype=np.int32)
    bshift = np.zeros((MAX_BITS + 1, block_size, MAX_BITS), dtype=np.int32)
    for nb in range(1, MAX_BITS + 1):
        v = np.arange(block_size)[:, None]
        j = np.arange(MAX_BITS)[None, :]
        g = v * nb + j
        bidx[nb] = np.where(j < nb, g // 8, 0)
        bshift[nb] = np.where(j < nb, g % 8, 0)
    return bidx, bshift
