"""ctypes loader for the native runtime helpers (lerc_native.cpp).

The shared library is built on demand with g++ -O3 (cached next to the
source). Falls back gracefully: callers check `available()` and use the
numpy paths when the toolchain is missing.
"""
from __future__ import annotations

import ctypes as ct
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "lerc_native.cpp")
_SO = os.path.join(_DIR, "liblerc_native.so")

_lib = None
_tried = False


class RecordDesc(ct.Structure):
    _fields_ = [
        ("payload_pos", ct.c_int64),
        ("offset", ct.c_double),
        ("mode", ct.c_int32),
        ("num_bits", ct.c_int32),
        ("num_elements", ct.c_int32),
        ("lut_pos", ct.c_int64),
        ("n_lut", ct.c_int32),
        ("nbits_lut", ct.c_int32),
    ]


REC_DTYPE = np.dtype(
    [
        ("payload_pos", np.int64),
        ("offset", np.float64),
        ("mode", np.int32),
        ("num_bits", np.int32),
        ("num_elements", np.int32),
        ("_pad", np.int32),
        ("lut_pos", np.int64),
        ("n_lut", np.int32),
        ("nbits_lut", np.int32),
    ],
    align=True,
)


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        h = ct.CDLL(_SO)
    except OSError:
        return None
    h.lerc_tile_scan.restype = ct.c_int64
    h.lerc_tile_scan.argtypes = [
        ct.c_void_p, ct.c_int64, ct.c_void_p, ct.c_void_p,
        ct.c_int32, ct.c_int32, ct.c_int32, ct.c_int32, ct.c_void_p,
    ]
    h.lerc_huffman_decode.restype = ct.c_int64
    h.lerc_huffman_decode.argtypes = [
        ct.c_void_p, ct.c_int64, ct.c_void_p, ct.c_void_p,
        ct.c_int32, ct.c_int32, ct.c_void_p,
    ]
    h.lerc_huffman_group_offsets.restype = ct.c_int64
    h.lerc_huffman_group_offsets.argtypes = [
        ct.c_void_p, ct.c_int64, ct.c_void_p, ct.c_void_p,
        ct.c_int32, ct.c_int32, ct.c_void_p, ct.c_void_p,
    ]
    h.lerc_rle_compress.restype = ct.c_int64
    h.lerc_rle_compress.argtypes = [ct.c_void_p, ct.c_int64, ct.c_void_p]
    h.lerc_rle_decompress.restype = ct.c_int64
    h.lerc_rle_decompress.argtypes = [ct.c_void_p, ct.c_int64, ct.c_void_p, ct.c_int64]
    h.lerc_fletcher32.restype = ct.c_uint32
    h.lerc_fletcher32.argtypes = [ct.c_void_p, ct.c_int64]
    _lib = h
    return _lib


def available() -> bool:
    return lib() is not None


def tile_scan(buf: np.ndarray, cnts: np.ndarray, j0s: np.ndarray, n_blocks: int,
              n_depth: int, dt: int, version: int):
    """Returns (records structured array, bytes consumed)."""
    h = lib()
    recs = np.zeros(n_blocks * n_depth, dtype=REC_DTYPE)
    buf = np.ascontiguousarray(buf)
    cnts = np.ascontiguousarray(cnts, dtype=np.int32)
    j0s = np.ascontiguousarray(j0s, dtype=np.int32)
    used = h.lerc_tile_scan(
        buf.ctypes.data, buf.size, cnts.ctypes.data, j0s.ctypes.data,
        n_blocks, n_depth, dt, version, recs.ctypes.data,
    )
    if used < 0:
        raise ValueError("corrupt Lerc2 tile stream")
    return recs, int(used)


def huffman_decode(buf: np.ndarray, lengths: np.ndarray, codes: np.ndarray, n_symbols: int):
    h = lib()
    buf = np.ascontiguousarray(buf)
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    codes = np.ascontiguousarray(codes, dtype=np.uint32)
    out = np.zeros(n_symbols, dtype=np.int32)
    used = h.lerc_huffman_decode(
        buf.ctypes.data, buf.size, lengths.ctypes.data, codes.ctypes.data,
        lengths.size, n_symbols, out.ctypes.data,
    )
    if used < 0:
        raise ValueError("corrupt huffman stream")
    return out, int(used)


def huffman_group_offsets(buf: np.ndarray, lengths: np.ndarray,
                          codes: np.ndarray, group_counts: np.ndarray):
    """Lengths-only scan of a canonical Huffman stream: the bit offset of
    each group's first code (the acceleration sidecar for foreign blobs).
    group_counts[g] = wire symbols in group g. Raises on a corrupt
    stream."""
    h = lib()
    buf = np.ascontiguousarray(buf)
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    codes = np.ascontiguousarray(codes, dtype=np.uint32)
    group_counts = np.ascontiguousarray(group_counts, dtype=np.int32)
    out = np.zeros(group_counts.size, dtype=np.int32)
    used = h.lerc_huffman_group_offsets(
        buf.ctypes.data, buf.size, lengths.ctypes.data, codes.ctypes.data,
        lengths.size, group_counts.size, group_counts.ctypes.data,
        out.ctypes.data,
    )
    if used < 0:
        raise ValueError("corrupt huffman stream")
    return out


def rle_compress(src: np.ndarray) -> bytes:
    h = lib()
    src = np.ascontiguousarray(src, dtype=np.uint8)
    cap = src.size + src.size // 2 + 64
    dst = np.zeros(cap, dtype=np.uint8)
    n = h.lerc_rle_compress(src.ctypes.data, src.size, dst.ctypes.data)
    if n < 0:
        raise ValueError("RLE compress failed")
    return dst[:n].tobytes()


def rle_decompress(src: np.ndarray | bytes, expected: int) -> np.ndarray:
    h = lib()
    src = np.frombuffer(src, dtype=np.uint8) if not isinstance(src, np.ndarray) else src
    dst = np.zeros(expected, dtype=np.uint8)
    n = h.lerc_rle_decompress(
        np.ascontiguousarray(src).ctypes.data, src.size, dst.ctypes.data, expected
    )
    if n != expected:
        raise ValueError("RLE decompress failed")
    return dst


def fletcher32(data) -> int:
    h = lib()
    arr = np.frombuffer(memoryview(data), dtype=np.uint8)
    return int(h.lerc_fletcher32(np.ascontiguousarray(arr).ctypes.data, arr.size))
