"""Lossless floating-point compression path (codec v6, "fpl").

Pipeline (mirrors /root/reference/src/LercLib/fpl_Lerc2Ext.cpp:458-464):
  1. float transform of the IEEE-754 bit pattern (exp<<24 | sign<<23 | mantissa)
  2. optional predictor: delta along rows, or cross (rows then columns)
  3. split into byte planes; per plane an extra delta of order 0..5
  4. per plane: best of {Huffman, PackBits, RLE-const, raw}

Implemented in lerc_tpu.codec.fpl_impl; this module keeps the decoder entry
point used by lerc2_decode.
"""
from __future__ import annotations


def decode_flt(src, pos, out) -> None:
    from . import fpl_impl

    fpl_impl.decode_flt(src, pos, out)
