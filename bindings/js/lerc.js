/* lerc_tpu JS binding: pure-JavaScript LERC decoder (Lerc2 v1..v6 + Lerc1).
 *
 * Drop-in replacement for the reference `lerc` npm package's decode surface
 * (OtherLanguages/js/src/Lerc.ts:452-579): decode(), getBlobInfo(),
 * getBandCount(), plus no-op load()/isLoaded() (no WASM to fetch -- this is
 * plain JS over typed arrays). Wire-format semantics mirror the repo's host
 * codec (lerc_tpu/codec/*.py), which is oracle-verified against the C++
 * reference; this file re-derives the same logic with serial JS loops.
 *
 * Supported: all 8 pixel types, micro-block tiling (raw/stuff/const/LUT,
 * depth-diff), whole-image 8-bit Huffman (direct + delta, masked), v6
 * lossless float/double (fpl: predictors, byte-plane delta levels,
 * Huffman/RLE/raw/PackBits planes), validity masks (RLE), multi-band blobs,
 * noData remap, Fletcher32 verification, and legacy Lerc1 ("CntZImage").
 *
 * Usage (browser or CommonJS):
 *   const Lerc = require('./lerc.js');          // or window.Lerc
 *   const { width, height, pixels, mask } = Lerc.decode(arrayBuffer);
 */
(function (root, factory) {
  if (typeof module === "object" && module.exports) module.exports = factory();
  else root.Lerc = factory();
})(typeof self !== "undefined" ? self : this, function () {
  "use strict";

  // ---------------------------------------------------------------- utils

  const FILE_KEY_LERC2 = "Lerc2 ";
  const FILE_KEY_LERC1 = "CntZImage ";

  const DT = { CHAR: 0, BYTE: 1, SHORT: 2, USHORT: 3, INT: 4, UINT: 5, FLOAT: 6, DOUBLE: 7 };
  const DT_SIZE = [1, 1, 2, 2, 4, 4, 4, 8];
  const DT_CTOR = [Int8Array, Uint8Array, Int16Array, Uint16Array, Int32Array, Uint32Array, Float32Array, Float64Array];
  const PIXEL_TYPE = ["S8", "U8", "S16", "U16", "S32", "U32", "F32", "F64"];

  function err(msg) { throw new Error("Lerc: " + msg); }

  function asBytes(input, offset) {
    let u8;
    if (input instanceof ArrayBuffer) u8 = new Uint8Array(input);
    else if (ArrayBuffer.isView(input)) u8 = new Uint8Array(input.buffer, input.byteOffset, input.byteLength);
    else err("input must be ArrayBuffer or typed array");
    return offset ? u8.subarray(offset) : u8;
  }

  function keyAt(u8, pos, key) {
    if (u8.length < pos + key.length) return false;
    for (let i = 0; i < key.length; i++) if (u8[pos + i] !== key.charCodeAt(i)) return false;
    return true;
  }

  function dv(u8) { return new DataView(u8.buffer, u8.byteOffset, u8.byteLength); }

  // Fletcher32 (modified): big-endian byte pairs, sums seeded with 0xffff,
  // odd trailing byte treated as (byte << 8); the representative of a sum
  // that is ≡ 0 (mod 65535) is 65535, never 0 (the true sums are > 0).
  // Matches codec/fletcher32.py. Plain Number arithmetic (exact < 2^53);
  // JS bitwise ops truncate at 32 bits, which the s2 sum would overflow.
  function fletcher32(u8, start, end) {
    let s1 = 0xffff, s2 = 0xffff;
    let i = start;
    const n = end;
    while (i < n - 1) {
      // reduce mod 65535 every 2^20 words: s2 stays far below 2^53
      let t = Math.min(1 << 20, (n - i) >> 1);
      while (t--) {
        s1 += u8[i] * 256 + u8[i + 1];
        s2 += s1;
        i += 2;
      }
      s1 %= 65535;
      s2 %= 65535;
    }
    if (i < n) { s1 = (s1 + u8[i] * 256) % 65535; s2 = (s2 + s1) % 65535; }
    if (s1 === 0) s1 = 65535;
    if (s2 === 0) s2 = 65535;
    return s2 * 65536 + s1;
  }

  // ------------------------------------------------------------ header

  function readHeader(u8) {
    if (!keyAt(u8, 0, FILE_KEY_LERC2)) err("not a Lerc2 blob");
    const view = dv(u8);
    let pos = FILE_KEY_LERC2.length;
    const version = view.getInt32(pos, true); pos += 4;
    if (version < 0 || version > 6) err("unsupported codec version " + version);
    let checksum = 0;
    if (version >= 3) { checksum = view.getUint32(pos, true); pos += 4; }
    const h = { version, checksum };
    h.nRows = view.getInt32(pos, true); pos += 4;
    h.nCols = view.getInt32(pos, true); pos += 4;
    h.nDepth = 1;
    if (version >= 4) { h.nDepth = view.getInt32(pos, true); pos += 4; }
    h.numValidPixel = view.getInt32(pos, true); pos += 4;
    h.microBlockSize = view.getInt32(pos, true); pos += 4;
    h.blobSize = view.getInt32(pos, true); pos += 4;
    h.dt = view.getInt32(pos, true); pos += 4;
    h.nBlobsMore = 0; h.bPassNoDataValues = 0; h.bIsInt = 0;
    if (version >= 6) {
      h.nBlobsMore = view.getInt32(pos, true); pos += 4;
      h.bPassNoDataValues = u8[pos]; h.bIsInt = u8[pos + 1]; pos += 4;
    }
    h.maxZError = view.getFloat64(pos, true); pos += 8;
    h.zMin = view.getFloat64(pos, true); pos += 8;
    h.zMax = view.getFloat64(pos, true); pos += 8;
    h.noDataVal = 0; h.noDataValOrig = 0;
    if (version >= 6) {
      h.noDataVal = view.getFloat64(pos, true); pos += 8;
      h.noDataValOrig = view.getFloat64(pos, true); pos += 8;
    }
    if (h.nRows <= 0 || h.nCols <= 0 || h.nDepth <= 0 || h.numValidPixel < 0 ||
        h.microBlockSize <= 0 || h.microBlockSize > 32 || h.blobSize <= 0 ||
        h.dt < 0 || h.dt > 7) err("malformed Lerc2 header");
    const numPixel = h.nRows * h.nCols;
    if (numPixel > 0x7fffffff || h.numValidPixel > numPixel ||
        DT_SIZE[h.dt] * h.nDepth * numPixel > 0x7fffffff) err("dimensions too large");
    h.headerSize = pos;
    return h;
  }

  function tryHuffmanInt(h) { return h.version >= 2 && (h.dt === DT.BYTE || h.dt === DT.CHAR) && h.maxZError === 0.5; }
  function tryHuffmanFlt(h) { return h.version >= 6 && (h.dt === DT.FLOAT || h.dt === DT.DOUBLE) && h.maxZError === 0; }

  // ------------------------------------------------------------ RLE + mask

  function rleDecompress(u8, pos, end, expected) {
    const out = new Uint8Array(expected);
    const view = dv(u8);
    let o = 0;
    for (;;) {
      if (pos + 2 > end) err("truncated RLE stream");
      const cnt = view.getInt16(pos, true); pos += 2;
      if (cnt === -32768) break;
      if (cnt > 0) {
        if (pos + cnt > end || o + cnt > expected) err("corrupt RLE stream");
        out.set(u8.subarray(pos, pos + cnt), o);
        o += cnt; pos += cnt;
      } else {
        const n = -cnt;
        if (pos + 1 > end || o + n > expected) err("corrupt RLE stream");
        out.fill(u8[pos], o, o + n);
        o += n; pos += 1;
      }
    }
    if (o !== expected) err("RLE output size mismatch");
    return out;
  }

  // packed validity bits (MSB-first per byte) -> Uint8Array of 0/1
  function bitsToMask(bits, nPixels) {
    const mask = new Uint8Array(nPixels);
    for (let i = 0; i < nPixels; i++) mask[i] = (bits[i >> 3] >> (7 - (i & 7))) & 1;
    return mask;
  }

  // ------------------------------------------------------------ bitstuffer

  const POW2 = (() => { const p = new Float64Array(33); for (let i = 0; i <= 32; i++) p[i] = Math.pow(2, i); return p; })();

  // LSB-first bitstream (lerc2Version >= 3): element i occupies bits
  // [i*numBits, (i+1)*numBits), each value's bits least-significant first.
  // Number arithmetic keeps numBits up to 31 exact without int32 pitfalls.
  function bitUnpack(u8, pos, n, numBits, out) {
    if (numBits === 0) { out.fill(0, 0, n); return 0; }
    const nbytes = (n * numBits + 7) >> 3;
    if (pos + nbytes > u8.length) err("truncated bit-stuffed payload");
    let bitPos = 0;
    for (let i = 0; i < n; i++) {
      let v = 0;
      for (let b = 0; b < numBits; b++, bitPos++) {
        v += ((u8[pos + (bitPos >> 3)] >> (bitPos & 7)) & 1) * POW2[b];
      }
      out[i] = v;
    }
    return nbytes;
  }

  // legacy MSB-first within little-endian uint32 words, squeezed tail
  function bitUnpackLegacy(u8, pos, n, numBits, out) {
    if (numBits === 0) { out.fill(0, 0, n); return 0; }
    const nbytes = (n * numBits + 7) >> 3;
    const numUints = (n * numBits + 31) >> 5;
    const words = new Uint32Array(numUints);
    for (let w = 0; w < numUints; w++) {
      const b0 = pos + 4 * w;
      let v = 0;
      for (let k = 0; k < 4; k++) v |= (b0 + k < pos + nbytes ? u8[b0 + k] : 0) << (8 * k);
      words[w] = v >>> 0;
    }
    const numBitsTail = (n * numBits) & 31;
    const numBytesTail = (numBitsTail + 7) >> 3;
    const ntbnn = numBytesTail > 0 ? 4 - numBytesTail : 0;
    if (ntbnn) words[numUints - 1] = (words[numUints - 1] << (8 * ntbnn)) >>> 0;
    let bitPos = 0;
    for (let i = 0; i < n; i++) {
      let v = 0;
      for (let b = 0; b < numBits; b++, bitPos++) {
        const bit = (words[bitPos >> 5] >>> (31 - (bitPos & 31))) & 1;
        v = v * 2 + bit;
      }
      out[i] = v >>> 0;
    }
    return nbytes;
  }

  function unpackForVersion(u8, pos, n, numBits, version, out) {
    return version >= 3 ? bitUnpack(u8, pos, n, numBits, out) : bitUnpackLegacy(u8, pos, n, numBits, out);
  }

  // BitStuffer2::Decode: header byte + count + payload (simple or LUT)
  function stuffedDecode(u8, pos, maxElementCount, version) {
    const header = u8[pos]; let p = pos + 1;
    const bits67 = header >> 6;
    const w = bits67 === 0 ? 4 : 3 - bits67;
    const doLut = (header & 32) !== 0;
    const numBits = header & 31;
    let n = 0;
    for (let k = 0; k < w; k++) n |= u8[p + k] << (8 * k);
    n = n >>> 0; p += w;
    if (n > maxElementCount) err("stuffed element count exceeds limit");
    if (!doLut) {
      const vals = new Uint32Array(n);
      p += unpackForVersion(u8, p, n, numBits, version, vals);
      return { vals, pos: p };
    }
    if (numBits === 0) err("corrupt LUT block");
    const nLut = u8[p] - 1; p += 1;
    const lut = new Uint32Array(nLut);
    p += unpackForVersion(u8, p, nLut, numBits, version, lut);
    let nbitsLut = 0, t = nLut;
    while (t) { nbitsLut++; t >>= 1; }
    if (nbitsLut === 0) err("corrupt LUT block");
    const idx = new Uint32Array(n);
    p += unpackForVersion(u8, p, n, nbitsLut, version, idx);
    const vals = new Uint32Array(n);
    for (let i = 0; i < n; i++) {
      const j = idx[i];
      if (j > nLut) err("LUT index out of range");
      vals[i] = j === 0 ? 0 : lut[j - 1];
    }
    return { vals, pos: p };
  }

  // ------------------------------------------------------------ Huffman

  // MSB-first bit reader over little-endian uint32 words
  function BitReaderMSB(u8, pos) {
    this.u8 = u8; this.base = pos; this.bitPos = 0;
  }
  BitReaderMSB.prototype.read = function (nBits) {
    let v = 0;
    for (let k = 0; k < nBits; k++) {
      const bp = this.bitPos + k;
      const byteIdx = this.base + ((bp >> 5) << 2) + (3 - ((bp >> 3) & 3));
      const bit = (this.u8[byteIdx] >>> (7 - (bp & 7))) & 1;
      v = v * 2 + bit;
    }
    this.bitPos += nBits;
    return v;
  };

  function readCodeTable(u8, pos, version) {
    const view = dv(u8);
    const hfVersion = view.getInt32(pos, true);
    const size = view.getInt32(pos + 4, true);
    const i0 = view.getInt32(pos + 8, true);
    const i1 = view.getInt32(pos + 12, true);
    let p = pos + 16;
    if (hfVersion < 2) err("unsupported huffman version");
    if (i0 >= i1 || i0 < 0 || size < 0 || size > (1 << 15)) err("corrupt huffman code table");
    const r = stuffedDecode(u8, p, i1 - i0, version);
    p = r.pos;
    const lengths = new Int32Array(size);
    for (let k = i0; k < i1; k++) lengths[k % size] = r.vals[k - i0];
    let totalBits = 0, maxLen = 0;
    for (let k = i0; k < i1; k++) {
      const L = lengths[k % size];
      if (L > 32) err("corrupt huffman code lengths");
      totalBits += L;
      if (L > maxLen) maxLen = L;
    }
    const numWords = (totalBits + 31) >> 5;
    const codes = new Uint32Array(size);
    const br = new BitReaderMSB(u8, p);
    for (let k = i0; k < i1; k++) {
      const L = lengths[k % size];
      if (L > 0) codes[k % size] = br.read(L) >>> 0;
    }
    p += 4 * numWords;
    return { lengths, codes, maxLen, pos: p };
  }

  // canonical decode tables: per length, first code + symbol-by-rank
  function buildDecodeTables(lengths, codes, maxLen) {
    const first = new Array(maxLen + 1).fill(-1);
    const symsByLen = new Array(maxLen + 1);
    for (let L = 1; L <= maxLen; L++) symsByLen[L] = [];
    for (let s = 0; s < lengths.length; s++) {
      const L = lengths[s];
      if (L > 0) symsByLen[L].push(s);
    }
    for (let L = 1; L <= maxLen; L++) {
      // canonical codes of one length are consecutive; rank by code order
      symsByLen[L].sort((a, b) => codes[a] - codes[b]);
      if (symsByLen[L].length) first[L] = codes[symsByLen[L][0]];
    }
    return { first, symsByLen };
  }

  function decodeSymbols(u8, pos, lengths, codes, maxLen, nSymbols, out) {
    const { first, symsByLen } = buildDecodeTables(lengths, codes, maxLen);
    const br = new BitReaderMSB(u8, pos);
    const totalBits = (u8.length - pos) * 8;
    for (let i = 0; i < nSymbols; i++) {
      let c = 0, L = 0, sym = -1;
      while (L < maxLen) {
        if (br.bitPos >= totalBits) err("truncated huffman stream");
        c = c * 2 + br.read(1);
        L++;
        const f = first[L];
        if (f >= 0 && c >= f && c - f < symsByLen[L].length) { sym = symsByLen[L][c - f]; break; }
      }
      if (sym < 0) err("corrupt huffman stream");
      out[i] = sym;
    }
    // bytes consumed: to the next whole uint32 + one read-ahead pad word
    return pos + (((br.bitPos + 31) >> 5) << 2) + 4;
  }

  // whole-image 8-bit Huffman (direct mode 2 / delta mode 1)
  function decodeHuffmanImage(u8, pos, h, mode, mask, data) {
    const { nRows: H, nCols: W, nDepth: D } = h;
    const signed = h.dt === DT.CHAR;
    const tbl = readCodeTable(u8, pos, h.version);
    if (tbl.maxLen === 0) err("empty huffman code table");
    let nValid = 0;
    for (let i = 0; i < H * W; i++) nValid += mask ? mask[i] : 1;
    const nSymbols = nValid * D;
    const syms = new Int32Array(nSymbols);
    decodeSymbols(u8, tbl.pos, tbl.lengths, tbl.codes, tbl.maxLen, nSymbols, syms);
    const off = signed ? 128 : 0;

    if (mode === 2) { // direct: pixel-major, D values per valid pixel
      let t = 0;
      for (let i = 0; i < H * W; i++) {
        if (mask && !mask[i]) continue;
        for (let d = 0; d < D; d++) data[i * D + d] = syms[t++] - off;
      }
      return;
    }
    // delta (mode 1): depth-major, row-scan delta chain in mod-256 space
    const allValid = nValid === H * W;
    for (let d = 0; d < D; d++) {
      let prev = 0;
      let t = d * nValid;
      if (allValid) {
        for (let i = 0; i < H; i++) {
          for (let j = 0; j < W; j++) {
            let v;
            if (j === 0 && i > 0) v = (data8(data, (i - 1) * W * D + d, signed) + syms[d * H * W + i * W] - off) & 255;
            else v = (prev + syms[d * H * W + i * W + j] - off) & 255;
            data[(i * W + j) * D + d] = signed ? ((v & 255) << 24) >> 24 : v & 255;
            prev = v & 255;
          }
        }
      } else {
        // masked: the chain restarts from the pixel above when the left
        // neighbor is invalid (Lerc2.cpp:2546-2575 semantics)
        for (let i = 0; i < H; i++) {
          for (let j = 0; j < W; j++) {
            if (!mask[i * W + j]) continue;
            const leftOk = j > 0 && mask[i * W + j - 1];
            const aboveOk = i > 0 && mask[(i - 1) * W + j];
            let base;
            if (!leftOk && aboveOk) base = data8(data, ((i - 1) * W + j) * D + d, signed);
            else base = prev;
            const v = (base + syms[t++] - off) & 255;
            data[(i * W + j) * D + d] = signed ? ((v & 255) << 24) >> 24 : v & 255;
            prev = v;
          }
        }
      }
    }
  }

  function data8(data, idx, signed) { return signed ? data[idx] & 255 : data[idx]; }

  // ------------------------------------------------------------ tiling

  // reduced offset dtype (Lerc2.h:528-542 semantics, codec/lerc2_decode.py)
  function dataTypeUsed(dt, tc) {
    if (dt === DT.SHORT || dt === DT.INT) return dt - tc;
    if (dt === DT.USHORT || dt === DT.UINT) return dt - 2 * tc;
    if (dt === DT.FLOAT) return tc === 0 ? dt : (tc === 1 ? DT.SHORT : DT.BYTE);
    if (dt === DT.DOUBLE) return tc === 0 ? dt : dt - 2 * tc + 1;
    return dt;
  }

  function readVariableValue(view, pos, dtUsed) {
    switch (dtUsed) {
      case DT.CHAR: return { v: view.getInt8(pos), n: 1 };
      case DT.BYTE: return { v: view.getUint8(pos), n: 1 };
      case DT.SHORT: return { v: view.getInt16(pos, true), n: 2 };
      case DT.USHORT: return { v: view.getUint16(pos, true), n: 2 };
      case DT.INT: return { v: view.getInt32(pos, true), n: 4 };
      case DT.UINT: return { v: view.getUint32(pos, true), n: 4 };
      case DT.FLOAT: return { v: view.getFloat32(pos, true), n: 4 };
      default: return { v: view.getFloat64(pos, true), n: 8 };
    }
  }

  function castDt(v, dt) {
    switch (dt) {
      case DT.CHAR: return ((v | 0) << 24) >> 24;
      case DT.BYTE: return v & 255;
      case DT.SHORT: return ((v | 0) << 16) >> 16;
      case DT.USHORT: return v & 65535;
      case DT.INT: return v | 0;
      case DT.UINT: return v >>> 0;
      case DT.FLOAT: return Math.fround(v);
      default: return v;
    }
  }

  function readTiles(u8, pos, h, mask, data, zMaxVec) {
    const { nRows: H, nCols: W, nDepth: D, microBlockSize: mb } = h;
    const view = dv(u8);
    const dtIsInt = h.dt < DT.FLOAT;
    const invScale = 2 * h.maxZError;
    const ntv = Math.ceil(H / mb), nth = Math.ceil(W / mb);
    const quant = new Uint32Array(mb * mb);
    for (let it = 0; it < ntv; it++) {
      const i0 = it * mb, i1 = Math.min(i0 + mb, H);
      for (let jt = 0; jt < nth; jt++) {
        const j0 = jt * mb, j1 = Math.min(j0 + mb, W);
        let nValid = 0;
        for (let i = i0; i < i1; i++)
          for (let j = j0; j < j1; j++) nValid += mask ? mask[i * W + j] : 1;
        for (let d = 0; d < D; d++) {
          if (pos >= u8.length) err("truncated tile stream");
          const comprFlag = u8[pos]; pos += 1;
          const bDiff = h.version >= 5 && (comprFlag & 4) !== 0;
          const pattern = h.version >= 5 ? 14 : 15;
          if (((comprFlag >> 2) & pattern) !== ((j0 >> 3) & pattern)) err("micro-block integrity check failed");
          if (bDiff && d === 0) err("diff encoding on depth slice 0");
          const bits67 = comprFlag >> 6;
          const code = comprFlag & 3;
          const zMax = (h.version >= 4 && D > 1) ? zMaxVec[d] : h.zMax;

          if (code === 2) { // const 0 / diff-equal
            if (bDiff) {
              for (let i = i0; i < i1; i++)
                for (let j = j0; j < j1; j++)
                  if (!mask || mask[i * W + j]) data[(i * W + j) * D + d] = data[(i * W + j) * D + d - 1];
            }
            continue;
          }
          if (code === 0) { // raw
            if (bDiff) err("raw block cannot be diff encoded");
            for (let i = i0; i < i1; i++)
              for (let j = j0; j < j1; j++) {
                if (mask && !mask[i * W + j]) continue;
                const r = readVariableValue(view, pos, h.dt);
                data[(i * W + j) * D + d] = r.v;
                pos += r.n;
              }
            continue;
          }
          // code 1 / 3: offset (+ stuffed values for code 1)
          const baseDt = bDiff && dtIsInt ? DT.INT : h.dt;
          const r = readVariableValue(view, pos, dataTypeUsed(baseDt, bits67));
          pos += r.n;
          const offset = r.v;
          if (code === 3) { // const offset
            for (let i = i0; i < i1; i++)
              for (let j = j0; j < j1; j++) {
                if (mask && !mask[i * W + j]) continue;
                const k = (i * W + j) * D + d;
                data[k] = bDiff ? castDt(Math.min(offset + data[k - 1], zMax), h.dt) : castDt(offset, h.dt);
              }
            continue;
          }
          // code 1: bit-stuffed quantized values
          const maxElem = (i1 - i0) * (j1 - j0);
          const sr = stuffedDecode(u8, pos, maxElem, h.version);
          pos = sr.pos;
          const vals = sr.vals;
          const dense = vals.length === maxElem;
          if (!dense && vals.length < nValid) err("not enough stuffed values");
          let t = 0;
          for (let i = i0; i < i1; i++)
            for (let j = j0; j < j1; j++) {
              const valid = !mask || mask[i * W + j];
              let q;
              if (dense) q = vals[(i - i0) * (j1 - j0) + (j - j0)];
              else { if (!valid) continue; q = vals[t++]; }
              if (!valid) continue;
              const k = (i * W + j) * D + d;
              let z = offset + q * invScale;
              if (bDiff) z += data[k - 1];
              data[k] = castDt(Math.min(z, zMax), h.dt);
            }
        }
      }
    }
    return pos;
  }

  // ------------------------------------------------------------ fpl (v6 lossless float)

  function decodePackbits(u8, pos, end, expected, out) {
    let o = 0, i = pos;
    while (i < end) {
      const b = u8[i]; i += 1;
      if (b <= 127) {
        const n = b + 1;
        if (o + n > expected || i + n > end) err("corrupt PackBits stream");
        out.set(u8.subarray(i, i + n), o);
        o += n; i += n;
      } else {
        const n = b - 126;
        if (o + n > expected || i >= end) err("corrupt PackBits stream");
        out.fill(u8[i], o, o + n);
        o += n; i += 1;
      }
    }
    if (o !== expected) err("PackBits output size mismatch");
  }

  function extractPlane(u8, pos, end, expected, version) {
    const method = u8[pos];
    const out = new Uint8Array(expected);
    if (method === 1) { // RLE-const
      if (end - pos < 6) err("truncated RLE-const plane");
      const cnt = dv(u8).getUint32(pos + 2, true);
      if (cnt !== expected) err("RLE-const size mismatch");
      out.fill(u8[pos + 1]);
      return out;
    }
    if (method === 2) { // raw
      if (end - pos - 1 < expected) err("truncated raw plane");
      out.set(u8.subarray(pos + 1, pos + 1 + expected));
      return out;
    }
    if (method === 3) { // PackBits
      decodePackbits(u8, pos + 1, end, expected, out);
      return out;
    }
    if (method !== 0) err("unknown fpl plane method");
    const tbl = readCodeTable(u8, pos + 1, 5);
    const syms = new Int32Array(expected);
    decodeSymbols(u8, tbl.pos, tbl.lengths, tbl.codes, tbl.maxLen, expected, syms);
    for (let i = 0; i < expected; i++) out[i] = syms[i] & 255;
    return out;
  }

  // byte-plane extra delta undo (restoreSequence)
  function restoreSequence(plane, level) {
    for (let lev = level; lev > 0; lev--) {
      let acc = plane[lev - 1];
      for (let i = lev; i < plane.length; i++) {
        acc = (acc + plane[i]) & 255;
        plane[i] = acc;
      }
    }
  }

  // split-field cumsum for f32 words: mantissa 23b and exp+sign 9b wrap
  // independently (fpl_UnitTypes semantics, codec/fpl_impl.py)
  function cumsumSplitF32(words, rows, cols, axis) {
    const M = 0x7fffff;
    if (axis === 1) {
      for (let r = 0; r < rows; r++) {
        let m = 0, hi = 0;
        for (let c = 0; c < cols; c++) {
          const k = r * cols + c, w = words[k];
          m = (m + (w & M)) & M;
          hi = (hi + (w >>> 23)) & 0x1ff;
          words[k] = ((hi << 23) | m) >>> 0;
        }
      }
    } else {
      for (let c = 0; c < cols; c++) {
        let m = 0, hi = 0;
        for (let r = 0; r < rows; r++) {
          const k = r * cols + c, w = words[k];
          m = (m + (w & M)) & M;
          hi = (hi + (w >>> 23)) & 0x1ff;
          words[k] = ((hi << 23) | m) >>> 0;
        }
      }
    }
  }

  // f64 words as (lo Uint32, hi Uint32) pairs: mantissa 52b (exact in a JS
  // double) and exp+sign 12b wrap independently
  function cumsumSplitF64(lo, hi, rows, cols, axis) {
    const P32 = 4294967296, M52 = Math.pow(2, 52);
    const step = axis === 1 ? 1 : cols;
    const outer = axis === 1 ? rows : cols;
    const inner = axis === 1 ? cols : rows;
    for (let o = 0; o < outer; o++) {
      let mAcc = 0, eAcc = 0;
      let k = axis === 1 ? o * cols : o;
      for (let i = 0; i < inner; i++, k += step) {
        const m = (hi[k] & 0xfffff) * P32 + lo[k];
        const e = hi[k] >>> 20;
        mAcc = (mAcc + m) % M52;
        eAcc = (eAcc + e) & 0xfff;
        lo[k] = mAcc % P32;
        hi[k] = (((mAcc / P32) | 0) | (eAcc << 20)) >>> 0;
      }
    }
  }

  function undoFloatTransform(words) {
    const M = 0x7fffff;
    for (let i = 0; i < words.length; i++) {
      const u = words[i];
      const mant = u & M;
      const ae = (u >>> 24) & 0xff;
      const sign = (u >>> 23) & 1;
      words[i] = ((sign << 31) | (ae << 23) | mant) >>> 0;
    }
  }

  function decodeFpl(u8, pos, h, data) {
    const { nRows: H, nCols: W, nDepth: D } = h;
    const isDouble = h.dt === DT.DOUBLE;
    const unitSize = isDouble ? 8 : 4;
    // slice geometry: depth > 1 treats the raster as (H*W) rows x D cols
    const cols = D === 1 ? W : D;
    const rows = D === 1 ? H : W * H;
    const expected = rows * cols;
    const view = dv(u8);
    const pred = u8[pos]; pos += 1;
    if (pred > 2) err("bad fpl predictor code");
    const planes = new Array(unitSize);
    for (let s = 0; s < unitSize; s++) {
      if (u8.length - pos < 6) err("truncated fpl plane header");
      const byteIndex = u8[pos], bestLevel = u8[pos + 1];
      if (byteIndex >= unitSize || bestLevel > 5) err("corrupt fpl plane header");
      const csize = view.getUint32(pos + 2, true);
      pos += 6;
      if (csize < 1 || u8.length - pos < csize) err("truncated fpl plane payload");
      const plane = extractPlane(u8, pos, pos + csize, expected, h.version);
      pos += csize;
      restoreSequence(plane, bestLevel);
      planes[byteIndex] = plane;
    }
    if (!isDouble) {
      const words = new Uint32Array(expected);
      for (let i = 0; i < expected; i++)
        words[i] = (planes[0][i] | (planes[1][i] << 8) | (planes[2][i] << 16) | (planes[3][i] << 24)) >>> 0;
      if (pred === 2) cumsumSplitF32(words, rows, cols, 0);
      if (pred >= 1) cumsumSplitF32(words, rows, cols, 1);
      undoFloatTransform(words);
      const f = new Float32Array(words.buffer);
      for (let i = 0; i < expected; i++) data[i] = f[i];
    } else {
      const lo = new Uint32Array(expected), hi = new Uint32Array(expected);
      for (let i = 0; i < expected; i++) {
        lo[i] = (planes[0][i] | (planes[1][i] << 8) | (planes[2][i] << 16) | (planes[3][i] << 24)) >>> 0;
        hi[i] = (planes[4][i] | (planes[5][i] << 8) | (planes[6][i] << 16) | (planes[7][i] << 24)) >>> 0;
      }
      if (pred === 2) cumsumSplitF64(lo, hi, rows, cols, 0);
      if (pred >= 1) cumsumSplitF64(lo, hi, rows, cols, 1);
      const buf = new ArrayBuffer(8);
      const u32 = new Uint32Array(buf), f64 = new Float64Array(buf);
      for (let i = 0; i < expected; i++) {
        u32[0] = lo[i]; u32[1] = hi[i];
        data[i] = f64[0];
      }
    }
  }

  // ------------------------------------------------------------ band decode

  function decodeBand(u8, prevMask, verifyChecksum) {
    const h = readHeader(u8);
    if (u8.length < h.blobSize) err("buffer shorter than blobSize");
    if (h.version >= 3 && verifyChecksum) {
      const skip = FILE_KEY_LERC2.length + 4 + 4;
      if (fletcher32(u8, skip, h.blobSize) !== h.checksum) err("checksum mismatch");
    }
    const { nRows: H, nCols: W, nDepth: D } = h;
    const view = dv(u8);
    let pos = h.headerSize;

    // mask section
    const numBytesMask = view.getInt32(pos, true); pos += 4;
    if (numBytesMask < 0 || numBytesMask > u8.length - pos) err("bad mask section size");
    const numTotal = H * W;
    let mask = null; // null = all valid
    if (h.numValidPixel === 0) {
      mask = new Uint8Array(numTotal); // all invalid
    } else if (h.numValidPixel !== numTotal) {
      if (numBytesMask > 0) {
        const bits = rleDecompress(u8, pos, pos + numBytesMask, (numTotal + 7) >> 3);
        mask = bitsToMask(bits, numTotal);
        pos += numBytesMask;
      } else {
        if (!prevMask) err("mask reuse requested but no previous mask");
        mask = prevMask;
      }
    } else if (numBytesMask !== 0) err("unexpected mask bytes");

    const data = new DT_CTOR[h.dt](numTotal * D);
    const band = { h, mask, data, zMinVec: null, zMaxVec: null };
    if (h.numValidPixel === 0) return band;

    const fillConst = () => {
      for (let i = 0; i < numTotal; i++) {
        if (mask && !mask[i]) continue;
        for (let d = 0; d < D; d++)
          data[i * D + d] = castDt(D === 1 || h.zMin === h.zMax ? h.zMin : band.zMinVec[d], h.dt);
      }
    };
    if (h.zMin === h.zMax) { fillConst(); return band; }

    let zMaxVec = null;
    if (h.version >= 4) {
      const zMins = new Float64Array(D), zMaxs = new Float64Array(D);
      for (let d = 0; d < D; d++) { const r = readVariableValue(view, pos, h.dt); zMins[d] = r.v; pos += r.n; }
      for (let d = 0; d < D; d++) { const r = readVariableValue(view, pos, h.dt); zMaxs[d] = r.v; pos += r.n; }
      band.zMinVec = zMins; band.zMaxVec = zMaxs; zMaxVec = zMaxs;
      let allEq = true;
      for (let d = 0; d < D; d++) if (zMins[d] !== zMaxs[d]) allEq = false;
      if (allEq) { fillConst(); return band; }
    }

    if (pos >= u8.length) err("truncated blob: missing flag bytes");
    const oneSweep = u8[pos]; pos += 1;
    if (oneSweep) {
      for (let i = 0; i < numTotal; i++) {
        if (mask && !mask[i]) continue;
        for (let d = 0; d < D; d++) {
          const r = readVariableValue(view, pos, h.dt);
          data[i * D + d] = r.v; pos += r.n;
        }
      }
      return band;
    }

    if (tryHuffmanInt(h) || tryHuffmanFlt(h)) {
      if (pos >= u8.length) err("truncated blob: missing image-mode byte");
      const flag = u8[pos]; pos += 1;
      if (flag > 3 || (flag > 2 && h.version < 6) || (flag > 1 && h.version < 4)) err("bad image encode mode flag");
      if (flag !== 0) {
        if (tryHuffmanInt(h) && (flag === 1 || (h.version >= 4 && flag === 2))) {
          decodeHuffmanImage(u8, pos, h, flag, mask, data);
          return band;
        }
        if (tryHuffmanFlt(h) && flag === 3) {
          decodeFpl(u8, pos, h, data);
          return band;
        }
        err("bad image encode mode");
      }
    }
    readTiles(u8, pos, h, mask, data, zMaxVec);
    return band;
  }

  // ------------------------------------------------------------ Lerc1

  function lerc1ReadStuffed(u8, pos) {
    const numBitsByte = u8[pos]; pos += 1;
    const bits67 = numBitsByte >> 6;
    const n = bits67 === 0 ? 4 : 3 - bits67;
    const numBits = numBitsByte & 63;
    let numElements = 0;
    for (let k = 0; k < n; k++) numElements |= u8[pos + k] << (8 * k);
    numElements = numElements >>> 0; pos += n;
    if (numBits >= 32) err("corrupt legacy bitstuffer block");
    const vals = new Uint32Array(numElements);
    pos += bitUnpackLegacy(u8, pos, numElements, numBits, vals);
    return { vals, pos };
  }

  function lerc1ReadFlt(view, pos, n) {
    if (n === 1) return { v: view.getInt8(pos), pos: pos + 1 };
    if (n === 2) return { v: view.getInt16(pos, true), pos: pos + 2 };
    if (n === 4) return { v: view.getFloat32(pos, true), pos: pos + 4 };
    err("bad float width");
  }

  function lerc1TileRanges(total, numTiles) {
    const t = Math.floor(total / numTiles);
    const out = [];
    for (let k = 0; k <= numTiles; k++) {
      const size = k < numTiles ? t : total % numTiles;
      if (size) out.push([k * t, k * t + size]);
    }
    return out;
  }

  function lerc1Decode(u8) {
    if (!keyAt(u8, 0, FILE_KEY_LERC1)) err("not a Lerc1 blob");
    const view = dv(u8);
    const version = view.getInt32(10, true), typ = view.getInt32(14, true);
    const H = view.getInt32(18, true), W = view.getInt32(22, true);
    let maxZError = view.getFloat64(26, true);
    if (version !== 11 || typ !== 8) err("unsupported Lerc1 version/type");
    if (H < 0 || W < 0 || H > 40000 || W > 40000) err("Lerc1 dimensions out of range");
    const HDR = 10 + 16 + 8;
    let pos = HDR;
    const cnt = new Float32Array(H * W);
    const z = new Float32Array(H * W);
    const bands = [];
    let onlyZ = false;
    let ignoreMask = false;

    const readCntTile = (p, i0, i1, j0, j1) => {
      const flag = u8[p]; p += 1;
      if (flag === 2) { for (let i = i0; i < i1; i++) cnt.fill(0, i * W + j0, i * W + j1); return p; }
      if (flag === 3 || flag === 4) {
        const v = flag === 3 ? -1 : 1;
        for (let i = i0; i < i1; i++) cnt.fill(v, i * W + j0, i * W + j1);
        return p;
      }
      if ((flag & 63) > 4) err("bad Lerc1 cnt tile flag");
      if (flag === 0) {
        for (let i = i0; i < i1; i++)
          for (let j = j0; j < j1; j++) { cnt[i * W + j] = view.getFloat32(p, true); p += 4; }
        return p;
      }
      const bits67 = flag >> 6;
      const n = bits67 === 0 ? 4 : 3 - bits67;
      const r = lerc1ReadFlt(view, p, n); p = r.pos;
      const sr = lerc1ReadStuffed(u8, p); p = sr.pos;
      let t = 0;
      for (let i = i0; i < i1; i++)
        for (let j = j0; j < j1; j++) cnt[i * W + j] = Math.fround(r.v + sr.vals[t++]);
      return p;
    };

    const readZTile = (p, i0, i1, j0, j1, maxZImg) => {
      let flag = u8[p]; p += 1;
      const bits67 = flag >> 6;
      flag &= 63;
      if (flag === 2) {
        for (let i = i0; i < i1; i++)
          for (let j = j0; j < j1; j++) if (cnt[i * W + j] > 0) z[i * W + j] = 0;
        return p;
      }
      if (flag > 3) err("bad Lerc1 z tile flag");
      if (flag === 0) {
        for (let i = i0; i < i1; i++)
          for (let j = j0; j < j1; j++)
            if (cnt[i * W + j] > 0) { z[i * W + j] = view.getFloat32(p, true); p += 4; }
        return p;
      }
      const n = bits67 === 0 ? 4 : 3 - bits67;
      const r = lerc1ReadFlt(view, p, n); p = r.pos;
      if (flag === 3) {
        for (let i = i0; i < i1; i++)
          for (let j = j0; j < j1; j++) if (cnt[i * W + j] > 0) z[i * W + j] = Math.fround(r.v);
        return p;
      }
      const sr = lerc1ReadStuffed(u8, p); p = sr.pos;
      const invScale = 2 * maxZError;
      let t = 0;
      for (let i = i0; i < i1; i++)
        for (let j = j0; j < j1; j++) {
          if (ignoreMask) z[i * W + j] = Math.fround(Math.min(r.v + sr.vals[t++] * invScale, maxZImg));
          else if (cnt[i * W + j] > 0) z[i * W + j] = Math.fround(Math.min(r.v + sr.vals[t++] * invScale, maxZImg));
        }
      return p;
    };

    const hdrNextBand = HDR + 12 + 4 + 1;
    while (pos + (onlyZ ? hdrNextBand : 0) < u8.length) {
      if (onlyZ) {
        if (!keyAt(u8, pos, FILE_KEY_LERC1)) break;
        const h2 = view.getInt32(pos + 18, true), w2 = view.getInt32(pos + 22, true);
        if (h2 !== H || w2 !== W) err("inconsistent Lerc1 band header");
        maxZError = view.getFloat64(pos + 26, true);
        pos += HDR;
      }
      for (let part = 0; part < 2; part++) {
        const zPart = part === 1;
        if (!zPart && onlyZ) continue;
        const ntv = view.getInt32(pos, true), nth = view.getInt32(pos + 4, true);
        const numBytes = view.getInt32(pos + 8, true);
        const maxVal = view.getFloat32(pos + 12, true);
        pos += 16;
        const payloadEnd = pos + numBytes;
        if (numBytes < 0 || payloadEnd > u8.length) err("truncated Lerc1 section");
        if (!zPart && ntv === 0 && nth === 0) {
          if (numBytes === 0) {
            cnt.fill(maxVal);
            if (maxVal > 0) ignoreMask = true;
          } else {
            const bits = rleDecompress(u8, pos, payloadEnd, (W * H + 7) >> 3);
            for (let i = 0; i < H * W; i++) cnt[i] = (bits[i >> 3] >> (7 - (i & 7))) & 1;
          }
        } else {
          if (ntv <= 0 || nth <= 0 || ntv > H || nth > W) err("bad Lerc1 tile counts");
          let p = pos;
          for (const [i0, i1] of lerc1TileRanges(H, ntv))
            for (const [j0, j1] of lerc1TileRanges(W, nth))
              p = zPart ? readZTile(p, i0, i1, j0, j1, maxVal) : readCntTile(p, i0, i1, j0, j1);
        }
        pos = payloadEnd;
      }
      bands.push({ cnt: cnt.slice(), z: z.slice() });
      onlyZ = true;
      if (pos >= u8.length) break;
    }
    if (!bands.length) err("no Lerc1 bands decoded");
    return { bands, H, W, maxZError };
  }

  // ------------------------------------------------------------ public API

  function walkBands(u8) {
    const first = readHeader(u8);
    const offsets = [0];
    let nUsesNoData = first.bPassNoDataValues ? 1 : 0;
    let blobSize = first.blobSize;
    let nMasks = (dv(u8).getInt32(first.headerSize, true) > 0 || first.numValidPixel === 0) ? 1 : 0;
    let masksDiffer = false;
    let zMin = first.zMin, zMax = first.zMax, mze = first.maxZError;
    let tryNext = first.version <= 5 || first.nBlobsMore > 0;
    while (tryNext && blobSize < u8.length) {
      let h2;
      try { h2 = readHeader(u8.subarray(blobSize)); } catch (e) { break; }
      if (h2.nDepth !== first.nDepth || h2.nCols !== first.nCols ||
          h2.nRows !== first.nRows || h2.dt !== first.dt) err("inconsistent band headers");
      tryNext = h2.version <= 5 || h2.nBlobsMore > 0;
      if (h2.bPassNoDataValues) nUsesNoData += 1;
      const nbMask2 = dv(u8).getInt32(blobSize + h2.headerSize, true);
      if (nbMask2 > 0 || h2.numValidPixel !== first.numValidPixel) masksDiffer = true;
      if (blobSize + h2.blobSize > u8.length) err("truncated blob");
      zMin = Math.min(zMin, h2.zMin); zMax = Math.max(zMax, h2.zMax);
      mze = Math.max(mze, h2.maxZError);
      offsets.push(blobSize);
      blobSize += h2.blobSize;
    }
    const nBands = offsets.length;
    return {
      first, offsets, blobSize, zMin, zMax, maxZError: mze,
      nMasks: masksDiffer ? nBands : nMasks,
      nUsesNoData: nUsesNoData > 0 ? nBands : 0,
    };
  }

  function statsOf(data, mask, D, noData) {
    const n = data.length / D;
    let mn = Infinity, mx = -Infinity, count = 0;
    for (let i = 0; i < n; i++) {
      if (mask && !mask[i]) continue;
      count++;
      for (let d = 0; d < D; d++) {
        const v = data[i * D + d];
        if (noData !== null && v === noData) continue;
        if (v < mn) mn = v;
        if (v > mx) mx = v;
      }
    }
    return { minValue: mn, maxValue: mx, validPixelCount: count };
  }

  function decode(input, options) {
    options = options || {};
    const u8 = asBytes(input, options.inputOffset || 0);
    if (keyAt(u8, 0, FILE_KEY_LERC1)) {
      const r = lerc1Decode(u8);
      const pixels = [], bandMasks = [], statistics = [];
      let anyMasked = false;
      const combined = new Uint8Array(r.W * r.H).fill(1);
      for (const b of r.bands) {
        const m = new Uint8Array(r.W * r.H);
        for (let i = 0; i < m.length; i++) {
          m[i] = b.cnt[i] > 0 ? 1 : 0;
          if (!m[i]) { combined[i] = 0; anyMasked = true; }
        }
        const px = new Float32Array(r.W * r.H);
        for (let i = 0; i < px.length; i++) px[i] = m[i] ? b.z[i] : 0;
        pixels.push(px);
        bandMasks.push(m);
        statistics.push(statsOf(px, m, 1, null));
      }
      return {
        width: r.W, height: r.H, pixelType: "F32", pixels,
        mask: anyMasked ? combined : null,
        bandMasks: r.bands.length > 1 && anyMasked ? bandMasks : null,
        dimCount: 1, depthCount: 1,
        validPixelCount: statistics[0].validPixelCount,
        statistics, noDataValues: null,
      };
    }

    const walk = walkBands(u8);
    const first = walk.first;
    const { nRows: H, nCols: W, nDepth: D } = first;
    const verify = options.verifyChecksum !== false;
    const pixels = [], bandMasks = [], statistics = [], noDataValues = [];
    let prevMask = null, anyNoData = false;
    for (const off of walk.offsets) {
      const band = decodeBand(u8.subarray(off), prevMask, verify);
      prevMask = band.mask;
      let noData = null;
      if (band.h.bPassNoDataValues) {
        anyNoData = true;
        noData = band.h.noDataValOrig;
        // remap internal noData back to the original value
        const oldV = castDt(band.h.noDataVal, band.h.dt);
        const newV = castDt(band.h.noDataValOrig, band.h.dt);
        if (oldV !== newV) {
          for (let i = 0; i < H * W; i++) {
            if (band.mask && !band.mask[i]) continue;
            for (let d = 0; d < D; d++)
              if (band.data[i * D + d] === oldV) band.data[i * D + d] = newV;
          }
        }
      }
      noDataValues.push(noData);
      pixels.push(band.data);
      bandMasks.push(band.mask);
      statistics.push(statsOf(band.data, band.mask, D, noData));
    }
    // combined mask: AND of per-band masks (null = all valid)
    let mask = null, masksDiffer = false;
    for (const m of bandMasks) {
      if (m) {
        if (!mask) mask = m.slice();
        else for (let i = 0; i < mask.length; i++) mask[i] &= m[i];
      }
    }
    if (mask) {
      for (let b = 0; b < bandMasks.length && !masksDiffer; b++) {
        const m = bandMasks[b];
        for (let i = 0; i < mask.length; i++)
          if ((m ? m[i] : 1) !== mask[i]) { masksDiffer = true; break; }
      }
    }
    // depth layout: band-sequential by default, interleaved on request
    // (reference Lerc.ts:416-441 swapDepthValuesOrder, default BSQ)
    const interleaved = options.returnInterleaved ?? options.returnPixelInterleavedDims;
    let outPixels = pixels;
    if (D > 1 && !interleaved) {
      outPixels = pixels.map((band) => {
        const bsq = new band.constructor(band.length);
        const numPixels = H * W;
        for (let i = 0, j = 0; i < numPixels; i++)
          for (let d = 0, t = i; d < D; d++, t += numPixels) bsq[t] = band[j++];
        return bsq;
      });
    }
    // optional noData fill of invalid pixels (reference Lerc.ts:509-529)
    const ndv = options.noDataValue;
    if (ndv != null && mask) {
      for (let b = 0; b < outPixels.length; b++) {
        const bm = (masksDiffer && bandMasks[b]) || mask;
        const band = outPixels[b];
        const numPixels = H * W;
        for (let i = 0; i < numPixels; i++) {
          if (bm[i]) continue;
          for (let d = 0; d < D; d++)
            band[(D > 1 && !interleaved) ? d * numPixels + i : i * D + d] = ndv;
        }
      }
    }
    return {
      width: W, height: H, pixelType: PIXEL_TYPE[first.dt], pixels: outPixels,
      mask,
      bandMasks: masksDiffer ? bandMasks.map((m) => m || new Uint8Array(H * W).fill(1)) : null,
      dimCount: D, depthCount: D,
      validPixelCount: first.numValidPixel,
      statistics,
      noDataValues: anyNoData ? noDataValues : null,
    };
  }

  function getBlobInfo(input, options) {
    options = options || {};
    const u8 = asBytes(input, options.inputOffset || 0);
    if (keyAt(u8, 0, FILE_KEY_LERC1)) {
      const r = lerc1Decode(u8);
      let valid = 0, mn = Infinity, mx = -Infinity;
      const b = r.bands[0];
      for (let i = 0; i < r.W * r.H; i++)
        if (b.cnt[i] > 0) { valid++; if (b.z[i] < mn) mn = b.z[i]; if (b.z[i] > mx) mx = b.z[i]; }
      return {
        version: 0, depthCount: 1, dimCount: 1, width: r.W, height: r.H,
        validPixelCount: valid, bandCount: r.bands.length, blobSize: u8.length,
        maskCount: valid < r.W * r.H ? 1 : 0, dataType: 6,
        minValue: mn, maxValue: mx, maxZerror: r.maxZError,
        statistics: [], bandCountWithNoData: 0,
      };
    }
    const walk = walkBands(u8);
    const h = walk.first;
    // per-band statistics from the header/ranges sections alone, the
    // lerc_getDataRanges analog (Lerc.ts:278-333; no pixel decode)
    const statistics = [];
    for (const off of walk.offsets) {
      const bh = readHeader(u8.subarray(off));
      const view2 = dv(u8);
      let p = off + bh.headerSize;
      const nbm = view2.getInt32(p, true);
      p += 4 + Math.max(nbm, 0);
      if (bh.numValidPixel === 0) {
        statistics.push({ minValue: 0, maxValue: 0 });
      } else if (bh.version < 4 || bh.zMin === bh.zMax || bh.nDepth === 1) {
        statistics.push({ minValue: bh.zMin, maxValue: bh.zMax });
      } else {
        const mins = [], maxs = [];
        for (let d = 0; d < bh.nDepth; d++) {
          const r = readVariableValue(view2, p, bh.dt);
          mins.push(r.v); p += r.n;
        }
        for (let d = 0; d < bh.nDepth; d++) {
          const r = readVariableValue(view2, p, bh.dt);
          maxs.push(r.v); p += r.n;
        }
        statistics.push({
          minValue: Math.min.apply(null, mins),
          maxValue: Math.max.apply(null, maxs),
          depthStats: { minValues: new Float64Array(mins), maxValues: new Float64Array(maxs) },
        });
      }
    }
    return {
      version: h.version, depthCount: h.nDepth, dimCount: h.nDepth,
      width: h.nCols, height: h.nRows, validPixelCount: h.numValidPixel,
      bandCount: walk.offsets.length, blobSize: walk.blobSize,
      maskCount: walk.nMasks, dataType: h.dt,
      minValue: walk.zMin, maxValue: walk.zMax, maxZerror: walk.maxZError,
      statistics, bandCountWithNoData: walk.nUsesNoData,
    };
  }

  function getBandCount(input, options) {
    return getBlobInfo(input, options).bandCount;
  }

  // truncated input makes DataView reads throw RangeError; convert to the
  // "Lerc: ..." error contract at the API boundary
  function guarded(fn) {
    return function (input, options) {
      try { return fn(input, options); }
      catch (e) { if (e instanceof RangeError) err("truncated blob (read out of bounds)"); throw e; }
    };
  }

  return {
    decode: guarded(decode),
    getBlobInfo: guarded(getBlobInfo),
    getBandCount: guarded(getBandCount),
    load: function () { return Promise.resolve(); }, // API compat: no WASM
    isLoaded: function () { return true; },
  };
});
