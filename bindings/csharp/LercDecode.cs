/* lerc_tpu C# binding: pure-managed LERC decoder (Lerc2 v1..v6 + Lerc1).
 *
 * Drop-in replacement for the reference C# P/Invoke wrapper
 * (OtherLanguages/CSharp/LercDecode.cs): the same static entry points
 * (lerc_getBlobInfo, lerc_getDataRanges, lerc_decode, lerc_decodeToDouble,
 * lerc_decode_4D, lerc_decodeToDouble_4D) with the same argument lists and
 * ErrCode returns (Lerc_types.h:11-20), but implemented in managed code --
 * no Lerc.dll needed. Wire-format semantics mirror the repo's host codec
 * (lerc_tpu/codec/*.py) and JS binding (bindings/js/lerc.js), both
 * oracle-verified against the C++ reference.
 *
 * Supported: all 8 pixel types, micro-block tiling (raw/stuff/const/LUT,
 * depth-diff), whole-image 8-bit Huffman (direct + delta, masked), v6
 * lossless float/double (fpl), validity masks (RLE), multi-band blobs,
 * noData remap, Fletcher32 verification, and legacy Lerc1 ("CntZImage").
 *
 * Integer/float semantics are kept explicit (long accumulators, masked
 * wraps, (float) casts) so the executable Python simulation
 * (bindings/csharp/cs_sim.py) models this file statement-for-statement;
 * the CI suite runs that simulation against the C++ reference oracle.
 *
 * Requires .NET Core 3.0+ / .NET 5+ (BitConverter.Int32BitsToSingle).
 */
using System;
using System.Collections.Generic;

namespace LercTpu
{
    public class LercException : Exception
    {
        public LercException(string msg) : base("Lerc: " + msg) { }
    }

    public static class LercDecode
    {
        public enum DataType { dt_char, dt_uchar, dt_short, dt_ushort, dt_int, dt_uint, dt_float, dt_double }

        // ErrCode values of the public C API (Lerc_types.h:11-20)
        public const uint Ok = 0;
        public const uint Failed = 1;
        public const uint WrongParam = 2;
        public const uint BufferTooSmall = 3;
        public const uint NaN = 4;
        public const uint HasNoData = 5;

        const int DT_CHAR = 0, DT_BYTE = 1, DT_SHORT = 2, DT_USHORT = 3,
                  DT_INT = 4, DT_UINT = 5, DT_FLOAT = 6, DT_DOUBLE = 7;
        static readonly int[] DT_SIZE = { 1, 1, 2, 2, 4, 4, 4, 8 };
        const string FILE_KEY_LERC2 = "Lerc2 ";
        const string FILE_KEY_LERC1 = "CntZImage ";

        static void Err(string msg) { throw new LercException(msg); }

        // ------------------------------------------------------------ bytes

        static void Need(byte[] u8, int pos, int n)
        {
            if (pos < 0 || n < 0 || pos + (long)n > u8.Length) Err("read past end of blob");
        }

        static int U8(byte[] u8, int pos) { Need(u8, pos, 1); return u8[pos]; }

        static int I8(byte[] u8, int pos) { Need(u8, pos, 1); int v = u8[pos]; return v >= 128 ? v - 256 : v; }

        static int U16(byte[] u8, int pos) { Need(u8, pos, 2); return u8[pos] | (u8[pos + 1] << 8); }

        static int I16(byte[] u8, int pos) { int v = U16(u8, pos); return v >= 32768 ? v - 65536 : v; }

        static long U32(byte[] u8, int pos)
        {
            Need(u8, pos, 4);
            return (long)u8[pos] | ((long)u8[pos + 1] << 8) | ((long)u8[pos + 2] << 16) | ((long)u8[pos + 3] << 24);
        }

        static int I32(byte[] u8, int pos) { long v = U32(u8, pos); return (int)(v >= 2147483648L ? v - 4294967296L : v); }

        static float F32(byte[] u8, int pos) { return BitConverter.Int32BitsToSingle(I32(u8, pos)); }

        static double F64(byte[] u8, int pos)
        {
            long lo = U32(u8, pos), hi = U32(u8, pos + 4);
            return BitConverter.Int64BitsToDouble(lo | (hi << 32));
        }

        static bool KeyAt(byte[] u8, int pos, string key)
        {
            if (u8.Length < pos + key.Length) return false;
            for (int i = 0; i < key.Length; i++) if (u8[pos + i] != (byte)key[i]) return false;
            return true;
        }

        // C#-defined double->int wrap: truncate toward zero, reduce mod 2^32
        // into [0, 2^32) (the JS ToInt32/ToUint32 analog; fmod on doubles is
        // exact at any magnitude, so this is well-defined for hostile input)
        static long TruncMod32(double v)
        {
            if (double.IsNaN(v) || double.IsInfinity(v)) return 0;
            double t = Math.Truncate(v) % 4294967296.0;
            long w = (long)t;
            return w & 0xFFFFFFFFL;
        }

        // store-coercion semantics per dtype (JS typed-array store analog)
        static double CastDt(double v, int dt)
        {
            switch (dt)
            {
                case DT_CHAR: { long s = TruncMod32(v) & 0xFF; return s >= 128 ? s - 256 : s; }
                case DT_BYTE: return TruncMod32(v) & 0xFF;
                case DT_SHORT: { long s = TruncMod32(v) & 0xFFFF; return s >= 32768 ? s - 65536 : s; }
                case DT_USHORT: return TruncMod32(v) & 0xFFFF;
                case DT_INT: { long s = TruncMod32(v); return s >= 2147483648L ? s - 4294967296L : s; }
                case DT_UINT: return TruncMod32(v);
                case DT_FLOAT: return (float)v;
                default: return v;
            }
        }

        // Fletcher32 (modified): big-endian byte pairs, sums seeded 0xffff,
        // odd trailing byte as (byte << 8), zero-sum representative 65535
        // (codec/fletcher32.py; long sums reduced every 2^20 words)
        static long Fletcher32(byte[] u8, int start, int end)
        {
            long s1 = 0xffff, s2 = 0xffff;
            int i = start;
            while (i < end - 1)
            {
                long t = Math.Min(1L << 20, (end - i) >> 1);
                while (t-- > 0)
                {
                    s1 += u8[i] * 256 + u8[i + 1];
                    s2 += s1;
                    i += 2;
                }
                s1 %= 65535;
                s2 %= 65535;
            }
            if (i < end) { s1 = (s1 + u8[i] * 256) % 65535; s2 = (s2 + s1) % 65535; }
            if (s1 == 0) s1 = 65535;
            if (s2 == 0) s2 = 65535;
            return s2 * 65536 + s1;
        }

        // ------------------------------------------------------------ header

        internal class Header
        {
            public int version, nRows, nCols, nDepth, numValidPixel, microBlockSize, blobSize, dt;
            public int nBlobsMore, bPassNoDataValues, bIsInt, headerSize;
            public long checksum;
            public double maxZError, zMin, zMax, noDataVal, noDataValOrig;
        }

        internal static Header ReadHeader(byte[] u8, int off)
        {
            if (!KeyAt(u8, off, FILE_KEY_LERC2)) Err("not a Lerc2 blob");
            int pos = off + FILE_KEY_LERC2.Length;
            var h = new Header();
            h.version = I32(u8, pos); pos += 4;
            if (h.version < 0 || h.version > 6) Err("unsupported codec version");
            if (h.version >= 3) { h.checksum = U32(u8, pos); pos += 4; }
            h.nRows = I32(u8, pos); pos += 4;
            h.nCols = I32(u8, pos); pos += 4;
            h.nDepth = 1;
            if (h.version >= 4) { h.nDepth = I32(u8, pos); pos += 4; }
            h.numValidPixel = I32(u8, pos); pos += 4;
            h.microBlockSize = I32(u8, pos); pos += 4;
            h.blobSize = I32(u8, pos); pos += 4;
            h.dt = I32(u8, pos); pos += 4;
            if (h.version >= 6)
            {
                h.nBlobsMore = I32(u8, pos); pos += 4;
                h.bPassNoDataValues = U8(u8, pos); h.bIsInt = U8(u8, pos + 1); pos += 4;
            }
            h.maxZError = F64(u8, pos); pos += 8;
            h.zMin = F64(u8, pos); pos += 8;
            h.zMax = F64(u8, pos); pos += 8;
            if (h.version >= 6)
            {
                h.noDataVal = F64(u8, pos); pos += 8;
                h.noDataValOrig = F64(u8, pos); pos += 8;
            }
            if (h.nRows <= 0 || h.nCols <= 0 || h.nDepth <= 0 || h.numValidPixel < 0 ||
                h.microBlockSize <= 0 || h.microBlockSize > 32 || h.blobSize <= 0 ||
                h.dt < 0 || h.dt > 7) Err("malformed Lerc2 header");
            long numPixel = (long)h.nRows * h.nCols;
            if (numPixel > 0x7fffffffL || h.numValidPixel > numPixel ||
                (long)DT_SIZE[h.dt] * h.nDepth * numPixel > 0x7fffffffL) Err("dimensions too large");
            h.headerSize = pos - off;
            return h;
        }

        static bool TryHuffmanInt(Header h) { return h.version >= 2 && (h.dt == DT_BYTE || h.dt == DT_CHAR) && h.maxZError == 0.5; }
        static bool TryHuffmanFlt(Header h) { return h.version >= 6 && (h.dt == DT_FLOAT || h.dt == DT_DOUBLE) && h.maxZError == 0; }

        // ------------------------------------------------------------ RLE + mask

        static byte[] RleDecompress(byte[] u8, int pos, int end, int expected)
        {
            var outv = new byte[expected];
            int o = 0;
            for (;;)
            {
                if (pos + 2 > end) Err("truncated RLE stream");
                int cnt = I16(u8, pos); pos += 2;
                if (cnt == -32768) break;
                if (cnt > 0)
                {
                    if (pos + cnt > end || o + cnt > expected) Err("corrupt RLE stream");
                    Array.Copy(u8, pos, outv, o, cnt);
                    o += cnt; pos += cnt;
                }
                else
                {
                    int n = -cnt;
                    if (pos + 1 > end || o + n > expected) Err("corrupt RLE stream");
                    for (int k = 0; k < n; k++) outv[o + k] = u8[pos];
                    o += n; pos += 1;
                }
            }
            if (o != expected) Err("RLE output size mismatch");
            return outv;
        }

        static byte[] BitsToMask(byte[] bits, int nPixels)
        {
            var mask = new byte[nPixels];
            for (int i = 0; i < nPixels; i++) mask[i] = (byte)((bits[i >> 3] >> (7 - (i & 7))) & 1);
            return mask;
        }

        // ------------------------------------------------------------ bitstuffer

        // LSB-first bitstream (lerc2Version >= 3): element i occupies bits
        // [i*numBits, (i+1)*numBits), each value's bits LSB first
        static int BitUnpack(byte[] u8, int pos, int n, int numBits, long[] outv)
        {
            if (numBits == 0) { for (int i = 0; i < n; i++) outv[i] = 0; return 0; }
            int nbytes = (int)(((long)n * numBits + 7) >> 3);
            Need(u8, pos, nbytes);
            long bitPos = 0;
            for (int i = 0; i < n; i++)
            {
                long v = 0;
                for (int b = 0; b < numBits; b++, bitPos++)
                    v |= (long)((u8[pos + (int)(bitPos >> 3)] >> (int)(bitPos & 7)) & 1) << b;
                outv[i] = v;
            }
            return nbytes;
        }

        // legacy MSB-first within little-endian uint32 words, squeezed tail
        static int BitUnpackLegacy(byte[] u8, int pos, int n, int numBits, long[] outv)
        {
            if (numBits == 0) { for (int i = 0; i < n; i++) outv[i] = 0; return 0; }
            int nbytes = (int)(((long)n * numBits + 7) >> 3);
            int numUints = (int)(((long)n * numBits + 31) >> 5);
            Need(u8, pos, nbytes);
            var words = new long[numUints];
            for (int w = 0; w < numUints; w++)
            {
                int b0 = pos + 4 * w;
                long v = 0;
                for (int k = 0; k < 4; k++)
                    v |= (long)(b0 + k < pos + nbytes ? u8[b0 + k] : 0) << (8 * k);
                words[w] = v;
            }
            int numBitsTail = (int)(((long)n * numBits) & 31);
            int numBytesTail = (numBitsTail + 7) >> 3;
            int ntbnn = numBytesTail > 0 ? 4 - numBytesTail : 0;
            if (ntbnn != 0) words[numUints - 1] = (words[numUints - 1] << (8 * ntbnn)) & 0xFFFFFFFFL;
            long bitPos = 0;
            for (int i = 0; i < n; i++)
            {
                long v = 0;
                for (int b = 0; b < numBits; b++, bitPos++)
                {
                    long bit = (words[(int)(bitPos >> 5)] >> (int)(31 - (bitPos & 31))) & 1;
                    v = v * 2 + bit;
                }
                outv[i] = v;
            }
            return nbytes;
        }

        static int UnpackForVersion(byte[] u8, int pos, int n, int numBits, int version, long[] outv)
        {
            return version >= 3 ? BitUnpack(u8, pos, n, numBits, outv) : BitUnpackLegacy(u8, pos, n, numBits, outv);
        }

        // BitStuffer2::Decode: header byte + count + payload (simple or LUT)
        internal static long[] StuffedDecode(byte[] u8, ref int pos, long maxElementCount, int version)
        {
            int header = U8(u8, pos); int p = pos + 1;
            int bits67 = header >> 6;
            int w = bits67 == 0 ? 4 : 3 - bits67;
            bool doLut = (header & 32) != 0;
            int numBits = header & 31;
            long n = 0;
            for (int k = 0; k < w; k++) n |= (long)U8(u8, p + k) << (8 * k);
            p += w;
            if (n > maxElementCount) Err("stuffed element count exceeds limit");
            if (!doLut)
            {
                var vals = new long[n];
                p += UnpackForVersion(u8, p, (int)n, numBits, version, vals);
                pos = p;
                return vals;
            }
            if (numBits == 0) Err("corrupt LUT block");
            int nLut = U8(u8, p) - 1; p += 1;
            if (nLut < 0) Err("corrupt LUT block");
            var lut = new long[nLut];
            p += UnpackForVersion(u8, p, nLut, numBits, version, lut);
            int nbitsLut = 0, t = nLut;
            while (t != 0) { nbitsLut++; t >>= 1; }
            if (nbitsLut == 0) Err("corrupt LUT block");
            var idx = new long[n];
            p += UnpackForVersion(u8, p, (int)n, nbitsLut, version, idx);
            var outv = new long[n];
            for (long i = 0; i < n; i++)
            {
                long j = idx[i];
                if (j > nLut) Err("LUT index out of range");
                outv[i] = j == 0 ? 0 : lut[j - 1];
            }
            pos = p;
            return outv;
        }

        // ------------------------------------------------------------ Huffman

        // MSB-first bit reader over little-endian uint32 words
        internal class BitReaderMSB
        {
            readonly byte[] u8;
            readonly int basePos;
            public long bitPos;
            public BitReaderMSB(byte[] buf, int pos) { u8 = buf; basePos = pos; bitPos = 0; }
            public long Read(int nBits)
            {
                long v = 0;
                for (int k = 0; k < nBits; k++)
                {
                    long bp = bitPos + k;
                    int byteIdx = basePos + (int)((bp >> 5) << 2) + (3 - (int)((bp >> 3) & 3));
                    long bit = (U8(u8, byteIdx) >> (7 - (int)(bp & 7))) & 1;
                    v = v * 2 + bit;
                }
                bitPos += nBits;
                return v;
            }
        }

        internal class CodeTable
        {
            public int[] lengths;
            public long[] codes;
            public int maxLen, pos;
        }

        internal static CodeTable ReadCodeTable(byte[] u8, int pos, int version)
        {
            int hfVersion = I32(u8, pos);
            int size = I32(u8, pos + 4);
            int i0 = I32(u8, pos + 8);
            int i1 = I32(u8, pos + 12);
            int p = pos + 16;
            if (hfVersion < 2) Err("unsupported huffman version");
            if (i0 >= i1 || i0 < 0 || size <= 0 || size > (1 << 15)) Err("corrupt huffman code table");
            long[] vals = StuffedDecode(u8, ref p, (long)i1 - i0, version);
            if (vals.Length < i1 - i0) Err("corrupt huffman code table");
            var lengths = new int[size];
            for (int k = i0; k < i1; k++) lengths[k % size] = (int)vals[k - i0];
            long totalBits = 0;
            int maxLen = 0;
            for (int k = i0; k < i1; k++)
            {
                int L = lengths[k % size];
                if (L > 32) Err("corrupt huffman code lengths");
                totalBits += L;
                if (L > maxLen) maxLen = L;
            }
            int numWords = (int)((totalBits + 31) >> 5);
            var codes = new long[size];
            var br = new BitReaderMSB(u8, p);
            for (int k = i0; k < i1; k++)
            {
                int L = lengths[k % size];
                if (L > 0) codes[k % size] = br.Read(L);
            }
            p += 4 * numWords;
            return new CodeTable { lengths = lengths, codes = codes, maxLen = maxLen, pos = p };
        }

        // canonical decode tables: per length, first code + symbol-by-rank
        static void BuildDecodeTables(int[] lengths, long[] codes, int maxLen,
                                      out long[] first, out List<int>[] symsByLen)
        {
            first = new long[maxLen + 1];
            symsByLen = new List<int>[maxLen + 1];
            for (int L = 0; L <= maxLen; L++) { first[L] = -1; symsByLen[L] = new List<int>(); }
            for (int s = 0; s < lengths.Length; s++)
            {
                int L = lengths[s];
                if (L > 0) symsByLen[L].Add(s);
            }
            for (int L = 1; L <= maxLen; L++)
            {
                // canonical codes of one length are consecutive; rank = code order
                symsByLen[L].Sort((a, b) => codes[a].CompareTo(codes[b]));
                if (symsByLen[L].Count > 0) first[L] = codes[symsByLen[L][0]];
            }
        }

        internal static int DecodeSymbols(byte[] u8, int pos, CodeTable tbl, long nSymbols, int[] outv)
        {
            BuildDecodeTables(tbl.lengths, tbl.codes, tbl.maxLen, out long[] first, out List<int>[] symsByLen);
            var br = new BitReaderMSB(u8, pos);
            long totalBits = (long)(u8.Length - pos) * 8;
            for (long i = 0; i < nSymbols; i++)
            {
                long c = 0;
                int L = 0, sym = -1;
                while (L < tbl.maxLen)
                {
                    if (br.bitPos >= totalBits) Err("truncated huffman stream");
                    c = c * 2 + br.Read(1);
                    L++;
                    long f = first[L];
                    if (f >= 0 && c >= f && c - f < symsByLen[L].Count) { sym = symsByLen[L][(int)(c - f)]; break; }
                }
                if (sym < 0) Err("corrupt huffman stream");
                outv[i] = sym;
            }
            // bytes consumed: to the next whole uint32 + one read-ahead pad word
            return pos + (int)(((br.bitPos + 31) >> 5) << 2) + 4;
        }

        static double Data8(double[] data, int idx, bool signed)
        {
            return signed ? TruncMod32(data[idx]) & 255 : data[idx];
        }

        // whole-image 8-bit Huffman (direct mode 2 / delta mode 1)
        static void DecodeHuffmanImage(byte[] u8, int pos, Header h, int mode, byte[] mask, double[] data)
        {
            int H = h.nRows, W = h.nCols, D = h.nDepth;
            bool signed = h.dt == DT_CHAR;
            CodeTable tbl = ReadCodeTable(u8, pos, h.version);
            if (tbl.maxLen == 0) Err("empty huffman code table");
            int nValid = 0;
            for (int i = 0; i < H * W; i++) nValid += mask != null ? mask[i] : 1;
            long nSymbols = (long)nValid * D;
            var syms = new int[nSymbols];
            DecodeSymbols(u8, tbl.pos, tbl, nSymbols, syms);
            int off = signed ? 128 : 0;

            if (mode == 2)
            { // direct: pixel-major, D values per valid pixel
                int t = 0;
                for (int i = 0; i < H * W; i++)
                {
                    if (mask != null && mask[i] == 0) continue;
                    for (int d = 0; d < D; d++) data[i * D + d] = syms[t++] - off;
                }
                return;
            }
            // delta (mode 1): depth-major, row-scan delta chain in mod-256 space
            bool allValid = nValid == H * W;
            for (int d = 0; d < D; d++)
            {
                long prev = 0;
                int t = d * nValid;
                if (allValid)
                {
                    for (int i = 0; i < H; i++)
                        for (int j = 0; j < W; j++)
                        {
                            long v;
                            if (j == 0 && i > 0) v = ((long)Data8(data, ((i - 1) * W) * D + d, signed) + syms[d * H * W + i * W] - off) & 255;
                            else v = (prev + syms[d * H * W + i * W + j] - off) & 255;
                            long s = v & 255;
                            data[(i * W + j) * D + d] = signed && s >= 128 ? s - 256 : s;
                            prev = v & 255;
                        }
                }
                else
                {
                    // masked: the chain restarts from the pixel above when the
                    // left neighbor is invalid (Lerc2.cpp:2546-2575 semantics)
                    for (int i = 0; i < H; i++)
                        for (int j = 0; j < W; j++)
                        {
                            if (mask[i * W + j] == 0) continue;
                            bool leftOk = j > 0 && mask[i * W + j - 1] != 0;
                            bool aboveOk = i > 0 && mask[(i - 1) * W + j] != 0;
                            long baseV;
                            if (!leftOk && aboveOk) baseV = (long)Data8(data, ((i - 1) * W + j) * D + d, signed);
                            else baseV = prev;
                            long v = (baseV + syms[t++] - off) & 255;
                            long s = v & 255;
                            data[(i * W + j) * D + d] = signed && s >= 128 ? s - 256 : s;
                            prev = v;
                        }
                }
            }
        }

        // ------------------------------------------------------------ tiling

        // reduced offset dtype (Lerc2.h:528-542 semantics)
        static int DataTypeUsed(int dt, int tc)
        {
            if (dt == DT_SHORT || dt == DT_INT) return dt - tc;
            if (dt == DT_USHORT || dt == DT_UINT) return dt - 2 * tc;
            if (dt == DT_FLOAT) return tc == 0 ? dt : (tc == 1 ? DT_SHORT : DT_BYTE);
            if (dt == DT_DOUBLE) return tc == 0 ? dt : dt - 2 * tc + 1;
            return dt;
        }

        static double ReadVariableValue(byte[] u8, ref int pos, int dtUsed)
        {
            switch (dtUsed)
            {
                case DT_CHAR: { double v = I8(u8, pos); pos += 1; return v; }
                case DT_BYTE: { double v = U8(u8, pos); pos += 1; return v; }
                case DT_SHORT: { double v = I16(u8, pos); pos += 2; return v; }
                case DT_USHORT: { double v = U16(u8, pos); pos += 2; return v; }
                case DT_INT: { double v = I32(u8, pos); pos += 4; return v; }
                case DT_UINT: { double v = U32(u8, pos); pos += 4; return v; }
                case DT_FLOAT: { double v = F32(u8, pos); pos += 4; return v; }
                default: { double v = F64(u8, pos); pos += 8; return v; }
            }
        }

        // Math.Min with C# NaN semantics kept explicit for the simulation
        static double MinD(double a, double b)
        {
            if (double.IsNaN(a) || double.IsNaN(b)) return double.NaN;
            return a < b ? a : b;
        }

        static int ReadTiles(byte[] u8, int pos, Header h, byte[] mask, double[] data, double[] zMaxVec)
        {
            int H = h.nRows, W = h.nCols, D = h.nDepth, mb = h.microBlockSize;
            bool dtIsInt = h.dt < DT_FLOAT;
            double invScale = 2 * h.maxZError;
            int ntv = (H + mb - 1) / mb, nth = (W + mb - 1) / mb;
            for (int it = 0; it < ntv; it++)
            {
                int i0 = it * mb, i1 = Math.Min(i0 + mb, H);
                for (int jt = 0; jt < nth; jt++)
                {
                    int j0 = jt * mb, j1 = Math.Min(j0 + mb, W);
                    int nValid = 0;
                    for (int i = i0; i < i1; i++)
                        for (int j = j0; j < j1; j++) nValid += mask != null ? mask[i * W + j] : 1;
                    for (int d = 0; d < D; d++)
                    {
                        int comprFlag = U8(u8, pos); pos += 1;
                        bool bDiff = h.version >= 5 && (comprFlag & 4) != 0;
                        int pattern = h.version >= 5 ? 14 : 15;
                        if (((comprFlag >> 2) & pattern) != ((j0 >> 3) & pattern)) Err("micro-block integrity check failed");
                        if (bDiff && d == 0) Err("diff encoding on depth slice 0");
                        int bits67 = comprFlag >> 6;
                        int code = comprFlag & 3;
                        double zMax = (h.version >= 4 && D > 1) ? zMaxVec[d] : h.zMax;

                        if (code == 2)
                        { // const 0 / diff-equal
                            if (bDiff)
                            {
                                for (int i = i0; i < i1; i++)
                                    for (int j = j0; j < j1; j++)
                                        if (mask == null || mask[i * W + j] != 0)
                                            data[(i * W + j) * D + d] = data[(i * W + j) * D + d - 1];
                            }
                            continue;
                        }
                        if (code == 0)
                        { // raw
                            if (bDiff) Err("raw block cannot be diff encoded");
                            for (int i = i0; i < i1; i++)
                                for (int j = j0; j < j1; j++)
                                {
                                    if (mask != null && mask[i * W + j] == 0) continue;
                                    data[(i * W + j) * D + d] = ReadVariableValue(u8, ref pos, h.dt);
                                }
                            continue;
                        }
                        // code 1 / 3: offset (+ stuffed values for code 1)
                        int baseDt = bDiff && dtIsInt ? DT_INT : h.dt;
                        double offset = ReadVariableValue(u8, ref pos, DataTypeUsed(baseDt, bits67));
                        if (code == 3)
                        { // const offset
                            for (int i = i0; i < i1; i++)
                                for (int j = j0; j < j1; j++)
                                {
                                    if (mask != null && mask[i * W + j] == 0) continue;
                                    int k = (i * W + j) * D + d;
                                    data[k] = bDiff ? CastDt(MinD(offset + data[k - 1], zMax), h.dt) : CastDt(offset, h.dt);
                                }
                            continue;
                        }
                        // code 1: bit-stuffed quantized values
                        long maxElem = (long)(i1 - i0) * (j1 - j0);
                        long[] vals = StuffedDecode(u8, ref pos, maxElem, h.version);
                        bool dense = vals.Length == maxElem;
                        if (!dense && vals.Length < nValid) Err("not enough stuffed values");
                        int t = 0;
                        for (int i = i0; i < i1; i++)
                            for (int j = j0; j < j1; j++)
                            {
                                bool valid = mask == null || mask[i * W + j] != 0;
                                long q;
                                if (dense) q = vals[(i - i0) * (j1 - j0) + (j - j0)];
                                else { if (!valid) continue; q = vals[t++]; }
                                if (!valid) continue;
                                int k = (i * W + j) * D + d;
                                double z = offset + q * invScale;
                                if (bDiff) z += data[k - 1];
                                data[k] = CastDt(MinD(z, zMax), h.dt);
                            }
                    }
                }
            }
            return pos;
        }

        // ------------------------------------------------------------ fpl (v6 lossless float)

        static void DecodePackbits(byte[] u8, int pos, int end, int expected, byte[] outv)
        {
            int o = 0, i = pos;
            while (i < end)
            {
                int b = u8[i]; i += 1;
                if (b <= 127)
                {
                    int n = b + 1;
                    if (o + n > expected || i + n > end) Err("corrupt PackBits stream");
                    Array.Copy(u8, i, outv, o, n);
                    o += n; i += n;
                }
                else
                {
                    int n = b - 126;
                    if (o + n > expected || i >= end) Err("corrupt PackBits stream");
                    for (int k = 0; k < n; k++) outv[o + k] = u8[i];
                    o += n; i += 1;
                }
            }
            if (o != expected) Err("PackBits output size mismatch");
        }

        static byte[] ExtractPlane(byte[] u8, int pos, int end, int expected, int version)
        {
            int method = U8(u8, pos);
            var outv = new byte[expected];
            if (method == 1)
            { // RLE-const
                if (end - pos < 6) Err("truncated RLE-const plane");
                long cnt = U32(u8, pos + 2);
                if (cnt != expected) Err("RLE-const size mismatch");
                for (int k = 0; k < expected; k++) outv[k] = u8[pos + 1];
                return outv;
            }
            if (method == 2)
            { // raw
                if (end - pos - 1 < expected) Err("truncated raw plane");
                Array.Copy(u8, pos + 1, outv, 0, expected);
                return outv;
            }
            if (method == 3)
            { // PackBits
                DecodePackbits(u8, pos + 1, end, expected, outv);
                return outv;
            }
            if (method != 0) Err("unknown fpl plane method");
            CodeTable tbl = ReadCodeTable(u8, pos + 1, 5);
            var syms = new int[expected];
            DecodeSymbols(u8, tbl.pos, tbl, expected, syms);
            for (int i = 0; i < expected; i++) outv[i] = (byte)(syms[i] & 255);
            return outv;
        }

        // byte-plane extra delta undo (fpl restoreSequence)
        static void RestoreSequence(byte[] plane, int level)
        {
            for (int lev = level; lev > 0; lev--)
            {
                int acc = plane[lev - 1];
                for (int i = lev; i < plane.Length; i++)
                {
                    acc = (acc + plane[i]) & 255;
                    plane[i] = (byte)acc;
                }
            }
        }

        // split-field cumsum for f32 words: mantissa 23b and exp+sign 9b wrap
        // independently (fpl_UnitTypes semantics, codec/fpl_impl.py)
        static void CumsumSplitF32(long[] words, int rows, int cols, int axis)
        {
            const long M = 0x7fffff;
            int outer = axis == 1 ? rows : cols;
            int inner = axis == 1 ? cols : rows;
            int step = axis == 1 ? 1 : cols;
            for (int o = 0; o < outer; o++)
            {
                long m = 0, hi = 0;
                int k = axis == 1 ? o * cols : o;
                for (int i = 0; i < inner; i++, k += step)
                {
                    long w = words[k];
                    m = (m + (w & M)) & M;
                    hi = (hi + (w >> 23)) & 0x1ff;
                    words[k] = (hi << 23) | m;
                }
            }
        }

        // f64 words as (lo, hi) u32 pairs: mantissa 52b and exp+sign 12b wrap
        static void CumsumSplitF64(long[] lo, long[] hi, int rows, int cols, int axis)
        {
            const long P32 = 4294967296L, M52 = 1L << 52;
            int outer = axis == 1 ? rows : cols;
            int inner = axis == 1 ? cols : rows;
            int step = axis == 1 ? 1 : cols;
            for (int o = 0; o < outer; o++)
            {
                long mAcc = 0, eAcc = 0;
                int k = axis == 1 ? o * cols : o;
                for (int i = 0; i < inner; i++, k += step)
                {
                    long m = (hi[k] & 0xfffff) * P32 + lo[k];
                    long e = hi[k] >> 20;
                    mAcc = (mAcc + m) % M52;
                    eAcc = (eAcc + e) & 0xfff;
                    lo[k] = mAcc % P32;
                    hi[k] = (mAcc / P32) | (eAcc << 20);
                }
            }
        }

        static void UndoFloatTransform(long[] words)
        {
            const long M = 0x7fffff;
            for (int i = 0; i < words.Length; i++)
            {
                long u = words[i];
                long mant = u & M;
                long ae = (u >> 24) & 0xff;
                long sign = (u >> 23) & 1;
                words[i] = (sign << 31) | (ae << 23) | mant;
            }
        }

        static void DecodeFpl(byte[] u8, int pos, Header h, double[] data)
        {
            int H = h.nRows, W = h.nCols, D = h.nDepth;
            bool isDouble = h.dt == DT_DOUBLE;
            int unitSize = isDouble ? 8 : 4;
            // slice geometry: depth > 1 treats the raster as (H*W) rows x D cols
            int cols = D == 1 ? W : D;
            int rows = D == 1 ? H : W * H;
            int expected = rows * cols;
            int pred = U8(u8, pos); pos += 1;
            if (pred > 2) Err("bad fpl predictor code");
            var planes = new byte[unitSize][];
            for (int s = 0; s < unitSize; s++)
            {
                if (u8.Length - pos < 6) Err("truncated fpl plane header");
                int byteIndex = u8[pos], bestLevel = u8[pos + 1];
                if (byteIndex >= unitSize || bestLevel > 5) Err("corrupt fpl plane header");
                long csize = U32(u8, pos + 2);
                pos += 6;
                if (csize < 1 || u8.Length - pos < csize) Err("truncated fpl plane payload");
                byte[] plane = ExtractPlane(u8, pos, pos + (int)csize, expected, h.version);
                pos += (int)csize;
                RestoreSequence(plane, bestLevel);
                planes[byteIndex] = plane;
            }
            for (int s = 0; s < unitSize; s++) if (planes[s] == null) Err("missing fpl plane");
            if (!isDouble)
            {
                var words = new long[expected];
                for (int i = 0; i < expected; i++)
                    words[i] = planes[0][i] | ((long)planes[1][i] << 8) | ((long)planes[2][i] << 16) | ((long)planes[3][i] << 24);
                if (pred == 2) CumsumSplitF32(words, rows, cols, 0);
                if (pred >= 1) CumsumSplitF32(words, rows, cols, 1);
                UndoFloatTransform(words);
                for (int i = 0; i < expected; i++)
                {
                    long s32 = words[i] >= 2147483648L ? words[i] - 4294967296L : words[i];
                    data[i] = BitConverter.Int32BitsToSingle((int)s32);
                }
            }
            else
            {
                var lo = new long[expected];
                var hi = new long[expected];
                for (int i = 0; i < expected; i++)
                {
                    lo[i] = planes[0][i] | ((long)planes[1][i] << 8) | ((long)planes[2][i] << 16) | ((long)planes[3][i] << 24);
                    hi[i] = planes[4][i] | ((long)planes[5][i] << 8) | ((long)planes[6][i] << 16) | ((long)planes[7][i] << 24);
                }
                if (pred == 2) CumsumSplitF64(lo, hi, rows, cols, 0);
                if (pred >= 1) CumsumSplitF64(lo, hi, rows, cols, 1);
                for (int i = 0; i < expected; i++)
                    data[i] = BitConverter.Int64BitsToDouble(lo[i] | (hi[i] << 32));
            }
        }

        // ------------------------------------------------------------ band decode

        internal class Band
        {
            public Header h;
            public byte[] mask;   // null = all valid
            public double[] data; // interleaved [H*W*D]
            public double[] zMinVec, zMaxVec;
        }

        internal static Band DecodeBand(byte[] u8, int off, byte[] prevMask, bool verifyChecksum)
        {
            Header h = ReadHeader(u8, off);
            if (u8.Length - off < h.blobSize) Err("buffer shorter than blobSize");
            if (h.version >= 3 && verifyChecksum)
            {
                int skip = off + FILE_KEY_LERC2.Length + 4 + 4;
                if (Fletcher32(u8, skip, off + h.blobSize) != h.checksum) Err("checksum mismatch");
            }
            int H = h.nRows, W = h.nCols, D = h.nDepth;
            int pos = off + h.headerSize;

            // mask section
            int numBytesMask = I32(u8, pos); pos += 4;
            if (numBytesMask < 0 || numBytesMask > u8.Length - pos) Err("bad mask section size");
            int numTotal = H * W;
            byte[] mask = null; // null = all valid
            if (h.numValidPixel == 0)
            {
                mask = new byte[numTotal]; // all invalid
            }
            else if (h.numValidPixel != numTotal)
            {
                if (numBytesMask > 0)
                {
                    byte[] bits = RleDecompress(u8, pos, pos + numBytesMask, (numTotal + 7) >> 3);
                    mask = BitsToMask(bits, numTotal);
                    pos += numBytesMask;
                }
                else
                {
                    if (prevMask == null) Err("mask reuse requested but no previous mask");
                    mask = prevMask;
                }
            }
            else if (numBytesMask != 0) Err("unexpected mask bytes");

            var data = new double[(long)numTotal * D];
            var band = new Band { h = h, mask = mask, data = data };
            if (h.numValidPixel == 0) return band;

            if (h.zMin == h.zMax)
            { // constant image: no ranges section on the wire
                for (int i = 0; i < numTotal; i++)
                {
                    if (mask != null && mask[i] == 0) continue;
                    for (int d = 0; d < D; d++) data[i * D + d] = CastDt(h.zMin, h.dt);
                }
                return band;
            }

            double[] zMaxVec = null;
            if (h.version >= 4)
            {
                var zMins = new double[D];
                var zMaxs = new double[D];
                for (int d = 0; d < D; d++) zMins[d] = ReadVariableValue(u8, ref pos, h.dt);
                for (int d = 0; d < D; d++) zMaxs[d] = ReadVariableValue(u8, ref pos, h.dt);
                band.zMinVec = zMins; band.zMaxVec = zMaxs; zMaxVec = zMaxs;
                bool allEq = true;
                for (int d = 0; d < D; d++) if (zMins[d] != zMaxs[d]) allEq = false;
                if (allEq)
                { // per-depth constant image
                    for (int i = 0; i < numTotal; i++)
                    {
                        if (mask != null && mask[i] == 0) continue;
                        for (int d = 0; d < D; d++)
                            data[i * D + d] = CastDt(D == 1 ? h.zMin : zMins[d], h.dt);
                    }
                    return band;
                }
            }

            int oneSweep = U8(u8, pos); pos += 1;
            if (oneSweep != 0)
            {
                for (int i = 0; i < numTotal; i++)
                {
                    if (mask != null && mask[i] == 0) continue;
                    for (int d = 0; d < D; d++)
                        data[i * D + d] = ReadVariableValue(u8, ref pos, h.dt);
                }
                return band;
            }

            if (TryHuffmanInt(h) || TryHuffmanFlt(h))
            {
                int flag = U8(u8, pos); pos += 1;
                if (flag > 3 || (flag > 2 && h.version < 6) || (flag > 1 && h.version < 4)) Err("bad image encode mode flag");
                if (flag != 0)
                {
                    if (TryHuffmanInt(h) && (flag == 1 || (h.version >= 4 && flag == 2)))
                    {
                        DecodeHuffmanImage(u8, pos, h, flag, mask, data);
                        return band;
                    }
                    if (TryHuffmanFlt(h) && flag == 3)
                    {
                        DecodeFpl(u8, pos, h, data);
                        return band;
                    }
                    Err("bad image encode mode");
                }
            }
            ReadTiles(u8, pos, h, mask, data, zMaxVec);
            return band;
        }

        // ------------------------------------------------------------ Lerc1

        internal class Lerc1Result
        {
            public int H, W;
            public int endPos;  // bytes consumed (the Lerc1 blobSize analog)
            public double maxZError;
            public List<float[]> cnts = new List<float[]>();
            public List<float[]> zs = new List<float[]>();
        }

        static long[] Lerc1ReadStuffed(byte[] u8, ref int pos)
        {
            int numBitsByte = U8(u8, pos); pos += 1;
            int bits67 = numBitsByte >> 6;
            int n = bits67 == 0 ? 4 : 3 - bits67;
            int numBits = numBitsByte & 63;
            long numElements = 0;
            for (int k = 0; k < n; k++) numElements |= (long)U8(u8, pos + k) << (8 * k);
            pos += n;
            if (numBits >= 32) Err("corrupt legacy bitstuffer block");
            if (numElements > 1600000000L) Err("corrupt legacy element count");
            var vals = new long[numElements];
            pos += BitUnpackLegacy(u8, pos, (int)numElements, numBits, vals);
            return vals;
        }

        static double Lerc1ReadFlt(byte[] u8, ref int pos, int n)
        {
            if (n == 1) { double v = I8(u8, pos); pos += 1; return v; }
            if (n == 2) { double v = I16(u8, pos); pos += 2; return v; }
            if (n == 4) { double v = F32(u8, pos); pos += 4; return v; }
            Err("bad float width");
            return 0;
        }

        static List<int[]> Lerc1TileRanges(int total, int numTiles)
        {
            int t = total / numTiles;
            var outv = new List<int[]>();
            for (int k = 0; k <= numTiles; k++)
            {
                int size = k < numTiles ? t : total % numTiles;
                if (size > 0) outv.Add(new int[] { k * t, k * t + size });
            }
            return outv;
        }

        internal static Lerc1Result Lerc1Decode(byte[] u8)
        {
            if (!KeyAt(u8, 0, FILE_KEY_LERC1)) Err("not a Lerc1 blob");
            int version = I32(u8, 10), typ = I32(u8, 14);
            int H = I32(u8, 18), W = I32(u8, 22);
            double maxZError = F64(u8, 26);
            if (version != 11 || typ != 8) Err("unsupported Lerc1 version/type");
            if (H < 0 || W < 0 || H > 40000 || W > 40000) Err("Lerc1 dimensions out of range");
            const int HDR = 10 + 16 + 8;
            int pos = HDR;
            var cnt = new float[H * W];
            var z = new float[H * W];
            var res = new Lerc1Result { H = H, W = W, maxZError = maxZError };
            bool onlyZ = false;
            bool ignoreMask = false;

            int ReadCntTile(int p, int ri0, int ri1, int rj0, int rj1)
            {
                int flag = U8(u8, p); p += 1;
                if (flag == 2)
                {
                    for (int i = ri0; i < ri1; i++)
                        for (int j = rj0; j < rj1; j++) cnt[i * W + j] = 0;
                    return p;
                }
                if (flag == 3 || flag == 4)
                {
                    float v = flag == 3 ? -1f : 1f;
                    for (int i = ri0; i < ri1; i++)
                        for (int j = rj0; j < rj1; j++) cnt[i * W + j] = v;
                    return p;
                }
                if ((flag & 63) > 4) Err("bad Lerc1 cnt tile flag");
                if (flag == 0)
                {
                    for (int i = ri0; i < ri1; i++)
                        for (int j = rj0; j < rj1; j++) { cnt[i * W + j] = F32(u8, p); p += 4; }
                    return p;
                }
                int bits67 = flag >> 6;
                int n = bits67 == 0 ? 4 : 3 - bits67;
                double baseV = Lerc1ReadFlt(u8, ref p, n);
                long[] vals = Lerc1ReadStuffed(u8, ref p);
                int t = 0;
                for (int i = ri0; i < ri1; i++)
                    for (int j = rj0; j < rj1; j++) cnt[i * W + j] = (float)(baseV + vals[t++]);
                return p;
            }

            int ReadZTile(int p, int ri0, int ri1, int rj0, int rj1, double maxZImg)
            {
                int flag = U8(u8, p); p += 1;
                int bits67 = flag >> 6;
                flag &= 63;
                if (flag == 2)
                {
                    for (int i = ri0; i < ri1; i++)
                        for (int j = rj0; j < rj1; j++) if (cnt[i * W + j] > 0) z[i * W + j] = 0;
                    return p;
                }
                if (flag > 3) Err("bad Lerc1 z tile flag");
                if (flag == 0)
                {
                    for (int i = ri0; i < ri1; i++)
                        for (int j = rj0; j < rj1; j++)
                            if (cnt[i * W + j] > 0) { z[i * W + j] = F32(u8, p); p += 4; }
                    return p;
                }
                int n = bits67 == 0 ? 4 : 3 - bits67;
                double baseV = Lerc1ReadFlt(u8, ref p, n);
                if (flag == 3)
                {
                    for (int i = ri0; i < ri1; i++)
                        for (int j = rj0; j < rj1; j++) if (cnt[i * W + j] > 0) z[i * W + j] = (float)baseV;
                    return p;
                }
                long[] vals = Lerc1ReadStuffed(u8, ref p);
                double invScale = 2 * maxZError;
                int t = 0;
                for (int i = ri0; i < ri1; i++)
                    for (int j = rj0; j < rj1; j++)
                    {
                        if (ignoreMask) z[i * W + j] = (float)MinD(baseV + vals[t++] * invScale, maxZImg);
                        else if (cnt[i * W + j] > 0) z[i * W + j] = (float)MinD(baseV + vals[t++] * invScale, maxZImg);
                    }
                return p;
            }

            const int hdrNextBand = HDR + 12 + 4 + 1;
            while (pos + (onlyZ ? hdrNextBand : 0) < u8.Length)
            {
                if (onlyZ)
                {
                    if (!KeyAt(u8, pos, FILE_KEY_LERC1)) break;
                    int h2 = I32(u8, pos + 18), w2 = I32(u8, pos + 22);
                    if (h2 != H || w2 != W) Err("inconsistent Lerc1 band header");
                    maxZError = F64(u8, pos + 26);
                    pos += HDR;
                }
                for (int part = 0; part < 2; part++)
                {
                    bool zPart = part == 1;
                    if (!zPart && onlyZ) continue;
                    int ntv = I32(u8, pos), nth = I32(u8, pos + 4);
                    int numBytes = I32(u8, pos + 8);
                    double maxVal = F32(u8, pos + 12);
                    pos += 16;
                    int payloadEnd = pos + numBytes;
                    if (numBytes < 0 || payloadEnd > u8.Length) Err("truncated Lerc1 section");
                    if (!zPart && ntv == 0 && nth == 0)
                    {
                        if (numBytes == 0)
                        {
                            for (int i = 0; i < H * W; i++) cnt[i] = (float)maxVal;
                            if (maxVal > 0) ignoreMask = true;
                        }
                        else
                        {
                            byte[] bits = RleDecompress(u8, pos, payloadEnd, (W * H + 7) >> 3);
                            for (int i = 0; i < H * W; i++) cnt[i] = (bits[i >> 3] >> (7 - (i & 7))) & 1;
                        }
                    }
                    else
                    {
                        if (ntv <= 0 || nth <= 0 || ntv > H || nth > W) Err("bad Lerc1 tile counts");
                        int p = pos;
                        foreach (int[] ir in Lerc1TileRanges(H, ntv))
                            foreach (int[] jr in Lerc1TileRanges(W, nth))
                                p = zPart ? ReadZTile(p, ir[0], ir[1], jr[0], jr[1], maxVal)
                                          : ReadCntTile(p, ir[0], ir[1], jr[0], jr[1]);
                    }
                    pos = payloadEnd;
                }
                res.cnts.Add((float[])cnt.Clone());
                res.zs.Add((float[])z.Clone());
                onlyZ = true;
                res.endPos = pos;
                if (pos >= u8.Length) break;
            }
            if (res.cnts.Count == 0) Err("no Lerc1 bands decoded");
            return res;
        }

        // ------------------------------------------------------------ blob walk / info

        internal class LercInfo
        {
            public int version, dt, nDepth, nCols, nRows, nBands, numValidPixel, nMasks, nUsesNoDataValue;
            public long blobSize;
            public double zMin, zMax, maxZError;
            public List<int> offsets = new List<int>();
            public bool isLerc1;
            public Lerc1Result lerc1;
            public List<double> lerc1Mins = new List<double>();
            public List<double> lerc1Maxs = new List<double>();
        }

        // Lerc::GetLercInfo analog: walk the band headers (Lerc2), or decode
        // fully (Lerc1, like the reference) and collect stats
        internal static LercInfo GetInfo(byte[] u8)
        {
            var info = new LercInfo();
            if (KeyAt(u8, 0, FILE_KEY_LERC1))
            {
                Lerc1Result r = Lerc1Decode(u8);
                info.isLerc1 = true;
                info.lerc1 = r;
                info.version = 0;
                info.dt = DT_FLOAT;
                info.nDepth = 1;
                info.nCols = r.W;
                info.nRows = r.H;
                info.nBands = r.cnts.Count;
                info.maxZError = r.maxZError;
                info.blobSize = r.endPos;
                info.zMin = double.MaxValue;
                info.zMax = -double.MaxValue;
                for (int b = 0; b < r.cnts.Count; b++)
                {
                    float[] cnt = r.cnts[b];
                    float[] z = r.zs[b];
                    int nValid = 0;
                    float zMin = float.MaxValue, zMax = -float.MaxValue;
                    for (int i = 0; i < r.H * r.W; i++)
                        if (cnt[i] > 0)
                        {
                            nValid++;
                            if (z[i] < zMin) zMin = z[i];
                            if (z[i] > zMax) zMax = z[i];
                        }
                    info.numValidPixel = nValid;
                    info.zMin = Math.Min(info.zMin, zMin);
                    info.zMax = Math.Max(info.zMax, zMax);
                    info.nMasks = nValid < r.W * r.H ? 1 : 0;
                    info.lerc1Mins.Add(zMin);
                    info.lerc1Maxs.Add(zMax);
                }
                return info;
            }

            Header first = ReadHeader(u8, 0);
            info.version = first.version;
            info.dt = first.dt;
            info.nDepth = first.nDepth;
            info.nCols = first.nCols;
            info.nRows = first.nRows;
            info.numValidPixel = first.numValidPixel;
            info.blobSize = first.blobSize;
            info.zMin = first.zMin;
            info.zMax = first.zMax;
            info.maxZError = first.maxZError;
            info.nUsesNoDataValue = first.bPassNoDataValues != 0 ? 1 : 0;
            info.offsets.Add(0);
            info.nBands = 1;
            if (info.blobSize > u8.Length) Err("truncated blob");
            int nbMask0 = I32(u8, first.headerSize);
            int nMasks = (nbMask0 > 0 || first.numValidPixel == 0) ? 1 : 0;
            bool tryNext = first.version <= 5 || first.nBlobsMore > 0;
            while (tryNext && info.blobSize < u8.Length)
            {
                Header h2;
                try { h2 = ReadHeader(u8, (int)info.blobSize); }
                catch (LercException) { break; }
                if (h2.nDepth != first.nDepth || h2.nCols != first.nCols ||
                    h2.nRows != first.nRows || h2.dt != first.dt) Err("inconsistent band headers");
                tryNext = h2.version <= 5 || h2.nBlobsMore > 0;
                if (h2.bPassNoDataValues != 0) info.nUsesNoDataValue++;
                int nbMask2 = I32(u8, (int)info.blobSize + h2.headerSize);
                if (nbMask2 > 0 || h2.numValidPixel != first.numValidPixel) nMasks = 2;
                if (info.blobSize + h2.blobSize > u8.Length) Err("truncated blob");
                info.zMin = Math.Min(info.zMin, h2.zMin);
                info.zMax = Math.Max(info.zMax, h2.zMax);
                info.maxZError = Math.Max(info.maxZError, h2.maxZError);
                info.offsets.Add((int)info.blobSize);
                info.blobSize += h2.blobSize;
                info.nBands++;
            }
            info.nMasks = nMasks > 1 ? info.nBands : nMasks;
            if (info.nUsesNoDataValue > 0) info.nUsesNoDataValue = info.nBands;
            return info;
        }

        // per-band, per-depth [min, max] from headers + ranges section only
        // (Lerc2::GetRanges analog, no pixel decode)
        static void ReadBandRanges(byte[] u8, int off, Header h, double[] mins, double[] maxs, int at)
        {
            int D = h.nDepth;
            if (h.numValidPixel == 0)
            {
                for (int d = 0; d < D; d++) { mins[at + d] = 0; maxs[at + d] = 0; }
                return;
            }
            if (h.version < 4 || h.zMin == h.zMax || D == 1)
            {
                for (int d = 0; d < D; d++) { mins[at + d] = h.zMin; maxs[at + d] = h.zMax; }
                return;
            }
            int pos = off + h.headerSize;
            int numBytesMask = I32(u8, pos); pos += 4;
            if (numBytesMask < 0 || numBytesMask > u8.Length - pos) Err("bad mask section size");
            pos += numBytesMask;
            for (int d = 0; d < D; d++) mins[at + d] = ReadVariableValue(u8, ref pos, h.dt);
            for (int d = 0; d < D; d++) maxs[at + d] = ReadVariableValue(u8, ref pos, h.dt);
        }

        static byte[] Slice(byte[] blob, uint blobSize)
        {
            long n = Math.Min((long)blobSize, blob.Length);
            if (n == blob.Length) return blob;
            var outv = new byte[n];
            Array.Copy(blob, outv, n);
            return outv;
        }

        // ------------------------------------------------------------ public C-API surface

        // lerc_getBlobInfo (Lerc_c_api.h): infoArray gets { version, dataType,
        // nDepth, nCols, nRows, nBands, nValidPixels, blobSize, nMasks,
        // nDepth, nUsesNoDataValue }; dataRangeArray { zMin, zMax, maxZErrorUsed }
        public static uint lerc_getBlobInfo(byte[] pLercBlob, uint blobSize,
            uint[] infoArray, double[] dataRangeArray, int infoArraySize, int dataRangeArraySize)
        {
            if (pLercBlob == null || blobSize == 0 || (infoArray == null && dataRangeArray == null)
                || (infoArraySize <= 0 && dataRangeArraySize <= 0))
                return WrongParam;
            byte[] u8 = Slice(pLercBlob, blobSize);
            LercInfo info;
            try { info = GetInfo(u8); }
            catch (LercException) { return Failed; }

            if (infoArray != null)
            {
                int ias = Math.Min(infoArraySize, infoArray.Length);
                for (int k = 0; k < ias; k++) infoArray[k] = 0;
                long[] vals = { info.version, info.dt, info.nDepth, info.nCols, info.nRows,
                                info.nBands, info.numValidPixel, info.blobSize, info.nMasks,
                                info.nDepth, info.nUsesNoDataValue };
                for (int k = 0; k < vals.Length && k < ias; k++) infoArray[k] = (uint)vals[k];
            }
            if (dataRangeArray != null)
            {
                int dras = Math.Min(dataRangeArraySize, dataRangeArray.Length);
                for (int k = 0; k < dras; k++) dataRangeArray[k] = 0;
                // for nDepth > 1 with noData mixed in, ranges may contain the
                // noData value: report -1 like the reference (Lerc_c_api_impl.cpp)
                bool bUsesNoData = info.nDepth > 1 && info.nUsesNoDataValue > 0;
                double[] vals = { !bUsesNoData ? info.zMin : -1, !bUsesNoData ? info.zMax : -1, info.maxZError };
                for (int k = 0; k < vals.Length && k < dras; k++) dataRangeArray[k] = vals[k];
            }
            return Ok;
        }

        // lerc_getDataRanges: [min, max] per depth and band, header reads only
        public static uint lerc_getDataRanges(byte[] pLercBlob, uint blobSize,
            int nDepth, int nBands, double[] mins, double[] maxs)
        {
            if (pLercBlob == null || blobSize == 0 || mins == null || maxs == null
                || nDepth <= 0 || nBands <= 0)
                return WrongParam;
            long nElem = (long)nDepth * nBands;
            if (mins.Length < nElem || maxs.Length < nElem) return WrongParam;
            byte[] u8 = Slice(pLercBlob, blobSize);
            LercInfo info;
            try { info = GetInfo(u8); }
            catch (LercException) { return Failed; }
            if (info.isLerc1)
            {
                for (int b = 0; b < info.nBands; b++)
                {
                    if (b + 1 > nElem) return BufferTooSmall;
                    mins[b] = info.lerc1Mins[b];
                    maxs[b] = info.lerc1Maxs[b];
                }
                return Ok;
            }
            try
            {
                for (int b = 0; b < info.nBands; b++)
                {
                    Header h = ReadHeader(u8, info.offsets[b]);
                    if ((long)(b + 1) * h.nDepth > nElem) return BufferTooSmall;
                    if (h.bPassNoDataValues != 0 && h.nDepth > 1) return HasNoData;
                    ReadBandRanges(u8, info.offsets[b], h, mins, maxs, b * h.nDepth);
                }
            }
            catch (LercException) { return Failed; }
            return Ok;
        }

        // shared decode core: validates like Lerc::DecodeTempl, decodes each
        // band, remaps noData, and hands every output value to `store`
        static uint DecodeCore(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, long dataLen,
            Action<long, double> store, byte[] pUsesNoData, double[] noDataValues)
        {
            if (pLercBlob == null || blobSize == 0 || dataType < 0 || dataType > 7
                || nDepth <= 0 || nCols <= 0 || nRows <= 0 || nBands <= 0)
                return WrongParam;
            if (!(nMasks == 0 || nMasks == 1 || nMasks == nBands) || (nMasks > 0 && pValidBytes == null))
                return WrongParam;
            long nValues = (long)nDepth * nCols * nRows * nBands;
            if (dataLen < nValues) return BufferTooSmall;
            if (nMasks > 0 && (long)pValidBytes.Length < (long)nMasks * nCols * nRows)
                return BufferTooSmall;
            byte[] u8 = Slice(pLercBlob, blobSize);

            if (KeyAt(u8, 0, FILE_KEY_LERC1))
            {
                Lerc1Result r;
                try { r = Lerc1Decode(u8); }
                catch (LercException) { return Failed; }
                if (r.W != nCols || r.H != nRows || nDepth != 1) return Failed;
                if (nBands > r.cnts.Count) return Failed;
                bool fltPnt = dataType == DT_FLOAT || dataType == DT_DOUBLE;
                for (int iBand = 0; iBand < nBands; iBand++)
                {
                    float[] cnt = r.cnts[iBand];
                    float[] z = r.zs[iBand];
                    long nPix = (long)iBand * nRows * nCols;
                    for (int k = 0; k < nRows * nCols; k++)
                    {
                        if (cnt[k] > 0)
                            store(nPix + k, fltPnt ? CastDt(z[k], dataType)
                                                   : CastDt(Math.Floor(z[k] + 0.5), dataType));
                        if (iBand < nMasks) pValidBytes[nPix + k] = (byte)(cnt[k] > 0 ? 1 : 0);
                    }
                }
                return Ok;
            }

            LercInfo info;
            try { info = GetInfo(u8); }
            catch (LercException) { return Failed; }
            // caller must provide room for the masks that are there
            if (nMasks < info.nMasks) return WrongParam;
            // caller cannot ask for more bands than are there
            if (nBands > info.nBands) return WrongParam;
            bool wantNoData = info.nUsesNoDataValue != 0 && nDepth > 1;
            if (wantNoData)
            {
                if (pUsesNoData == null || noDataValues == null) return HasNoData;
                if (pUsesNoData.Length < nBands || noDataValues.Length < nBands) return BufferTooSmall;
                for (int b = 0; b < nBands; b++) { pUsesNoData[b] = 0; noDataValues[b] = 0; }
            }
            byte[] prevMask = null;
            try
            {
                for (int iBand = 0; iBand < nBands; iBand++)
                {
                    Band band = DecodeBand(u8, info.offsets[iBand], prevMask, true);
                    if (band.h.nDepth != nDepth || band.h.nCols != nCols
                        || band.h.nRows != nRows || band.h.dt != dataType) return Failed;
                    prevMask = band.mask;
                    long nPix = (long)iBand * nRows * nCols;
                    if (wantNoData)
                    {
                        pUsesNoData[iBand] = (byte)(band.h.bPassNoDataValues != 0 ? 1 : 0);
                        noDataValues[iBand] = band.h.noDataValOrig;
                    }
                    if (band.h.bPassNoDataValues != 0)
                    {
                        // remap the internal noData back to the original value
                        double oldV = CastDt(band.h.noDataVal, band.h.dt);
                        double newV = CastDt(band.h.noDataValOrig, band.h.dt);
                        if (oldV != newV)
                        {
                            for (int i = 0; i < nRows * nCols; i++)
                            {
                                if (band.mask != null && band.mask[i] == 0) continue;
                                for (int d = 0; d < nDepth; d++)
                                    if (band.data[(long)i * nDepth + d] == oldV)
                                        band.data[(long)i * nDepth + d] = newV;
                            }
                        }
                    }
                    long nBandValues = (long)nRows * nCols * nDepth;
                    for (long k = 0; k < nBandValues; k++)
                        store(nPix * nDepth + k, band.data[k]);
                    if (iBand < nMasks)
                    {
                        for (int k = 0; k < nRows * nCols; k++)
                            pValidBytes[nPix + k] = band.mask == null ? (byte)1 : band.mask[k];
                    }
                }
            }
            catch (LercException) { return Failed; }
            return Ok;
        }

        // lerc_decode overloads, one per output pixel type (Lerc_c_api.h)

        public static uint lerc_decode(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, sbyte[] pData)
            => lerc_decode_4D(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands, dataType, pData, null, null);

        public static uint lerc_decode(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, byte[] pData)
            => lerc_decode_4D(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands, dataType, pData, null, null);

        public static uint lerc_decode(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, short[] pData)
            => lerc_decode_4D(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands, dataType, pData, null, null);

        public static uint lerc_decode(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, ushort[] pData)
            => lerc_decode_4D(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands, dataType, pData, null, null);

        public static uint lerc_decode(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, int[] pData)
            => lerc_decode_4D(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands, dataType, pData, null, null);

        public static uint lerc_decode(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, uint[] pData)
            => lerc_decode_4D(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands, dataType, pData, null, null);

        public static uint lerc_decode(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, float[] pData)
            => lerc_decode_4D(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands, dataType, pData, null, null);

        public static uint lerc_decode(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, double[] pData)
            => lerc_decode_4D(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands, dataType, pData, null, null);

        // lerc_decode_4D overloads: same + noData passthrough per band

        public static uint lerc_decode_4D(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, sbyte[] pData,
            byte[] pUsesNoData, double[] noDataValues)
        {
            if (pData == null) return WrongParam;
            return DecodeCore(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands,
                dataType, pData.Length, (i, v) => pData[i] = (sbyte)(long)CastDt(v, DT_CHAR),
                pUsesNoData, noDataValues);
        }

        public static uint lerc_decode_4D(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, byte[] pData,
            byte[] pUsesNoData, double[] noDataValues)
        {
            if (pData == null) return WrongParam;
            return DecodeCore(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands,
                dataType, pData.Length, (i, v) => pData[i] = (byte)(long)CastDt(v, DT_BYTE),
                pUsesNoData, noDataValues);
        }

        public static uint lerc_decode_4D(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, short[] pData,
            byte[] pUsesNoData, double[] noDataValues)
        {
            if (pData == null) return WrongParam;
            return DecodeCore(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands,
                dataType, pData.Length, (i, v) => pData[i] = (short)(long)CastDt(v, DT_SHORT),
                pUsesNoData, noDataValues);
        }

        public static uint lerc_decode_4D(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, ushort[] pData,
            byte[] pUsesNoData, double[] noDataValues)
        {
            if (pData == null) return WrongParam;
            return DecodeCore(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands,
                dataType, pData.Length, (i, v) => pData[i] = (ushort)(long)CastDt(v, DT_USHORT),
                pUsesNoData, noDataValues);
        }

        public static uint lerc_decode_4D(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, int[] pData,
            byte[] pUsesNoData, double[] noDataValues)
        {
            if (pData == null) return WrongParam;
            return DecodeCore(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands,
                dataType, pData.Length, (i, v) => pData[i] = (int)(long)CastDt(v, DT_INT),
                pUsesNoData, noDataValues);
        }

        public static uint lerc_decode_4D(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, uint[] pData,
            byte[] pUsesNoData, double[] noDataValues)
        {
            if (pData == null) return WrongParam;
            return DecodeCore(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands,
                dataType, pData.Length, (i, v) => pData[i] = (uint)(long)CastDt(v, DT_UINT),
                pUsesNoData, noDataValues);
        }

        public static uint lerc_decode_4D(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, float[] pData,
            byte[] pUsesNoData, double[] noDataValues)
        {
            if (pData == null) return WrongParam;
            return DecodeCore(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands,
                dataType, pData.Length, (i, v) => pData[i] = (float)v,
                pUsesNoData, noDataValues);
        }

        public static uint lerc_decode_4D(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, int dataType, double[] pData,
            byte[] pUsesNoData, double[] noDataValues)
        {
            if (pData == null) return WrongParam;
            return DecodeCore(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands,
                dataType, pData.Length, (i, v) => pData[i] = v,
                pUsesNoData, noDataValues);
        }

        // lerc_decodeToDouble: decode at the stored type, widen to double
        // (exact for every LERC dtype; Lerc_c_api_impl.cpp decode-then-convert)

        public static uint lerc_decodeToDouble(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, double[] pData)
            => lerc_decodeToDouble_4D(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands, pData, null, null);

        public static uint lerc_decodeToDouble_4D(byte[] pLercBlob, uint blobSize, int nMasks, byte[] pValidBytes,
            int nDepth, int nCols, int nRows, int nBands, double[] pData,
            byte[] pUsesNoData, double[] noDataValues)
        {
            if (pLercBlob == null || blobSize == 0 || pData == null
                || nDepth <= 0 || nCols <= 0 || nRows <= 0 || nBands <= 0)
                return WrongParam;
            if (!(nMasks == 0 || nMasks == 1 || nMasks == nBands) || (nMasks > 0 && pValidBytes == null))
                return WrongParam;
            LercInfo info;
            try { info = GetInfo(Slice(pLercBlob, blobSize)); }
            catch (LercException) { return Failed; }
            if (info.nDepth != nDepth || info.nCols != nCols || info.nRows != nRows || info.nBands != nBands)
                return Failed;
            return DecodeCore(pLercBlob, blobSize, nMasks, pValidBytes, nDepth, nCols, nRows, nBands,
                info.dt, pData.Length, (i, v) => pData[i] = v, pUsesNoData, noDataValues);
        }
    }
}
