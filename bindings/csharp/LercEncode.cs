// Pure-managed LERC2 (codec v6) ENCODER -- the encode half of the C#
// binding, mirroring the reference's managed encode surface
// (/root/reference/OtherLanguages/CSharp/LercCS_Impl_B.cs:155-308:
// ComputeEncodedSize<T> / Encode<T> with MaskType), but with no
// Lerc.dll/P-Invoke: the whole wire writer is managed code.
//
// Wire scope (all output decodable by ANY LERC reader, incl. the
// reference C++ library -- validated in CI by TestRunner + the oracle):
//   - header v6 + Fletcher32 checksum (Lerc2.cpp:710-917)
//   - RLE validity-mask section (RLE.cpp greedy MIN_NUM_EVEN rule)
//   - per-depth ranges section
//   - 8x8 micro-block tiling: const-0 / const-offset / raw / bit-stuffed
//     blocks with reduced offset dtypes (Lerc2.h:417-515)
//   - whole-image Huffman, direct + delta, for byte/sbyte lossless
//     (Lerc2.cpp:2311-2464)
//   - one-sweep fallback
// Encoder CHOICES the reference also has but this writer does not take
// (wire stays valid, ratios may be slightly larger on some data): LUT
// block mode, the 16x16 micro-block retrial, depth-diff slices, fpl
// lossless float compression, maxZError auto-raise / bit-plane cut.
//
// Statement-exact Python twin: bindings/csharp/cs_sim.py (LercEncodeSim
// section) -- keep both files in sync; tests/test_cs_binding.py pins this
// file's hash and round-trips sim-encoded blobs through the C++ oracle.
using System;
using System.Collections.Generic;

namespace LercTpu
{
    public enum MaskType
    {
        AllValid,
        SameMaskForAllBands,
        UniqueMaskForEveryBand,
    }

    public static class LercEncode
    {
        const int CURRENT_VERSION = 6;
        static readonly int[] DtSize = { 1, 1, 2, 2, 4, 4, 4, 8 };
        const int DT_CHAR = 0, DT_BYTE = 1, DT_SHORT = 2, DT_USHORT = 3,
                  DT_INT = 4, DT_UINT = 5, DT_FLOAT = 6, DT_DOUBLE = 7;

        // ---- public API (LercCS_Impl_B.cs:158-199 signature parity) ----

        public static uint ComputeEncodedSize<T>(ReadOnlySpan<T> rasterData,
                                                 int nDepth, int nCols, int nRows, int nBands,
                                                 MaskType maskType = MaskType.AllValid,
                                                 double maxZErr = 0d,
                                                 ReadOnlySpan<byte> pixelMasks = default)
            where T : unmanaged
        {
            return (uint)Encode(rasterData, nDepth, nCols, nRows, nBands,
                                maskType, maxZErr, pixelMasks).Length;
        }

        public static byte[] Encode<T>(ReadOnlySpan<T> rasterData,
                                       int nDepth, int nCols, int nRows, int nBands,
                                       MaskType maskType = MaskType.AllValid,
                                       double maxZErr = 0d,
                                       ReadOnlySpan<byte> pixelMasks = default)
            where T : unmanaged
        {
            int dt = GetLercDataType<T>();
            long nPix = (long)nRows * nCols;
            if (nDepth < 1 || nCols < 1 || nRows < 1 || nBands < 1)
                throw new ArgumentException("bad raster geometry");
            if (rasterData.Length < nPix * nDepth * nBands)
                throw new ArgumentException("rasterData too small");
            if (dt >= DT_FLOAT && maxZErr < 0)
                throw new ArgumentException("negative maxZError not allowed for float types");
            double mze = maxZErr;
            if (dt < DT_FLOAT)
                mze = Math.Max(0.5, Math.Floor(mze));

            int nMasks = maskType == MaskType.AllValid ? 0
                       : maskType == MaskType.SameMaskForAllBands ? 1 : nBands;
            if (nMasks > 0 && pixelMasks.Length < nMasks * nPix)
                throw new ArgumentException("pixelMasks too small");

            var output = new List<byte>();
            for (int b = 0; b < nBands; b++)
            {
                // values as double: exact for every supported dtype, and
                // narrowing casts restore the native bytes bit-for-bit
                double[] vals = new double[nPix * nDepth];
                long off = (long)b * nPix * nDepth;
                for (long i = 0; i < nPix * nDepth; i++)
                    vals[i] = ToDouble(rasterData[(int)(off + i)]);
                bool[] mask = new bool[nPix];
                if (nMasks == 0)
                    for (long i = 0; i < nPix; i++) mask[i] = true;
                else
                {
                    long moff = nMasks == 1 ? 0 : (long)b * nPix;
                    for (long i = 0; i < nPix; i++)
                        mask[i] = pixelMasks[(int)(moff + i)] != 0;
                }
                EncodeBand(output, vals, mask, nRows, nCols, nDepth, dt, mze,
                           nBands - 1 - b);
            }
            return output.ToArray();
        }

        // ---- per-band blob writer (Lerc2.cpp:179-480 semantics) ----

        static void EncodeBand(List<byte> output, double[] vals, bool[] mask,
                               int nRows, int nCols, int nDepth, int dt,
                               double mze, int nBlobsMore)
        {
            long nPix = (long)nRows * nCols;
            int numValid = 0;
            for (long i = 0; i < nPix; i++) if (mask[i]) numValid++;
            bool allValid = numValid == nPix;

            byte[] maskSection = BuildMaskSection(mask, nRows, nCols, numValid);

            double zMin = 0, zMax = 0;
            double[] zMinVec = new double[nDepth];
            double[] zMaxVec = new double[nDepth];
            if (numValid > 0)
            {
                for (int d = 0; d < nDepth; d++)
                {
                    double mn = double.PositiveInfinity, mx = double.NegativeInfinity;
                    for (long i = 0; i < nPix; i++)
                        if (mask[i])
                        {
                            double v = vals[i * nDepth + d];
                            if (v < mn) mn = v;
                            if (v > mx) mx = v;
                        }
                    zMinVec[d] = mn; zMaxVec[d] = mx;
                }
                zMin = zMinVec[0]; zMax = zMaxVec[0];
                for (int d = 1; d < nDepth; d++)
                {
                    if (zMinVec[d] < zMin) zMin = zMinVec[d];
                    if (zMaxVec[d] > zMax) zMax = zMaxVec[d];
                }
            }

            if (numValid == 0 || zMin == zMax)
            {
                Assemble(output, nRows, nCols, nDepth, numValid, 8, dt, mze,
                         zMin, zMax, nBlobsMore, maskSection,
                         RangesSection(zMinVec, zMaxVec, dt, numValid, zMin, zMax, nDepth),
                         Array.Empty<byte>());
                return;
            }

            byte[] ranges = RangesSection(zMinVec, zMaxVec, dt, numValid, zMin, zMax, nDepth);
            bool allRangesConst = true;
            for (int d = 0; d < nDepth; d++)
                if (zMinVec[d] != zMaxVec[d]) { allRangesConst = false; break; }
            if (allRangesConst)
            {
                Assemble(output, nRows, nCols, nDepth, numValid, 8, dt, mze,
                         zMin, zMax, nBlobsMore, maskSection, ranges, Array.Empty<byte>());
                return;
            }

            byte[] tiling = WriteTiles(vals, mask, nRows, nCols, nDepth, dt, mze);
            byte[] payload = tiling;
            int imageMode = 0;  // TILING
            bool tryHuffman = dt <= DT_BYTE && mze == 0.5;

            if (tryHuffman)
            {
                byte[] hm = EncodeHuffmanInt(vals, mask, nRows, nCols, nDepth, dt,
                                             out int hMode);
                if (hm != null && hm.Length < tiling.Length)
                {
                    payload = hm; imageMode = hMode;
                }
            }

            long nOneSweep = (long)DtSize[dt] * nDepth * numValid;
            byte[] body;
            if (nOneSweep <= payload.Length + (tryHuffman ? 1 : 0))
            {
                var sweep = new List<byte> { 1 };
                for (long i = 0; i < nPix; i++)
                    if (mask[i])
                        for (int d = 0; d < nDepth; d++)
                            WriteNative(sweep, vals[i * nDepth + d], dt);
                body = sweep.ToArray();
            }
            else
            {
                var bl = new List<byte> { 0 };
                if (tryHuffman) bl.Add((byte)imageMode);
                bl.AddRange(payload);
                body = bl.ToArray();
            }
            Assemble(output, nRows, nCols, nDepth, numValid, 8, dt, mze,
                     zMin, zMax, nBlobsMore, maskSection, ranges, body);
        }

        static byte[] RangesSection(double[] zMinVec, double[] zMaxVec, int dt,
                                    int numValid, double zMin, double zMax, int nDepth)
        {
            // v >= 4 writes per-depth min/max in the native dtype, but only
            // for non-trivial blobs (empty / zMin==zMax blobs skip it)
            if (numValid == 0 || zMin == zMax) return Array.Empty<byte>();
            var outp = new List<byte>();
            for (int d = 0; d < nDepth; d++) WriteNative(outp, zMinVec[d], dt);
            for (int d = 0; d < nDepth; d++) WriteNative(outp, zMaxVec[d], dt);
            return outp.ToArray();
        }

        static byte[] BuildMaskSection(bool[] mask, int nRows, int nCols, int numValid)
        {
            var outp = new List<byte>();
            long nPix = (long)nRows * nCols;
            if (numValid > 0 && numValid < nPix)
            {
                // MSB-first bit packing, pad bits set to 1 (BitMask.cpp)
                int nBytes = (int)((nPix + 7) >> 3);
                byte[] bits = new byte[nBytes];
                for (long i = 0; i < nPix; i++)
                    if (mask[i]) bits[i >> 3] |= (byte)(0x80 >> (int)(i & 7));
                int pad = nBytes * 8 - (int)nPix;
                if (pad > 0) bits[nBytes - 1] |= (byte)((1 << pad) - 1);
                byte[] rle = RleCompress(bits);
                WriteInt32(outp, rle.Length);
                outp.AddRange(rle);
            }
            else
                WriteInt32(outp, 0);
            return outp.ToArray();
        }

        // ---- 8x8 micro-block tiling (Lerc2.cpp:1495-1799) ----

        static byte[] WriteTiles(double[] vals, bool[] mask, int nRows, int nCols,
                                 int nDepth, int dt, double mze)
        {
            const int MB = 8;
            int nbv = (nRows + MB - 1) / MB, nbh = (nCols + MB - 1) / MB;
            double scale = mze > 0 ? 1.0 / (2 * mze) : 0.0;
            long maxValQuant = dt <= DT_USHORT ? (1 << 15) - 1 : (1 << 30) - 1;
            var outp = new List<byte>();
            double[] blk = new double[MB * MB];
            uint[] quant = new uint[MB * MB];

            for (int bi = 0; bi < nbv; bi++)
                for (int bj = 0; bj < nbh; bj++)
                {
                    int i0 = bi * MB, j0 = bj * MB;
                    int h = Math.Min(MB, nRows - i0), w = Math.Min(MB, nCols - j0);
                    int flag = (((j0 >> 3) & 15) << 2) & 0b111000;  // v >= 5

                    for (int d = 0; d < nDepth; d++)
                    {
                        // gather the block's valid values in row-major order
                        int cnt = 0;
                        double bmn = double.PositiveInfinity, bmx = double.NegativeInfinity;
                        for (int i = 0; i < h; i++)
                            for (int j = 0; j < w; j++)
                            {
                                long p = (long)(i0 + i) * nCols + (j0 + j);
                                if (!mask[p]) continue;
                                double v = vals[p * nDepth + d];
                                blk[cnt++] = v;
                                if (v < bmn) bmn = v;
                                if (v > bmx) bmx = v;
                            }
                        if (cnt == 0 || (bmn == 0 && bmx == 0))
                        {
                            outp.Add((byte)(flag | 2));  // const 0
                            continue;
                        }
                        double maxVal = mze > 0 ? (bmx - bmn) * scale : 0.0;
                        bool forceRaw = (mze == 0 && bmx > bmn)
                                        || (mze > 0 && maxVal > maxValQuant);
                        long nBytesRaw = 1 + (long)cnt * DtSize[dt];
                        if (forceRaw)
                        {
                            outp.Add((byte)flag);
                            for (int k = 0; k < cnt; k++) WriteNative(outp, blk[k], dt);
                            continue;
                        }
                        long maxElem = (long)Math.Floor(maxVal + 0.5);
                        uint qMax = 0;
                        for (int k = 0; k < cnt; k++)
                        {
                            quant[k] = (uint)(long)Math.Floor((blk[k] - bmn) * scale + 0.5);
                            if (quant[k] > qMax) qMax = quant[k];
                        }
                        int tc = ReduceDataType(bmn, dt, out int dtReduced);
                        long nBytes = 1 + DtSize[dtReduced];
                        if (maxElem > 0)
                            nBytes += ComputeBytesSimple(cnt, maxElem);
                        if (nBytes >= nBytesRaw)
                        {
                            outp.Add((byte)flag);
                            for (int k = 0; k < cnt; k++) WriteNative(outp, blk[k], dt);
                            continue;
                        }
                        int modeBits = (maxElem == 0 ? 3 : 1) | (tc << 6);
                        outp.Add((byte)(flag | modeBits));
                        WriteNative(outp, bmn, dtReduced);
                        if (maxElem > 0)
                            StuffSimple(outp, quant, cnt, qMax);
                    }
                }
            return outp.ToArray();
        }

        // (type code for flag bits 6-7, reduced DataType) -- Lerc2.h:457-515
        static int ReduceDataType(double z, int dt, out int dtReduced)
        {
            bool isByte = z >= 0 && z <= 255 && z == Math.Floor(z);
            bool isShort = z >= -32768 && z <= 32767 && z == Math.Floor(z);
            bool isChar = z >= -128 && z <= 127 && z == Math.Floor(z);
            bool isUShort = z >= 0 && z <= 65535 && z == Math.Floor(z);
            int tc;
            switch (dt)
            {
                case DT_SHORT:
                    tc = isChar ? 2 : isByte ? 1 : 0; dtReduced = dt - tc; return tc;
                case DT_USHORT:
                    tc = isByte ? 1 : 0; dtReduced = dt - 2 * tc; return tc;
                case DT_INT:
                    tc = isByte ? 3 : isShort ? 2 : isUShort ? 1 : 0;
                    dtReduced = dt - tc; return tc;
                case DT_UINT:
                    tc = isByte ? 2 : isUShort ? 1 : 0; dtReduced = dt - 2 * tc; return tc;
                case DT_FLOAT:
                    tc = isByte ? 2 : isShort ? 1 : 0;
                    dtReduced = tc == 0 ? dt : (tc == 1 ? DT_SHORT : DT_BYTE); return tc;
                case DT_DOUBLE:
                    bool isInt32 = z >= -2147483648.0 && z <= 2147483647.0 && z == Math.Floor(z);
                    bool isF32 = (double)(float)z == z;
                    tc = isShort ? 3 : isInt32 ? 2 : isF32 ? 1 : 0;
                    dtReduced = tc == 0 ? dt : dt - 2 * tc + 1; return tc;
                default:
                    dtReduced = dt; return 0;  // char, byte
            }
        }

        // ---- BitStuffer2 simple mode, v >= 3 LSB-first (BitStuffer2.cpp) ----

        static int NumBitsNeeded(long maxElem)
        {
            int nb = 0;
            while (maxElem > 0) { nb++; maxElem >>= 1; }
            return nb;
        }

        static long ComputeBytesSimple(int numElements, long maxElem)
        {
            int nb = NumBitsNeeded(maxElem);
            int w = numElements < 256 ? 1 : numElements < 65536 ? 2 : 4;
            return 1 + w + (((long)numElements * nb + 7) >> 3);
        }

        static void StuffSimple(List<byte> outp, uint[] values, int n, uint qMax)
        {
            int nb = NumBitsNeeded(qMax);
            int w = n < 256 ? 1 : n < 65536 ? 2 : 4;
            outp.Add((byte)(nb | ((w == 4 ? 0 : 3 - w) << 6)));
            for (int k = 0; k < w; k++) outp.Add((byte)((n >> (8 * k)) & 0xFF));
            if (nb == 0) return;
            ulong acc = 0;
            int accBits = 0;
            for (int k = 0; k < n; k++)
            {
                acc |= (ulong)values[k] << accBits;
                accBits += nb;
                while (accBits >= 8)
                {
                    outp.Add((byte)(acc & 0xFF));
                    acc >>= 8; accBits -= 8;
                }
            }
            if (accBits > 0) outp.Add((byte)(acc & 0xFF));
        }

        // ---- whole-image Huffman, byte/sbyte lossless (Lerc2.cpp:2311+) ----

        static byte[] EncodeHuffmanInt(double[] vals, bool[] mask, int nRows,
                                       int nCols, int nDepth, int dt, out int mode)
        {
            mode = 0;
            int offset = dt == DT_CHAR ? 128 : 0;
            long nPix = (long)nRows * nCols;

            // direct symbols: pixel-major over valid pixels
            var direct = new List<byte>();
            for (long i = 0; i < nPix; i++)
                if (mask[i])
                    for (int d = 0; d < nDepth; d++)
                        direct.Add((byte)(((int)vals[i * nDepth + d] + offset) & 0xFF));

            // delta symbols: per depth plane over valid pixels in scan order;
            // prev = value above when the left neighbor is invalid and the
            // above neighbor is valid, else the previous valid value in scan
            // order (0 before the first); native wraparound (Lerc2.cpp:2380)
            var delta = new List<byte>();
            for (int d = 0; d < nDepth; d++)
            {
                int prev = 0;
                bool first = true;
                for (long i = 0; i < nPix; i++)
                {
                    if (!mask[i]) continue;
                    long row = i / nCols, col = i % nCols;
                    int v = (int)vals[i * nDepth + d];
                    bool leftOk = col > 0 && mask[i - 1];
                    bool aboveOk = row > 0 && mask[i - nCols];
                    int p = (!leftOk && aboveOk) ? (int)vals[(i - nCols) * nDepth + d]
                          : first ? 0 : prev;
                    int dv = dt == DT_CHAR ? (sbyte)(v - p) : (byte)(v - p);
                    delta.Add((byte)((dv + offset) & 0xFF));
                    prev = v;
                    first = false;
                }
            }

            byte[] enc0 = HuffmanEncodeStream(direct);   // v >= 4: direct allowed
            byte[] enc1 = HuffmanEncodeStream(delta);
            if (enc0 == null && enc1 == null) return null;
            if (enc0 != null && (enc1 == null || enc0.Length <= enc1.Length))
            {
                mode = 2;  // HUFFMAN
                return enc0;
            }
            mode = 1;  // DELTA_HUFFMAN
            return enc1;
        }

        static byte[] HuffmanEncodeStream(List<byte> symbols)
        {
            var histo = new long[256];
            foreach (byte s in symbols) histo[s]++;
            int[] lengths = HuffmanCodeLengths(histo);
            if (lengths == null) return null;
            uint[] codes = CanonicalCodes(lengths);
            var outp = new List<byte>();
            if (!WriteCodeTable(outp, lengths, codes)) return null;
            // symbol stream: MSB-first over LE uint32 words + 1 pad word
            var bw = new BitWriterMSB(outp);
            foreach (byte s in symbols) bw.Write(codes[s], lengths[s]);
            bw.Flush(padUints: 1);
            return outp.ToArray();
        }

        static int[] HuffmanCodeLengths(long[] histo)
        {
            // binary heap of (weight, serial) -> tree; lengths by DFS depth.
            // Tie-breaks differ from std::priority_queue (wire-valid: the
            // table carries explicit lengths + codes).
            var weight = new List<long>();
            var left = new List<int>();
            var right = new List<int>();
            var leafSym = new List<int>();
            var heap = new List<int>();  // node indices, min-heap by (weight, index)
            for (int i = 0; i < 256; i++)
                if (histo[i] > 0)
                {
                    weight.Add(histo[i]); left.Add(-1); right.Add(-1); leafSym.Add(i);
                    heap.Add(weight.Count - 1);
                }
            if (heap.Count < 2) return null;
            Comparison<int> cmp = (a, b) =>
                weight[a] != weight[b] ? weight[a].CompareTo(weight[b]) : a.CompareTo(b);
            heap.Sort(cmp);
            var list = new LinkedList<int>(heap);
            while (list.Count > 1)
            {
                int n0 = list.First.Value; list.RemoveFirst();
                int n1 = list.First.Value; list.RemoveFirst();
                weight.Add(weight[n0] + weight[n1]); left.Add(n0); right.Add(n1); leafSym.Add(-1);
                int node = weight.Count - 1;
                // ordered insert keeps the pop order a valid Huffman merge
                var cur = list.First;
                while (cur != null && cmp(cur.Value, node) < 0) cur = cur.Next;
                if (cur == null) list.AddLast(node); else list.AddBefore(cur, node);
            }
            var lengths = new int[256];
            var stack = new Stack<(int, int)>();
            stack.Push((list.First.Value, 0));
            while (stack.Count > 0)
            {
                var (node, depth) = stack.Pop();
                if (leafSym[node] >= 0)
                {
                    if (depth > 32) return null;
                    lengths[leafSym[node]] = Math.Max(depth, 0);
                }
                else
                {
                    stack.Push((left[node], depth + 1));
                    stack.Push((right[node], depth + 1));
                }
            }
            return lengths;
        }

        static uint[] CanonicalCodes(int[] lengths)
        {
            // canonical assignment (Huffman.cpp:541-572): stable sort by
            // (length desc, symbol asc), then code >>= (len drop), code++
            int size = lengths.Length;
            var order = new List<int>();
            for (int i = 0; i < size; i++) if (lengths[i] > 0) order.Add(i);
            order.Sort((a, b) => lengths[a] != lengths[b]
                       ? lengths[b].CompareTo(lengths[a]) : a.CompareTo(b));
            var codes = new uint[size];
            if (order.Count == 0) return codes;
            int codeLen = lengths[order[0]];
            uint code = 0;
            foreach (int idx in order)
            {
                int dl = codeLen - lengths[idx];
                code >>= dl; codeLen -= dl;
                codes[idx] = code;
                code++;
            }
            return codes;
        }

        static bool WriteCodeTable(List<byte> outp, int[] lengths, uint[] codes)
        {
            // range with wrap-around (Huffman.cpp:383-438)
            int size = lengths.Length;
            int i0 = -1, i1 = -1;
            for (int i = 0; i < size; i++)
                if (lengths[i] > 0) { if (i0 < 0) i0 = i; i1 = i + 1; }
            if (i0 < 0) return false;
            int bestK0 = 0, bestLen = 0, j = 0;
            while (j < size)
            {
                while (j < size && lengths[j] > 0) j++;
                int k0 = j;
                while (j < size && lengths[j] == 0) j++;
                if (j - k0 > bestLen) { bestK0 = k0; bestLen = j - k0; }
            }
            if (size - bestLen < i1 - i0)
            {
                i0 = bestK0 + bestLen;
                i1 = bestK0 + size;  // wrap around
            }
            int maxLen = 0;
            for (int i = i0; i < i1; i++)
                if (lengths[i % size] > maxLen) maxLen = lengths[i % size];
            if (maxLen <= 0 || maxLen > 32) return false;

            WriteInt32(outp, 3);  // HUFFMAN_VERSION
            WriteInt32(outp, size);
            WriteInt32(outp, i0);
            WriteInt32(outp, i1);
            var lens = new uint[i1 - i0];
            uint lmax = 0;
            for (int i = i0; i < i1; i++)
            {
                lens[i - i0] = (uint)lengths[i % size];
                if (lens[i - i0] > lmax) lmax = lens[i - i0];
            }
            StuffSimple(outp, lens, lens.Length, lmax);
            var bw = new BitWriterMSB(outp);
            for (int i = i0; i < i1; i++)
            {
                int k = i % size;
                if (lengths[k] > 0) bw.Write(codes[k], lengths[k]);
            }
            bw.Flush(padUints: 0);
            return true;
        }

        // MSB-first bit writer over little-endian uint32 words (Huffman wire)
        class BitWriterMSB
        {
            readonly List<byte> outp;
            uint word;
            int bitPos;  // bits already written into the current word

            public BitWriterMSB(List<byte> o) { outp = o; }

            public void Write(uint code, int len)
            {
                while (len > 0)
                {
                    int take = Math.Min(len, 32 - bitPos);
                    uint piece = (code >> (len - take)) & (take == 32 ? 0xFFFFFFFF : ((1u << take) - 1));
                    word |= piece << (32 - bitPos - take);
                    bitPos += take; len -= take;
                    if (bitPos == 32) { EmitWord(); word = 0; bitPos = 0; }
                }
            }

            public void Flush(int padUints)
            {
                if (bitPos > 0) { EmitWord(); word = 0; bitPos = 0; }
                for (int k = 0; k < padUints; k++) { EmitWord(); }
            }

            void EmitWord()
            {
                outp.Add((byte)(word & 0xFF));
                outp.Add((byte)((word >> 8) & 0xFF));
                outp.Add((byte)((word >> 16) & 0xFF));
                outp.Add((byte)((word >> 24) & 0xFF));
            }
        }

        // ---- RLE (RLE.cpp wire: int16 counts, MIN_NUM_EVEN=5 greedy) ----

        static byte[] RleCompress(byte[] arr)
        {
            const int MIN_NUM_EVEN = 5, CAP = 32767;
            int n = arr.Length;
            var outp = new List<byte>();
            var lit = new List<byte>();

            void FlushLiteral()
            {
                int pos = 0;
                while (pos < lit.Count)
                {
                    int c = Math.Min(CAP, lit.Count - pos);
                    outp.Add((byte)(c & 0xFF)); outp.Add((byte)((c >> 8) & 0xFF));
                    for (int k = 0; k < c; k++) outp.Add(lit[pos + k]);
                    pos += c;
                }
                lit.Clear();
            }

            int i = 0;
            while (i < n)
            {
                int runLen = 1;
                while (i + runLen < n && arr[i + runLen] == arr[i]) runLen++;
                // repeat run iff >= MIN_NUM_EVEN bytes with lookahead room
                if (runLen >= MIN_NUM_EVEN && i + MIN_NUM_EVEN < n)
                {
                    FlushLiteral();
                    int remaining = runLen;
                    while (remaining > CAP)
                    {
                        short c = -CAP;
                        outp.Add((byte)(c & 0xFF)); outp.Add((byte)((c >> 8) & 0xFF));
                        outp.Add(arr[i]);
                        remaining -= CAP;
                    }
                    short cl = (short)(-remaining);
                    outp.Add((byte)(cl & 0xFF)); outp.Add((byte)((cl >> 8) & 0xFF));
                    outp.Add(arr[i]);
                }
                else
                    for (int k = 0; k < runLen; k++) lit.Add(arr[i + k]);
                i += runLen;
            }
            FlushLiteral();
            outp.Add(0x00); outp.Add(0x80);  // EOF = -32768
            return outp.ToArray();
        }

        // ---- header + checksum (Lerc2.cpp:710-917) ----

        static void Assemble(List<byte> output, int nRows, int nCols, int nDepth,
                             int numValid, int microBlock, int dt, double mze,
                             double zMin, double zMax, int nBlobsMore,
                             byte[] maskSection, byte[] ranges, byte[] body)
        {
            const int HEADER_SIZE = 90;  // v6
            int blobSize = HEADER_SIZE + maskSection.Length + ranges.Length + body.Length;
            var blob = new List<byte>(blobSize);
            blob.AddRange(System.Text.Encoding.ASCII.GetBytes("Lerc2 "));
            WriteInt32(blob, CURRENT_VERSION);
            WriteInt32(blob, 0);  // checksum placeholder
            WriteInt32(blob, nRows);
            WriteInt32(blob, nCols);
            WriteInt32(blob, nDepth);
            WriteInt32(blob, numValid);
            WriteInt32(blob, microBlock);
            WriteInt32(blob, blobSize);
            WriteInt32(blob, dt);
            WriteInt32(blob, nBlobsMore);
            blob.Add(0); blob.Add(0); blob.Add(0); blob.Add(0);  // flag bytes
            WriteDouble(blob, mze);
            WriteDouble(blob, zMin);
            WriteDouble(blob, zMax);
            WriteDouble(blob, 0.0);  // noDataVal
            WriteDouble(blob, 0.0);  // noDataValOrig
            blob.AddRange(maskSection);
            blob.AddRange(ranges);
            blob.AddRange(body);

            byte[] arr = blob.ToArray();
            const int SKIP = 14;  // key + version + checksum
            uint checksum = Fletcher32(arr, SKIP, arr.Length);
            arr[10] = (byte)(checksum & 0xFF);
            arr[11] = (byte)((checksum >> 8) & 0xFF);
            arr[12] = (byte)((checksum >> 16) & 0xFF);
            arr[13] = (byte)((checksum >> 24) & 0xFF);
            output.AddRange(arr);
        }

        static uint Fletcher32(byte[] u8, int start, int end)
        {
            // word = byte pairs big-endian-ish per the reference
            // (Lerc2.cpp:924-955): sum1/sum2 mod 0xFFFF
            ulong sum1 = 0xFFFF, sum2 = 0xFFFF;
            int len = end - start;
            int pos = start;
            int words = len / 2;
            while (words > 0)
            {
                int block = Math.Min(words, 359);
                words -= block;
                for (int k = 0; k < block; k++)
                {
                    sum1 += (ulong)(u8[pos] << 8); pos++;
                    sum2 += sum1 += u8[pos]; pos++;
                }
                sum1 = (sum1 & 0xFFFF) + (sum1 >> 16);
                sum2 = (sum2 & 0xFFFF) + (sum2 >> 16);
            }
            if ((len & 1) != 0)
            {
                sum2 += sum1 += (ulong)(u8[pos] << 8);
            }
            sum1 = (sum1 & 0xFFFF) + (sum1 >> 16);
            sum2 = (sum2 & 0xFFFF) + (sum2 >> 16);
            return (uint)((sum2 << 16) | sum1);
        }

        // ---- little helpers ----

        static void WriteInt32(List<byte> o, int v)
        {
            o.Add((byte)(v & 0xFF)); o.Add((byte)((v >> 8) & 0xFF));
            o.Add((byte)((v >> 16) & 0xFF)); o.Add((byte)((v >> 24) & 0xFF));
        }

        static void WriteDouble(List<byte> o, double v)
        {
            ulong b = (ulong)BitConverter.DoubleToInt64Bits(v);
            for (int k = 0; k < 8; k++) o.Add((byte)((b >> (8 * k)) & 0xFF));
        }

        static void WriteNative(List<byte> o, double v, int dt)
        {
            switch (dt)
            {
                case DT_CHAR: o.Add((byte)(sbyte)v); break;
                case DT_BYTE: o.Add((byte)v); break;
                case DT_SHORT:
                    { short s = (short)v; o.Add((byte)(s & 0xFF)); o.Add((byte)((s >> 8) & 0xFF)); }
                    break;
                case DT_USHORT:
                    { ushort s = (ushort)v; o.Add((byte)(s & 0xFF)); o.Add((byte)((s >> 8) & 0xFF)); }
                    break;
                case DT_INT: WriteInt32(o, (int)v); break;
                case DT_UINT: WriteInt32(o, unchecked((int)(uint)v)); break;
                case DT_FLOAT:
                    {
                        uint b = (uint)BitConverter.SingleToInt32Bits((float)v);
                        o.Add((byte)(b & 0xFF)); o.Add((byte)((b >> 8) & 0xFF));
                        o.Add((byte)((b >> 16) & 0xFF)); o.Add((byte)((b >> 24) & 0xFF));
                    }
                    break;
                default: WriteDouble(o, v); break;
            }
        }

        static double ToDouble<T>(T v) where T : unmanaged
        {
            return v switch
            {
                sbyte x => x, byte x => x, short x => x, ushort x => x,
                int x => x, uint x => x, float x => x, double x => x,
                _ => throw new NotSupportedException(typeof(T).Name),
            };
        }

        static int GetLercDataType<T>() where T : unmanaged
        {
            if (typeof(T) == typeof(sbyte)) return DT_CHAR;
            if (typeof(T) == typeof(byte)) return DT_BYTE;
            if (typeof(T) == typeof(short)) return DT_SHORT;
            if (typeof(T) == typeof(ushort)) return DT_USHORT;
            if (typeof(T) == typeof(int)) return DT_INT;
            if (typeof(T) == typeof(uint)) return DT_UINT;
            if (typeof(T) == typeof(float)) return DT_FLOAT;
            if (typeof(T) == typeof(double)) return DT_DOUBLE;
            throw new NotSupportedException(typeof(T).Name);
        }
    }
}
