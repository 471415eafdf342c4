// Conformance runner for the pure-managed LERC decoder (LercDecode.cs):
// decodes every oracle vector on a real CLR and bit-compares valid pixels
// and masks against the reference C++ library's output (VERDICT r3
// missing #1 -- the C# twin of bindings/js/test/run_node.mjs).
//
// Usage: LercTpuTestRunner <vectors.json>   (exit 0 = all pass)
using System;
using System.Collections.Generic;
using System.IO;
using System.Text.Json;
using LercTpu;

namespace LercTpu.Tests
{
    public static class Program
    {
        static readonly int[] DtSize = { 1, 1, 2, 2, 4, 4, 4, 8 };

        public static int Main(string[] args)
        {
            string path = args.Length > 0 ? args[0]
                : Path.Combine("bindings", "js", "test", "vectors.json");
            using JsonDocument doc = JsonDocument.Parse(File.ReadAllText(path));
            var failures = new List<string>();
            int total = 0;
            byte[] california = null;

            foreach (JsonElement vec in doc.RootElement.EnumerateArray())
            {
                total++;
                string name = vec.GetProperty("name").GetString();
                try
                {
                    byte[] blob = Convert.FromBase64String(vec.GetProperty("blob").GetString());
                    if (name == "golden-california") california = blob;
                    RunVector(name, blob, vec.GetProperty("expected"));
                }
                catch (Exception e)
                {
                    failures.Add($"{name}: {e.Message}");
                }
            }

            // hostile probes: nonzero return (or LercException), never a crash
            var hostile = new (string, byte[])[]
            {
                ("trunc40", Slice(california, 40)),
                ("garbage", System.Text.Encoding.ASCII.GetBytes("garbagegarbagegarbagegarbage")),
                ("empty", new byte[0]),
                ("bitflip", BitFlip(california, 200)),
            };
            foreach (var (hname, bad) in hostile)
            {
                total++;
                try
                {
                    uint[] info = new uint[11];
                    double[] dr = new double[3];
                    uint rc = LercDecode.lerc_getBlobInfo(bad, (uint)bad.Length, info, dr, 11, 3);
                    if (rc == 0)
                    {
                        float[] data = new float[Math.Max(1, info[3] * info[4])];
                        rc = LercDecode.lerc_decode(bad, (uint)bad.Length, 0, null,
                            1, (int)info[3], (int)info[4], 1, (int)info[1], data);
                    }
                    if (rc == 0) failures.Add($"hostile-{hname}: accepted hostile blob");
                }
                catch (LercException) { /* also acceptable */ }
                catch (Exception e)
                {
                    failures.Add($"hostile-{hname}: non-Lerc exception {e.GetType().Name}");
                }
            }

            // ---- ENCODER conformance (LercEncode.cs): re-encode each
            // encode-vector input and byte-compare against the blob the
            // statement-exact Python twin produced (cs_sim.py); the twin's
            // blobs are separately round-tripped through the reference C++
            // oracle by tests/test_cs_binding.py, so byte equality here
            // certifies the real-CLR output as reference-decodable.
            string encPath = args.Length > 1 ? args[1]
                : Path.Combine(Path.GetDirectoryName(path) ?? ".", "encode_vectors.json");
            if (File.Exists(encPath))
            {
                using JsonDocument encDoc = JsonDocument.Parse(File.ReadAllText(encPath));
                foreach (JsonElement vec in encDoc.RootElement.EnumerateArray())
                {
                    total++;
                    string name = vec.GetProperty("name").GetString();
                    try { RunEncodeVector(vec); }
                    catch (Exception e) { failures.Add($"{name}: {e.Message}"); }
                }
            }
            else
                Console.Error.WriteLine($"note: no encode vectors at {encPath}");

            Console.WriteLine($"{total - failures.Count}/{total} passed");
            foreach (string f in failures) Console.Error.WriteLine("FAIL " + f);
            return failures.Count == 0 ? 0 : 1;
        }

        static void RunEncodeVector(JsonElement vec)
        {
            int dtype = vec.GetProperty("dtype").GetInt32();
            int nDepth = vec.GetProperty("nDepth").GetInt32();
            int nCols = vec.GetProperty("nCols").GetInt32();
            int nRows = vec.GetProperty("nRows").GetInt32();
            int nBands = vec.GetProperty("nBands").GetInt32();
            var maskType = (MaskType)vec.GetProperty("maskType").GetInt32();
            double maxZErr = vec.GetProperty("maxZErr").GetDouble();
            byte[] raster = Convert.FromBase64String(vec.GetProperty("raster").GetString());
            JsonElement masksEl = vec.GetProperty("masks");
            byte[] masks = masksEl.ValueKind == JsonValueKind.Null
                ? Array.Empty<byte>() : Convert.FromBase64String(masksEl.GetString());
            byte[] expected = Convert.FromBase64String(vec.GetProperty("expected_blob").GetString());

            byte[] got = dtype switch
            {
                0 => LercEncode.Encode<sbyte>(FromBytes<sbyte>(raster), nDepth, nCols, nRows, nBands, maskType, maxZErr, masks),
                1 => LercEncode.Encode<byte>(raster, nDepth, nCols, nRows, nBands, maskType, maxZErr, masks),
                2 => LercEncode.Encode<short>(FromBytes<short>(raster), nDepth, nCols, nRows, nBands, maskType, maxZErr, masks),
                3 => LercEncode.Encode<ushort>(FromBytes<ushort>(raster), nDepth, nCols, nRows, nBands, maskType, maxZErr, masks),
                4 => LercEncode.Encode<int>(FromBytes<int>(raster), nDepth, nCols, nRows, nBands, maskType, maxZErr, masks),
                5 => LercEncode.Encode<uint>(FromBytes<uint>(raster), nDepth, nCols, nRows, nBands, maskType, maxZErr, masks),
                6 => LercEncode.Encode<float>(FromBytes<float>(raster), nDepth, nCols, nRows, nBands, maskType, maxZErr, masks),
                7 => LercEncode.Encode<double>(FromBytes<double>(raster), nDepth, nCols, nRows, nBands, maskType, maxZErr, masks),
                _ => throw new Exception($"dtype {dtype}"),
            };
            if (got.Length != expected.Length)
                throw new Exception($"blob length {got.Length} != twin {expected.Length}");
            for (int i = 0; i < got.Length; i++)
                if (got[i] != expected[i])
                    throw new Exception($"blob byte {i}: {got[i]} != twin {expected[i]}");

            // round-trip through the managed decoder: every valid pixel
            // within maxZErr (ints: floor semantics handled by comparing
            // against the adjusted bound)
            int nMasks = maskType == MaskType.AllValid ? 0
                       : maskType == MaskType.SameMaskForAllBands ? 1 : nBands;
            byte[] valid = new byte[Math.Max(1, nMasks) * nCols * nRows];
            int perBand = nCols * nRows * nDepth;
            double[] dec = new double[nBands * perBand];
            Check(LercDecode.lerc_decodeToDouble(got, (uint)got.Length, nMasks, valid,
                                                 nDepth, nCols, nRows, nBands, dec));
            double tol = dtype <= 5 ? (maxZErr <= 0.5 ? 0.0 : Math.Floor(maxZErr))
                                    : maxZErr * 1.01;
            for (int b = 0; b < nBands; b++)
                for (int p = 0; p < nCols * nRows; p++)
                {
                    bool ok = nMasks == 0 || valid[(nMasks == 1 ? 0 : b) * nCols * nRows + p] != 0;
                    if (!ok) continue;
                    for (int d = 0; d < nDepth; d++)
                    {
                        long i = (long)b * perBand + (long)p * nDepth + d;
                        double orig = ReadAsDouble(raster, dtype, i);
                        if (Math.Abs(dec[i] - orig) > tol)
                            throw new Exception($"roundtrip err {Math.Abs(dec[i] - orig)} > {tol} at {i}");
                    }
                }
        }

        static T[] FromBytes<T>(byte[] raw) where T : unmanaged
        {
            int sz = System.Runtime.InteropServices.Marshal.SizeOf<T>();
            var o = new T[raw.Length / sz];
            Buffer.BlockCopy(raw, 0, o, 0, raw.Length);
            return o;
        }

        static double ReadAsDouble(byte[] raw, int dtype, long i)
        {
            switch (dtype)
            {
                case 0: return (sbyte)raw[i];
                case 1: return raw[i];
                case 2: return BitConverter.ToInt16(raw, (int)(i * 2));
                case 3: return BitConverter.ToUInt16(raw, (int)(i * 2));
                case 4: return BitConverter.ToInt32(raw, (int)(i * 4));
                case 5: return BitConverter.ToUInt32(raw, (int)(i * 4));
                case 6: return BitConverter.ToSingle(raw, (int)(i * 4));
                default: return BitConverter.ToDouble(raw, (int)(i * 8));
            }
        }

        static byte[] Slice(byte[] src, int n)
        {
            byte[] o = new byte[n];
            Array.Copy(src, o, n);
            return o;
        }

        static byte[] BitFlip(byte[] src, int at)
        {
            byte[] o = (byte[])src.Clone();
            o[at] ^= 255;
            return o;
        }

        static void RunVector(string name, byte[] blob, JsonElement exp)
        {
            int width = exp.GetProperty("width").GetInt32();
            int height = exp.GetProperty("height").GetInt32();
            int depth = exp.GetProperty("depth").GetInt32();
            int bands = exp.GetProperty("bands").GetInt32();
            int dtype = exp.GetProperty("dtype").GetInt32();

            uint[] info = new uint[11];
            double[] dr = new double[3];
            uint rc = LercDecode.lerc_getBlobInfo(blob, (uint)blob.Length, info, dr, 11, 3);
            if (rc != 0) throw new Exception($"getBlobInfo rc={rc}");
            if (info[3] != (uint)width || info[4] != (uint)height || info[5] != (uint)bands)
                throw new Exception($"info mismatch {info[3]}x{info[4]}x{info[5]}");
            int nMasks = (int)info[8];

            int perBand = width * height * depth;
            byte[] valid = new byte[Math.Max(1, nMasks) * width * height];

            JsonElement masksEl = exp.GetProperty("masks");
            byte[][] expMasks = null;
            if (masksEl.ValueKind == JsonValueKind.Array)
            {
                expMasks = new byte[bands][];
                int b = 0;
                foreach (JsonElement m in masksEl.EnumerateArray())
                    expMasks[b++] = Convert.FromBase64String(m.GetString());
            }

            var expPixels = new byte[bands][];
            {
                int b = 0;
                foreach (JsonElement p in exp.GetProperty("pixels").EnumerateArray())
                    expPixels[b++] = Convert.FromBase64String(p.GetString());
            }

            // decode into the typed overload for the blob's dtype, then
            // compare raw little-endian bytes of every VALID pixel
            byte[] gotBytes;
            switch (dtype)
            {
                case 0: { sbyte[] d = new sbyte[bands * perBand]; Check(LercDecode.lerc_decode(blob, (uint)blob.Length, nMasks, valid, depth, width, height, bands, dtype, d)); gotBytes = ToBytes(d); break; }
                case 1: { byte[] d = new byte[bands * perBand]; Check(LercDecode.lerc_decode(blob, (uint)blob.Length, nMasks, valid, depth, width, height, bands, dtype, d)); gotBytes = d; break; }
                case 2: { short[] d = new short[bands * perBand]; Check(LercDecode.lerc_decode(blob, (uint)blob.Length, nMasks, valid, depth, width, height, bands, dtype, d)); gotBytes = ToBytes(d); break; }
                case 3: { ushort[] d = new ushort[bands * perBand]; Check(LercDecode.lerc_decode(blob, (uint)blob.Length, nMasks, valid, depth, width, height, bands, dtype, d)); gotBytes = ToBytes(d); break; }
                case 4: { int[] d = new int[bands * perBand]; Check(LercDecode.lerc_decode(blob, (uint)blob.Length, nMasks, valid, depth, width, height, bands, dtype, d)); gotBytes = ToBytes(d); break; }
                case 5: { uint[] d = new uint[bands * perBand]; Check(LercDecode.lerc_decode(blob, (uint)blob.Length, nMasks, valid, depth, width, height, bands, dtype, d)); gotBytes = ToBytes(d); break; }
                case 6: { float[] d = new float[bands * perBand]; Check(LercDecode.lerc_decode(blob, (uint)blob.Length, nMasks, valid, depth, width, height, bands, dtype, d)); gotBytes = ToBytes(d); break; }
                case 7: { double[] d = new double[bands * perBand]; Check(LercDecode.lerc_decode(blob, (uint)blob.Length, nMasks, valid, depth, width, height, bands, dtype, d)); gotBytes = ToBytes(d); break; }
                default: throw new Exception("bad dtype " + dtype);
            }

            int sz = DtSize[dtype];
            for (int b = 0; b < bands; b++)
            {
                byte[] expB = expPixels[b];
                if (expB.Length != perBand * sz)
                    throw new Exception($"band {b}: expected byte count {expB.Length} != {perBand * sz}");
                byte[] mask = expMasks != null ? expMasks[b] : null;
                for (int i = 0; i < perBand; i++)
                {
                    if (mask != null && mask[i / depth] == 0) continue; // invalid: unspecified
                    for (int k = 0; k < sz; k++)
                    {
                        int go = (b * perBand + i) * sz + k, eo = i * sz + k;
                        if (gotBytes[go] != expB[eo])
                        {
                            if (IsBothNaN(gotBytes, go - k, expB, eo - k, dtype)) break;
                            throw new Exception($"band {b} pixel {i} byte {k}: {gotBytes[go]} != {expB[eo]}");
                        }
                    }
                }
                if (mask != null && nMasks > 0)
                {
                    int mb = nMasks == 1 ? 0 : b;
                    for (int i = 0; i < width * height; i++)
                        if (valid[mb * width * height + i] != mask[i])
                            throw new Exception($"mask mismatch band {b} px {i}");
                }
            }
        }

        static bool IsBothNaN(byte[] a, int ao, byte[] b, int bo, int dtype)
        {
            if (dtype == 6)
                return float.IsNaN(BitConverter.ToSingle(a, ao)) && float.IsNaN(BitConverter.ToSingle(b, bo));
            if (dtype == 7)
                return double.IsNaN(BitConverter.ToDouble(a, ao)) && double.IsNaN(BitConverter.ToDouble(b, bo));
            return false;
        }

        static void Check(uint rc)
        {
            if (rc != 0) throw new Exception($"lerc_decode rc={rc}");
        }

        static byte[] ToBytes<T>(T[] arr) where T : struct
        {
            byte[] o = new byte[Buffer.ByteLength(arr)];
            Buffer.BlockCopy(arr, 0, o, 0, o.Length);
            return o;
        }
    }
}
