#!/usr/bin/env python
"""Benchmark: encode+decode MB/s per chip, float32 maxZError=0.001.

Runs the TPU device codec on a synthetic 4096x4096 float32 DEM (the
BASELINE.json headline config) and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

vs_baseline is measured against the reference C++ library (single core,
built in ref_build/) on the same data when available, else against the
published ~133 MB/s single-core encode+decode figure (README.md:99:
20-30 ms/MPix encode + 5 ms/MPix decode for float32).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lerc_tpu.codec.device_codec import decode_band_device, encode_band_device  # noqa: E402

H = W = 4096
MAX_Z_ERROR = 0.001
PUBLISHED_BASELINE_MBS = 133.0


def make_dem(h, w):
    rng = np.random.default_rng(42)
    x, y = np.meshgrid(np.linspace(0, 20, w), np.linspace(0, 15, h))
    dem = (
        1500 * np.exp(-((x - 10) ** 2 + (y - 7) ** 2) / 20)
        + 50 * np.sin(x) * np.cos(y)
        + rng.normal(0, 0.5, (h, w))
    ).astype(np.float32)
    return dem[:, :, None]


def bench_ours(data, rounds=3):
    # warmup / compile
    blob = encode_band_device(data, None, MAX_Z_ERROR)
    decode_band_device(blob)
    enc_t, dec_t = [], []
    for _ in range(rounds):
        t0 = time.perf_counter()
        blob = encode_band_device(data, None, MAX_Z_ERROR)
        t1 = time.perf_counter()
        out = decode_band_device(blob)
        t2 = time.perf_counter()
        enc_t.append(t1 - t0)
        dec_t.append(t2 - t1)
    err = np.abs(out.data[:, :, 0].astype(np.float64) - data[:, :, 0]).max()
    assert err <= MAX_Z_ERROR * 1.1, f"error bound violated: {err}"
    return min(enc_t), min(dec_t), len(blob)


def bench_reference(data, rounds=1):
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
        import oracle

        if not oracle.available():
            return None
    except Exception:
        return None
    h, w = data.shape[:2]
    enc_t, dec_t = [], []
    blob = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        blob = oracle.encode(data[:, :, 0], 1, w, h, 1, None, MAX_Z_ERROR)
        t1 = time.perf_counter()
        oracle.decode(blob)
        t2 = time.perf_counter()
        enc_t.append(t1 - t0)
        dec_t.append(t2 - t1)
    return min(enc_t), min(dec_t), len(blob)


def main():
    data = make_dem(H, W)
    mb = data.nbytes / 1e6

    enc, dec, blob_len = bench_ours(data)
    ours_mbs = mb / (enc + dec)

    ref = bench_reference(data)
    if ref is not None:
        ref_mbs = mb / (ref[0] + ref[1])
        baseline = ref_mbs
        extra = {
            "ref_encode_MBps": round(mb / ref[0], 1),
            "ref_decode_MBps": round(mb / ref[1], 1),
            "ref_MBps": round(ref_mbs, 1),
        }
    else:
        baseline = PUBLISHED_BASELINE_MBS
        extra = {}

    result = {
        "metric": "encode+decode MB/s/chip (float32 4096x4096 DEM, maxZError=0.001)",
        "value": round(ours_mbs, 1),
        "unit": "MB/s",
        "vs_baseline": round(ours_mbs / baseline, 2),
        "encode_MBps": round(mb / enc, 1),
        "decode_MBps": round(mb / dec, 1),
        "compression_ratio": round(data.nbytes / blob_len, 2),
        **extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
