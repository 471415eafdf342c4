#!/usr/bin/env python
"""Benchmark: encode+decode MB/s per chip, float32 maxZError=0.001.

Encodes+decodes a synthetic 4096x4096 float32 DEM (the BASELINE.json
headline config) as four 2048^2 tiles through the device-resident codec,
batched into ONE jitted call per phase (vmap over tiles): the raster is
generated in HBM, the blob payload stays in HBM, headers and Fletcher32
checksums are built on device, and decode is scan-free via the encoder's
record-offset acceleration index (wire format unchanged; decoding without
the index is covered by tests/test_resident.py). Only a few scalar probes
cross the host boundary per phase.

Timing note: on this platform jax.block_until_ready does not actually wait
(async tunnel), so each timed phase fetches a small dependent output to
force completion.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "MB/s",
"vs_baseline": N}. vs_baseline is measured against the reference C++
library (single core, ref_build/) on the same data when available, else
the published ~133 MB/s figure (reference README.md:99).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lerc_tpu.codec.resident import FusedResidentCodec  # noqa: E402

TILE = 2048
GRID = 2  # 2x2 tiles = 4096x4096 total
N_TILES = GRID * GRID
MAX_Z_ERROR = 0.001
PUBLISHED_BASELINE_MBS = 133.0


@jax.jit
def make_tiles():
    """Synthetic DEM tiles generated on device: smooth structure + noise."""
    def one(seed):
        key = jax.random.PRNGKey(seed)
        x = jnp.linspace(0, 20, TILE)[None, :]
        y = jnp.linspace(0, 15, TILE)[:, None]
        dem = (
            1500 * jnp.exp(-((x - 10) ** 2 + (y - 7) ** 2) / 20)
            + 50 * jnp.sin(x + seed) * jnp.cos(y)
            + 0.5 * jax.random.normal(key, (TILE, TILE))
        ).astype(jnp.float32)
        return dem[:, :, None]

    return jnp.stack([one(s) for s in range(N_TILES)])


def fetch(x):
    return np.asarray(x)


def bench_ours(rounds=4):
    tiles = make_tiles()
    fetch(tiles[0, 0, 0, 0])

    # All tiles inline into ONE jitted program per phase -- NOT a vmapped
    # batch (under vmap the row scatter/gather kernels lose their
    # sorted-indices fast path, ~1.5-1.8x slower per tile) but four
    # independent per-tile subgraphs in one dispatch, which also removes
    # the ~0.5-1 ms tunnel dispatch per call (measured ~20% per tile).
    # nb_cap=16 selects the static-per-nb pack/extract chains sized for
    # narrow packed values; blocks needing wider values flip the fits flag
    # and we fall back to the uncapped variant.
    def build(nb_cap):
        codec = FusedResidentCodec(TILE, TILE, 1, np.float32, MAX_Z_ERROR,
                                   nb_cap=nb_cap)

        @jax.jit
        def enc_all(tiles):
            return [codec._encode_fused(tiles[i]) for i in range(N_TILES)]

        @jax.jit
        def dec_all(outs):
            return [codec._decode_fused_fast(h, s, st)
                    for (h, s, _m, st) in outs]

        return codec, enc_all, dec_all

    codec, enc_all, dec_all = build(16)
    print("compiling...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    outs = enc_all(tiles)
    metas_h = np.stack([np.asarray(o[2]) for o in outs])
    if not metas_h[:, 2].all():
        print("nb_cap=16 insufficient; using full kernels", file=sys.stderr, flush=True)
        codec, enc_all, dec_all = build(0)
        outs = enc_all(tiles)
        metas_h = np.stack([np.asarray(o[2]) for o in outs])
    print(f"encode compiled in {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    decs = dec_all(outs)
    oks_h = np.stack([np.asarray(d[1]) for d in decs])
    print(f"decode compiled in {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

    # Chain CHAIN passes over all tiles per timed fetch: the device
    # pipeline runs back to back (as in production) and the ~25 ms tunnel
    # round trip is amortized instead of charged to every call.
    CHAIN = 10
    best_enc = best_dec = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            outs = enc_all(tiles)
        np.asarray(outs[-1][2])  # one dependent fetch fences the in-order queue
        t1 = time.perf_counter()
        for _ in range(CHAIN):
            decs = dec_all(outs)
        np.asarray(decs[-1][1])
        t2 = time.perf_counter()
        best_enc = min(best_enc, (t1 - t0) / CHAIN)
        best_dec = min(best_dec, (t2 - t1) / CHAIN)
    metas_h = np.stack([np.asarray(o[2]) for o in outs])
    oks_h = np.stack([np.asarray(d[1]) for d in decs])
    assert oks_h.all(), "checksum verification failed"

    blob_bytes = int(metas_h[:, 0].sum()) + codec._hdr_len * N_TILES
    # error bound check on device (one scalar fetch per tile, untimed)
    err = max(float(jnp.abs(d[0] - tiles[i]).max()) for i, d in enumerate(decs))
    assert err <= MAX_Z_ERROR * 1.1, f"error bound violated: {err}"
    return best_enc, best_dec, blob_bytes


def bench_masked(rounds=3):
    """Masked variant (VERDICT r1 item 4): ~8% invalid pixels (hole +
    speckle) through the masked fast path, one tile, chained."""
    tile = make_tiles()[0]
    rng = np.random.default_rng(0)
    mask = np.ones((TILE, TILE), bool)
    mask[300:800, 500:1500] = False
    mask[rng.random((TILE, TILE)) > 0.98] = False
    codec = FusedResidentCodec(TILE, TILE, 1, np.float32, MAX_Z_ERROR,
                               nb_cap=16, mask=mask)
    out = codec._encode_fused(tile)
    if not int(np.asarray(out[2])[2]):
        return None
    dec = codec._decode_fused_fast(out[0], out[1], out[3])
    np.asarray(dec[1])
    CHAIN = 8
    best_enc = best_dec = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            out = codec._encode_fused(tile)
        np.asarray(out[2])
        t1 = time.perf_counter()
        for _ in range(CHAIN):
            dec = codec._decode_fused_fast(out[0], out[1], out[3])
        ok = np.asarray(dec[1])
        t2 = time.perf_counter()
        best_enc = min(best_enc, (t1 - t0) / CHAIN)
        best_dec = min(best_dec, (t2 - t1) / CHAIN)
    assert ok.all(), "masked checksum/index verification failed"
    mb = TILE * TILE * 4 / 1e6
    return round(mb / best_enc, 1), round(mb / best_dec, 1)


def bench_reference(rounds=4):
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
        import oracle

        if not oracle.available():
            return None
    except Exception:
        return None
    tile = np.asarray(make_tiles())[0, :, :, 0]
    enc_t, dec_t = [], []
    for _ in range(rounds):
        t0 = time.perf_counter()
        blob = oracle.encode(tile, 1, TILE, TILE, 1, None, MAX_Z_ERROR)
        t1 = time.perf_counter()
        oracle.decode(blob)
        t2 = time.perf_counter()
        enc_t.append(t1 - t0)
        dec_t.append(t2 - t1)
    scale = N_TILES  # reference timed on one tile; scale to the full DEM
    return min(enc_t) * scale, min(dec_t) * scale


def main():
    total_mb = TILE * TILE * N_TILES * 4 / 1e6

    enc, dec, blob_bytes = bench_ours()
    ours_mbs = total_mb / (enc + dec)

    ref = bench_reference()
    if ref is not None:
        ref_mbs = total_mb / (ref[0] + ref[1])
        baseline = ref_mbs
        extra = {
            "ref_encode_MBps": round(total_mb / ref[0], 1),
            "ref_decode_MBps": round(total_mb / ref[1], 1),
            "ref_MBps": round(ref_mbs, 1),
        }
    else:
        baseline = PUBLISHED_BASELINE_MBS
        extra = {}

    masked = bench_masked()
    if masked is not None:
        extra["masked_encode_MBps"], extra["masked_decode_MBps"] = masked

    result = {
        "metric": "encode+decode MB/s/chip (float32 4096x4096 DEM as 2048^2 tiles, maxZError=0.001)",
        "value": round(ours_mbs, 1),
        "unit": "MB/s",
        "vs_baseline": round(ours_mbs / baseline, 2),
        "encode_MBps": round(total_mb / enc, 1),
        "decode_MBps": round(total_mb / dec, 1),
        "compression_ratio": round(total_mb * 1e6 / blob_bytes, 2),
        **extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
