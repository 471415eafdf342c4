#!/usr/bin/env python
"""Benchmark: encode+decode MB/s per chip, float32 maxZError=0.001.

Encodes+decodes a synthetic 4096x4096 float32 DEM (the BASELINE.json
headline config) as four 2048^2 tiles through the device-resident codec.
Each phase is ONE compiled executable called once per tile (the 4-tiles-
inlined-in-one-jit variant bought ~9% but quadrupled XLA compile time and
timed out the round-2 driver run; see VERDICT.md r2 item 1). The raster is
generated in HBM, the blob payload stays in HBM, headers and Fletcher32
checksums are built on device, and decode is scan-free via the encoder's
record-offset acceleration index (wire format unchanged; decoding without
the index is covered by tests/test_resident.py). Only a few scalar probes
cross the host boundary per phase.

Compile-time control (the round-2 failure mode was an XLA compile that
outlived the driver's wall clock):
  1. the JAX persistent compilation cache is enabled in .jax_cache/ so a
     prior run of this script (or the test of it) makes later compiles
     near-instant;
  2. the slow-compiling nb_cap=16 static-chain variant is compiled in a
     CHILD process under a hard timeout; if the child fails or times out
     the bench falls back to the fast-compiling uncapped kernels and
     still prints its JSON line. The parent only initializes the TPU
     after the child exits (two live TPU processes hang the tunnel).

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
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE_DIR = os.path.join(REPO, ".jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from lerc_tpu.codec.resident import FusedResidentCodec  # noqa: E402

TILE = 2048
GRID = 2  # 2x2 tiles = 4096x4096 total
N_TILES = GRID * GRID
MAX_Z_ERROR = 0.001
PUBLISHED_BASELINE_MBS = 133.0
# wall-clock budget for compiling the nb_cap=16 static-chain variant in a
# child process; past it we fall back to the uncapped kernels (~15 s)
WARM_BUDGET_S = int(os.environ.get("LERC_BENCH_WARM_BUDGET_S", "420"))


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


def masked_codec(nb_cap):
    """The bench_masked configuration: ~8% invalid (hole + speckle)."""
    rng = np.random.default_rng(0)
    mask = np.ones((TILE, TILE), bool)
    mask[300:800, 500:1500] = False
    mask[rng.random((TILE, TILE)) > 0.98] = False
    return FusedResidentCodec(TILE, TILE, 1, np.float32, MAX_Z_ERROR,
                              nb_cap=nb_cap, mask=mask)


def warm_child(nb_cap):
    """Child-process entry: compile + run every executable the parent will
    time, populating the persistent compilation cache, then exit."""
    tiles = make_tiles()
    codec = FusedResidentCodec(TILE, TILE, 1, np.float32, MAX_Z_ERROR,
                               nb_cap=nb_cap)
    out = codec._encode_fused(tiles[0])
    fits = bool(np.asarray(out[2])[2])
    dec = codec._decode_fused_fast(out[0], out[1], out[3])
    np.asarray(dec[1])
    mc = masked_codec(nb_cap)
    mout = mc._encode_fused(tiles[0])
    mfits = bool(np.asarray(mout[2])[2])
    mdec = mc._decode_fused_fast(mout[0], mout[1], mout[3])
    np.asarray(mdec[1])
    print(f"WARMED fits={int(fits)} mfits={int(mfits)}", flush=True)


def run_warm(nb_cap, budget_s):
    """Compile the nb_cap variant in a child under a hard timeout.
    Returns (ok, fits, masked_fits); the persistent cache keeps whatever
    the child managed to compile either way."""
    env = dict(os.environ, LERC_BENCH_WARM=str(nb_cap))
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            timeout=budget_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        print(f"warm(nb_cap={nb_cap}) timed out after {budget_s}s",
              file=sys.stderr, flush=True)
        return False, False, False
    dt = time.perf_counter() - t0
    tail = (proc.stdout or "").strip().splitlines()
    mark = next((ln for ln in tail if ln.startswith("WARMED")), None)
    if proc.returncode != 0 or mark is None:
        print(f"warm(nb_cap={nb_cap}) failed rc={proc.returncode}: "
              f"{(proc.stderr or '')[-400:]}", file=sys.stderr, flush=True)
        return False, False, False
    kv = dict(p.split("=") for p in mark.split()[1:])
    print(f"warm(nb_cap={nb_cap}) ok in {dt:.0f}s ({mark})",
          file=sys.stderr, flush=True)
    return True, kv.get("fits") == "1", kv.get("mfits") == "1"


def bench_ours(nb_cap, rounds=4):
    tiles = make_tiles()
    np.asarray(tiles[0, 0, 0, 0])

    # ONE compiled executable per phase, called once per tile. nb_cap=16
    # selects the static-per-nb pack/extract chains sized for narrow
    # packed values (slow compile, fast run; the child warmed the cache).
    codec = FusedResidentCodec(TILE, TILE, 1, np.float32, MAX_Z_ERROR,
                               nb_cap=nb_cap)

    def enc_all(tiles):
        return [codec._encode_fused(tiles[i]) for i in range(N_TILES)]

    def dec_all(outs):
        return [codec._decode_fused_fast(h, s, st)
                for (h, s, _m, st) in outs]

    t0 = time.perf_counter()
    outs = enc_all(tiles)
    metas_h = np.stack([np.asarray(o[2]) for o in outs])
    if nb_cap and not metas_h[:, 2].all():
        print("nb_cap insufficient at runtime; using full kernels",
              file=sys.stderr, flush=True)
        return bench_ours(0, rounds)
    print(f"encode ready in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    decs = dec_all(outs)
    np.asarray(decs[-1][1])
    print(f"decode ready in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)

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


def bench_masked(nb_cap, rounds=3):
    """Masked variant (VERDICT r1 item 4): ~8% invalid pixels (hole +
    speckle) through the masked fast path, one tile, chained."""
    tile = make_tiles()[0]
    codec = masked_codec(nb_cap)
    out = codec._encode_fused(tile)
    if nb_cap and not int(np.asarray(out[2])[2]):
        print("masked: nb_cap insufficient at runtime; using full kernels",
              file=sys.stderr, flush=True)
        return bench_masked(0, rounds)
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
        sys.path.insert(0, os.path.join(REPO, "tests"))
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
    warm = os.environ.get("LERC_BENCH_WARM")
    if warm is not None:
        warm_child(int(warm))
        return

    # Compile the slow nb_cap=16 variant in a child under a hard budget
    # BEFORE this process touches the TPU. Cache-warm runs take seconds.
    ok16, fits16, mfits16 = run_warm(16, WARM_BUDGET_S)
    nb_cap = 16 if (ok16 and fits16) else 0
    masked_cap = 16 if (ok16 and mfits16) else 0
    if nb_cap == 0 or masked_cap == 0:
        run_warm(0, WARM_BUDGET_S)

    total_mb = TILE * TILE * N_TILES * 4 / 1e6

    enc, dec, blob_bytes = bench_ours(nb_cap)
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

    masked = bench_masked(masked_cap)
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
