#!/usr/bin/env python
"""Benchmark: encode+decode MB/s per chip, float32 maxZError=0.001.

Encodes+decodes a synthetic 4096x4096 float32 DEM (the BASELINE.json
headline config) as four 2048^2 tiles through the device-resident codec.
Each phase is ONE compiled executable called once per tile (the 4-tiles-
inlined-in-one-jit variant bought ~9% but quadrupled XLA compile time and
timed out the round-2 driver run; VERDICT.md r2 item 1). The raster is
generated in HBM, the blob payload stays in HBM, headers and Fletcher32
checksums are built on device, and decode is scan-free via the encoder's
record-offset acceleration index (wire format unchanged; decoding without
the index is covered by tests/test_resident.py). Only a few scalar probes
cross the host boundary per phase.

Compile-time control -- the round-2 failure mode was an XLA compile that
outlived the driver's wall clock, and a KILLED compile wedges the tunnel
for every later client (never subprocess-timeout a TPU compile):
  1. the fast-compiling uncapped kernels (~15 s) run FIRST and bank a
     complete result;
  2. the masked pass is banked NEXT (before any upgrade attempt): the r4
     driver artifact recorded masked 0.0 because the masked pass sat
     behind the nb16 upgrade and a blanket headroom constant
     (VERDICT r4 weak #1);
  3. the slow-compiling nb_cap=16 static-chain headline upgrade (~2-3
     min extra compile cold, ~1 s from .jax_cache, ~3x throughput) runs
     last. Every gate estimates the ACTUAL compile cost from observed
     compile times of the same kernel family (est_compile_s) instead of
     assuming cold, and is checked BETWEEN compiles -- a started compile
     always runs to completion. Deadline: LERC_BENCH_DEADLINE (default
     420 s); set LERC_BENCH_FAST=1 to skip the upgrade entirely.

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

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import jax  # noqa: E402

# Persistent compilation cache (VERDICT r2 item 1b): the driver's cold run
# reuses executables compiled by earlier runs on this host, collapsing the
# nb_cap=16 static-chain compiles (~minutes over the tunnel) to cache reads.
# Harmless no-op if the backend doesn't support executable serialization.
try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception as _e:  # older jax: cache flags absent
    print(f"[bench] compilation cache unavailable: {_e!r}", file=sys.stderr)

# Honor JAX_PLATFORMS before the backend initializes (plugin backends may
# ignore the env var): lets CI smoke the whole bench on CPU with
# LERC_BENCH_TILE without ever opening the accelerator tunnel.
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp  # noqa: E402

from lerc_tpu.codec.resident import FusedResidentCodec  # noqa: E402

TILE = int(os.environ.get("LERC_BENCH_TILE", "2048"))  # CI smoke: small TILE
GRID = 2  # 2x2 tiles = 4096x4096 total
N_TILES = GRID * GRID
MAX_Z_ERROR = 0.001
PUBLISHED_BASELINE_MBS = 133.0
DEADLINE_S = float(os.environ.get("LERC_BENCH_DEADLINE", "420"))
FAST_ONLY = os.environ.get("LERC_BENCH_FAST", "0") == "1"
T0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-T0:6.0f}s] {msg}", file=sys.stderr, flush=True)


@jax.jit
def make_tiles():
    """Synthetic DEM tiles: smooth structure + hash noise, generated ON
    DEVICE from iota -- nothing crosses the tunnel. Both alternatives
    burned driver budget in past rounds: the r3 jitted jax.random
    generator compiled for 296 s, and a host-numpy + device_put(64 MB)
    variant stalled 643 s on a flaky tunnel transfer. Integer-hash noise
    compiles in seconds and transfers zero bytes."""
    x = jnp.linspace(0, 20, TILE)[None, :]
    y = jnp.linspace(0, 15, TILE)[:, None]

    def one(seed):
        # xxhash-style avalanche on the pixel counter: uniform u32 noise
        i = (jnp.arange(TILE * TILE, dtype=jnp.uint32).reshape(TILE, TILE)
             + jnp.uint32((seed * 0x9E3779B9) & 0xFFFFFFFF))
        i = (i ^ (i >> 16)) * jnp.uint32(0x45D9F3B)
        i = (i ^ (i >> 16)) * jnp.uint32(0x45D9F3B)
        i = i ^ (i >> 16)
        noise = i.astype(jnp.float32) * jnp.float32(2**-32) - 0.5
        dem = (
            1500 * jnp.exp(-((x - 10) ** 2 + (y - 7) ** 2) / 20)
            + 50 * jnp.sin(x + seed) * jnp.cos(y)
            + noise
        ).astype(jnp.float32)
        return dem[:, :, None]

    return jnp.stack([one(s) for s in range(N_TILES)])


def time_phases(codec, tiles, rounds, chain):
    """Best per-pass encode/decode seconds over `rounds`, `chain` passes
    per timed fetch (amortizes the ~25 ms tunnel RTT)."""
    best_enc = best_dec = np.inf
    outs = decs = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(chain):
            outs = [codec._encode_fused(tiles[i]) for i in range(tiles.shape[0])]
        np.asarray(outs[-1][2])  # dependent fetch fences the in-order queue
        t1 = time.perf_counter()
        for _ in range(chain):
            decs = [codec._decode_fused_fast(h, s, st) for (h, s, _m, st) in outs]
        np.asarray(decs[-1][1])
        t2 = time.perf_counter()
        best_enc = min(best_enc, (t1 - t0) / chain)
        best_dec = min(best_dec, (t2 - t1) / chain)
    return best_enc, best_dec, outs, decs


COMPILE_TIMES = {}  # family -> [host-side trace+compile seconds]
_HIST_PATH = os.path.join(REPO, ".jax_cache", "bench_compile_hist.json")


def _source_state():
    """Hash of everything that keys the persistent compilation cache for
    this bench's kernels: the package sources, the jax version, and the
    bench shape. If a family compiled under the SAME state in an earlier
    run, .jax_cache holds its executables and the next compile is a
    ~seconds cache read -- knowable BEFORE the first in-process compile,
    which is exactly what the deadline gates need after a tunnel stall
    eats the budget (a 178 s stall once pushed headroom under the blind
    cold estimate even though every kernel was cached)."""
    import glob
    import hashlib

    h = hashlib.sha256()
    for p in sorted(glob.glob(os.path.join(REPO, "lerc_tpu", "**", "*.py"),
                              recursive=True)):
        h.update(open(p, "rb").read())
    h.update(jax.__version__.encode())
    h.update(f"{TILE}:{MAX_Z_ERROR}".encode())
    return h.hexdigest()


def load_compile_hist():
    """Seed COMPILE_TIMES from the last run under the same source state:
    families compiled before are cache-backed, so estimate a small fixed
    cost for them instead of the blind cold constant."""
    try:
        with open(_HIST_PATH) as f:
            hist = json.load(f)
        if hist.get("source") == _SOURCE_STATE:
            for fam in hist.get("families", []):
                COMPILE_TIMES.setdefault(fam, []).append(15.0)
            log(f"compile history: cache-backed families {hist['families']}")
    except (OSError, ValueError):
        pass


def note_compile(family, seconds):
    COMPILE_TIMES.setdefault(family, []).append(seconds)
    try:
        os.makedirs(os.path.dirname(_HIST_PATH), exist_ok=True)
        with open(_HIST_PATH, "w") as f:
            json.dump({"source": _SOURCE_STATE,
                       "families": sorted(COMPILE_TIMES)}, f)
    except OSError:
        pass


def est_compile_s(family, cold_s):
    """Estimated compile cost for the next jit of `family` ("uncapped" /
    "nb16"). The r4 driver run skipped the nb16 upgrade AND the masked
    pass because the headroom gates assumed COLD 3-minute compiles even
    while the same log showed "compiled in 1s" (VERDICT r4 weak #1); a
    binary warm/cold probe then misfired the other way when a source
    change left the cache SEMI-warm (a 41 s nb16 compile read as cold and
    skipped a 294 s-headroom upgrade). Observed compile times of the SAME
    kernel family are the direct predictor: estimate 2x the worst
    observation (+ margin at the gate), fall back to `cold_s` before the
    first observation. The jitted call blocks through trace+compile
    (dispatch is async), so the observations are real."""
    obs = COMPILE_TIMES.get(family)
    if not obs:
        return cold_s
    return min(cold_s, 2.0 * max(obs))


def bench_ours(tiles, nb_cap, rounds=4):
    """Returns (enc_s, dec_s, blob_bytes) per full-DEM pass, or None when
    nb_cap doesn't cover the data (caller falls back)."""
    codec = FusedResidentCodec(TILE, TILE, 1, np.float32, MAX_Z_ERROR,
                               nb_cap=nb_cap)
    family = "nb16" if nb_cap else "uncapped"
    t0 = time.perf_counter()
    out0 = codec._encode_fused(tiles[0])
    t_compile = time.perf_counter() - t0
    note_compile(family, t_compile)
    fits = bool(np.asarray(out0[2])[2])
    log(f"nb_cap={nb_cap}: encode compiled in {t_compile:.0f}s "
        f"(first fence +{time.perf_counter()-t0-t_compile:.0f}s)")
    if nb_cap and not fits:
        log(f"nb_cap={nb_cap} insufficient for this data")
        return None
    t0 = time.perf_counter()
    dec0 = codec._decode_fused_fast(out0[0], out0[1], out0[3])
    t_compile = time.perf_counter() - t0
    note_compile(family, t_compile)
    np.asarray(dec0[1])
    log(f"nb_cap={nb_cap}: decode compiled in {t_compile:.0f}s")

    enc, dec, outs, decs = time_phases(codec, tiles, rounds, chain=10)
    metas_h = np.stack([np.asarray(o[2]) for o in outs])
    oks_h = np.stack([np.asarray(d[1]) for d in decs])
    assert oks_h.all(), "checksum verification failed"
    blob_bytes = int(metas_h[:, 0].sum()) + codec._hdr_len * N_TILES
    err = max(float(jnp.abs(d[0] - tiles[i]).max()) for i, d in enumerate(decs))
    assert err <= MAX_Z_ERROR * 1.1, f"error bound violated: {err}"
    return enc, dec, blob_bytes


_masked_codecs = {}


def _masked_codec(nb_cap):
    """Memoized: a fallback from nb16 to uncapped must not recompile the
    uncapped masked kernels phase 1 already built."""
    if nb_cap not in _masked_codecs:
        rng = np.random.default_rng(0)
        mask = np.ones((TILE, TILE), bool)
        mask[300:800, 500:1500] = False
        mask[rng.random((TILE, TILE)) > 0.98] = False
        _masked_codecs[nb_cap] = FusedResidentCodec(
            TILE, TILE, 1, np.float32, MAX_Z_ERROR, nb_cap=nb_cap, mask=mask)
    return _masked_codecs[nb_cap]


def bench_masked(tiles, nb_cap, rounds=3):
    """Masked variant (VERDICT r1 item 4): ~8% invalid pixels (hole +
    speckle) through the masked fast path, one tile, chained. Falls back
    to the uncapped kernels when nb_cap doesn't fit (never returns None
    silently -- VERDICT r2 weak item 2). Returns (enc_MBps, dec_MBps,
    effective_nb_cap) so callers log the kernels actually measured."""
    tile = tiles[0]
    codec = _masked_codec(nb_cap)
    t0 = time.perf_counter()
    out = codec._encode_fused(tile)
    note_compile("nb16" if nb_cap else "uncapped", time.perf_counter() - t0)
    fits = bool(np.asarray(out[2])[2])
    log(f"masked nb_cap={nb_cap}: encode compiled in {time.perf_counter()-t0:.0f}s")
    if nb_cap and not fits:
        log(f"masked nb_cap={nb_cap} insufficient; using full kernels")
        return bench_masked(tiles, 0, rounds)
    dec = codec._decode_fused_fast(out[0], out[1], out[3])
    np.asarray(dec[1])
    # chain enough calls that the ~25 ms tunnel-RTT fetch and per-call
    # dispatch amortize to <1 ms/call, like the 40-call unmasked passes
    # (chain=8 buried ~2.5 ms/call of pure measurement overhead in the
    # masked numbers)
    CHAIN = 24
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
    res = round(mb / best_enc, 1), round(mb / best_dec, 1), nb_cap
    log(f"masked nb_cap={nb_cap}: {res[0]} / {res[1]} MB/s")
    return res


def bench_reference(tiles, rounds=4):
    """Times the built reference library on one tile. Returns
    (enc_s, dec_s, ref_blob) scaled to the full DEM, or None when
    ref_build/ is absent. ref_blob feeds ratio_vs_ref + foreign decode."""
    try:
        sys.path.insert(0, os.path.join(REPO, "tests"))
        import oracle

        if not oracle.available():
            return None
    except Exception:
        return None
    tile = np.asarray(tiles)[0, :, :, 0]
    enc_t, dec_t = [], []
    blob = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        blob = oracle.encode(tile, 1, TILE, TILE, 1, None, MAX_Z_ERROR)
        t1 = time.perf_counter()
        oracle.decode(blob)
        t2 = time.perf_counter()
        enc_t.append(t1 - t0)
        dec_t.append(t2 - t1)
    scale = N_TILES  # reference timed on one tile; scale to the full DEM
    return min(enc_t) * scale, min(dec_t) * scale, blob


def bench_foreign_decode(ref_blob, tiles, rounds=3):
    """Interop path (VERDICT r3 item 6): device-decode a blob the
    REFERENCE encoded (no sidecar index -- native lengths-only scan
    rebuilds the record offsets). Returns (end_to_end_MBps, device_MBps)
    or None.

    Two figures because end-to-end includes the full 16 MB raster egress
    to host numpy, and over this environment's tunnel that transfer runs
    ~13 MB/s — the end-to-end number is transfer-bound, not kernel-bound
    (VERDICT r4 item 5 flagged it as misleading next to the reference's
    CPU figure). device_MBps times the identical call with
    return_device=True: native record scan + device decode + a dependent
    scalar fence, no raster egress — the kernel-side throughput."""
    try:
        from lerc_tpu.codec.device_codec import decode_band_device
    except Exception:
        return None
    best = np.inf
    out = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = decode_band_device(ref_blob)
        best = min(best, time.perf_counter() - t0)
    if out is None:
        return None
    ref_tile = np.asarray(tiles)[0, :, :, 0]
    err = float(np.abs(out.data[:, :, 0] - ref_tile).max())
    assert err <= MAX_Z_ERROR * 1.1, f"foreign decode error bound: {err}"
    mb = TILE * TILE * 4 / 1e6
    best_dev = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        dev = decode_band_device(ref_blob, return_device=True)
        np.asarray(dev.data[0, 0, 0])  # dependent scalar fences the queue
        best_dev = min(best_dev, time.perf_counter() - t0)
    return round(mb / best, 1), round(mb / best_dev, 1)


def _require_backend(timeout_s: float | None = None):
    """Fail diagnosably when the accelerator tunnel is dead: jax backend
    init has no timeout of its own, and a silent hang here is exactly the
    shape of the round-2 rc-124 artifact. The init runs in a daemon
    thread, joined in 30 s slices (a transient tunnel blip recovers
    instead of recording a zero); after LERC_BENCH_BACKEND_WAIT seconds
    (default 300) print a JSON line with an explicit error field (value 0
    is not a measurement) and exit nonzero."""
    import threading

    if timeout_s is None:
        timeout_s = float(os.environ.get("LERC_BENCH_BACKEND_WAIT", "300"))
    devs = []
    t = threading.Thread(target=lambda: devs.append(jax.devices()), daemon=True)
    t.start()
    waited = 0.0
    while not devs and waited < timeout_s:
        step = min(30.0, timeout_s - waited)
        t.join(step)
        waited += step
        if not devs:
            log(f"waiting for backend init ({waited:.0f}s)...")
    if not devs:
        print(json.dumps({
            "metric": "encode+decode MB/s/chip",
            "value": 0.0, "unit": "MB/s", "vs_baseline": 0.0,
            "error": f"backend init did not complete in {timeout_s:.0f}s "
                     "(accelerator tunnel down?) -- no measurement taken",
        }), flush=True)
        log("FATAL: backend init timed out; tunnel down?")
        os._exit(7)
    log(f"backend ready: {devs[0]}")


def _fetch_watchdog(fn, what, bound_s=None):
    """Run a blocking device fetch in a thread, logging every 15 s so a
    stalled first dispatch is VISIBLE in the driver log (the r4 run
    silently burned 233 s before "tiles ready"; VERDICT r4 weak #1c) and
    BOUNDED: past `bound_s` (default LERC_BENCH_DISPATCH_WAIT, 600 s)
    print an explicit-error JSON line and exit 7 rather than hang into
    the driver's hard kill. Returns the fetched value."""
    import threading

    if bound_s is None:
        bound_s = float(os.environ.get("LERC_BENCH_DISPATCH_WAIT", "600"))
    box = []
    t = threading.Thread(target=lambda: box.append(fn()), daemon=True)
    t.start()
    waited = 0.0
    while not box and waited < bound_s:
        t.join(15.0)
        waited += 15.0
        if not box:
            log(f"waiting on {what} ({waited:.0f}s)... tunnel stall?")
    if not box:
        print(json.dumps({
            "metric": "encode+decode MB/s/chip",
            "value": 0.0, "unit": "MB/s", "vs_baseline": 0.0,
            "error": f"{what} did not complete in {bound_s:.0f}s "
                     "(tunnel stall) -- no measurement taken",
        }), flush=True)
        log(f"FATAL: {what} stalled past {bound_s:.0f}s")
        os._exit(7)
    return box[0]


def _gate(name, family, cold_s, margin_s=45.0, measure_s=30.0):
    """Headroom gate driven by observed per-family compile times (see
    est_compile_s) instead of blanket cold constants (r4) or a binary
    warm/cold probe (early r5). `cold_s` bounds the estimate before the
    family's first compile; `measure_s` covers the timed passes;
    `margin_s` protects the final JSON emission."""
    est = est_compile_s(family, cold_s) + measure_s
    headroom = DEADLINE_S - (time.perf_counter() - T0)
    ok = headroom > est + margin_s
    obs = COMPILE_TIMES.get(family)
    log(f"gate {name}: est {est:.0f}s (family {family} worst observed "
        f"{max(obs) if obs else -1:.0f}s), headroom {headroom:.0f}s -> "
        f"{'RUN' if ok else 'SKIP'}")
    return ok


_SOURCE_STATE = None


def main():
    global _SOURCE_STATE
    total_mb = TILE * TILE * N_TILES * 4 / 1e6
    _SOURCE_STATE = _source_state()
    load_compile_hist()
    _require_backend()
    tiles = make_tiles()
    _fetch_watchdog(lambda: np.asarray(tiles[0, 0, 0, 0]), "first dispatch (tiles)")
    log("tiles ready")

    # Phase 1 -- fast-compiling uncapped kernels: bank a complete result
    # (and seed COMPILE_TIMES, the cache-warmth probe for every gate).
    enc, dec, blob_bytes = bench_ours(tiles, 0)
    log(f"uncapped: enc {total_mb/enc:.0f} MB/s, dec {total_mb/dec:.0f} MB/s")

    ref = bench_reference(tiles)

    # Phase 2 -- bank the masked pass BEFORE any upgrade attempt
    # (VERDICT r4 item 1b: the r4 artifact shipped masked 0.0 because
    # masked sat behind the nb16 gate). nb16-first; bench_masked falls
    # back to the uncapped kernels internally when nb16 doesn't fit.
    masked, masked_error = None, None
    if _gate("masked", "nb16", cold_s=220):
        try:
            masked = bench_masked(tiles, 16 if not FAST_ONLY else 0)
        except Exception as e:
            masked_error = f"masked bench failed: {e!r}"
            log(masked_error)
    if masked is None:
        if masked_error is None:
            masked_error = "skipped: no deadline headroom for cold masked compile"
            log(f"masked bench {masked_error}")
        masked = (0.0, 0.0, -1)

    # Phase 3 -- nb_cap=16 static-chain headline upgrade.
    if not FAST_ONLY and _gate("nb16 upgrade", "nb16", cold_s=260):
        try:
            up = bench_ours(tiles, 16)
            if up is not None:
                enc, dec, blob_bytes = up
                log(f"nb16: enc {total_mb/enc:.0f} MB/s, dec {total_mb/dec:.0f} MB/s")
        except Exception as e:  # never lose the banked result
            log(f"nb16 upgrade failed: {e!r}")

    foreign = None
    if ref is not None and _gate("foreign decode", "foreign", cold_s=90,
                                 margin_s=30):
        try:
            foreign = bench_foreign_decode(ref[2], tiles)
        except Exception as e:
            log(f"foreign decode bench failed: {e!r}")

    ours_mbs = total_mb / (enc + dec)
    if ref is not None:
        ref_mbs = total_mb / (ref[0] + ref[1])
        baseline = ref_mbs
        ref_bytes = len(ref[2]) * N_TILES
        extra = {
            "ref_encode_MBps": round(total_mb / ref[0], 1),
            "ref_decode_MBps": round(total_mb / ref[1], 1),
            "ref_MBps": round(ref_mbs, 1),
            # size guardrail (VERDICT r3 weak #4): <1 means smaller blobs
            # than the reference; drift past 1.1 flags a selection bug.
            "ratio_vs_ref": round(blob_bytes / ref_bytes, 3),
        }
        if foreign is not None:
            extra["foreign_decode_MBps"] = foreign[0]
            extra["foreign_decode_device_MBps"] = foreign[1]
            extra["foreign_decode_note"] = (
                "end-to-end includes the full raster egress to host numpy; "
                "over this environment's device tunnel that transfer is the "
                "bound (~13 MB/s), not the decode kernels -- see the "
                "device-only figure")
    else:
        baseline = PUBLISHED_BASELINE_MBS
        extra = {}
    extra["masked_encode_MBps"], extra["masked_decode_MBps"] = masked[:2]
    if masked_error:
        extra["masked_error"] = masked_error

    result = {
        "metric": (f"encode+decode MB/s/chip (float32 {TILE*GRID}x{TILE*GRID} "
                   f"DEM as {TILE}^2 tiles, maxZError=0.001)"),
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
