"""Stage-level profiling of the device codec on the real TPU."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lerc_tpu.codec.resident import FusedResidentCodec
from lerc_tpu.constants import DataType
from lerc_tpu.ops import device_decode, device_encode, device_scan

TILE = 2048
MZE = 0.001


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    x = np.linspace(0, 20, TILE)[None, :]
    y = np.linspace(0, 15, TILE)[:, None]
    dem = (1500 * np.exp(-((x - 10) ** 2 + (y - 7) ** 2) / 20)
           + 50 * np.sin(x) * np.cos(y)
           + 0.5 * rng.standard_normal((TILE, TILE))).astype(np.float32)
    data = jnp.asarray(dem[:, :, None])
    jax.block_until_ready(data)

    # dispatch overhead
    f = jax.jit(lambda a: a + 1)
    timeit("dispatch overhead (a+1, 16MB)", f, data)

    codec = FusedResidentCodec(TILE, TILE, 1, np.float32, MZE)

    # full fused encode
    header, stream, meta = timeit("encode_fused total", codec.encode_fast, data)

    # encode_tiles alone
    ones = jnp.ones((TILE, TILE), bool)
    enc = lambda d: device_encode.encode_tiles(
        d, ones, jnp.float32(MZE), TILE, TILE, 1, DataType.FLOAT, True, 6, codec.cap)
    stream2, total, zmn, zmx = timeit("  encode_tiles", enc, data)

    # fletcher
    fl = lambda s, t: device_scan.fletcher32_device(header[54:], s, t)
    timeit("  fletcher32_device", fl, stream, meta[0])

    # full fused decode
    img, ok = timeit("decode_fused total", codec.decode_fast, header, stream)

    n_rec = codec.n_rec
    scan = lambda s: device_scan.scan_records_device(s, n_rec, DataType.FLOAT, 6, 64)
    scanned = timeit("  scan_records_device", scan, stream)
    (rp, mode, offset, r_nb, r_ne, payload_pos, lut_pos, r_nlut, r_nbits_lut) = scanned

    dec = lambda s: device_decode.decode_tiles(
        s, mode, payload_pos, offset, r_nb, r_ne, lut_pos, r_nlut, r_nbits_lut,
        ones, jnp.float32(MZE), jnp.asarray([float(np.asarray(zmx)[0])], np.float32),
        TILE, TILE, 1, DataType.FLOAT, True, False)
    timeit("  decode_tiles", dec, stream)

    print(f"total bytes: {int(np.asarray(meta)[0])}, cap {codec.cap}, n_rec {n_rec}")


if __name__ == "__main__":
    main()
