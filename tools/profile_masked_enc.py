"""Masked-vs-unmasked encode_tiles KERNEL gap on the real TPU, with long
chains so tunnel RTT and dispatch amortize away (the bench's early chain=8
masked numbers carried ~2.5 ms/call of measurement overhead).

Also ablates the masked extra work: compaction alone, stats alone.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lerc_tpu.constants import DataType
from lerc_tpu.ops import device_encode

H = W = 2048
CHAIN = 32


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3 / CHAIN
    print(f"{name:46s} {ms:8.2f} ms  ({H*W*4/1e6/(ms/1e3):6.0f} MB/s)", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    x, y = np.meshgrid(np.linspace(0, 20, W), np.linspace(0, 15, H))
    data = (1500 * np.exp(-((x - 10) ** 2 + (y - 7) ** 2) / 20)
            + 0.5 * rng.standard_normal((H, W))).astype(np.float32)[:, :, None]
    mask = np.ones((H, W), bool)
    mask[300:800, 500:1500] = False
    mask[rng.random((H, W)) > 0.98] = False

    data_d = jnp.asarray(data)
    mask_d = jnp.asarray(mask)
    ones_d = jnp.ones((H, W), bool)
    cap = 1 << 24

    def enc(mask_arg, all_valid):
        return device_encode.encode_tiles(
            data_d, mask_arg, jnp.float32(0.001), H, W, 1, DataType.FLOAT,
            all_valid, 6, cap, enable_lut=True, nb_cap=16)

    t_true = timeit("encode_tiles all_valid=True (no mask path)",
                    jax.jit(lambda: enc(ones_d, True)))
    t_ones = timeit("encode_tiles ones mask, all_valid=False",
                    jax.jit(lambda: enc(ones_d, False)))
    t_msk = timeit("encode_tiles masked (8% invalid)",
                   jax.jit(lambda: enc(mask_d, False)))
    print(f"masked machinery with zero invalids: +{t_ones - t_true:.2f} ms; "
          f"real mask adds {t_msk - t_ones:.2f} ms more "
          f"({t_true / t_msk * 100:.0f}% of unmasked speed)", flush=True)

    def enc_nolut(mask_arg, all_valid):
        return device_encode.encode_tiles(
            data_d, mask_arg, jnp.float32(0.001), H, W, 1, DataType.FLOAT,
            all_valid, 6, cap, enable_lut=False, nb_cap=16)

    ta = timeit("no-LUT all_valid=True", jax.jit(lambda: enc_nolut(ones_d, True)))
    tb = timeit("no-LUT masked", jax.jit(lambda: enc_nolut(mask_d, False)))
    print(f"no-LUT masked machinery: +{tb - ta:.2f} ms", flush=True)

    def enc_uncap(mask_arg, all_valid):
        return device_encode.encode_tiles(
            data_d, mask_arg, jnp.float32(0.001), H, W, 1, DataType.FLOAT,
            all_valid, 6, cap, enable_lut=True, nb_cap=0)

    tc = timeit("uncapped all_valid=True", jax.jit(lambda: enc_uncap(ones_d, True)))
    td = timeit("uncapped masked", jax.jit(lambda: enc_uncap(mask_d, False)))
    print(f"uncapped masked machinery: +{td - tc:.2f} ms", flush=True)

    # ablation: compaction alone at the same scale
    n_blocks = (H // 8) * (W // 8)
    vb = mask.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(n_blocks, 64)
    vb_d = jnp.asarray(vb)
    q = jnp.asarray(rng.integers(0, 1 << 14, (n_blocks, 64), dtype=np.uint32))

    def compact2(vb_, q_):
        c = device_encode.make_compactor(vb_)
        return c(q_, q_ ^ jnp.uint32(123))

    timeit("make_compactor + compact x2 arrays", jax.jit(compact2), vb_d, q)

    # the pure-stats portion (min/max/quant) masked vs not
    def stats(vb_, x_):
        big = jnp.where(vb_, x_, jnp.inf)
        small = jnp.where(vb_, x_, -jnp.inf)
        return big.min(axis=1), small.max(axis=1)

    xb = jnp.asarray(rng.standard_normal((n_blocks, 64)).astype(np.float32))
    timeit("masked min/max stats", jax.jit(stats), vb_d, xb)


if __name__ == "__main__":
    main()


# Measured 2026-08-19 (v5e, nb_cap=16, 2048^2 f32, CHAIN=32):
#   all_valid=True           4.98 ms (3367 MB/s)
#   ones mask (machinery)    9.37 ms (+4.39; compaction alone 1.6,
#                            no-LUT machinery +2.33, LUT interplay ~+2.1)
#   real 8% mask             9.48 ms (+0.10 over ones: barriers fixed the
#                            per-consumer recompute of the routing masks)
#   uncapped masked          +8.73 ms machinery (one-hot pack paths read
#                            the materialized compaction outputs harder)
# Log-shift compaction replaced the one-hot dot (bench masked encode
# 1357 -> 1608 MB/s); the residual LUT-candidate interplay is unexplained
# -- same shapes/ops either way, likely XLA fusion-boundary scheduling.
