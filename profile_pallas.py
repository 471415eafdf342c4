"""Probe Mosaic/Pallas TPU capabilities needed for the codec kernels:
dynamic 1D VMEM slice read/write, dynamic-offset DMA, roll, etc."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0:1])


def probe(name, fn):
    try:
        out = fn()
        fetch(out)
        t0 = time.perf_counter()
        fetch(fn())
        dt = (time.perf_counter() - t0) * 1e3
        print(f"OK   {name:44s} {dt:8.1f} ms", flush=True)
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"FAIL {name:44s} {type(e).__name__}: {msg}", flush=True)
        return None


# ---- 1. dynamic 1D slice READ from VMEM (traced scalar offset)
def dyn_read():
    def k(off_ref, in_ref, out_ref):
        o = off_ref[0]
        out_ref[:] = in_ref[pl.ds(o, 128)]

    x = jnp.arange(1024, dtype=jnp.int32)
    off = jnp.asarray([37], jnp.int32)
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((128,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(off, x)


r = probe("dyn 1D VMEM slice read", dyn_read)
if r is not None:
    exp = np.arange(37, 37 + 128)
    print("     correct:", bool((np.asarray(r) == exp).all()))


# ---- 2. dynamic 1D slice WRITE (read-modify-write accumulate)
def dyn_write():
    def k(off_ref, val_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)
        def body(i, _):
            o = off_ref[i]
            out_ref[pl.ds(o, 128)] += val_ref[i, :]
            return 0
        jax.lax.fori_loop(0, 8, body, 0)

    vals = jnp.ones((8, 128), jnp.int32)
    offs = jnp.asarray([0, 100, 200, 300, 400, 500, 600, 700], jnp.int32)
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((1024,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(offs, vals)


r = probe("dyn 1D VMEM slice write+=, 8 iters", dyn_write)
if r is not None:
    out = np.asarray(r)
    print("     correct:", out.sum() == 8 * 128, out[:3], out[100:103])


# ---- 3. serial loop of 512 dynamic writes (assembly kernel inner loop)
def dyn_write_512():
    def k(off_ref, val_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)
        def body(i, _):
            o = off_ref[i]
            out_ref[pl.ds(o, 128)] += val_ref[i, :]
            return 0
        jax.lax.fori_loop(0, 512, body, 0)

    vals = jnp.ones((512, 128), jnp.int32)
    offs = jnp.asarray(np.arange(512) * 64, jnp.int32)
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((512 * 64 + 128,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(offs, vals)


probe("dyn 1D VMEM write x512 serial", dyn_write_512)


# ---- 4. grid of 128 programs x 512 dynamic reads (decode window shape)
def window_kernel():
    N, R, W = 65536, 512, 64

    def k(off_ref, stream_ref, out_ref):
        def body(i, _):
            o = off_ref[i]
            out_ref[i, :] = stream_ref[pl.ds(o, W)]
            return 0
        jax.lax.fori_loop(0, R, body, 0)

    stream = jnp.arange(140 * 1024, dtype=jnp.uint32)
    offs = jnp.asarray(np.random.default_rng(0).integers(0, 130000, N), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // R,),
        in_specs=[
            pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.uint32),
        grid_spec=grid_spec,
    )(offs, stream)


r = probe("window: 65536 dyn reads of 64 words", window_kernel)

# ---- 5. DMA HBM->VMEM at dynamic offset
def dyn_dma():
    def k(off_ref, hbm_ref, out_ref):
        def body(scratch, sem):
            o = off_ref[0]
            dma = pltpu.make_async_copy(
                hbm_ref.at[pl.ds(o, 4096)], scratch, sem)
            dma.start()
            dma.wait()
            out_ref[:] = scratch[:]
        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((4096,), jnp.uint32),
            sem=pltpu.SemaphoreType.DMA,
        )

    x = jnp.arange(1 << 20, dtype=jnp.uint32)
    off = jnp.asarray([12345], jnp.int32)
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((4096,), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(off, x)


r = probe("DMA HBM->VMEM dynamic offset", dyn_dma)
if r is not None:
    print("     correct:", bool((np.asarray(r) == np.arange(12345, 12345 + 4096)).all()))


# ---- 6. pltpu.roll with traced shift
def dyn_roll():
    def k(sh_ref, in_ref, out_ref):
        out_ref[:] = pltpu.roll(in_ref[:], sh_ref[0], 0)

    x = jnp.arange(1024, dtype=jnp.int32)
    sh = jnp.asarray([5], jnp.int32)
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((1024,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(sh, x)


probe("pltpu.roll dynamic shift", dyn_roll)
