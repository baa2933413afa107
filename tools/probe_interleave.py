#!/usr/bin/env python
"""Micro-probe: tile->raster interleave formulations (perf triage).

The fused engine's last unskew stage turns gathered MB tiles
[B, hmb, wmb, 16y, 16x] u8 into raster [B, H, W] — a (wmb, 16y) swap
with 16-byte minor runs that XLA transposes at ~8.5 ms/batch-16.
Variants:

  xla-t     plain transpose(0,1,3,2,4) + reshape (current)
  i32-t     bitcast x-dim to 4 x int32, transpose, bitcast back
  stack-y   16 static y-slices concatenated along a new axis
  dma       Pallas HBM->HBM strided-DMA kernel (grid over MB rows)

Usage: python tools/probe_interleave.py [batch]
"""

import os
import sys
import time
from functools import partial

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

import numpy as np

from probe_fused_batch import WMB, HMB, ITERS


def _time(fn, sync, label, iters=ITERS):
    try:
        t0 = time.time()
        sync(fn())
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        sync(out)
        dt = (time.time() - t0) / iters
        print(f"{label:8s}: {dt*1000:6.1f} ms/batch (first {tc:.0f}s)",
              flush=True)
        return out
    except Exception as e:                         # noqa: BLE001
        print(f"{label:8s}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print("device:", jax.devices()[0], "| batch", B, flush=True)
    rng = np.random.default_rng(0)
    n = HMB * WMB
    X = jnp.asarray(rng.integers(0, 256, (B, n, 256), np.uint8))

    def s0(out):
        np.asarray(out[0, 0, :2])

    @jax.jit
    def xla_t(X):
        t = X.reshape(B, HMB, WMB, 16, 16).transpose(0, 1, 3, 2, 4)
        return t.reshape(B, HMB * 16, WMB * 16)

    want = np.asarray(_time(lambda: xla_t(X), s0, "xla-t"))

    @jax.jit
    def i32_t(X):
        t = jax.lax.bitcast_convert_type(
            X.reshape(B, HMB, WMB, 16, 4, 4), jnp.int32)
        t = t.transpose(0, 1, 3, 2, 4)
        t = jax.lax.bitcast_convert_type(t, jnp.uint8)
        return t.reshape(B, HMB * 16, WMB * 16)

    out = _time(lambda: i32_t(X), s0, "i32-t")
    if out is not None:
        np.testing.assert_array_equal(np.asarray(out), want)

    @jax.jit
    def stack_y(X):
        t = X.reshape(B, HMB, WMB, 16, 16)
        rows = [t[:, :, :, y, :].reshape(B, HMB, 1, WMB * 16)
                for y in range(16)]
        return jnp.concatenate(rows, axis=2).reshape(
            B, HMB * 16, WMB * 16)

    out = _time(lambda: stack_y(X), s0, "stack-y")
    if out is not None:
        np.testing.assert_array_equal(np.asarray(out), want)

    # ---- Pallas strided-DMA kernel ----------------------------------------
    def dma_kernel(in_ref, out_ref, sems):
        # in_ref [B, n, 256] u8 in ANY (HBM); out_ref [B, HMB*16, WMB, 16]
        r = pl.program_id(0)
        for y in range(16):
            src = in_ref.at[:, pl.ds(r * WMB, WMB), pl.ds(16 * y, 16)]
            dst = out_ref.at[:, r * 16 + y]
            cp = pltpu.make_async_copy(src, dst, sems.at[y])
            cp.start()
        for y in range(16):
            src = in_ref.at[:, pl.ds(r * WMB, WMB), pl.ds(16 * y, 16)]
            dst = out_ref.at[:, r * 16 + y]
            pltpu.make_async_copy(src, dst, sems.at[y]).wait()

    dma_call = pl.pallas_call(
        dma_kernel,
        grid=(HMB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, HMB * 16, WMB, 16), jnp.uint8),
        scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
    )

    @jax.jit
    def dma(X):
        return dma_call(X).reshape(B, HMB * 16, WMB * 16)

    out = _time(lambda: dma(X), s0, "dma")
    if out is not None:
        np.testing.assert_array_equal(np.asarray(out), want)


if __name__ == "__main__":
    main()
