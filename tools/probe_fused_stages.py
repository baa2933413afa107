#!/usr/bin/env python
"""Decompose the fused device pass into its jit-level stages and time
each on TPU (perf triage):

  full        make_reconstruct_fused_slots (prep + kernel + unskew)
  kernel      the Pallas wave kernel alone, on pre-staged feeds
  prep        slot_feed transposes + meta skew alone
  unskew      the output unskew alone, on dummy kernel outputs

Usage: python tools/probe_fused_stages.py [batch] [--v2]
       (--v2 = device-layout staging + lite kernel, the production
       TPU configuration)
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

import numpy as np

from probe_fused_batch import WMB, HMB, ITERS, synth_slots


def _time(fn, sync, label, iters=ITERS):
    t0 = time.time()
    out = fn()
    sync(out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{label:8s}: {dt*1000:6.1f} ms/batch (first {tc:.0f}s)",
          flush=True)
    return dt


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from minivideo_tpu.ops import slab as sl
    from minivideo_tpu.ops.recon_fused import (
        _build_kernel, _kernel_call, make_reconstruct_fused_slots,
        unskew_fused)
    from minivideo_tpu.ops.recon_wave import skew_tables

    v2 = "--v2" in sys.argv
    nums = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(nums[0]) if nums else 16
    print("device:", jax.devices()[0], "| batch", B,
          "| staging:", "v2" if v2 else "v1", flush=True)
    if v2:
        from probe_fused_batch import synth_v2
        from minivideo_tpu.ops.recon_fused import (
            make_reconstruct_fused_slots2)
        meta, luma, chroma, dcs, ls4, ls8 = synth_v2(B)
        args2 = tuple(jnp.asarray(a) if not isinstance(a, tuple) else a
                      for a in (meta, luma, chroma, dcs, ls4, ls8))
        g = skew_tables(WMB, HMB)
        g["wmb"], g["hmb"] = WMB, HMB
        W, maxw = g["n_waves"], g["maxw"]
        L = B * maxw

        def sync_planes(out):
            np.asarray(out[0][0, 0, :2])

        full = make_reconstruct_fused_slots2(WMB, HMB, B, has8x8=False,
                                             haspcm=False)
        _time(lambda: full(*args2), sync_planes, "full")

        @jax.jit
        def prep(meta, luma, chroma, dcs):
            def f(x, S):
                return x.transpose(1, 2, 0, 3).reshape(W, S, L)
            return (f(meta, sl.META_ROWS), f(luma, 256), f(chroma, 128),
                    f(dcs, sl.DC_ROWS))

        def sync_prep(out):
            np.asarray(out[1][0, 0, :2])

        _time(lambda: prep(*args2[:4]), sync_prep, "prep")

        feeds = jax.block_until_ready(prep(*args2[:4]))
        kernel = _build_kernel(WMB, HMB, B, has8x8=False, haspcm=False)

        @jax.jit
        def kern(meta_s, coefl_s, coefc_s, dcs_s, ls4, ls8):
            return _kernel_call(kernel, g, B, meta_s, coefl_s, coefc_s,
                                dcs_s, ls4, ls8)

        _time(lambda: kern(*feeds, args2[4], args2[5]), sync_planes,
              "kern+un")

        oy = jnp.zeros((W, 256, L), jnp.uint8)
        oc = jnp.zeros((W, 128, L), jnp.uint8)

        @jax.jit
        def unsk(oy, oc):
            return unskew_fused(oy, oc, g, B)

        _time(lambda: unsk(oy, oc), sync_planes, "unskew")
        return
    arrays, luma, chroma, dcs, ls4, ls8 = synth_slots(B)
    g = skew_tables(WMB, HMB)
    g["wmb"], g["hmb"] = WMB, HMB
    n_waves, maxw = g["n_waves"], g["maxw"]
    L = B * maxw
    jarr = {k: jnp.asarray(v) for k, v in arrays.items()}
    jl, jc, jd = jnp.asarray(luma), jnp.asarray(chroma), jnp.asarray(dcs)
    ls4j, ls8j = jnp.asarray(ls4), jnp.asarray(ls8)

    def sync_planes(out):
        np.asarray(out[0][0, 0, :2])

    # ---- full --------------------------------------------------------------
    full = make_reconstruct_fused_slots(WMB, HMB, B, has8x8=False,
                                        haspcm=False)
    _time(lambda: full(jarr, jl, jc, jd, ls4j, ls8j, 0, 0), sync_planes,
          "full")

    # ---- prep only ---------------------------------------------------------
    @jax.jit
    def prep(arrays, luma_slab, chroma_slab, dc_slab):
        meta = sl.meta_raster(arrays, 0, 0, WMB, HMB)
        meta_s = sl.vmask_feed(sl.skew_feed(meta, g, B), g, B)
        coefl_s = sl.slot_feed(luma_slab, g, B, jnp.int16)
        coefc_s = sl.slot_feed(chroma_slab, g, B, jnp.int16)
        dcs_s = sl.slot_feed(dc_slab, g, B, jnp.int16)
        return meta_s, coefl_s, coefc_s, dcs_s

    def sync_prep(out):
        np.asarray(out[1][0, 0, :2])

    _time(lambda: prep(jarr, jl, jc, jd), sync_prep, "prep")

    # ---- kernel only (pre-staged feeds) ------------------------------------
    meta_s, coefl_s, coefc_s, dcs_s = jax.block_until_ready(
        prep(jarr, jl, jc, jd))
    kernel = _build_kernel(WMB, HMB, B, has8x8=False, haspcm=False)

    @jax.jit
    def kern(meta_s, coefl_s, coefc_s, dcs_s, ls4, ls8):
        return _kernel_call(kernel, g, B, meta_s, coefl_s, coefc_s,
                            dcs_s, ls4, ls8)

    # _kernel_call includes unskew; time it, then unskew alone below
    _time(lambda: kern(meta_s, coefl_s, coefc_s, dcs_s, ls4j, ls8j),
          sync_planes, "kern+un")

    # ---- unskew only -------------------------------------------------------
    oy = jnp.zeros((n_waves, 256, L), jnp.uint8)
    oc = jnp.zeros((n_waves, 128, L), jnp.uint8)

    @jax.jit
    def unsk(oy, oc):
        return unskew_fused(oy, oc, g, B)

    _time(lambda: unsk(oy, oc), sync_planes, "unskew")


if __name__ == "__main__":
    main()
