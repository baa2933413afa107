#!/usr/bin/env python
"""Micro-probe: unskew formulations for the fused engine's output pass
(perf triage; see PERF.md round-3 stage decomposition — unskew is
~10.5 ms of the 21.7 ms device pass).

Times, on synthetic wave-major kernel outputs [W, 256, L] uint8:

  full      current unskew_fused (transpose + MB-tile gather + raster
            transpose)
  t1        first transpose only: [W, 256, B, maxw] -> [B, W, maxw, 256]
  t1+g      transpose + tile gather [:, unskew]
  i32-g     same gather but rows bitcast to int32 (4x fewer elements)

Usage: python tools/probe_unskew.py [batch]   (default 16)
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

import numpy as np

from probe_fused_batch import WMB, HMB, ITERS


def _time(fn, sync, label, iters=ITERS):
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
    return dt


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from minivideo_tpu.ops.recon_fused import unskew_fused
    from minivideo_tpu.ops.recon_wave import skew_tables

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    g = skew_tables(WMB, HMB)
    g["wmb"], g["hmb"] = WMB, HMB
    n_waves, maxw = g["n_waves"], g["maxw"]
    L = B * maxw
    print("device:", jax.devices()[0], f"| batch {B} L {L}", flush=True)
    rng = np.random.default_rng(0)
    oy = jnp.asarray(rng.integers(0, 256, (n_waves, 256, L), np.uint8))
    oc = jnp.asarray(rng.integers(0, 256, (n_waves, 128, L), np.uint8))
    unskew = jnp.asarray(
        (g["w_of"].astype(np.int64) * maxw + g["k_of"]).astype(np.int32))

    def s0(out):
        np.asarray(out[0][0, 0, :2])

    @jax.jit
    def full(oy, oc):
        return unskew_fused(oy, oc, g, B)

    _time(lambda: full(oy, oc), s0, "full")

    @jax.jit
    def t1(oy):
        return oy.reshape(n_waves, 256, B, maxw).transpose(2, 0, 3, 1)

    _time(lambda: (t1(oy),), s0, "t1")

    @jax.jit
    def t1g(oy):
        t = oy.reshape(n_waves, 256, B, maxw).transpose(2, 0, 3, 1)
        return t.reshape(B, n_waves * maxw, 256)[:, unskew]

    _time(lambda: (t1g(oy),), s0, "t1+g")

    @jax.jit
    def t1g32(oy):
        t = oy.reshape(n_waves, 256, B, maxw).transpose(2, 0, 3, 1)
        t32 = jax.lax.bitcast_convert_type(
            t.reshape(B, n_waves * maxw, 64, 4), jnp.int32)
        return t32[:, unskew]

    _time(lambda: (t1g32(oy),), s0, "i32-g")

    # row16 gather: index space includes the tile row, payload is the
    # 16-byte x-row; output [B, r, y, c, x] contiguous IS the raster
    # plane by reshape (no final interleave transpose)
    i_ryc = (unskew[:, None] * 16
             + jnp.arange(16, dtype=jnp.int32)[None, :])  # [n, 16y]
    i_ryc = i_ryc.reshape(HMB, WMB, 16).transpose(0, 2, 1).reshape(-1)

    @jax.jit
    def g16(oy):
        t = oy.reshape(n_waves, 256, B, maxw).transpose(2, 0, 3, 1)
        r = t.reshape(B, n_waves * maxw * 16, 16)[:, i_ryc]
        return r.reshape(B, HMB * 16, WMB * 16)

    _time(lambda: (g16(oy),), s0, "g16")

    # prep decomposition: slab slot_feed transposes vs meta skew gather
    from minivideo_tpu.ops import slab as sl
    rng2 = np.random.default_rng(1)
    n_slots = n_waves * maxw
    luma = jnp.asarray(rng2.integers(-6, 7, (B, n_slots, 256), np.int16))

    @jax.jit
    def feed_l(luma):
        return sl.slot_feed(luma, g, B, jnp.int16)

    def s1(out):
        np.asarray(out[0][0, 0, :2])

    _time(lambda: (feed_l(luma),), s1, "feed-l")

    arrays = {
        "mb_kind": jnp.asarray(
            rng2.integers(0, 2, (B, WMB * HMB), np.int32)),
        "qpy": jnp.asarray(rng2.integers(10, 45, (B, WMB * HMB), np.int32)),
        "i16_mode": jnp.zeros((B, WMB * HMB), jnp.int32),
        "chroma_mode": jnp.zeros((B, WMB * HMB), jnp.int32),
        "luma4x4_modes": jnp.zeros((B, WMB * HMB, 16), jnp.int32),
        "luma8x8_modes": jnp.zeros((B, WMB * HMB, 4), jnp.int32),
        "parsed": jnp.ones((B, WMB * HMB), jnp.int32),
        "slice_id": jnp.zeros((B, WMB * HMB), jnp.int32),
    }

    @jax.jit
    def feed_m(arrays):
        meta = sl.meta_raster(arrays, 0, 0, WMB, HMB)
        return sl.vmask_feed(sl.skew_feed(meta, g, B), g, B)

    _time(lambda: (feed_m(arrays),), s1, "feed-m")


if __name__ == "__main__":
    main()
