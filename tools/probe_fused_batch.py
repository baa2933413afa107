#!/usr/bin/env python
"""Device-only throughput probe for the fused engine at various batch
sizes (1080p, slot-staged synthetic coefficients).

Usage: python tools/probe_fused_batch.py [batch ...] [--lite]
       (default: 16 32; --lite = the has8x8=False/haspcm=False
       specialized kernel that production picks for baseline-profile
       streams)

Measures the full device pass (slot transpose + meta skew + Pallas wave
kernel + unskew) with pipelined dispatch, like bench.py's device stage.
Synthetic-but-valid inputs: random levels in the slab records, i16/i4
kinds, modes in range — throughput is shape-dependent, not data-
dependent (everything is branchless).
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

WMB, HMB = 120, 68
ITERS = 16


def synth_slots(batch, seed=0):
    from minivideo_tpu.ops.recon_wave import skew_tables
    rng = np.random.default_rng(seed)
    g = skew_tables(WMB, HMB)
    n = WMB * HMB
    n_slots = g["n_waves"] * g["maxw"]
    B = batch
    arrays = {
        "mb_kind": rng.integers(0, 2, (B, n)).astype(np.int32),
        "qpy": rng.integers(10, 45, (B, n)).astype(np.int32),
        "i16_mode": rng.integers(0, 4, (B, n)).astype(np.int32),
        "chroma_mode": rng.integers(0, 4, (B, n)).astype(np.int32),
        "luma4x4_modes": rng.integers(0, 9, (B, n, 16)).astype(np.int32),
        "luma8x8_modes": rng.integers(0, 9, (B, n, 4)).astype(np.int32),
        "parsed": np.ones((B, n), np.int32),
        "slice_id": np.zeros((B, n), np.int32),
    }
    luma = rng.integers(-6, 7, (B, n_slots, 256)).astype(np.int16)
    chroma = rng.integers(-4, 5, (B, n_slots, 128)).astype(np.int16)
    dcs = rng.integers(-8, 9, (B, n_slots, 32)).astype(np.int16)
    from minivideo_tpu.ops.transform import (level_scale_4x4_np,
                                             level_scale_8x8_np)
    ls4 = np.stack([level_scale_4x4_np(np.full(16, 16, np.int32))] * 3)
    ls8 = level_scale_8x8_np(np.full(64, 16, np.int32))
    return arrays, luma, chroma, dcs, ls4, ls8


def synth_v2(batch, seed=0):
    """Synthetic device-layout (v2) staging feeds."""
    from minivideo_tpu.ops import slab as sl
    from minivideo_tpu.ops.recon_wave import skew_tables
    rng = np.random.default_rng(seed)
    g = skew_tables(WMB, HMB)
    W, maxw = g["n_waves"], g["maxw"]
    B = batch
    meta = np.zeros((B, W, sl.META_ROWS, maxw), np.int32)
    meta[:, :, 0] = rng.integers(0, 2, (B, W, maxw))
    meta[:, :, 1] = 1
    meta[:, :, 2:6] = rng.integers(0, 2, (B, W, 4, maxw))
    meta[:, :, 6] = rng.integers(0, 4, (B, W, maxw))
    meta[:, :, 7] = rng.integers(0, 4, (B, W, maxw))
    meta[:, :, 8:28] = rng.integers(0, 9, (B, W, 20, maxw))
    qp = rng.integers(10, 45, (B, W, maxw))
    meta[:, :, 28], meta[:, :, 29] = qp % 6, qp // 6
    meta[:, :, 30], meta[:, :, 31] = qp % 6, qp // 6
    meta[:, :, 32], meta[:, :, 33] = qp % 6, qp // 6
    luma = rng.integers(-6, 7, (B, W, 256, maxw)).astype(np.int16)
    chroma = rng.integers(-4, 5, (B, W, 128, maxw)).astype(np.int16)
    dcs = rng.integers(-8, 9, (B, W, 32, maxw)).astype(np.int16)
    from minivideo_tpu.ops.transform import (level_scale_4x4_np,
                                             level_scale_8x8_np)
    ls4 = np.stack([level_scale_4x4_np(np.full(16, 16, np.int32))] * 3)
    ls8 = level_scale_8x8_np(np.full(64, 16, np.int32))
    return meta, luma, chroma, dcs, ls4, ls8


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from minivideo_tpu.ops.recon_fused import (
        make_reconstruct_fused_slots, make_reconstruct_fused_slots2)

    lite = "--lite" in sys.argv
    v2 = "--v2" in sys.argv
    batches = [int(a) for a in sys.argv[1:] if not a.startswith("-")] \
        or [16, 32]
    print("device:", jax.devices()[0],
          "| variant:", "lite (has8x8=F haspcm=F)" if lite else "full",
          "| staging:", "v2" if v2 else "v1",
          flush=True)
    for B in batches:
        if v2:
            meta, luma, chroma, dcs, ls4, ls8 = synth_v2(B)
            args = tuple(jnp.asarray(a)
                         for a in (meta, luma, chroma, dcs, ls4, ls8))
        else:
            arrays, luma, chroma, dcs, ls4, ls8 = synth_slots(B)
            args = ({k: jnp.asarray(v) for k, v in arrays.items()},
                    jnp.asarray(luma), jnp.asarray(chroma),
                    jnp.asarray(dcs),
                    jnp.asarray(ls4), jnp.asarray(ls8), 0, 0)
        try:
            mk = (make_reconstruct_fused_slots2 if v2
                  else make_reconstruct_fused_slots)
            fn = mk(WMB, HMB, B, has8x8=not lite, haspcm=not lite)
            t0 = time.time()
            y, cb, cr = fn(*args)
            np.asarray(y[0, 0, :2])
            print(f"batch {B}: first call {time.time()-t0:.1f}s",
                  flush=True)
            t0 = time.time()
            for _ in range(ITERS):
                y, cb, cr = fn(*args)
            np.asarray(y[0, 0, :2])
            dt = time.time() - t0
            print(f"batch {B}: {dt/ITERS*1000:.1f} ms/batch -> "
                  f"{B*ITERS/dt:.1f} fps", flush=True)
        except Exception as e:                       # noqa: BLE001
            print(f"batch {B}: FAILED: {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)


if __name__ == "__main__":
    main()
