#!/usr/bin/env python
"""Probe: compile + time a single-kernel Pallas driver on the real TPU
chip at a given geometry.  Usage:
    python tools/probe_pallas_tpu.py [WMB HMB BATCH [ITERS [ENGINE]]]
ENGINE: lane (per-frame grid) | fused (batch-in-lanes; default).
Defaults to 1080p (120x68) batch 16 using the cached bench syntax.
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np


def main():
    wmb = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    hmb = int(sys.argv[2]) if len(sys.argv) > 2 else 68
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    engine = sys.argv[5] if len(sys.argv) > 5 else "fused"

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    if engine == "fused":
        from minivideo_tpu.ops.recon_fused import (
            make_reconstruct_fused as make_engine)
    else:
        from minivideo_tpu.ops.recon_lane_pallas import (
            make_reconstruct_lane_pallas as make_engine)

    print("device:", jax.devices()[0], flush=True)

    cache = os.path.join(ROOT, ".bench_cache", "syntax_1080p_v1.npz")
    if wmb == 120 and hmb == 68 and os.path.exists(cache):
        z = np.load(cache)
        arrays = {k: z[k] for k in z.files if k not in ("ls4", "ls8", "offs")}
        ls4, ls8 = z["ls4"], z["ls8"]
        offs = tuple(int(x) for x in z["offs"])
    else:
        sys.path.insert(0, os.path.join(ROOT, "tests"))
        from fixtures.h264enc import make_stream
        from minivideo_tpu.ops.recon import pack_frames
        from tests.test_recon_jax import _parse_stream
        data = make_stream(width_mbs=wmb, height_mbs=hmb, n_pictures=1,
                           seed=42, mb_kinds=("i16", "i4"), density=0.25,
                           allow_pcm=False)
        frames, sps, pps = _parse_stream(data)
        p = pack_frames(frames, sps, pps)
        arrays, ls4, ls8, offs = p.arrays, p.ls4, p.ls8, p.chroma_qp_off

    batch_arrays = {k: jnp.asarray(np.broadcast_to(
        v, (batch,) + v.shape[1:]).copy()) for k, v in arrays.items()}
    ls4j, ls8j = jnp.asarray(ls4), jnp.asarray(ls8)

    fn = make_engine(wmb, hmb, batch)
    print(f"compiling {engine} {wmb}x{hmb} MBs batch={batch} ...",
          flush=True)
    t0 = time.time()
    y, cb, cr = fn(batch_arrays, ls4j, ls8j, offs[0], offs[1])
    _ = np.asarray(y[0, 0, :4])
    print(f"first call (compile): {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    for _ in range(iters):
        y, cb, cr = fn(batch_arrays, ls4j, ls8j, offs[0], offs[1])
        _ = np.asarray(y[0, 0, :4])
    dt = time.time() - t0
    print(f"{batch * iters} frames in {dt:.3f}s -> "
          f"{batch * iters / dt:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
