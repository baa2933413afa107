#!/usr/bin/env python
"""Where does the has8x8 kernel variant's 2x cost go?  (perf triage)

Measures the fused slot kernel at 1080p batch 16 in five variants:
  lite        has8x8=False (the baseline-profile kernel, ~2000 fps)
  full8x8     has8x8=True, everything on (~1000 fps)
  -i8pred     8x8 variant minus the I8x8 prediction chain (ablate "i8")
  -res8       minus the 8x8 dequant+IDCT (ablate "res8")
  -p8sel      minus the second assembly matmul + select (ablate "p8sel")

Differences attribute the extra ms/batch to prediction vs transform vs
assembly.  Ablations are perf-triage only (wrong pixels by design).

Usage: python tools/probe_8x8.py [batch]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

import numpy as np

from probe_fused_batch import WMB, HMB, ITERS, synth_slots


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from minivideo_tpu.ops.recon_fused import make_reconstruct_fused_slots

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    arrays, luma, chroma, dcs, ls4, ls8 = synth_slots(batch)
    small = {k: jnp.asarray(v) for k, v in arrays.items()}
    args = (small, jnp.asarray(luma), jnp.asarray(chroma),
            jnp.asarray(dcs), jnp.asarray(ls4), jnp.asarray(ls8), 0, 0)

    variants = [
        ("lite", dict(has8x8=False, haspcm=False)),
        ("full8x8", dict(has8x8=True, haspcm=False)),
        ("-i8pred", dict(has8x8=True, haspcm=False, ablate=("i8",))),
        ("-res8", dict(has8x8=True, haspcm=False, ablate=("res8",))),
        ("-p8sel", dict(has8x8=True, haspcm=False, ablate=("p8sel",))),
    ]
    results = {}
    for name, kw in variants:
        fn = make_reconstruct_fused_slots(WMB, HMB, batch, **kw)
        t0 = time.time()
        y, cb, cr = fn(*args)
        np.asarray(y[0, 0, :2])
        print(f"{name}: first call {time.time()-t0:.1f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(ITERS):
                y, cb, cr = fn(*args)
            np.asarray(y[0, 0, :2])
            best = min(best, (time.time() - t0) / ITERS)
        results[name] = best * 1000
        print(f"{name}: {best*1000:.2f} ms/batch "
              f"({batch/best:.0f} fps)", flush=True)
    full = results["full8x8"]
    print(f"\nattribution vs full8x8 ({full:.2f} ms):")
    print(f"  lite delta          : {full - results['lite']:.2f} ms")
    print(f"  I8x8 prediction     : {full - results['-i8pred']:.2f} ms")
    print(f"  8x8 dequant+IDCT    : {full - results['-res8']:.2f} ms")
    print(f"  8x8 assembly+select : {full - results['-p8sel']:.2f} ms")


if __name__ == "__main__":
    main()
