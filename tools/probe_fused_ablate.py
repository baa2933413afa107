#!/usr/bin/env python
"""Ablation breakdown of the fused wave kernel (perf triage).

Compiles kernel variants with whole sections compiled out and measures
each, attributing the ~ms/batch wave-body cost to sections:

  base        full lite kernel (has8x8=F haspcm=F, the production
              variant for baseline-profile streams)
  -i4         I4x4 16-step prediction chain removed
  -i16        I16x16 prediction section removed
  -chroma     chroma prediction section removed
  -res        in-kernel residual construction removed (zero residuals)

Differences (base - ablated) approximate each section's cost; they need
not sum to the total (XLA reschedules around removed work).

Usage: python tools/probe_fused_ablate.py [batch]   (default 16)
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print("device:", jax.devices()[0], "| batch", B, flush=True)
    arrays, luma, chroma, dcs, ls4, ls8 = synth_slots(B)
    args = ({k: jnp.asarray(v) for k, v in arrays.items()},
            jnp.asarray(luma), jnp.asarray(chroma), jnp.asarray(dcs),
            jnp.asarray(ls4), jnp.asarray(ls8), 0, 0)

    results = {}
    for name, ablate in (("base", ()), ("-i4", ("i4",)),
                         ("-i16", ("i16",)), ("-chroma", ("chroma",)),
                         ("-res", ("res",))):
        fn = make_reconstruct_fused_slots(WMB, HMB, B, has8x8=False,
                                          haspcm=False, ablate=ablate)
        t0 = time.time()
        y, cb, cr = fn(*args)
        np.asarray(y[0, 0, :2])
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(ITERS):
            y, cb, cr = fn(*args)
        np.asarray(y[0, 0, :2])
        dt = (time.time() - t0) / ITERS
        results[name] = dt
        extra = ""
        if name != "base" and "base" in results:
            extra = (f"  -> section ~{(results['base']-dt)*1000:.1f} ms "
                     f"({(results['base']-dt)/results['base']*100:.0f}%)")
        print(f"{name:8s}: {dt*1000:6.1f} ms/batch "
              f"(compile+first {tc:.0f}s){extra}", flush=True)


if __name__ == "__main__":
    main()
