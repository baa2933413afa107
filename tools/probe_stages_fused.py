#!/usr/bin/env python
"""Stage timing for the fused engine: residuals / pack_fused / kernel /
unskew, plus full.  Usage: probe_stages_fused.py [WMB HMB BATCH ITERS]"""

import os
import sys
import time
from functools import partial

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np


def main():
    wmb = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    hmb = int(sys.argv[2]) if len(sys.argv) > 2 else 68
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from minivideo_tpu.ops.recon import build_residuals
    from minivideo_tpu.ops.recon_wave import skew_tables
    import minivideo_tpu.ops.recon_fused as rf
    from minivideo_tpu.ops.recon_lane import _SEL4_T, _SEL8_T

    print("device:", jax.devices()[0], flush=True)
    z = np.load(os.path.join(ROOT, ".bench_cache", "syntax_1080p_v1.npz"))
    arrays = {k: z[k] for k in z.files if k not in ("ls4", "ls8", "offs")}
    ls4, ls8 = z["ls4"], z["ls8"]
    offs = tuple(int(x) for x in z["offs"])
    batch_arrays = {k: jnp.asarray(np.broadcast_to(
        v, (batch,) + v.shape[1:]).copy()) for k, v in arrays.items()}
    ls4j, ls8j = jnp.asarray(ls4), jnp.asarray(ls8)

    g = skew_tables(wmb, hmb)
    g["wmb"], g["hmb"] = wmb, hmb
    print("n_waves:", g["n_waves"], "maxw:", g["maxw"],
          "L:", batch * g["maxw"], flush=True)

    def _sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf[(0,) * (leaf.ndim - 1)][:2])

    def timeit(name, fn, *args):
        out = fn(*args)
        _sync(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
            _sync(out)
        dt = (time.time() - t0) / iters
        print(f"{name}: {dt*1000:.1f} ms/batch ({batch/dt:.1f} fps)",
              flush=True)
        return out

    resfn = jax.jit(partial(build_residuals, cb_off=offs[0], cr_off=offs[1]))
    res = timeit("A residuals ", resfn, batch_arrays, ls4j, ls8j)
    packfn = jax.jit(lambda a, r: rf.pack_fused(a, r, g, batch))
    meta, resl, resc = timeit("B pack_fused", packfn, batch_arrays, res)

    dr0, shtop = rf.wave_schedule(g)
    mr_np, ml_np = rf._seg_masks(g["maxw"], batch)
    kernel = rf._build_kernel(wmb, hmb, batch)
    kargs = (jnp.asarray(dr0), jnp.asarray(shtop), jnp.asarray(mr_np),
             jnp.asarray(ml_np), meta, resl, resc,
             jnp.asarray(_SEL4_T[0]), jnp.asarray(_SEL4_T[1]),
             jnp.asarray(_SEL4_T[2]), jnp.asarray(_SEL8_T[0]),
             jnp.asarray(_SEL8_T[1]), jnp.asarray(_SEL8_T[2]))
    outs = timeit("C kernel    ", jax.jit(lambda *a: kernel(*a)), *kargs)

    unskfn = jax.jit(lambda y, c: rf.unskew_fused(
        y.astype(jnp.uint8), c.astype(jnp.uint8), g, batch))
    timeit("D unskew    ", unskfn, outs[0], outs[1])

    full = rf.make_reconstruct_fused(wmb, hmb, batch)
    timeit("FULL        ", full, batch_arrays, ls4j, ls8j, offs[0], offs[1])


if __name__ == "__main__":
    main()
