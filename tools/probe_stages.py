#!/usr/bin/env python
"""Stage-level timing of the lane-Pallas recon pipeline on the real chip:
  A: build_residuals (XLA)
  B: pack_lane skew/transpose (XLA)
  C: the Pallas wave kernel
  D: unskew_planes_lane (XLA)
Usage: python tools/probe_stages.py [WMB HMB BATCH [ITERS]]
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

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from functools import partial
    from minivideo_tpu.ops.recon import build_residuals
    from minivideo_tpu.ops.recon_lane import pack_lane, unskew_planes_lane
    from minivideo_tpu.ops.recon_wave import skew_tables
    import minivideo_tpu.ops.recon_lane_pallas as rlp

    print("device:", jax.devices()[0], flush=True)

    cache = os.path.join(ROOT, ".bench_cache", "syntax_1080p_v1.npz")
    z = np.load(cache)
    arrays = {k: z[k] for k in z.files if k not in ("ls4", "ls8", "offs")}
    ls4, ls8 = z["ls4"], z["ls8"]
    offs = tuple(int(x) for x in z["offs"])

    batch_arrays = {k: jnp.asarray(np.broadcast_to(
        v, (batch,) + v.shape[1:]).copy()) for k, v in arrays.items()}
    ls4j, ls8j = jnp.asarray(ls4), jnp.asarray(ls8)

    g = skew_tables(wmb, hmb)
    g["wmb"], g["hmb"] = wmb, hmb
    print("n_waves:", g["n_waves"], "maxw:", g["maxw"], flush=True)

    resfn = jax.jit(partial(build_residuals, cb_off=offs[0], cr_off=offs[1]))
    packfn = jax.jit(lambda a, r: pack_lane(a, r, g))

    def _sync(out):
        # tiny dependent readback: forces execution without transferring
        # the result (tunnel readback is ~20 MB/s and would dominate)
        leaf = jax.tree_util.tree_leaves(out)[0]
        idx = (0,) * (leaf.ndim - 1)
        _ = np.asarray(leaf[idx][:2])

    def timeit(name, fn, *args):
        out = fn(*args)
        _sync(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
            _sync(out)
        dt = (time.time() - t0) / iters
        print(f"{name}: {dt*1000:.1f} ms/batch "
              f"({batch/dt:.1f} fps)", flush=True)
        return out

    res = timeit("A build_residuals", resfn, batch_arrays, ls4j, ls8j)
    sk = timeit("B pack_lane      ", packfn, batch_arrays, res)

    # stage C: kernel alone (call the prebuilt pallas_call)
    import jax.experimental.pallas as pl  # noqa
    fn_full = rlp.make_reconstruct_lane_pallas(wmb, hmb, batch)

    # rebuild just the kernel the way make_reconstruct_lane_pallas does
    r0 = g["r0"].astype(np.int64)
    dr0 = np.diff(r0, prepend=r0[0]).astype(np.int32)
    r0m2 = np.concatenate([r0[:1], r0[:1], r0[:-2]])
    shtop = np.where(np.arange(g["n_waves"]) >= 2, 1 - (r0 - r0m2), 0)
    meta = sk["meta"].transpose(1, 0, 2, 3)
    resl = sk["res_luma"].transpose(1, 0, 2, 3)
    resc = sk["res_chroma"].transpose(1, 0, 2, 3)

    from minivideo_tpu.ops.recon_lane import _SEL4_T, _SEL8_T
    kernel = rlp._build_kernel(wmb, hmb, batch) if hasattr(rlp, "_build_kernel") else None
    if kernel is None:
        # inline: reuse private construction via module internals
        from minivideo_tpu.ops.recon_lane_pallas import (
            _wave_kernel, pltpu, pl, partial as _p)
        print("C: (no _build_kernel helper; timing full fn only)",
              flush=True)
    else:
        args = (jnp.asarray(dr0), jnp.asarray(shtop.astype(np.int32)),
                meta, resl, resc,
                jnp.asarray(_SEL4_T[0]), jnp.asarray(_SEL4_T[1]),
                jnp.asarray(_SEL4_T[2]), jnp.asarray(_SEL8_T[0]),
                jnp.asarray(_SEL8_T[1]), jnp.asarray(_SEL8_T[2]))
        timeit("C wave kernel    ", jax.jit(lambda *a: kernel(*a)), *args)

    timeit("FULL recon       ", fn_full, batch_arrays, ls4j, ls8j,
           offs[0], offs[1])


if __name__ == "__main__":
    main()
