#!/usr/bin/env python
"""Feasibility probe: batched CABAC bin decoding ON DEVICE (SURVEY §7
Phase B / VERDICT r2 item 5).

The plan under test: thousands of independent slices decode in lockstep,
one slice per lane, with vectorized engine state (codIRange, codIOffset,
ctx[460]) and the spec tables as constants.  This probe implements the
core arithmetic-decision loop that bounds any such design — per step,
every lane decodes one decision bin against its own context index:

  per-lane ctx-state gather  ->  rangeTabLPS gather  ->  branchless
  MPS/LPS select  ->  per-lane ctx-state scatter  ->  renormalization
  as 7 masked subiterations, each gathering one bitstream bit per lane

and measures sustained bins/s.  The FSM that would drive real slices
(per-lane syntax state machines as select trees) only adds work on top,
so this number is an upper bound on Phase-B throughput.

Correctness is asserted lane-by-lane against the spec-literal Python
engine (models/h264/cabac.py) before timing.

Usage: python tools/probe_device_entropy.py [B ...]   (default 1024 8192)
Writes a verdict line; PERF.md records the promote-or-kill decision.
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

T_STEPS = 512          # bins per lane per scan
NBYTES = 4096          # per-lane stream bytes


def make_streams(batch, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, (batch, NBYTES), dtype=np.uint8)
    bits = np.unpackbits(data, axis=1).astype(np.int32)   # [B, NBYTES*8]
    return data, bits


def make_ctx_seq(batch, seed=1):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 460, (T_STEPS, batch)).astype(np.int32)


def build_decoder(batch):
    import jax
    import jax.numpy as jnp
    from minivideo_tpu.models.h264.cabac_tables import (
        CONTEXT_INIT_I, RANGE_TAB_LPS, TRANS_IDX_LPS, TRANS_IDX_MPS)

    lps_flat = jnp.asarray(np.asarray(RANGE_TAB_LPS,
                                      np.int32).reshape(-1))   # [256]
    t_lps = jnp.asarray(np.asarray(TRANS_IDX_LPS, np.int32))
    t_mps = jnp.asarray(np.asarray(TRANS_IDX_MPS, np.int32))

    def init_state(qp=26):
        m = np.asarray(CONTEXT_INIT_I, np.int32)
        pre = np.clip(((m[:, 0] * qp) >> 4) + m[:, 1], 1, 126)
        state = np.where(pre <= 63, 63 - pre, pre - 64).astype(np.int32)
        mps = (pre > 63).astype(np.int32)
        return (np.broadcast_to(state, (batch, 460)).copy(),
                np.broadcast_to(mps, (batch, 460)).copy())

    def step(carry, ctx):
        state, mps, rng_, off, pos, bits = carry
        lane = jnp.arange(batch)
        st = state[lane, ctx]
        mp = mps[lane, ctx]
        q = (rng_ >> 6) & 3
        r_lps = lps_flat[st * 4 + q]
        r2 = rng_ - r_lps
        is_lps = off >= r2
        bin_val = jnp.where(is_lps, 1 - mp, mp)
        off = jnp.where(is_lps, off - r2, off)
        rng_ = jnp.where(is_lps, r_lps, r2)
        new_mps = jnp.where(is_lps & (st == 0), 1 - mp, mp)
        new_st = jnp.where(is_lps, t_lps[st], t_mps[st])
        state = state.at[lane, ctx].set(new_st)
        mps = mps.at[lane, ctx].set(new_mps)
        # renormalization: <=7 doublings, masked lockstep
        for _ in range(7):
            need = rng_ < 256
            bit = jnp.take_along_axis(bits, pos[:, None], axis=1)[:, 0]
            rng_ = jnp.where(need, rng_ << 1, rng_)
            off = jnp.where(need, (off << 1) | bit, off)
            pos = pos + need.astype(jnp.int32)
        return (state, mps, rng_, off, pos, bits), bin_val

    @jax.jit
    def decode(state, mps, rng_, off, pos, bits, ctx_seq):
        carry = (state, mps, rng_, off, pos, bits)
        carry, bins = jax.lax.scan(step, carry, ctx_seq)
        return bins, carry[4]

    return decode, init_state


def reference_bins(data, ctx_seq, lanes):
    """Spec-literal scalar decode for the checked lanes."""
    from minivideo_tpu.bitio import BitReader
    from minivideo_tpu.models.h264.cabac import CabacEngine
    out = np.zeros((T_STEPS, len(lanes)), np.int32)
    for j, b in enumerate(lanes):
        e = CabacEngine(BitReader(data[b].tobytes()), 26)
        for t in range(T_STEPS):
            out[t, j] = e.decode_decision(int(ctx_seq[t, b]))
    return out


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    batches = [int(a) for a in sys.argv[1:]] or [1024, 8192]
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # correctness on a small batch first
    B0 = 8
    data, bits = make_streams(B0)
    ctx_seq = make_ctx_seq(B0)
    decode, init_state = build_decoder(B0)
    state, mps = init_state()
    off0 = (bits[:, :9] * (1 << np.arange(8, -1, -1))).sum(1)
    bins, _ = decode(jnp.asarray(state), jnp.asarray(mps),
                     jnp.full(B0, 510, jnp.int32),
                     jnp.asarray(off0.astype(np.int32)),
                     jnp.full(B0, 9, jnp.int32),
                     jnp.asarray(bits), jnp.asarray(ctx_seq))
    want = reference_bins(data, ctx_seq, range(B0))
    np.testing.assert_array_equal(np.asarray(bins), want)
    print(f"correctness: {T_STEPS}x{B0} bins match the spec engine",
          flush=True)

    for B in batches:
        data, bits = make_streams(B)
        ctx_seq = make_ctx_seq(B)
        decode, init_state = build_decoder(B)
        state, mps = init_state()
        off0 = (bits[:, :9] * (1 << np.arange(8, -1, -1))).sum(1)
        args = (jnp.asarray(state), jnp.asarray(mps),
                jnp.full(B, 510, jnp.int32),
                jnp.asarray(off0.astype(np.int32)),
                jnp.full(B, 9, jnp.int32),
                jnp.asarray(bits), jnp.asarray(ctx_seq))
        t0 = time.time()
        bins, pos = decode(*args)
        np.asarray(pos[:1])
        print(f"B={B}: first call {time.time()-t0:.1f}s", flush=True)
        iters = 8
        t0 = time.time()
        for _ in range(iters):
            bins, pos = decode(*args)
        np.asarray(pos[:1])
        dt = time.time() - t0
        rate = B * T_STEPS * iters / dt
        print(f"B={B}: {rate/1e6:.1f} Mbins/s "
              f"({dt/iters*1e3:.1f} ms per {T_STEPS}-bin scan)", flush=True)
        print(f"  context: 1080p CABAC ~3.58M bins/frame -> "
              f"{rate/3.58e6:.1f} fps-equivalent if entropy-bound",
              flush=True)


if __name__ == "__main__":
    main()
