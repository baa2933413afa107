"""Pallas TPU kernel for the skewed-wavefront reconstruction.

One kernel runs the ENTIRE wave loop: grid = (n_waves,), with the
macroblock boundary state (right columns / bottom rows / corners) living
in VMEM scratch that persists across grid steps.  Per wave, Pallas streams
in that wave's skewed meta/residual blocks (contiguous by construction)
and streams out the reconstructed MB tiles; the per-wave math is
`wave_compute` from ops/recon_wave.py, shared with the XLA driver.

This removes the two costs that killed the XLA drivers on TPU: per-wave
dispatch/fusion overhead (the whole loop is one Mosaic program) and XLA's
serialised scatters.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .recon import PackedFrames, build_residuals
from .recon_wave import (_ROWSEL4, _ROWSEL8, _SEL4, _SEL8, RefTile,
                         pack_skewed, skew_tables, unpack_meta,
                         unskew_planes, wave_compute)


def _wave_kernel(rr0s_ref, c0s_ref, meta_ref, resl_ref, resc_ref,
                 s4m_ref, s4r_ref, s4s_ref, s8m_ref, s8r_ref, s8s_ref,
                 rs4_ref, rs8_ref,
                 outy_ref, outc_ref,
                 row_y, row_c, bot_y, bot_c, tile_scr, maxw=None):
    """Grid dim 0 = wave index; rr0s/c0s are scalar-prefetched.

    Blocks: meta [1, B, maxw, 32] i32; resl [1, B, maxw, 16, 16];
    resc [1, B, maxw, 16, 8]; outy [1, B, maxw, 16, 16];
    outc [1, B, maxw, 16, 8].
    Scratch: row_y/row_c [B, ROWP, 18] (row state, reversed row order);
    bot_y/bot_c [B, 2, BOTP, 16]; tile_scr [B, maxw, 16, 16].
    """
    w = pl.program_id(0)
    B = meta_ref.shape[1]

    rr0 = rr0s_ref[w]       # = hmb - 1 - r0 (row state stored reversed)
    c0 = c0s_ref[w]
    pc = c0 & 1
    half = c0 >> 1
    halfr = (c0 + 1) >> 1
    pr = 1 - pc

    @pl.when(w == 0)
    def _init():
        row_y[...] = jnp.zeros_like(row_y)
        row_c[...] = jnp.zeros_like(row_c)
        bot_y[...] = jnp.zeros_like(bot_y)
        bot_c[...] = jnp.zeros_like(bot_c)

    # ---- slab reads ------------------------------------------------------
    rs_y = row_y[:, pl.ds(rr0, maxw), :]
    rs_c = row_c[:, pl.ds(rr0, maxw), :]
    left_col = rs_y[..., :16]
    corner = rs_y[..., 16]
    left_c = rs_c[..., :16]
    corner_cb = rs_c[..., 16]
    corner_cr = rs_c[..., 17]

    def bot_slab(buf, par, start):
        both = buf[:, :, pl.ds(start, maxw), :]
        return jnp.where((par == 0), both[:, 0], both[:, 1])

    top_row = bot_slab(bot_y, pc, half)
    tr_row = bot_slab(bot_y, pr, halfr)
    top_c = bot_slab(bot_c, pc, half)

    meta = unpack_meta(meta_ref[0])
    res_luma = resl_ref[0]
    res_chroma = resc_ref[0]
    sel4 = (s4m_ref[...], s4r_ref[...], s4s_ref[...])
    sel8 = (s8m_ref[...], s8r_ref[...], s8s_ref[...])

    tile, ctile = wave_compute(
        left_col, corner, top_row, tr_row, left_c, corner_cb, corner_cr,
        top_c, meta["kind"], meta["al"], meta["at"], meta["atl"],
        meta["atr"], meta["parsed"], meta["modes4"], meta["modes8"],
        meta["i16_mode"], meta["cmode"], res_luma, res_chroma,
        sel4=sel4, sel8=sel8, tile_box=RefTile(tile_scr),
        rowsel4=rs4_ref[...], rowsel8=rs8_ref[...])

    outy_ref[0] = tile
    outc_ref[0] = ctile

    # ---- state updates ---------------------------------------------------
    upd = (meta["parsed"] > 0)[..., None]
    new_row = jnp.concatenate(
        [tile[..., :, 15], top_row[..., 15:16],
         jnp.zeros((B, maxw, 1), jnp.int32)], axis=-1)
    row_y[:, pl.ds(rr0, maxw), :] = jnp.where(upd, new_row, rs_y)

    new_rowc = jnp.concatenate(
        [ctile[..., :, 7], top_c[..., 7:8], top_c[..., 15:16]], axis=-1)
    row_c[:, pl.ds(rr0, maxw), :] = jnp.where(upd, new_rowc, rs_c)

    def bot_upd(buf, newv, par, start):
        both = buf[:, :, pl.ds(start, maxw), :]
        old = jnp.where((par == 0), both[:, 0], both[:, 1])
        merged = jnp.where(upd, newv, old)
        sel0 = (par == 0)
        new0 = jnp.where(sel0, merged, both[:, 0])
        new1 = jnp.where(sel0, both[:, 1], merged)
        buf[:, :, pl.ds(start, maxw), :] = jnp.concatenate(
            [new0[:, None], new1[:, None]], axis=1)

    bot_upd(bot_y, tile[..., 15, :], pc, half)
    botc_new = jnp.concatenate([ctile[..., 7, :], ctile[..., 15, :]],
                               axis=-1)
    bot_upd(bot_c, botc_new, pc, half)


def make_reconstruct_pallas(wmb: int, hmb: int, batch: int,
                            interpret: bool = False):
    """Build a jitted reconstructor (fixed geometry AND batch size)."""
    g = skew_tables(wmb, hmb)
    g["wmb"], g["hmb"] = wmb, hmb
    n_waves, maxw = g["n_waves"], g["maxw"]
    cw2 = (wmb + 1) // 2
    ROWP = hmb + maxw
    BOTP = cw2 + maxw + 1
    B = batch

    rr0s = jnp.asarray((hmb - 1 - g["r0"]).astype(np.int32))
    c0s = jnp.asarray(g["c0"])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_waves,),
        in_specs=[
            pl.BlockSpec((1, B, maxw, 32), lambda w, *_: (w, 0, 0, 0)),
            pl.BlockSpec((1, B, maxw, 16, 16),
                         lambda w, *_: (w, 0, 0, 0, 0)),
            pl.BlockSpec((1, B, maxw, 16, 8),
                         lambda w, *_: (w, 0, 0, 0, 0)),
            pl.BlockSpec((13, 144), lambda w, *_: (0, 0)),
            pl.BlockSpec((144,), lambda w, *_: (0,)),
            pl.BlockSpec((144,), lambda w, *_: (0,)),
            pl.BlockSpec((25, 576), lambda w, *_: (0, 0)),
            pl.BlockSpec((576,), lambda w, *_: (0,)),
            pl.BlockSpec((576,), lambda w, *_: (0,)),
            pl.BlockSpec((4, 16, 4), lambda w, *_: (0, 0, 0)),
            pl.BlockSpec((8, 64, 8), lambda w, *_: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, B, maxw, 16, 16),
                         lambda w, *_: (w, 0, 0, 0, 0)),
            pl.BlockSpec((1, B, maxw, 16, 8),
                         lambda w, *_: (w, 0, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, ROWP, 18), jnp.int32),
            pltpu.VMEM((B, ROWP, 18), jnp.int32),
            pltpu.VMEM((B, 2, BOTP, 16), jnp.int32),
            pltpu.VMEM((B, 2, BOTP, 16), jnp.int32),
            pltpu.VMEM((B, maxw, 16, 16), jnp.int32),
        ],
    )

    kernel = pl.pallas_call(
        partial(_wave_kernel, maxw=maxw),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_waves, B, maxw, 16, 16), jnp.int32),
            jax.ShapeDtypeStruct((n_waves, B, maxw, 16, 8), jnp.int32),
        ],
        interpret=interpret,
    )

    def recon(arrays, ls4, ls8, cb_off, cr_off):
        res = build_residuals(arrays, ls4, ls8, cb_off, cr_off)
        sk = pack_skewed(arrays, res, g)
        meta = sk["meta"].transpose(1, 0, 2, 3)        # wave-major
        resl = sk["res_luma"].transpose(1, 0, 2, 3, 4)
        resc = sk["res_chroma"].transpose(1, 0, 2, 3, 4)
        out_y, out_c = kernel(
            rr0s, c0s, meta, resl, resc,
            jnp.asarray(_SEL4[0]), jnp.asarray(_SEL4[1]),
            jnp.asarray(_SEL4[2]), jnp.asarray(_SEL8[0]),
            jnp.asarray(_SEL8[1]), jnp.asarray(_SEL8[2]),
            jnp.asarray(_ROWSEL4), jnp.asarray(_ROWSEL8))
        out_y = out_y.astype(jnp.uint8).transpose(1, 0, 2, 3, 4)
        out_c = out_c.astype(jnp.uint8).transpose(1, 0, 2, 3, 4)
        return unskew_planes(out_y, out_c, g)

    return jax.jit(recon)


_CACHE = {}


def reconstruct_frames_pallas(packed: PackedFrames, interpret=False):
    key = (packed.wmb, packed.hmb, packed.batch, interpret)
    if key not in _CACHE:
        _CACHE[key] = make_reconstruct_pallas(
            packed.wmb, packed.hmb, packed.batch, interpret)
    fn = _CACHE[key]
    arrays = {k: jnp.asarray(v) for k, v in packed.arrays.items()}
    cb_off, cr_off = packed.chroma_qp_off
    return fn(arrays, jnp.asarray(packed.ls4), jnp.asarray(packed.ls8),
              cb_off, cr_off)
