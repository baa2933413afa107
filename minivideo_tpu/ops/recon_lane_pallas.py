"""Pallas TPU driver for the lane-major wavefront reconstruction.

ONE kernel runs the entire wave loop: grid = (n_waves, B) with the batch
dim innermost, so each grid step reconstructs one wave of one frame as
pure 2D lane-major slabs ([256, maxw] luma tile, [16, maxw] refs) — the
shapes Mosaic compiles to dense vector ops without unrolling (the first
kernel, ops/recon_pallas.py, carried [B, maxw, 16, 16] blocks whose
leading dims Mosaic unrolled ~1000x at 1080p; its compile never
finished).  This removes the cost that bounds the XLA drivers on TPU:
~50 kernel dispatches per wave x 254 waves at 1080p (~200 ms per batch
regardless of layout).

Boundary state lives in VMEM scratch, kept in **wave-lane coordinates**
with per-wave lane shifts instead of the XLA driver's dynamically-sliced
row/column-addressed buffers (Mosaic cannot dynamically slice the lane
axis).  For wave w, lane k holds MB (r, c) = (r0(w)-k, c0(w)+2k):

  * row state (left column + corners, per MB row): the row held by lane
    k shifts by dr0 = r0(w) - r0(w-1) in {0, 1} per wave, so the whole
    buffer rolls right by dr0 and persists otherwise (rows keep their
    last-written state until that row's next MB).
  * bottom rows (top / top-right references): MB (r-1, c) was computed
    exactly 2 waves ago and (r-1, c+1) exactly 1 wave ago, so two
    double-buffered slabs suffice; consuming them needs a left-roll of
    1 - (r0(w) - r0(w-2)) and 1 - dr0(w) lanes respectively (both in
    {0, 1}; zeros elsewhere are masked by the availability flags).

The per-wave math is `wave_compute_lane` from ops/recon_lane.py, shared
with the XLA driver and bit-exact vs the numpy oracle
(tests/test_recon_jax.py, tests/test_recon_pallas.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .recon import PackedFrames, build_residuals
from .recon_lane import (_SEL4_T, _SEL8_T, pack_lane, unskew_planes_lane,
                         wave_compute_lane)
from .recon_wave import skew_tables


def _roll_right(x):
    """Lane k <- k-1; lane 0 zero-filled."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= 1, pltpu.roll(x, 1, 1), 0)


def _roll_left(x, maxw):
    """Lane k <- k+1; last lane zero-filled.  (pltpu.roll requires a
    non-negative shift, so left-by-1 is circular right-by-maxw-1; the
    physical lane width is maxw here because x is a full-array value.)"""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < maxw - 1, pltpu.roll(x, maxw - 1, 1), 0)


def _wave_kernel(dr0s_ref, shtop_ref, meta_ref, resl_ref, resc_ref,
                 s4m_ref, s4r_ref, s4s_ref, s8m_ref, s8r_ref, s8s_ref,
                 outy_ref, outc_ref,
                 row_y, row_c, botA_y, botB_y, botA_c, botB_c, tile_scr,
                 *, maxw):
    """Grid (w, b): wave index x frame; dr0s/shtop scalar-prefetched.

    Blocks: meta [1, 1, 32, maxw] i32; resl [1, 1, 256, maxw];
    resc [1, 1, 128, maxw]; outy [1, 1, 256, maxw]; outc [1, 1, 128, maxw].
    Scratch (per frame b): row_y/row_c [B, 24, maxw] (rows 0-15 right
    column, 16(/17) corner(s); 18-23 pad to a sublane multiple for the
    dynamic b index); botA_*/botB_* [B, 16, maxw] (previous / previous-2
    wave bottom rows); tile_scr [256, maxw] (shared: re-zeroed per step).
    """
    w = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(w == 0)
    def _init():
        row_y[b] = jnp.zeros_like(row_y[b])
        row_c[b] = jnp.zeros_like(row_c[b])
        botA_y[b] = jnp.zeros_like(botA_y[b])
        botB_y[b] = jnp.zeros_like(botB_y[b])
        botA_c[b] = jnp.zeros_like(botA_c[b])
        botB_c[b] = jnp.zeros_like(botB_c[b])

    dr0 = dr0s_ref[w]
    shtop = shtop_ref[w]
    shtr = 1 - dr0

    # ---- state reads (wave-lane coords) -----------------------------------
    ry = row_y[b]
    ry = jnp.where(dr0 == 1, _roll_right(ry), ry)
    rc = row_c[b]
    rc = jnp.where(dr0 == 1, _roll_right(rc), rc)
    left_col = ry[:16]
    corner = ry[16:17]
    left_c = rc[:16]
    corner_cb = rc[16:17]
    corner_cr = rc[17:18]

    bB = botB_y[b]
    top_row = jnp.where(shtop == 1, _roll_left(bB, maxw), bB)
    bA = botA_y[b]
    tr_row = jnp.where(shtr == 1, _roll_left(bA, maxw), bA)
    bBc = botB_c[b]
    top_c = jnp.where(shtop == 1, _roll_left(bBc, maxw), bBc)

    meta = meta_ref[0, 0]                            # [32, maxw]
    kind = meta[0:1]
    parsed = meta[1:2]
    al = meta[2:3] > 0
    at = meta[3:4] > 0
    atl = meta[4:5] > 0
    atr = meta[5:6] > 0
    i16_mode = meta[6:7]
    cmode = meta[7:8]
    modes8 = meta[8:12]
    modes4 = meta[12:28]

    tile, ctile = wave_compute_lane(
        left_col, corner, top_row, tr_row, left_c, corner_cb, corner_cr,
        top_c, kind, al, at, atl, atr, parsed, modes4, modes8,
        i16_mode, cmode, resl_ref[0, 0], resc_ref[0, 0],
        sel4=(s4m_ref[...], s4r_ref[...], s4s_ref[...]),
        sel8=(s8m_ref[...], s8r_ref[...], s8s_ref[...]),
        tile_ref=tile_scr)

    outy_ref[0, 0] = tile
    outc_ref[0, 0] = ctile

    # ---- state updates ---------------------------------------------------
    upd = parsed > 0                                  # [1, maxw]
    right_col = jnp.concatenate(
        [tile[y * 16 + 15:y * 16 + 16] for y in range(16)], axis=0)
    new_row = jnp.concatenate(
        [right_col, top_row[15:16], jnp.zeros((7, maxw), jnp.int32)],
        axis=0)
    row_y[b] = jnp.where(upd, new_row, ry)

    cright = jnp.concatenate(
        [ctile[y * 8 + 7:y * 8 + 8] for y in range(16)], axis=0)
    new_rowc = jnp.concatenate(
        [cright, top_c[7:8], top_c[15:16],
         jnp.zeros((6, maxw), jnp.int32)], axis=0)
    row_c[b] = jnp.where(upd, new_rowc, rc)

    # double-buffer rotate: B <- A (still in wave w-1 coords), A <- new
    botB_y[b] = bA
    botA_y[b] = tile[240:256]
    botB_c[b] = botA_c[b]
    botA_c[b] = jnp.concatenate([ctile[56:64], ctile[120:128]], axis=0)


def wave_schedule(g):
    """Per-wave lane-shift schedules (dr0, shtop) from the skew tables."""
    n_waves = g["n_waves"]
    r0 = g["r0"].astype(np.int64)
    dr0 = np.diff(r0, prepend=r0[0]).astype(np.int32)
    r0m2 = np.concatenate([r0[:1], r0[:1], r0[:-2]])
    shtop = np.where(np.arange(n_waves) >= 2, 1 - (r0 - r0m2), 0)
    shtop = shtop.astype(np.int32)
    assert set(np.unique(dr0)) <= {0, 1}
    assert set(np.unique(shtop)) <= {0, 1}
    return dr0, shtop


def _build_kernel(wmb: int, hmb: int, batch: int, interpret: bool = False):
    """The bare pallas_call for the wave loop (for timing/inspection)."""
    g = skew_tables(wmb, hmb)
    n_waves, maxw = g["n_waves"], g["maxw"]
    B = batch

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_waves, B),
        in_specs=[
            pl.BlockSpec((1, 1, 32, maxw), lambda w, b, *_: (w, b, 0, 0)),
            pl.BlockSpec((1, 1, 256, maxw), lambda w, b, *_: (w, b, 0, 0)),
            pl.BlockSpec((1, 1, 128, maxw), lambda w, b, *_: (w, b, 0, 0)),
            pl.BlockSpec((144, 13), lambda w, b, *_: (0, 0)),
            pl.BlockSpec((144,), lambda w, b, *_: (0,)),
            pl.BlockSpec((144,), lambda w, b, *_: (0,)),
            pl.BlockSpec((576, 25), lambda w, b, *_: (0, 0)),
            pl.BlockSpec((576,), lambda w, b, *_: (0,)),
            pl.BlockSpec((576,), lambda w, b, *_: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 256, maxw), lambda w, b, *_: (w, b, 0, 0)),
            pl.BlockSpec((1, 1, 128, maxw), lambda w, b, *_: (w, b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, 24, maxw), jnp.int32),
            pltpu.VMEM((B, 24, maxw), jnp.int32),
            pltpu.VMEM((B, 16, maxw), jnp.int32),
            pltpu.VMEM((B, 16, maxw), jnp.int32),
            pltpu.VMEM((B, 16, maxw), jnp.int32),
            pltpu.VMEM((B, 16, maxw), jnp.int32),
            pltpu.VMEM((256, maxw), jnp.int32),
        ],
    )

    return pl.pallas_call(
        partial(_wave_kernel, maxw=maxw),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_waves, B, 256, maxw), jnp.int32),
            jax.ShapeDtypeStruct((n_waves, B, 128, maxw), jnp.int32),
        ],
        interpret=interpret,
    )


def make_reconstruct_lane_pallas(wmb: int, hmb: int, batch: int,
                                 interpret: bool = False):
    """Build a jitted reconstructor (fixed geometry AND batch size)."""
    g = skew_tables(wmb, hmb)
    g["wmb"], g["hmb"] = wmb, hmb
    dr0, shtop = wave_schedule(g)
    kernel = _build_kernel(wmb, hmb, batch, interpret)

    dr0j = jnp.asarray(dr0)
    shtopj = jnp.asarray(shtop)

    def recon(arrays, ls4, ls8, cb_off, cr_off):
        res = build_residuals(arrays, ls4, ls8, cb_off, cr_off)
        sk = pack_lane(arrays, res, g)
        meta = sk["meta"].transpose(1, 0, 2, 3)        # wave-major
        resl = sk["res_luma"].transpose(1, 0, 2, 3)
        resc = sk["res_chroma"].transpose(1, 0, 2, 3)
        out_y, out_c = kernel(
            dr0j, shtopj, meta, resl, resc,
            jnp.asarray(_SEL4_T[0]), jnp.asarray(_SEL4_T[1]),
            jnp.asarray(_SEL4_T[2]), jnp.asarray(_SEL8_T[0]),
            jnp.asarray(_SEL8_T[1]), jnp.asarray(_SEL8_T[2]))
        out_y = out_y.astype(jnp.uint8).transpose(1, 0, 2, 3)
        out_c = out_c.astype(jnp.uint8).transpose(1, 0, 2, 3)
        return unskew_planes_lane(out_y, out_c, g)

    return jax.jit(recon)


_CACHE = {}


def reconstruct_frames_lane_pallas(packed: PackedFrames, interpret=False):
    key = (packed.wmb, packed.hmb, packed.batch, interpret)
    if key not in _CACHE:
        _CACHE[key] = make_reconstruct_lane_pallas(
            packed.wmb, packed.hmb, packed.batch, interpret)
    fn = _CACHE[key]
    arrays = {k: jnp.asarray(v) for k, v in packed.arrays.items()}
    cb_off, cr_off = packed.chroma_qp_off
    return fn(arrays, jnp.asarray(packed.ls4), jnp.asarray(packed.ls8),
              cb_off, cr_off)
