"""Batch-fused single-kernel Pallas wavefront reconstruction.

Evolution of ops/recon_lane_pallas.py: the batch dimension is merged
into the LANE axis (L = B * maxw) so ONE grid step reconstructs one wave
of EVERY frame.  At 1080p batch 16 this cuts the sequential grid from
254 x 16 = 4064 steps to 254, amortising the per-step fixed cost 16x and
filling the VPU lanes (61 lanes -> 976).

Frame boundaries inside the merged lane axis only matter for the
boundary-state rolls: lane k's state shifts to lane k+1 within a frame's
maxw-lane segment, so the roll masks use (lane % maxw) instead of the
global lane index; everything else in the per-wave math is lane-local
(ops/recon_lane.wave_compute_lane, shared with the per-frame drivers and
bit-exact vs the numpy oracle — tests/test_recon_fused.py).

Reference scope: intra prediction + reconstruction per
h264_intra_prediction.c / h264_transform.c (see ops/recon.py docstrings
for file:line citations).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .recon import PackedFrames, build_residuals
from .recon_lane import _SEL4_T, _SEL8_T, wave_compute_lane
from .recon_wave import pack_skewed, skew_tables, unskew_planes
from .recon_lane_pallas import wave_schedule


def _seg_masks(maxw, batch):
    """[1, B*maxw] int32 masks marking lanes whose roll source is inside
    the same frame segment.  Precomputed host-side: an in-kernel
    `iota % maxw` would need integer division, which Mosaic lowers
    catastrophically (non-power-of-2 modulo)."""
    lane = np.arange(batch * maxw) % maxw
    right = (lane >= 1).astype(np.int32)[None]          # src = lane-1
    left = (lane <= maxw - 2).astype(np.int32)[None]    # src = lane+1
    return right, left


def _roll_right_seg(x, mask):
    """Lane k <- k-1 within each maxw-lane frame segment; segment lane 0
    zero-filled.  mask [1, L] broadcasts over sublanes."""
    return jnp.where(mask > 0, pltpu.roll(x, 1, 1), 0)


def _roll_left_seg(x, mask, L):
    """Lane k <- k+1 within each segment; last segment lane zero-filled.
    (pltpu.roll needs a non-negative shift: left-by-1 == right-by-L-1.)"""
    return jnp.where(mask > 0, pltpu.roll(x, L - 1, 1), 0)


def _wave_kernel(dr0s_ref, shtop_ref, mr_ref, ml_ref,
                 meta_ref, resl_ref, resc_ref,
                 s4m_ref, s4r_ref, s4s_ref, s8m_ref, s8r_ref, s8s_ref,
                 outy_ref, outc_ref,
                 row_y, row_c, botA_y, botB_y, botA_c, botB_c, tile_scr,
                 *, maxw, L):
    """Grid (w,): one wave of all B frames; dr0s/shtop scalar-prefetched.

    Blocks: meta [1, 32, L] i32; resl [1, 256, L]; resc [1, 128, L];
    outy [1, 256, L]; outc [1, 128, L].  Scratch: row_y/row_c [24, L]
    (rows 0-15 right column, 16(/17) corner(s), rest pad), botA_*/botB_*
    [16, L] (previous / previous-2 wave bottom rows), tile_scr [256, L].
    """
    w = pl.program_id(0)

    @pl.when(w == 0)
    def _init():
        row_y[...] = jnp.zeros_like(row_y)
        row_c[...] = jnp.zeros_like(row_c)
        botA_y[...] = jnp.zeros_like(botA_y)
        botB_y[...] = jnp.zeros_like(botB_y)
        botA_c[...] = jnp.zeros_like(botA_c)
        botB_c[...] = jnp.zeros_like(botB_c)

    dr0 = dr0s_ref[w]
    shtop = shtop_ref[w]
    shtr = 1 - dr0

    mr = mr_ref[...]
    ml = ml_ref[...]

    # ---- state reads (wave-lane coords, per-frame segments) ---------------
    ry = row_y[...]
    ry = jnp.where(dr0 == 1, _roll_right_seg(ry, mr), ry)
    rc = row_c[...]
    rc = jnp.where(dr0 == 1, _roll_right_seg(rc, mr), rc)
    left_col = ry[:16]
    corner = ry[16:17]
    left_c = rc[:16]
    corner_cb = rc[16:17]
    corner_cr = rc[17:18]

    bB = botB_y[...]
    top_row = jnp.where(shtop == 1, _roll_left_seg(bB, ml, L), bB)
    bA = botA_y[...]
    tr_row = jnp.where(shtr == 1, _roll_left_seg(bA, ml, L), bA)
    bBc = botB_c[...]
    top_c = jnp.where(shtop == 1, _roll_left_seg(bBc, ml, L), bBc)

    meta = meta_ref[0]                               # [32, L]
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
        i16_mode, cmode, resl_ref[0], resc_ref[0],
        sel4=(s4m_ref[...], s4r_ref[...], s4s_ref[...]),
        sel8=(s8m_ref[...], s8r_ref[...], s8s_ref[...]),
        tile_ref=tile_scr)

    # uint8 output stores: values are already clipped to [0, 255] and
    # halving the written bytes also halves the unskew pass's reads
    outy_ref[0] = tile.astype(jnp.uint8)
    outc_ref[0] = ctile.astype(jnp.uint8)

    # ---- state updates ----------------------------------------------------
    upd = parsed > 0                                  # [1, L]
    right_col = jnp.concatenate(
        [tile[y * 16 + 15:y * 16 + 16] for y in range(16)], axis=0)
    new_row = jnp.concatenate(
        [right_col, top_row[15:16], jnp.zeros((7, L), jnp.int32)],
        axis=0)
    row_y[...] = jnp.where(upd, new_row, ry)

    cright = jnp.concatenate(
        [ctile[y * 8 + 7:y * 8 + 8] for y in range(16)], axis=0)
    new_rowc = jnp.concatenate(
        [cright, top_c[7:8], top_c[15:16],
         jnp.zeros((6, L), jnp.int32)], axis=0)
    row_c[...] = jnp.where(upd, new_rowc, rc)

    # double-buffer rotate: B <- A (still in wave w-1 coords), A <- new
    botB_y[...] = bA
    botA_y[...] = tile[240:256]
    botB_c[...] = botA_c[...]
    botA_c[...] = jnp.concatenate([ctile[56:64], ctile[120:128]], axis=0)


def _build_kernel(wmb: int, hmb: int, batch: int, interpret: bool = False):
    g = skew_tables(wmb, hmb)
    n_waves, maxw = g["n_waves"], g["maxw"]
    L = batch * maxw

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_waves,),
        in_specs=[
            pl.BlockSpec((1, L), lambda w, *_: (0, 0)),
            pl.BlockSpec((1, L), lambda w, *_: (0, 0)),
            pl.BlockSpec((1, 32, L), lambda w, *_: (w, 0, 0)),
            pl.BlockSpec((1, 256, L), lambda w, *_: (w, 0, 0)),
            pl.BlockSpec((1, 128, L), lambda w, *_: (w, 0, 0)),
            pl.BlockSpec((144, 13), lambda w, *_: (0, 0)),
            pl.BlockSpec((144,), lambda w, *_: (0,)),
            pl.BlockSpec((144,), lambda w, *_: (0,)),
            pl.BlockSpec((576, 25), lambda w, *_: (0, 0)),
            pl.BlockSpec((576,), lambda w, *_: (0,)),
            pl.BlockSpec((576,), lambda w, *_: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, 256, L), lambda w, *_: (w, 0, 0)),
            pl.BlockSpec((1, 128, L), lambda w, *_: (w, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((24, L), jnp.int32),
            pltpu.VMEM((24, L), jnp.int32),
            pltpu.VMEM((16, L), jnp.int32),
            pltpu.VMEM((16, L), jnp.int32),
            pltpu.VMEM((16, L), jnp.int32),
            pltpu.VMEM((16, L), jnp.int32),
            pltpu.VMEM((256, L), jnp.int32),
        ],
    )

    return pl.pallas_call(
        partial(_wave_kernel, maxw=maxw, L=L),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_waves, 256, L), jnp.uint8),
            jax.ShapeDtypeStruct((n_waves, 128, L), jnp.uint8),
        ],
        interpret=interpret,
    )


def build_slabs(arrays, ls4, ls8, cb_off, cr_off, g, batch):
    """Residual build + skew pack in ONE lane-major pass.

    Replaces build_residuals + pack_skewed + the wave-major transposes:
    those materialized a dozen intermediates in [..., 4, 4] / [..., 16,
    16] layouts whose tiny minor dims tile catastrophically on TPU
    (measured ~5x bandwidth tax).  Here every tensor keeps a large
    minor dimension: coefficients go comp-first ([4, 4, N] with N = all
    blocks on lanes) for dequant+IDCT, are assembled into pixel rows
    [256, B, n] by one multi-dim transpose, and skewed into the kernel's
    wave-major slabs [W, S, B*maxw] by one gather.  Bit-identical to the
    old path (tests/test_recon_fused.py::test_build_slabs_equals_old).
    """
    from .transform import (dequant_4x4_t, dequant_8x8_t, idct_4x4_t,
                            idct_8x8_t, luma_dc_transform,
                            chroma_dc_transform)
    from .recon import _QPC_TAB
    from ..models.h264.syntax import (KIND_I4x4, KIND_I8x8, KIND_I16x16,
                                      KIND_IPCM)

    wmb, hmb = g["wmb"], g["hmb"]
    n = wmb * hmb
    B = batch
    n_waves, maxw = g["skew_idx"].shape
    L = B * maxw
    kind = arrays["mb_kind"]                       # [B, n]
    qp = arrays["qpy"]
    ls4 = jnp.asarray(ls4)
    ls8 = jnp.asarray(ls8)

    # ---- luma 4x4 blocks (i4 + i16), comp-first ---------------------------
    lac = arrays["luma_ac"].astype(jnp.int32)
    c4t = lac.reshape(B * n * 16, 16).T.reshape(4, 4, B * n * 16)
    qp16 = jnp.broadcast_to(qp[..., None], (B, n, 16)).reshape(-1)
    d4t = dequant_4x4_t(c4t, qp16, ls4[0])
    # Intra16x16 DC: hadamard'd DC replaces each block's [0, 0]
    dc = luma_dc_transform(arrays["luma_dc"], qp, ls4[0])      # [B, n, 4, 4]
    # decode-order blocks: (y8, x8, y4, x4); dc grid is (2y8+y4, 2x8+x4)
    dc_blk = dc.reshape(B, n, 2, 2, 2, 2).transpose(
        0, 1, 2, 4, 3, 5).reshape(-1)                          # [B*n*16]
    is16_blk = jnp.broadcast_to(
        (kind == KIND_I16x16)[..., None], (B, n, 16)).reshape(-1)
    d4t = d4t.at[0, 0].set(jnp.where(is16_blk, dc_blk, d4t[0, 0]))
    r4t = idct_4x4_t(d4t)                                      # [4, 4, N]

    # ---- luma 8x8 blocks ----------------------------------------------------
    l8 = arrays["luma8x8_coeff"].astype(jnp.int32)
    c8t = l8.reshape(B * n * 4, 64).T.reshape(8, 8, B * n * 4)
    qp4 = jnp.broadcast_to(qp[..., None], (B, n, 4)).reshape(-1)
    r8t = idct_8x8_t(dequant_8x8_t(c8t, qp4, ls8))             # [8, 8, N8]

    # ---- assemble luma pixel rows T [256, B, n] ----------------------------
    # rows = (y8, y4, py), cols = (x8, x4, px)  (recon.py _assemble_16x16)
    t4 = r4t.reshape(4, 4, B, n, 2, 2, 2, 2).transpose(
        4, 6, 0, 5, 7, 1, 2, 3).reshape(256, B, n)
    # 8x8 blocks raster (r, c): rows (r, py), cols (c, px)
    t8 = r8t.reshape(8, 8, B, n, 2, 2).transpose(
        4, 0, 5, 1, 2, 3).reshape(256, B, n)
    pcm_t = lac.reshape(B, n, 256).transpose(2, 0, 1)
    is8 = (kind == KIND_I8x8)[None]
    ispcm = (kind == KIND_IPCM)[None]
    T = jnp.where(is8, t8, t4)
    T = jnp.where(ispcm, pcm_t, T)

    # ---- chroma -------------------------------------------------------------
    cac = arrays["chroma_ac"].astype(jnp.int32)               # [B,n,2,4,4,4]
    cct = cac.reshape(B * n * 8, 16).T.reshape(4, 4, B * n * 8)
    qpc = jnp.stack(
        [_QPC_TAB[jnp.clip(qp + cb_off, 0, 51)],
         _QPC_TAB[jnp.clip(qp + cr_off, 0, 51)]], axis=-1)    # [B, n, 2]
    qpc8 = jnp.broadcast_to(qpc[..., None], (B, n, 2, 4)).reshape(-1)
    # per-component LevelScale: ls4[1] (Cb) / ls4[2] (Cr) selected lane-wise
    m6 = qpc8 % 6
    ic_of = jnp.broadcast_to(
        jnp.arange(2)[None, None, :, None], (B, n, 2, 4)).reshape(-1)
    scale_cb = jnp.moveaxis(ls4[1], 0, -1)[:, :, m6]           # [4, 4, N]
    scale_cr = jnp.moveaxis(ls4[2], 0, -1)[:, :, m6]
    scale = jnp.where(ic_of == 0, scale_cb, scale_cr)
    div = qpc8 // 6
    rnd = jnp.where(div < 4, 1 << jnp.maximum(3 - div, 0), 0)
    hi = (cct * scale) << jnp.maximum(div - 4, 0)
    lo = (cct * scale + rnd) >> jnp.maximum(4 - div, 0)
    dcht = jnp.where(qpc8 >= 24, hi, lo)
    # chroma DC per component (2x2 hadamard), block order = 2x2 raster
    dcc = jnp.stack(
        [chroma_dc_transform(arrays["chroma_dc"][:, :, ic],
                             qpc[..., ic], ls4[1 + ic])
         for ic in range(2)], axis=2)                          # [B,n,2,2,2]
    dcc_blk = dcc.reshape(-1)                                  # (b,m,ic,blk)
    dcht = dcht.at[0, 0].set(dcc_blk)
    rc4 = idct_4x4_t(dcht)                                     # [4,4,B*n*8]
    # chroma rows: sublane = ic*64 + 8*y + x; blocks raster (br, bc)
    tc = rc4.reshape(4, 4, B, n, 2, 2, 2).transpose(
        4, 5, 0, 6, 1, 2, 3).reshape(128, B, n)
    pcm_ct = cac.reshape(B, n, 128).transpose(2, 0, 1)
    Tc = jnp.where(ispcm, pcm_ct, tc)

    # ---- availability flags + meta [32, B, n] ------------------------------
    parsed = arrays["parsed"] > 0
    sid = arrays["slice_id"]
    mm = jnp.arange(n)
    r = mm // wmb
    c = mm % wmb

    def ok(dm, cond):
        mmc = jnp.clip(mm + dm, 0, n - 1)
        return (cond[None] & parsed[:, mmc]
                & (sid[:, mmc] == sid)).astype(jnp.int32)

    al = ok(-1, c > 0)
    at = ok(-wmb, r > 0)
    atl = ok(-wmb - 1, (c > 0) & (r > 0))
    atr = ok(-wmb + 1, (c < wmb - 1) & (r > 0))
    meta = jnp.concatenate([
        kind[None], parsed.astype(jnp.int32)[None],
        al[None], at[None], atl[None], atr[None],
        arrays["i16_mode"][None], arrays["chroma_mode"][None],
        arrays["luma8x8_modes"].transpose(2, 0, 1),
        arrays["luma4x4_modes"].transpose(2, 0, 1),
        jnp.zeros((4, B, n), jnp.int32),
    ], axis=0)                                                 # [32, B, n]

    # ---- skew everything to wave-major lane-major slabs --------------------
    flat = jnp.asarray(g["skew_idx"].reshape(-1))
    valid = jnp.asarray(g["skew_valid"].reshape(-1).astype(np.int32))

    def skew(x, S):
        xs = x[:, :, flat]                                     # [S, B, W*maxw]
        return xs.reshape(S, B, n_waves, maxw).transpose(
            2, 0, 1, 3).reshape(n_waves, S, L)

    meta_s = skew(meta, 32)
    # parsed row also gates padded skew lanes (pack_skewed meta[..., 1])
    vmask = jnp.broadcast_to(
        valid.reshape(n_waves, 1, maxw),
        (n_waves, B, maxw)).reshape(n_waves, 1, L)
    meta_s = meta_s.at[:, 1:2].set(meta_s[:, 1:2] * vmask)
    resl = skew(T, 256)
    resc = skew(Tc, 128)
    return meta_s, resl, resc


def pack_fused(arrays, res, g, batch):
    """pack_skewed output -> wave-major slabs with lanes = B * maxw."""
    n_waves, maxw = g["skew_idx"].shape
    B = batch
    sk0 = pack_skewed(arrays, res, g)
    # [B, W, maxw, S] -> [W, S, B*maxw]
    meta = sk0["meta"].transpose(1, 3, 0, 2).reshape(n_waves, 32, B * maxw)
    resl = sk0["res_luma"].reshape(B, n_waves, maxw, 256).transpose(
        1, 3, 0, 2).reshape(n_waves, 256, B * maxw)
    resc = sk0["res_chroma"].reshape(B, n_waves, maxw, 128).transpose(
        1, 3, 0, 2).reshape(n_waves, 128, B * maxw)
    return meta, resl, resc


def unskew_fused(out_y, out_c, g, batch):
    """[W, 256|128, B*maxw] -> (Y, Cb, Cr) raster planes [B, H, W]."""
    n_waves, maxw = g["skew_idx"].shape
    B = batch
    oy = out_y.reshape(n_waves, 256, B, maxw).transpose(2, 0, 3, 1)
    oc = out_c.reshape(n_waves, 128, B, maxw).transpose(2, 0, 3, 1)
    return unskew_planes(oy.reshape(B, n_waves, maxw, 16, 16),
                         oc.reshape(B, n_waves, maxw, 16, 8), g)


def make_reconstruct_fused(wmb: int, hmb: int, batch: int,
                           interpret: bool = False):
    """Build a jitted reconstructor (fixed geometry AND batch size)."""
    g = skew_tables(wmb, hmb)
    g["wmb"], g["hmb"] = wmb, hmb
    dr0, shtop = wave_schedule(g)
    kernel = _build_kernel(wmb, hmb, batch, interpret)
    dr0j = jnp.asarray(dr0)
    shtopj = jnp.asarray(shtop)
    mr_np, ml_np = _seg_masks(g["maxw"], batch)
    mrj, mlj = jnp.asarray(mr_np), jnp.asarray(ml_np)

    def recon(arrays, ls4, ls8, cb_off, cr_off):
        meta, resl, resc = build_slabs(arrays, ls4, ls8, cb_off, cr_off,
                                       g, batch)
        out_y, out_c = kernel(
            dr0j, shtopj, mrj, mlj, meta, resl, resc,
            jnp.asarray(_SEL4_T[0]), jnp.asarray(_SEL4_T[1]),
            jnp.asarray(_SEL4_T[2]), jnp.asarray(_SEL8_T[0]),
            jnp.asarray(_SEL8_T[1]), jnp.asarray(_SEL8_T[2]))
        return unskew_fused(out_y, out_c, g, batch)

    return jax.jit(recon)


_CACHE = {}


def reconstruct_frames_fused(packed: PackedFrames, interpret=False):
    key = (packed.wmb, packed.hmb, packed.batch, interpret)
    if key not in _CACHE:
        _CACHE[key] = make_reconstruct_fused(
            packed.wmb, packed.hmb, packed.batch, interpret)
    fn = _CACHE[key]
    arrays = {k: jnp.asarray(v) for k, v in packed.arrays.items()}
    cb_off, cr_off = packed.chroma_qp_off
    return fn(arrays, jnp.asarray(packed.ls4), jnp.asarray(packed.ls8),
              cb_off, cr_off)
