"""Slab-layout residual construction (dequant + IDCT + assembly) for the
fused wave kernel.

Round 2 measured the device wall of the fused engine at ~122 ms/batch-16
in `build_slabs` — residual construction in XLA with tiny-minor-dim
transposes and a skew *gather*, feeding a ~25 ms Pallas kernel
(PERF.md).  This module moves residual construction INTO the kernel:

  * the entropy parser emits each macroblock's coefficients as a flat
    int16 "slab" record in a butterfly-friendly coefficient order (see
    layout below), at a skew-ordered slot (slot = wave * maxw + lane),
    so host prep collapses to ONE dense transpose;
  * `residual_from_slabs` performs dequant + inverse transforms + pixel
    assembly on [S, L] lane-major slabs with static sublane slices (the
    butterflies) and 0/1 permutation matmuls on the MXU (the pixel
    assembly) — it runs inside the Pallas wave kernel, and doubles as a
    plain-XLA function for CPU tests.

Reference scope: minivideo/src/decoder/h264/h264_transform.c (dequant
:924-1294, idct :1145-1396, DC transforms :121-438) — re-architected as
lane-vectorized slab passes, not a translation.

Slab layouts (per macroblock; b/blk indices are raster within the MB):

  luma [256]:
    4x4 coeffs   s = 64*j + 16*i + b      b = 4*u + v over the 4x4 block
                                          grid (u = 2*y8 + y4)
    8x8 coeffs   s = 32*j +  4*i + blk    blk in [0,4) raster
    PCM pixels   s = 64*(Y%4) + 16*(X%4) + 4*(Y//4) + (X//4)
  chroma [128]:
    AC coeffs    s = 32*j + 8*i + 4*ic + blk
    PCM pixels   s = 32*(Y%4) + 8*(X%4) + 4*ic + 2*(Y//4) + (X//4)
  dc [32]:
    luma DC      s = 4*u + v              (I16x16 only)
    chroma DC    s = 16 + 4*ic + 2*u + v
    (rows 24..31 zero padding: int16 sublane tiles are 16-high)

(i, j) is the coefficient's (row, col) inside its block; fixing j gives a
contiguous sublane range, so the column (horizontal) butterfly pass of
each inverse transform is contiguous-slice arithmetic, and the row pass
becomes contiguous after one static regroup.  IDCT output lands at
s = 64*y + 16*x + b (4x4) / 32*y + 4*x + blk (8x8) / 32*y + 8*x + 4*ic
+ blk (chroma); the P4/P8/PC permutation matrices map those to the wave
kernel's pixel-row layout (sublane = 16*Y + X luma, 64*ic + 8*Y + X
chroma) in one exact f32 MXU matmul each (rows have a single 1.0, and
all values are < 2^24, so f32 is exact).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models.h264.syntax import (KIND_I4x4, KIND_I8x8, KIND_I16x16,
                                  KIND_IPCM)
from ..models.h264.tables import QPC_FROM_QPI
from .transform import _idct8_stage_t

# ---------------------------------------------------------------------------
# meta row layout ([META_ROWS, L] int32 per wave)

META_ROWS = 40
DC_ROWS = 32
R_KIND, R_PARSED, R_AL, R_AT, R_ATL, R_ATR, R_I16M, R_CMODE = range(8)
R_MODES8 = 8            # rows 8..11
R_MODES4 = 12           # rows 12..27
R_YM6, R_YDIV, R_CBM6, R_CBDIV, R_CRM6, R_CRDIV = range(28, 34)

# ---------------------------------------------------------------------------
# static layout tables


def _p4_np():
    P = np.zeros((256, 256), np.float32)
    for u in range(4):
        for v in range(4):
            for y in range(4):
                for x in range(4):
                    P[16 * (4 * u + y) + 4 * v + x,
                      64 * y + 16 * x + 4 * u + v] = 1.0
    return P


def _p8_np():
    P = np.zeros((256, 256), np.float32)
    for blk in range(4):
        for y in range(8):
            for x in range(8):
                P[16 * (8 * (blk // 2) + y) + 8 * (blk % 2) + x,
                  32 * y + 4 * x + blk] = 1.0
    return P


def _pc_np():
    P = np.zeros((128, 128), np.float32)
    for ic in range(2):
        for blk in range(4):
            for y in range(4):
                for x in range(4):
                    P[64 * ic + 8 * (4 * (blk // 2) + y)
                      + 4 * (blk % 2) + x,
                      32 * y + 8 * x + 4 * ic + blk] = 1.0
    return P


P4 = _p4_np()
P8 = _p8_np()
PC = _pc_np()

_H4 = np.array([[1, 1, 1, 1],
                [1, 1, -1, -1],
                [1, -1, -1, 1],
                [1, -1, 1, -1]], np.float32)
_H2 = np.array([[1, 1], [1, -1]], np.float32)
HH16 = np.kron(_H4, _H4)                       # [16, 16] luma DC hadamard
_HH4 = np.kron(_H2, _H2)
HH8C = np.zeros((8, 8), np.float32)            # block-diag per component
HH8C[:4, :4] = _HH4
HH8C[4:, 4:] = _HH4

# coefficient (row, col) per slab sublane, for the scale tables
_S = np.arange(256)
_I4S, _J4S = (_S // 16) % 4, _S // 64
_I8S, _J8S = (_S // 4) % 8, _S // 32
_SC = np.arange(128)
_ICS, _IC_I, _IC_J = (_SC // 4) % 2, (_SC // 8) % 4, _SC // 32

_QPC_TAB = jnp.asarray(QPC_FROM_QPI)


def scale_tables(ls4, ls8):
    """LevelScale tables in slab order: T4/T8 [256, 6], TCb/TCr [128, 6].

    ls4 [3, 6, 4, 4] (luma/Cb/Cr), ls8 [6, 8, 8] — from
    transform.level_scale_4x4_np / level_scale_8x8_np.
    """
    ls4 = jnp.asarray(ls4)
    ls8 = jnp.asarray(ls8)
    t4 = ls4[0][:, _I4S, _J4S].T.astype(jnp.int32)
    t8 = ls8[:, _I8S, _J8S].T.astype(jnp.int32)
    tcb = ls4[1][:, _IC_I, _IC_J].T.astype(jnp.int32)
    tcr = ls4[2][:, _IC_I, _IC_J].T.astype(jnp.int32)
    return t4, t8, tcb, tcr


# ---------------------------------------------------------------------------
# the in-kernel residual body (pure jnp: runs under Pallas or plain XLA)


def _mm(P, x):
    """Exact f32 matmul of a 0/1 matrix with int values < 2^24."""
    return jax.lax.dot_general(
        P, x.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)


def _sel_scale(T, m6, L):
    """T [S, 6] int32, m6 [1, L] -> per-lane scale [S, L]."""
    out = jnp.zeros((T.shape[0], L), jnp.int32)
    for m in range(6):
        out = jnp.where(m6 == m, T[:, m:m + 1], out)
    return out


def _idct4_slab(d, gw):
    """4x4 IDCT on a slab whose sublanes are s = 4*gw*j + gw*i + q with
    q in [0, gw): column butterflies on contiguous j-groups, one static
    regroup, row butterflies.  Returns rows s = 4*gw*y + gw*x + q.
    Spec 8.5.12.2; bit-exact vs transform.idct_4x4_t."""
    c = [d[4 * gw * j:4 * gw * (j + 1)] for j in range(4)]
    e0 = c[0] + c[2]
    e1 = c[0] - c[2]
    e2 = (c[1] >> 1) - c[3]
    e3 = c[1] + (c[3] >> 1)
    fx = (e0 + e3, e1 + e2, e1 - e2, e0 - e3)        # rows gw*i + q
    g = [jnp.concatenate([fx[x][gw * i:gw * (i + 1)] for x in range(4)],
                         axis=0) for i in range(4)]  # rows gw*x + q
    h0 = g[0] + g[2]
    h1 = g[0] - g[2]
    h2 = (g[1] >> 1) - g[3]
    h3 = g[1] + (g[3] >> 1)
    out = jnp.concatenate([h0 + h3, h1 + h2, h1 - h2, h0 - h3], axis=0)
    return (out + 32) >> 6


def residual_from_slabs(coefL, coefC, dcs, meta,
                        t4, t8, tcb, tcr, p4, p8, pc, hh16, hh8c,
                        has8x8=True, haspcm=True, ablate=()):
    """Dequant + IDCT + pixel assembly on one wave's slabs.

    coefL [256, L] / coefC [128, L] / dcs [24, L] int32 (slab layouts in
    the module docstring); meta [META_ROWS, L] int32; tables per
    scale_tables / module constants.  Returns (res_luma [256, L] sublane
    = 16*Y + X, res_chroma [128, L] sublane = 64*ic + 8*Y + X), int32 —
    bit-exact vs ops/recon.build_residuals (tests/test_slab.py).

    has8x8 / haspcm are STATIC specialization flags: when False the 8x8
    dequant+IDCT(+assembly matmul) and the PCM pass-through selects are
    compiled out entirely — sound when the stream's PPS has
    transform_8x8_mode off / the batch contains no I_PCM macroblocks
    (PackedFrames.features decides; tests/test_recon_fused.py pins the
    specialized kernels bit-exact vs the oracle).
    """
    L = coefL.shape[-1]
    if "res" in ablate:        # perf-triage only: zero residuals
        return (jnp.zeros((256, L), jnp.int32),
                jnp.zeros((128, L), jnp.int32))
    kind = meta[R_KIND:R_KIND + 1]
    is8 = kind == KIND_I8x8
    is16 = kind == KIND_I16x16
    ispcm = kind == KIND_IPCM
    ym6 = meta[R_YM6:R_YM6 + 1]
    ydiv = meta[R_YDIV:R_YDIV + 1]
    cbm6 = meta[R_CBM6:R_CBM6 + 1]
    cbdiv = meta[R_CBDIV:R_CBDIV + 1]
    crm6 = meta[R_CRM6:R_CRM6 + 1]
    crdiv = meta[R_CRDIV:R_CRDIV + 1]

    # ---- luma 4x4 interpretation (I4x4 + I16x16 AC) -----------------------
    sc4 = _sel_scale(t4, ym6, L)
    v4 = coefL * sc4
    d4 = jnp.where(ydiv >= 4, v4 << jnp.maximum(ydiv - 4, 0),
                   (v4 + (8 >> jnp.minimum(ydiv, 3)))
                   >> jnp.maximum(4 - ydiv, 0))
    # I16x16 DC: 4x4 hadamard + DC dequant replaces the (0,0) positions
    # (sublanes 0..15 hold (i,j) = (0,0) of blocks b = 4u+v, matching the
    # hadamard grid order)
    fdc = _mm(hh16, dcs[0:16])
    vdc = fdc * sc4[0:16]
    dcd = jnp.where(ydiv >= 6, vdc << jnp.maximum(ydiv - 6, 0),
                    (vdc + (32 >> jnp.minimum(ydiv, 5)))
                    >> jnp.maximum(6 - ydiv, 0))
    d4 = jnp.concatenate([jnp.where(is16, dcd, d4[0:16]), d4[16:]], axis=0)
    out4 = _idct4_slab(d4, 16)                        # rows 64y + 16x + b

    # ---- luma 8x8 interpretation (compiled out when has8x8=False) ---------
    if has8x8 and "res8" not in ablate:       # "res8": perf-triage only
        v8 = coefL * _sel_scale(t8, ym6, L)
        d8 = jnp.where(ydiv >= 6, v8 << jnp.maximum(ydiv - 6, 0),
                       (v8 + (32 >> jnp.minimum(ydiv, 5)))
                       >> jnp.maximum(6 - ydiv, 0))
        cj = [d8[32 * j:32 * (j + 1)] for j in range(8)]  # rows 4i + blk
        fx8 = _idct8_stage_t(cj)
        g8 = [jnp.concatenate([fx8[x][4 * i:4 * (i + 1)]
                               for x in range(8)],
                              axis=0) for i in range(8)]  # rows 4x + blk
        out8 = (jnp.concatenate(_idct8_stage_t(g8), axis=0) + 32) >> 6
    elif has8x8:
        out8 = out4

    # ---- luma assembly -----------------------------------------------------
    resl4 = _mm(p4, jnp.where(ispcm, coefL, out4) if haspcm else out4)
    if has8x8 and "p8sel" not in ablate:      # "p8sel": perf-triage only
        resl8 = _mm(p8, out8)
        res_luma = jnp.where(is8, resl8, resl4)
    else:
        res_luma = resl4

    # ---- chroma ------------------------------------------------------------
    sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    icm = (sub >> 2) & 1                              # component per sublane
    scc = jnp.where(icm == 1, _sel_scale(tcr, crm6, L),
                    _sel_scale(tcb, cbm6, L))
    divc = jnp.where(icm == 1, crdiv, cbdiv)
    vc = coefC * scc
    dC = jnp.where(divc >= 4, vc << jnp.maximum(divc - 4, 0),
                   (vc + (8 >> jnp.minimum(divc, 3)))
                   >> jnp.maximum(4 - divc, 0))
    # chroma DC: 2x2 hadamard per component, always substituted (spec
    # 8.5.11); sublanes 0..7 hold (i,j) = (0,0) of blocks 4ic + (2u+v)
    fdcc = _mm(hh8c, dcs[16:24])
    dcdc = (fdcc * scc[0:8] << divc[0:8]) >> 5
    dC = jnp.concatenate([dcdc, dC[8:]], axis=0)
    outc = _idct4_slab(dC, 8)                         # rows 32y + 8x + q
    res_chroma = _mm(pc, jnp.where(ispcm, coefC, outc) if haspcm else outc)
    return res_luma, res_chroma


# ---------------------------------------------------------------------------
# host/XLA-side prep: meta, converters, skew feeds


def meta_raster(arrays, cb_off, cr_off, wmb, hmb):
    """[META_ROWS, B, n] int32 raster-order meta (availability flags per
    h264_spatial.c:333-428 semantics + per-MB QP % 6 / QP // 6 rows)."""
    kind = arrays["mb_kind"]
    B, n = kind.shape
    parsed = arrays["parsed"] > 0
    sid = arrays["slice_id"]
    qp = arrays["qpy"]
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
    qpcb = _QPC_TAB[jnp.clip(qp + cb_off, 0, 51)]
    qpcr = _QPC_TAB[jnp.clip(qp + cr_off, 0, 51)]
    return jnp.concatenate([
        kind[None], parsed.astype(jnp.int32)[None],
        al[None], at[None], atl[None], atr[None],
        arrays["i16_mode"][None], arrays["chroma_mode"][None],
        arrays["luma8x8_modes"].transpose(2, 0, 1),
        arrays["luma4x4_modes"].transpose(2, 0, 1),
        (qp % 6)[None], (qp // 6)[None],
        (qpcb % 6)[None], (qpcb // 6)[None],
        (qpcr % 6)[None], (qpcr // 6)[None],
        jnp.zeros((META_ROWS - 34, B, n), jnp.int32),
    ], axis=0)


def slabs_from_raster(arrays):
    """Raster-order PackedFrames coefficient arrays -> slab records
    [B, n, 256] / [B, n, 128] / [B, n, 24] int32 (compat path for the
    Python parsers; the native parser emits slab records directly)."""
    kind = arrays["mb_kind"]
    B, n = kind.shape
    is8 = (kind == KIND_I8x8)[..., None]
    ispcm = (kind == KIND_IPCM)[..., None]

    lac = arrays["luma_ac"].astype(jnp.int32)
    # decode-order block b = (y8, x8, y4, x4); slab s = 64j + 16i + 4u+v
    s4 = lac.reshape(B, n, 2, 2, 2, 2, 4, 4).transpose(
        0, 1, 7, 6, 2, 4, 3, 5).reshape(B, n, 256)
    l8 = arrays["luma8x8_coeff"].astype(jnp.int32)
    s8 = l8.reshape(B, n, 4, 8, 8).transpose(0, 1, 4, 3, 2).reshape(
        B, n, 256)
    pcm = lac.reshape(B, n, 4, 4, 4, 4).transpose(
        0, 1, 3, 5, 2, 4).reshape(B, n, 256)
    luma = jnp.where(is8, s8, jnp.where(ispcm, pcm, s4))

    cac = arrays["chroma_ac"].astype(jnp.int32)
    sc = cac.reshape(B, n, 2, 2, 2, 4, 4).transpose(
        0, 1, 6, 5, 2, 3, 4).reshape(B, n, 128)
    pcmc = cac.reshape(B, n, 2, 2, 4, 2, 4).transpose(
        0, 1, 4, 6, 2, 3, 5).reshape(B, n, 128)
    chroma = jnp.where(ispcm, pcmc, sc)

    dcs = jnp.concatenate(
        [arrays["luma_dc"].astype(jnp.int32).reshape(B, n, 16),
         arrays["chroma_dc"].astype(jnp.int32).reshape(B, n, 8),
         jnp.zeros((B, n, DC_ROWS - 24), jnp.int32)], axis=-1)
    return luma, chroma, dcs


def skew_feed(x_sbn, g, batch):
    """[S, B, n] raster -> [W, S, B*maxw] wave-major lane-major feed."""
    n_waves, maxw = g["skew_idx"].shape
    S = x_sbn.shape[0]
    flat = jnp.asarray(g["skew_idx"].reshape(-1))
    xs = x_sbn[:, :, flat]
    return xs.reshape(S, batch, n_waves, maxw).transpose(
        2, 0, 1, 3).reshape(n_waves, S, batch * maxw)


def skew_feed_slab(slab_bns, g, batch):
    """[B, n, S] raster slab records -> [W, S, B*maxw]."""
    return skew_feed(slab_bns.transpose(2, 0, 1), g, batch)


def slot_feed(slab_bws, g, batch, dtype=jnp.int32):
    """[B, n_waves*maxw, S] slot-ordered records -> [W, S, B*maxw]:
    the native parser writes MB (r, c) at slot w*maxw + k, so the device
    pass is one dense transpose (no gather)."""
    n_waves, maxw = g["skew_idx"].shape
    S = slab_bws.shape[-1]
    x = slab_bws.reshape(batch, n_waves, maxw, S).transpose(1, 3, 0, 2)
    return x.reshape(n_waves, S, batch * maxw).astype(dtype)


def vmask_feed(meta_s, g, batch):
    """Gate the parsed row of skewed meta on skew validity (padded lanes
    alias MB 0 in the gather path)."""
    n_waves, maxw = g["skew_idx"].shape
    valid = jnp.asarray(g["skew_valid"].reshape(-1).astype(np.int32))
    vm = jnp.broadcast_to(valid.reshape(n_waves, 1, maxw),
                          (n_waves, batch, maxw)).reshape(
        n_waves, 1, batch * maxw)
    return meta_s.at[:, R_PARSED:R_PARSED + 1].set(
        meta_s[:, R_PARSED:R_PARSED + 1] * vm)
