"""Skewed-wavefront intra reconstruction.

Macroblocks live in "skewed" space: wave w = 2*row + col, lane k ordered by
ascending col; each wave's MBs form one contiguous row of a
[n_waves, maxw, ...] buffer, and inter-MB dependencies flow through tiny
boundary-state buffers (right columns / bottom rows / corners).  All reads
and writes in the wave loop are contiguous slabs — no gathers or scatters
(the first engine, ops/recon.py, scatters into the frame plane and XLA
serialises that to ~1 fps at 1080p on TPU).

`wave_compute` is the pure per-wave math of this module's XLA driver
(lax.fori_loop; CPU tests / fallback).  The production TPU path is the
lane-major single-kernel family: ops/recon_lane.py (shared math) and
ops/recon_fused.py (batch-in-lanes single Pallas kernel, the flagship
engine).

The code is written under Mosaic's lowering constraints (which also suit
XLA fine): no gather/scatter, no lane-splitting reshapes (blocks are
assembled with slices + concats), per-mode flat prediction vectors from a
selection-matrix matmul (f32 MXU, exact for these magnitudes), and
where-selected shifts.  Bit-exact vs the oracle (tests/test_recon_jax.py).

Residual layout consumed here (see pack_skewed): luma residuals are
pre-assembled into the 16x16 MB plane for every MB kind (PCM raw pixels
included); chroma residuals are [16, 8] with Cb rows 0-7 and Cr rows 8-15.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models.h264.syntax import (KIND_I4x4, KIND_I8x8, KIND_I16x16,
                                  KIND_IPCM)
from ..models.h264.tables import BLK4x4_POS
from .predtables import PRED4, PRED8
from .recon import (PackedFrames, _TR4_CLASS, _assemble_16x16,
                    _assemble_from_8x8, build_residuals)

# ---------------------------------------------------------------------------
# geometry


def skew_tables(wmb: int, hmb: int):
    """Lane layout: wave w, lane k -> (r, c) = (r0 - k, c0 + 2k)."""
    n_waves = 2 * (hmb - 1) + wmb
    maxw = min(hmb, (wmb + 1) // 2 + 1)
    r0 = np.minimum(np.arange(n_waves) // 2, hmb - 1)
    c0 = np.arange(n_waves) - 2 * r0
    skew_idx = np.zeros((n_waves, maxw), dtype=np.int32)
    skew_valid = np.zeros((n_waves, maxw), dtype=bool)
    for w in range(n_waves):
        for k in range(maxw):
            r = r0[w] - k
            c = c0[w] + 2 * k
            if 0 <= r < hmb and 0 <= c < wmb:
                skew_idx[w, k] = r * wmb + c
                skew_valid[w, k] = True
    w_of = np.zeros(wmb * hmb, dtype=np.int32)
    k_of = np.zeros(wmb * hmb, dtype=np.int32)
    for r in range(hmb):
        for c in range(wmb):
            w = 2 * r + c
            w_of[r * wmb + c] = w
            k_of[r * wmb + c] = r0[w] - r
    return {"n_waves": n_waves, "maxw": maxw,
            "r0": r0.astype(np.int32), "c0": c0.astype(np.int32),
            "skew_idx": skew_idx, "skew_valid": skew_valid,
            "w_of": w_of, "k_of": k_of}


# ---------------------------------------------------------------------------
# prediction selection matrices: refs layout s = [corner, top(2n), left(n)]

def _selection_matrix(tables, n):
    idx, w, rnd, shift = tables
    S = 1 + 2 * n + n
    M = np.zeros((S, 9 * n * n), dtype=np.float32)
    for m in range(9):
        for y in range(n):
            for x in range(n):
                col = (m * n + y) * n + x
                for t in range(3):
                    M[idx[m, y, x, t], col] += w[m, y, x, t]
    return (M, rnd.reshape(9 * n * n).astype(np.int32),
            shift.reshape(9 * n * n).astype(np.int32))


def _selection_matrix_i8(tables, n):
    """int8 variant: the v5e MXU has a native s8 x s8 -> s32 path (one
    pass vs six for exact f32).  Samples are shifted to s-128 in [-128,
    127]; the constant 128*colsum(M) correction rides in a bias vector.
    Tap weights are tiny (<= 4), so the product is exact in int32."""
    M, rnd, shift = _selection_matrix(tables, n)
    assert np.abs(M).max() <= 127
    bias = (128.0 * M.sum(axis=0)).astype(np.int32)
    return (M.astype(np.int8), bias, rnd, shift)


_SEL4 = _selection_matrix(PRED4, 4)
_SEL8 = _selection_matrix(PRED8, 8)
_SEL4_I8 = _selection_matrix_i8(PRED4, 4)
_SEL8_I8 = _selection_matrix_i8(PRED8, 8)

_BLK_X = [int(BLK4x4_POS[b][0]) for b in range(16)]
_BLK_Y = [int(BLK4x4_POS[b][1]) for b in range(16)]

# profiling ablation switches (perf triage only — never set in production)
_SKIP_I4 = False
_SKIP_I8 = False
_SKIP_CHROMA = False


def _row_select_np(n):
    """R [n, n*n, n] f32: R[y] selects row y's lanes from a flat n*n
    vector via matmul (Mosaic needs offset-0 operands for sublane
    concats, and dot results are offset-0)."""
    R = np.zeros((n, n * n, n), dtype=np.float32)
    for y in range(n):
        for x in range(n):
            R[y, y * n + x, x] = 1.0
    return R


_ROWSEL4 = _row_select_np(4)
_ROWSEL8 = _row_select_np(8)


def rows_from_flat(flat, n, rowsel=None):
    """[..., n*n] -> [..., n, n] without a lane-splitting reshape."""
    if rowsel is None:
        parts = [flat[..., i * n:(i + 1) * n][..., None, :]
                 for i in range(n)]
        return jnp.concatenate(parts, axis=-2)
    lead = flat.shape[:-1]
    f = flat.astype(jnp.float32).reshape((-1, n * n))
    parts = [jnp.dot(f, rowsel[y], precision=jax.lax.Precision.HIGHEST)
             .astype(jnp.int32).reshape(lead + (1, n))
             for y in range(n)]
    return jnp.concatenate(parts, axis=-2)


def _predict_flat(s, sel, mode, dc, n, rowsel=None):
    """s [..., S] int32; returns selected prediction [..., n, n].

    One matmul against the selection matrix (exact: small integers),
    per-mode flat slices, where-selected shifts, one-hot mode select.
    A 4-tuple sel is the int8 MXU path (M_i8, bias, rnd, shift); a
    3-tuple is the exact-f32 fallback (Pallas driver)."""
    lead = s.shape[:-1]
    nn = n * n
    if len(sel) == 4:
        M8, bias, rnd_flat, shift_flat = sel
        s8 = (s - 128).astype(jnp.int8).reshape((-1, s.shape[-1]))
        acc = jax.lax.dot_general(
            s8, M8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = (acc + bias).reshape(lead + (9 * nn,))
    else:
        M, rnd_flat, shift_flat = sel
        acc = jnp.dot(s.astype(jnp.float32).reshape((-1, s.shape[-1])),
                      M, precision=jax.lax.Precision.HIGHEST)
        acc = acc.astype(jnp.int32).reshape(lead + (9 * nn,))
    out_flat = jnp.zeros(lead + (nn,), dtype=jnp.int32)
    for m in range(9):
        if m == 2:
            val = jnp.broadcast_to(dc[..., None], lead + (nn,))
        else:
            a = acc[..., m * nn:(m + 1) * nn] + rnd_flat[m * nn:(m + 1) * nn]
            sh = shift_flat[m * nn:(m + 1) * nn]
            # tap shifts are only ever 0, 1 or 2
            val = jnp.where(sh == 0, a, jnp.where(sh == 1, a >> 1, a >> 2))
        out_flat = jnp.where((mode == m)[..., None], val, out_flat)
    return rows_from_flat(out_flat, n, rowsel)


def _dc(sum_l, sum_t, al, at, n):
    log2n = n.bit_length() - 1
    return jnp.where(
        al & at, (sum_l + sum_t + n) >> (log2n + 1),
        jnp.where(al, (sum_l + n // 2) >> log2n,
                  jnp.where(at, (sum_t + n // 2) >> log2n, 128)))


def _plane(left, top, corner, n):
    """Plane prediction over [..., n] refs (spec 8.3.3.4 / 8.3.4.4)."""
    half = n // 2
    acc_h = jnp.zeros(left.shape[:-1], dtype=jnp.int32)
    acc_v = jnp.zeros(left.shape[:-1], dtype=jnp.int32)
    for x in range(half):
        lo_t = corner if half - 2 - x == -1 else top[..., half - 2 - x]
        acc_h = acc_h + (x + 1) * (top[..., half + x] - lo_t)
        lo_l = corner if half - 2 - x == -1 else left[..., half - 2 - x]
        acc_v = acc_v + (x + 1) * (left[..., half + x] - lo_l)
    a = 16 * (left[..., n - 1] + top[..., n - 1])
    if n == 16:
        b = (5 * acc_h + 32) >> 6
        c = (5 * acc_v + 32) >> 6
    else:
        b = (17 * acc_h + 16) >> 5
        c = (17 * acc_v + 16) >> 5
    gx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    gy = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    val = (a[..., None, None] + b[..., None, None] * (gx - (half - 1))
           + c[..., None, None] * (gy - (half - 1)) + 16) >> 5
    return jnp.clip(val, 0, 255)


def _filter8(left, top16, corner, al, at, ac):
    """Intra_8x8 reference filtering (spec 8.3.2.2.1)."""
    t_m1 = jnp.where(ac[..., None], corner[..., None], 0)
    tp = jnp.concatenate([t_m1, top16], axis=-1)
    ft_mid = (tp[..., :-2] + 2 * tp[..., 1:-1] + tp[..., 2:] + 2) >> 2
    ft0 = jnp.where(ac, (corner + 2 * top16[..., 0] + top16[..., 1] + 2)
                    >> 2, (3 * top16[..., 0] + top16[..., 1] + 2) >> 2)
    ft15 = (top16[..., 14] + 3 * top16[..., 15] + 2) >> 2
    ft = jnp.concatenate([ft0[..., None], ft_mid[..., 1:],
                          ft15[..., None]], axis=-1)
    ft = jnp.where(at[..., None], ft, top16)
    fc = jnp.where(at & al,
                   (top16[..., 0] + 2 * corner + left[..., 0] + 2) >> 2,
                   jnp.where(at, (3 * corner + top16[..., 0] + 2) >> 2,
                             jnp.where(al, (3 * corner + left[..., 0] + 2)
                                       >> 2, corner)))
    fc = jnp.where(ac, fc, corner)
    l_m1 = jnp.where(ac[..., None], corner[..., None], 0)
    lp = jnp.concatenate([l_m1, left], axis=-1)
    fl_mid = (lp[..., :-2] + 2 * lp[..., 1:-1] + lp[..., 2:] + 2) >> 2
    fl0 = jnp.where(ac, (corner + 2 * left[..., 0] + left[..., 1] + 2)
                    >> 2, (3 * left[..., 0] + left[..., 1] + 2) >> 2)
    fl7 = (left[..., 6] + 3 * left[..., 7] + 2) >> 2
    fl = jnp.concatenate([fl0[..., None], fl_mid[..., 1:],
                          fl7[..., None]], axis=-1)
    fl = jnp.where(al[..., None], fl, left)
    return fl, ft, fc


# ---------------------------------------------------------------------------
# tile accessors (functional for XLA, ref-backed for Pallas)


class ValueTile:
    def __init__(self, arr):
        self.arr = arr

    def get(self, ys, xs):
        return self.arr[..., ys, xs]

    def set(self, ys, xs, val):
        self.arr = self.arr.at[..., ys, xs].set(val)

    def full(self):
        return self.arr

    def store_full(self, val):
        self.arr = val


class RefTile:
    """VMEM-scratch tile [B, maxw, 16, 16]: in-place slice stores
    (Mosaic cannot lower scatter / functional updates)."""

    def __init__(self, ref):
        self.ref = ref

    def get(self, ys, xs):
        return self.ref[:, :, ys, xs]

    def set(self, ys, xs, val):
        self.ref[:, :, ys, xs] = val

    def full(self):
        return self.ref[...]

    def store_full(self, val):
        self.ref[...] = val


# ---------------------------------------------------------------------------
# the pure per-wave computation


def wave_compute(left_col, corner, top_row, tr_row, left_c, corner_cb,
                 corner_cr, top_c, kind, al, at, atl, atr, parsed,
                 modes4, modes8, i16_mode, cmode, res_luma, res_chroma,
                 sel4=None, sel8=None, tile_box=None, rowsel4=None,
                 rowsel8=None):
    """One wave's macroblock reconstruction.

    Leading dims [...] (typically [B, L]):
      left_col/top_row/tr_row [..., 16], corner [...] — luma refs
      (unmasked; availability flags passed separately);
      left_c/top_c [..., 16] (Cb 0:8, Cr 8:16), corner_cb/cr [...];
      kind/parsed/i16_mode/cmode [...]; al/at/atl/atr [...] bool;
      modes4 [..., 16], modes8 [..., 4];
      res_luma [..., 16, 16] spatially-assembled residual (all kinds;
      raw pixels for PCM); res_chroma [..., 16, 8] (Cb rows 0-7, Cr 8-15).

    Returns (tile [..., 16, 16], ctile [..., 16, 8]) int32 in [0, 255];
    unparsed lanes produce zeros.
    """
    if sel4 is None:
        sel4 = tuple(jnp.asarray(t) for t in _SEL4_I8)
    if sel8 is None:
        sel8 = tuple(jnp.asarray(t) for t in _SEL8_I8)
    lead = kind.shape
    ones = jnp.ones_like(al)
    zeros_b = jnp.zeros_like(al)

    left_col = jnp.where(al[..., None], left_col, 0)
    corner16 = jnp.where(atl, corner, 0)
    top_row_m = jnp.where(at[..., None], top_row, 0)
    tr_row_m = jnp.where(atr[..., None], tr_row, 0)
    left_c_m = jnp.where(al[..., None], left_c, 0)
    top_c_m = jnp.where(at[..., None], top_c, 0)
    corner_cb_m = jnp.where(atl, corner_cb, 0)
    corner_cr_m = jnp.where(atl, corner_cr, 0)

    if tile_box is None:
        tile_box = ValueTile(jnp.zeros(lead + (16, 16), dtype=jnp.int32))
    else:
        tile_box.store_full(jnp.zeros(lead + (16, 16), dtype=jnp.int32))

    # ---- I4x4: 16 static block steps ------------------------------------
    is4 = kind == KIND_I4x4
    for b in range(16) if not _SKIP_I4 else ():
        bx, by = _BLK_X[b], _BLK_Y[b]
        if bx == 0:
            l4 = left_col[..., by:by + 4]
            al_b = al
        else:
            l4 = tile_box.get(slice(by, by + 4), slice(bx - 1, bx))[..., 0]
            al_b = ones
        if by == 0:
            t4 = top_row_m[..., bx:bx + 4]
            at_b = at
            if bx < 12:
                tr4 = top_row_m[..., bx + 4:bx + 8]
                tr_b = at
            else:
                tr4 = tr_row_m[..., 0:4]
                tr_b = atr
            if bx == 0:
                c4 = corner16
                ac_b = atl
            else:
                c4 = top_row_m[..., bx - 1]
                ac_b = at
        else:
            lo = max(bx - 1, 0)
            hi = min(bx + 8, 16)
            trow = tile_box.get(slice(by - 1, by), slice(lo, hi))[..., 0, :]
            off = bx - lo
            t4 = trow[..., off:off + 4]
            at_b = ones
            if _TR4_CLASS[b] == 1:
                tr4 = trow[..., off + 4:off + 8]
                tr_b = ones
            else:
                tr4 = jnp.broadcast_to(t4[..., 3:4], t4.shape)
                tr_b = zeros_b
            if bx == 0:
                c4 = left_col[..., by - 1]
                ac_b = al
            else:
                c4 = trow[..., off - 1]
                ac_b = ones
        l4 = jnp.where(al_b[..., None], l4, 0)
        t4 = jnp.where(at_b[..., None], t4, 0)
        tr4 = jnp.where(tr_b[..., None], tr4, t4[..., 3:4])
        tr4 = jnp.where(at_b[..., None], tr4, 0)
        c4 = jnp.where(ac_b, c4, 0)
        s = jnp.concatenate([c4[..., None], t4, tr4, l4], axis=-1)
        dc = _dc(l4.sum(-1), t4.sum(-1), al_b, at_b, 4)
        pred = _predict_flat(s, sel4, modes4[..., b], dc, 4,
                              rowsel=rowsel4)
        out = jnp.clip(pred + res_luma[..., by:by + 4, bx:bx + 4], 0, 255)
        keep = is4[..., None, None]
        cur = tile_box.get(slice(by, by + 4), slice(bx, bx + 4))
        tile_box.set(slice(by, by + 4), slice(bx, bx + 4),
                     jnp.where(keep, out, cur))

    # ---- I8x8: 4 static block steps --------------------------------------
    is8 = kind == KIND_I8x8
    for b8 in range(4) if not _SKIP_I8 else ():
        bx, by = (b8 % 2) * 8, (b8 // 2) * 8
        if bx == 0:
            l8 = left_col[..., by:by + 8]
            al_b = al
        else:
            l8 = tile_box.get(slice(by, by + 8), slice(bx - 1, bx))[..., 0]
            al_b = ones
        if by == 0:
            t8 = top_row_m[..., bx:bx + 8]
            at_b = at
            if bx == 0:
                tr8 = top_row_m[..., 8:16]
                tr_b = at
                c8 = corner16
                ac_b = atl
            else:
                tr8 = tr_row_m[..., 0:8]
                tr_b = atr
                c8 = top_row_m[..., bx - 1]
                ac_b = at
        else:
            trow = tile_box.get(slice(by - 1, by), slice(0, 16))[..., 0, :]
            t8 = trow[..., bx:bx + 8]
            at_b = ones
            if b8 == 2:
                tr8 = trow[..., 8:16]
                tr_b = ones
            else:
                tr8 = jnp.broadcast_to(t8[..., 7:8], t8.shape)
                tr_b = zeros_b
            if bx == 0:
                c8 = left_col[..., by - 1]
                ac_b = al
            else:
                c8 = trow[..., bx - 1]
                ac_b = ones
        l8 = jnp.where(al_b[..., None], l8, 0)
        t8 = jnp.where(at_b[..., None], t8, 0)
        tr8 = jnp.where(tr_b[..., None], tr8, t8[..., 7:8])
        tr8 = jnp.where(at_b[..., None], tr8, 0)
        c8 = jnp.where(ac_b, c8, 0)
        t16 = jnp.concatenate([t8, tr8], axis=-1)
        fl, ft, fc = _filter8(l8, t16, c8, al_b, at_b, ac_b)
        s = jnp.concatenate([fc[..., None], ft, fl], axis=-1)
        dc = _dc(fl.sum(-1), ft[..., :8].sum(-1), al_b, at_b, 8)
        pred = _predict_flat(s, sel8, modes8[..., b8], dc, 8,
                              rowsel=rowsel8)
        out = jnp.clip(pred + res_luma[..., by:by + 8, bx:bx + 8], 0, 255)
        keep = is8[..., None, None]
        cur = tile_box.get(slice(by, by + 8), slice(bx, bx + 8))
        tile_box.set(slice(by, by + 8), slice(bx, bx + 8),
                     jnp.where(keep, out, cur))

    # ---- I16x16 / PCM ----------------------------------------------------
    is_pcm = kind == KIND_IPCM
    is16 = (kind == KIND_I16x16) | is_pcm
    pred_v = jnp.broadcast_to(top_row_m[..., None, :], lead + (16, 16))
    pred_h = jnp.broadcast_to(left_col[..., :, None], lead + (16, 16))
    dc16 = _dc(left_col.sum(-1), top_row_m.sum(-1), al, at, 16)
    pl16 = _plane(left_col, top_row_m, corner16, 16)
    p16 = jnp.where((i16_mode == 0)[..., None, None], pred_v,
                    jnp.where((i16_mode == 1)[..., None, None], pred_h,
                              jnp.where((i16_mode == 2)[..., None, None],
                                        dc16[..., None, None], pl16)))
    p16 = jnp.where(is_pcm[..., None, None], 0, p16)
    out16 = jnp.clip(p16 + res_luma, 0, 255)
    tile_box.store_full(
        jnp.where(is16[..., None, None], out16, tile_box.full()))

    # ---- chroma (per component, flat refs) -------------------------------
    ctiles = []
    for ic, ccorner in (((0, corner_cb_m), (1, corner_cr_m))
                        if not _SKIP_CHROMA else ()):
        lc = left_c_m[..., ic * 8:(ic + 1) * 8]
        tc = top_c_m[..., ic * 8:(ic + 1) * 8]
        st0 = tc[..., :4].sum(-1)
        st1 = tc[..., 4:].sum(-1)
        sl0 = lc[..., :4].sum(-1)
        sl1 = lc[..., 4:].sum(-1)

        def dcb(tsum, lsum, prefer):
            both = (tsum + lsum + 4) >> 3
            t_only = (tsum + 2) >> 2
            l_only = (lsum + 2) >> 2
            if prefer == "both":
                return jnp.where(al & at, both,
                                 jnp.where(at, t_only,
                                           jnp.where(al, l_only, 128)))
            if prefer == "top":
                return jnp.where(at, t_only, jnp.where(al, l_only, 128))
            return jnp.where(al, l_only, jnp.where(at, t_only, 128))

        d00 = dcb(st0, sl0, "both")
        d01 = dcb(st1, sl0, "top")
        d10 = dcb(st0, sl1, "left")
        d11 = dcb(st1, sl1, "both")

        def brow(a4, b4):
            row = jnp.concatenate(
                [jnp.broadcast_to(a4[..., None], a4.shape + (4,)),
                 jnp.broadcast_to(b4[..., None], b4.shape + (4,))],
                axis=-1)
            return jnp.broadcast_to(row[..., None, :],
                                    row.shape[:-1] + (4, 8))

        pred_dc = jnp.concatenate([brow(d00, d01), brow(d10, d11)],
                                  axis=-2)
        pred_h = jnp.broadcast_to(lc[..., :, None], lead + (8, 8))
        pred_v = jnp.broadcast_to(tc[..., None, :], lead + (8, 8))
        pl = _plane(lc, tc, ccorner, 8)
        predc = jnp.where((cmode == 0)[..., None, None], pred_dc,
                          jnp.where((cmode == 1)[..., None, None], pred_h,
                                    jnp.where((cmode == 2)[..., None, None],
                                              pred_v, pl)))
        predc = jnp.where(is_pcm[..., None, None], 0, predc)
        resc = res_chroma[..., ic * 8:(ic + 1) * 8, :]
        ctiles.append(jnp.clip(predc + resc, 0, 255))
    if _SKIP_CHROMA:
        ctiles = [jnp.zeros(lead + (8, 8), jnp.int32)] * 2
    ctile = jnp.concatenate(ctiles, axis=-2)        # [..., 16, 8]

    pmask = parsed > 0
    tile = jnp.where(pmask[..., None, None], tile_box.full(), 0)
    ctile = jnp.where(pmask[..., None, None], ctile, 0)
    return tile, ctile


# ---------------------------------------------------------------------------
# packing (shared with the Pallas driver)


def pack_skewed(arrays, res, g):
    """Per-frame arrays + residuals -> skewed wave-major layout.

    Returns dict with:
      meta [B, n_waves, maxw, 32] int32,
      res_luma [B, n_waves, maxw, 16, 16] int32 (assembled, all kinds),
      res_chroma [B, n_waves, maxw, 16, 8] int32 (Cb rows 0-7, Cr 8-15).
    """
    wmb = g["wmb"]
    hmb = g["hmb"]
    nmb = wmb * hmb
    skew_idx = jnp.asarray(g["skew_idx"])
    n_waves, maxw = g["skew_idx"].shape
    flat = skew_idx.reshape(-1)
    B = arrays["mb_kind"].shape[0]

    kind = arrays["mb_kind"]
    a4 = _assemble_16x16(res["r4"])                  # [B, n, 16, 16]
    a8 = _assemble_from_8x8(res["r8"])
    is4 = (kind == KIND_I4x4)[..., None, None]
    is8 = (kind == KIND_I8x8)[..., None, None]
    res_luma = jnp.where(is4, a4, jnp.where(is8, a8, res["luma16_res"]))
    res_chroma = res["chroma_res"].reshape(B, nmb, 16, 8)

    parsed = arrays["parsed"] > 0
    sid = arrays["slice_id"]
    m = flat
    r = m // wmb
    c = m % wmb

    def ok(mm, cond):
        mmc = jnp.clip(mm, 0, nmb - 1)
        return (cond[None, :] & parsed[:, mmc]
                & (sid[:, mmc] == sid[:, m])).astype(jnp.int32)

    al = ok(m - 1, c > 0)
    at = ok(m - wmb, r > 0)
    atl = ok(m - wmb - 1, (c > 0) & (r > 0))
    atr = ok(m - wmb + 1, (c < wmb - 1) & (r > 0))

    valid = jnp.broadcast_to(
        jnp.asarray(g["skew_valid"].reshape(-1).astype(np.int32))[None],
        (B, n_waves * maxw))
    meta = jnp.concatenate([
        arrays["mb_kind"][:, flat, None],
        (arrays["parsed"][:, flat, None] > 0).astype(jnp.int32)
        * valid[..., None],
        al[..., None], at[..., None], atl[..., None], atr[..., None],
        arrays["i16_mode"][:, flat, None],
        arrays["chroma_mode"][:, flat, None],
        arrays["luma8x8_modes"][:, flat],
        arrays["luma4x4_modes"][:, flat],
        jnp.zeros((B, n_waves * maxw, 4), jnp.int32),
    ], axis=-1)
    return {
        "meta": meta.reshape(B, n_waves, maxw, 32),
        "res_luma": res_luma[:, flat].reshape(B, n_waves, maxw, 16, 16),
        "res_chroma": res_chroma[:, flat].reshape(B, n_waves, maxw, 16, 8),
    }


def unpack_meta(meta):
    return {
        "kind": meta[..., 0],
        "parsed": meta[..., 1],
        "al": meta[..., 2] > 0,
        "at": meta[..., 3] > 0,
        "atl": meta[..., 4] > 0,
        "atr": meta[..., 5] > 0,
        "i16_mode": meta[..., 6],
        "cmode": meta[..., 7],
        "modes8": meta[..., 8:12],
        "modes4": meta[..., 12:28],
    }


def unskew_planes(out_y, out_c, g):
    """out_y [B, n_waves, maxw, 16, 16] uint8, out_c [..., 16, 8] ->
    (Y, Cb, Cr) raster planes."""
    wmb, hmb = g["wmb"], g["hmb"]
    H, W = hmb * 16, wmb * 16
    n_waves, maxw = g["skew_idx"].shape
    B = out_y.shape[0]
    unskew = jnp.asarray(
        g["w_of"].astype(np.int64) * maxw + g["k_of"]).astype(jnp.int32)
    oy = out_y.reshape(B, n_waves * maxw, 16, 16)[:, unskew]
    Y = oy.reshape(B, hmb, wmb, 16, 16).transpose(0, 1, 3, 2, 4).reshape(
        B, H, W)
    oc = out_c.reshape(B, n_waves * maxw, 2, 8, 8)[:, unskew]
    C = oc.reshape(B, hmb, wmb, 2, 8, 8).transpose(
        0, 3, 1, 4, 2, 5).reshape(B, 2, H // 2, W // 2)
    return Y, C[:, 0], C[:, 1]


# ---------------------------------------------------------------------------
# XLA driver (fori_loop)


def make_reconstruct_wave(wmb: int, hmb: int):
    g = skew_tables(wmb, hmb)
    g["wmb"], g["hmb"] = wmb, hmb
    n_waves, maxw = g["n_waves"], g["maxw"]
    cw2 = (wmb + 1) // 2
    ROWP = hmb + maxw
    BOTP = cw2 + maxw + 1

    r0s = jnp.asarray(g["r0"])
    c0s = jnp.asarray(g["c0"])

    def wave_body(w, state, sk):
        # sk (meta + residual slabs, 100s of MB) is closure-captured, NOT
        # loop-carried: carried dict leaves XLA free to copy it per
        # iteration; as a captured constant it stays put in HBM.
        (out_y, out_c, row_y, row_c, bot_y, bot_c) = state
        B = row_y.shape[0]
        r0 = r0s[w]
        c0 = c0s[w]
        pc = c0 & 1
        half = c0 >> 1
        halfr = (c0 + 1) >> 1
        pr = 1 - pc

        rr0 = hmb - 1 - r0     # row state stored in reversed row order
        rs_y = jax.lax.dynamic_slice_in_dim(row_y, rr0, maxw, axis=1)
        rs_c = jax.lax.dynamic_slice_in_dim(row_c, rr0, maxw, axis=1)
        left_col = rs_y[..., :16]
        corner = rs_y[..., 16]
        left_c = rs_c[..., :16]
        corner_cb = rs_c[..., 16]
        corner_cr = rs_c[..., 17]

        def bot_slice(buf, par, start):
            two = jax.lax.dynamic_slice_in_dim(buf, start, maxw, axis=2)
            return jnp.where((par == 0), two[:, 0], two[:, 1])

        top_row = bot_slice(bot_y, pc, half)
        tr_row = bot_slice(bot_y, pr, halfr)
        top_c = bot_slice(bot_c, pc, half)

        meta = unpack_meta(jax.lax.dynamic_slice_in_dim(
            sk["meta"], w, 1, axis=1)[:, 0])
        res_luma = jax.lax.dynamic_slice_in_dim(
            sk["res_luma"], w, 1, axis=1)[:, 0]
        res_chroma = jax.lax.dynamic_slice_in_dim(
            sk["res_chroma"], w, 1, axis=1)[:, 0]

        tile, ctile = wave_compute(
            left_col, corner, top_row, tr_row, left_c, corner_cb,
            corner_cr, top_c, meta["kind"], meta["al"], meta["at"],
            meta["atl"], meta["atr"], meta["parsed"], meta["modes4"],
            meta["modes8"], meta["i16_mode"], meta["cmode"],
            res_luma, res_chroma)

        out_y = jax.lax.dynamic_update_slice_in_dim(
            out_y, tile[:, None].astype(jnp.uint8), w, axis=1)
        out_c = jax.lax.dynamic_update_slice_in_dim(
            out_c, ctile[:, None].astype(jnp.uint8), w, axis=1)

        upd = (meta["parsed"] > 0)[..., None]
        new_row = jnp.concatenate(
            [tile[..., :, 15], top_row[..., 15:16],
             jnp.zeros((B, maxw, 1), jnp.int32)], axis=-1)
        row_y = jax.lax.dynamic_update_slice_in_dim(
            row_y, jnp.where(upd, new_row, rs_y), rr0, axis=1)
        new_rowc = jnp.concatenate(
            [ctile[..., :, 7], top_c[..., 7:8], top_c[..., 15:16]],
            axis=-1)
        row_c = jax.lax.dynamic_update_slice_in_dim(
            row_c, jnp.where(upd, new_rowc, rs_c), rr0, axis=1)

        def bot_update(buf, newv, par, start, upd_mask):
            two = jax.lax.dynamic_slice_in_dim(buf, start, maxw, axis=2)
            old = jnp.where((par == 0), two[:, 0], two[:, 1])
            merged_ = jnp.where(upd_mask[..., None], newv, old)
            sel0 = (par == 0)
            new0 = jnp.where(sel0, merged_, two[:, 0])
            new1 = jnp.where(sel0, two[:, 1], merged_)
            return jax.lax.dynamic_update_slice_in_dim(
                buf, jnp.stack([new0, new1], axis=1), start, axis=2)

        updm = meta["parsed"] > 0
        bot_y = bot_update(bot_y, tile[..., 15, :], pc, half, updm)
        botc_new = jnp.concatenate(
            [ctile[..., 7, :], ctile[..., 15, :]], axis=-1)
        bot_c = bot_update(bot_c, botc_new, pc, half, updm)

        return (out_y, out_c, row_y, row_c, bot_y, bot_c)

    def recon(arrays, ls4, ls8, cb_off, cr_off):
        res = build_residuals(arrays, ls4, ls8, cb_off, cr_off)
        B = arrays["mb_kind"].shape[0]
        sk = pack_skewed(arrays, res, g)

        out_y = jnp.zeros((B, n_waves, maxw, 16, 16), dtype=jnp.uint8)
        out_c = jnp.zeros((B, n_waves, maxw, 16, 8), dtype=jnp.uint8)
        row_y = jnp.zeros((B, ROWP, 18), dtype=jnp.int32)
        row_c = jnp.zeros((B, ROWP, 18), dtype=jnp.int32)
        bot_y = jnp.zeros((B, 2, BOTP, 16), dtype=jnp.int32)
        bot_c = jnp.zeros((B, 2, BOTP, 16), dtype=jnp.int32)

        state = (out_y, out_c, row_y, row_c, bot_y, bot_c)
        state = jax.lax.fori_loop(
            0, n_waves, lambda w, s: wave_body(w, s, sk), state)
        out_y, out_c = state[0], state[1]
        return unskew_planes(out_y, out_c, g)

    return jax.jit(recon)


_CACHE = {}


def reconstruct_frames_wave(packed: PackedFrames):
    key = (packed.wmb, packed.hmb)
    if key not in _CACHE:
        _CACHE[key] = make_reconstruct_wave(*key)
    fn = _CACHE[key]
    arrays = {k: jnp.asarray(v) for k, v in packed.arrays.items()}
    cb_off, cr_off = packed.chroma_qp_off
    return fn(arrays, jnp.asarray(packed.ls4), jnp.asarray(packed.ls8),
              cb_off, cr_off)
