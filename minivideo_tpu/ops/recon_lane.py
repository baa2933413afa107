"""Lane-major skewed-wavefront intra reconstruction.

Same anti-diagonal schedule as ops/recon_wave.py (wave w = 2*row + col,
lane k at (r0-k, c0+2k)), but every per-wave tensor is laid out
**lane-major**: the wave-lane axis is LAST so it lands on the TPU's
128-wide lane dimension, and the per-MB structure (tile pixels,
reference samples, modes) lives in sublanes:

    luma tile     [256, L]   sublane = 16*y + x
    chroma tile   [128, L]   sublane = comp*64 + 8*y + x
    refs          [ 16, L]
    per-MB scalar [  1, L]

The core `wave_compute_lane` is written strictly 2D (no batch dim) so
Mosaic compiles each op as one dense vector op instead of unrolling over
leading dims — the unrolling is what made an earlier Pallas kernel
(tiles [B, maxw, 16, 16], removed in round 2) explode at 1080p.  Three
drivers share it:

  * this module's XLA driver (jax.vmap over the batch + lax.fori_loop
    over waves) — used for CPU tests and as a fallback (the XLA drivers
    are dispatch-bound at ~80 fps/1080p on v5e: ~50 kernel launches per
    wave x 254 waves dominates wall clock);
  * ops/recon_fused.py — the flagship TPU engine: ONE Pallas kernel,
    grid (n_waves,) with the batch merged into the lane axis
    (L = B * maxw) and residual construction in-kernel (ops/slab.py);
  * parallel/halo.py — the same math inside shard_map with the lane
    axis sharded across chips (ppermute halos).

All tile block reads/writes are static sublane slices/concats (columns
are assembled from single-sublane slices — no gathers, no strided ops,
no lane-splitting reshapes).  Prediction is one exact f32 MXU matmul
against a selection matrix per block size (tap weights <= 4 and samples
<= 255, so f32 products are exact).  Bit-exact vs the numpy oracle and
the other engines (tests/test_recon_jax.py).

Reference scope (for parity auditing): intra prediction modes and
reconstruction per h264_intra_prediction.c / h264_transform.c of the
reference (see ops/recon.py docstrings for file:line citations).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models.h264.syntax import (KIND_I4x4, KIND_I8x8, KIND_I16x16,
                                  KIND_IPCM)
from .recon import PackedFrames, _TR4_CLASS, build_residuals
from .recon_wave import (_BLK_X, _BLK_Y, _SEL4, _SEL8, pack_skewed,
                         skew_tables, unskew_planes)

# ---------------------------------------------------------------------------
# transposed selection matrices: acc[o, l] = sum_s M[s, o] * refs[s, l]


def _sel_T(sel):
    """Transposed selection matrix with each output row's rounding
    constant and shift FOLDED IN: row o computes
    (sum_s M[s,o]*refs[s] + rnd[o]) >> shift[o] as
    floor(dot(aug[o], [refs; 1])).  Exact in f32: taps/2^shift have
    granule 1/4 (shift <= 2), partial sums stay below 2^17 quarter
    units, and all taps are non-negative so predictions are >= 0 and
    the int-cast truncation IS the spec's flooring shift.  Kills the
    per-block rnd-add + shift-select vector ops in the wave body."""
    M, rnd, shift = sel
    assert M.min() >= 0.0 and shift.max() <= 2
    sc = (1.0 / np.left_shift(1, shift.reshape(-1))).astype(np.float32)
    MT = np.ascontiguousarray(M.T).astype(np.float32) * sc[:, None]
    aug = np.concatenate(
        [MT, (rnd.reshape(-1) * sc)[:, None].astype(np.float32)], axis=1)
    return np.ascontiguousarray(aug)


_SEL4_T = _sel_T(_SEL4)   # [144, 14] f32 (13 refs + 1 bias column)
_SEL8_T = _sel_T(_SEL8)   # [576, 26]


def _predict_lane(s, selT, mode, dc, n):
    """s [S, L] int32 samples in [0, 255]; mode/dc [1, L].

    Returns the mode-selected prediction as a flat [n*n, L] slab
    (sublane = n*y + x).  One exact f32 MXU matmul (rounding + shift
    folded into selT, see _sel_T) computes all 9 directional modes; DC
    (mode 2) is substituted from `dc`.
    """
    nn = n * n
    ones = jnp.ones((1, s.shape[-1]), jnp.float32)
    s_aug = jnp.concatenate([s.astype(jnp.float32), ones], axis=0)
    acc = jax.lax.dot_general(
        selT, s_aug, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    out = jnp.zeros((nn,) + acc.shape[1:], jnp.int32)
    for m in range(9):
        val = (jnp.broadcast_to(dc, out.shape) if m == 2
               else acc[m * nn:(m + 1) * nn])
        out = jnp.where(mode == m, val, out)
    return out


def _dc(sum_l, sum_t, al, at, n):
    log2n = n.bit_length() - 1
    return jnp.where(
        al & at, (sum_l + sum_t + n) >> (log2n + 1),
        jnp.where(al, (sum_l + n // 2) >> log2n,
                  jnp.where(at, (sum_t + n // 2) >> log2n, 128)))


def _plane_lane(left, top, corner, n):
    """Plane prediction -> flat [n*n, L] (spec 8.3.3.4 / 8.3.4.4).
    left/top [n, L], corner [1, L]."""
    half = n // 2
    acc_h = jnp.zeros_like(corner)
    acc_v = jnp.zeros_like(corner)
    for x in range(half):
        lo_t = corner if half - 2 - x == -1 else top[half - 2 - x:half - 1 - x]
        acc_h = acc_h + (x + 1) * (top[half + x:half + x + 1] - lo_t)
        lo_l = (corner if half - 2 - x == -1
                else left[half - 2 - x:half - 1 - x])
        acc_v = acc_v + (x + 1) * (left[half + x:half + x + 1] - lo_l)
    a = 16 * (left[n - 1:n] + top[n - 1:n])
    if n == 16:
        b = (5 * acc_h + 32) >> 6
        c = (5 * acc_v + 32) >> 6
    else:
        b = (17 * acc_h + 16) >> 5
        c = (17 * acc_v + 16) >> 5
    L = corner.shape[-1]
    gx = jax.lax.broadcasted_iota(jnp.int32, (n * n, L), 0) % n
    gy = jax.lax.broadcasted_iota(jnp.int32, (n * n, L), 0) // n
    val = (a + b * (gx - (half - 1)) + c * (gy - (half - 1)) + 16) >> 5
    return jnp.clip(val, 0, 255)


def _filter8_lane(left, top16, corner, al, at, ac):
    """Intra_8x8 reference filtering (spec 8.3.2.2.1), sublane axis =
    ref index.  left [8, L], top16 [16, L], corner/flags [1, L]."""
    zero = jnp.zeros_like(corner)
    t_m1 = jnp.where(ac, corner, zero)
    tp = jnp.concatenate([t_m1, top16], axis=0)
    ft_mid = (tp[:-2] + 2 * tp[1:-1] + tp[2:] + 2) >> 2
    ft0 = jnp.where(ac, (corner + 2 * top16[0:1] + top16[1:2] + 2) >> 2,
                    (3 * top16[0:1] + top16[1:2] + 2) >> 2)
    ft15 = (top16[14:15] + 3 * top16[15:16] + 2) >> 2
    ft = jnp.concatenate([ft0, ft_mid[1:], ft15], axis=0)
    ft = jnp.where(at, ft, top16)
    fc = jnp.where(at & al,
                   (top16[0:1] + 2 * corner + left[0:1] + 2) >> 2,
                   jnp.where(at, (3 * corner + top16[0:1] + 2) >> 2,
                             jnp.where(al, (3 * corner + left[0:1] + 2)
                                       >> 2, corner)))
    fc = jnp.where(ac, fc, corner)
    l_m1 = jnp.where(ac, corner, zero)
    lp = jnp.concatenate([l_m1, left], axis=0)
    fl_mid = (lp[:-2] + 2 * lp[1:-1] + lp[2:] + 2) >> 2
    fl0 = jnp.where(ac, (corner + 2 * left[0:1] + left[1:2] + 2) >> 2,
                    (3 * left[0:1] + left[1:2] + 2) >> 2)
    fl7 = (left[6:7] + 3 * left[7:8] + 2) >> 2
    fl = jnp.concatenate([fl0, fl_mid[1:], fl7], axis=0)
    fl = jnp.where(al, fl, left)
    return fl, ft, fc


def _rows(t, y0, x0, ny, nx):
    """Tile rows y0..y0+ny, cols x0..x0+nx as [ny*nx, L] (concat of
    contiguous sublane slices — Mosaic-safe)."""
    if nx == 16 and x0 == 0:
        return t[y0 * 16:(y0 + ny) * 16]
    return jnp.concatenate(
        [t[(y0 + y) * 16 + x0:(y0 + y) * 16 + x0 + nx] for y in range(ny)],
        axis=0)


def _col(t, x, y0, n):
    """Tile column x, rows y0..y0+n -> [n, L] (single-sublane concat)."""
    return jnp.concatenate(
        [t[(y0 + y) * 16 + x:(y0 + y) * 16 + x + 1] for y in range(n)],
        axis=0)


def _tile_sublanes(t, idxs):
    """Gather single sublanes by static index list -> [len(idxs), L]."""
    return jnp.concatenate([t[i:i + 1] for i in idxs], axis=0)


# ---------------------------------------------------------------------------
# the per-wave computation (2D lane-major: one frame's wave)


def wave_compute_lane(left_col, corner, top_row, tr_row, left_c, corner_cb,
                      corner_cr, top_c, kind, al, at, atl, atr, parsed,
                      modes4, modes8, i16_mode, cmode, res_luma, res_chroma,
                      sel4=_SEL4_T, sel8=_SEL8_T, tile_ref=None,
                      has8x8=True, haspcm=True, ablate=()):
    """One wave of one frame, MBs dense over lanes.

    Shapes: refs [16, L] (left_c/top_c carry Cb in sublanes 0-7, Cr in
    8-15); corners/flags/scalars [1, L]; modes4 [16, L]; modes8 [4, L];
    res_luma [256, L] (sublane = 16*y + x); res_chroma [128, L]
    (sublane = comp*64 + 8*y + x).  al/at/atl/atr are bool [1, L].

    `tile_ref`, if given, is a [256, L] VMEM scratch ref used for the
    luma tile working state (Pallas driver); otherwise a functional
    jnp array is threaded.

    has8x8 / haspcm are STATIC specialization flags (see
    ops/slab.residual_from_slabs): False compiles out the 4-step I8x8
    prediction chain / the PCM zero-pred selects.  `ablate` is a set of
    section names ("i4", "i16", "chroma") compiled out for PERF TRIAGE
    ONLY (tools/probe_fused_ablate.py) — never set in production.

    Returns (tile [256, L], ctile [128, L]) int32 in [0, 255]; unparsed
    lanes produce zeros.
    """
    L = left_col.shape[-1]
    ones = jnp.ones_like(al)
    zeros_b = jnp.zeros_like(al)

    left_col = jnp.where(al, left_col, 0)
    corner16 = jnp.where(atl, corner, 0)
    top_row_m = jnp.where(at, top_row, 0)
    tr_row_m = jnp.where(atr, tr_row, 0)
    left_c_m = jnp.where(al, left_c, 0)
    top_c_m = jnp.where(at, top_c, 0)
    corner_cb_m = jnp.where(atl, corner_cb, 0)
    corner_cr_m = jnp.where(atl, corner_cr, 0)

    use_ref = tile_ref is not None
    if use_ref:
        tile_ref[...] = jnp.zeros((256, L), jnp.int32)

        def t_get(y0, x0, ny, nx):
            return _rows(tile_ref, y0, x0, ny, nx)

        def t_col(x, y0, n):
            return _col(tile_ref, x, y0, n)

        def t_sub(idxs):
            return _tile_sublanes(tile_ref, idxs)

        def t_write(out_flat, bx, by, n, keep):
            for y in range(n):
                r = (by + y) * 16 + bx
                cur = tile_ref[r:r + n]
                tile_ref[r:r + n] = jnp.where(
                    keep, out_flat[y * n:(y + 1) * n], cur)
    else:
        tile = jnp.zeros((256, L), jnp.int32)

        def t_get(y0, x0, ny, nx):
            return _rows(tile, y0, x0, ny, nx)

        def t_col(x, y0, n):
            return _col(tile, x, y0, n)

        def t_sub(idxs):
            return _tile_sublanes(tile, idxs)

        def t_write(out_flat, bx, by, n, keep):
            nonlocal tile
            for y in range(n):
                r = (by + y) * 16 + bx
                cur = tile[r:r + n]
                tile = jax.lax.dynamic_update_slice_in_dim(
                    tile, jnp.where(keep, out_flat[y * n:(y + 1) * n], cur),
                    r, axis=0)

    # ---- I4x4: 16 static block steps ------------------------------------
    is4 = kind == KIND_I4x4
    for b in range(16) if "i4" not in ablate else ():
        bx, by = int(_BLK_X[b]), int(_BLK_Y[b])
        if bx == 0:
            l4 = left_col[by:by + 4]
            al_b = al
        else:
            l4 = t_col(bx - 1, by, 4)
            al_b = ones
        if by == 0:
            t4 = top_row_m[bx:bx + 4]
            at_b = at
            if bx < 12:
                tr4 = top_row_m[bx + 4:bx + 8]
                tr_b = at
            else:
                tr4 = tr_row_m[0:4]
                tr_b = atr
            if bx == 0:
                c4 = corner16
                ac_b = atl
            else:
                c4 = top_row_m[bx - 1:bx]
                ac_b = at
        else:
            lo = max(bx - 1, 0)
            hi = min(bx + 8, 16)
            trow = t_get(by - 1, lo, 1, hi - lo)
            off = bx - lo
            t4 = trow[off:off + 4]
            at_b = ones
            if _TR4_CLASS[b] == 1:
                tr4 = trow[off + 4:off + 8]
                tr_b = ones
            else:
                tr4 = jnp.broadcast_to(t4[3:4], t4.shape)
                tr_b = zeros_b
            if bx == 0:
                c4 = left_col[by - 1:by]
                ac_b = al
            else:
                c4 = trow[off - 1:off]
                ac_b = ones
        l4 = jnp.where(al_b, l4, 0)
        t4 = jnp.where(at_b, t4, 0)
        tr4 = jnp.where(tr_b, tr4, jnp.broadcast_to(t4[3:4], t4.shape))
        tr4 = jnp.where(at_b, tr4, 0)
        c4 = jnp.where(ac_b, c4, 0)
        s = jnp.concatenate([c4, t4, tr4, l4], axis=0)
        dc = _dc(l4.sum(0, keepdims=True), t4.sum(0, keepdims=True),
                 al_b, at_b, 4)
        pred = _predict_lane(s, sel4, modes4[b:b + 1], dc, 4)
        res = jnp.concatenate(
            [res_luma[(by + y) * 16 + bx:(by + y) * 16 + bx + 4]
             for y in range(4)], axis=0)
        out = jnp.clip(pred + res, 0, 255)
        t_write(out, bx, by, 4, is4)

    # ---- I8x8: 4 static block steps (compiled out if has8x8=False) -------
    is8 = kind == KIND_I8x8
    for b8 in range(4) if (has8x8 and "i8" not in ablate) else ():
        bx, by = (b8 % 2) * 8, (b8 // 2) * 8
        if bx == 0:
            l8 = left_col[by:by + 8]
            al_b = al
        else:
            l8 = t_col(bx - 1, by, 8)
            al_b = ones
        if by == 0:
            t8 = top_row_m[bx:bx + 8]
            at_b = at
            if bx == 0:
                tr8 = top_row_m[8:16]
                tr_b = at
                c8 = corner16
                ac_b = atl
            else:
                tr8 = tr_row_m[0:8]
                tr_b = atr
                c8 = top_row_m[bx - 1:bx]
                ac_b = at
        else:
            trow = t_get(by - 1, 0, 1, 16)
            t8 = trow[bx:bx + 8]
            at_b = ones
            if b8 == 2:
                tr8 = trow[8:16]
                tr_b = ones
            else:
                tr8 = jnp.broadcast_to(t8[7:8], t8.shape)
                tr_b = zeros_b
            if bx == 0:
                c8 = left_col[by - 1:by]
                ac_b = al
            else:
                c8 = trow[bx - 1:bx]
                ac_b = ones
        l8 = jnp.where(al_b, l8, 0)
        t8 = jnp.where(at_b, t8, 0)
        tr8 = jnp.where(tr_b, tr8, jnp.broadcast_to(t8[7:8], t8.shape))
        tr8 = jnp.where(at_b, tr8, 0)
        c8 = jnp.where(ac_b, c8, 0)
        t16 = jnp.concatenate([t8, tr8], axis=0)
        fl, ft, fc = _filter8_lane(l8, t16, c8, al_b, at_b, ac_b)
        s = jnp.concatenate([fc, ft, fl], axis=0)
        dc = _dc(fl.sum(0, keepdims=True), ft[:8].sum(0, keepdims=True),
                 al_b, at_b, 8)
        pred = _predict_lane(s, sel8, modes8[b8:b8 + 1], dc, 8)
        res = jnp.concatenate(
            [res_luma[(by + y) * 16 + bx:(by + y) * 16 + bx + 8]
             for y in range(8)], axis=0)
        out = jnp.clip(pred + res, 0, 255)
        t_write(out, bx, by, 8, is8)

    # ---- I16x16 / PCM ----------------------------------------------------
    is_pcm = kind == KIND_IPCM
    is16 = (kind == KIND_I16x16) | is_pcm if haspcm else kind == KIND_I16x16
    if "i16" in ablate:
        if use_ref:
            tile_out = tile_ref[...]
        else:
            tile_out = tile
        ctile = jnp.concatenate([res_chroma[:64], res_chroma[64:]], axis=0)
        pmask = parsed > 0
        return jnp.where(pmask, tile_out, 0), jnp.where(pmask, ctile, 0)
    pred_v = jnp.concatenate([top_row_m] * 16, axis=0)
    pred_h = jnp.concatenate(
        [jnp.broadcast_to(left_col[y:y + 1], (16, L)) for y in range(16)],
        axis=0)
    dc16 = _dc(left_col.sum(0, keepdims=True),
               top_row_m.sum(0, keepdims=True), al, at, 16)
    pl16 = _plane_lane(left_col, top_row_m, corner16, 16)
    p16 = jnp.where(i16_mode == 0, pred_v,
                    jnp.where(i16_mode == 1, pred_h,
                              jnp.where(i16_mode == 2,
                                        jnp.broadcast_to(dc16,
                                                         pred_v.shape),
                                        pl16)))
    if haspcm:
        p16 = jnp.where(is_pcm, 0, p16)
    out16 = jnp.clip(p16 + res_luma, 0, 255)
    if use_ref:
        tile_ref[...] = jnp.where(is16, out16, tile_ref[...])
        tile_out = tile_ref[...]
    else:
        tile = jnp.where(is16, out16, tile)
        tile_out = tile

    # ---- chroma (per component) -------------------------------------------
    if "chroma" in ablate:
        pmask = parsed > 0
        return (jnp.where(pmask, tile_out, 0),
                jnp.where(pmask, res_chroma, 0))
    ctiles = []
    for ic, ccorner in ((0, corner_cb_m), (1, corner_cr_m)):
        lc = left_c_m[ic * 8:(ic + 1) * 8]
        tc = top_c_m[ic * 8:(ic + 1) * 8]
        st0 = tc[:4].sum(0, keepdims=True)
        st1 = tc[4:].sum(0, keepdims=True)
        sl0 = lc[:4].sum(0, keepdims=True)
        sl1 = lc[4:].sum(0, keepdims=True)

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

        def quad_row(a, b):
            return jnp.concatenate(
                [jnp.broadcast_to(a, (4, L)), jnp.broadcast_to(b, (4, L))],
                axis=0)

        row_t = quad_row(d00, d01)                   # [8, L]
        row_b = quad_row(d10, d11)
        pred_dc = jnp.concatenate([row_t] * 4 + [row_b] * 4, axis=0)
        pred_h = jnp.concatenate(
            [jnp.broadcast_to(lc[y:y + 1], (8, L)) for y in range(8)],
            axis=0)
        pred_v = jnp.concatenate([tc] * 8, axis=0)
        pl = _plane_lane(lc, tc, ccorner, 8)
        predc = jnp.where(cmode == 0, pred_dc,
                          jnp.where(cmode == 1, pred_h,
                                    jnp.where(cmode == 2, pred_v, pl)))
        if haspcm:
            predc = jnp.where(is_pcm, 0, predc)
        resc = res_chroma[ic * 64:(ic + 1) * 64]
        ctiles.append(jnp.clip(predc + resc, 0, 255))
    ctile = jnp.concatenate(ctiles, axis=0)          # [128, L]

    pmask = parsed > 0
    tile_out = jnp.where(pmask, tile_out, 0)
    ctile = jnp.where(pmask, ctile, 0)
    return tile_out, ctile


# ---------------------------------------------------------------------------
# XLA driver (vmap over batch + fori_loop over waves)


def _unpack_meta_t(meta_t):
    """meta_t [B, 32, L] -> per-field views (layout from pack_skewed).
    Scalar fields keep a singleton sublane dim: [B, 1, L]."""
    return {
        "kind": meta_t[:, 0:1],
        "parsed": meta_t[:, 1:2],
        "al": meta_t[:, 2:3] > 0,
        "at": meta_t[:, 3:4] > 0,
        "atl": meta_t[:, 4:5] > 0,
        "atr": meta_t[:, 5:6] > 0,
        "i16_mode": meta_t[:, 6:7],
        "cmode": meta_t[:, 7:8],
        "modes8": meta_t[:, 8:12],
        "modes4": meta_t[:, 12:28],
    }


_WAVE_VMAP = jax.vmap(
    lambda *a: wave_compute_lane(*a),
    in_axes=(0,) * 20)


def pack_lane(arrays, res, g):
    """pack_skewed output, transposed to lane-major wave slabs."""
    B = arrays["mb_kind"].shape[0]
    n_waves, maxw = g["skew_idx"].shape
    sk0 = pack_skewed(arrays, res, g)
    return {
        "meta": sk0["meta"].transpose(0, 1, 3, 2),
        "res_luma": sk0["res_luma"].reshape(
            B, n_waves, maxw, 256).transpose(0, 1, 3, 2),
        "res_chroma": sk0["res_chroma"].reshape(
            B, n_waves, maxw, 128).transpose(0, 1, 3, 2),
    }


def unskew_planes_lane(out_y, out_c, g):
    """out_y [B, W, 256, maxw] uint8, out_c [B, W, 128, maxw] ->
    (Y, Cb, Cr) raster planes via the wave engine's unskew."""
    B = out_y.shape[0]
    n_waves, maxw = g["skew_idx"].shape
    oy = out_y.transpose(0, 1, 3, 2).reshape(B, n_waves, maxw, 16, 16)
    oc = out_c.transpose(0, 1, 3, 2).reshape(B, n_waves, maxw, 16, 8)
    return unskew_planes(oy, oc, g)


def make_reconstruct_lane(wmb: int, hmb: int):
    """Build a jitted batched reconstructor for a fixed MB geometry."""
    g = skew_tables(wmb, hmb)
    g["wmb"], g["hmb"] = wmb, hmb
    n_waves, maxw = g["n_waves"], g["maxw"]
    cw2 = (wmb + 1) // 2
    ROWP = hmb + maxw
    BOTP = cw2 + maxw + 1

    r0s = jnp.asarray(g["r0"])
    c0s = jnp.asarray(g["c0"])

    def wave_body(w, state, sk):
        (out_y, out_c, row_y, row_c, bot_y, bot_c) = state
        B = row_y.shape[0]
        r0 = r0s[w]
        c0 = c0s[w]
        pc = c0 & 1
        half = c0 >> 1
        halfr = (c0 + 1) >> 1
        pr = 1 - pc

        rr0 = hmb - 1 - r0      # row state stored in reversed row order
        rs_y = jax.lax.dynamic_slice_in_dim(row_y, rr0, maxw, axis=2)
        rs_c = jax.lax.dynamic_slice_in_dim(row_c, rr0, maxw, axis=2)
        left_col = rs_y[:, :16]
        corner = rs_y[:, 16:17]
        left_c = rs_c[:, :16]
        corner_cb = rs_c[:, 16:17]
        corner_cr = rs_c[:, 17:18]

        def bot_slice(buf, par, start):
            two = jax.lax.dynamic_slice_in_dim(buf, start, maxw, axis=3)
            return jnp.where((par == 0), two[:, 0], two[:, 1])

        top_row = bot_slice(bot_y, pc, half)
        tr_row = bot_slice(bot_y, pr, halfr)
        top_c = bot_slice(bot_c, pc, half)

        meta = _unpack_meta_t(jax.lax.dynamic_slice_in_dim(
            sk["meta"], w, 1, axis=1)[:, 0])
        res_luma = jax.lax.dynamic_slice_in_dim(
            sk["res_luma"], w, 1, axis=1)[:, 0]
        res_chroma = jax.lax.dynamic_slice_in_dim(
            sk["res_chroma"], w, 1, axis=1)[:, 0]

        tile, ctile = _WAVE_VMAP(
            left_col, corner, top_row, tr_row, left_c, corner_cb,
            corner_cr, top_c, meta["kind"], meta["al"], meta["at"],
            meta["atl"], meta["atr"], meta["parsed"], meta["modes4"],
            meta["modes8"], meta["i16_mode"], meta["cmode"],
            res_luma, res_chroma)

        out_y = jax.lax.dynamic_update_slice_in_dim(
            out_y, tile[:, None].astype(jnp.uint8), w, axis=1)
        out_c = jax.lax.dynamic_update_slice_in_dim(
            out_c, ctile[:, None].astype(jnp.uint8), w, axis=1)

        upd = meta["parsed"] > 0                      # [B, 1, L]
        right_col = jnp.concatenate(
            [tile[:, y * 16 + 15:y * 16 + 16] for y in range(16)], axis=1)
        new_row = jnp.concatenate(
            [right_col, top_row[:, 15:16],
             jnp.zeros((B, 1, maxw), jnp.int32)], axis=1)
        row_y = jax.lax.dynamic_update_slice_in_dim(
            row_y, jnp.where(upd, new_row, rs_y), rr0, axis=2)
        cright = jnp.concatenate(
            [ctile[:, y * 8 + 7:y * 8 + 8] for y in range(16)], axis=1)
        new_rowc = jnp.concatenate(
            [cright, top_c[:, 7:8], top_c[:, 15:16]], axis=1)
        row_c = jax.lax.dynamic_update_slice_in_dim(
            row_c, jnp.where(upd, new_rowc, rs_c), rr0, axis=2)

        def bot_update(buf, newv, par, start, upd_mask):
            two = jax.lax.dynamic_slice_in_dim(buf, start, maxw, axis=3)
            old = jnp.where((par == 0), two[:, 0], two[:, 1])
            merged = jnp.where(upd_mask, newv, old)
            sel0 = (par == 0)
            new0 = jnp.where(sel0, merged, two[:, 0])
            new1 = jnp.where(sel0, two[:, 1], merged)
            return jax.lax.dynamic_update_slice_in_dim(
                buf, jnp.stack([new0, new1], axis=1), start, axis=3)

        bot_y = bot_update(bot_y, tile[:, 240:256], pc, half, upd)
        botc_new = jnp.concatenate(
            [ctile[:, 56:64], ctile[:, 120:128]], axis=1)
        bot_c = bot_update(bot_c, botc_new, pc, half, upd)

        return (out_y, out_c, row_y, row_c, bot_y, bot_c)

    def recon(arrays, ls4, ls8, cb_off, cr_off):
        res = build_residuals(arrays, ls4, ls8, cb_off, cr_off)
        B = arrays["mb_kind"].shape[0]
        sk = pack_lane(arrays, res, g)

        out_y = jnp.zeros((B, n_waves, 256, maxw), dtype=jnp.uint8)
        out_c = jnp.zeros((B, n_waves, 128, maxw), dtype=jnp.uint8)
        row_y = jnp.zeros((B, 18, ROWP), dtype=jnp.int32)
        row_c = jnp.zeros((B, 18, ROWP), dtype=jnp.int32)
        bot_y = jnp.zeros((B, 2, 16, BOTP), dtype=jnp.int32)
        bot_c = jnp.zeros((B, 2, 16, BOTP), dtype=jnp.int32)

        state = (out_y, out_c, row_y, row_c, bot_y, bot_c)
        state = jax.lax.fori_loop(
            0, n_waves, lambda w, s: wave_body(w, s, sk), state)
        return unskew_planes_lane(state[0], state[1], g)

    return jax.jit(recon)


_CACHE = {}


def reconstruct_frames_lane(packed: PackedFrames):
    key = (packed.wmb, packed.hmb)
    if key not in _CACHE:
        _CACHE[key] = make_reconstruct_lane(*key)
    fn = _CACHE[key]
    arrays = {k: jnp.asarray(v) for k, v in packed.arrays.items()}
    cb_off, cr_off = packed.chroma_qp_off
    return fn(arrays, jnp.asarray(packed.ls4), jnp.asarray(packed.ls8),
              cb_off, cr_off)
