"""Skewed-wavefront intra reconstruction — the fast TPU path.

The first engine (ops/recon.py) scatters every block into the frame plane;
XLA lowers those scatters serially on TPU (measured ~1 fps at 1080p).  This
engine eliminates ALL gathers/scatters from the wave loop:

  * macroblocks live in "skewed" space: wave w = 2*row + col, lane k
    ordered by ascending col.  Each wave's MBs form one contiguous row of
    a [n_waves, maxw, ...] buffer -> reads/writes are dynamic slices;
  * inter-MB dependencies flow through tiny boundary-state buffers:
      - row state  [hmb, 17]:  right column (16) + top-right corner (1)
        of the newest decoded MB in each MB row;
      - bottom state [2, cw2, 16]: bottom row of the newest decoded MB in
        each column, split by column parity so a wave's columns
        (which share parity) form a contiguous slab;
    and analogous chroma buffers;
  * within a wave the MB tile [B, maxw, 16, 16] is carried functionally
    through the 16/4/1 block sub-steps (static slices only);
  * directional prediction is one small integer matmul per sub-step:
    refs [lanes, S] x selection matrix [S, 9*n*n] (tap weights folded
    in), plus shift/round — MXU/VPU-friendly, no gather.

Bit-exact vs the oracle (enforced in tests/test_recon_jax.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models.h264.syntax import (KIND_I4x4, KIND_I8x8, KIND_I16x16,
                                  KIND_IPCM)
from ..models.h264.tables import BLK4x4_POS
from .predtables import PRED4, PRED8
from .recon import (PackedFrames, _TR4_CLASS, build_residuals,
                    _assemble_from_8x8)

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
    # inverse map for unskewing
    w_of = np.zeros(wmb * hmb, dtype=np.int32)
    k_of = np.zeros(wmb * hmb, dtype=np.int32)
    for r in range(hmb):
        for c in range(wmb):
            w = 2 * r + c
            k = (r0[w] - r)
            w_of[r * wmb + c] = w
            k_of[r * wmb + c] = k
    return {"n_waves": n_waves, "maxw": maxw,
            "r0": r0.astype(np.int32), "c0": c0.astype(np.int32),
            "skew_idx": skew_idx, "skew_valid": skew_valid,
            "w_of": w_of, "k_of": k_of}


# ---------------------------------------------------------------------------
# prediction selection matrices: refs layout s = [corner, top(2n), left(n)]

def _selection_matrix(tables, n):
    idx, w, rnd, shift = tables
    S = 1 + 2 * n + n
    M = np.zeros((S, 9 * n * n), dtype=np.int32)
    for m in range(9):
        for y in range(n):
            for x in range(n):
                col = (m * n + y) * n + x
                for t in range(3):
                    M[idx[m, y, x, t], col] += w[m, y, x, t]
    return (M, rnd.reshape(9, n, n).astype(np.int32),
            shift.reshape(9, n, n).astype(np.int32))


_SEL4 = _selection_matrix(PRED4, 4)
_SEL8 = _selection_matrix(PRED8, 8)

_BLK_X = [int(BLK4x4_POS[b][0]) for b in range(16)]
_BLK_Y = [int(BLK4x4_POS[b][1]) for b in range(16)]


def _predict(s, sel, mode, dc, n):
    """s: [B, L, S]; returns selected prediction [B, L, n, n]."""
    M, rnd, shift = sel
    acc = jnp.einsum("bls,sp->blp", s, jnp.asarray(M),
                     preferred_element_type=jnp.int32)
    pred9 = (acc.reshape(s.shape[0], s.shape[1], 9, n, n)
             + rnd) >> shift
    pred = jnp.take_along_axis(
        pred9, mode[..., None, None, None], axis=2)[:, :, 0]
    return jnp.where((mode == 2)[..., None, None], dc[..., None, None],
                     pred)


def _dc(sum_l, sum_t, al, at, n):
    log2n = n.bit_length() - 1
    return jnp.where(
        al & at, (sum_l + sum_t + n) >> (log2n + 1),
        jnp.where(al, (sum_l + n // 2) >> log2n,
                  jnp.where(at, (sum_t + n // 2) >> log2n, 128)))


def _plane(left, top, corner, n):
    """Plane prediction over [B, L, n] refs (spec 8.3.3.4 / 8.3.4.4)."""
    half = n // 2
    xs = np.arange(half)
    lo_t = jnp.where(jnp.asarray(xs == half - 1), corner[..., None],
                     top[..., np.clip(half - 2 - xs, 0, None)])
    hsum = ((xs + 1) * (top[..., half + xs] - lo_t)).sum(-1)
    lo_l = jnp.where(jnp.asarray(xs == half - 1), corner[..., None],
                     left[..., np.clip(half - 2 - xs, 0, None)])
    vsum = ((xs + 1) * (left[..., half + xs] - lo_l)).sum(-1)
    a = 16 * (left[..., n - 1] + top[..., n - 1])
    if n == 16:
        b = (5 * hsum + 32) >> 6
        c = (5 * vsum + 32) >> 6
    else:
        b = (17 * hsum + 16) >> 5
        c = (17 * vsum + 16) >> 5
    gy, gx = np.mgrid[0:n, 0:n]
    val = (a[..., None, None] + b[..., None, None] * (gx - (half - 1))
           + c[..., None, None] * (gy - (half - 1)) + 16) >> 5
    return jnp.clip(val, 0, 255)


def _filter8(left, top16, corner, al, at, ac):
    """Intra_8x8 reference filtering over [B, L, .] refs
    (spec 8.3.2.2.1)."""
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
# the engine


def make_reconstruct_wave(wmb: int, hmb: int, interpret=False):
    g = skew_tables(wmb, hmb)
    n_waves, maxw = g["n_waves"], g["maxw"]
    cw2 = (wmb + 1) // 2
    H, W = hmb * 16, wmb * 16
    nmb = wmb * hmb

    r0s = jnp.asarray(g["r0"])
    c0s = jnp.asarray(g["c0"])
    skew_idx = jnp.asarray(g["skew_idx"])          # [n_waves, maxw]
    skew_valid = jnp.asarray(g["skew_valid"])
    n_skew = n_waves * maxw

    # padded state sizes
    ROWP = hmb + maxw          # row-state rows, offset so slice start >= 0
    BOTP = cw2 + maxw + 1

    # unskew index: [hmb*wmb] -> skewed flat position
    unskew = jnp.asarray(g["w_of"].astype(np.int64) * maxw
                         + g["k_of"]).astype(jnp.int32)

    def skew_gather(x):
        """[B, nmb, ...] -> [B, n_waves*maxw, ...] (invalid lanes -> mb 0)."""
        flat_idx = skew_idx.reshape(-1)
        return x[:, flat_idx]

    def flags_of(arr):
        """Neighbor availability per skewed lane: [B, n_skew, 4] bool."""
        parsed = arr["parsed"] > 0
        sid = arr["slice_id"]
        m = skew_idx.reshape(-1)
        r = m // wmb
        c = m % wmb
        B = parsed.shape[0]

        def ok(mm, cond):
            mmc = jnp.clip(mm, 0, nmb - 1)
            return cond[None, :] & parsed[:, mmc] & (
                sid[:, mmc] == sid[:, m])

        al = ok(m - 1, c > 0)
        at = ok(m - wmb, r > 0)
        atl = ok(m - wmb - 1, (c > 0) & (r > 0))
        atr = ok(m - wmb + 1, (c < wmb - 1) & (r > 0))
        return jnp.stack([al, at, atl, atr], axis=-1)

    # ---------------- wave body ------------------------------------------

    def wave_body(w, state):
        (out_y, out_c, row_y, row_c, bot_y, bot_c, sk) = state
        B = row_y.shape[0]
        r0 = r0s[w]
        c0 = c0s[w]
        pc = c0 & 1
        half = c0 >> 1
        halfr = (c0 + 1) >> 1
        pr = 1 - pc

        # ---- slab reads -------------------------------------------------
        # row state: rows r0-k, k ascending -> slice [r0 .. r0+maxw) of the
        # padded buffer (data at offset maxw-1... we store row r at index
        # r + (maxw - 1) so start = r0 - (maxw-1) + (maxw-1) = r0) reversed
        rs_y = jax.lax.dynamic_slice_in_dim(row_y, r0, maxw, axis=1)
        rs_y = jnp.flip(rs_y, axis=1)          # lane k -> row r0-k
        rs_c = jax.lax.dynamic_slice_in_dim(row_c, r0, maxw, axis=1)
        rs_c = jnp.flip(rs_c, axis=1)
        left_col = rs_y[..., :16]               # [B, maxw, 16]
        corner = rs_y[..., 16]                  # [B, maxw]
        left_c = rs_c[..., :, :8]               # [B, maxw, 2, 8]
        corner_c = rs_c[..., :, 8]              # [B, maxw, 2]

        def bot_slice(buf, par, start):
            two = jax.lax.dynamic_slice_in_dim(buf, start, maxw, axis=2)
            return jnp.take_along_axis(
                two, par.reshape(1, 1, 1, *([1] * (two.ndim - 3))),
                axis=1)[:, 0]

        top_row = bot_slice(bot_y, pc, half)        # [B, maxw, 16]
        tr_row = bot_slice(bot_y, pr, halfr)        # [B, maxw, 16]
        top_c = bot_slice(bot_c, pc, half)          # [B, maxw, 2, 8]

        # ---- per-lane syntax (skewed, dynamic slice) --------------------
        def lane(name):
            return jax.lax.dynamic_slice_in_dim(
                sk[name], w * maxw, maxw, axis=1)

        kind = lane("kind")
        fl4 = lane("flags")                       # [B, maxw, 4] bool
        al, at, atl, atr = (fl4[..., 0], fl4[..., 1], fl4[..., 2],
                            fl4[..., 3])
        valid = skew_valid[w][None, :]

        left_col = jnp.where(al[..., None], left_col, 0)
        corner16 = jnp.where(atl, corner, 0)
        top_row_m = jnp.where(at[..., None], top_row, 0)
        tr_row_m = jnp.where(atr[..., None], tr_row, 0)
        left_c_m = jnp.where(al[..., None, None], left_c, 0)
        corner_c_m = jnp.where(atl[..., None], corner_c, 0)
        top_c_m = jnp.where(at[..., None, None], top_c, 0)

        tile = jnp.zeros((B, maxw, 16, 16), dtype=jnp.int32)

        # ---- I4x4: 16 static block steps --------------------------------
        modes4 = lane("modes4")
        r4 = lane("r4")
        is4 = kind == KIND_I4x4
        ones = jnp.ones_like(al)
        for b in range(16):
            bx, by = _BLK_X[b], _BLK_Y[b]
            # refs
            if bx == 0:
                l4 = left_col[..., by:by + 4]
                al_b = al
            else:
                l4 = tile[..., by:by + 4, bx - 1]
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
                t4 = tile[..., by - 1, bx:bx + 4]
                at_b = ones
                if _TR4_CLASS[b] == 1:
                    tr4 = tile[..., by - 1, bx + 4:bx + 8]
                    tr_b = ones
                else:
                    tr4 = jnp.broadcast_to(t4[..., 3:4], t4.shape)
                    tr_b = jnp.zeros_like(al)
                if bx == 0:
                    c4 = left_col[..., by - 1]
                    ac_b = al
                else:
                    c4 = tile[..., by - 1, bx - 1]
                    ac_b = ones
            l4 = jnp.where(al_b[..., None], l4, 0)
            t4 = jnp.where(at_b[..., None], t4, 0)
            tr4 = jnp.where(tr_b[..., None], tr4, t4[..., 3:4])
            tr4 = jnp.where(at_b[..., None], tr4, 0)
            c4 = jnp.where(ac_b, c4, 0)
            s = jnp.concatenate([c4[..., None], t4, tr4, l4], axis=-1)
            dc = _dc(l4.sum(-1), t4.sum(-1), al_b, at_b, 4)
            pred = _predict(s, _SEL4, modes4[..., b], dc, 4)
            out = jnp.clip(pred + r4[..., b, :, :], 0, 255)
            keep = is4[..., None, None]
            cur = tile[..., by:by + 4, bx:bx + 4]
            tile = tile.at[..., by:by + 4, bx:bx + 4].set(
                jnp.where(keep, out, cur))

        # ---- I8x8: 4 static block steps ---------------------------------
        modes8 = lane("modes8")
        r8 = lane("r8")
        is8 = kind == KIND_I8x8
        for b8 in range(4):
            bx, by = (b8 % 2) * 8, (b8 // 2) * 8
            if bx == 0:
                l8 = left_col[..., by:by + 8]
                al_b = al
            else:
                l8 = tile[..., by:by + 8, bx - 1]
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
                t8 = tile[..., by - 1, bx:bx + 8]
                at_b = ones
                if b8 == 2:
                    tr8 = tile[..., by - 1, 8:16]
                    tr_b = ones
                else:
                    tr8 = jnp.broadcast_to(t8[..., 7:8], t8.shape)
                    tr_b = jnp.zeros_like(al)
                if bx == 0:
                    c8 = left_col[..., by - 1]
                    ac_b = al
                else:
                    c8 = tile[..., by - 1, bx - 1]
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
            pred = _predict(s, _SEL8, modes8[..., b8], dc, 8)
            out = jnp.clip(pred + r8[..., b8, :, :], 0, 255)
            keep = is8[..., None, None]
            cur = tile[..., by:by + 8, bx:bx + 8]
            tile = tile.at[..., by:by + 8, bx:bx + 8].set(
                jnp.where(keep, out, cur))

        # ---- I16x16 / PCM ----------------------------------------------
        i16m = lane("i16_mode")
        res16 = lane("luma16_res")
        is_pcm = kind == KIND_IPCM
        is16 = (kind == KIND_I16x16) | is_pcm
        pred_v = jnp.broadcast_to(top_row_m[..., None, :],
                                  top_row_m.shape[:2] + (16, 16))
        pred_h = jnp.broadcast_to(left_col[..., :, None],
                                  left_col.shape[:2] + (16, 16))
        dc16 = _dc(left_col.sum(-1), top_row_m.sum(-1), al, at, 16)
        pl16 = _plane(left_col, top_row_m, corner16, 16)
        p16 = jnp.where((i16m == 0)[..., None, None], pred_v,
                        jnp.where((i16m == 1)[..., None, None], pred_h,
                                  jnp.where((i16m == 2)[..., None, None],
                                            dc16[..., None, None],
                                            pl16)))
        p16 = jnp.where(is_pcm[..., None, None], 0, p16)
        out16 = jnp.clip(p16 + res16, 0, 255)
        tile = jnp.where(is16[..., None, None], out16, tile)

        # ---- chroma -----------------------------------------------------
        cmode = lane("chroma_mode")
        resc = lane("chroma_res")                   # [B, maxw, 2, 8, 8]
        st = jnp.stack([top_c_m[..., :4].sum(-1),
                        top_c_m[..., 4:].sum(-1)], axis=-1)
        sl = jnp.stack([left_c_m[..., :4].sum(-1),
                        left_c_m[..., 4:].sum(-1)], axis=-1)

        def dcb(tsum, lsum, prefer):
            both = (tsum + lsum + 4) >> 3
            t_only = (tsum + 2) >> 2
            l_only = (lsum + 2) >> 2
            alx = al[..., None]
            atx = at[..., None]
            if prefer == "both":
                return jnp.where(alx & atx, both,
                                 jnp.where(atx, t_only,
                                           jnp.where(alx, l_only, 128)))
            if prefer == "top":
                return jnp.where(atx, t_only,
                                 jnp.where(alx, l_only, 128))
            return jnp.where(alx, l_only, jnp.where(atx, t_only, 128))

        d00 = dcb(st[..., 0], sl[..., 0], "both")
        d01 = dcb(st[..., 1], sl[..., 0], "top")
        d10 = dcb(st[..., 0], sl[..., 1], "left")
        d11 = dcb(st[..., 1], sl[..., 1], "both")

        def blk(v):
            return jnp.broadcast_to(v[..., None, None],
                                    v.shape + (4, 4))

        pred_dc = jnp.concatenate(
            [jnp.concatenate([blk(d00), blk(d01)], axis=-1),
             jnp.concatenate([blk(d10), blk(d11)], axis=-1)], axis=-2)
        pred_hc = jnp.broadcast_to(left_c_m[..., :, None],
                                   left_c_m.shape + (8,))
        pred_vc = jnp.broadcast_to(top_c_m[..., None, :],
                                   top_c_m.shape[:3] + (8, 8))
        plc = _plane(left_c_m, top_c_m, corner_c_m, 8)
        cm = cmode[..., None]
        predc = jnp.where((cm == 0)[..., None, None], pred_dc,
                          jnp.where((cm == 1)[..., None, None], pred_hc,
                                    jnp.where((cm == 2)[..., None, None],
                                              pred_vc, plc)))
        predc = jnp.where(is_pcm[..., None, None, None], 0, predc)
        ctile = jnp.clip(predc + resc, 0, 255)      # [B, maxw, 2, 8, 8]

        # ---- write outputs (contiguous slab per wave) -------------------
        parsed_lane = lane("parsed") > 0
        tile = jnp.where(parsed_lane[..., None, None], tile, 0)
        ctile = jnp.where(parsed_lane[..., None, None, None], ctile, 0)
        out_y = jax.lax.dynamic_update_slice_in_dim(
            out_y, tile.astype(jnp.uint8)[:, None], w, axis=1)
        out_c = jax.lax.dynamic_update_slice_in_dim(
            out_c, ctile.astype(jnp.uint8)[:, None], w, axis=1)

        # ---- state updates ----------------------------------------------
        upd = valid & (lane("parsed") > 0)
        # row state: right col + new corner (= top_row[15] of this MB)
        new_row = jnp.concatenate(
            [tile[..., :, 15], top_row[..., 15:16]], axis=-1)
        old_rs = jnp.flip(
            jax.lax.dynamic_slice_in_dim(row_y, r0, maxw, axis=1), 1)
        merged = jnp.where(upd[..., None], new_row, old_rs)
        row_y = jax.lax.dynamic_update_slice_in_dim(
            row_y, jnp.flip(merged, 1), r0, axis=1)
        new_rowc = jnp.concatenate(
            [ctile[..., :, :, 7], top_c[..., :, 7:8]], axis=-1)
        old_rc = jnp.flip(
            jax.lax.dynamic_slice_in_dim(row_c, r0, maxw, axis=1), 1)
        mergedc = jnp.where(upd[..., None, None], new_rowc, old_rc)
        row_c = jax.lax.dynamic_update_slice_in_dim(
            row_c, jnp.flip(mergedc, 1), r0, axis=1)

        # bottom state at parity pc, positions half + k
        def bot_update(buf, newv, par, start, upd_mask):
            two = jax.lax.dynamic_slice_in_dim(buf, start, maxw, axis=2)
            parb = par.reshape(1, 1, 1, *([1] * (two.ndim - 3)))
            old = jnp.take_along_axis(two, parb, axis=1)[:, 0]
            shape = [1] * old.ndim
            shape[1] = old.shape[1]
            mask = upd_mask.reshape(old.shape[0], old.shape[1],
                                    *([1] * (old.ndim - 2)))
            merged_ = jnp.where(mask, newv, old)
            sel = (jnp.arange(2).reshape(1, 2, *([1] * (two.ndim - 2)))
                   == parb)
            two_new = jnp.where(sel, merged_[:, None], two)
            return jax.lax.dynamic_update_slice_in_dim(
                buf, two_new, start, axis=2)

        bot_y = bot_update(bot_y, tile[..., 15, :], pc, half, upd)
        bot_c = bot_update(bot_c, ctile[..., :, 7, :], pc, half, upd)

        return (out_y, out_c, row_y, row_c, bot_y, bot_c, sk)

    # ---------------- driver ---------------------------------------------

    def recon(arrays, ls4, ls8, cb_off, cr_off):
        res = build_residuals(arrays, ls4, ls8, cb_off, cr_off)
        B = arrays["mb_kind"].shape[0]

        sk = {
            "kind": skew_gather(arrays["mb_kind"]),
            "parsed": skew_gather(arrays["parsed"]),
            "modes4": skew_gather(arrays["luma4x4_modes"]),
            "modes8": skew_gather(arrays["luma8x8_modes"]),
            "i16_mode": skew_gather(arrays["i16_mode"]),
            "chroma_mode": skew_gather(arrays["chroma_mode"]),
            "r4": skew_gather(res["r4"]),
            "r8": skew_gather(res["r8"]),
            "luma16_res": skew_gather(res["luma16_res"]),
            "chroma_res": skew_gather(res["chroma_res"]),
            "flags": flags_of(arrays)[:, :],
        }
        # flags are already in skewed order (flags_of uses skew_idx)

        out_y = jnp.zeros((B, n_waves, maxw, 16, 16), dtype=jnp.uint8)
        out_c = jnp.zeros((B, n_waves, maxw, 2, 8, 8), dtype=jnp.uint8)
        row_y = jnp.zeros((B, ROWP, 17), dtype=jnp.int32)
        row_c = jnp.zeros((B, ROWP, 2, 9), dtype=jnp.int32)
        bot_y = jnp.zeros((B, 2, BOTP, 16), dtype=jnp.int32)
        bot_c = jnp.zeros((B, 2, BOTP, 2, 8), dtype=jnp.int32)

        state = (out_y, out_c, row_y, row_c, bot_y, bot_c, sk)
        state = jax.lax.fori_loop(0, n_waves, wave_body, state)
        out_y, out_c = state[0], state[1]

        # unskew: [B, n_waves*maxw, 16, 16] -> [B, hmb, wmb, 16, 16]
        oy = out_y.reshape(B, n_skew, 16, 16)[:, unskew]
        oy = oy.reshape(B, hmb, wmb, 16, 16).transpose(0, 1, 3, 2, 4)
        Y = oy.reshape(B, H, W)
        oc = out_c.reshape(B, n_skew, 2, 8, 8)[:, unskew]
        oc = oc.reshape(B, hmb, wmb, 2, 8, 8).transpose(0, 3, 1, 4, 2, 5)
        C = oc.reshape(B, 2, H // 2, W // 2)
        return Y, C[:, 0], C[:, 1]

    # NOTE: row_y rows are stored at their natural index; dynamic_slice at
    # start r0 with length maxw reads rows [r0, r0+maxw), flipped so lane
    # k maps to r0-k... but lane k's row is r0-k which is BELOW r0.  The
    # store offset convention is handled by writing with the same
    # slice/flip, so reads and writes agree; rows outside [0, hmb) live in
    # the padding area and are never consumed by valid lanes.
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
