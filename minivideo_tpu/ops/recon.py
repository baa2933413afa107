"""Batched wavefront intra reconstruction (JAX, exact int32).

The TPU-native replacement for the reference's sequential per-macroblock
reconstruction (h264_intra_prediction.c + picture_construction, SURVEY §3.3):

  phase 1 — residuals: dequant + IDCT of every block of every MB of every
      frame in one batched pass (no spatial deps; ops/transform.py);
  phase 2 — wavefront: macroblocks are processed along anti-diagonals
      w = 2*row + col (left/top/top-right deps, the classic H.264
      wavefront); all MBs on a wave — across the whole batch — predict,
      add their residual, clip, and scatter in parallel.  Directional
      prediction is three static gathers + FMA via ops/predtables.py.

Everything is shape-static and branchless (masks select per-MB kind), so a
single jit compilation covers any stream with the same MB-grid geometry.
Bit-exactness vs the numpy oracle (models/h264/recon_np.py) is enforced in
tests/test_recon_jax.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..models.h264.syntax import (FrameSyntax, KIND_I4x4, KIND_I8x8,
                                  KIND_I16x16, KIND_IPCM)
from ..models.h264.tables import BLK4x4_POS, QPC_FROM_QPI
from .predtables import PRED4, PRED8
from .transform import (chroma_dc_transform, dequant_4x4, dequant_8x8,
                        idct_4x4, idct_8x8, level_scale_4x4_np,
                        level_scale_8x8_np, luma_dc_transform)

# ---------------------------------------------------------------------------
# static geometry tables


def wave_tables(wmb: int, hmb: int):
    """Anti-diagonal schedule: MBs with equal w = 2*row + col are
    dependency-free (deps: left w-1, top w-2, top-right w-1)."""
    n_waves = 2 * (hmb - 1) + wmb
    waves = [[] for _ in range(n_waves)]
    for r in range(hmb):
        for c in range(wmb):
            waves[2 * r + c].append(r * wmb + c)
    maxw = max(len(wv) for wv in waves)
    idx = np.zeros((n_waves, maxw), dtype=np.int32)
    valid = np.zeros((n_waves, maxw), dtype=bool)
    for i, wv in enumerate(waves):
        idx[i, :len(wv)] = wv
        valid[i, :len(wv)] = True
    return idx, valid


# top-right availability class per 4x4 block (see spec 8.3.1.2 neighbor
# derivation; decode-order analysis): 0=false, 1=true, 2=above MB,
# 3=above-right MB
_TR4_CLASS = np.zeros(16, dtype=np.int32)
for _b in range(16):
    _bx, _by = int(BLK4x4_POS[_b][0]), int(BLK4x4_POS[_b][1])
    if _by == 0:
        _TR4_CLASS[_b] = 3 if _bx == 12 else 2
    elif _bx == 12:
        _TR4_CLASS[_b] = 0
    else:
        # in-MB block containing (bx+4, by-4..by-1)
        from ..models.h264.spatial import _blk4x4_at
        _TR4_CLASS[_b] = 1 if _blk4x4_at(_bx + 4, _by - 4) < _b else 0

_TR8_CLASS = np.array([2, 3, 1, 0], dtype=np.int32)

# corner availability class per 4x4 block: 0=true(in-MB), 1=left MB,
# 2=above MB, 3=above-left MB
_AC4_CLASS = np.zeros(16, dtype=np.int32)
for _b in range(16):
    _bx, _by = int(BLK4x4_POS[_b][0]), int(BLK4x4_POS[_b][1])
    if _bx > 0 and _by > 0:
        _AC4_CLASS[_b] = 0
    elif _bx == 0 and _by > 0:
        _AC4_CLASS[_b] = 1
    elif _by == 0 and _bx > 0:
        _AC4_CLASS[_b] = 2
    else:
        _AC4_CLASS[_b] = 3

_AC8_CLASS = np.array([3, 2, 1, 0], dtype=np.int32)


# ---------------------------------------------------------------------------
# packing: FrameSyntax -> dense arrays


@dataclass
class PackedFrames:
    """Batch of parsed frames sharing one MB-grid geometry.

    slots=False: `arrays` holds raster-order coefficient buffers
    (luma_ac/luma8x8_coeff/chroma_ac/luma_dc/chroma_dc).  slots=True:
    they are replaced by skew-slot-ordered int16 slab records
    (luma_slab/chroma_slab/dc_slab; ops/slab.py layouts) as emitted by
    the native parser's slab mode."""
    wmb: int
    hmb: int
    arrays: dict          # name -> np/jnp array, leading dim = batch
    ls4: np.ndarray       # [3, 6, 4, 4] luma/Cb/Cr intra LevelScale
    ls8: np.ndarray       # [6, 8, 8]
    chroma_qp_off: tuple  # (cb_offset, cr_offset)
    slots: bool = False

    @property
    def batch(self) -> int:
        return self.arrays["mb_kind"].shape[0]


def pack_frames(frames, sps, pps) -> PackedFrames:
    """frames: list of (FrameSyntax, slice_of_mb) for one SPS/PPS config."""
    wmb = frames[0][0].width_mbs
    hmb = frames[0][0].height_mbs
    n = wmb * hmb

    def stack(get):
        return np.stack([get(fs, som) for fs, som in frames])

    arrays = {
        "mb_kind": stack(lambda fs, s: fs.mb_kind.astype(np.int32)),
        "qpy": stack(lambda fs, s: fs.qpy.astype(np.int32)),
        "i16_mode": stack(lambda fs, s: fs.i16_mode.astype(np.int32)),
        "chroma_mode": stack(lambda fs, s: fs.chroma_mode.astype(np.int32)),
        "luma4x4_modes": stack(
            lambda fs, s: fs.luma4x4_modes.astype(np.int32)),
        "luma8x8_modes": stack(
            lambda fs, s: fs.luma8x8_modes.astype(np.int32)),
        "luma_dc": stack(lambda fs, s: fs.luma_dc.astype(np.int32)),
        "luma8x8_coeff": stack(
            lambda fs, s: fs.luma8x8_coeff.astype(np.int32)),
        "chroma_dc": stack(lambda fs, s: fs.chroma_dc.astype(np.int32)),
        "chroma_ac": stack(lambda fs, s: _chroma_ac_with_pcm(fs)),
        "luma_ac": stack(lambda fs, s: _luma_ac_with_pcm(fs)),
        "parsed": stack(lambda fs, s: fs.parsed.astype(np.int32)),
        "slice_id": stack(
            lambda fs, s: (s if s is not None
                           else np.zeros(n, np.int32)).astype(np.int32)),
    }
    ls4 = np.stack([level_scale_4x4_np(pps.scaling_list_4x4[i])
                    for i in range(3)])
    ls8 = level_scale_8x8_np(pps.scaling_list_8x8[0])
    return PackedFrames(wmb, hmb, arrays, ls4, ls8,
                        (pps.chroma_qp_index_offset,
                         pps.second_chroma_qp_index_offset))


def make_frame_staging(wmb: int, hmb: int, batch: int) -> dict:
    """Preallocated batched coefficient buffers the native entropy parser
    writes into DIRECTLY (via syntax_into), so packing a batch never
    copies the large arrays.  np.zeros maps lazy zero pages, so the
    parser's sparse coefficient writes are the only memory traffic."""
    n = wmb * hmb
    B = batch
    return {
        "luma_dc": np.zeros((B, n, 4, 4), np.int32),
        "luma_ac": np.zeros((B, n, 16, 4, 4), np.int32),
        "luma8x8_coeff": np.zeros((B, n, 4, 8, 8), np.int32),
        "chroma_dc": np.zeros((B, n, 2, 2, 2), np.int32),
        "chroma_ac": np.zeros((B, n, 2, 4, 4, 4), np.int32),
    }


_STAGED = ("luma_dc", "luma_ac", "luma8x8_coeff", "chroma_dc", "chroma_ac")


def syntax_into(staging: dict, i: int, wmb: int, hmb: int) -> FrameSyntax:
    """A FrameSyntax whose large coefficient buffers alias staging[i]."""
    fs = FrameSyntax(wmb, hmb)
    for name in _STAGED:
        view = staging[name][i]
        assert view.flags["C_CONTIGUOUS"]
        setattr(fs, name, view)
    return fs


def pack_frames_staged(staging: dict, frames, sps, pps) -> PackedFrames:
    """pack_frames for frames parsed via syntax_into: the coefficient
    arrays are the staging buffers themselves (zero copies); only the
    small per-MB metadata arrays are stacked."""
    wmb = frames[0][0].width_mbs
    hmb = frames[0][0].height_mbs
    n = wmb * hmb

    def stack(get):
        return np.stack([get(fs, som) for fs, som in frames])

    for fs, _ in frames:
        assert not fs.pcm_y, "PCM frames need the copying pack_frames path"
    arrays = {
        "mb_kind": stack(lambda fs, s: np.asarray(fs.mb_kind, np.int32)),
        "qpy": stack(lambda fs, s: np.asarray(fs.qpy, np.int32)),
        "i16_mode": stack(lambda fs, s: np.asarray(fs.i16_mode, np.int32)),
        "chroma_mode": stack(
            lambda fs, s: np.asarray(fs.chroma_mode, np.int32)),
        "luma4x4_modes": stack(
            lambda fs, s: np.asarray(fs.luma4x4_modes, np.int32)),
        "luma8x8_modes": stack(
            lambda fs, s: np.asarray(fs.luma8x8_modes, np.int32)),
        "parsed": stack(lambda fs, s: np.asarray(fs.parsed, np.int32)),
        "slice_id": stack(
            lambda fs, s: np.asarray(
                s if s is not None else np.zeros(n, np.int32), np.int32)),
    }
    B = len(frames)
    for name in _STAGED:
        arrays[name] = staging[name][:B]
    ls4 = np.stack([level_scale_4x4_np(pps.scaling_list_4x4[i])
                    for i in range(3)])
    ls8 = level_scale_8x8_np(pps.scaling_list_8x8[0])
    return PackedFrames(wmb, hmb, arrays, ls4, ls8,
                        (pps.chroma_qp_index_offset,
                         pps.second_chroma_qp_index_offset))


def make_slab_staging(wmb: int, hmb: int, batch: int) -> dict:
    """Slot-ordered int16 slab staging for the native parser's slab mode
    (one record per skew slot w*maxw + k; ops/slab.py layouts).  Like
    make_frame_staging, np.zeros maps lazy zero pages, so padding slots
    cost no memory traffic."""
    from .recon_wave import skew_tables
    g = skew_tables(wmb, hmb)
    n_slots = g["n_waves"] * g["maxw"]
    B = batch
    return {
        "luma_slab": np.zeros((B, n_slots, 256), np.int16),
        "chroma_slab": np.zeros((B, n_slots, 128), np.int16),
        "dc_slab": np.zeros((B, n_slots, 32), np.int16),
        "maxw": g["maxw"],
    }


def pack_frames_slots(staging: dict, frames, sps, pps) -> PackedFrames:
    """pack_frames for frames parsed via parse_slice_native_slab: the
    coefficient slabs are the staging buffers themselves; only the small
    per-MB metadata arrays are stacked."""
    wmb = frames[0][0].width_mbs
    hmb = frames[0][0].height_mbs
    n = wmb * hmb

    def stack(get):
        return np.stack([get(fs, som) for fs, som in frames])

    arrays = {
        "mb_kind": stack(lambda fs, s: np.asarray(fs.mb_kind, np.int32)),
        "qpy": stack(lambda fs, s: np.asarray(fs.qpy, np.int32)),
        "i16_mode": stack(lambda fs, s: np.asarray(fs.i16_mode, np.int32)),
        "chroma_mode": stack(
            lambda fs, s: np.asarray(fs.chroma_mode, np.int32)),
        "luma4x4_modes": stack(
            lambda fs, s: np.asarray(fs.luma4x4_modes, np.int32)),
        "luma8x8_modes": stack(
            lambda fs, s: np.asarray(fs.luma8x8_modes, np.int32)),
        "parsed": stack(lambda fs, s: np.asarray(fs.parsed, np.int32)),
        "slice_id": stack(
            lambda fs, s: np.asarray(
                s if s is not None else np.zeros(n, np.int32), np.int32)),
    }
    B = len(frames)
    for name in ("luma_slab", "chroma_slab", "dc_slab"):
        arrays[name] = staging[name][:B]
    ls4 = np.stack([level_scale_4x4_np(pps.scaling_list_4x4[i])
                    for i in range(3)])
    ls8 = level_scale_8x8_np(pps.scaling_list_8x8[0])
    return PackedFrames(wmb, hmb, arrays, ls4, ls8,
                        (pps.chroma_qp_index_offset,
                         pps.second_chroma_qp_index_offset), slots=True)


def _luma_ac_with_pcm(fs: FrameSyntax) -> np.ndarray:
    """PCM raw luma rides in the (otherwise unused) coefficient buffer."""
    a = fs.luma_ac.astype(np.int32).copy()
    if fs.pcm_y:
        flat = a.reshape(a.shape[0], 16, 16)
        for mb, pix in fs.pcm_y.items():
            flat[mb] = pix
    return a


def _chroma_ac_with_pcm(fs: FrameSyntax) -> np.ndarray:
    a = fs.chroma_ac.astype(np.int32).copy()
    if fs.pcm_cb:
        flat = a.reshape(a.shape[0], 2, 8, 8)
        for mb, pix in fs.pcm_cb.items():
            flat[mb, 0] = pix
        for mb, pix in fs.pcm_cr.items():
            flat[mb, 1] = pix
    return a


# ---------------------------------------------------------------------------
# phase 1: residuals


def _assemble_16x16(blocks):
    """[..., 16, 4, 4] in luma4x4BlkIdx order -> [..., 16, 16]."""
    lead = blocks.shape[:-3]
    b = blocks.reshape(lead + (2, 2, 2, 2, 4, 4))
    # index order: (y8, x8, y4, x4, py, px) -> rows y8,y4,py; cols x8,x4,px
    b = jnp.moveaxis(b, (-6, -4, -2, -5, -3, -1),
                     (-6, -5, -4, -3, -2, -1))
    return b.reshape(lead + (16, 16))


def _assemble_from_8x8(blocks):
    """[..., 4, 8, 8] raster -> [..., 16, 16]."""
    lead = blocks.shape[:-3]
    b = blocks.reshape(lead + (2, 2, 8, 8))
    b = jnp.moveaxis(b, (-4, -2, -3, -1), (-4, -3, -2, -1))
    return b.reshape(lead + (16, 16))


def _assemble_8x8_from_4(blocks):
    """[..., 4, 4, 4] raster -> [..., 8, 8]."""
    lead = blocks.shape[:-3]
    b = blocks.reshape(lead + (2, 2, 4, 4))
    b = jnp.moveaxis(b, (-4, -2, -3, -1), (-4, -3, -2, -1))
    return b.reshape(lead + (8, 8))


_BLK_ROW = jnp.asarray(BLK4x4_POS[:, 1] // 4)   # luma4x4BlkIdx -> dc row
_BLK_COL = jnp.asarray(BLK4x4_POS[:, 0] // 4)

_QPC_TAB = jnp.asarray(QPC_FROM_QPI)


def build_residuals(arr, ls4, ls8, cb_off, cr_off):
    """Phase 1: fully-batched residual construction.

    Returns dict with r4 [B,n,16,4,4], r8 [B,n,4,8,8],
    luma16_res [B,n,16,16], chroma_res [B,n,2,8,8]."""
    kind = arr["mb_kind"]                       # [B, n]
    qp = arr["qpy"]
    B, n = kind.shape

    ls4 = jnp.asarray(ls4)
    ls8 = jnp.asarray(ls8)

    # Components-first layout throughout ([blk_h, blk_w, N], N on lanes):
    # the natural [..., 4, 4] layouts put the tiny block dims on the TPU
    # (sublane, lane) tiling and run the VPU at ~2% width.
    from .transform import (dequant_4x4_t, dequant_8x8_t, idct_4x4_t,
                            idct_8x8_t, from_comp_first, to_comp_first)

    # luma 4x4 blocks
    qp16 = jnp.broadcast_to(qp[..., None], (B, n, 16)).reshape(-1)
    c4t, _ = to_comp_first(arr["luma_ac"].astype(jnp.int32), 4, 4)
    d4t = dequant_4x4_t(c4t, qp16, ls4[0])
    dc = luma_dc_transform(arr["luma_dc"], qp, ls4[0])       # [B,n,4,4]
    dc_per_blk = dc[..., _BLK_ROW, _BLK_COL].reshape(-1)     # [B*n*16]
    is16 = jnp.broadcast_to((kind == KIND_I16x16)[..., None],
                            (B, n, 16)).reshape(-1)
    d4t = d4t.at[0, 0].set(jnp.where(is16, dc_per_blk, d4t[0, 0]))
    r4 = from_comp_first(idct_4x4_t(d4t), (B, n, 16), 4, 4)

    # luma 8x8 blocks
    qp4 = jnp.broadcast_to(qp[..., None], (B, n, 4)).reshape(-1)
    c8t, _ = to_comp_first(arr["luma8x8_coeff"].astype(jnp.int32), 8, 8)
    r8 = from_comp_first(idct_8x8_t(dequant_8x8_t(c8t, qp4, ls8)),
                         (B, n, 4), 8, 8)

    # assembled luma residual for I16x16 / PCM
    pcm_luma = arr["luma_ac"].reshape(B, n, 16, 16)
    luma16_res = jnp.where((kind == KIND_IPCM)[..., None, None],
                           pcm_luma, _assemble_16x16(r4))

    # chroma
    chroma_parts = []
    blk_r = jnp.array([0, 0, 1, 1])
    blk_c = jnp.array([0, 1, 0, 1])
    for ic, off in enumerate((cb_off, cr_off)):
        qpc = _QPC_TAB[jnp.clip(qp + off, 0, 51)]            # [B,n]
        qpc4 = jnp.broadcast_to(qpc[..., None], (B, n, 4)).reshape(-1)
        dci = chroma_dc_transform(arr["chroma_dc"][:, :, ic], qpc,
                                  ls4[1 + ic])               # [B,n,2,2]
        cct, _ = to_comp_first(arr["chroma_ac"][:, :, ic].astype(jnp.int32),
                               4, 4)
        dcht = dequant_4x4_t(cct, qpc4, ls4[1 + ic])
        d00c = dci[..., blk_r, blk_c].reshape(-1)            # [B*n*4]
        dcht = dcht.at[0, 0].set(d00c)
        rc4 = from_comp_first(idct_4x4_t(dcht), (B, n, 4), 4, 4)
        chroma_parts.append(_assemble_8x8_from_4(rc4))       # [B,n,8,8]
    chroma_res = jnp.stack(chroma_parts, axis=2)             # [B,n,2,8,8]
    pcm_chroma = arr["chroma_ac"].reshape(B, n, 2, 8, 8)
    chroma_res = jnp.where((kind == KIND_IPCM)[..., None, None, None],
                           pcm_chroma, chroma_res)

    return {"r4": r4, "r8": r8, "luma16_res": luma16_res,
            "chroma_res": chroma_res}


# ---------------------------------------------------------------------------
# phase 2: wavefront prediction + reconstruction

_P4_IDX = jnp.asarray(PRED4[0])
_P4_W = jnp.asarray(PRED4[1])
_P4_RND = jnp.asarray(PRED4[2])
_P4_SH = jnp.asarray(PRED4[3])
_P8_IDX = jnp.asarray(PRED8[0])
_P8_W = jnp.asarray(PRED8[1])
_P8_RND = jnp.asarray(PRED8[2])
_P8_SH = jnp.asarray(PRED8[3])


def _gather(plane, rows, cols):
    h, w = plane.shape
    return plane[jnp.clip(rows, 0, h - 1), jnp.clip(cols, 0, w - 1)]


def _masked_scatter(plane, rows, cols, values, mask):
    """Scatter values for lanes where mask is set.  Masked-out lanes are
    routed out of bounds and dropped — they must not write at all, since
    padded wave lanes alias real macroblock positions."""
    h = plane.shape[0]
    rows = jnp.where(mask[:, None, None], rows, h)
    return plane.at[rows, cols].set(values, mode="drop")


def _directional(s, tabs):
    """s: [W, S] refs; tabs: (idx, w, rnd, shift) -> [W, 9, n, n]."""
    idx, w, rnd, sh = tabs
    taps = s[:, idx]                      # [W, 9, n, n, 3]
    acc = (taps * w).sum(-1) + rnd
    return acc >> sh


def _dc_value(sum_l, sum_t, al, at, n):
    """DC prediction value with availability fallbacks (spec 8.3.1.2.3 /
    8.3.2.2.4 / 8.3.3.3 for n = 4 / 8 / 16)."""
    log2n = n.bit_length() - 1
    both = (sum_l + sum_t + n) >> (log2n + 1)
    only_l = (sum_l + n // 2) >> log2n
    only_t = (sum_t + n // 2) >> log2n
    return jnp.where(al & at, both,
                     jnp.where(al, only_l,
                               jnp.where(at, only_t, 128)))


def _plane_pred(left, top, corner, n):
    """Plane prediction (8.3.3.4 / 8.3.4.4).  left/top [W, n], corner [W]."""
    half = n // 2
    xs = jnp.arange(half)
    lo_t = jnp.where(xs == half - 1, corner[:, None],
                     top[:, jnp.clip(half - 2 - xs, 0)])
    hsum = ((xs + 1) * (top[:, half + xs] - lo_t)).sum(-1)
    lo_l = jnp.where(xs == half - 1, corner[:, None],
                     left[:, jnp.clip(half - 2 - xs, 0)])
    vsum = ((xs + 1) * (left[:, half + xs] - lo_l)).sum(-1)
    a = 16 * (left[:, n - 1] + top[:, n - 1])
    if n == 16:
        b = (5 * hsum + 32) >> 6
        c = (5 * vsum + 32) >> 6
    else:
        b = (17 * hsum + 16) >> 5
        c = (17 * vsum + 16) >> 5
    gy, gx = jnp.mgrid[0:n, 0:n]
    val = (a[:, None, None] + b[:, None, None] * (gx - (half - 1))
           + c[:, None, None] * (gy - (half - 1)) + 16) >> 5
    return jnp.clip(val, 0, 255)


def _filter_8x8(left, top, corner, al, at, ac):
    """Reference sample filtering for Intra_8x8 (spec 8.3.2.2.1).
    left [W,8], top [W,16] (tr already substituted), corner [W]."""
    t_m1 = jnp.where(ac[:, None], corner[:, None], 0)
    tp = jnp.concatenate([t_m1, top], axis=1)        # t[-1..15] at +1
    ft_mid = (tp[:, :-2] + 2 * tp[:, 1:-1] + tp[:, 2:] + 2) >> 2  # x=0..13
    ft0 = jnp.where(ac, (corner + 2 * top[:, 0] + top[:, 1] + 2) >> 2,
                    (3 * top[:, 0] + top[:, 1] + 2) >> 2)
    ft15 = (top[:, 14] + 3 * top[:, 15] + 2) >> 2
    ft = jnp.concatenate([ft0[:, None], ft_mid[:, 1:], ft15[:, None]],
                         axis=1)
    ft = jnp.where(at[:, None], ft, top)

    fc = jnp.where(at & al, (top[:, 0] + 2 * corner + left[:, 0] + 2) >> 2,
                   jnp.where(at, (3 * corner + top[:, 0] + 2) >> 2,
                             jnp.where(al,
                                       (3 * corner + left[:, 0] + 2) >> 2,
                                       corner)))
    fc = jnp.where(ac, fc, corner)

    l_m1 = jnp.where(ac[:, None], corner[:, None], 0)
    lp = jnp.concatenate([l_m1, left], axis=1)
    fl_mid = (lp[:, :-2] + 2 * lp[:, 1:-1] + lp[:, 2:] + 2) >> 2  # y=0..6
    fl0 = jnp.where(ac, (corner + 2 * left[:, 0] + left[:, 1] + 2) >> 2,
                    (3 * left[:, 0] + left[:, 1] + 2) >> 2)
    fl7 = (left[:, 6] + 3 * left[:, 7] + 2) >> 2
    fl = jnp.concatenate([fl0[:, None], fl_mid[:, 1:], fl7[:, None]],
                         axis=1)
    fl = jnp.where(al[:, None], fl, left)
    return fl, ft, fc



_TR4 = jnp.asarray(_TR4_CLASS)
_AC4 = jnp.asarray(_AC4_CLASS)
_TR8 = jnp.asarray(_TR8_CLASS)
_AC8 = jnp.asarray(_AC8_CLASS)
_BLK_X = jnp.asarray(BLK4x4_POS[:, 0])
_BLK_Y = jnp.asarray(BLK4x4_POS[:, 1])


def mb_flags(arr, m, wmb, hmb):
    """Availability of A/B/C/D neighbor MBs for MB indices m [W]."""
    parsed = arr["parsed"]
    sid = arr["slice_id"]
    r = m // wmb
    c = m % wmb
    my_sid = sid[m]

    def ok(mm, cond):
        mmc = jnp.clip(mm, 0, wmb * hmb - 1)
        return cond & (parsed[mmc] > 0) & (sid[mmc] == my_sid)

    al = ok(m - 1, c > 0)
    at = ok(m - wmb, r > 0)
    atl = ok(m - wmb - 1, (c > 0) & (r > 0))
    atr = ok(m - wmb + 1, (c < wmb - 1) & (r > 0))
    return r, c, al, at, atl, atr


def luma4_step(Y, arr, res, m, valid, flags, b):
    # `b` is a traced loop index (0..15); all block-dependent structure
    # is table lookups so the 16 steps share one compiled body
    r, c, al, at, atl, atr = flags
    bx, by = _BLK_X[b], _BLK_Y[b]
    x0 = c * 16 + bx
    y0 = r * 16 + by
    ones = jnp.ones_like(al)
    zeros = jnp.zeros_like(al)
    al_b = jnp.where(bx == 0, al, ones)
    at_b = jnp.where(by == 0, at, ones)
    ac_b = jnp.stack([ones, al, at, atl])[_AC4[b]]
    tr_b = jnp.stack([zeros, ones, at, atr])[_TR4[b]]

    rows_l = y0[:, None] + jnp.arange(4)
    left = _gather(Y, rows_l, (x0 - 1)[:, None])
    left = jnp.where(al_b[:, None], left, 0)
    topc = _gather(Y, (y0 - 1)[:, None],
                   (x0 - 1)[:, None] + jnp.arange(9))
    corner = jnp.where(ac_b, topc[:, 0], 0)
    top_m = jnp.where(at_b[:, None], topc[:, 1:5], 0)
    tr = jnp.where(tr_b[:, None], topc[:, 5:9], top_m[:, 3:4])
    tr = jnp.where(at_b[:, None], tr, 0)

    s = jnp.concatenate([corner[:, None], top_m, tr, left], axis=1)
    pred9 = _directional(s, (_P4_IDX, _P4_W, _P4_RND, _P4_SH))
    mode = arr["luma4x4_modes"][m, b]
    pred = jnp.take_along_axis(
        pred9, mode[:, None, None, None], axis=1)[:, 0]
    dc = _dc_value(left.sum(-1), top_m.sum(-1), al_b, at_b, 4)
    pred = jnp.where((mode == 2)[:, None, None],
                     dc[:, None, None], pred)
    out = jnp.clip(pred + res["r4"][m, b], 0, 255)
    mask = valid & (arr["mb_kind"][m] == KIND_I4x4)
    rows = y0[:, None, None] + jnp.arange(4)[None, :, None]
    cols = x0[:, None, None] + jnp.arange(4)[None, None, :]
    return _masked_scatter(Y, rows, cols, out, mask)


def luma8_step(Y, arr, res, m, valid, flags, b8):
    # `b8` is a traced loop index (0..3)
    r, c, al, at, atl, atr = flags
    bx, by = (b8 % 2) * 8, (b8 // 2) * 8
    x0 = c * 16 + bx
    y0 = r * 16 + by
    ones = jnp.ones_like(al)
    zeros = jnp.zeros_like(al)
    al_b = jnp.where(bx == 0, al, ones)
    at_b = jnp.where(by == 0, at, ones)
    ac_b = jnp.stack([ones, al, at, atl])[_AC8[b8]]
    tr_b = jnp.stack([zeros, ones, at, atr])[_TR8[b8]]

    rows_l = y0[:, None] + jnp.arange(8)
    left = _gather(Y, rows_l, (x0 - 1)[:, None])
    left = jnp.where(al_b[:, None], left, 0)
    topc = _gather(Y, (y0 - 1)[:, None],
                   (x0 - 1)[:, None] + jnp.arange(17))
    corner = jnp.where(ac_b, topc[:, 0], 0)
    top_m = jnp.where(at_b[:, None], topc[:, 1:9], 0)
    tr = jnp.where(tr_b[:, None], topc[:, 9:17], top_m[:, 7:8])
    tr = jnp.where(at_b[:, None], tr, 0)
    top16 = jnp.concatenate([top_m, tr], axis=1)

    fl, ft, fc = _filter_8x8(left, top16, corner, al_b, at_b, ac_b)
    s = jnp.concatenate([fc[:, None], ft, fl], axis=1)
    pred9 = _directional(s, (_P8_IDX, _P8_W, _P8_RND, _P8_SH))
    mode = arr["luma8x8_modes"][m, b8]
    pred = jnp.take_along_axis(
        pred9, mode[:, None, None, None], axis=1)[:, 0]
    dc = _dc_value(fl.sum(-1), ft[:, :8].sum(-1), al_b, at_b, 8)
    pred = jnp.where((mode == 2)[:, None, None],
                     dc[:, None, None], pred)
    out = jnp.clip(pred + res["r8"][m, b8], 0, 255)
    mask = valid & (arr["mb_kind"][m] == KIND_I8x8)
    rows = y0[:, None, None] + jnp.arange(8)[None, :, None]
    cols = x0[:, None, None] + jnp.arange(8)[None, None, :]
    return _masked_scatter(Y, rows, cols, out, mask)

def luma16_step(Y, arr, res, m, valid, flags):
    r, c, al, at, atl, atr = flags
    x0 = c * 16
    y0 = r * 16
    rows_l = y0[:, None] + jnp.arange(16)
    left = _gather(Y, rows_l, (x0 - 1)[:, None])
    left = jnp.where(al[:, None], left, 0)
    top = _gather(Y, (y0 - 1)[:, None], x0[:, None] + jnp.arange(16))
    top = jnp.where(at[:, None], top, 0)
    corner = jnp.where(atl, _gather(Y, y0 - 1, x0 - 1), 0)

    mode = arr["i16_mode"][m]
    pred_v = jnp.broadcast_to(top[:, None, :], top.shape[:1] + (16, 16))
    pred_h = jnp.broadcast_to(left[:, :, None], left.shape[:1] + (16, 16))
    dc = _dc_value(left.sum(-1), top.sum(-1), al, at, 16)[:, None, None]
    pl = _plane_pred(left, top, corner, 16)
    pred = jnp.where((mode == 0)[:, None, None], pred_v,
                     jnp.where((mode == 1)[:, None, None], pred_h,
                               jnp.where((mode == 2)[:, None, None],
                                         jnp.broadcast_to(dc, pl.shape),
                                         pl)))
    is_pcm = arr["mb_kind"][m] == KIND_IPCM
    pred = jnp.where(is_pcm[:, None, None], 0, pred)
    out = jnp.clip(pred + res["luma16_res"][m], 0, 255)
    mask = valid & ((arr["mb_kind"][m] == KIND_I16x16) | is_pcm)
    rows = y0[:, None, None] + jnp.arange(16)[None, :, None]
    cols = x0[:, None, None] + jnp.arange(16)[None, None, :]
    return _masked_scatter(Y, rows, cols, out, mask)

def chroma_step(P, arr, res, m, valid, flags, ic):
    r, c, al, at, atl, atr = flags
    x0 = c * 8
    y0 = r * 8
    rows_l = y0[:, None] + jnp.arange(8)
    left = _gather(P, rows_l, (x0 - 1)[:, None])
    left = jnp.where(al[:, None], left, 0)
    top = _gather(P, (y0 - 1)[:, None], x0[:, None] + jnp.arange(8))
    top = jnp.where(at[:, None], top, 0)
    corner = jnp.where(atl, _gather(P, y0 - 1, x0 - 1), 0)

    mode = arr["chroma_mode"][m]
    # DC per 2x2 sub-block grid (spec 8.3.4.1)
    st = jnp.stack([top[:, :4].sum(-1), top[:, 4:].sum(-1)], axis=1)
    sl = jnp.stack([left[:, :4].sum(-1), left[:, 4:].sum(-1)], axis=1)

    def dc_block(tsum, lsum, prefer):
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

    d00 = dc_block(st[:, 0], sl[:, 0], "both")
    d01 = dc_block(st[:, 1], sl[:, 0], "top")
    d10 = dc_block(st[:, 0], sl[:, 1], "left")
    d11 = dc_block(st[:, 1], sl[:, 1], "both")
    dtop = jnp.concatenate(
        [jnp.broadcast_to(d00[:, None, None], d00.shape + (4, 4)),
         jnp.broadcast_to(d01[:, None, None], d01.shape + (4, 4))],
        axis=2)
    dbot = jnp.concatenate(
        [jnp.broadcast_to(d10[:, None, None], d10.shape + (4, 4)),
         jnp.broadcast_to(d11[:, None, None], d11.shape + (4, 4))],
        axis=2)
    pred_dc = jnp.concatenate([dtop, dbot], axis=1)

    pred_h = jnp.broadcast_to(left[:, :, None], left.shape[:1] + (8, 8))
    pred_v = jnp.broadcast_to(top[:, None, :], top.shape[:1] + (8, 8))
    pl = _plane_pred(left, top, corner, 8)
    pred = jnp.where((mode == 0)[:, None, None], pred_dc,
                     jnp.where((mode == 1)[:, None, None], pred_h,
                               jnp.where((mode == 2)[:, None, None],
                                         pred_v, pl)))
    is_pcm = arr["mb_kind"][m] == KIND_IPCM
    pred = jnp.where(is_pcm[:, None, None], 0, pred)
    out = jnp.clip(pred + res["chroma_res"][m, ic], 0, 255)
    mask = valid & (arr["parsed"][m] > 0)
    rows = y0[:, None, None] + jnp.arange(8)[None, :, None]
    cols = x0[:, None, None] + jnp.arange(8)[None, None, :]
    return _masked_scatter(P, rows, cols, out, mask)



def make_reconstruct(wmb: int, hmb: int):
    """Build a jitted (batched) frame reconstructor for a fixed geometry."""
    widx_np, wvalid_np = wave_tables(wmb, hmb)
    widx = jnp.asarray(widx_np)
    wvalid = jnp.asarray(wvalid_np)
    n_waves, maxw = widx_np.shape
    H, W = hmb * 16, wmb * 16

    def recon_one(arr, res):
        Y0 = jnp.zeros((H, W), dtype=jnp.int32)
        C0 = jnp.zeros((2, H // 2, W // 2), dtype=jnp.int32)

        def wave_body(w, planes):
            Y, C = planes
            m = widx[w]
            valid = wvalid[w]
            flags = mb_flags(arr, m, wmb, hmb)
            Y = jax.lax.fori_loop(
                0, 16, lambda b, y: luma4_step(y, arr, res, m, valid,
                                               flags, b), Y)
            Y = jax.lax.fori_loop(
                0, 4, lambda b8, y: luma8_step(y, arr, res, m, valid,
                                               flags, b8), Y)
            Y = luma16_step(Y, arr, res, m, valid, flags)
            cb = chroma_step(C[0], arr, res, m, valid, flags, 0)
            cr = chroma_step(C[1], arr, res, m, valid, flags, 1)
            return Y, jnp.stack([cb, cr])

        Y, C = jax.lax.fori_loop(0, n_waves, wave_body, (Y0, C0))
        return (Y.astype(jnp.uint8), C[0].astype(jnp.uint8),
                C[1].astype(jnp.uint8))

    @jax.jit
    def recon_batch(arrays, ls4, ls8, cb_off, cr_off):
        res = build_residuals(arrays, ls4, ls8, cb_off, cr_off)
        return jax.vmap(recon_one)(arrays, res)

    return recon_batch


_RECON_CACHE = {}


def reconstruct_frames(packed: PackedFrames):
    """Decode a PackedFrames batch -> (Y [B,H,W], Cb, Cr) uint8."""
    key = (packed.wmb, packed.hmb)
    if key not in _RECON_CACHE:
        _RECON_CACHE[key] = make_reconstruct(*key)
    fn = _RECON_CACHE[key]
    arrays = {k: jnp.asarray(v) for k, v in packed.arrays.items()}
    cb_off, cr_off = packed.chroma_qp_off
    return fn(arrays, jnp.asarray(packed.ls4), jnp.asarray(packed.ls8),
              cb_off, cr_off)
