"""Frame packing + batched residual construction for the TPU engines.

The data-model layer between the entropy parsers and the reconstruction
engines (the TPU-native replacement for the reference's per-macroblock
residual path, h264_transform.c — SURVEY §3.3):

  * PackedFrames + pack_frames*/staging: FrameSyntax batches -> dense
    geometry-static arrays (raster coefficient buffers, or the native
    parser's skew-slot slab records for the fused engine);
  * build_residuals: dequant + IDCT of every block of every MB of every
    frame in one batched pass (no spatial deps; ops/transform.py) —
    the raster-layout counterpart of ops/slab.residual_from_slabs,
    used by the XLA wave/lane drivers and as the test oracle's batched
    reference.

Reconstruction itself lives in ops/recon_wave.py (XLA wave driver),
ops/recon_lane.py (lane-major shared math) and ops/recon_fused.py (the
fused Pallas production engine).  Bit-exactness vs the numpy oracle
(models/h264/recon_np.py) is enforced in tests/test_recon_jax.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import numpy as np

import jax
import jax.numpy as jnp

from ..models.h264.syntax import FrameSyntax, KIND_I16x16, KIND_IPCM
from ..models.h264.tables import BLK4x4_POS, QPC_FROM_QPI
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
    slots: int = 0        # 0 raster, 1 slot records, 2 device layout
    has8x8: bool = True   # PPS transform_8x8_mode_flag (static per stream)

    @property
    def batch(self) -> int:
        if self.slots == 2:
            return self.arrays["meta_slab"].shape[0]
        return self.arrays["mb_kind"].shape[0]

    @cached_property
    def haspcm(self) -> bool:
        """True if any MB in the batch is I_PCM (host scan; decides the
        kernel specialization variant — at most two variants compile
        per geometry, both persistently cached).  Cached: computed once
        per pack, while the staging buffers are still host numpy —
        repeated dispatches must not re-scan (a device slice + transfer
        once the arrays live on-chip)."""
        if self.slots == 2:
            return bool(np.any(np.asarray(
                self.arrays["meta_slab"][:, :, 0]) == KIND_IPCM))
        return bool(np.any(np.asarray(self.arrays["mb_kind"])
                           == KIND_IPCM))


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
                         pps.second_chroma_qp_index_offset),
                        has8x8=bool(pps.transform_8x8_mode_flag))


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
                         pps.second_chroma_qp_index_offset),
                        has8x8=bool(pps.transform_8x8_mode_flag))


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


def make_slab_staging2(wmb: int, hmb: int, batch: int) -> dict:
    """Device-layout staging for the native parser's v2 slab mode:
    frame-major [B, W, S, maxw] buffers whose per-frame slice is the
    fused kernel's wave feed minus the batch merge — so device prep is
    one uniform block-transpose (1,2,0,3) + reshape per slab, the
    parser emits meta rows too, and each pool worker writes a DISJOINT
    contiguous frame region (no cross-thread false sharing, 122-byte
    write strides instead of batch*maxw).  np.zeros maps lazy zero
    pages; unwritten slots keep parsed=0, replacing the skew-validity
    mask."""
    from .recon_wave import skew_tables
    from .slab import META_ROWS
    g = skew_tables(wmb, hmb)
    W, maxw = g["n_waves"], g["maxw"]
    B = batch
    return {
        "luma_slab": np.zeros((B, W, 256, maxw), np.int16),
        "chroma_slab": np.zeros((B, W, 128, maxw), np.int16),
        "dc_slab": np.zeros((B, W, 32, maxw), np.int16),
        "meta_slab": np.zeros((B, W, META_ROWS, maxw), np.int32),
        "maxw": maxw,
        "batch": B,
    }


def pack_frames_slots2(staging: dict, sps, pps) -> PackedFrames:
    """PackedFrames over v2 (device-layout) staging: the arrays are the
    staging buffers themselves; all per-MB metadata already rides in the
    parser-emitted meta slab."""
    wmb = sps.pic_width_in_mbs
    hmb = sps.pic_height_in_map_units
    arrays = {k: staging[k] for k in ("luma_slab", "chroma_slab",
                                      "dc_slab", "meta_slab")}
    ls4 = np.stack([level_scale_4x4_np(pps.scaling_list_4x4[i])
                    for i in range(3)])
    ls8 = level_scale_8x8_np(pps.scaling_list_8x8[0])
    return PackedFrames(wmb, hmb, arrays, ls4, ls8,
                        (pps.chroma_qp_index_offset,
                         pps.second_chroma_qp_index_offset), slots=2,
                        has8x8=bool(pps.transform_8x8_mode_flag))


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
                         pps.second_chroma_qp_index_offset), slots=True,
                        has8x8=bool(pps.transform_8x8_mode_flag))


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
