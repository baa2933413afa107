"""Batched integer dequantisation + inverse transforms (JAX, exact int32).

Device-side counterpart of models/h264/transform_np.py (the numpy oracle);
both are bit-exact implementations of spec 8.5.  Everything here is
"embarrassingly batched": all blocks of all macroblocks of all frames are
transformed in one fused elementwise pass — this phase has no spatial
dependencies (SURVEY.md §7: the wavefront only constrains *prediction*).

Reference: minivideo/src/decoder/h264/h264_transform.c (dequant
:924-1294, idct :1145-1396).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models.h264.tables import NORM_ADJUST_4x4, NORM_ADJUST_8x8
from ..models.h264.params import zigzag_to_raster_4x4, zigzag_to_raster_8x8


def level_scale_4x4_np(scaling_list_zz) -> np.ndarray:
    w = zigzag_to_raster_4x4(np.asarray(scaling_list_zz))
    return (w[None] * NORM_ADJUST_4x4).astype(np.int32)       # [6,4,4]


def level_scale_8x8_np(scaling_list_zz) -> np.ndarray:
    w = zigzag_to_raster_8x8(np.asarray(scaling_list_zz))
    return (w[None] * NORM_ADJUST_8x8).astype(np.int32)       # [6,8,8]


# ---------------------------------------------------------------------------
# Lane-friendly internals.  The natural layouts ([..., 4, 4] / [..., 8, 8])
# put the tiny block dims on the TPU's (sublane, lane) tiling — every VPU op
# then runs at 16/1024 utilization.  The *_t functions instead work on
# "components-first" tensors [blk_h, blk_w, N] where N (all batched blocks,
# flattened) rides the lanes at full width; the public wrappers transpose
# once in and once out.


def to_comp_first(x, h, w):
    """[..., h, w] -> ([h, w, N], lead_shape)."""
    lead = x.shape[:-2]
    return x.reshape((-1, h, w)).transpose(1, 2, 0), lead


def from_comp_first(t, lead, h, w):
    return t.transpose(2, 0, 1).reshape(lead + (h, w))


def dequant_4x4_t(ct, qp, ls):
    """ct [4, 4, N] int32; qp [N]; ls [6, 4, 4] (spec 8.5.12.1)."""
    m = qp % 6
    div = qp // 6
    scale = jnp.moveaxis(ls, 0, -1)[:, :, m]       # [4, 4, N]
    shift_l = jnp.maximum(div - 4, 0)
    shift_r = jnp.maximum(4 - div, 0)
    rnd = jnp.where(div < 4, 1 << jnp.maximum(3 - div, 0), 0)
    hi = (ct * scale) << shift_l
    lo = (ct * scale + rnd) >> shift_r
    return jnp.where(qp >= 24, hi, lo)


def dequant_8x8_t(ct, qp, ls8):
    """ct [8, 8, N]; qp [N]; ls8 [6, 8, 8] (spec 8.5.13.1)."""
    m = qp % 6
    div = qp // 6
    scale = jnp.moveaxis(ls8, 0, -1)[:, :, m]
    shift_l = jnp.maximum(div - 6, 0)
    shift_r = jnp.maximum(6 - div, 0)
    rnd = jnp.where(div < 6, 1 << jnp.maximum(5 - div, 0), 0)
    hi = (ct * scale) << shift_l
    lo = (ct * scale + rnd) >> shift_r
    return jnp.where(qp >= 36, hi, lo)


def idct_4x4_t(t):
    """4x4 inverse core transform on [4, 4, N] (spec 8.5.12.2)."""
    e0 = t[:, 0] + t[:, 2]                         # [4, N]
    e1 = t[:, 0] - t[:, 2]
    e2 = (t[:, 1] >> 1) - t[:, 3]
    e3 = t[:, 1] + (t[:, 3] >> 1)
    f = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=1)
    g0 = f[0] + f[2]                               # [4, N]
    g1 = f[0] - f[2]
    g2 = (f[1] >> 1) - f[3]
    g3 = f[1] + (f[3] >> 1)
    h = jnp.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=0)
    return (h + 32) >> 6


def _idct8_stage_t(rows):
    d0, d1, d2, d3, d4, d5, d6, d7 = rows
    a0 = d0 + d4
    a4 = d0 - d4
    a2 = (d2 >> 1) - d6
    a6 = d2 + (d6 >> 1)
    b0 = a0 + a6
    b2 = a4 + a2
    b4 = a4 - a2
    b6 = a0 - a6
    a1 = -d3 + d5 - d7 - (d7 >> 1)
    a3 = d1 + d7 - d3 - (d3 >> 1)
    a5 = -d1 + d7 + d5 + (d5 >> 1)
    a7 = d3 + d5 + d1 + (d1 >> 1)
    b1 = a1 + (a7 >> 2)
    b7 = a7 - (a1 >> 2)
    b3 = a3 + (a5 >> 2)
    b5 = (a3 >> 2) - a5
    return [b0 + b7, b2 + b5, b4 + b3, b6 + b1,
            b6 - b1, b4 - b3, b2 - b5, b0 - b7]


def idct_8x8_t(t):
    """8x8 inverse transform on [8, 8, N] (spec 8.5.13.2)."""
    f = _idct8_stage_t([t[:, k] for k in range(8)])   # cols -> list of [8,N]
    f = jnp.stack(f, axis=1)                          # [8, 8, N]
    h = _idct8_stage_t([f[k] for k in range(8)])      # rows
    h = jnp.stack(h, axis=0)
    return (h + 32) >> 6


def dequant_4x4(c, qp, ls):
    """Vectorised 8.5.12.1.  c: [..., 4, 4] int32; qp: [...] int32
    broadcastable; ls: [6, 4, 4]."""
    c = c.astype(jnp.int32)
    qp = jnp.broadcast_to(qp.astype(jnp.int32), c.shape[:-2])
    ct, lead = to_comp_first(c, 4, 4)
    out = dequant_4x4_t(ct, qp.reshape(-1), ls)
    return from_comp_first(out, lead, 4, 4)


def dequant_8x8(c, qp, ls8):
    """Vectorised 8.5.13.1.  c: [..., 8, 8]; ls8: [6, 8, 8]."""
    c = c.astype(jnp.int32)
    qp = jnp.broadcast_to(qp.astype(jnp.int32), c.shape[:-2])
    ct, lead = to_comp_first(c, 8, 8)
    out = dequant_8x8_t(ct, qp.reshape(-1), ls8)
    return from_comp_first(out, lead, 8, 8)


_HAD4 = jnp.array([[1, 1, 1, 1],
                   [1, 1, -1, -1],
                   [1, -1, -1, 1],
                   [1, -1, 1, -1]], dtype=jnp.int32)
_HAD2 = jnp.array([[1, 1], [1, -1]], dtype=jnp.int32)


def luma_dc_transform(c, qp, ls):
    """Intra16x16 luma DC: 4x4 Hadamard + scaling (spec 8.5.10).
    c: [..., 4, 4]; returns dcY [..., 4, 4]."""
    c = c.astype(jnp.int32)
    qp = qp.astype(jnp.int32)
    f = jnp.einsum("ik,...kl,lj->...ij", _HAD4, c, _HAD4,
                   preferred_element_type=jnp.int32)
    scale = ls[qp % 6, 0, 0]
    div = qp // 6
    shift_l = jnp.maximum(div - 6, 0)[..., None, None]
    shift_r = jnp.maximum(6 - div, 0)[..., None, None]
    rnd = jnp.where(div[..., None, None] < 6,
                    1 << jnp.maximum(5 - div, 0)[..., None, None], 0)
    hi = (f * scale[..., None, None]) << shift_l
    lo = (f * scale[..., None, None] + rnd) >> shift_r
    return jnp.where(qp[..., None, None] >= 36, hi, lo)


def chroma_dc_transform(c, qp, ls):
    """Chroma DC 2x2 transform + scaling, 4:2:0 (spec 8.5.11).
    c: [..., 2, 2]; qp is QPC."""
    c = c.astype(jnp.int32)
    qp = qp.astype(jnp.int32)
    f = jnp.einsum("ik,...kl,lj->...ij", _HAD2, c, _HAD2,
                   preferred_element_type=jnp.int32)
    scale = ls[qp % 6, 0, 0]
    return ((f * scale[..., None, None]) << (qp[..., None, None] // 6)) >> 5


def idct_4x4(d):
    """4x4 inverse core transform (spec 8.5.12.2).  d: [..., 4, 4] int32;
    returns (h + 32) >> 6."""
    t, lead = to_comp_first(d.astype(jnp.int32), 4, 4)
    return from_comp_first(idct_4x4_t(t), lead, 4, 4)


def idct_8x8(d):
    """8x8 inverse transform (spec 8.5.13.2).  d: [..., 8, 8] int32."""
    t, lead = to_comp_first(d.astype(jnp.int32), 8, 8)
    return from_comp_first(idct_8x8_t(t), lead, 8, 8)
