"""Intra-frame parallelism: one frame's wavefront spanning multiple
chips, with boundary state exchanged via lax.ppermute halos.

SURVEY.md §2.6 maps the reference's (nonexistent) sequence-parallel axis
to "wavefront dependency scheduling over macroblock anti-diagonals ...
left/top row exchange ≈ halo exchange via jax.lax.ppermute when a frame
is split across chips".  This module implements exactly that: the
skewed wave-lane axis (each lane = one macroblock of the current
anti-diagonal) is sharded over a mesh axis, and the per-wave lane
shifts of the boundary-state buffers — the ONLY cross-lane dataflow in
the whole reconstruction — become ring ppermutes of a single edge lane
per buffer per wave.  Everything else in the per-wave math
(ops/recon_lane.wave_compute_lane, shared with the single-chip Pallas
kernel) is lane-local and runs unchanged inside shard_map.

The state machinery mirrors ops/recon_fused._wave_kernel functionally:
row state rolls right by dr0 lanes per wave, the double-buffered bottom
rows roll left by shtop/shtr lanes (schedules from wave_schedule).

Bit-exactness vs the numpy oracle and the single-device engines is
enforced on an 8-device CPU mesh (tests/test_halo.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.recon import PackedFrames
from ..ops.recon_lane import wave_compute_lane
from ..ops.recon_fused import unskew_fused, wave_schedule
from ..ops.recon_wave import skew_tables
from ..ops import slab as sl


def _roll_right_halo(x, axis):
    """Lane k <- k-1 across the whole sharded lane axis: local shift +
    ppermute of each shard's last lane to its right neighbor; global
    lane 0 becomes 0 (ppermute fills unsourced destinations with 0)."""
    n = jax.lax.axis_size(axis)
    edge = x[:, -1:]
    recv = jax.lax.ppermute(edge, axis,
                            [(i, i + 1) for i in range(n - 1)])
    return jnp.concatenate([recv, x[:, :-1]], axis=1)


def _roll_left_halo(x, axis):
    """Lane k <- k+1 across the sharded lane axis; last global lane 0."""
    n = jax.lax.axis_size(axis)
    edge = x[:, :1]
    recv = jax.lax.ppermute(edge, axis, [(i, i - 1) for i in range(1, n)])
    return jnp.concatenate([x[:, 1:], recv], axis=1)


def _wave_loop(dr0s, shtops, mr, ml, meta, coefl, coefc, dcs,
               t4, t8, tcb, tcr, p4, p8, pc, hh16, hh8c,
               *, n_waves, axis):
    """The full wave loop on one frame, lane axis sharded over `axis`.

    meta [W, META_ROWS, l]; coefl [W, 256, l] / coefc [W, 128, l] /
    dcs [W, 32, l] int16 coefficient slabs, where l is the per-device
    lane strip; mr/ml [1, l] are the frame-segment roll masks
    (recon_fused._seg_masks strips).  Functional mirror of
    recon_fused._wave_kernel — including the in-kernel residual
    construction, which is lane-local and shards unchanged — with the
    boundary-state rolls replaced by halo rolls."""
    l = meta.shape[-1]
    zeros = lambda s: jnp.zeros((s, l), jnp.int32)     # noqa: E731
    state0 = (zeros(24), zeros(24), zeros(16), zeros(16),
              zeros(16), zeros(16))
    out_y0 = jnp.zeros((n_waves, 256, l), jnp.int32)
    out_c0 = jnp.zeros((n_waves, 128, l), jnp.int32)

    def body(w, carry):
        (row_y, row_c, botA_y, botB_y, botA_c, botB_c,
         out_y, out_c) = carry
        dr0 = dr0s[w]
        shtop = shtops[w]
        shtr = 1 - dr0

        def rollr(x):
            return jnp.where(mr > 0, _roll_right_halo(x, axis), 0)

        def rolll(x):
            return jnp.where(ml > 0, _roll_left_halo(x, axis), 0)

        ry = jnp.where(dr0 == 1, rollr(row_y), row_y)
        rc = jnp.where(dr0 == 1, rollr(row_c), row_c)
        top_row = jnp.where(shtop == 1, rolll(botB_y), botB_y)
        tr_row = jnp.where(shtr == 1, rolll(botA_y), botA_y)
        top_c = jnp.where(shtop == 1, rolll(botB_c), botB_c)

        m = meta[w]
        res_luma, res_chroma = sl.residual_from_slabs(
            coefl[w].astype(jnp.int32), coefc[w].astype(jnp.int32),
            dcs[w].astype(jnp.int32), m,
            t4, t8, tcb, tcr, p4, p8, pc, hh16, hh8c)
        tile, ctile = wave_compute_lane(
            ry[:16], ry[16:17], top_row, tr_row, rc[:16], rc[16:17],
            rc[17:18], top_c, m[0:1], m[2:3] > 0, m[3:4] > 0,
            m[4:5] > 0, m[5:6] > 0, m[1:2], m[12:28], m[8:12],
            m[6:7], m[7:8], res_luma, res_chroma)

        out_y = out_y.at[w].set(tile)
        out_c = out_c.at[w].set(ctile)

        upd = m[1:2] > 0
        right_col = jnp.concatenate(
            [tile[y * 16 + 15:y * 16 + 16] for y in range(16)], axis=0)
        new_row = jnp.concatenate(
            [right_col, top_row[15:16], jnp.zeros((7, l), jnp.int32)],
            axis=0)
        row_y = jnp.where(upd, new_row, ry)
        cright = jnp.concatenate(
            [ctile[y * 8 + 7:y * 8 + 8] for y in range(16)], axis=0)
        new_rowc = jnp.concatenate(
            [cright, top_c[7:8], top_c[15:16],
             jnp.zeros((6, l), jnp.int32)], axis=0)
        row_c = jnp.where(upd, new_rowc, rc)

        botB_y, botA_y = botA_y, tile[240:256]
        botB_c, botA_c = botA_c, jnp.concatenate(
            [ctile[56:64], ctile[120:128]], axis=0)
        return (row_y, row_c, botA_y, botB_y, botA_c, botB_c,
                out_y, out_c)

    carry = state0 + (out_y0, out_c0)
    carry = jax.lax.fori_loop(0, n_waves, body, carry)
    return carry[6].astype(jnp.uint8), carry[7].astype(jnp.uint8)


def make_reconstruct_halo(wmb: int, hmb: int, batch: int, mesh: Mesh,
                          axis: str = "lanes"):
    """Reconstructor whose (batch-fused) wave-lane axis is sharded over
    `mesh[axis]`: single frames span all chips of that axis, exchanging
    one edge lane of boundary state per wave via ppermute."""
    from jax import shard_map                   # jax >= 0.8

    g = skew_tables(wmb, hmb)
    g["wmb"], g["hmb"] = wmb, hmb
    n_waves, maxw = g["n_waves"], g["maxw"]
    L = batch * maxw
    n_shards = mesh.shape[axis]
    assert L % n_shards == 0, (
        f"lane axis {L} must divide over {n_shards} devices; pad the "
        f"batch so batch*maxw is a multiple of the mesh axis")
    dr0, shtop = wave_schedule(g)
    dr0j, shtopj = jnp.asarray(dr0), jnp.asarray(shtop)
    from ..ops.recon_fused import _seg_masks
    mr_np, ml_np = _seg_masks(maxw, batch)
    mrj, mlj = jnp.asarray(mr_np), jnp.asarray(ml_np)

    lane_slab = P(None, None, axis)
    loop = shard_map(
        partial(_wave_loop, n_waves=n_waves, axis=axis),
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis), P(None, axis),
                  lane_slab, lane_slab, lane_slab, lane_slab,
                  P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(lane_slab, lane_slab),
        check_vma=False)

    def _run(meta_s, coefl_s, coefc_s, dcs_s, ls4, ls8):
        t4, t8, tcb, tcr = sl.scale_tables(ls4, ls8)
        out_y, out_c = loop(
            dr0j, shtopj, mrj, mlj, meta_s, coefl_s, coefc_s, dcs_s,
            t4, t8, tcb, tcr,
            jnp.asarray(sl.P4), jnp.asarray(sl.P8), jnp.asarray(sl.PC),
            jnp.asarray(sl.HH16), jnp.asarray(sl.HH8C))
        return unskew_fused(out_y, out_c, g, batch)

    def recon(arrays, ls4, ls8, cb_off, cr_off):
        luma, chroma, dcs = sl.slabs_from_raster(arrays)
        meta = sl.meta_raster(arrays, cb_off, cr_off, wmb, hmb)
        meta_s = sl.vmask_feed(sl.skew_feed(meta, g, batch), g, batch)
        coefl_s = sl.skew_feed_slab(luma, g, batch).astype(jnp.int16)
        coefc_s = sl.skew_feed_slab(chroma, g, batch).astype(jnp.int16)
        dcs_s = sl.skew_feed_slab(dcs, g, batch).astype(jnp.int16)
        return _run(meta_s, coefl_s, coefc_s, dcs_s, ls4, ls8)

    def recon_slots(arrays, luma_slab, chroma_slab, dc_slab,
                    ls4, ls8, cb_off, cr_off):
        """Slot-staged variant: the native parser's slab records feed the
        sharded loop directly (production fused-engine feed)."""
        meta = sl.meta_raster(arrays, cb_off, cr_off, wmb, hmb)
        meta_s = sl.vmask_feed(sl.skew_feed(meta, g, batch), g, batch)
        coefl_s = sl.slot_feed(luma_slab, g, batch, jnp.int16)
        coefc_s = sl.slot_feed(chroma_slab, g, batch, jnp.int16)
        dcs_s = sl.slot_feed(dc_slab, g, batch, jnp.int16)
        return _run(meta_s, coefl_s, coefc_s, dcs_s, ls4, ls8)

    return jax.jit(recon), jax.jit(recon_slots)


def reconstruct_frames_halo(packed: PackedFrames, mesh: Mesh,
                            axis: str = "lanes"):
    fn, fn_slots = make_reconstruct_halo(packed.wmb, packed.hmb,
                                         packed.batch, mesh, axis)
    cb_off, cr_off = packed.chroma_qp_off
    ls4 = jnp.asarray(packed.ls4)
    ls8 = jnp.asarray(packed.ls8)
    if packed.slots:
        small = {k: jnp.asarray(v) for k, v in packed.arrays.items()
                 if not k.endswith("_slab")}
        return fn_slots(small, jnp.asarray(packed.arrays["luma_slab"]),
                        jnp.asarray(packed.arrays["chroma_slab"]),
                        jnp.asarray(packed.arrays["dc_slab"]),
                        ls4, ls8, cb_off, cr_off)
    arrays = {k: jnp.asarray(v) for k, v in packed.arrays.items()}
    return fn(arrays, ls4, ls8, cb_off, cr_off)
