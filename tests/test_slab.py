"""Bit-exactness of the slab-layout residual construction (ops/slab.py)
vs the reference-exact batched path (ops/recon.build_residuals).

residual_from_slabs is the function the fused Pallas kernel runs
in-kernel; here it runs as plain XLA on CPU over all MBs at once (one
giant "wave" with L = B * n lanes).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fixtures.h264enc import make_stream
from minivideo_tpu.models.h264.syntax import (KIND_I4x4, KIND_I8x8,
                                              KIND_I16x16, KIND_IPCM)
from minivideo_tpu.ops.recon import (build_residuals, pack_frames,
                                     _assemble_16x16, _assemble_from_8x8)
from minivideo_tpu.ops import slab
from tests.test_recon_jax import _parse_stream


def _expected_res(packed):
    """Per-MB pixel-layout residuals from the round-1/2 batched path."""
    arrays = {k: jnp.asarray(v) for k, v in packed.arrays.items()}
    cb, cr = packed.chroma_qp_off
    res = build_residuals(arrays, packed.ls4, packed.ls8, cb, cr)
    kind = np.asarray(packed.arrays["mb_kind"])
    B, n = kind.shape
    l4 = np.asarray(_assemble_16x16(res["r4"]))          # [B,n,16,16]
    l8 = np.asarray(_assemble_from_8x8(res["r8"]))
    l16 = np.asarray(res["luma16_res"])
    luma = np.where((kind == KIND_I8x8)[..., None, None], l8,
                    np.where(((kind == KIND_I16x16)
                              | (kind == KIND_IPCM))[..., None, None],
                             l16, l4))
    chroma = np.asarray(res["chroma_res"])                # [B,n,2,8,8]
    return luma.reshape(B, n, 256), chroma.reshape(B, n, 128)


def _actual_res(packed):
    arrays = {k: jnp.asarray(v) for k, v in packed.arrays.items()}
    cb, cr = packed.chroma_qp_off
    B, n = packed.arrays["mb_kind"].shape
    luma, chroma, dcs = slab.slabs_from_raster(arrays)
    meta = slab.meta_raster(arrays, cb, cr, packed.wmb, packed.hmb)
    t4, t8, tcb, tcr = slab.scale_tables(packed.ls4, packed.ls8)
    rl, rc = slab.residual_from_slabs(
        luma.reshape(B * n, 256).T, chroma.reshape(B * n, 128).T,
        dcs.reshape(B * n, slab.DC_ROWS).T, meta.reshape(slab.META_ROWS, -1),
        t4, t8, tcb, tcr,
        jnp.asarray(slab.P4), jnp.asarray(slab.P8), jnp.asarray(slab.PC),
        jnp.asarray(slab.HH16), jnp.asarray(slab.HH8C))
    return (np.asarray(rl).T.reshape(B, n, 256),
            np.asarray(rc).T.reshape(B, n, 128))


def _compare(data):
    frames, sps, pps = _parse_stream(data)
    packed = pack_frames(frames, sps, pps)
    el, ec = _expected_res(packed)
    al, ac = _actual_res(packed)
    np.testing.assert_array_equal(el, al, err_msg="luma residuals")
    np.testing.assert_array_equal(ec, ac, err_msg="chroma residuals")


@pytest.mark.parametrize("kinds", [("i16",), ("i4",), ("i16", "i4")])
def test_slab_residuals_kinds(kinds):
    data = make_stream(width_mbs=5, height_mbs=4, n_pictures=3, seed=33,
                       mb_kinds=kinds, density=0.4, allow_pcm=True)
    _compare(data)


def test_slab_residuals_i8():
    data = make_stream(width_mbs=5, height_mbs=4, n_pictures=2, seed=34,
                       mb_kinds=("i16", "i4", "i8"), density=0.4,
                       transform_8x8=True, allow_pcm=False)
    _compare(data)


def test_slab_residuals_qp_extremes():
    for qp in (0, 12, 36, 51):
        data = make_stream(width_mbs=4, height_mbs=3, n_pictures=2,
                           seed=70, qp=qp, mb_kinds=("i16", "i4"),
                           density=0.5, allow_pcm=False)
        _compare(data)


def test_slab_residuals_scaling_lists():
    rng = np.random.default_rng(3)
    lists = [list(rng.integers(4, 60, 16)) for _ in range(6)]
    data = make_stream(width_mbs=4, height_mbs=3, n_pictures=2, seed=75,
                       mb_kinds=("i16", "i4"), density=0.5,
                       scaling_lists=lists, allow_pcm=False)
    _compare(data)
