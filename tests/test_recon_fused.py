"""Bit-exactness of the batch-fused Pallas engine (ops/recon_fused.py)
vs the sequential numpy oracle, in interpret mode on CPU.

The fused engine merges the batch into the lane axis, so multi-frame
batches (where frame-segment roll masking matters) are the key cases.
"""

import numpy as np
import pytest

from fixtures.h264enc import make_stream
from minivideo_tpu.models.h264.recon_np import reconstruct_frame
from minivideo_tpu.ops.recon import pack_frames
from minivideo_tpu.ops.recon_fused import reconstruct_frames_fused
from tests.test_recon_jax import _parse_stream


def _compare_fused(data):
    frames, sps, pps = _parse_stream(data)
    packed = pack_frames(frames, sps, pps)
    yj, cbj, crj = (np.asarray(a)
                    for a in reconstruct_frames_fused(packed,
                                                      interpret=True))
    for i, (fs, som) in enumerate(frames):
        y, cb, cr = reconstruct_frame(fs, sps, pps, som)
        np.testing.assert_array_equal(y, yj[i], err_msg=f"Y pic {i}")
        np.testing.assert_array_equal(cb, cbj[i], err_msg=f"Cb pic {i}")
        np.testing.assert_array_equal(cr, crj[i], err_msg=f"Cr pic {i}")


@pytest.mark.parametrize("kinds", [("i16",), ("i4",), ("i16", "i4")])
def test_fused_vs_oracle_kinds(kinds):
    # 3 pictures: the fused lane axis holds >2 frame segments
    data = make_stream(width_mbs=5, height_mbs=4, n_pictures=3, seed=33,
                       mb_kinds=kinds, density=0.4, allow_pcm=True)
    _compare_fused(data)


def test_fused_vs_oracle_i8():
    data = make_stream(width_mbs=5, height_mbs=4, n_pictures=2, seed=34,
                       mb_kinds=("i16", "i4", "i8"), density=0.4,
                       transform_8x8=True, allow_pcm=False)
    _compare_fused(data)


def test_fused_vs_oracle_qp_extremes():
    for qp in (0, 12, 51):
        data = make_stream(width_mbs=4, height_mbs=3, n_pictures=2, seed=70,
                           qp=qp, mb_kinds=("i16", "i4"), density=0.5,
                           allow_pcm=False)
        _compare_fused(data)


def test_fused_multi_slice():
    data = make_stream(width_mbs=4, height_mbs=4, n_pictures=2, seed=71,
                       n_slices=3, mb_kinds=("i16", "i4"), density=0.4,
                       allow_pcm=False)
    _compare_fused(data)


def test_fused_all_kinds_mixed():
    """All four MB kinds (incl. PCM and 8x8) through the in-kernel
    residual path in one stream."""
    data = make_stream(width_mbs=5, height_mbs=4, n_pictures=3, seed=55,
                       mb_kinds=("i16", "i4", "i8"), density=0.45,
                       transform_8x8=True, allow_pcm=True)
    _compare_fused(data)


def test_fused_specialized_matches_full():
    """The has8x8=False/haspcm=False specialized kernel (what production
    compiles for baseline-profile streams) is bit-identical to the full
    kernel on a stream without 8x8/PCM macroblocks."""
    from minivideo_tpu.ops.recon_fused import make_reconstruct_fused
    import jax.numpy as jnp
    data = make_stream(width_mbs=5, height_mbs=3, n_pictures=2, seed=91,
                       mb_kinds=("i16", "i4"), density=0.4,
                       allow_pcm=False)
    frames, sps, pps = _parse_stream(data)
    packed = pack_frames(frames, sps, pps)
    assert packed.has8x8 is False and packed.haspcm is False
    arrays = {k: jnp.asarray(v) for k, v in packed.arrays.items()}
    cb_off, cr_off = packed.chroma_qp_off
    outs = []
    for has8x8, haspcm in ((True, True), (False, False)):
        fn = make_reconstruct_fused(packed.wmb, packed.hmb, packed.batch,
                                    interpret=True, has8x8=has8x8,
                                    haspcm=haspcm)
        outs.append([np.asarray(a) for a in
                     fn(arrays, jnp.asarray(packed.ls4),
                        jnp.asarray(packed.ls8), cb_off, cr_off)])
    for full, lite, name in zip(outs[0], outs[1], ("Y", "Cb", "Cr")):
        np.testing.assert_array_equal(full, lite, err_msg=name)


def test_fused_single_frame_and_odd_geometry():
    for wmb, hmb, npic in ((9, 2, 1), (2, 7, 2), (1, 1, 2)):
        data = make_stream(width_mbs=wmb, height_mbs=hmb, n_pictures=npic,
                           seed=80 + wmb, mb_kinds=("i16", "i4"),
                           density=0.4, allow_pcm=False)
        _compare_fused(data)
