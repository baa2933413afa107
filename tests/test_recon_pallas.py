"""Bit-exactness of the single-kernel Pallas lane-major wavefront driver
(ops/recon_lane_pallas.py) vs the sequential numpy oracle.

Runs in Pallas interpret mode so it executes on the CPU test mesh; the
same kernel compiles with Mosaic on real TPU (driven by bench.py).
Coverage mirrors tests/test_recon_jax.py: mb kinds (i16/i4/i8/PCM),
multi-picture batches, QP extremes, multi-slice, odd geometries.
"""

import numpy as np
import pytest

from fixtures.h264enc import make_stream
from minivideo_tpu.models.h264.recon_np import reconstruct_frame
from minivideo_tpu.ops.recon import pack_frames
from minivideo_tpu.ops.recon_lane_pallas import reconstruct_frames_lane_pallas
from tests.test_recon_jax import _parse_stream


def _compare_pallas(data):
    frames, sps, pps = _parse_stream(data)
    packed = pack_frames(frames, sps, pps)
    yj, cbj, crj = (np.asarray(a)
                    for a in reconstruct_frames_lane_pallas(
                        packed, interpret=True))
    for i, (fs, som) in enumerate(frames):
        y, cb, cr = reconstruct_frame(fs, sps, pps, som)
        np.testing.assert_array_equal(y, yj[i], err_msg=f"Y pic {i}")
        np.testing.assert_array_equal(cb, cbj[i], err_msg=f"Cb pic {i}")
        np.testing.assert_array_equal(cr, crj[i], err_msg=f"Cr pic {i}")


@pytest.mark.parametrize("kinds", [("i16",), ("i4",), ("i16", "i4")])
def test_pallas_vs_oracle_kinds(kinds):
    data = make_stream(width_mbs=5, height_mbs=4, n_pictures=2, seed=33,
                       mb_kinds=kinds, density=0.4, allow_pcm=True)
    _compare_pallas(data)


def test_pallas_vs_oracle_i8():
    data = make_stream(width_mbs=5, height_mbs=4, n_pictures=2, seed=34,
                       mb_kinds=("i16", "i4", "i8"), density=0.4,
                       transform_8x8=True, allow_pcm=False)
    _compare_pallas(data)


def test_pallas_vs_oracle_qp_extremes():
    for qp in (0, 12, 51):
        data = make_stream(width_mbs=4, height_mbs=3, n_pictures=1, seed=70,
                           qp=qp, mb_kinds=("i16", "i4"), density=0.5,
                           allow_pcm=False)
        _compare_pallas(data)


def test_pallas_multi_slice():
    data = make_stream(width_mbs=4, height_mbs=4, n_pictures=1, seed=71,
                       n_slices=3, mb_kinds=("i16", "i4"), density=0.4,
                       allow_pcm=False)
    _compare_pallas(data)


def test_pallas_odd_geometry():
    # wmb > 2*hmb and tall-narrow shapes stress the skew/wave tables
    for wmb, hmb in ((9, 2), (2, 7), (1, 1)):
        data = make_stream(width_mbs=wmb, height_mbs=hmb, n_pictures=1,
                           seed=80 + wmb, mb_kinds=("i16", "i4"),
                           density=0.4, allow_pcm=False)
        _compare_pallas(data)
