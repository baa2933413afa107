"""Intra-frame multi-chip reconstruction: the wavefront's lane axis
sharded over devices with ppermute halo exchange (parallel/halo.py)
must be bit-exact vs the numpy oracle — i.e., a single frame really can
span chips."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from fixtures.h264enc import make_stream
from minivideo_tpu.models.h264.recon_np import reconstruct_frame
from minivideo_tpu.ops.recon import pack_frames
from minivideo_tpu.parallel.halo import reconstruct_frames_halo
from tests.test_recon_jax import _parse_stream

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 devices (CPU mesh)")


def _compare_halo(data, n_shards):
    frames, sps, pps = _parse_stream(data)
    packed = pack_frames(frames, sps, pps)
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("lanes",))
    y, cb, cr = (np.asarray(a)
                 for a in reconstruct_frames_halo(packed, mesh))
    for i, (fs, som) in enumerate(frames):
        ry, rcb, rcr = reconstruct_frame(fs, sps, pps, som)
        np.testing.assert_array_equal(ry, y[i], err_msg=f"Y pic {i}")
        np.testing.assert_array_equal(rcb, cb[i], err_msg=f"Cb pic {i}")
        np.testing.assert_array_equal(rcr, cr[i], err_msg=f"Cr pic {i}")


def test_halo_single_frame_spans_devices():
    # wmb=5,hmb=4 -> maxw=4; batch 1 -> 4 lanes over 4 devices:
    # every macroblock's left/top state crosses a chip boundary
    data = make_stream(width_mbs=5, height_mbs=4, n_pictures=1, seed=33,
                       mb_kinds=("i16", "i4"), density=0.4,
                       allow_pcm=False)
    _compare_halo(data, 4)


def test_halo_batched_frames_eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    # maxw=4, batch 2 -> L=8 lanes over 8 devices; frame-segment
    # boundary sits exactly on a shard boundary
    data = make_stream(width_mbs=6, height_mbs=5, n_pictures=2, seed=60,
                       mb_kinds=("i16", "i4"), density=0.35,
                       allow_pcm=True)
    _compare_halo(data, 8)


def test_halo_wide_frame():
    # wider geometry: maxw=6, batch 2 -> L=12 over 4 devices
    data = make_stream(width_mbs=10, height_mbs=6, n_pictures=2, seed=61,
                       mb_kinds=("i16", "i4"), density=0.35,
                       allow_pcm=False)
    _compare_halo(data, 4)


def test_halo_slot_staging():
    """The native slab-mode (slot-staged) feed through the sharded halo
    loop: production records, frames spanning devices."""
    from minivideo_tpu.native import available
    if not available():
        pytest.skip("native library unavailable")
    from minivideo_tpu.models.h264.decoder import H264Decoder
    from minivideo_tpu.models.h264.nalu import parse_nalu, split_annexb
    from minivideo_tpu.models.h264.slicehdr import parse_slice_header
    from minivideo_tpu.models.h264.syntax import FrameSyntax
    from minivideo_tpu.native import parse_slice_native_slab
    from minivideo_tpu.ops.recon import make_slab_staging, pack_frames_slots

    data = make_stream(width_mbs=5, height_mbs=4, n_pictures=2, seed=35,
                       mb_kinds=("i16", "i4"), density=0.4,
                       allow_pcm=False)
    dec = H264Decoder()
    nalus = [parse_nalu(raw, off) for off, raw in split_annexb(data)]
    for n in nalus:
        if n.nal_unit_type in (7, 8):
            dec.feed_nalu(n)
    idrs = [n for n in nalus if n.nal_unit_type == 5]
    staging = make_slab_staging(5, 4, len(idrs))
    frames = []
    sps = pps = None
    for i, n in enumerate(idrs):
        sh, sps, pps = parse_slice_header(n.rbsp, 5, n.nal_ref_idc,
                                          dec.sps_map, dec.pps_map)
        fs = FrameSyntax(5, 4, lite=True)
        parse_slice_native_slab(fs, staging, i, n.rbsp,
                                sh.data_bit_offset, 0, sh.qp,
                                bool(pps.entropy_coding_mode_flag),
                                bool(pps.transform_8x8_mode_flag))
        frames.append((fs, None))
    packed = pack_frames_slots(staging, frames, sps, pps)
    mesh = Mesh(np.array(jax.devices()[:4]), ("lanes",))
    y, cb, cr = (np.asarray(a)
                 for a in reconstruct_frames_halo(packed, mesh))
    # oracle from a raster parse of the same stream
    frames_r, sps, pps = _parse_stream(data)
    for i, (fs, som) in enumerate(frames_r):
        ry, rcb, rcr = reconstruct_frame(fs, sps, pps, som)
        np.testing.assert_array_equal(ry, y[i], err_msg=f"Y pic {i}")
        np.testing.assert_array_equal(rcb, cb[i], err_msg=f"Cb pic {i}")
        np.testing.assert_array_equal(rcr, cr[i], err_msg=f"Cr pic {i}")
