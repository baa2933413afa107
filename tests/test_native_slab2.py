"""Native device-layout slab mode (mv_parse_slice_slab2) parity:

1. the v2 coefficient feeds ([W, S, B, maxw] reshaped) equal the v1
   slot-record feeds run through ops/slab.slot_feed;
2. the parser-emitted meta slab equals the Python-side meta build
   (meta_raster + skew_feed + vmask_feed) on every parsed slot;
3. the fused engine over v2 staging decodes bit-exactly vs the numpy
   oracle (interpret mode), including multi-slice pictures.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fixtures.h264enc import make_stream
from fixtures.h264enc2 import make_stream2
from minivideo_tpu.models.h264.decoder import H264Decoder
from minivideo_tpu.models.h264.nalu import parse_nalu, split_annexb
from minivideo_tpu.models.h264.recon_np import reconstruct_frame
from minivideo_tpu.models.h264.slicehdr import parse_slice_header
from minivideo_tpu.models.h264.syntax import FrameSyntax
from minivideo_tpu.native import (available, parse_slice_native,
                                  parse_slice_native_slab,
                                  parse_slice_native_slab2)
from minivideo_tpu.ops import slab as sl
from minivideo_tpu.ops.recon import (make_slab_staging, make_slab_staging2,
                                     pack_frames, pack_frames_slots2)
from minivideo_tpu.ops.recon_fused import reconstruct_frames_fused
from minivideo_tpu.ops.recon_wave import skew_tables

pytestmark = pytest.mark.skipif(not available(),
                                reason="native library unavailable")


def _parse_all(data):
    """Parse every IDR three ways: classic raster (oracle), v1 slot
    records, v2 device layout."""
    dec = H264Decoder()
    nalus = [parse_nalu(raw, off) for off, raw in split_annexb(data)]
    for n in nalus:
        if n.nal_unit_type in (7, 8):
            dec.feed_nalu(n)
    idrs = [n for n in nalus if n.nal_unit_type == 5]
    sps = pps = None
    frames = []
    slabs1 = slabs2 = None
    i = 0
    fs = fs1 = fs2 = None
    soms = []
    for n in idrs:
        sh, sps, pps = parse_slice_header(
            n.rbsp, n.nal_unit_type, n.nal_ref_idc, dec.sps_map,
            dec.pps_map)
        wmb = sps.pic_width_in_mbs
        hmb = sps.pic_height_in_map_units
        if slabs1 is None:
            npic = sum(1 for m in idrs
                       if parse_slice_header(
                           m.rbsp, m.nal_unit_type, m.nal_ref_idc,
                           dec.sps_map, dec.pps_map)[0]
                       .first_mb_in_slice == 0)
            slabs1 = make_slab_staging(wmb, hmb, npic)
            slabs2 = make_slab_staging2(wmb, hmb, npic)
        if sh.first_mb_in_slice == 0:
            fs = FrameSyntax(wmb, hmb)
            fs1 = FrameSyntax(wmb, hmb, lite=True)
            fs2 = FrameSyntax(wmb, hmb, lite=True)
            frames.append((fs, None))
            soms.append(np.full(wmb * hmb, -1, np.int32))
            i = len(frames) - 1
        args = (n.rbsp, sh.data_bit_offset, sh.first_mb_in_slice, sh.qp,
                bool(pps.entropy_coding_mode_flag),
                bool(pps.transform_8x8_mode_flag))
        nmb = parse_slice_native(fs, *args)
        parse_slice_native_slab(fs1, slabs1, i, *args)
        parse_slice_native_slab2(fs2, slabs2, i, *args,
                                 cb_qp_off=pps.chroma_qp_index_offset,
                                 cr_qp_off=pps.second_chroma_qp_index_offset)
        snum = int(soms[i].max()) + 1
        soms[i][sh.first_mb_in_slice:sh.first_mb_in_slice + nmb] = snum
    frames = [(fs, som) for (fs, _), som in zip(frames, soms)]
    return frames, slabs1, slabs2, sps, pps


def _check_stream(data):
    frames, slabs1, slabs2, sps, pps = _parse_all(data)
    packed = pack_frames(frames, sps, pps)
    B = packed.batch
    g = skew_tables(packed.wmb, packed.hmb)
    g["wmb"], g["hmb"] = packed.wmb, packed.hmb
    W, maxw = g["n_waves"], g["maxw"]
    L = B * maxw

    # 1. coefficient feeds: v2 block-transpose == v1 slot_feed
    for name, S in (("luma_slab", 256), ("chroma_slab", 128),
                    ("dc_slab", sl.DC_ROWS)):
        v1 = np.asarray(sl.slot_feed(jnp.asarray(slabs1[name][:B]), g, B,
                                     jnp.int16))
        v2 = slabs2[name].transpose(1, 2, 0, 3).reshape(W, S, L)
        np.testing.assert_array_equal(v1, v2, err_msg=name)

    # 2. meta slab == Python meta build, on parsed slots
    cb_off, cr_off = packed.chroma_qp_off
    arrays = {k: jnp.asarray(v) for k, v in packed.arrays.items()}
    meta = sl.meta_raster(arrays, cb_off, cr_off, packed.wmb, packed.hmb)
    meta_v1 = np.asarray(sl.vmask_feed(sl.skew_feed(meta, g, B), g, B))
    meta_v2 = slabs2["meta_slab"].transpose(1, 2, 0, 3).reshape(
        W, sl.META_ROWS, L)
    parsed1 = meta_v1[:, 1]
    np.testing.assert_array_equal(parsed1, meta_v2[:, 1], err_msg="parsed")
    mask = parsed1 > 0
    for row in range(34):
        a = meta_v1[:, row][mask]
        b = meta_v2[:, row][mask]
        np.testing.assert_array_equal(a, b, err_msg=f"meta row {row}")

    # 3. fused engine over v2 staging vs numpy oracle
    packed2 = pack_frames_slots2(slabs2, sps, pps)
    assert packed2.batch == B and packed2.slots == 2
    yj, cbj, crj = (np.asarray(a) for a in
                    reconstruct_frames_fused(packed2, interpret=True))
    for i, (fs, som) in enumerate(frames):
        y, cb, cr = reconstruct_frame(fs, sps, pps, som)
        np.testing.assert_array_equal(y, yj[i], err_msg=f"Y pic {i}")
        np.testing.assert_array_equal(cb, cbj[i], err_msg=f"Cb pic {i}")
        np.testing.assert_array_equal(cr, crj[i], err_msg=f"Cr pic {i}")


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_native_slab2_mixed_kinds(entropy):
    data = make_stream2(width_mbs=5, height_mbs=4, n_pictures=3, seed=93,
                        mb_kinds=("i16", "i4", "i8"), density=0.45,
                        transform_8x8=True, allow_pcm=True,
                        entropy=entropy)
    _check_stream(data)


def test_native_slab2_multi_slice():
    data = make_stream(width_mbs=6, height_mbs=5, n_pictures=2, seed=94,
                       n_slices=3, mb_kinds=("i16", "i4"), density=0.4,
                       allow_pcm=False)
    _check_stream(data)


def test_native_slab2_chroma_qp_offsets():
    data = make_stream(width_mbs=4, height_mbs=3, n_pictures=2, seed=95,
                       mb_kinds=("i16", "i4"), density=0.4,
                       allow_pcm=False)
    _check_stream(data)
