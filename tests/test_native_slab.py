"""Native slab-emission mode (mv_parse_slice_slab) parity:

1. slab records == ops/slab.slabs_from_raster applied to the classic
   raster-parse output, slot by slot;
2. the fused engine decodes slot-staged batches bit-exactly vs the
   numpy oracle (interpret mode).
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
                                  parse_slice_native_slab)
from minivideo_tpu.ops import slab as sl
from minivideo_tpu.ops.recon import (make_slab_staging, pack_frames,
                                     pack_frames_slots)
from minivideo_tpu.ops.recon_fused import reconstruct_frames_fused
from minivideo_tpu.ops.recon_wave import skew_tables

pytestmark = pytest.mark.skipif(not available(),
                                reason="native library unavailable")


def _parse_both(data):
    """Parse every IDR twice: classic raster staging and slab staging.
    Returns (frames_raster, slab_staging, sps, pps)."""
    dec = H264Decoder()
    nalus = [parse_nalu(raw, off) for off, raw in split_annexb(data)]
    for n in nalus:
        if n.nal_unit_type in (7, 8):
            dec.feed_nalu(n)
    idrs = [n for n in nalus if n.nal_unit_type == 5]
    sps = pps = None
    frames = []
    slabs = None
    i = 0
    fs = fs_s = None
    for n in idrs:
        sh, sps, pps = parse_slice_header(
            n.rbsp, n.nal_unit_type, n.nal_ref_idc, dec.sps_map,
            dec.pps_map)
        wmb = sps.pic_width_in_mbs
        hmb = sps.pic_height_in_map_units
        if slabs is None:
            # count pictures = number of first_mb_in_slice == 0
            npic = sum(1 for m in idrs
                       if parse_slice_header(
                           m.rbsp, m.nal_unit_type, m.nal_ref_idc,
                           dec.sps_map, dec.pps_map)[0]
                       .first_mb_in_slice == 0)
            slabs = make_slab_staging(wmb, hmb, npic)
        if sh.first_mb_in_slice == 0:
            fs = FrameSyntax(wmb, hmb)
            fs_s = FrameSyntax(wmb, hmb)
            frames.append((fs, None))
            i = len(frames) - 1
        parse_slice_native(fs, n.rbsp, sh.data_bit_offset,
                           sh.first_mb_in_slice, sh.qp,
                           bool(pps.entropy_coding_mode_flag),
                           bool(pps.transform_8x8_mode_flag))
        parse_slice_native_slab(fs_s, slabs, i, n.rbsp,
                                sh.data_bit_offset, sh.first_mb_in_slice,
                                sh.qp, bool(pps.entropy_coding_mode_flag),
                                bool(pps.transform_8x8_mode_flag))
    return frames, slabs, sps, pps


def _check_stream(data):
    frames, slabs, sps, pps = _parse_both(data)
    packed = pack_frames(frames, sps, pps)
    g = skew_tables(packed.wmb, packed.hmb)
    maxw = g["maxw"]
    arrays = {k: jnp.asarray(v) for k, v in packed.arrays.items()}
    luma, chroma, dcs = (np.asarray(a)
                         for a in sl.slabs_from_raster(arrays))
    parsed = np.asarray(packed.arrays["parsed"])
    B, n = parsed.shape
    w_of, k_of = g["w_of"], g["k_of"]
    slots = w_of * maxw + k_of                  # [n]
    for i in range(B):
        mbs = np.nonzero(parsed[i])[0]
        s = slots[mbs]
        np.testing.assert_array_equal(
            slabs["luma_slab"][i][s], luma[i][mbs].astype(np.int16),
            err_msg=f"luma slab pic {i}")
        np.testing.assert_array_equal(
            slabs["chroma_slab"][i][s], chroma[i][mbs].astype(np.int16),
            err_msg=f"chroma slab pic {i}")
        np.testing.assert_array_equal(
            slabs["dc_slab"][i][s, :24], dcs[i][mbs, :24].astype(np.int16),
            err_msg=f"dc slab pic {i}")

    # full engine over the slot staging vs numpy oracle
    packed_s = pack_frames_slots(slabs, frames, sps, pps)
    yj, cbj, crj = (np.asarray(a) for a in
                    reconstruct_frames_fused(packed_s, interpret=True))
    for i, (fs, som) in enumerate(frames):
        y, cb, cr = reconstruct_frame(fs, sps, pps, som)
        np.testing.assert_array_equal(y, yj[i], err_msg=f"Y pic {i}")
        np.testing.assert_array_equal(cb, cbj[i], err_msg=f"Cb pic {i}")
        np.testing.assert_array_equal(cr, crj[i], err_msg=f"Cr pic {i}")


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_native_slab_mixed_kinds(entropy):
    data = make_stream2(width_mbs=5, height_mbs=4, n_pictures=3, seed=91,
                        mb_kinds=("i16", "i4", "i8"), density=0.45,
                        transform_8x8=True, allow_pcm=True,
                        entropy=entropy)
    _check_stream(data)


def test_native_slab_multi_slice():
    data = make_stream(width_mbs=6, height_mbs=5, n_pictures=2, seed=92,
                       n_slices=3, mb_kinds=("i16", "i4"), density=0.4,
                       allow_pcm=False)
    _check_stream(data)
