"""Bit-exactness of the batched JAX wavefront reconstruction vs the
sequential numpy oracle (models/h264/recon_np.py), and of the JAX
transforms vs the numpy transforms."""

import numpy as np
import pytest

from fixtures.h264enc import make_stream
from minivideo_tpu.models.h264 import transform_np as tnp
from minivideo_tpu.models.h264.decoder import H264Decoder
from minivideo_tpu.models.h264.nalu import parse_nalu, split_annexb
from minivideo_tpu.models.h264.recon_np import reconstruct_frame
from minivideo_tpu.ops import transform as tj
from minivideo_tpu.ops.recon import pack_frames
from minivideo_tpu.ops.recon_lane import reconstruct_frames_lane
from minivideo_tpu.ops.recon_wave import reconstruct_frames_wave


def _parse_stream(data):
    dec = H264Decoder()
    nalus = [parse_nalu(raw, off) for off, raw in split_annexb(data)]
    idr = [n for n in nalus if n.nal_unit_type == 5]
    for n in nalus:
        if n.nal_unit_type in (7, 8):
            dec.feed_nalu(n)
    frames = []
    sps = pps = None
    # group by access unit: first_mb == 0 starts a picture
    from minivideo_tpu.models.h264.decoder import group_idr_access_units
    for group in group_idr_access_units(idr):
        fs, sps, pps, som = dec.parse_idr_syntax(group)
        frames.append((fs, som))
    return frames, sps, pps


@pytest.mark.parametrize("qp", [0, 10, 26, 36, 47, 51])
def test_transforms_bitexact(qp):
    rng = np.random.default_rng(qp)
    ls = tnp.level_scale_4x4(np.full(16, 16, np.int32))
    ls8 = tnp.level_scale_8x8(np.full(64, 16, np.int32))
    c4 = rng.integers(-256, 257, (50, 4, 4))
    want = np.stack([tnp.idct_4x4(tnp.dequant_4x4(c, qp, ls)) for c in c4])
    got = np.asarray(tj.idct_4x4(tj.dequant_4x4(
        np.asarray(c4, np.int32), np.full(50, qp), np.asarray(ls))))
    np.testing.assert_array_equal(want, got)

    c8 = rng.integers(-256, 257, (20, 8, 8))
    want8 = np.stack([tnp.idct_8x8(tnp.dequant_8x8(c, qp, ls8)) for c in c8])
    got8 = np.asarray(tj.idct_8x8(tj.dequant_8x8(
        np.asarray(c8, np.int32), np.full(20, qp), np.asarray(ls8))))
    np.testing.assert_array_equal(want8, got8)

    cdc = rng.integers(-256, 257, (20, 4, 4))
    wantd = np.stack([tnp.luma_dc_transform(c, qp, ls) for c in cdc])
    gotd = np.asarray(tj.luma_dc_transform(
        np.asarray(cdc, np.int32), np.full(20, qp), np.asarray(ls)))
    np.testing.assert_array_equal(wantd, gotd)

    ccdc = rng.integers(-256, 257, (20, 2, 2))
    qpc = min(qp, 39)
    wantc = np.stack([tnp.chroma_dc_transform(c, qpc, ls) for c in ccdc])
    gotc = np.asarray(tj.chroma_dc_transform(
        np.asarray(ccdc, np.int32), np.full(20, qpc), np.asarray(ls)))
    np.testing.assert_array_equal(wantc, gotc)


_ENGINES = {
    "wave": reconstruct_frames_wave,
    "lane": reconstruct_frames_lane,
}


def _compare(data, engines=("wave", "lane")):
    frames, sps, pps = _parse_stream(data)
    packed = pack_frames(frames, sps, pps)
    for engine in engines:
        fn = _ENGINES[engine]
        yj, cbj, crj = (np.asarray(a) for a in fn(packed))
        for i, (fs, som) in enumerate(frames):
            y, cb, cr = reconstruct_frame(fs, sps, pps, som)
            np.testing.assert_array_equal(
                y, yj[i], err_msg=f"Y pic {i} [{engine}]")
            np.testing.assert_array_equal(
                cb, cbj[i], err_msg=f"Cb pic {i} [{engine}]")
            np.testing.assert_array_equal(
                cr, crj[i], err_msg=f"Cr pic {i} [{engine}]")


@pytest.mark.parametrize("kinds", [("i16",), ("i4",), ("i16", "i4")])
def test_recon_vs_oracle_kinds(kinds):
    data = make_stream(width_mbs=5, height_mbs=4, n_pictures=2, seed=33,
                       mb_kinds=kinds, density=0.4, allow_pcm=True)
    _compare(data)


@pytest.mark.parametrize("kinds", [("i8",), ("i16", "i4", "i8")])
def test_recon_vs_oracle_i8(kinds):
    data = make_stream(width_mbs=5, height_mbs=4, n_pictures=2, seed=34,
                       mb_kinds=kinds, density=0.4, transform_8x8=True,
                       allow_pcm=False)
    _compare(data)


@pytest.mark.parametrize("seed", range(60, 66))
def test_recon_vs_oracle_fuzz(seed):
    data = make_stream(width_mbs=6, height_mbs=5, n_pictures=2, seed=seed,
                       mb_kinds=("i16", "i4"), density=0.35, allow_pcm=True)
    _compare(data)


def test_recon_vs_oracle_qp_extremes():
    for qp in (0, 12, 39, 51):
        data = make_stream(width_mbs=4, height_mbs=3, n_pictures=1, seed=70,
                           qp=qp, mb_kinds=("i16", "i4"), density=0.5,
                           allow_pcm=False)
        _compare(data)


def test_recon_multi_slice():
    data = make_stream(width_mbs=4, height_mbs=4, n_pictures=1, seed=71,
                       n_slices=3, mb_kinds=("i16", "i4"), density=0.4,
                       allow_pcm=False)
    _compare(data)
