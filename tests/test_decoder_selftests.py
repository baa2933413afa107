"""Decoder self-tests that don't need the reference binary: encoder intent
vs parsed syntax, multi-slice, PCM, parameter-set handling, capability
gates (UnsupportedStream parity with reference h264_slice.c:229-262)."""

import numpy as np
import pytest

from fixtures import h264enc as E
from minivideo_tpu.bitio import BitReader
from minivideo_tpu.models.h264.decoder import H264Decoder, decode_annexb
from minivideo_tpu.models.h264.nalu import (escape_rbsp, parse_nalu,
                                            split_annexb, unescape_rbsp)
from minivideo_tpu.models.h264.params import (UnsupportedStream, parse_pps,
                                              parse_sps)
from minivideo_tpu.models.h264.syntax import KIND_IPCM


def test_epb_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(200):
        raw = bytes(rng.integers(0, 4, size=rng.integers(1, 60),
                                 dtype=np.uint8))
        esc = escape_rbsp(raw)
        assert b"\x00\x00\x00" not in esc
        assert b"\x00\x00\x01" not in esc
        assert b"\x00\x00\x02" not in esc
        assert unescape_rbsp(esc) == raw


def test_split_annexb():
    data = (b"\x00\x00\x00\x01\x67\xAA" b"\x00\x00\x01\x68\xBB"
            b"\x00\x00\x00\x01\x65\xCC\xDD")
    units = split_annexb(data)
    assert [u[1][0] for u in units] == [0x67, 0x68, 0x65]
    assert units[2][1] == b"\x65\xCC\xDD"


def test_sps_parse_fields():
    rbsp = E.encode_sps(12, 9, profile=100, crop=(1, 2, 0, 3))
    sps = parse_sps(rbsp)
    assert sps.pic_width_in_mbs == 12
    assert sps.pic_height_in_map_units == 9
    assert sps.profile_idc == 100
    assert sps.width == 192 and sps.height == 144
    assert sps.cropped_width == 192 - 2 * 3
    assert sps.cropped_height == 144 - 2 * 3


def test_pps_parse_fields():
    sps = parse_sps(E.encode_sps(4, 3))
    pps = parse_pps(E.encode_pps(qp=30, chroma_qp_offset=-2), {0: sps})
    assert pps.pic_init_qp == 30
    assert pps.chroma_qp_index_offset == -2
    assert not pps.entropy_coding_mode_flag


def test_unsupported_chroma_format():
    # hand-build a high-profile SPS with chroma_format_idc = 2 (4:2:2)
    w = E.BitWriter()
    w.u(100, 8)
    w.u(0, 8)
    w.u(30, 8)
    w.ue(0)
    w.ue(2)   # chroma_format_idc = 4:2:2
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.ue(3)
    w.ue(2)
    w.u(1, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.rbsp_trailing()
    with pytest.raises(UnsupportedStream):
        parse_sps(w.to_bytes())


def test_multi_slice_picture():
    data = make = E.make_stream(width_mbs=4, height_mbs=4, n_pictures=1,
                                seed=13, n_slices=4, allow_pcm=False,
                                mb_kinds=("i16", "i4"), density=0.4)
    single = E.make_stream(width_mbs=4, height_mbs=4, n_pictures=1,
                           seed=13, n_slices=1, allow_pcm=False,
                           mb_kinds=("i16", "i4"), density=0.4)
    pics = decode_annexb(data)
    assert len(pics) == 1
    # multi-slice partitioning changes prediction at slice boundaries, so
    # just check the decode completes and covers all MBs
    assert pics[0].syntax.parsed.all()
    pics2 = decode_annexb(single)
    assert pics2[0].syntax.parsed.all()


def test_pcm_roundtrip():
    data = E.make_stream(width_mbs=3, height_mbs=3, n_pictures=1, seed=14,
                         mb_kinds=("i16",), density=0.0, allow_pcm=True)
    # regenerate until a PCM MB appears
    seed = 14
    while True:
        pics = decode_annexb(data)
        if (pics[0].syntax.mb_kind == KIND_IPCM).any():
            break
        seed += 1
        data = E.make_stream(width_mbs=3, height_mbs=3, n_pictures=1,
                             seed=seed, mb_kinds=("i16",), density=0.0,
                             allow_pcm=True)
    fs = pics[0].syntax
    mb = int(np.nonzero(fs.mb_kind == KIND_IPCM)[0][0])
    wmb = fs.width_mbs
    my, mx = (mb // wmb) * 16, (mb % wmb) * 16
    np.testing.assert_array_equal(
        pics[0].y[my:my + 16, mx:mx + 16], fs.pcm_y[mb])


def test_decoder_tolerates_garbage_nalus():
    good = E.make_stream(width_mbs=3, height_mbs=3, n_pictures=1, seed=15,
                         allow_pcm=False)
    garbage = b"\x00\x00\x00\x01\x41\xff\xfe\x00\x12"
    pics = decode_annexb(good + garbage)
    assert len(pics) == 1


def test_qp_delta_chain_wraps():
    # QP wrap-around via mod-52 arithmetic (spec 7-37)
    data = E.make_stream(width_mbs=4, height_mbs=3, n_pictures=1, seed=16,
                         qp=1, mb_kinds=("i16",), density=0.2,
                         allow_pcm=False)
    pics = decode_annexb(data)
    assert ((pics[0].syntax.qpy >= 0) & (pics[0].syntax.qpy <= 51)).all()


@pytest.mark.parametrize("seed", range(6))
def test_corrupt_stream_error_tolerance(seed):
    """Bit-flipped slice payloads must produce tolerated per-NALU errors
    (reference: up to 64 consecutive errors, h264.c:181-187), never a
    crash or an unhandled exception — for BOTH the native parser and
    the Python fallback."""
    import os
    data = bytearray(E.make_stream(width_mbs=5, height_mbs=4,
                                   n_pictures=3, seed=40 + seed,
                                   mb_kinds=("i16", "i4"), density=0.4,
                                   allow_pcm=False))
    rng = np.random.default_rng(seed)
    # flip bytes in the back half (slice data, past the headers)
    for pos in rng.integers(len(data) // 2, len(data), 25):
        data[int(pos)] ^= int(rng.integers(1, 256))
    for no_native in ("0", "1"):
        old = os.environ.get("MINIVIDEO_TPU_NO_NATIVE")
        os.environ["MINIVIDEO_TPU_NO_NATIVE"] = no_native
        try:
            pics = decode_annexb(bytes(data))
            assert isinstance(pics, list)    # some pictures may fail
        finally:
            if old is None:
                os.environ.pop("MINIVIDEO_TPU_NO_NATIVE", None)
            else:
                os.environ["MINIVIDEO_TPU_NO_NATIVE"] = old
