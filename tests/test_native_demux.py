"""Native C++ demuxers vs the Python demuxers: table-for-table parity.

Every fixture container is parsed twice — MINIVIDEO_TPU_NO_NATIVE=1
(Python) and native — and all track metadata + the five sample arrays
must match exactly.
"""

import os

import numpy as np
import pytest

import fixtures.containers as C
from fixtures.h264enc import make_stream
from minivideo_tpu.api import mv_close, mv_open, mv_parse
from minivideo_tpu.native import available

pytestmark = pytest.mark.skipif(not available(),
                                reason="native library not built")

_FIELDS = ("stream_type", "stream_fcc", "stream_codec", "width", "height",
           "channel_count", "sampling_rate", "bit_per_sample",
           "framerate", "framerate_num", "framerate_base", "dar",
           "par_h", "par_v", "color_matrix", "color_full_range",
           "crop_width", "crop_height", "interlaced",
           "bitrate_max", "bitrate_avg",
           "frame_count", "frame_count_idr", "stream_size",
           "bitrate", "bitrate_mode", "nal_length_size",
           "sample_per_frames")


def _parse(path, force_python):
    old = os.environ.get("MINIVIDEO_TPU_NO_NATIVE")
    try:
        if force_python:
            os.environ["MINIVIDEO_TPU_NO_NATIVE"] = "1"
        else:
            os.environ.pop("MINIVIDEO_TPU_NO_NATIVE", None)
        m = mv_open(path)
        ok = mv_parse(m)
        mv_close(m)
        return ok, m
    finally:
        if old is None:
            os.environ.pop("MINIVIDEO_TPU_NO_NATIVE", None)
        else:
            os.environ["MINIVIDEO_TPU_NO_NATIVE"] = old


def _assert_tracks_equal(path):
    ok_py, m_py = _parse(path, force_python=True)
    ok_nat, m_nat = _parse(path, force_python=False)
    assert ok_py and ok_nat
    assert len(m_py.tracks) == len(m_nat.tracks)
    for tp, tn in zip(m_py.tracks, m_nat.tracks):
        for f in _FIELDS:
            vp, vn = getattr(tp, f), getattr(tn, f)
            if isinstance(vp, float):
                assert vn == pytest.approx(vp), (f, vp, vn)
            else:
                assert vp == vn, (f, vp, vn)
        assert abs(tp.stream_duration_ms - tn.stream_duration_ms) < 1e-6
        assert tp.parameter_sets == tn.parameter_sets
        np.testing.assert_array_equal(tp.sample_type, tn.sample_type)
        np.testing.assert_array_equal(tp.sample_size, tn.sample_size)
        np.testing.assert_array_equal(tp.sample_offset, tn.sample_offset)
        np.testing.assert_array_equal(tp.sample_pts, tn.sample_pts)
        np.testing.assert_array_equal(tp.sample_dts, tn.sample_dts)
    return m_nat


@pytest.fixture(scope="module")
def annexb():
    return make_stream(width_mbs=4, height_mbs=3, n_pictures=3, seed=5,
                       allow_pcm=False)


def test_mp4_parity(annexb, tmp_path):
    p = tmp_path / "a.mp4"
    p.write_bytes(C.write_mp4(annexb, 64, 48))
    m = _assert_tracks_equal(str(p))
    t = m.tracks_video[0]
    assert t.sample_count == 3
    assert len(t.parameter_sets) == 2


def test_avi_parity(annexb, tmp_path):
    p = tmp_path / "a.avi"
    p.write_bytes(C.write_avi(annexb, 64, 48))
    _assert_tracks_equal(str(p))


def test_wave_parity(tmp_path):
    pcm = (np.sin(np.arange(1600) / 10) * 12000).astype(np.int16)
    p = tmp_path / "t.wav"
    p.write_bytes(C.write_wav(pcm, 16000))
    m = _assert_tracks_equal(str(p))
    assert m.tracks_audio[0].sampling_rate == 16000


def test_wave_extensible_parity(tmp_path):
    pcm = (np.sin(np.arange(32000) / 10) * 12000).astype(np.int16)
    p = tmp_path / "ext.wav"
    p.write_bytes(C.write_wav_extensible(pcm, 16000, channels=2))
    m = _assert_tracks_equal(str(p))
    t = m.tracks_audio[0]
    assert t.stream_codec.name == "LPCM"     # via SubFormat GUID
    assert abs(t.stream_duration_ms - 1000.0) < 0.5   # via fact chunk
    assert t.wave_fmt["channel_mask"] == 0x3
    assert [c["sample_offset"] for c in t.wave_cue_points] == [0, 4000]


def test_ps_parity(annexb, tmp_path):
    p = tmp_path / "a.mpg"
    p.write_bytes(C.write_ps(annexb))
    _assert_tracks_equal(str(p))


@pytest.mark.parametrize("audio", ["mp2", "ac3", "dts"])
def test_ps_parity_es_sniffers(audio, tmp_path):
    """Python and native PS paths report identical ES-sniffed metadata
    (dimensions, DAR, framerate, audio rates)."""
    p = tmp_path / f"seq_{audio}.mpg"
    p.write_bytes(C.write_ps_mpeg2(audio=audio))
    m = _assert_tracks_equal(str(p))
    assert m.tracks_video[0].width == 720
    assert m.tracks_video[0].framerate == 25.0


def test_es_parity(annexb, tmp_path):
    p = tmp_path / "a.264"
    p.write_bytes(annexb)
    m = _assert_tracks_equal(str(p))
    assert m.tracks_video[0].frame_count_idr == 3


def test_mp3_parity(tmp_path):
    p = tmp_path / "t.mp3"
    p.write_bytes(C.write_mp3(n_frames=32))
    m = _assert_tracks_equal(str(p))
    assert m.tracks_audio[0].sample_count == 32


def test_native_decode_end_to_end(annexb, tmp_path):
    """Native-demuxed MP4 decodes to the same pictures as Python path."""
    from minivideo_tpu.api import mv_decode
    p = tmp_path / "a.mp4"
    p.write_bytes(C.write_mp4(annexb, 64, 48))

    os.environ.pop("MINIVIDEO_TPU_NO_NATIVE", None)
    m = mv_open(str(p))
    assert mv_parse(m)
    pics = mv_decode(m, picture_number=3)
    mv_close(m)

    from minivideo_tpu.models.h264.decoder import decode_annexb
    ref = decode_annexb(annexb, max_pictures=3)
    assert len(pics) == len(ref) == 3
    for a, b in zip(pics, ref):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.cb, b.cb)
        np.testing.assert_array_equal(a.cr, b.cr)


def test_native_corrupt_box_clamping(annexb, tmp_path):
    """A corrupt mp4 box size must not crash the native walker."""
    data = bytearray(C.write_mp4(annexb, 64, 48))
    # corrupt the moov size field to something enormous
    i = data.find(b"moov") - 4
    data[i:i + 4] = (0x7FFFFFFF).to_bytes(4, "big")
    p = tmp_path / "bad.mp4"
    p.write_bytes(bytes(data))
    ok, m = _parse(str(p), force_python=False)
    # parse may fail or succeed, but must not crash
    assert isinstance(ok, bool)


def test_avi_opendml_parity(annexb, tmp_path):
    """OpenDML indx/ix super-index: Python and native demuxers agree
    (reference parse_indx avi.c:621-743)."""
    p = tmp_path / "odml.avi"
    p.write_bytes(C.write_avi(annexb, 64, 48, opendml=True))
    m = _assert_tracks_equal(str(p))
    t = m.tracks_video[0]
    assert t.sample_count == 3
    assert t.frame_count_idr == 3


def test_mp4_visual_extensions_parity(annexb, tmp_path):
    """btrt/pasp/clap/colr/fiel boxes populate track metadata
    identically in both demuxers (reference mp4.c:1941-2170)."""
    from minivideo_tpu.codecs import ColorMatrix
    p = tmp_path / "ext.mp4"
    p.write_bytes(C.write_mp4(annexb, 64, 48, visual_ext=True))
    m = _assert_tracks_equal(str(p))
    t = m.tracks_video[0]
    assert (t.par_h, t.par_v) == (4, 3)
    assert (t.crop_width, t.crop_height) == (62, 46)
    assert t.color_matrix == int(ColorMatrix.BT709)
    assert t.color_full_range == 1
    assert t.interlaced == 0
    assert (t.bitrate_max, t.bitrate_avg) == (900000, 750000)


@pytest.mark.parametrize("lacing", ["none", "xiph"])
def test_mkv_parity(annexb, lacing, tmp_path):
    """Native MKV demuxer (demux.cc parse_mkv) vs containers/mkv.py:
    Info/TrackEntry/Cluster indexing table-for-table, both exceeding the
    reference's extract-nothing skeleton (mkv.c:39-197)."""
    p = tmp_path / "a.mkv"
    p.write_bytes(C.write_mkv(annexb, 64, 48, lacing=lacing))
    m = _assert_tracks_equal(str(p))
    t = m.tracks_video[0]
    assert t.sample_count == 3
    assert len(t.parameter_sets) == 2
    assert t.length_prefixed


def test_ts_parity(annexb, tmp_path):
    """Native MPEG-TS demuxer (demux.cc parse_ts) vs containers/ts.py:
    PAT/PMT walk + PES reassembly incl. the per-sample fragment lists
    (the reference's ts.c is an empty stub, ts.c:40-71)."""
    p = tmp_path / "a.ts"
    p.write_bytes(C.write_ts(annexb))
    ok_py, m_py = _parse(str(p), force_python=True)
    ok_nat, m_nat = _parse(str(p), force_python=False)
    assert ok_py and ok_nat
    m = _assert_tracks_equal(str(p))
    t = m.tracks_video[0]
    assert t.sample_count == 3
    # fragment lists (scattered transport payloads) must match exactly
    for tp, tn in zip(m_py.tracks, m_nat.tracks):
        assert (tp.fragments is None) == (tn.fragments is None)
        if tp.fragments is not None:
            assert [list(f) for f in tp.fragments] == \
                   [list(f) for f in tn.fragments]


def test_mkv_ts_native_decode_end_to_end(annexb, tmp_path):
    """MKV and TS through the native demux path decode to the same
    pictures as the raw Annex-B stream."""
    import numpy as np
    from minivideo_tpu.api import mv_decode
    from minivideo_tpu.models.h264.decoder import decode_annexb
    ref = decode_annexb(annexb)
    for name, blob in (("a.mkv", C.write_mkv(annexb, 64, 48)),
                       ("a.ts", C.write_ts(annexb))):
        p = tmp_path / name
        p.write_bytes(blob)
        ok, m = _parse(str(p), force_python=False)
        assert ok
        m2 = mv_open(str(p))
        assert mv_parse(m2)
        pics = mv_decode(m2, picture_number=3)
        assert len(pics) == len(ref)
        for a, b in zip(pics, ref):
            np.testing.assert_array_equal(a.y, b.y)
        mv_close(m2)


def test_mkv_info_after_tracks_parity(annexb, tmp_path):
    """TimestampScale from an Info element that FOLLOWS Tracks and
    Clusters (legal EBML ordering) must still scale every timestamp —
    both demuxers apply the timescale after the full segment walk."""
    p = tmp_path / "late_info.mkv"
    p.write_bytes(C.write_mkv(annexb, 64, 48, info_last=True,
                              timescale=500000))
    m = _assert_tracks_equal(str(p))
    t = m.tracks_video[0]
    # cluster 1 starts at tick 1000 -> 500 us/tick -> 0.5 ms * 1000
    assert t.sample_pts.max() >= 1000 * 500000
