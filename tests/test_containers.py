"""Container demuxer tests: probe + demux + end-to-end decode through the
public API for MP4 / AVI / WAVE / MPEG-PS / MP3 / Annex-B ES."""

import numpy as np
import pytest

from fixtures import containers as C
from fixtures.h264enc import make_stream
from minivideo_tpu.api import mv_close, mv_decode, mv_open, mv_parse
from minivideo_tpu.codecs import Codec, Container, StreamType
from minivideo_tpu.models.h264.decoder import decode_annexb


@pytest.fixture(scope="module")
def annexb():
    return make_stream(width_mbs=4, height_mbs=3, n_pictures=3, seed=77,
                       mb_kinds=("i16", "i4"), density=0.35,
                       allow_pcm=False)


def _open(tmp_path, name, data):
    p = tmp_path / name
    p.write_bytes(data)
    return mv_open(str(p))


def test_es_roundtrip(annexb, tmp_path):
    m = _open(tmp_path, "clip.264", annexb)
    assert m.container == Container.ES
    assert mv_parse(m)
    t = m.tracks_video[0]
    assert t.frame_count_idr == 3
    pics = mv_decode(m, picture_number=3)
    ref = decode_annexb(annexb)
    assert len(pics) == 3
    for a, b in zip(pics, ref):
        np.testing.assert_array_equal(a.y, b.y)
    mv_close(m)


def test_mp4_demux_and_decode(annexb, tmp_path):
    mp4 = C.write_mp4(annexb, 64, 48)
    m = _open(tmp_path, "clip.mp4", mp4)
    assert m.container == Container.MP4
    assert mv_parse(m)
    t = m.tracks_video[0]
    assert t.stream_codec == Codec.H264
    assert t.width == 64 and t.height == 48
    assert t.sample_count == 3
    assert t.frame_count_idr == 3
    assert len(t.parameter_sets) == 2          # SPS + PPS from avcC
    # timestamps: 30000/1001 timescale
    assert t.sample_pts[1] == int(1001 * 1e9 / 30000)
    pics = mv_decode(m, picture_number=3)
    ref = decode_annexb(annexb)
    assert len(pics) == 3
    for a, b in zip(pics, ref):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.cb, b.cb)
    mv_close(m)


def test_avi_demux_and_decode(annexb, tmp_path):
    avi = C.write_avi(annexb, 64, 48)
    m = _open(tmp_path, "clip.avi", avi)
    assert m.container == Container.AVI
    assert mv_parse(m)
    t = m.tracks_video[0]
    assert t.sample_count == 3
    assert t.framerate == 25.0
    pics = mv_decode(m, picture_number=3)
    ref = decode_annexb(annexb)
    assert len(pics) == 3
    for a, b in zip(pics, ref):
        np.testing.assert_array_equal(a.y, b.y)
    mv_close(m)


def test_avi_opendml_indx(annexb, tmp_path):
    """OpenDML super-index + ix00 standard index, no idx1 (the layout of
    >1 GiB AVIX files; reference parse_indx avi.c:621-743)."""
    avi = C.write_avi(annexb, 64, 48, opendml=True)
    assert b"idx1" not in avi and b"indx" in avi and b"ix00" in avi
    m = _open(tmp_path, "odml.avi", avi)
    assert mv_parse(m)
    t = m.tracks_video[0]
    assert t.sample_count == 3
    assert t.frame_count_idr == 3          # keyframe bit 31 clear
    pics = mv_decode(m, picture_number=3)
    ref = decode_annexb(annexb)
    assert len(pics) == 3
    for a, b in zip(pics, ref):
        np.testing.assert_array_equal(a.y, b.y)
    mv_close(m)


@pytest.mark.parametrize("lacing", ["none", "xiph"])
def test_mkv_demux_and_decode(annexb, lacing, tmp_path):
    """MKV cluster indexing (SimpleBlocks, lacing) + H.264 decode —
    exceeds the reference, whose MKV parser extracts nothing
    (mkv.c:39-197)."""
    mkv = C.write_mkv(annexb, 64, 48, lacing=lacing)
    m = _open(tmp_path, "clip.mkv", mkv)
    assert m.container == Container.MKV
    assert mv_parse(m)
    t = m.tracks_video[0]
    assert t.stream_codec == Codec.H264
    assert t.sample_count == 3
    assert t.frame_count_idr == 3
    assert len(t.parameter_sets) == 2          # SPS + PPS from avcC
    assert (t.width, t.height) == (64, 48)
    pics = mv_decode(m, picture_number=3)
    ref = decode_annexb(annexb)
    assert len(pics) == 3
    for a, b in zip(pics, ref):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.cb, b.cb)
    mv_close(m)


def test_ts_demux_and_decode(annexb, tmp_path):
    """TS PAT/PMT + PES reassembly from scattered transport packets +
    H.264 decode — the reference stubs TS entirely (ts.c:40-71)."""
    ts = C.write_ts(annexb)
    m = _open(tmp_path, "clip.ts", ts)
    assert m.container == Container.MPEG_TS
    assert mv_parse(m)
    t = m.tracks_video[0]
    assert t.stream_codec == Codec.H264
    assert t.sample_count == 3
    assert t.frame_count_idr == 3
    assert t.fragments is not None
    assert t.sample_pts[0] > 0
    pics = mv_decode(m, picture_number=3)
    ref = decode_annexb(annexb)
    assert len(pics) == 3
    for a, b in zip(pics, ref):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.cr, b.cr)
    mv_close(m)


def test_wave_demux(tmp_path):
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(16000) * 3000).astype(np.int16)
    m = _open(tmp_path, "tone.wav", C.write_wav(pcm, 16000))
    assert m.container == Container.WAVE
    assert mv_parse(m)
    t = m.tracks_audio[0]
    assert t.stream_codec == Codec.LPCM
    assert t.sampling_rate == 16000
    assert t.sample_count == 1
    assert t.stream_size == 32000
    assert abs(t.stream_duration_ms - 1000.0) < 1
    mv_close(m)


def test_wave_extensible_fact_cue(tmp_path):
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(32000) * 3000).astype(np.int16)  # 2ch, 1s
    m = _open(tmp_path, "ext.wav",
              C.write_wav_extensible(pcm, 16000, channels=2))
    assert m.container == Container.WAVE
    assert mv_parse(m)
    t = m.tracks_audio[0]
    # codec resolved through the EXTENSIBLE SubFormat GUID (tag 0x0001)
    assert t.stream_codec == Codec.LPCM
    assert t.channel_count == 2
    assert t.bit_per_sample == 16
    assert t.wave_fmt["channel_mask"] == 0x3
    # duration from fact.dwSampleLength (sample-accurate), not byterate
    assert abs(t.stream_duration_ms - 1000.0) < 0.5
    assert [c["sample_offset"] for c in t.wave_cue_points] == [0, 4000]
    mv_close(m)


def test_ps_es_sniffers_mpeg2_video(tmp_path):
    """PS video tracks carry dimensions/DAR/framerate from the MPEG-2
    sequence header (reference parse_pes_v, pes.c:985-1120) and audio
    tracks carry sampling rate/bitrate (parse_pes_a, pes.c:645-980)."""
    ps = C.write_ps_mpeg2(width=720, height=576, ari=2, fri=3)
    m = _open(tmp_path, "seq.mpg", ps)
    assert mv_parse(m)
    v = m.tracks_video[0]
    assert v.stream_codec == Codec.MPEG2
    assert (v.width, v.height) == (720, 576)
    assert abs(v.dar - 4.0 / 3.0) < 1e-6
    assert v.framerate == 25.0
    assert (v.framerate_num, v.framerate_base) == (25, 1)
    a = m.tracks_audio[0]
    assert a.stream_codec == Codec.MPEG_L2
    assert a.sampling_rate == 48000
    assert a.channel_count == 2
    mv_close(m)


def test_ps_es_sniffers_ac3_dts(tmp_path):
    ps = C.write_ps_mpeg2(width=1920, height=1080, ari=3, fri=4,
                          audio="ac3")
    m = _open(tmp_path, "ac3.mpg", ps)
    assert mv_parse(m)
    v = m.tracks_video[0]
    assert (v.width, v.height) == (1920, 1080)
    assert abs(v.dar - 16.0 / 9.0) < 1e-6
    assert abs(v.framerate - 29.970) < 1e-3
    a = m.tracks_audio[0]
    assert a.stream_codec == Codec.AC3
    assert a.sampling_rate == 44100
    assert a.bitrate == 192000
    mv_close(m)

    ps = C.write_ps_mpeg2(audio="dts")
    m = _open(tmp_path, "dts.mpg", ps)
    assert mv_parse(m)
    a = m.tracks_audio[0]
    assert a.stream_codec == Codec.DTS
    assert a.sampling_rate == 48000
    assert a.bitrate == 768000
    mv_close(m)


def test_ps_demux_and_decode(annexb, tmp_path):
    ps = C.write_ps(annexb)
    m = _open(tmp_path, "clip.mpg", ps)
    assert m.container == Container.MPEG_PS
    assert mv_parse(m)
    t = m.tracks_video[0]
    assert t.stream_codec == Codec.H264
    assert t.sample_count == 3
    assert t.sample_pts[1] > t.sample_pts[0] >= 0
    pics = mv_decode(m, picture_number=3)
    assert len(pics) == 3
    ref = decode_annexb(annexb)
    for a, b in zip(pics, ref):
        np.testing.assert_array_equal(a.y, b.y)
    mv_close(m)


def test_mp3_demux(tmp_path):
    m = _open(tmp_path, "tone.mp3", C.write_mp3(n_frames=32))
    assert m.container == Container.ES_MP3
    assert mv_parse(m)
    t = m.tracks_audio[0]
    assert t.stream_codec == Codec.MPEG_L3
    assert t.sample_count == 32
    assert t.sampling_rate == 44100
    assert t.bitrate_mode.name == "CBR"
    mv_close(m)


def test_probe_misnamed_extension(annexb, tmp_path):
    """Magic bytes beat the extension (reference import.c order)."""
    m = _open(tmp_path, "actually_mp4.wav", C.write_mp4(annexb, 64, 48))
    assert m.container == Container.MP4
    mv_close(m)


def test_filewindow_matches_bytes():
    """FileWindow presents the bytes-API subset the streaming demuxers
    use; fuzz it against real bytes with a tiny window so every access
    pattern crosses window boundaries."""
    import io

    from minivideo_tpu.bufio import FileWindow
    rng = np.random.default_rng(7)
    blob = bytes(rng.integers(0, 8, 200_000, dtype=np.uint8))
    fw = FileWindow(io.BytesIO(blob), len(blob), window=1 << 14)
    assert len(fw) == len(blob)
    idxs = rng.integers(0, len(blob), 200)
    for i in idxs:
        assert fw[int(i)] == blob[int(i)]
    for a, ln in zip(rng.integers(0, len(blob), 100),
                     rng.integers(0, 40_000, 100)):
        a, b = int(a), int(a + ln)
        assert fw[a:b] == blob[a:b]
    assert fw[-4:] == blob[-4:]
    for needle in (b"\x00\x00\x01", b"\x47", b"\x07\x07\x07\x07"):
        start = 0
        for _ in range(50):
            got = fw.find(needle, start)
            assert got == blob.find(needle, start)
            if got == -1:
                break
            start = got + 1
    assert fw.find(b"\x47", 199_990) == blob.find(b"\x47", 199_990)


@pytest.mark.parametrize("path_kind", ["python", "native"])
def test_streaming_demux_bounded_memory(tmp_path, path_kind):
    """A ~1 GB sparse TS file demuxes in a subprocess whose peak RSS
    stays far below the file size — BOTH demux paths stream through a
    bounded window (Python FileWindow and the native windowed Buf;
    reference bitstream.c:51) instead of slurping (round-3 behavior:
    containers/ts.py:57 and demux.cc Buf read the whole file)."""
    import os
    import subprocess
    import sys

    ts = C.write_ts(make_stream(width_mbs=4, height_mbs=3, n_pictures=2,
                                seed=3, allow_pcm=False))
    big = tmp_path / "big.ts"
    with open(big, "wb") as f:
        f.write(ts)
        f.seek((1 << 30) - 1)       # sparse hole to ~1 GiB
        f.write(b"\x00")
    code = (
        "import resource, sys\n"
        "from minivideo_tpu.api import mv_open, mv_parse, mv_close\n"
        "m = mv_open(sys.argv[1])\n"
        "assert mv_parse(m), 'parse failed'\n"
        "assert m.tracks_video and m.tracks_video[0].sample_count > 0\n"
        "mv_close(m)\n"
        "rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss/1024\n"
        "assert rss_mb < 300, f'demux peaked at {rss_mb:.0f} MB RSS'\n"
        "print(f'ok rss={rss_mb:.0f}MB')\n"
    )
    env = dict(os.environ)
    if path_kind == "python":
        env["MINIVIDEO_TPU_NO_NATIVE"] = "1"
    else:
        env.pop("MINIVIDEO_TPU_NO_NATIVE", None)
    r = subprocess.run([sys.executable, "-c", code, str(big)],
                       capture_output=True, text=True, timeout=300,
                       env=env)
    assert r.returncode == 0, r.stderr[-800:]
    assert r.stdout.startswith("ok")


def test_streaming_demuxers_tiny_window(annexb, tmp_path, monkeypatch):
    """Every FileWindow-based demuxer demuxes + decodes correctly with
    a 4 KiB window, forcing window slides across every structure
    boundary (the classic windowed-parser failure mode).  Forces the
    PYTHON demuxers — with the native library present mv_parse would
    otherwise route around FileWindow entirely."""
    import minivideo_tpu.bufio as bufio
    monkeypatch.setattr(bufio, "DEFAULT_WINDOW", 4096)
    monkeypatch.setenv("MINIVIDEO_TPU_NO_NATIVE", "1")
    ref = decode_annexb(annexb)
    fixtures = [("w.ts", C.write_ts(annexb)),
                ("w.mkv", C.write_mkv(annexb, 64, 48)),
                ("w.mpg", C.write_ps(annexb)),
                ("w.264", annexb)]
    for name, blob in fixtures:
        m = _open(tmp_path, name, blob)
        assert mv_parse(m), name
        pics = mv_decode(m, picture_number=3)
        assert len(pics) == len(ref), name
        for a, b in zip(pics, ref):
            np.testing.assert_array_equal(a.y, b.y, err_msg=name)
        mv_close(m)
    # MP3: frame table identical to the large-window parse
    m = _open(tmp_path, "w.mp3", C.write_mp3(n_frames=64))
    assert mv_parse(m)
    assert m.tracks_audio[0].sample_count == 64
    mv_close(m)
