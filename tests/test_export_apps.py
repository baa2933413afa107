"""Export writers + CLI app tests (thumbnailer / extractor / analyser)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fixtures import containers as C
from fixtures.h264enc import make_stream
from minivideo_tpu.export import image as IMG

PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def planes():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    cb = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    cr = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    return y, cb, cr


def test_png_writer_roundtrip(planes, tmp_path):
    y, cb, cr = planes
    rgb = IMG.yuv420_to_rgb(y, cb, cr)
    path = tmp_path / "out.png"
    IMG.write_png(str(path), rgb)
    img = np.asarray(PIL.open(path).convert("RGB"))
    np.testing.assert_array_equal(img, rgb)


def test_bmp_writer_roundtrip(planes, tmp_path):
    y, cb, cr = planes
    rgb = IMG.yuv420_to_rgb(y, cb, cr)
    path = tmp_path / "out.bmp"
    IMG.write_bmp(str(path), rgb)
    img = np.asarray(PIL.open(path).convert("RGB"))
    np.testing.assert_array_equal(img, rgb)


def test_tga_writer_roundtrip(planes, tmp_path):
    y, cb, cr = planes
    rgb = IMG.yuv420_to_rgb(y, cb, cr)
    path = tmp_path / "out.tga"
    IMG.write_tga(str(path), rgb)
    img = np.asarray(PIL.open(path).convert("RGB"))
    np.testing.assert_array_equal(img, rgb)


def test_jpeg_writer_decodable(planes, tmp_path):
    y, cb, cr = planes
    path = tmp_path / "out.jpg"
    IMG.write_jpeg(str(path), y, cb, cr, quality=90)
    img = PIL.open(path)
    img.load()
    assert img.size == (64, 48)
    # lossy: smooth gradient should roundtrip within tolerance
    ys = np.tile(np.arange(64, dtype=np.uint8) * 2, (48, 1))
    path2 = tmp_path / "grad.jpg"
    IMG.write_jpeg(str(path2), ys, np.full((24, 32), 128, np.uint8),
                   np.full((24, 32), 128, np.uint8), quality=95)
    dec = np.asarray(PIL.open(path2).convert("YCbCr"))[:, :, 0]
    assert abs(dec.astype(int) - ys.astype(int)).mean() < 3.0


def test_yuv_writer(planes, tmp_path):
    y, cb, cr = planes
    path = tmp_path / "out.yuv"
    IMG.write_yuv420(str(path), y, cb, cr)
    raw = np.fromfile(path, dtype=np.uint8)
    assert raw.size == 48 * 64 * 3 // 2
    np.testing.assert_array_equal(raw[:48 * 64].reshape(48, 64), y)


def _run_cli(mod, *args):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    return subprocess.run(
        [sys.executable, "-m", f"minivideo_tpu.apps.{mod}", *args],
        capture_output=True, text=True, env=env, timeout=300)


@pytest.fixture(scope="module")
def clip264(tmp_path_factory):
    d = tmp_path_factory.mktemp("clips")
    data = make_stream(width_mbs=4, height_mbs=3, n_pictures=2, seed=88,
                       mb_kinds=("i16", "i4"), density=0.3,
                       allow_pcm=False)
    p = d / "clip.264"
    p.write_bytes(data)
    mp4 = d / "clip.mp4"
    mp4.write_bytes(C.write_mp4(data, 64, 48))
    return p, mp4


def test_thumbnailer_cli(clip264, tmp_path):
    es, mp4 = clip264
    r = _run_cli("thumbnailer", "-i", str(mp4), "-o", str(tmp_path),
                 "-f", "png", "-n", "2")
    assert r.returncode == 0, r.stderr
    outs = r.stdout.strip().splitlines()
    assert len(outs) == 2
    for o in outs:
        img = PIL.open(o)
        assert img.size == (64, 48)


def test_thumbnailer_cli_yuv(clip264, tmp_path):
    es, _ = clip264
    r = _run_cli("thumbnailer", "-i", str(es), "-o", str(tmp_path),
                 "-f", "yuv420", "-n", "1")
    assert r.returncode == 0, r.stderr
    out = r.stdout.strip()
    assert os.path.getsize(out) == 64 * 48 * 3 // 2


def test_thumbnailer_cli_missing_input(tmp_path):
    r = _run_cli("thumbnailer", "-i", "/nonexistent.mp4",
                 "-o", str(tmp_path))
    assert r.returncode == 1
    assert "not found" in r.stderr


def test_extractor_cli(clip264, tmp_path):
    _, mp4 = clip264
    r = _run_cli("extractor", "-i", str(mp4), "-o", str(tmp_path), "-v")
    assert r.returncode == 0, r.stderr
    out = r.stdout.strip()
    assert out.endswith(".264")
    # extracted ES must itself decode
    from minivideo_tpu.models.h264.decoder import decode_annexb
    pics = decode_annexb(open(out, "rb").read())
    assert len(pics) == 2


def test_extractor_cli_ts_fragments(clip264, tmp_path):
    """ES extraction from a TS file: the muxer reassembles each PES
    unit from its scattered transport-packet fragments
    (Track.fragments) and the extracted ES decodes to the same
    pictures as the original stream."""
    import numpy as np
    import fixtures.containers as C
    from minivideo_tpu.models.h264.decoder import decode_annexb
    es, _ = clip264
    data = es.read_bytes()
    ts = tmp_path / "clip.ts"
    ts.write_bytes(C.write_ts(data))
    r = _run_cli("extractor", "-i", str(ts), "-o", str(tmp_path), "-v")
    assert r.returncode == 0, r.stderr
    out = r.stdout.strip()
    ref = decode_annexb(data)
    got = decode_annexb(open(out, "rb").read())
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a.y, b.y)


def test_extractor_cli_pes(clip264, tmp_path):
    _, mp4 = clip264
    r = _run_cli("extractor", "-i", str(mp4), "-o", str(tmp_path), "-v",
                 "--pes")
    assert r.returncode == 0, r.stderr
    out = r.stdout.strip()
    data = open(out, "rb").read()
    assert data[:4] == b"\x00\x00\x01\xe0"


def test_analyser_cli(clip264):
    es, mp4 = clip264
    r = _run_cli("analyser", str(mp4), "--json")
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout)
    assert info["container"] == "MP4"
    assert info["tracks"][0]["codec"] == "H264"
    assert info["tracks"][0]["width"] == 64
    r2 = _run_cli("analyser", str(es), "--samples", "0", "--json")
    rows = json.loads(r2.stdout)
    assert len(rows) > 0
    assert rows[0]["type"] in ("VIDEO_PARAM", "VIDEO_SYNC")


def test_api_infos():
    """API parity: mv_print_infos / mv_get_infos / mv_endianness
    (reference minivideo.h:59-149)."""
    import io
    import sys
    from minivideo_tpu.api import mv_endianness, mv_get_infos
    from minivideo_tpu.settings import Settings, print_infos

    info = mv_get_infos()
    assert info["version_major"] >= 0
    assert info["endianness"] == mv_endianness() in (1234, 4321)
    assert isinstance(info["native_runtime"], bool)
    buf = io.StringIO()
    print_infos(file=buf)
    assert "version" in buf.getvalue()
    s = Settings.from_env({"MINIVIDEO_TPU_ENGINE": "bogus",
                           "MINIVIDEO_TPU_NO_NATIVE": "1"})
    assert s.engine == "fused" and s.use_native is False


def test_analyser_hex_and_fourcc(tmp_path, capsys):
    """mini_analyser parity: hex pane + FourCC helper as CLI modes."""
    from fixtures.h264enc import make_stream
    from fixtures.containers import write_mp4
    from minivideo_tpu.apps.analyser import main as analyser_main
    data = make_stream(width_mbs=4, height_mbs=3, n_pictures=1, seed=1,
                       allow_pcm=False)
    p = tmp_path / "h.mp4"
    p.write_bytes(write_mp4(data, 64, 48))
    assert analyser_main([str(p), "--hex", "0:0:32"]) == 0
    out = capsys.readouterr().out
    assert "00000000" in out and "|" in out
    assert analyser_main(["--fourcc", "0x61766331"]) == 0
    out = capsys.readouterr().out
    assert "avc1" in out and "H264" in out


def test_device_yuv420_to_rgb_matches_host():
    """ops/color.py device conversion is bit-compatible with the host
    (reference mb_to_rgb) integer BT.601 path, batched."""
    import numpy as np
    from minivideo_tpu.export.image import yuv420_to_rgb
    from minivideo_tpu.ops.color import yuv420_to_rgb_device
    rng = np.random.default_rng(3)
    B, H, W = 3, 48, 64
    y = rng.integers(0, 256, (B, H, W), dtype=np.uint8)
    cb = rng.integers(0, 256, (B, H // 2, W // 2), dtype=np.uint8)
    cr = rng.integers(0, 256, (B, H // 2, W // 2), dtype=np.uint8)
    dev = np.asarray(yuv420_to_rgb_device(y, cb, cr))
    for i in range(B):
        np.testing.assert_array_equal(dev[i],
                                      yuv420_to_rgb(y[i], cb[i], cr[i]))


def test_decode_want_rgb_device_path(clip264):
    """mv_decode(want_rgb=True) on a device engine carries the
    device-converted RGB (ops/color.py wired into the decode readback);
    it must match the host converter on the same coded planes."""
    from minivideo_tpu.export.image import yuv420_to_rgb
    from minivideo_tpu.models.h264.decoder import decode_annexb
    es, _ = clip264
    data = es.read_bytes()
    pics = decode_annexb(data, max_pictures=2, engine="jax",
                         want_rgb=True)
    assert pics and all(p.rgb is not None for p in pics)
    for p in pics:
        np.testing.assert_array_equal(p.rgb,
                                      yuv420_to_rgb(p.y, p.cb, p.cr))
        # cropped_rgb crops the device plane (even dims: identical to
        # converting the cropped planes)
        np.testing.assert_array_equal(p.cropped_rgb(),
                                      yuv420_to_rgb(*p.cropped()))
    # np engine leaves rgb=None and cropped_rgb falls back to host
    pics_np = decode_annexb(data, max_pictures=1, engine="np",
                            want_rgb=True)
    assert pics_np[0].rgb is None
    np.testing.assert_array_equal(pics_np[0].cropped_rgb(),
                                  yuv420_to_rgb(*pics_np[0].cropped()))
