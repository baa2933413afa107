"""Golden tests: bit-exact decoded output vs the reference MiniVideo binary.

The reference decoder is built out-of-tree (see tools/build_reference.sh)
to /tmp/mini_thumbnailer; these tests generate fixture streams with
tests/fixtures/h264enc.py, decode them with both decoders, and require
identical Y/Cb/Cr planes.

Known reference divergences we deliberately do NOT replicate (spec wins;
see also SURVEY.md §7 "reference bugs to not replicate"):
 - pic_order_cnt_type == 2 SPS misparse (reference reads type-1 fields for
   any nonzero type) -> fixtures use poc type 0;
 - I_PCM in CAVLC streams: reference calls initCabacDecodingEngine in its
   I_PCM path (h264_macroblock.c:133), desyncing the parser -> PCM excluded
   from golden configs (covered by self-tests instead);
 - the reference's ES scanner stops searching 32 bytes before EOF
   (esparser.c:65) -> fixtures append a trailing filler NALU;
 - multi-slice pictures: the reference's ES scanner treats every IDR NALU
   as a separate picture -> multi-slice covered by self-tests;
 - QPY == 36: the reference's Intra16x16 DC scaling uses `if (qP > 36)`
   where the spec (8.5.10) says qP >= 36, so its else-branch computes
   `1 << (5 - 6)` — undefined behavior in C (h264_transform.c,
   transform_16x16_lumadc) -> golden QPs avoid landing on exactly 36
   (fixture deltas are +-4, so base QPs stay out of [32, 40]).
"""

import glob
import os
import subprocess

import numpy as np
import pytest

from fixtures.h264enc import make_stream
from minivideo_tpu.models.h264.decoder import decode_annexb

REF_BIN = os.environ.get("MINIVIDEO_REF_BIN", "/tmp/mini_thumbnailer")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BIN),
    reason="reference binary not built (run tools/build_reference.sh)")


def ref_decode(data: bytes, n_pics: int, wmb: int, hmb: int, tmp_path):
    src = tmp_path / "clip.264"
    src.write_bytes(data)
    cwd = tmp_path / "out"
    cwd.mkdir(exist_ok=True)
    subprocess.run(
        [REF_BIN, "-i", str(src), "-o", str(cwd), "-f", "yuv420",
         "-n", str(n_pics), "-e", "unfiltered"],
        capture_output=True, cwd=cwd, timeout=120)
    pics = []
    w, h = wmb * 16, hmb * 16
    for f in sorted(glob.glob(str(cwd / "*.yuv"))):
        raw = np.fromfile(f, dtype=np.uint8)
        assert raw.size == w * h * 3 // 2
        pics.append((raw[:w * h].reshape(h, w),
                     raw[w * h:w * h + w * h // 4].reshape(h // 2, w // 2),
                     raw[w * h + w * h // 4:].reshape(h // 2, w // 2)))
    return pics


def assert_bit_exact(data, wmb, hmb, n_pics, tmp_path):
    mine = decode_annexb(data)
    theirs = ref_decode(data, n_pics, wmb, hmb, tmp_path)
    assert len(theirs) == n_pics, "reference failed to decode all pictures"
    assert len(mine) == n_pics
    for i, (p, (ry, rcb, rcr)) in enumerate(zip(mine, theirs)):
        np.testing.assert_array_equal(p.y, ry, err_msg=f"Y plane, pic {i}")
        np.testing.assert_array_equal(p.cb, rcb, err_msg=f"Cb plane, pic {i}")
        np.testing.assert_array_equal(p.cr, rcr, err_msg=f"Cr plane, pic {i}")


@pytest.mark.parametrize("kinds", [("i16",), ("i4",), ("i16", "i4")])
def test_golden_mb_kinds(kinds, tmp_path):
    data = make_stream(width_mbs=4, height_mbs=3, n_pictures=1, seed=5,
                       mb_kinds=kinds, density=0.4, allow_pcm=False)
    assert_bit_exact(data, 4, 3, 1, tmp_path)


@pytest.mark.parametrize("qp", [0, 10, 26, 31, 41, 51])
def test_golden_qp_range(qp, tmp_path):
    data = make_stream(width_mbs=4, height_mbs=3, n_pictures=1, seed=6,
                       qp=qp, mb_kinds=("i16", "i4"), density=0.4,
                       allow_pcm=False)
    assert_bit_exact(data, 4, 3, 1, tmp_path)


@pytest.mark.parametrize("seed", range(40, 52))
def test_golden_fuzz(seed, tmp_path):
    data = make_stream(width_mbs=5, height_mbs=4, n_pictures=2, seed=seed,
                       mb_kinds=("i16", "i4"), density=0.35, allow_pcm=False)
    assert_bit_exact(data, 5, 4, 2, tmp_path)


def test_golden_high_levels(tmp_path):
    data = make_stream(width_mbs=4, height_mbs=3, n_pictures=1, seed=9,
                       max_level=200, density=0.6, mb_kinds=("i16", "i4"),
                       allow_pcm=False)
    assert_bit_exact(data, 4, 3, 1, tmp_path)


def test_golden_dense_residuals(tmp_path):
    data = make_stream(width_mbs=4, height_mbs=3, n_pictures=1, seed=10,
                       density=0.95, mb_kinds=("i16", "i4"), allow_pcm=False)
    assert_bit_exact(data, 4, 3, 1, tmp_path)


def test_golden_larger_frame(tmp_path):
    data = make_stream(width_mbs=12, height_mbs=9, n_pictures=1, seed=11,
                       mb_kinds=("i16", "i4"), density=0.3, allow_pcm=False)
    assert_bit_exact(data, 12, 9, 1, tmp_path)
