"""Golden tests vs the reference binary: CABAC entropy coding, i8x8 +
transform-8x8, custom scaling lists, and large frames.

Round-1 CABAC correctness rested on self-roundtrip only (encoder and
decoder shared context-derivation code).  These tests pin our CABAC
parser to the REFERENCE decoder's output bit-for-bit.

Oracle requirements (tools/build_reference.sh):
 - the stock reference build fails ALL CABAC streams: getCtxIdx's
   table-search loop reads ctxIdxOffset_table[22] of a 22-entry array
   (h264_cabac.c:1353-1362) and GCC 12 -O2 exploits the UB so the search
   spuriously matches offset 85 (coded_block_flag) -> "Unknown
   ctxIdxOffset" fatal.  build_reference.sh patches the loop bound
   (i < 21) to restore the intended search; with that single fix the
   reference decodes every CABAC config below bit-exactly.
 - fixtures always emit the PPS extension for High-profile streams: the
   reference reads transform_8x8_mode_flag / second_chroma_qp_index_offset
   as uninitialized memory when the extension is absent (decodePPS never
   applies the spec defaults of 7.4.2.2).
 - running QPY never lands on exactly 36 (reference UB in Intra16x16 DC
   scaling, `qP > 36` vs spec `>= 36`); tracked per-MB by the fixture
   planner (h264enc2.plan_frame), not just at the slice QP.

Additional known divergences are documented in test_golden_reference.py.
"""

import glob
import os
import subprocess

import numpy as np
import pytest

from fixtures.h264enc import make_stream
from fixtures.h264enc2 import make_stream2
from minivideo_tpu.models.h264.decoder import decode_annexb

REF_BIN = os.environ.get("MINIVIDEO_REF_BIN", "/tmp/mini_thumbnailer")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BIN),
    reason="reference binary not built (run tools/build_reference.sh)")


def assert_bit_exact(data, wmb, hmb, n_pics, tmp_path):
    src = tmp_path / "clip.264"
    src.write_bytes(data)
    cwd = tmp_path / "out"
    cwd.mkdir(exist_ok=True)
    subprocess.run(
        [REF_BIN, "-i", str(src), "-o", str(cwd), "-f", "yuv420",
         "-n", str(n_pics), "-e", "unfiltered"],
        capture_output=True, cwd=cwd, timeout=240)
    files = sorted(glob.glob(str(cwd / "*.yuv")))
    assert len(files) == n_pics, "reference failed to decode all pictures"
    mine = decode_annexb(data)
    assert len(mine) == n_pics
    w, h = wmb * 16, hmb * 16
    for i, f in enumerate(files):
        raw = np.fromfile(f, dtype=np.uint8)
        assert raw.size == w * h * 3 // 2
        np.testing.assert_array_equal(
            raw[:w * h].reshape(h, w), mine[i].y, err_msg=f"Y pic {i}")
        np.testing.assert_array_equal(
            raw[w * h:w * h * 5 // 4].reshape(h // 2, w // 2), mine[i].cb,
            err_msg=f"Cb pic {i}")
        np.testing.assert_array_equal(
            raw[w * h * 5 // 4:].reshape(h // 2, w // 2), mine[i].cr,
            err_msg=f"Cr pic {i}")


@pytest.mark.parametrize("kinds", [("i16",), ("i4",), ("i16", "i4")])
def test_golden_cabac_kinds(kinds, tmp_path):
    data = make_stream2(width_mbs=4, height_mbs=3, n_pictures=1, seed=5,
                        entropy="cabac", mb_kinds=kinds, density=0.4)
    assert_bit_exact(data, 4, 3, 1, tmp_path)


def test_golden_cabac_i8_transform8x8(tmp_path):
    data = make_stream2(width_mbs=4, height_mbs=3, n_pictures=1, seed=7,
                        entropy="cabac", mb_kinds=("i16", "i4", "i8"),
                        transform_8x8=True, density=0.4)
    assert_bit_exact(data, 4, 3, 1, tmp_path)


def test_golden_cavlc_i8_transform8x8(tmp_path):
    data = make_stream2(width_mbs=4, height_mbs=3, n_pictures=1, seed=8,
                        entropy="cavlc", mb_kinds=("i16", "i4", "i8"),
                        transform_8x8=True, density=0.4)
    assert_bit_exact(data, 4, 3, 1, tmp_path)


@pytest.mark.parametrize("qp", [6, 10, 30, 45, 48])
def test_golden_cabac_qp(qp, tmp_path):
    data = make_stream2(width_mbs=4, height_mbs=3, n_pictures=1, seed=9,
                        qp=qp, entropy="cabac", mb_kinds=("i16", "i4"),
                        density=0.5)
    assert_bit_exact(data, 4, 3, 1, tmp_path)


@pytest.mark.parametrize("seed", range(30, 36))
def test_golden_cabac_fuzz(seed, tmp_path):
    data = make_stream2(width_mbs=6, height_mbs=5, n_pictures=2, seed=seed,
                        entropy="cabac", mb_kinds=("i16", "i4"),
                        density=0.35)
    assert_bit_exact(data, 6, 5, 2, tmp_path)


def test_golden_cabac_high_levels(tmp_path):
    """UEG0 suffix bins (|level| >= 15) + escape bypass chains."""
    data = make_stream2(width_mbs=4, height_mbs=3, n_pictures=1, seed=14,
                        entropy="cabac", mb_kinds=("i16", "i4"),
                        density=0.5, max_level=200)
    assert_bit_exact(data, 4, 3, 1, tmp_path)


def test_golden_cabac_dense(tmp_path):
    data = make_stream2(width_mbs=4, height_mbs=3, n_pictures=1, seed=15,
                        entropy="cabac", mb_kinds=("i16", "i4"),
                        density=0.95, max_level=40)
    assert_bit_exact(data, 4, 3, 1, tmp_path)


def test_golden_cabac_big_high_levels(tmp_path):
    """Wide frame + large levels.  NOTE the reference fails outright on
    120x68 (1080p) CABAC streams — even plain ones — with 'Fatal error
    during Arithmetic (suffix) decoding' (h264_cabac.c:498), a latent
    geometry-related bug beyond the OOB fix (it still decodes 64x36
    fine, see test_golden_cabac_large_frame; envelope documented in
    BASELINE.md)."""
    data = make_stream2(width_mbs=32, height_mbs=18, n_pictures=1,
                        seed=16, entropy="cabac", mb_kinds=("i16", "i4"),
                        density=0.35, max_level=100)
    assert_bit_exact(data, 32, 18, 1, tmp_path)


def test_golden_cabac_large_frame(tmp_path):
    """>= 64x36 MBs (1024x576): exercises long significance runs and
    context state over thousands of MBs (VERDICT round 1 item 4)."""
    data = make_stream2(width_mbs=64, height_mbs=36, n_pictures=1, seed=21,
                        entropy="cabac", mb_kinds=("i16", "i4"),
                        density=0.2)
    assert_bit_exact(data, 64, 36, 1, tmp_path)


def test_golden_cavlc_large_frame(tmp_path):
    data = make_stream2(width_mbs=64, height_mbs=36, n_pictures=1, seed=22,
                        entropy="cavlc", mb_kinds=("i16", "i4"),
                        density=0.2)
    assert_bit_exact(data, 64, 36, 1, tmp_path)


def test_golden_sps_scaling_lists(tmp_path):
    """Non-flat SPS scaling lists (CAVLC; reference scaling-list path
    h264_parameterset.c:723-810)."""
    rng = np.random.default_rng(3)
    lists = [list(rng.integers(4, 60, 16)) for _ in range(6)]
    data = make_stream(width_mbs=4, height_mbs=3, n_pictures=1, seed=12,
                       scaling_lists=lists, mb_kinds=("i16", "i4"),
                       density=0.4, allow_pcm=False)
    assert_bit_exact(data, 4, 3, 1, tmp_path)


def test_pps_scaling_lists_selftest():
    """PPS-level scaling lists CANNOT be golden-tested: the reference
    compiles that parse path out (h264_parameterset.c:906-922 is inside
    `#if ENABLE_FMO`, whose #else returns UNSUPPORTED), so it decodes
    such streams with flat lists.  Spec 7.4.2.2 behavior is verified
    against our numpy oracle through the jax engine instead."""
    rng = np.random.default_rng(4)
    lists = [(1, list(rng.integers(4, 60, 16))) for _ in range(6)]
    data = make_stream(width_mbs=4, height_mbs=3, n_pictures=1, seed=13,
                       pps_scaling_lists=lists, mb_kinds=("i16", "i4"),
                       density=0.4, allow_pcm=False)
    a = decode_annexb(data)
    b = decode_annexb(data, engine="jax")
    assert len(a) == len(b) == 1
    np.testing.assert_array_equal(a[0].y, b[0].y)
    np.testing.assert_array_equal(a[0].cb, b[0].cb)
    np.testing.assert_array_equal(a[0].cr, b[0].cr)
    # the non-flat lists must actually take effect
    flat = make_stream(width_mbs=4, height_mbs=3, n_pictures=1, seed=13,
                       mb_kinds=("i16", "i4"), density=0.4, allow_pcm=False)
    assert not np.array_equal(decode_annexb(flat)[0].y, a[0].y)
