"""CABAC entropy decoding tests.

Validation strategy: the plan-based fixture encoder (fixtures/h264enc2)
emits the SAME macroblock decisions as CAVLC and as CABAC; decoded
pictures must match bit-exactly.  This validates the CABAC decoder without
relying on the reference binary (whose CABAC is broken — its own
README.md:22 — and produces no output on our CABAC streams)."""

import numpy as np
import pytest

from fixtures.h264enc2 import make_stream2
from minivideo_tpu.models.h264.decoder import decode_annexb


def cross_check(**kw):
    cav = make_stream2(entropy="cavlc", **kw)
    cab = make_stream2(entropy="cabac", **kw)
    p1 = decode_annexb(cav)
    p2 = decode_annexb(cab)
    assert len(p1) == len(p2) and len(p1) > 0
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.cb, b.cb)
        np.testing.assert_array_equal(a.cr, b.cr)
    return p2


@pytest.mark.parametrize("kinds", [("i16",), ("i4",), ("i16", "i4")])
def test_cabac_kinds(kinds):
    cross_check(width_mbs=4, height_mbs=3, seed=21, mb_kinds=kinds,
                density=0.4)


def test_cabac_8x8_transform():
    cross_check(width_mbs=4, height_mbs=3, seed=22, mb_kinds=("i8",),
                transform_8x8=True, density=0.4)


def test_cabac_mixed_8x8():
    cross_check(width_mbs=5, height_mbs=4, seed=23,
                mb_kinds=("i16", "i4", "i8"), transform_8x8=True,
                density=0.35, n_pictures=2)


def test_cabac_pcm():
    # regenerate until a PCM MB exists
    for seed in range(30, 60):
        pics = cross_check(width_mbs=4, height_mbs=4, seed=seed,
                           mb_kinds=("i16", "i4"), allow_pcm=True,
                           density=0.3)
        from minivideo_tpu.models.h264.syntax import KIND_IPCM
        if (pics[0].syntax.mb_kind == KIND_IPCM).any():
            return
    pytest.fail("no PCM macroblock generated in 30 seeds")


@pytest.mark.parametrize("qp", [0, 8, 26, 39, 48, 51])
def test_cabac_qp_range(qp):
    cross_check(width_mbs=4, height_mbs=3, seed=24, qp=qp, density=0.5)


def test_cabac_multi_slice():
    cross_check(width_mbs=4, height_mbs=4, seed=25, n_slices=3,
                density=0.4)


def test_cabac_ueg0_escapes():
    # large levels force the UEG0 bypass suffix path
    cross_check(width_mbs=4, height_mbs=3, seed=26, density=0.9,
                max_level=600)


@pytest.mark.parametrize("seed", range(70, 78))
def test_cabac_fuzz(seed):
    cross_check(width_mbs=5, height_mbs=4, seed=seed, n_pictures=2,
                mb_kinds=("i16", "i4", "i8"), transform_8x8=True,
                allow_pcm=True, density=0.35)
