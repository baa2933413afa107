"""CAVLC encode/decode round-trip tests (spec 9.2; reference
h264_cavlc.c)."""

import numpy as np
import pytest

from fixtures.h264enc import BitWriter, encode_residual_cavlc
from minivideo_tpu.bitio import BitReader
from minivideo_tpu.models.h264 import cavlc


def roundtrip(levels, nC, maxn):
    w = BitWriter()
    tc_enc = encode_residual_cavlc(w, levels, nC, maxn)
    w.align_zero()
    r = BitReader(w.to_bytes())
    got, tc = cavlc.residual_block_cavlc(r, nC, 0, maxn - 1, maxn)
    assert tc == tc_enc
    assert got == list(levels), f"nC={nC} want {list(levels)} got {got}"


def test_coeff_token_tables_complete():
    # all 62 valid (TotalCoeff, TrailingOnes) pairs present per class
    for m in cavlc.COEFF_TOKEN_MAPS:
        pairs = set(m.values())
        assert len(pairs) == 62
        for tc in range(17):
            for t1 in range(min(tc, 3) + 1):
                assert (tc, t1) in pairs
    assert len(set(cavlc.COEFF_TOKEN_CDC_MAP.values())) == 14


@pytest.mark.parametrize("nC", [-1, 0, 1, 2, 3, 4, 7, 8, 16])
def test_roundtrip_fuzz(nC):
    rng = np.random.default_rng(nC + 100)
    maxn = 4 if nC == -1 else 16
    for trial in range(300):
        density = rng.uniform(0.05, 0.95)
        mag = int(rng.integers(1, 40))
        mask = rng.random(maxn) < density
        lv = np.where(mask, rng.integers(1, mag + 1, maxn)
                      * rng.choice((-1, 1), maxn), 0)
        roundtrip([int(x) for x in lv], nC, maxn)


def test_roundtrip_edge_cases():
    roundtrip([0] * 16, 0, 16)                       # empty block
    roundtrip([1] * 16, 0, 16)                       # all ones
    roundtrip([-1] * 16, 4, 16)
    roundtrip([2000, -2000] + [0] * 14, 0, 16)       # large levels
    roundtrip([0] * 15 + [5], 2, 16)                 # lone high-freq coeff
    roundtrip([3] + [0] * 15, 0, 16)                 # lone DC
    roundtrip([1, -1, 1, -1] + [0] * 12, 8, 16)      # FLC table path
    roundtrip([0, 0, 2, -1], -1, 4)                  # chroma DC
