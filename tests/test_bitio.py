"""Bit reader / exp-golomb unit tests (reference behaviors:
bitstream.c read_bit/read_bits, h264_expgolomb.c read_ue/se/te/me)."""

import pytest

from minivideo_tpu.bitio import BitReader, BitstreamError
from minivideo_tpu.models.h264.expgolomb import (read_me_cbp, read_se,
                                                 read_te, read_ue)


def test_read_bits_basic():
    r = BitReader(bytes([0b10110100, 0xFF, 0x00, 0x0F]))
    assert r.read_bit() == 1
    assert r.read_bit() == 0
    assert r.read_bits(3) == 0b110
    assert r.read_bits(11) == 0b10011111111
    assert r.bit_position() == 16
    assert r.read_bits(16) == 0x000F
    with pytest.raises(BitstreamError):
        r.read_bit()


def test_read_bits_64():
    data = bytes(range(1, 12))
    r = BitReader(data)
    r.skip_bits(3)
    v = r.read_bits(64)
    expected = (int.from_bytes(data[:9], "big") >> (72 - 67)) & ((1 << 64) - 1)
    assert v == expected


def test_peek_and_align():
    r = BitReader(b"\xa5\x5a")
    assert r.peek_bits(4) == 0xA
    assert r.read_bits(4) == 0xA
    r.align()
    assert r.byte_position() == 1
    assert r.read_bits(8) == 0x5A


def test_rbsp_trailing_detection():
    # payload bits '101', stop bit, alignment zeros
    r = BitReader(bytes([0b10110000]))
    assert r.h264_more_rbsp_data()
    assert r.read_bits(3) == 0b101
    assert not r.h264_more_rbsp_data()
    assert r.h264_rbsp_trailing_bits()


def test_ue_se_roundtrip():
    import sys
    from fixtures.h264enc import BitWriter
    for v in list(range(0, 300)) + [1000, 65535]:
        w = BitWriter()
        w.ue(v)
        w.align_zero()
        assert read_ue(BitReader(w.to_bytes())) == v
    for v in list(range(-200, 201)):
        w = BitWriter()
        w.se(v)
        w.align_zero()
        assert read_se(BitReader(w.to_bytes())) == v


def test_te_v():
    assert read_te(BitReader(b"\x00"), 1) == 1  # bit 0 -> 1
    assert read_te(BitReader(b"\x80"), 1) == 0  # bit 1 -> 0
    assert read_te(BitReader(b"\x80"), 5) == 0  # falls back to ue(v)


def test_me_cbp_is_bijective():
    from minivideo_tpu.models.h264.expgolomb import (ME_CBP_CHROMA_12,
                                                     ME_CBP_CHROMA_03)
    intra = [t[0] for t in ME_CBP_CHROMA_12]
    inter = [t[1] for t in ME_CBP_CHROMA_12]
    assert sorted(intra) == list(range(48))
    assert sorted(inter) == list(range(48))
    intra3 = [t[0] for t in ME_CBP_CHROMA_03]
    assert sorted(intra3) == list(range(16))
