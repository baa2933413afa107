"""Native C++ entropy parser vs the Python parsers: field-for-field
FrameSyntax parity on fuzzed streams (both coders, every MB kind incl.
I_PCM, multi-slice).  The C++ parser is a port of the Python one; this
suite is what keeps them in lockstep.
"""

import numpy as np
import pytest

from fixtures.h264enc2 import make_stream2
from minivideo_tpu.models.h264.decoder import H264Decoder
from minivideo_tpu.models.h264.nalu import parse_nalu, split_annexb
from minivideo_tpu.models.h264.slicehdr import parse_slice_header
from minivideo_tpu.models.h264.syntax import (CavlcSliceParser,
                                              FrameSyntax)
from minivideo_tpu.models.h264.cabac import CabacSliceParser
from minivideo_tpu.native import available, parse_slice_native

pytestmark = pytest.mark.skipif(not available(),
                                reason="native library not built")

_ARRAYS = ("mb_kind", "qpy", "i16_mode", "chroma_mode", "luma4x4_modes",
           "luma8x8_modes", "cbp_luma", "cbp_chroma", "luma_dc",
           "luma_ac", "luma8x8_coeff", "chroma_dc", "chroma_ac",
           "total_coeff_luma", "total_coeff_chroma", "cbf_luma_dc",
           "cbf_luma", "cbf_luma8x8", "cbf_chroma_dc", "cbf_chroma",
           "transform8x8", "parsed")


def _parse_both(data, wmb, hmb):
    """Returns per-picture (native FrameSyntax, python FrameSyntax)."""
    from minivideo_tpu.models.h264.decoder import group_idr_access_units
    dec = H264Decoder()
    nalus = [parse_nalu(raw, off) for off, raw in split_annexb(data)]
    for n in nalus:
        if n.nal_unit_type in (7, 8):
            dec.feed_nalu(n)
    out = []
    for group in group_idr_access_units(nalus):
        fs_n = FrameSyntax(wmb, hmb)
        fs_p = FrameSyntax(wmb, hmb)
        for n in group:
            sh, sps, pps = parse_slice_header(
                n.rbsp, n.nal_unit_type, n.nal_ref_idc,
                dec.sps_map, dec.pps_map)
            parse_slice_native(fs_n, n.rbsp, sh.data_bit_offset,
                               sh.first_mb_in_slice, sh.qp,
                               bool(pps.entropy_coding_mode_flag),
                               bool(pps.transform_8x8_mode_flag))
            if pps.entropy_coding_mode_flag:
                CabacSliceParser(n.rbsp, sh, sps, pps,
                                 fs_p).parse_slice_data()
            else:
                from minivideo_tpu.bitio import BitReader
                r = BitReader(n.rbsp, start_bit=sh.data_bit_offset)
                CavlcSliceParser(r, sh, sps, pps, fs_p).parse_slice_data()
        out.append((fs_n, fs_p))
    return out


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
@pytest.mark.parametrize("seed", range(200, 206))
def test_entropy_parity_fuzz(entropy, seed):
    wmb, hmb = 6, 5
    data = make_stream2(wmb, hmb, 2, seed, entropy=entropy,
                        mb_kinds=("i16", "i4", "i8"), transform_8x8=True,
                        density=0.4, allow_pcm=True,
                        n_slices=2 if seed % 2 else 1)
    pics = _parse_both(data, wmb, hmb)
    assert len(pics) == 2
    for pi, (fs_n, fs_p) in enumerate(pics):
        # PCM raw pixels ride the coefficient buffers in the native
        # layout but live in the pcm_* dicts in the Python parser;
        # compare coefficients on non-PCM MBs, pcm_* dicts below
        not_pcm = np.asarray(fs_p.mb_kind) != 2      # KIND_IPCM
        for name in _ARRAYS:
            a = np.asarray(getattr(fs_n, name))
            b = np.asarray(getattr(fs_p, name))
            if name in ("luma_dc", "luma_ac", "luma8x8_coeff",
                        "chroma_dc", "chroma_ac"):
                mask = not_pcm.reshape((-1,) + (1,) * (a.ndim - 1))
                a = a * mask
                b = b * mask
            np.testing.assert_array_equal(
                a, b, err_msg=f"{entropy} pic {pi} {name}")
        assert set(fs_n.pcm_y) == set(fs_p.pcm_y)
        for mb in fs_n.pcm_y:
            np.testing.assert_array_equal(fs_n.pcm_y[mb], fs_p.pcm_y[mb])
            np.testing.assert_array_equal(fs_n.pcm_cb[mb],
                                          fs_p.pcm_cb[mb])
            np.testing.assert_array_equal(fs_n.pcm_cr[mb],
                                          fs_p.pcm_cr[mb])


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_corrupt_stream_robustness(entropy):
    """Corrupted slice payloads must surface as BitstreamError from BOTH
    parsers — never as an unchecked crash (IndexError / native OOB).

    Regression for the total_zeros bound: the 15-coefficient AC blocks
    share the 16-coefficient VLC tables, so a corrupt stream can code
    one zero too many and walk the scan position past the block (found
    by tools/asan_check.sh; spec 9.2.3 bound now enforced in
    entropy.cc and cavlc.py)."""
    from minivideo_tpu.bitio import BitReader, BitstreamError
    from minivideo_tpu.models.h264.decoder import group_idr_access_units
    data = make_stream2(width_mbs=6, height_mbs=5, n_pictures=1,
                        seed=77, mb_kinds=("i16", "i4"), density=0.5,
                        entropy=entropy, allow_pcm=False)
    dec = H264Decoder()
    nalus = [parse_nalu(raw, off) for off, raw in split_annexb(data)]
    for n in nalus:
        if n.nal_unit_type in (7, 8):
            dec.feed_nalu(n)
    group = group_idr_access_units(nalus)[0]
    n0 = group[0]
    sh, sps, pps = parse_slice_header(
        n0.rbsp, n0.nal_unit_type, n0.nal_ref_idc, dec.sps_map,
        dec.pps_map)
    rng = np.random.default_rng(5)
    payload_start = sh.data_bit_offset // 8

    def run(rbsp):
        fs = FrameSyntax(6, 5)
        try:
            parse_slice_native(fs, rbsp, sh.data_bit_offset,
                               sh.first_mb_in_slice, sh.qp,
                               bool(pps.entropy_coding_mode_flag),
                               bool(pps.transform_8x8_mode_flag))
        except BitstreamError:
            pass
        fs2 = FrameSyntax(6, 5)
        try:
            if pps.entropy_coding_mode_flag:
                CabacSliceParser(rbsp, sh, sps, pps,
                                 fs2).parse_slice_data()
            else:
                r = BitReader(rbsp, start_bit=sh.data_bit_offset)
                CavlcSliceParser(r, sh, sps, pps,
                                 fs2).parse_slice_data()
        except (BitstreamError, ValueError):
            pass

    for cut in (1, 3, 8, len(n0.rbsp) // 2, len(n0.rbsp) - 1):
        run(n0.rbsp[:cut])
    for _ in range(60):
        mut = bytearray(n0.rbsp)
        for _ in range(int(rng.integers(1, 4))):
            mut[int(rng.integers(payload_start, len(mut)))] ^= \
                int(rng.integers(1, 256))
        run(bytes(mut))


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
@pytest.mark.parametrize("max_level", [300, 900])
def test_entropy_parity_level_escapes(entropy, max_level):
    """Large coefficient levels force the escape codings: CABAC UEG0
    prefix=14 suffixes (the division-batched bypass path in entropy.cc)
    and CAVLC level_prefix>=15 escape codes.  The default fuzz corpus
    caps levels at 6 and never reaches them; this pins native == python
    on dense high-level streams."""
    wmb, hmb = 6, 5
    data = make_stream2(wmb, hmb, 1, 401 + max_level, entropy=entropy,
                        mb_kinds=("i16", "i4", "i8"), transform_8x8=True,
                        density=0.9, allow_pcm=False,
                        max_level=max_level)
    pics = _parse_both(data, wmb, hmb)
    assert len(pics) == 1
    saw_big = False
    for fs_n, fs_p in pics:
        for name in _ARRAYS:
            a = np.asarray(getattr(fs_n, name))
            b = np.asarray(getattr(fs_p, name))
            np.testing.assert_array_equal(a, b, err_msg=name)
            if name in ("luma_ac", "luma8x8_coeff") and a.size:
                saw_big |= bool(np.abs(a).max() >= 16)
    assert saw_big, "stream did not exercise the escape range"
