"""Staged (zero-copy) batch packing vs the copying pack_frames path.

The native entropy parser writes coefficients directly into
make_frame_staging buffers (ops/recon.py syntax_into); the packed batch
must be identical to parsing into fresh FrameSyntax objects and packing
with pack_frames.
"""

import numpy as np
import pytest

from fixtures.h264enc2 import make_stream2
from minivideo_tpu.models.h264.decoder import H264Decoder
from minivideo_tpu.models.h264.nalu import parse_nalu, split_annexb
from minivideo_tpu.models.h264.slicehdr import parse_slice_header
from minivideo_tpu.models.h264.syntax import FrameSyntax
from minivideo_tpu.native import available, parse_slice_native
from minivideo_tpu.ops.recon import (make_frame_staging, pack_frames,
                                     pack_frames_staged, syntax_into)

pytestmark = pytest.mark.skipif(not available(),
                                reason="native library not built")


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_staged_pack_matches_copying_pack(entropy):
    wmb, hmb, npic = 6, 5, 3
    data = make_stream2(wmb, hmb, npic, 91, entropy=entropy,
                        mb_kinds=("i16", "i4"), density=0.4)
    dec = H264Decoder()
    nalus = [parse_nalu(raw, off) for off, raw in split_annexb(data)]
    for n in nalus:
        if n.nal_unit_type in (7, 8):
            dec.feed_nalu(n)
    idrs = [n for n in nalus if n.nal_unit_type == 5]
    assert len(idrs) == npic

    def parse(fs, nalu):
        sh, sps, pps = parse_slice_header(
            nalu.rbsp, nalu.nal_unit_type, nalu.nal_ref_idc,
            dec.sps_map, dec.pps_map)
        parse_slice_native(fs, nalu.rbsp, sh.data_bit_offset,
                           sh.first_mb_in_slice, sh.qp,
                           bool(pps.entropy_coding_mode_flag),
                           bool(pps.transform_8x8_mode_flag))
        return sps, pps

    staging = make_frame_staging(wmb, hmb, npic)
    staged = []
    plain = []
    for i, nalu in enumerate(idrs):
        fs_s = syntax_into(staging, i, wmb, hmb)
        sps, pps = parse(fs_s, nalu)
        staged.append((fs_s, None))
        fs_p = FrameSyntax(wmb, hmb)
        parse(fs_p, nalu)
        plain.append((fs_p, None))

    a = pack_frames_staged(staging, staged, sps, pps)
    b = pack_frames(plain, sps, pps)
    assert set(a.arrays) == set(b.arrays)
    for k in a.arrays:
        np.testing.assert_array_equal(np.asarray(a.arrays[k]),
                                      np.asarray(b.arrays[k]), err_msg=k)
    np.testing.assert_array_equal(a.ls4, b.ls4)
    np.testing.assert_array_equal(a.ls8, b.ls8)
    assert a.chroma_qp_off == b.chroma_qp_off


# ---------------------------------------------------------------------------
# staging-mode auto selection (settings.py): derived from the measured
# feed/drain constants, not a hard-coded core threshold (VERDICT r4 #7)


def test_staging_crossover_derived(monkeypatch):
    from minivideo_tpu import settings as S

    n = S.staging_crossover_cores()
    assert 2 <= n <= 64
    # the crossover is exactly where the modelled throughputs flip
    assert (S.staging_throughput(n - 1, "records")
            >= S.staging_throughput(n - 1, "device"))
    assert (S.staging_throughput(n, "device")
            > S.staging_throughput(n, "records"))

    # auto mode follows the model for synthetic core counts
    monkeypatch.delenv("MINIVIDEO_TPU_STAGING", raising=False)
    for cores, want in ((2, "records"), (n - 1, "records"),
                        (n, "device"), (64, "device")):
        monkeypatch.setattr(S.os, "cpu_count", lambda c=cores: c)
        assert S.staging_mode() == want, cores

    # explicit override + validation still apply
    monkeypatch.setenv("MINIVIDEO_TPU_STAGING", "records")
    assert S.staging_mode() == "records"
    monkeypatch.setenv("MINIVIDEO_TPU_STAGING", "bogus")
    with pytest.raises(ValueError):
        S.staging_mode()


def test_staging_throughput_model_shape():
    from minivideo_tpu import settings as S
    # single core: records feeds faster (cheaper per-frame host cost)
    assert (S.staging_throughput(1, "records")
            > S.staging_throughput(1, "device"))
    # unbounded cores: device wins on chip headroom
    assert (S.staging_throughput(256, "device")
            == S.DEVICE_FPS_DEVICE)
    assert (S.staging_throughput(256, "records")
            == S.DEVICE_FPS_RECORDS)
