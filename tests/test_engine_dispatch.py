"""Production engine dispatch: mv_decode / decode_annexb route through
the fused Pallas engine (VERDICT r2 item 3).

On the CPU test backend "jax" resolves to the XLA wave driver and
engine="fused" forces the Pallas kernel in interpret mode; on a TPU
backend "jax" resolves to the fused kernel (resolve_engine is the single
dispatch point, exercised directly here).
"""

import numpy as np

from fixtures.h264enc import make_stream
from minivideo_tpu.api import mv_close, mv_decode, mv_open, mv_parse
from minivideo_tpu.models.h264.decoder import decode_annexb, resolve_engine
from minivideo_tpu.settings import ENGINES


def test_resolve_engine_cpu_backend():
    assert resolve_engine("jax") == "wave"      # CPU test backend
    assert resolve_engine("fused") == "fused"
    assert resolve_engine("wave") == "wave"
    assert resolve_engine("np") == "np"
    assert set(ENGINES) == {"fused", "wave", "np"}


def test_decode_annexb_fused_matches_oracle():
    data = make_stream(width_mbs=4, height_mbs=3, n_pictures=2, seed=21,
                       mb_kinds=("i16", "i4"), density=0.4,
                       allow_pcm=False)
    ref = decode_annexb(data)
    got = decode_annexb(data, engine="fused")
    assert len(ref) == len(got) == 2
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.cb, b.cb)
        np.testing.assert_array_equal(a.cr, b.cr)


def test_mv_decode_fused(tmp_path):
    data = make_stream(width_mbs=4, height_mbs=3, n_pictures=2, seed=22,
                       mb_kinds=("i16", "i4"), density=0.4,
                       allow_pcm=False)
    p = tmp_path / "clip.264"
    p.write_bytes(data)
    media = mv_open(str(p))
    try:
        assert mv_parse(media, audio=False, video=True, subs=False)
        ref = mv_decode(media, picture_number=2, engine="np")
        got = mv_decode(media, picture_number=2, engine="fused")
        assert len(ref) == len(got) == 2
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a.y, b.y)
            np.testing.assert_array_equal(a.cb, b.cb)
            np.testing.assert_array_equal(a.cr, b.cr)
    finally:
        mv_close(media)


def test_decode_fused_multislice_slice_pool():
    """Multi-slice pictures through the production slab path with the
    (picture, slice) thread-pool fan-out (_decode_batched passes a pool
    to parse_groups_slab; slices are entropy-independent,
    h264_slice.c:1013-1139)."""
    data = make_stream(width_mbs=6, height_mbs=5, n_pictures=3, seed=21,
                       n_slices=3, mb_kinds=("i16", "i4"), density=0.4,
                       allow_pcm=False)
    ref = decode_annexb(data)
    got = decode_annexb(data, engine="fused")
    assert len(got) == len(ref) == 3
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.cb, b.cb)
        np.testing.assert_array_equal(a.cr, b.cr)
