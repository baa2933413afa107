"""parallel/ layer: mesh sharding, batch pipeline, manifest resume,
per-clip failure isolation — on the virtual 8-device CPU mesh
(SURVEY.md §4: distributed paths testable without a pod)."""

import json
import os

import numpy as np
import pytest

from fixtures.h264enc import make_stream
from minivideo_tpu.codecs import PictureFormat, PictureRepartition
from minivideo_tpu.parallel import (Manifest, batch_thumbnail, make_mesh,
                                    pad_to_multiple)


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clips")
    for i in range(5):
        data = make_stream(width_mbs=4, height_mbs=3, n_pictures=2,
                           seed=10 + i, allow_pcm=False)
        (d / f"clip{i}.264").write_bytes(data)
    # one corrupt clip: garbage that still probes as H.264 ES
    (d / "bad.264").write_bytes(b"\x00\x00\x00\x01\x67" + b"\x13" * 40)
    return d


def _golden(path):
    from minivideo_tpu.models.h264.decoder import decode_annexb
    return decode_annexb(open(path, "rb").read(), max_pictures=2)


def test_make_mesh_axes():
    import jax
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "seq")
    assert mesh.devices.size == len(jax.devices())


def test_pad_to_multiple():
    arrays = {"a": np.ones((3, 2), np.int32), "b": np.zeros((3,), np.int8)}
    padded, real = pad_to_multiple(arrays, 8)
    assert real == 3
    assert padded["a"].shape == (8, 2)
    assert padded["b"].shape == (8,)
    assert padded["a"][3:].sum() == 0
    same, real2 = pad_to_multiple({"a": np.ones((8, 2))}, 8)
    assert real2 == 8 and same["a"].shape == (8, 2)


def test_batch_thumbnail_end_to_end(clip_dir, tmp_path):
    clips = sorted(str(p) for p in clip_dir.glob("clip*.264"))
    out = tmp_path / "thumbs"
    res = batch_thumbnail(clips, str(out), pictures_per_clip=2,
                          fmt=PictureFormat.YUV420,
                          mode=PictureRepartition.ORDERED)
    assert res.done == 5
    assert res.failed == 0
    assert res.frames == 10
    assert len(res.outputs) == 10

    # bit-exact: batch output equals the single-clip oracle decode
    pics = _golden(clips[0])
    y0 = pics[0].cropped()[0]
    h, w = y0.shape
    raw = open([o for o in res.outputs
                if os.path.basename(o).startswith("clip0_0")][0],
               "rb").read()
    got = np.frombuffer(raw[:h * w], np.uint8).reshape(h, w)
    np.testing.assert_array_equal(got, y0)


def test_failure_isolation_and_resume(clip_dir, tmp_path):
    clips = sorted(str(p) for p in clip_dir.glob("*.264"))
    assert any("bad" in c for c in clips)
    out = tmp_path / "thumbs"
    man = str(out / "man.jsonl")
    res = batch_thumbnail(clips, str(out), manifest_path=man,
                          fmt=PictureFormat.YUV420)
    assert res.done == 5
    assert res.failed == 1        # bad clip isolated, batch survived

    # resume: done clips skipped, only the failure retried
    res2 = batch_thumbnail(clips, str(out), manifest_path=man,
                           fmt=PictureFormat.YUV420)
    assert res2.skipped == 5
    assert res2.done == 0 and res2.failed == 1

    recs = [json.loads(l) for l in open(man)]
    assert sum(1 for r in recs if r["status"] == "failed") == 2
    assert sum(1 for r in recs if r["status"] == "done") == 5


def test_multihost_partition(clip_dir, tmp_path):
    """Two simulated hosts split the clips disjointly and completely."""
    clips = sorted(str(p) for p in clip_dir.glob("clip*.264"))
    outs = []
    for pi in range(2):
        out = tmp_path / f"host{pi}"
        res = batch_thumbnail(clips, str(out), process_index=pi,
                              process_count=2,
                              fmt=PictureFormat.YUV420)
        assert res.failed == 0
        outs.append({os.path.basename(o) for o in res.outputs})
    assert outs[0] & outs[1] == set()
    assert len(outs[0]) + len(outs[1]) == 5


def test_manifest_torn_line(tmp_path):
    p = tmp_path / "m.jsonl"
    with Manifest(str(p)) as m:
        m.done("a")
    with open(p, "a") as f:
        f.write('{"clip": "b", "sta')     # simulated crash mid-write
    with Manifest(str(p)) as m2:
        assert m2.is_done("a")
        assert m2.pending(["a", "b"]) == ["b"]


def test_mixed_geometry_buckets(tmp_path):
    """Clips with different MB grids decode in separate buckets."""
    d = tmp_path / "clips"
    d.mkdir()
    (d / "a.264").write_bytes(make_stream(width_mbs=4, height_mbs=3,
                                          seed=3, allow_pcm=False))
    (d / "b.264").write_bytes(make_stream(width_mbs=6, height_mbs=2,
                                          seed=4, allow_pcm=False))
    out = tmp_path / "o"
    res = batch_thumbnail(sorted(str(p) for p in d.glob("*.264")),
                          str(out), fmt=PictureFormat.YUV420)
    assert res.done == 2 and res.failed == 0
    for name in ("a", "b"):
        path = [o for o in res.outputs if f"/{name}" in o][0]
        pics = _golden(str(d / f"{name}.264"))
        y, cb, cr = pics[0].cropped()
        raw = open(path, "rb").read()
        assert len(raw) == y.size + cb.size + cr.size
        got = np.frombuffer(raw[:y.size], np.uint8).reshape(y.shape)
        np.testing.assert_array_equal(got, y)


def test_batch_thumbnail_slab_path(tmp_path):
    """engine="fused" routes batch_thumbnail through the bucket-wide
    slab entropy stage (the production feed bench.py measures):
    outputs bit-exact vs the oracle, entropy failures isolated to the
    owning clip while the rest of the bucket batch reconstructs."""
    from minivideo_tpu.models.h264.decoder import decode_annexb
    clips, streams = [], {}
    for i in range(3):
        data = make_stream(width_mbs=5, height_mbs=4, n_pictures=2,
                           seed=60 + i, mb_kinds=("i16", "i4"),
                           density=0.4, allow_pcm=False)
        p = tmp_path / f"c{i}.264"
        p.write_bytes(data)
        clips.append(str(p))
        streams[str(p)] = data
    # a clip whose slice DATA is corrupt (demuxes + headers parse fine,
    # entropy decode must fail) -> exercises _parse_bucket_slab's
    # per-frame isolation, not the demux-stage isolation
    data = bytearray(make_stream(width_mbs=5, height_mbs=4,
                                 n_pictures=2, seed=70,
                                 mb_kinds=("i16", "i4"), density=0.4,
                                 allow_pcm=False))
    for pos in range(len(data) * 2 // 3, len(data) - 8, 3):
        data[pos] ^= 0xFF
    bad = tmp_path / "bad.264"
    bad.write_bytes(bytes(data))
    clips.append(str(bad))

    res = batch_thumbnail(clips, str(tmp_path / "out"),
                          pictures_per_clip=2,
                          fmt=PictureFormat.YUV420, engine="fused",
                          mesh=make_mesh())
    assert res.done == 3
    assert res.frames >= 6
    ref = decode_annexb(streams[clips[0]])
    got = np.fromfile(tmp_path / "out" / "c0_0.yuv", np.uint8)
    w, h = ref[0].width, ref[0].height
    exp = np.concatenate([ref[0].y[:h, :w].ravel(),
                          ref[0].cb[:h // 2, :w // 2].ravel(),
                          ref[0].cr[:h // 2, :w // 2].ravel()])
    np.testing.assert_array_equal(got, exp)
