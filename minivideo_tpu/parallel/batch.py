"""Pod-scale batch thumbnailing: N clips -> thumbnails, sharded over a
device mesh and (optionally) multiple hosts.

This is the distributed equivalent of running the reference's
mini_thumbnailer once per file (SURVEY.md §2.6: the reference is single
threaded; the workload is embarrassingly parallel across clips).  The
pipeline has three overlapped stages:

  host demux   — container parse + IDR selection + slice headers per
                 clip on a thread pool;
  host entropy — all selected frames of a geometry bucket entropy-
                 decode straight into ONE slab staging batch, every
                 (picture, slice) task fanned across the pool (the
                 native C++ parser releases the GIL) — the same
                 zero-copy feed bench.py measures; per-frame parse
                 failures zero that frame (parsed=0 rows reconstruct
                 as black) and fail only the owning clip;
  device recon — the bucket batch, padded to the mesh multiple, runs
                 the slots-fed fused kernel (one jit per
                 geometry x batch x specialization, reused).  Engines
                 without the slab feed (wave/np, or no native library)
                 fall back to raster packs;
  host export  — image encode + write on a thread pool.

Failure isolation: any per-clip exception is caught, recorded in the
Manifest, and the batch continues (reference analogue: jumpy_* resync +
the 64-error tolerance, h264.c:181-187 — but scoped per clip, not
per NALU).  Resume: clips already marked done in the manifest are
skipped.

Multi-host: each host processes clips[process_index::process_count] and
writes its own manifest shard.  No cross-host collectives are needed —
outputs are files; hosts coordinate only through the shared filesystem.
"""

from __future__ import annotations

import os
import traceback
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import numpy as np

from .. import trace
from ..codecs import PictureFormat, PictureRepartition
from .manifest import Manifest
from .sharding import make_mesh, pad_to_multiple, shard_packed


@dataclass
class ParsedClip:
    path: str
    frames: list            # [(FrameSyntax, slice_of_mb), ...]
    sps: object
    pps: object
    file_name: str


@dataclass
class DemuxedClip:
    path: str
    pictures: list          # [[(nalu, slice_header), ...], ...]
    sps: object
    pps: object
    file_name: str


@dataclass
class BatchResult:
    done: int = 0
    failed: int = 0
    skipped: int = 0
    frames: int = 0
    outputs: list = field(default_factory=list)
    errors: dict = field(default_factory=dict)


def _demux_groups(path: str, pictures: int, mode):
    """Demux one clip, select IDR pictures, return (decoder-with-
    paramsets, NALU groups, file_name)."""
    from ..api import mv_close, mv_open, mv_parse
    from ..containers.filter import idr_filtering
    from ..containers.mp4 import avcc_to_annexb
    from ..codecs import Codec, Container
    from ..models.h264.decoder import H264Decoder, group_idr_access_units
    from ..models.h264.nalu import parse_nalu, split_annexb
    from ..models.h264.params import UnsupportedStream

    media = mv_open(path)
    try:
        if not mv_parse(media, audio=False, video=True, subs=False):
            raise ValueError("container parse failed")
        if not media.tracks_video:
            raise ValueError("no video track")
        track = media.tracks_video[0]
        if track.stream_codec not in (Codec.H264, Codec.UNKNOWN):
            raise UnsupportedStream(
                f"{track.stream_codec.name} (H.264 intra only)")
        selected = idr_filtering(track, pictures, mode)
        if len(selected) == 0:
            raise ValueError("no IDR pictures found")

        fh = media.file_handle
        length_prefixed = (track.length_prefixed
                           or media.container == Container.MP4)
        out = bytearray()
        for ps in track.parameter_sets:
            out += b"\x00\x00\x00\x01" + ps
        for i in track.param_indices():
            raw = track.read_sample(fh, i)
            if not length_prefixed:
                out += (raw if raw.startswith((b"\x00\x00\x01",
                                               b"\x00\x00\x00\x01"))
                        else b"\x00\x00\x00\x01" + raw)
        for i in selected:
            raw = track.read_sample(fh, int(i))
            if length_prefixed:
                out += avcc_to_annexb(
                    raw, getattr(track, "nal_length_size", 4))
            else:
                out += (raw if raw.startswith((b"\x00\x00\x01",
                                               b"\x00\x00\x00\x01"))
                        else b"\x00\x00\x00\x01" + raw)

        dec = H264Decoder()
        nalus = [parse_nalu(r, off) for off, r in split_annexb(bytes(out))]
        for n in nalus:
            if n.nal_unit_type in (7, 8):      # SPS / PPS
                dec.feed_nalu(n)
        groups = group_idr_access_units(nalus)[:pictures]
        if not groups:
            raise ValueError("no decodable IDR access units")
        return dec, groups, media.file_name
    finally:
        mv_close(media)


def _parse_clip(path: str, pictures: int, mode) -> ParsedClip:
    """Demux + entropy-parse one clip's selected IDR pictures (host;
    raster path — the wave/np-engine and fallback route)."""
    dec, groups, file_name = _demux_groups(path, pictures, mode)
    frames = []
    sps = pps = None
    for group in groups:
        fs, sps, pps, som = dec.parse_idr_syntax(group)
        frames.append((fs, som))
    return ParsedClip(path, frames, sps, pps, file_name)


def _demux_clip(path: str, pictures: int, mode) -> DemuxedClip:
    """Demux one clip + parse its slice headers (no entropy decode —
    that happens bucket-wide, straight into slab staging)."""
    from ..models.h264.slicehdr import parse_slice_header
    dec, groups, file_name = _demux_groups(path, pictures, mode)
    pics = []
    sps = pps = None
    for group in groups:
        pic = []
        for nalu in group:
            sh, sps, pps = parse_slice_header(
                nalu.rbsp, nalu.nal_unit_type, nalu.nal_ref_idc,
                dec.sps_map, dec.pps_map)
            pic.append((nalu, sh))
        pics.append(pic)
    return DemuxedClip(path, pics, sps, pps, file_name)


def _parse_bucket_slab(dcs, pool, staging_mode):
    """Entropy-decode every selected frame of a geometry bucket into ONE
    slab staging batch (the production fused-engine feed bench.py
    measures).  Frames fan across `pool`; a parse failure ZEROES that
    frame's rows (parsed=0 reconstructs as black) and reports the
    owning clip instead of failing the bucket.

    Returns (PackedFrames, owners=[(clip, frame_idx)], failed={path:
    error})."""
    from ..models.h264.syntax import FrameSyntax
    from ..native import (parse_slice_native_slab,
                          parse_slice_native_slab2)
    from ..ops.recon import (make_slab_staging, make_slab_staging2,
                             pack_frames_slots, pack_frames_slots2)
    sps = dcs[0].sps
    wmb, hmb = sps.pic_width_in_mbs, sps.pic_height_in_map_units
    rows = [(dc, fi) for dc in dcs for fi in range(len(dc.pictures))]
    B = len(rows)
    mk = make_slab_staging2 if staging_mode == "device" else         make_slab_staging
    staging = mk(wmb, hmb, B)
    fss = [FrameSyntax(wmb, hmb, lite=True) for _ in range(B)]
    failed: dict = {}

    def parse_frame(i):
        dc, fi = rows[i]
        pps = dc.pps
        for nalu, sh in dc.pictures[fi]:
            if staging_mode == "device":
                parse_slice_native_slab2(
                    fss[i], staging, i, nalu.rbsp, sh.data_bit_offset,
                    sh.first_mb_in_slice, sh.qp,
                    bool(pps.entropy_coding_mode_flag),
                    bool(pps.transform_8x8_mode_flag),
                    cb_qp_off=pps.chroma_qp_index_offset,
                    cr_qp_off=pps.second_chroma_qp_index_offset)
            else:
                parse_slice_native_slab(
                    fss[i], staging, i, nalu.rbsp, sh.data_bit_offset,
                    sh.first_mb_in_slice, sh.qp,
                    bool(pps.entropy_coding_mode_flag),
                    bool(pps.transform_8x8_mode_flag))

    futs = {pool.submit(parse_frame, i): i for i in range(B)}
    for fut, i in futs.items():
        try:
            fut.result()
        except Exception as e:             # noqa: BLE001 — isolation
            dc, fi = rows[i]
            failed[dc.path] = f"{type(e).__name__}: {e}"
            fss[i].parsed[:] = 0           # frame reconstructs as black
            if staging_mode == "device":
                staging["meta_slab"][i][:] = 0

    owners = rows
    if staging_mode == "device":
        packed = pack_frames_slots2(staging, sps, dcs[0].pps)
    else:
        packed = pack_frames_slots(staging, [(fs, None) for fs in fss],
                                   sps, dcs[0].pps)
    return packed, owners, failed


class _Recon:
    """Geometry-keyed cache of sharded reconstruction functions."""

    def __init__(self, mesh, engine: str):
        from ..models.h264.decoder import resolve_engine
        self.mesh = mesh
        # "pallas" kept as a round-2 alias for the fused kernel
        engine = "fused" if engine == "pallas" else engine
        self.engine = resolve_engine(engine)
        self._fns = {}

    def _make(self, wmb, hmb, batch, has8x8, haspcm, slots):
        if self.engine == "fused":
            import jax
            from ..ops.recon_fused import (make_reconstruct_fused,
                                           make_reconstruct_fused_slots,
                                           make_reconstruct_fused_slots2)
            mk = (make_reconstruct_fused_slots2 if slots == 2
                  else make_reconstruct_fused_slots if slots == 1
                  else make_reconstruct_fused)
            interp = jax.devices()[0].platform == "cpu"
            return mk(wmb, hmb, batch, interpret=interp,
                      has8x8=has8x8, haspcm=haspcm)
        from ..ops.recon_wave import make_reconstruct_wave
        return make_reconstruct_wave(wmb, hmb)

    def __call__(self, packed):
        """packed: PackedFrames (raster or slab-slot feed) -> (Y, Cb,
        Cr) numpy, real batch rows."""
        n_dev = self.mesh.devices.size
        arrays, real_b = pad_to_multiple(packed.arrays, n_dev)
        B = next(iter(arrays.values())).shape[0]
        feats = (packed.has8x8, packed.haspcm)
        slots = packed.slots
        key = (packed.wmb, packed.hmb,
               B if self.engine == "fused" else None,
               feats if self.engine == "fused" else None, slots)
        if key not in self._fns:
            self._fns[key] = self._make(packed.wmb, packed.hmb, B,
                                        *feats, slots)
        fn = self._fns[key]
        arrays_s, (ls4, ls8) = shard_packed(
            self.mesh, arrays, packed.ls4, packed.ls8)
        cb_off, cr_off = packed.chroma_qp_off
        with self.mesh:
            if slots == 2:
                y, cb, cr = fn(arrays_s["meta_slab"],
                               arrays_s["luma_slab"],
                               arrays_s["chroma_slab"],
                               arrays_s["dc_slab"], ls4, ls8)
            elif slots == 1:
                small = {k: v for k, v in arrays_s.items()
                         if not k.endswith("_slab")}
                y, cb, cr = fn(small, arrays_s["luma_slab"],
                               arrays_s["chroma_slab"],
                               arrays_s["dc_slab"], ls4, ls8,
                               cb_off, cr_off)
            else:
                y, cb, cr = fn(arrays_s, ls4, ls8, cb_off, cr_off)
        return (np.asarray(y)[:real_b], np.asarray(cb)[:real_b],
                np.asarray(cr)[:real_b])


def batch_thumbnail(clips, outdir, *, pictures_per_clip: int = 1,
                    mode=PictureRepartition.UNFILTERED,
                    fmt=PictureFormat.PNG, quality: int = 75,
                    mesh=None, engine: str = "jax",
                    manifest_path: str | None = None,
                    process_index: int | None = None,
                    process_count: int | None = None,
                    parse_workers: int | None = None,
                    io_workers: int = 8) -> BatchResult:
    """Thumbnail a list of clips, sharded across devices and hosts."""
    import jax
    from ..export.image import export_picture
    from ..ops.recon import pack_frames
    from ..settings import ensure_compile_cache

    ensure_compile_cache()

    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    my_clips = list(clips)[process_index::process_count]

    os.makedirs(outdir, exist_ok=True)
    if manifest_path is None:
        manifest_path = os.path.join(
            outdir, f"manifest.{process_index}.jsonl")
    if mesh is None:
        mesh = make_mesh()
    if parse_workers is None:
        parse_workers = min(32, (os.cpu_count() or 4))

    from ..profiling import StageTimer, device_trace
    timer = StageTimer()
    result = BatchResult()

    # production fast path: entropy-parse whole buckets straight into
    # the slab staging the fused kernel consumes (bench.py's feed);
    # wave/np engines and native-less hosts keep the raster path
    recon = _Recon(mesh, engine)
    use_slab = False
    if recon.engine == "fused" and os.environ.get(
            "MINIVIDEO_TPU_NO_NATIVE") != "1":
        from ..native import available
        use_slab = available()

    with Manifest(manifest_path) as man:
        todo = man.pending(my_clips)
        result.skipped = len(my_clips) - len(todo)

        pool = ThreadPoolExecutor(max_workers=parse_workers)

        # ---- stage 1: parallel host demux (failure-isolated) -------------
        parsed: list = []
        stage1 = _demux_clip if use_slab else _parse_clip
        with timer.stage("parse", len(todo)):
            futs = {pool.submit(stage1, c, pictures_per_clip, mode): c
                    for c in todo}
            for fut, clip in futs.items():
                try:
                    parsed.append(fut.result())
                except Exception as e:         # noqa: BLE001 — isolation
                    trace.warning("PARALLEL", "clip failed: %s: %s",
                                  clip, e)
                    man.failed(clip, error=f"{type(e).__name__}: {e}")
                    result.failed += 1
                    result.errors[clip] = traceback.format_exc()

        # ---- stage 2: bucket by geometry+config, device recon ------------
        def bucket_key(pc):
            sps, p = pc.sps, pc.pps
            return (sps.pic_width_in_mbs, sps.pic_height_in_map_units,
                    bool(p.transform_8x8_mode_flag),
                    p.chroma_qp_index_offset,
                    p.second_chroma_qp_index_offset,
                    bytes(np.asarray(p.scaling_list_4x4, np.uint8)),
                    bytes(np.asarray(p.scaling_list_8x8, np.uint8)))

        buckets: dict = {}
        for pc in parsed:
            buckets.setdefault(bucket_key(pc), []).append(pc)

        export_pool = ThreadPoolExecutor(max_workers=io_workers)
        pending_exports = []

        for pcs in buckets.values():
            if not pcs:
                continue
            owners = []
            if use_slab:
                from ..settings import staging_mode as _staging_mode
                with timer.stage("entropy",
                                 sum(len(pc.pictures) for pc in pcs)):
                    packed, owners, bad = _parse_bucket_slab(
                        pcs, pool, _staging_mode())
                for path, err in bad.items():
                    man.failed(path, error=f"entropy: {err}")
                    result.failed += 1
                    result.errors[path] = err
                # owners stays row-aligned with the staging batch;
                # failed clips are skipped at export time
                pcs = [pc for pc in pcs if pc.path not in bad]
                n_frames = len([1 for pc, _ in owners
                                if pc.path not in bad])
                bad_paths = set(bad)
            else:
                frames = []
                for pc in pcs:
                    for fi, f in enumerate(pc.frames):
                        frames.append(f)
                        owners.append((pc, fi))
                packed = pack_frames(frames, pcs[0].sps, pcs[0].pps)
                n_frames = len(frames)
            try:
                with timer.stage("recon", n_frames), device_trace():
                    ys, cbs, crs = recon(packed)
            except Exception as e:             # noqa: BLE001 — isolation
                for pc in pcs:
                    man.failed(pc.path, error=f"recon: {e}")
                    result.failed += 1
                    result.errors[pc.path] = traceback.format_exc()
                continue
            result.frames += n_frames

            # RGB formats on device engines: convert the whole batch on
            # device (ops/color.py), fused into the readback — same
            # wiring as mv_decode(want_rgb=True)
            rgbs = None
            if recon.engine != "np" and fmt in (PictureFormat.PNG,
                                                PictureFormat.BMP,
                                                PictureFormat.TGA):
                from ..ops.color import yuv420_to_rgb_device
                rgbs = yuv420_to_rgb_device(ys, cbs, crs)

            # ---- stage 3: async export + manifest -----------------------
            per_clip: dict = {}
            skip = bad_paths if use_slab else ()
            for bi, (pc, fi) in enumerate(owners):
                if pc.path in skip:
                    continue
                per_clip.setdefault(pc.path, []).append((pc, fi, bi))

            def export_clip(items, ys=ys, cbs=cbs, crs=crs, rgbs=rgbs):
                pc = items[0][0]
                sps = pc.sps
                outs = []
                for _, fi, bi in items:
                    y = ys[bi][:sps.cropped_height, :sps.cropped_width]
                    cb = cbs[bi][:sps.cropped_height // 2,
                                 :sps.cropped_width // 2]
                    cr = crs[bi][:sps.cropped_height // 2,
                                 :sps.cropped_width // 2]
                    rgb = (np.asarray(rgbs[bi])[:sps.cropped_height,
                                                :sps.cropped_width]
                           if rgbs is not None else None)
                    suffix = f"_{fi}" if len(items) > 1 else ""
                    base = os.path.join(outdir, pc.file_name + suffix)
                    outs.append(export_picture(base, fmt, y, cb, cr,
                                               quality, rgb=rgb))
                return pc.path, outs

            for items in per_clip.values():
                pending_exports.append(export_pool.submit(export_clip,
                                                          items))

        with timer.stage("export", len(pending_exports)):
            for fut in pending_exports:
                try:
                    path, outs = fut.result()
                    man.done(path, outputs=outs)
                    result.done += 1
                    result.outputs.extend(outs)
                except Exception as e:         # noqa: BLE001 — isolation
                    trace.warning("PARALLEL", "export failed: %s", e)
                    result.failed += 1
            export_pool.shutdown()
        pool.shutdown()

    timer.report("PARALLEL")
    return result
