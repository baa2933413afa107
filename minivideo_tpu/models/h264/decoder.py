"""H.264 intra decoder driver: NALU stream -> decoded pictures.

Reference: h264_decode (minivideo/src/decoder/h264/h264.c:41-206) — NALU
loop dispatching on nal_unit_type {5 IDR, 6 SEI, 7 SPS, 8 PPS}, stopping
after `picture_number` IDRs or too many errors.  This driver is the
host-side orchestration; reconstruction runs either through the numpy
oracle (engine="np") or the batched TPU path (engine="jax", ops/).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ... import trace
from ...bitio import BitstreamError
from .nalu import Nalu, NaluType, parse_nalu, split_annexb
from .params import (PPS, SPS, UnsupportedStream, parse_pps, parse_sei,
                     parse_sps)
from .recon_np import reconstruct_frame
from .slicehdr import parse_slice_header
from .syntax import CavlcSliceParser, FrameSyntax
from .cabac import CabacSliceParser

MAX_CONSECUTIVE_ERRORS = 64  # reference: h264.c:181-187


def resolve_engine(engine: str) -> str:
    """Map the user-facing engine name to a concrete backend.

    "jax" is the production alias: the fused Pallas kernel on TPU, the
    XLA wave driver on CPU backends (where Pallas would need interpret
    mode).  "fused"/"wave"/"np" force a specific engine
    (settings.ENGINES)."""
    if engine != "jax":
        return engine
    try:
        import jax
        platform = jax.devices()[0].platform
    except Exception:                      # noqa: BLE001 — no backend
        return "np"
    return "wave" if platform == "cpu" else "fused"


@dataclass
class DecodedPicture:
    """One decoded IDR picture: 4:2:0 planes + display crop."""
    y: np.ndarray
    cb: np.ndarray
    cr: np.ndarray
    width: int          # cropped display width
    height: int
    idr_index: int = 0
    syntax: object = None    # FrameSyntax (kept for tests/benchmarks)
    rgb: np.ndarray = None   # device-converted RGB888 (ops/color.py),
    #                          set when the decode requested RGB output

    def cropped(self):
        return (self.y[:self.height, :self.width],
                self.cb[:self.height // 2, :self.width // 2],
                self.cr[:self.height // 2, :self.width // 2])

    def cropped_rgb(self):
        """Display-cropped RGB888: the device-converted plane when the
        decode produced one, else the native/numpy host conversion
        (bit-identical by construction — test_export_apps pins it)."""
        if self.rgb is not None:
            return self.rgb[:self.height, :self.width]
        from ...export.image import yuv420_to_rgb
        return yuv420_to_rgb(*self.cropped())


class H264Decoder:
    """Stateful NALU-stream decoder (SPS/PPS context + IDR decoding)."""

    def __init__(self, engine: str = "np", want_rgb: bool = False):
        self.sps_map: dict = {}
        self.pps_map: dict = {}
        self.engine = engine
        self.idr_count = 0
        self.error_count = 0
        # RGB conversion on device, fused into the readback (SURVEY §7:
        # pixel conversion is a device op; ops/color.py).  Only takes
        # effect on device engines; the np oracle leaves rgb=None and
        # export falls back to the host converter.
        self.want_rgb = want_rgb

    # -- NALU feed -----------------------------------------------------------

    def feed_nalu(self, nalu: Nalu):
        """Process one NALU; returns a DecodedPicture for IDR slices that
        complete a picture, else None."""
        t = nalu.nal_unit_type
        if t == NaluType.SPS:
            sps = parse_sps(nalu.rbsp)
            self.sps_map[sps.seq_parameter_set_id] = sps
            return None
        if t == NaluType.PPS:
            pps = parse_pps(nalu.rbsp, self.sps_map)
            self.pps_map[pps.pic_parameter_set_id] = pps
            return None
        if t == NaluType.SEI:
            parse_sei(nalu.rbsp)
            return None
        if t == NaluType.SLICE_IDR:
            return self._decode_idr([nalu])
        if t == NaluType.SLICE:
            # non-IDR slice: I slices only reachable via IDR in this
            # decoder; skipped like the reference (h264.c:127-130)
            trace.t1("H264", "skipping non-IDR slice NALU")
            return None
        if t in (NaluType.PREFIX, NaluType.SLICE_SVC):
            raise UnsupportedStream("SVC/MVC NALUs")
        trace.t2("NALU", "ignoring NALU type %d", int(t))
        return None

    # -- picture decoding ----------------------------------------------------

    def parse_idr_syntax(self, nalus) -> tuple:
        """Entropy-decode the slices of one IDR picture into a FrameSyntax.

        `nalus` is a list of SLICE_IDR Nalu objects covering the picture.
        Returns (FrameSyntax, SPS, PPS, slice_of_mb)."""
        fs = None
        sps = pps = None
        slice_of_mb = None
        for snum, nalu in enumerate(nalus):
            sh, sps, pps = parse_slice_header(
                nalu.rbsp, nalu.nal_unit_type, nalu.nal_ref_idc,
                self.sps_map, self.pps_map)
            if fs is None:
                fs = FrameSyntax(sps.pic_width_in_mbs,
                                 sps.pic_height_in_map_units)
                slice_of_mb = np.full(fs.n_mbs, -1, dtype=np.int32)
            n = self._parse_slice(nalu, sh, sps, pps, fs)
            slice_of_mb[sh.first_mb_in_slice:sh.first_mb_in_slice + n] = snum
            trace.t1("SLICE", "decoded slice: %d MBs from %d",
                     n, sh.first_mb_in_slice)
        return fs, sps, pps, slice_of_mb

    def _parse_slice(self, nalu, sh, sps, pps, fs):
        """Entropy-decode one slice into fs: native C++ fast path when
        available, Python parsers otherwise (or when
        MINIVIDEO_TPU_NO_NATIVE=1)."""
        import os as _os
        if _os.environ.get("MINIVIDEO_TPU_NO_NATIVE") != "1":
            from ...native import available, parse_slice_native
            if available():
                return parse_slice_native(
                    fs, nalu.rbsp, sh.data_bit_offset,
                    sh.first_mb_in_slice, sh.qp,
                    bool(pps.entropy_coding_mode_flag),
                    bool(pps.transform_8x8_mode_flag))
        if pps.entropy_coding_mode_flag:
            parser = CabacSliceParser(nalu.rbsp, sh, sps, pps, fs)
        else:
            from ...bitio import BitReader
            r = BitReader(nalu.rbsp, start_bit=sh.data_bit_offset)
            parser = CavlcSliceParser(r, sh, sps, pps, fs)
        return parser.parse_slice_data()

    def parse_groups_slab(self, groups, sps, pps, staging_mode=None,
                          pool=None):
        """Entropy-parse many pictures straight into slab staging (the
        production fused-engine feed; native parser only).  groups:
        list of NALU lists, all sharing sps/pps.

        Two staging layouts, selected by settings.staging_mode():
          "records" — v1 slot records, cache-friendly host writes, the
            device pays ~11 ms/1080p-batch-16 of feed transposes.  Best
            when the host is the bottleneck (few cores per chip).
          "device" — v2 frame-major device layout: the parser emits the
            kernel's feeds (incl. meta rows), device prep is one block
            transpose; host writes are ~40% slower (strided).  Best
            when host cores are plentiful (production hosts) — device
            stage measured 2.8x faster (PERF.md round 3).

        `pool` (optional ThreadPoolExecutor): every (picture, slice)
        task fans out individually — slices are entropy-independent
        (h264_slice.c:1013-1139) and the native parse releases the GIL,
        so per-frame host latency drops ~min(slices, cores)x on
        multi-slice streams and pictures parse concurrently either way.
        """
        from ...settings import staging_mode as _staging_mode
        mode = staging_mode or _staging_mode()
        wmb = sps.pic_width_in_mbs
        hmb = sps.pic_height_in_map_units
        if mode == "device":
            from ...native import parse_slice_native_slab2
            from ...ops.recon import (make_slab_staging2,
                                      pack_frames_slots2)
            staging = make_slab_staging2(wmb, hmb, len(groups))
        else:
            from ...native import parse_slice_native_slab
            from ...ops.recon import make_slab_staging, pack_frames_slots
            staging = make_slab_staging(wmb, hmb, len(groups))

        def parse_one(i, fs, sh, nalu):
            if mode == "device":
                return parse_slice_native_slab2(
                    fs, staging, i, nalu.rbsp, sh.data_bit_offset,
                    sh.first_mb_in_slice, sh.qp,
                    bool(pps.entropy_coding_mode_flag),
                    bool(pps.transform_8x8_mode_flag),
                    cb_qp_off=pps.chroma_qp_index_offset,
                    cr_qp_off=pps.second_chroma_qp_index_offset)
            return parse_slice_native_slab(
                fs, staging, i, nalu.rbsp, sh.data_bit_offset,
                sh.first_mb_in_slice, sh.qp,
                bool(pps.entropy_coding_mode_flag),
                bool(pps.transform_8x8_mode_flag))

        frames = []
        tasks = []                # (future|n, slice_of_mb, snum, first_mb)
        for i, nalus in enumerate(groups):
            fs = FrameSyntax(wmb, hmb, lite=True)
            slice_of_mb = np.full(fs.n_mbs, -1, dtype=np.int32)
            for snum, nalu in enumerate(nalus):
                sh, _, _ = parse_slice_header(
                    nalu.rbsp, nalu.nal_unit_type, nalu.nal_ref_idc,
                    self.sps_map, self.pps_map)
                if pool is not None:
                    tasks.append((pool.submit(parse_one, i, fs, sh, nalu),
                                  slice_of_mb, snum,
                                  sh.first_mb_in_slice))
                else:
                    n = parse_one(i, fs, sh, nalu)
                    slice_of_mb[sh.first_mb_in_slice:
                                sh.first_mb_in_slice + n] = snum
            frames.append((fs, slice_of_mb))
        for fut, slice_of_mb, snum, first_mb in tasks:
            n = fut.result()
            slice_of_mb[first_mb:first_mb + n] = snum
        if mode == "device":
            return pack_frames_slots2(staging, sps, pps), frames
        return pack_frames_slots(staging, frames, sps, pps), frames

    def reconstruct_batch(self, parsed_groups, packed=None):
        """Reconstruct MANY parsed pictures in one engine batch.

        parsed_groups: list of (fs, sps, pps, slice_of_mb) sharing one
        SPS/PPS configuration.  One jit/kernel invocation covers the
        whole batch (vs per-picture batch-1 calls), which is how the
        production TPU path amortizes compile and dispatch.  `packed`
        may be a prebuilt PackedFrames (e.g. slot staging from
        parse_groups_slab)."""
        engine = resolve_engine(self.engine)
        fs0, sps, pps, _ = parsed_groups[0]
        frames = [(fs, som) for fs, _, _, som in parsed_groups]
        from ...ops.recon import pack_frames
        from ...settings import ensure_compile_cache
        ensure_compile_cache()
        if packed is None:
            packed = pack_frames(frames, sps, pps)
        if engine == "fused":
            from ...ops.recon_fused import reconstruct_frames_fused
            import jax as _jax
            interp = _jax.devices()[0].platform == "cpu"
            yb, cbb, crb = reconstruct_frames_fused(packed,
                                                    interpret=interp)
        else:
            from ...ops.recon_wave import reconstruct_frames_wave
            yb, cbb, crb = reconstruct_frames_wave(packed)
        rgbb = None
        if self.want_rgb:
            from ...ops.color import yuv420_to_rgb_device
            rgbb = yuv420_to_rgb_device(yb, cbb, crb)
        pics = []
        for i, (fs, _) in enumerate(frames):
            pics.append(DecodedPicture(
                y=np.asarray(yb[i]), cb=np.asarray(cbb[i]),
                cr=np.asarray(crb[i]),
                width=sps.cropped_width, height=sps.cropped_height,
                idr_index=self.idr_count, syntax=fs,
                rgb=np.asarray(rgbb[i]) if rgbb is not None else None))
            self.idr_count += 1
        return pics

    def _decode_idr(self, nalus):
        fs, sps, pps, slice_of_mb = self.parse_idr_syntax(nalus)
        engine = resolve_engine(self.engine)
        if engine != "np":
            from ...ops.recon import pack_frames
            from ...settings import ensure_compile_cache
            import numpy as _np
            ensure_compile_cache()
            packed = pack_frames([(fs, slice_of_mb)], sps, pps)
            if engine == "fused":
                from ...ops.recon_fused import reconstruct_frames_fused
                import jax as _jax
                interp = _jax.devices()[0].platform == "cpu"
                yb, cbb, crb = reconstruct_frames_fused(packed,
                                                        interpret=interp)
            else:
                from ...ops.recon_wave import reconstruct_frames_wave
                yb, cbb, crb = reconstruct_frames_wave(packed)
            rgb = None
            if self.want_rgb:
                from ...ops.color import yuv420_to_rgb_device
                rgb = _np.asarray(yuv420_to_rgb_device(yb, cbb, crb)[0])
            y, cb, cr = (_np.asarray(yb[0]), _np.asarray(cbb[0]),
                         _np.asarray(crb[0]))
        else:
            y, cb, cr = reconstruct_frame(fs, sps, pps, slice_of_mb)
            rgb = None
        pic = DecodedPicture(
            y=y, cb=cb, cr=cr,
            width=sps.cropped_width, height=sps.cropped_height,
            idr_index=self.idr_count, syntax=fs, rgb=rgb)
        self.idr_count += 1
        return pic


def _decode_batched(dec, group_iter, max_pictures, errors):
    """The production decode path: entropy-parse every selected picture
    first, then reconstruct groups sharing an SPS/PPS config in ONE
    engine batch (one compile + one kernel dispatch for the whole set).
    On TPU with the native parser, coefficients flow through the
    slot-ordered slab staging — the same feed bench.py measures."""
    import os as _os
    engine = resolve_engine(dec.engine)
    use_slab = False
    if engine == "fused" and _os.environ.get(
            "MINIVIDEO_TPU_NO_NATIVE") != "1":
        from ...native import available
        use_slab = available()

    # partition consecutive groups by their (SPS, PPS) configuration
    # (peeked from the first slice header of each group)
    parts = []
    for group in group_iter:
        try:
            sh, sps, pps = parse_slice_header(
                group[0].rbsp, group[0].nal_unit_type,
                group[0].nal_ref_idc, dec.sps_map, dec.pps_map)
        except (ValueError, BitstreamError) as e:
            trace.warning("H264", "slice header error: %s", e)
            errors += 1
            if errors > MAX_CONSECUTIVE_ERRORS:
                break
            continue
        if parts and parts[-1][0] is sps and parts[-1][1] is pps:
            parts[-1][2].append(group)
        else:
            parts.append((sps, pps, [group]))
        if max_pictures and sum(len(p[2]) for p in parts) >= max_pictures:
            break
    if max_pictures:
        total = 0
        for k, (sps, pps, groups) in enumerate(parts):
            if total + len(groups) > max_pictures:
                parts[k] = (sps, pps, groups[:max_pictures - total])
                del parts[k + 1:]
                break
            total += len(groups)

    pictures = []
    pool = None
    if use_slab and (_os.cpu_count() or 1) > 1:
        # (picture, slice) tasks fan across cores; the native parse
        # releases the GIL (see parse_groups_slab docstring)
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=_os.cpu_count())
    try:
        _decode_batched_parts(dec, parts, pictures, pool, use_slab,
                              errors)
    finally:
        if pool is not None:
            pool.shutdown()
    return pictures


def _decode_batched_parts(dec, parts, pictures, pool, use_slab, errors):
    for sps, pps, groups in parts:
        packed = None
        parsed = None
        if use_slab:
            try:
                packed, frames = dec.parse_groups_slab(groups, sps, pps,
                                                       pool=pool)
                parsed = [(fs, sps, pps, som) for fs, som in frames]
            except (RuntimeError, ValueError, BitstreamError) as e:
                trace.warning("H264", "slab parse failed (%s); "
                              "falling back to raster", e)
                packed = None
        if packed is None:
            parsed = []
            for group in groups:
                try:
                    fs, sps_g, pps_g, som = dec.parse_idr_syntax(group)
                    parsed.append((fs, sps_g, pps_g, som))
                except UnsupportedStream:
                    raise
                except (ValueError, BitstreamError) as e:
                    trace.warning("H264", "IDR parse error: %s", e)
                    errors += 1
                    if errors > MAX_CONSECUTIVE_ERRORS:
                        break
            if not parsed:
                continue
        pictures.extend(dec.reconstruct_batch(parsed, packed=packed))


def group_idr_access_units(nalus):
    """Group consecutive SLICE_IDR NALUs into access units (pictures).

    Slices of the same picture share first_mb ordering; a new picture
    starts when first_mb_in_slice == 0."""
    groups = []
    current = []
    for n in nalus:
        if n.nal_unit_type != NaluType.SLICE_IDR:
            continue
        # peek first_mb_in_slice (first ue(v) of the slice header)
        from ...bitio import BitReader
        from .expgolomb import read_ue
        first_mb = read_ue(BitReader(n.rbsp))
        if first_mb == 0 and current:
            groups.append(current)
            current = []
        current.append(n)
    if current:
        groups.append(current)
    return groups


def decode_annexb(data: bytes, max_pictures: int = 0, engine: str = "np",
                  want_rgb: bool = False):
    """Decode an Annex-B byte stream; returns list of DecodedPicture.

    Mirrors the reference's h264_decode() main loop (h264.c:76-188),
    including its tolerance for per-NALU errors.  want_rgb: device
    engines also return RGB888 converted on device (ops/color.py)."""
    dec = H264Decoder(engine=engine, want_rgb=want_rgb)
    pictures = []
    errors = 0
    units = split_annexb(data)
    # first pass: parameter sets; group IDR slices into access units
    nalus = []
    for off, raw in units:
        try:
            nalus.append(parse_nalu(raw, off))
        except (ValueError, BitstreamError) as e:
            trace.warning("NALU", "bad NALU at %d: %s", off, e)
            errors += 1
            if errors > MAX_CONSECUTIVE_ERRORS:
                break
    idr_groups = group_idr_access_units(nalus)
    group_iter = iter(idr_groups)
    for n in nalus:
        if n.nal_unit_type == NaluType.SLICE_IDR:
            continue
        try:
            dec.feed_nalu(n)
        except UnsupportedStream:
            raise
        except (ValueError, BitstreamError) as e:
            trace.warning("H264", "NALU decode error: %s", e)
            errors += 1
            if errors > MAX_CONSECUTIVE_ERRORS:
                break
    if resolve_engine(engine) != "np":
        return _decode_batched(dec, group_iter, max_pictures, errors)
    for group in group_iter:
        try:
            pictures.append(dec._decode_idr(group))
        except UnsupportedStream:
            raise
        except (ValueError, BitstreamError) as e:
            trace.warning("H264", "IDR decode error: %s", e)
            errors += 1
            if errors > MAX_CONSECUTIVE_ERRORS:
                break
        if max_pictures and len(pictures) >= max_pictures:
            break
    return pictures
