"""ctypes bindings for the native host runtime (libminivideo_native.so).

Build with `make -C minivideo_tpu/native` (auto-attempted on first use).
`parse_slice_native` is a drop-in replacement for the Python entropy
parsers: it fills the same FrameSyntax arrays ~100x faster.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .. import trace
from ..bitio import BitstreamError

_DIR = os.path.dirname(os.path.abspath(__file__))
# MINIVIDEO_TPU_NATIVE_LIB overrides the library path (used by
# tools/asan_check.sh to load an AddressSanitizer-instrumented build)
_LIB_PATH = os.environ.get(
    "MINIVIDEO_TPU_NATIVE_LIB",
    os.path.join(_DIR, "libminivideo_native.so"))
_lib = None


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _DIR], capture_output=True,
                           text=True, timeout=300)
        if r.returncode != 0:
            trace.warning("MAIN", "native build failed: %s", r.stderr[-400:])
            return False
        return True
    except Exception as e:  # noqa: BLE001
        trace.warning("MAIN", "native build error: %s", e)
        return False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        trace.warning("MAIN", "native load failed: %s", e)
        return None
    lib.mv_parse_slice.restype = ctypes.c_int64
    lib.mv_parse_slice.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.mv_parse_slice_slab.restype = ctypes.c_int64
    lib.mv_parse_slice_slab.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.mv_parse_slice_slab2.restype = ctypes.c_int64
    lib.mv_parse_slice_slab2.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.mv_cabac_bins_total.restype = ctypes.c_uint64
    lib.mv_cabac_bins_total.argtypes = []
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32 = ctypes.c_int32
    lib.mv_yuv420_to_rgb.restype = None
    lib.mv_yuv420_to_rgb.argtypes = [u8p, u8p, u8p, i32, i32, i32, i32,
                                     u8p]
    lib.mv_encode_jpeg.restype = ctypes.c_int64
    lib.mv_encode_jpeg.argtypes = [u8p, u8p, u8p, i32, i32, i32, i32,
                                   i32, u8p, ctypes.c_int64]
    lib.mv_encode_png.restype = ctypes.c_int64
    lib.mv_encode_png.argtypes = [u8p, i32, i32, i32, i32, u8p,
                                  ctypes.c_int64]
    for enc in (lib.mv_encode_bmp, lib.mv_encode_tga):
        enc.restype = ctypes.c_int64
        enc.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32, u8p,
                        ctypes.c_int64]
    _lib = lib
    return lib


def _u8p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _c(arr):
    a = np.ascontiguousarray(arr)
    assert a.dtype == np.uint8
    return a


def yuv420_to_rgb_native(y, cb, cr) -> np.ndarray:
    """Planar 4:2:0 -> interleaved RGB888 (integer BT.601; bit-exact with
    export/image.py yuv420_to_rgb — the reference's mb_to_rgb math,
    export_utils.c:297-304)."""
    lib = load()
    assert lib is not None
    y, cb, cr = _c(y), _c(cb), _c(cr)
    h, w = y.shape
    ch, cw = cb.shape
    out = np.empty((h, w, 3), np.uint8)
    lib.mv_yuv420_to_rgb(_u8p(y), _u8p(cb), _u8p(cr), h, w, ch, cw,
                         _u8p(out))
    return out


def encode_jpeg_native(y, cb, cr, quality: int = 75) -> bytes:
    """Baseline JPEG (4:2:0) straight from decoded planes; C-speed
    equivalent of the reference's libjpeg path (export.c:341-445)."""
    lib = load()
    assert lib is not None
    y, cb, cr = _c(y), _c(cb), _c(cr)
    h, w = y.shape
    ch, cw = cb.shape
    cap = h * w * 3 + (1 << 16)
    out = np.empty(cap, np.uint8)
    n = lib.mv_encode_jpeg(_u8p(y), _u8p(cb), _u8p(cr), h, w, ch, cw,
                           quality, _u8p(out), cap)
    if n < 0:
        raise RuntimeError(f"native JPEG encode failed (code {n})")
    return out[:n].tobytes()


def encode_png_native(rgb, level: int = 3, threads: int = 0) -> bytes:
    """PNG RGB8: per-row sub filtering + banded parallel deflate (pigz
    construction: raw bands joined at Z_FULL_FLUSH byte boundaries,
    adler32_combine trailer).  threads=0 = all cores.  Reference:
    export.c:447-551 (libpng/stb single-thread writers)."""
    lib = load()
    assert lib is not None
    rgb = _c(rgb)
    h, w, _ = rgb.shape
    cap = h * (w * 3 + 1) + (h * w // 100) + (1 << 16)
    out = np.empty(cap, np.uint8)
    n = lib.mv_encode_png(_u8p(rgb), h, w, level, threads, _u8p(out),
                          cap)
    if n < 0:
        raise RuntimeError(f"native PNG encode failed (code {n})")
    return out[:n].tobytes()


def encode_bmp_native(rgb) -> bytes:
    lib = load()
    assert lib is not None
    rgb = _c(rgb)
    h, w, _ = rgb.shape
    cap = 54 + (w * 3 + 3) // 4 * 4 * h
    out = np.empty(cap, np.uint8)
    n = lib.mv_encode_bmp(_u8p(rgb), h, w, _u8p(out), cap)
    if n < 0:
        raise RuntimeError(f"native BMP encode failed (code {n})")
    return out[:n].tobytes()


def encode_tga_native(rgb) -> bytes:
    lib = load()
    assert lib is not None
    rgb = _c(rgb)
    h, w, _ = rgb.shape
    cap = 18 + h * w * 3
    out = np.empty(cap, np.uint8)
    n = lib.mv_encode_tga(_u8p(rgb), h, w, _u8p(out), cap)
    if n < 0:
        raise RuntimeError(f"native TGA encode failed (code {n})")
    return out[:n].tobytes()


def cabac_bins_total() -> int:
    """Total CABAC bins decoded by this process (all threads); sample a
    delta around a workload for measured bins/frame observability."""
    lib = load()
    return int(lib.mv_cabac_bins_total()) if lib is not None else 0


def available() -> bool:
    return load() is not None


# buffer order must match entropy.cc's mv_parse_slice
_FIELDS = ("mb_kind", "qpy", "i16_mode", "chroma_mode", "luma4x4_modes",
           "luma8x8_modes", "cbp_luma", "cbp_chroma", "luma_dc", "luma_ac",
           "luma8x8_coeff", "chroma_dc", "chroma_ac", "total_coeff_luma",
           "total_coeff_chroma", "cbf_luma_dc", "cbf_luma", "cbf_luma8x8",
           "cbf_chroma_dc", "cbf_chroma", "transform8x8", "parsed")


def parse_slice_native(fs, rbsp: bytes, data_bit_offset: int,
                       first_mb: int, slice_qp: int, entropy_cabac: bool,
                       transform8x8_mode: bool) -> int:
    """Parse one I slice into the FrameSyntax `fs`.  Returns MB count.

    Raises BitstreamError on parse errors (same type as the Python
    parsers, so the decoder's 64-error tolerance loop treats native
    and Python failures identically — reference h264.c:181-187)."""
    lib = load()
    assert lib is not None
    assert not getattr(fs, "lite", False), \
        "classic (raster) parse needs full coefficient buffers"
    bufs = (ctypes.c_void_p * len(_FIELDS))()
    for i, name in enumerate(_FIELDS):
        arr = getattr(fs, name)
        assert isinstance(arr, np.ndarray) and arr.flags["C_CONTIGUOUS"]
        bufs[i] = arr.ctypes.data_as(ctypes.c_void_p).value
    n = lib.mv_parse_slice(
        rbsp, len(rbsp), data_bit_offset,
        fs.width_mbs, fs.height_mbs, first_mb, slice_qp,
        1 if entropy_cabac else 0, 1 if transform8x8_mode else 0, bufs)
    if n < 0:
        raise BitstreamError(f"native slice parse failed (code {n})")
    # PCM macroblocks: native stored raw pixels in the coefficient
    # buffers; mirror them into the FrameSyntax dicts for the oracle path
    from ..models.h264.syntax import KIND_IPCM
    for mb in np.nonzero(fs.mb_kind == KIND_IPCM)[0]:
        mb = int(mb)
        if mb in fs.pcm_y:
            continue
        fs.pcm_y[mb] = fs.luma_ac[mb].reshape(16, 16).astype(np.uint8)
        c = fs.chroma_ac[mb].reshape(2, 8, 8).astype(np.uint8)
        fs.pcm_cb[mb] = c[0]
        fs.pcm_cr[mb] = c[1]
    return int(n)


def parse_slice_native_slab2(fs, slabs, i: int, rbsp: bytes,
                             data_bit_offset: int, first_mb: int,
                             slice_qp: int, entropy_cabac: bool,
                             transform8x8_mode: bool,
                             cb_qp_off: int = 0,
                             cr_qp_off: int = 0) -> int:
    """Device-layout slab parse: coefficients land in `slabs` (the dict
    from ops.recon.make_slab_staging2) at frame row `i` as the fused
    kernel's per-wave feeds [W, S, maxw] (frame-major staging), and the
    parser ALSO emits the meta rows [W, 40, maxw] int32 — device prep
    is one block-transpose + reshape per slab (no slot gathers, no meta
    build/skew gather; PERF.md round 3).  The C side sees batch=1 with
    per-frame base pointers, which keeps each pool worker's writes in
    a disjoint contiguous region."""
    lib = load()
    assert lib is not None
    bufs = (ctypes.c_void_p * (len(_FIELDS) + 4))()
    for j, name in enumerate(_FIELDS):
        arr = getattr(fs, name)
        assert isinstance(arr, np.ndarray) and arr.flags["C_CONTIGUOUS"]
        bufs[j] = arr.ctypes.data_as(ctypes.c_void_p).value
    for j, name in enumerate(("luma_slab", "chroma_slab", "dc_slab",
                              "meta_slab")):
        arr = slabs[name][i]
        want = np.int32 if name == "meta_slab" else np.int16
        assert arr.dtype == want and arr.flags["C_CONTIGUOUS"]
        bufs[len(_FIELDS) + j] = arr.ctypes.data_as(ctypes.c_void_p).value
    n = lib.mv_parse_slice_slab2(
        rbsp, len(rbsp), data_bit_offset,
        fs.width_mbs, fs.height_mbs, first_mb, slice_qp,
        1 if entropy_cabac else 0, 1 if transform8x8_mode else 0,
        slabs["maxw"], 1, 0, cb_qp_off, cr_qp_off, bufs)
    if n < 0:
        raise BitstreamError(f"native slab2 slice parse failed (code {n})")
    return int(n)


def parse_slice_native_slab(fs, slabs, i: int, rbsp: bytes,
                            data_bit_offset: int, first_mb: int,
                            slice_qp: int, entropy_cabac: bool,
                            transform8x8_mode: bool) -> int:
    """Slab-emission parse: coefficients land in `slabs` (the dict from
    ops.recon.make_slab_staging) at batch row `i` as skew-slot-ordered
    int16 records; per-MB metadata still fills `fs`.  The device prep
    for these buffers is one dense transpose (ops/slab.slot_feed)."""
    lib = load()
    assert lib is not None
    bufs = (ctypes.c_void_p * (len(_FIELDS) + 3))()
    for j, name in enumerate(_FIELDS):
        arr = getattr(fs, name)
        assert isinstance(arr, np.ndarray) and arr.flags["C_CONTIGUOUS"]
        bufs[j] = arr.ctypes.data_as(ctypes.c_void_p).value
    for j, name in enumerate(("luma_slab", "chroma_slab", "dc_slab")):
        arr = slabs[name][i]
        assert arr.dtype == np.int16 and arr.flags["C_CONTIGUOUS"]
        bufs[len(_FIELDS) + j] = arr.ctypes.data_as(ctypes.c_void_p).value
    n = lib.mv_parse_slice_slab(
        rbsp, len(rbsp), data_bit_offset,
        fs.width_mbs, fs.height_mbs, first_mb, slice_qp,
        1 if entropy_cabac else 0, 1 if transform8x8_mode else 0,
        slabs["maxw"], bufs)
    if n < 0:
        raise BitstreamError(f"native slab slice parse failed (code {n})")
    return int(n)
