#!/usr/bin/env python
"""JAX-free native-library exercise for the ASan gate.

Drives every native entry point (entropy parser in all three staging
modes, container demuxers, export encoders) over valid AND mutated
inputs — truncations and byte flips must surface as error codes or
BitstreamError, never as memory errors.  Run under an
AddressSanitizer-instrumented build via tools/asan_check.sh; kept free
of `import jax` because jaxlib itself is not ASan-clean under
LD_PRELOAD.

Usage: python tools/asan_exercise.py [rounds]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np

from minivideo_tpu.bitio import BitstreamError

META_ROWS = 40          # ops/slab.py layout (kept jax-free here)


def slab_geometry(wmb, hmb):
    n_waves = 2 * (hmb - 1) + wmb
    maxw = min(hmb, (wmb + 1) // 2 + 1)
    return n_waves, maxw


def make_stagings(wmb, hmb):
    W, maxw = slab_geometry(wmb, hmb)
    v1 = {
        "luma_slab": np.zeros((1, W * maxw, 256), np.int16),
        "chroma_slab": np.zeros((1, W * maxw, 128), np.int16),
        "dc_slab": np.zeros((1, W * maxw, 32), np.int16),
        "maxw": maxw,
    }
    v2 = {
        "luma_slab": np.zeros((1, W, 256, maxw), np.int16),
        "chroma_slab": np.zeros((1, W, 128, maxw), np.int16),
        "dc_slab": np.zeros((1, W, 32, maxw), np.int16),
        "meta_slab": np.zeros((1, W, META_ROWS, maxw), np.int32),
        "maxw": maxw,
        "batch": 1,
    }
    return v1, v2


def exercise_entropy(rounds):
    from fixtures.h264enc2 import make_stream2
    from minivideo_tpu import native
    from minivideo_tpu.models.h264.decoder import H264Decoder
    from minivideo_tpu.models.h264.nalu import parse_nalu, split_annexb
    from minivideo_tpu.models.h264.slicehdr import parse_slice_header
    from minivideo_tpu.models.h264.syntax import FrameSyntax

    wmb, hmb = 11, 7
    rng = np.random.default_rng(0)
    n_ok = n_err = 0
    for rnd in range(rounds):
        entropy = "cabac" if rnd % 2 else "cavlc"
        # every third round uses escape-range levels, so the CABAC
        # UEG0 division-batched bypass path and the CAVLC level escape
        # codes run under ASan on both valid and corrupted inputs
        big = rnd % 3 == 2
        data = make_stream2(width_mbs=wmb, height_mbs=hmb, n_pictures=1,
                            seed=300 + rnd, mb_kinds=("i16", "i4"),
                            density=0.9 if big else 0.4, entropy=entropy,
                            transform_8x8=bool(rnd % 3 == 0),
                            allow_pcm=bool(rnd % 4 == 0),
                            max_level=700 if big else 6)
        dec = H264Decoder()
        nalus = [parse_nalu(raw, off) for off, raw in split_annexb(data)]
        for n in nalus:
            if n.nal_unit_type in (7, 8):
                dec.feed_nalu(n)
        slices = []
        for n in nalus:
            if n.nal_unit_type == 5:
                sh, sps, pps = parse_slice_header(
                    n.rbsp, n.nal_unit_type, n.nal_ref_idc, dec.sps_map,
                    dec.pps_map)
                slices.append((n.rbsp, sh, sps, pps))

        def run_one(rbsp, sh, pps):
            v1, v2 = make_stagings(wmb, hmb)
            cabac = bool(pps.entropy_coding_mode_flag)
            t8 = bool(pps.transform_8x8_mode_flag)
            for mode in ("classic", "slab", "slab2"):
                fs = FrameSyntax(wmb, hmb, lite=(mode != "classic"))
                try:
                    if mode == "classic":
                        native.parse_slice_native(
                            fs, rbsp, sh.data_bit_offset,
                            sh.first_mb_in_slice, sh.qp, cabac, t8)
                    elif mode == "slab":
                        native.parse_slice_native_slab(
                            fs, v1, 0, rbsp, sh.data_bit_offset,
                            sh.first_mb_in_slice, sh.qp, cabac, t8)
                    else:
                        native.parse_slice_native_slab2(
                            fs, v2, 0, rbsp, sh.data_bit_offset,
                            sh.first_mb_in_slice, sh.qp, cabac, t8,
                            cb_qp_off=pps.chroma_qp_index_offset,
                            cr_qp_off=pps.second_chroma_qp_index_offset)
                    yield True
                except BitstreamError:
                    yield False

        for rbsp, sh, sps, pps in slices:
            # valid parse in all three staging modes
            for ok in run_one(rbsp, sh, pps):
                n_ok += ok
                n_err += not ok
            # truncations: every parse must error or stop cleanly
            for cut in (1, 2, 5, len(rbsp) // 3, len(rbsp) // 2,
                        max(1, len(rbsp) - 2)):
                for ok in run_one(rbsp[:cut], sh, pps):
                    n_ok += ok
                    n_err += not ok
            # byte flips: random corruption anywhere in the payload
            for _ in range(8):
                mut = bytearray(rbsp)
                for _ in range(rng.integers(1, 4)):
                    mut[rng.integers(0, len(mut))] ^= \
                        int(rng.integers(1, 256))
                for ok in run_one(bytes(mut), sh, pps):
                    n_ok += ok
                    n_err += not ok
    print(f"entropy: {n_ok} clean parses, {n_err} clean errors")


def exercise_demux(rounds):
    import tempfile
    from fixtures import containers as C
    from fixtures.h264enc2 import make_stream2
    from minivideo_tpu.containers.native import (native_demux,
                                                 native_demux_available)
    from minivideo_tpu.media import open_media

    rng = np.random.default_rng(1)
    es = make_stream2(width_mbs=4, height_mbs=3, n_pictures=2, seed=9,
                      mb_kinds=("i16",), density=0.3, entropy="cavlc",
                      allow_pcm=False)
    builders = {
        "mp4": lambda: C.write_mp4(es, 64, 48),
        "avi": lambda: C.write_avi(es, 64, 48),
        "wav": lambda: C.write_wav(
            rng.integers(-3000, 3000, 4000).astype(np.int16)),
        "mkv": lambda: C.write_mkv(es, 64, 48),
        "ts": lambda: C.write_ts(es),
        "ps": lambda: C.write_ps(es),
    }
    tmpd = tempfile.mkdtemp(prefix="asan_demux_")
    n = 0
    for ext, build in builders.items():
        try:
            blob = build()
        except AttributeError:          # fixture writer not present
            continue
        variants = [blob]
        for cut in (4, 16, len(blob) // 2, max(8, len(blob) - 3)):
            variants.append(blob[:cut])
        for _ in range(6):
            mut = bytearray(blob)
            for _ in range(rng.integers(1, 6)):
                mut[rng.integers(0, len(mut))] ^= int(rng.integers(1, 256))
            variants.append(bytes(mut))
        for i, v in enumerate(variants):
            p = os.path.join(tmpd, f"f{i}.{ext}")
            with open(p, "wb") as f:
                f.write(v)
            try:
                media = open_media(p)
            except Exception:           # noqa: BLE001 — probe may reject
                continue
            try:
                if native_demux_available(media.container):
                    native_demux(media)
                    n += 1
            except Exception:           # noqa: BLE001 — clean errors OK
                pass
            finally:
                media.close()
    print(f"demux: {n} native parses over valid+mutated containers")


def exercise_export():
    from minivideo_tpu import native
    rng = np.random.default_rng(2)
    dims = [(1, 1), (1, 9), (7, 1), (8, 8), (15, 17), (33, 31),
            (64, 128), (255, 257)]
    n = 0
    for h, w in dims:
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        cb = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2)
                          ).astype(np.uint8)
        cr = rng.integers(0, 256, cb.shape).astype(np.uint8)
        rgb = native.yuv420_to_rgb_native(y, cb, cr)
        for q in (1, 50, 100):
            native.encode_jpeg_native(y, cb, cr, q)
        for lvl in (0, 1, 6, 9):
            for th in (1, 3):
                native.encode_png_native(rgb, lvl, th)
        native.encode_bmp_native(rgb)
        native.encode_tga_native(rgb)
        n += 1
    print(f"export: {n} dim configs through all encoders")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    exercise_entropy(rounds)
    exercise_demux(rounds)
    exercise_export()
    print("asan exercise: done")


if __name__ == "__main__":
    main()
