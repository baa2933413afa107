#!/usr/bin/env python
"""Benchmark the native C++ entropy parser (mv_parse_slice) at 1080p.

Reports fps single-threaded and with a thread pool (the ctypes call
releases the GIL, so threads scale across host cores).  CPU-only: safe
to run alongside a TPU job.

Usage: python tools/probe_entropy.py [cavlc|cabac|both] [ITERS]
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np

WMB, HMB = 120, 68


def get_stream(entropy: str) -> bytes:
    path = os.path.join(ROOT, ".bench_cache", f"stream_1080p_{entropy}.264")
    if os.path.exists(path):
        return open(path, "rb").read()
    from fixtures.h264enc2 import make_stream2
    print(f"generating 1080p {entropy} fixture (one-time)...", flush=True)
    t0 = time.time()
    data = make_stream2(width_mbs=WMB, height_mbs=HMB, n_pictures=2,
                        seed=42, mb_kinds=("i16", "i4"), density=0.25,
                        entropy=entropy, allow_pcm=False)
    print(f"  encoded {len(data)} bytes in {time.time()-t0:.1f}s",
          flush=True)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return data


def bench_entropy(entropy: str, iters: int):
    from minivideo_tpu.models.h264.decoder import H264Decoder
    from minivideo_tpu.models.h264.nalu import parse_nalu, split_annexb
    from minivideo_tpu.models.h264.slicehdr import parse_slice_header
    from minivideo_tpu.models.h264.syntax import FrameSyntax
    from minivideo_tpu.native import available, parse_slice_native

    assert available(), "native library unavailable"
    data = get_stream(entropy)
    dec = H264Decoder()
    nalus = [parse_nalu(raw, off) for off, raw in split_annexb(data)]
    for n in nalus:
        if n.nal_unit_type in (7, 8):
            dec.feed_nalu(n)
    idrs = [n for n in nalus if n.nal_unit_type == 5]

    headers = []
    for nalu in idrs:
        sh, sps, pps = parse_slice_header(
            nalu.rbsp, nalu.nal_unit_type, nalu.nal_ref_idc,
            dec.sps_map, dec.pps_map)
        headers.append((nalu, sh, sps, pps))

    def parse_one(item):
        nalu, sh, sps, pps = item
        fs = FrameSyntax(sps.pic_width_in_mbs, sps.pic_height_in_map_units)
        n = parse_slice_native(
            fs, nalu.rbsp, sh.data_bit_offset, sh.first_mb_in_slice,
            sh.qp, bool(pps.entropy_coding_mode_flag),
            bool(pps.transform_8x8_mode_flag))
        return n

    work = headers * iters

    # single-threaded
    t0 = time.time()
    for item in work:
        parse_one(item)
    dt = time.time() - t0
    fps1 = len(work) / dt
    print(f"{entropy}: native 1T: {len(work)} frames in {dt:.2f}s "
          f"-> {fps1:.1f} fps ({dt/len(work)*1000:.1f} ms/frame)",
          flush=True)

    # thread pool (GIL-release scaling)
    ncpu = os.cpu_count() or 2
    with ThreadPoolExecutor(max_workers=ncpu) as pool:
        t0 = time.time()
        list(pool.map(parse_one, work))
        dt = time.time() - t0
    fpsN = len(work) / dt
    print(f"{entropy}: native {ncpu}T: {len(work)} frames in {dt:.2f}s "
          f"-> {fpsN:.1f} fps (scaling x{fpsN/fps1:.2f})", flush=True)
    return fps1, fpsN


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    for entropy in (("cavlc", "cabac") if which == "both" else (which,)):
        bench_entropy(entropy, iters)


if __name__ == "__main__":
    main()
