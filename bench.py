#!/usr/bin/env python
"""Benchmark: 1080p H.264 I-frame decode throughput, end-to-end.

Prints ONE JSON line:
  {"metric": "1080p_iframes_per_s", "value": N, "unit": "frames/s",
   "vs_baseline": N / 1000, ...}
vs_baseline is against BASELINE.json's north-star target of 1000 1080p
I-frames/s/chip (the reference publishes no numbers of its own).

Streams: REAL x264-encoded 1920x1088 all-intra content (8 distinct
frames, QP 26, libx264 via tools/x264_fixture.c — the same independent
provenance as the golden tests), one CAVLC and one CABAC stream, plus a
4-slice CABAC variant for the slice-parallel host mode.  Falls back to
the round-3 synthetic fixtures if libx264 tooling is unavailable.
Measured bins/frame (CABAC) and bits/frame are reported next to fps.

`value` is the END-OF-PIPE throughput of the overlapped pipeline:

  host stage   — slice entropy decode (native C++ parser, thread pool,
                 GIL released; slices of multi-slice pictures fan out
                 individually) into slab staging (adaptive layout:
                 settings.staging_mode), software-pipelined so staging
                 allocation and batch packing overlap the pool's parse
                 of the next batch;
  device stage — single-kernel Pallas wavefront reconstruction with
                 in-kernel residual construction (ops/recon_fused.py)
                 to raster YUV planes.  Kernel specialization
                 (has8x8/haspcm) is derived per pack, and one decoded
                 frame per staging layout is read back and asserted
                 bit-exact against the numpy oracle on every bench run
                 (guards against device-compiler miscompiles that the
                 CPU test suite cannot see).

The two stages run CONCURRENTLY on their real work and the wall clock
of the joint run gives the pipeline throughput, exactly as a co-located
host+chip deployment overlaps them.  Aggregation is reported in the
JSON ("runs", "aggregation", and a median alongside the best).
Host<->device transfer is excluded and reported separately: this box
reaches its single TPU chip through a relay tunnel measured at
~3 MB/s up / ~7 MB/s down, an environment artifact three orders of
magnitude below a v5e host's PCIe link; including it would benchmark
the tunnel, not the framework.
"""

import json
import os
import statistics
import subprocess
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np

WMB, HMB = 120, 68          # 1920x1088 coded size (1080p)
BATCH = 16
ITERS = 16                  # batches per measurement
QP = 26
N_FRAMES = 8                # distinct encoded pictures per stream
NOISE = 7                   # x264_fixture noise mask: ~1.8 Mbit/frame
#                             intra at QP 26, the natural-1080p band
#                             (mask 31 produced ~8 Mbit worst-case
#                             noise frames, 11.4 Mbins CABAC)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def _have_x264():
    if os.path.exists("/tmp/x264_fixture"):
        return True
    r = subprocess.run(
        ["bash", os.path.join(ROOT, "tools", "build_x264_fixture.sh")],
        capture_output=True, text=True)
    return r.returncode == 0


def get_stream(entropy: str, slices: int = 1, dct8: bool = False) -> bytes:
    tag = (f"{entropy}_x264" + (f"_s{slices}" if slices > 1 else "")
           + ("_8x8" if dct8 else ""))
    path = os.path.join(ROOT, ".bench_cache", f"stream_1080p_{tag}.264")
    if os.path.exists(path):
        return open(path, "rb").read()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if _have_x264():
        log(f"bench: encoding 1080p {tag} with libx264 (one-time)...")
        r = subprocess.run(
            ["/tmp/x264_fixture", path, "1920", "1088", str(N_FRAMES),
             str(QP), "1" if entropy == "cabac" else "0",
             "1" if dct8 else "0", "42", str(slices), str(NOISE)],
            capture_output=True, text=True, timeout=600)
        if r.returncode == 0:
            return open(path, "rb").read()
        log("bench: x264 encode failed, falling back to synthetic:",
            r.stderr[-200:])
    from fixtures.h264enc2 import make_stream2
    log(f"bench: generating synthetic 1080p {entropy} fixture...")
    data = make_stream2(width_mbs=WMB, height_mbs=HMB, n_pictures=2,
                        seed=42, mb_kinds=("i16", "i4"), density=0.25,
                        entropy=entropy, allow_pcm=False)
    with open(path, "wb") as f:
        f.write(data)
    return data


def prep_pictures(data):
    """Parameter sets + per-picture slice lists [(nalu, sh), ...]."""
    from minivideo_tpu.models.h264.decoder import (H264Decoder,
                                                   group_idr_access_units)
    from minivideo_tpu.models.h264.nalu import parse_nalu, split_annexb
    from minivideo_tpu.models.h264.slicehdr import parse_slice_header
    dec = H264Decoder()
    nalus = [parse_nalu(raw, off) for off, raw in split_annexb(data)]
    for n in nalus:
        if n.nal_unit_type in (7, 8):
            dec.feed_nalu(n)
    pictures = []
    sps = pps = None
    for group in group_idr_access_units(nalus):
        pic = []
        for n in group:
            sh, sps, pps = parse_slice_header(
                n.rbsp, n.nal_unit_type, n.nal_ref_idc, dec.sps_map,
                dec.pps_map)
            pic.append((n, sh))
        pictures.append(pic)
    return pictures, sps, pps


def parse_slice_task(arg):
    """One SLICE's entropy decode into its picture's staging row (host;
    no coefficient copies).  Slices of a picture are entropy-independent
    (h264_slice.c:1013-1139), so they fan out across the pool
    individually — per-frame host latency scales with slice count."""
    staging, row, fs, nalu, sh, pps, mode = arg
    if mode == "device":
        from minivideo_tpu.native import parse_slice_native_slab2
        parse_slice_native_slab2(
            fs, staging, row, nalu.rbsp, sh.data_bit_offset,
            sh.first_mb_in_slice, sh.qp,
            bool(pps.entropy_coding_mode_flag),
            bool(pps.transform_8x8_mode_flag),
            cb_qp_off=pps.chroma_qp_index_offset,
            cr_qp_off=pps.second_chroma_qp_index_offset)
    else:
        from minivideo_tpu.native import parse_slice_native_slab
        parse_slice_native_slab(
            fs, staging, row, nalu.rbsp, sh.data_bit_offset,
            sh.first_mb_in_slice, sh.qp,
            bool(pps.entropy_coding_mode_flag),
            bool(pps.transform_8x8_mode_flag))


def make_batch(pictures, sps, pps, mode):
    """Allocate staging + FrameSyntax rows and build the slice task
    list for one batch (cycling the distinct pictures)."""
    from minivideo_tpu.models.h264.syntax import FrameSyntax
    from minivideo_tpu.ops.recon import make_slab_staging, make_slab_staging2
    mk = make_slab_staging2 if mode == "device" else make_slab_staging
    staging = mk(WMB, HMB, BATCH)
    fss = [FrameSyntax(sps.pic_width_in_mbs, sps.pic_height_in_map_units,
                       lite=True) for _ in range(BATCH)]
    tasks = []
    for row in range(BATCH):
        for nalu, sh in pictures[row % len(pictures)]:
            tasks.append((staging, row, fss[row], nalu, sh, pps, mode))
    return staging, fss, tasks


def pack_batch(staging, fss, sps, pps, mode):
    from minivideo_tpu.ops.recon import (pack_frames_slots,
                                         pack_frames_slots2)
    if mode == "device":
        return pack_frames_slots2(staging, sps, pps)
    return pack_frames_slots(staging, [(fs, None) for fs in fss],
                             sps, pps)


def host_batch(pictures, sps, pps, pool, mode):
    staging, fss, tasks = make_batch(pictures, sps, pps, mode)
    list(pool.map(parse_slice_task, tasks))
    return pack_batch(staging, fss, sps, pps, mode)


def host_stream(pictures, sps, pps, pool, mode, iters, consume=None):
    """Software-pipelined host stage: staging allocation for batch N+1
    and packing of batch N overlap the pool's parse of the next batch
    (the alloc+pack serial gap was the measured ~13% overlap loss of
    the round-3 host worker)."""
    staging, fss, tasks = make_batch(pictures, sps, pps, mode)
    futs = [pool.submit(parse_slice_task, t) for t in tasks]
    for i in range(iters):
        if i + 1 < iters:
            staging2, fss2, tasks2 = make_batch(pictures, sps, pps, mode)
        for f in futs:
            f.result()
        if i + 1 < iters:
            futs = [pool.submit(parse_slice_task, t) for t in tasks2]
        pk = pack_batch(staging, fss, sps, pps, mode)
        if consume is not None:
            consume(pk)
        if i + 1 < iters:
            staging, fss = staging2, fss2


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from minivideo_tpu.native import cabac_bins_total
    from minivideo_tpu.ops.recon_fused import (
        make_reconstruct_fused_slots, make_reconstruct_fused_slots2)
    from minivideo_tpu.settings import staging_mode

    dev = jax.devices()[0]
    ncpu = os.cpu_count() or 2
    mode = staging_mode()
    log("bench: device:", dev, f"| host cores: {ncpu} "
        f"| staging: {mode} (auto; see settings.staging_mode)")

    # ---- streams + host stage (auto staging mode) --------------------------
    pool = ThreadPoolExecutor(max_workers=ncpu)
    entropy_fps = {}
    packs = {}
    packs_dev = {}
    packs_rec = {}
    preps = {}
    stream_bits = {}
    bins_per_frame = 0
    for entropy in ("cavlc", "cabac"):
        data = get_stream(entropy)
        pictures, sps, pps = prep_pictures(data)
        preps[entropy] = (pictures, sps, pps)
        stream_bits[entropy] = len(data) * 8 // max(len(pictures), 1)
        b0 = cabac_bins_total()
        t0 = time.time()
        pk = host_batch(pictures, sps, pps, pool, mode)
        dt_first = time.time() - t0
        if entropy == "cabac":
            bins_per_frame = (cabac_bins_total() - b0) // BATCH
        dt = min(_timed(lambda: host_batch(pictures, sps, pps, pool, mode))
                 for _ in range(2))
        entropy_fps[entropy] = BATCH / dt
        log(f"bench: host stage [{entropy}]: {dt*1000:.0f} ms/batch "
            f"({entropy_fps[entropy]:.1f} fps entropy+pack, {ncpu} threads;"
            f" first {dt_first*1000:.0f} ms; {len(pictures)} distinct"
            f" pictures, {stream_bits[entropy]//1000} kbit/frame"
            + (f", {bins_per_frame/1e6:.2f} Mbins/frame"
               if entropy == "cabac" else "") + ")")
        packs[entropy] = pk
        packs_dev[entropy] = (pk if mode == "device"
                              else host_batch(pictures, sps, pps, pool,
                                              "device"))
        packs_rec[entropy] = (pk if mode == "records"
                              else host_batch(pictures, sps, pps, pool,
                                              "records"))

    # ---- slice-parallel host mode (4-slice stream) -------------------------
    # single-PICTURE host latency: slices fan across the pool, so the
    # per-frame wall time drops ~min(slices, cores)x vs sequential
    slice_stats = None
    try:
        data4 = get_stream("cabac", slices=4)
        pic4, sps4, pps4 = prep_pictures(data4)
        from minivideo_tpu.models.h264.syntax import FrameSyntax
        from minivideo_tpu.ops.recon import make_slab_staging

        def one_pic(par):
            staging = make_slab_staging(WMB, HMB, 1)
            fs = FrameSyntax(sps4.pic_width_in_mbs,
                             sps4.pic_height_in_map_units, lite=True)
            tasks = [(staging, 0, fs, nalu, sh, pps4, "records")
                     for nalu, sh in pic4[0]]
            if par:
                list(pool.map(parse_slice_task, tasks))
            else:
                for t in tasks:
                    parse_slice_task(t)

        one_pic(False)                      # warm pages
        t_seq = min(_timed(lambda: one_pic(False)) for _ in range(3))
        t_par = min(_timed(lambda: one_pic(True)) for _ in range(3))
        slice_stats = {
            "slices": len(pic4[0]),
            "seq_ms": round(t_seq * 1000, 1),
            "par_ms": round(t_par * 1000, 1),
            "speedup": round(t_seq / t_par, 2),
        }
        log(f"bench: slice-parallel host [cabac, {len(pic4[0])} slices]: "
            f"{t_seq*1000:.1f} ms/frame sequential -> {t_par*1000:.1f} ms "
            f"fanned ({slice_stats['speedup']}x on {ncpu} cores)")
    except Exception as e:                  # noqa: BLE001
        log("bench: slice-parallel section skipped:", e)

    # ---- device stage ------------------------------------------------------
    # Both staging feeds are measured: "device" staging is the
    # production device stage on a non-starved host, "records" staging
    # is what the overlapped run below uses when the host is the
    # bottleneck (auto mode).  Kernel variants are built PER PACK from
    # that pack's own has8x8/haspcm (the specialization the production
    # dispatcher applies).
    fn_cache = {}

    def get_fns(pk):
        key = (pk.has8x8, pk.haspcm)
        if key not in fn_cache:
            fn_cache[key] = (
                make_reconstruct_fused_slots2(WMB, HMB, BATCH,
                                              has8x8=pk.has8x8,
                                              haspcm=pk.haspcm),
                make_reconstruct_fused_slots(WMB, HMB, BATCH,
                                             has8x8=pk.has8x8,
                                             haspcm=pk.haspcm))
        return fn_cache[key]

    def bind(pk):
        fn_dev, fn_rec = get_fns(pk)
        ls4 = jnp.asarray(pk.ls4)
        ls8 = jnp.asarray(pk.ls8)
        if pk.slots == 2:
            args = tuple(jnp.asarray(pk.arrays[k]) for k in
                         ("meta_slab", "luma_slab", "chroma_slab",
                          "dc_slab"))
            return lambda: fn_dev(*args, ls4, ls8)
        small = {k: jnp.asarray(v) for k, v in pk.arrays.items()
                 if not k.endswith("_slab")}
        slabs = tuple(jnp.asarray(pk.arrays[k]) for k in
                      ("luma_slab", "chroma_slab", "dc_slab"))
        cb_off, cr_off = pk.chroma_qp_off
        return lambda: fn_rec(small, *slabs, ls4, ls8, cb_off, cr_off)

    pk0 = packs["cavlc"]
    log(f"bench: kernel variant [cavlc pack]: has8x8={pk0.has8x8} "
        f"haspcm={pk0.haspcm}")
    dev_fns_rec = {e: bind(pk) for e, pk in packs_rec.items()}
    dev_fns_dev = {e: bind(pk) for e, pk in packs_dev.items()}
    # the overlapped e2e run consumes whatever layout `mode` selected
    dev_fns = dev_fns_dev if mode == "device" else dev_fns_rec

    def sync(y):
        # tiny dependent readback: the only reliable fence on this
        # backend; full-plane readback would measure the relay tunnel
        _ = np.asarray(y[0, 0, :2])

    def run_device(iters=1, entropy="cavlc", fns=None):
        # pipelined dispatch: enqueue all batches, fence once (the
        # device executes in order, so the last output fences all;
        # per-batch fencing would pay the ~26 ms tunnel round trip
        # each time)
        fn = (fns or dev_fns)[entropy]
        last = None
        for _ in range(iters):
            last, cb, cr = fn()
        sync(last)

    log("bench: compiling + warmup...")
    t0 = time.time()
    run_device(fns=dev_fns_dev)
    log(f"bench: first call (compile) {time.time()-t0:.1f}s")
    run_device(1, "cabac", fns=dev_fns_dev)
    t0 = time.time()
    run_device(fns=dev_fns_rec)
    log(f"bench: first call records-feed (compile) {time.time()-t0:.1f}s")
    run_device(1, "cabac", fns=dev_fns_rec)

    # ---- on-TPU output assertion (every bench run) -------------------------
    # one full frame per staging layout is read back over the tunnel and
    # asserted bit-exact vs the numpy oracle: the CPU test suite runs
    # the kernels in interpret mode, so ONLY this check would catch a
    # Mosaic miscompile shipping fast wrong pixels
    t0 = time.time()
    from minivideo_tpu.models.h264.decoder import decode_annexb
    oracle = decode_annexb(get_stream("cavlc"), max_pictures=1,
                           engine="np")[0]
    for name, fns in (("device", dev_fns_dev), ("records", dev_fns_rec)):
        y, cb, cr = fns["cavlc"]()
        np.testing.assert_array_equal(np.asarray(y[0]), oracle.y,
                                      err_msg=f"Y {name} staging")
        np.testing.assert_array_equal(np.asarray(cb[0]), oracle.cb,
                                      err_msg=f"Cb {name} staging")
        np.testing.assert_array_equal(np.asarray(cr[0]), oracle.cr,
                                      err_msg=f"Cr {name} staging")
    log(f"bench: on-TPU output check: both staging layouts bit-exact vs "
        f"numpy oracle ({time.time()-t0:.1f}s incl. oracle decode + "
        f"tunnel readback)")

    from minivideo_tpu.profiling import device_trace
    t0 = time.time()
    with device_trace():          # set MINIVIDEO_TPU_PROFILE=<dir> to trace
        run_device(ITERS, fns=dev_fns_dev)
    dt = time.time() - t0
    device_fps = BATCH * ITERS / dt
    log(f"bench: device stage [device staging]: {dt/ITERS*1000:.0f} "
        f"ms/batch ({device_fps:.1f} fps, pipelined dispatch)")
    t0 = time.time()
    run_device(ITERS, fns=dev_fns_rec)
    dt = time.time() - t0
    device_fps_records = BATCH * ITERS / dt
    log(f"bench: device stage [records staging]: {dt/ITERS*1000:.0f} "
        f"ms/batch ({device_fps_records:.1f} fps)")

    # ---- overlapped pipeline, BOTH entropy coders --------------------------
    # host and device stages run concurrently on their real work; wall
    # clock over ITERS batches = end-of-pipe throughput of a co-located
    # deployment (transfer excluded; see module docstring)
    RUNS = 3                     # ≥3 runs, median-first (VERDICT r4 #5)

    def overlapped(pictures, sps, pps, entropy, fns=None, runs=RUNS,
                   consume=None, drain=None):
        """runs x (host entropy thread || device dispatch); returns the
        per-run end-of-pipe fps list.  `consume(pack)` runs in the host
        thread per batch; `drain()` is awaited inside the wall clock
        (export futures)."""
        res = []
        for _ in range(runs):
            err = []

            def host_worker():
                try:
                    host_stream(pictures, sps, pps, pool, mode, ITERS,
                                consume=consume)
                except Exception as e:                # noqa: BLE001
                    err.append(e)

            t0 = time.time()
            th = threading.Thread(target=host_worker)
            th.start()
            run_device(ITERS, entropy, fns=fns)
            th.join()
            if drain is not None:
                drain()
            dt = time.time() - t0
            if err:
                raise err[0]
            res.append(BATCH * ITERS / dt)
        return res

    e2e_best = {}
    e2e_median = {}
    for entropy in ("cavlc", "cabac"):
        pictures, sps, pps = preps[entropy]
        runs = overlapped(pictures, sps, pps, entropy)
        e2e_best[entropy] = max(runs)
        e2e_median[entropy] = statistics.median(runs)
        log(f"bench: overlapped [{entropy}]: {BATCH*ITERS} frames/run, "
            f"runs={RUNS} median={e2e_median[entropy]:.1f} "
            f"best={e2e_best[entropy]:.1f} fps end-of-pipe "
            f"(all: {', '.join(f'{r:.1f}' for r in runs)})")

    # ---- 8x8 transform (High-profile) variant ------------------------------
    # x264 High profile uses dct8 on most MBs at these QPs; this section
    # publishes the has8x8=True kernel + host entropy numbers real
    # content exercises (VERDICT r4 #3).  Guarded: any failure reports
    # null rather than killing the headline bench.
    x8 = {"entropy_fps": {}, "device_fps": None, "e2e_median": {},
          "e2e_best": {}, "bins_per_frame_cabac": 0}
    try:
        preps8 = {}
        for entropy in ("cavlc", "cabac"):
            data = get_stream(entropy, dct8=True)
            pictures, sps, pps = prep_pictures(data)
            preps8[entropy] = (pictures, sps, pps)
            host_batch(pictures, sps, pps, pool, mode)    # warm pages
            b0 = cabac_bins_total()
            dt = min(_timed(lambda: host_batch(pictures, sps, pps, pool,
                                               mode))
                     for _ in range(2))
            if entropy == "cabac":
                x8["bins_per_frame_cabac"] = \
                    (cabac_bins_total() - b0) // BATCH // 2
            x8["entropy_fps"][entropy] = round(BATCH / dt, 1)
            log(f"bench: host stage [8x8 {entropy}]: {dt*1000:.0f} "
                f"ms/batch ({BATCH/dt:.1f} fps entropy+pack)")
        pk8 = {e: host_batch(*preps8[e], pool, mode)
               for e in ("cavlc", "cabac")}
        log(f"bench: kernel variant [8x8 cavlc pack]: "
            f"has8x8={pk8['cavlc'].has8x8} haspcm={pk8['cavlc'].haspcm}")
        fns8 = {e: bind(pk) for e, pk in pk8.items()}
        # apples-to-apples with the headline device_fps: the 8x8 device
        # stage is ALSO measured on DEVICE staging (the probe in
        # tools/probe_8x8.py showed the 8x8 kernel itself costs ~10%,
        # not 2x — the rest of a records-staging number is the staging
        # layout, not the 8x8 paths)
        pk8_dev = (pk8["cavlc"] if mode == "device"
                   else host_batch(*preps8["cavlc"], pool, "device"))
        fns8_dev = {"cavlc": bind(pk8_dev)}
        t0 = time.time()
        run_device(1, "cavlc", fns=fns8)
        log(f"bench: first 8x8 call (compile) {time.time()-t0:.1f}s")
        run_device(1, "cabac", fns=fns8)
        run_device(1, "cavlc", fns=fns8_dev)
        # on-TPU output assertion for the 8x8 kernel variant (both
        # staging layouts)
        oracle8 = decode_annexb(get_stream("cavlc", dct8=True),
                                max_pictures=1, engine="np")[0]
        for fns_chk in (fns8, fns8_dev):
            y8, cb8, cr8 = fns_chk["cavlc"]()
            np.testing.assert_array_equal(np.asarray(y8[0]), oracle8.y,
                                          err_msg="Y 8x8 variant")
            np.testing.assert_array_equal(np.asarray(cb8[0]), oracle8.cb,
                                          err_msg="Cb 8x8 variant")
        log("bench: on-TPU output check [8x8]: bit-exact vs numpy "
            "oracle (both staging layouts)")
        t0 = time.time()
        run_device(ITERS, "cavlc", fns=fns8_dev)
        dt = time.time() - t0
        x8["device_fps"] = round(BATCH * ITERS / dt, 1)
        t0 = time.time()
        run_device(ITERS, "cavlc", fns=fns8)
        dt = time.time() - t0
        x8["device_fps_records_staging"] = round(BATCH * ITERS / dt, 1)
        log(f"bench: device stage [8x8]: {x8['device_fps']} fps device "
            f"staging / {x8['device_fps_records_staging']} fps records "
            f"staging")
        for entropy in ("cavlc", "cabac"):
            pictures, sps, pps = preps8[entropy]
            runs = overlapped(pictures, sps, pps, entropy, fns=fns8)
            x8["e2e_best"][entropy] = round(max(runs), 2)
            x8["e2e_median"][entropy] = round(statistics.median(runs), 2)
            log(f"bench: overlapped [8x8 {entropy}]: median="
                f"{x8['e2e_median'][entropy]} best="
                f"{x8['e2e_best'][entropy]} fps")
        del pk8, fns8, pk8_dev, fns8_dev
    except Exception as e:                          # noqa: BLE001
        log("bench: 8x8 section failed:", repr(e))
        x8["error"] = repr(e)

    # ---- export-inclusive thumbnails/s -------------------------------------
    # The flagship app writes pictures; this measures the FULL pipe on
    # this VM: entropy (pool) || device recon || JPEG encode+write of
    # every frame (native writers, GIL released, same pool).  Frame
    # content = the oracle-decoded first frame (bit-exact to the device
    # output per the check above); encoding from host-resident planes
    # keeps the relay tunnel out of the measurement like every other
    # stage boundary.
    import tempfile
    thumbs = {}
    export_ms = {}
    try:
        from minivideo_tpu import native as _native
        oy, ocb, ocr = oracle.y, oracle.cb, oracle.cr
        orgb = _native.yuv420_to_rgb_native(oy, ocb, ocr)
        tmpd = tempfile.mkdtemp(prefix="bench_thumbs_")

        def _w(path, data):
            with open(path, "wb") as f:
                f.write(data)

        for name, fn in (
                ("jpg", lambda p: _w(p, _native.encode_jpeg_native(
                    oy, ocb, ocr, 75))),
                ("png", lambda p: _w(p, _native.encode_png_native(
                    _native.yuv420_to_rgb_native(oy, ocb, ocr), 3))),
                ("bmp", lambda p: _w(p, _native.encode_bmp_native(orgb))),
                ("tga", lambda p: _w(p, _native.encode_tga_native(orgb)))):
            p = os.path.join(tmpd, f"f.{name}")
            dt = min(_timed(lambda: fn(p)) for _ in range(3))
            export_ms[name] = round(dt * 1000, 1)
            os.unlink(p)
        log(f"bench: export stage (1080p, native writers): "
            + ", ".join(f"{k} {v} ms" for k, v in export_ms.items()))

        # overlapped decode+export: export tasks share the entropy pool
        exp_futs = []
        counter = [0]

        def consume_export(pk):
            for _ in range(BATCH):
                i = counter[0] = counter[0] + 1
                p = os.path.join(tmpd, f"t{i % 64}.jpg")
                exp_futs.append(pool.submit(
                    lambda p=p: _w(p, _native.encode_jpeg_native(
                        oy, ocb, ocr, 75))))

        def drain():
            for f in exp_futs:
                f.result()
            exp_futs.clear()

        pictures, sps, pps = preps["cavlc"]
        runs = overlapped(pictures, sps, pps, "cavlc",
                          consume=consume_export, drain=drain)
        thumbs = {"jpg_median": round(statistics.median(runs), 2),
                  "jpg_best": round(max(runs), 2)}
        log(f"bench: thumbnails/s [cavlc->jpg, decode+encode+write]: "
            f"median={thumbs['jpg_median']} best={thumbs['jpg_best']} "
            f"(runs: {', '.join(f'{r:.1f}' for r in runs)})")
        import shutil
        shutil.rmtree(tmpd, ignore_errors=True)
    except Exception as e:                          # noqa: BLE001
        log("bench: thumbnail section failed:", repr(e))
        thumbs = {"error": repr(e)}

    print(json.dumps({
        "metric": "1080p_iframes_per_s",
        "value": round(e2e_median["cavlc"], 2),
        "unit": "frames/s",
        "vs_baseline": round(e2e_median["cavlc"] / 1000.0, 3),
        "value_cavlc": round(e2e_median["cavlc"], 2),
        "value_cabac": round(e2e_median["cabac"], 2),
        "value_cavlc_best": round(e2e_best["cavlc"], 2),
        "value_cabac_best": round(e2e_best["cabac"], 2),
        "runs": RUNS,
        "aggregation": "median",
        "stream": "x264" if _have_x264() else "synthetic",
        "distinct_frames": len(preps["cavlc"][0]),
        "qp": QP,
        "bits_per_frame_cavlc": stream_bits["cavlc"],
        "bits_per_frame_cabac": stream_bits["cabac"],
        "bins_per_frame_cabac": int(bins_per_frame),
        "device_fps": round(device_fps, 1),
        "device_fps_records_staging": round(device_fps_records, 1),
        "entropy_cavlc_fps": round(entropy_fps["cavlc"], 1),
        "entropy_cabac_fps": round(entropy_fps["cabac"], 1),
        "high_profile_8x8": x8,
        "thumbnails_per_s": thumbs,
        "export_ms_1080p": export_ms,
        "slice_parallel": slice_stats,
        "tpu_output_check": "bit-exact",
        "host_cores": ncpu,
        "staging": mode,
        "tunnel_transfer_excluded": True,
    }))


if __name__ == "__main__":
    main()
