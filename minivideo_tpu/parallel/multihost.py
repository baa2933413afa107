"""Real multi-PROCESS (multi-host) execution: jax.distributed workers.

The single-process dryrun (__graft_entry__.dryrun_multichip phases A/B)
proves the sharding math on one controller; this module proves the
MULTI-CONTROLLER path the same design runs at pod scale (SURVEY.md
§2.6: JAX collectives over ICI within a slice, DCN across slices —
multi-host work partitioned per process, results exchanged through XLA
collectives, not ad-hoc IPC):

  * N worker processes `jax.distributed.initialize` against a
    coordinator; on CPU the cross-process collectives ride gloo (the
    DCN stand-in), each process owning
    --xla_force_host_platform_device_count local devices.
  * phase A (DP over clips): each process entropy-decodes ITS OWN
    manifest-partitioned clip shard host-locally (per-host work queue,
    SURVEY §5), the shards form one global batch via
    multihost_utils.host_local_array_to_global_array, one sharded
    reconstruction runs SPMD across every device of every process, and
    each process asserts ITS addressable output shards bit-exact
    against the numpy oracle.
  * phase B (TP/halo across the process boundary): the fused wave-lane
    axis of make_reconstruct_halo spans ALL devices of BOTH processes,
    so the per-wave boundary-state lax.ppermute crosses processes —
    the DCN-analog of a frame spanning hosts.  Output asserted
    bit-exact in every process.
  * the per-host frame counts are reduced with a cross-process psum
    (the metrics-reduction collective).

Launch: run_multihost_dryrun() spawns the workers with a free-port
coordinator (used by __graft_entry__.dryrun_multichip phase C and
tests/test_multihost.py).  Worker entry: python -m
minivideo_tpu.parallel.multihost --pid I --procs N --coordinator H:P.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

import numpy as np

WMB, HMB = 6, 4                  # tiny geometry: oracle stays seconds


# ---------------------------------------------------------------------------
# clip set: deterministic, shared by every process (stand-in for a
# shared filesystem of clips); the manifest partition assigns ownership

def _clip_streams(n_clips: int):
    """n_clips tiny Annex-B streams (mixed CAVLC/CABAC), deterministic."""
    from fixtures.h264enc2 import make_stream2    # tests/ on sys.path
    clips = []
    for i in range(n_clips):
        clips.append(make_stream2(
            width_mbs=WMB, height_mbs=HMB, n_pictures=1, seed=100 + i,
            mb_kinds=("i16", "i4"), density=0.35,
            entropy="cabac" if i % 2 else "cavlc", allow_pcm=False))
    return clips


def _partition(n_clips: int, pid: int, nprocs: int):
    """Contiguous clip shard for process `pid` (each host owns its
    shard; manifest files are per-process, manifest.py)."""
    per = n_clips // nprocs
    return list(range(pid * per, (pid + 1) * per))


def _parse_clip_syntax(data: bytes):
    from ..models.h264.decoder import H264Decoder, group_idr_access_units
    from ..models.h264.nalu import parse_nalu, split_annexb
    dec = H264Decoder()
    nalus = [parse_nalu(raw, off) for off, raw in split_annexb(data)]
    for n in nalus:
        if n.nal_unit_type in (7, 8):
            dec.feed_nalu(n)
    group = group_idr_access_units(nalus)[0]
    return dec.parse_idr_syntax(group)


# ---------------------------------------------------------------------------
# worker

def worker(pid: int, nprocs: int, coordinator: str,
           devices_per_proc: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    import jax
    jax.config.update("jax_platforms", "cpu")   # never grab the TPU tunnel
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nprocs, process_id=pid)
    from jax.experimental import multihost_utils as mhu
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == nprocs
    devs = jax.devices()
    n_dev = len(devs)
    assert n_dev == nprocs * devices_per_proc
    mesh = Mesh(np.array(devs).reshape(nprocs, devices_per_proc),
                ("host", "chip"))
    print(f"mh[{pid}]: {nprocs} processes x {devices_per_proc} devices, "
          f"{n_dev} global", flush=True)

    from ..models.h264.recon_np import reconstruct_frame
    from ..ops.recon import pack_frames
    from ..ops.recon_lane import make_reconstruct_lane
    from .manifest import Manifest

    # ---- phase A: DP — each process parses ITS manifest shard ----------
    n_clips = n_dev                       # one frame per device globally
    clips = _clip_streams(n_clips)
    mine = _partition(n_clips, pid, nprocs)
    import tempfile
    mdir = os.environ.get("MV_MH_MANIFEST_DIR", tempfile.gettempdir())
    man = Manifest(os.path.join(mdir, f"mh_manifest.{pid}.jsonl"))
    parsed = []
    for ci in mine:
        fs, sps, pps, som = _parse_clip_syntax(clips[ci])
        parsed.append((fs, sps, pps, som))
        man.done(f"clip{ci}")
    man.close()
    packed = pack_frames([(fs, som) for fs, _, _, som in parsed],
                         parsed[0][1], parsed[0][2])
    sps, pps = parsed[0][1], parsed[0][2]

    batch_spec = P(("host", "chip"))
    garr = {k: mhu.host_local_array_to_global_array(np.asarray(v), mesh,
                                                    batch_spec)
            for k, v in packed.arrays.items()}
    ls4 = mhu.host_local_array_to_global_array(np.asarray(packed.ls4),
                                               mesh, P())
    ls8 = mhu.host_local_array_to_global_array(np.asarray(packed.ls8),
                                               mesh, P())
    fn = make_reconstruct_lane(WMB, HMB)
    with mesh:
        y, cb, cr = fn(garr, ls4, ls8, *packed.chroma_qp_off)
        y.block_until_ready()
    assert len(y.sharding.device_set) == n_dev, y.sharding
    # each process checks ITS OWN addressable shards against the oracle
    ly = mhu.global_array_to_host_local_array(y, mesh, batch_spec)
    lcb = mhu.global_array_to_host_local_array(cb, mesh, batch_spec)
    lcr = mhu.global_array_to_host_local_array(cr, mesh, batch_spec)
    for j, ci in enumerate(mine):
        fs, _, _, som = parsed[j]
        ry, rcb, rcr = reconstruct_frame(fs, sps, pps, som)
        np.testing.assert_array_equal(np.asarray(ly)[j], ry,
                                      err_msg=f"A clip{ci} Y")
        np.testing.assert_array_equal(np.asarray(lcb)[j], rcb,
                                      err_msg=f"A clip{ci} Cb")
        np.testing.assert_array_equal(np.asarray(lcr)[j], rcr,
                                      err_msg=f"A clip{ci} Cr")
    print(f"mh[{pid}]: phase A OK — {len(mine)} clips parsed by this "
          f"process, global batch {n_clips} SPMD over {n_dev} devices, "
          f"local shards bit-exact", flush=True)

    # ---- metrics reduce: cross-process psum ----------------------------
    from jax import shard_map
    cnt = mhu.host_local_array_to_global_array(
        np.full((devices_per_proc, 1), float(len(mine)) / devices_per_proc),
        mesh, batch_spec)
    total = jax.jit(shard_map(
        lambda t: jax.lax.psum(t, ("host", "chip")),
        mesh=mesh, in_specs=batch_spec, out_specs=P()))(cnt)
    total_local = np.asarray(
        mhu.global_array_to_host_local_array(total, mesh, P()))
    assert abs(float(total_local[0, 0]) - n_clips) < 1e-6, total_local
    print(f"mh[{pid}]: psum frame-count reduce across processes = "
          f"{float(total_local[0, 0]):.0f}", flush=True)

    # ---- phase B: halo — one frame's lane axis spans BOTH processes ----
    from ..ops.recon_wave import skew_tables
    from .halo import make_reconstruct_halo
    maxw = skew_tables(WMB, HMB)["maxw"]
    batch_b = 2
    while (batch_b * maxw) % n_dev:
        batch_b += 1
    # every process deterministically parses the SAME frames (replicated
    # input; the lane sharding happens inside shard_map)
    parsed_b = [_parse_clip_syntax(clips[i % n_clips])
                for i in range(batch_b)]
    packed_b = pack_frames([(fs, som) for fs, _, _, som in parsed_b],
                           parsed_b[0][1], parsed_b[0][2])
    mesh_b = Mesh(np.array(devs), ("lanes",))
    fn_b, _ = make_reconstruct_halo(WMB, HMB, batch_b, mesh_b,
                                    axis="lanes")
    def repl(a):
        return mhu.host_local_array_to_global_array(np.asarray(a),
                                                    mesh_b, P())
    arrays_b = {k: repl(v) for k, v in packed_b.arrays.items()}
    yb, cbb, crb = fn_b(arrays_b, repl(packed_b.ls4), repl(packed_b.ls8),
                        *packed_b.chroma_qp_off)
    yb.block_until_ready()
    # outputs replicate for the host-side check
    rep = jax.jit(lambda t: t,
                  out_shardings=NamedSharding(mesh_b, P()))
    yb, cbb, crb = rep(yb), rep(cbb), rep(crb)
    for i in range(batch_b):
        fs, sps_b, pps_b, som = parsed_b[i]
        ry, rcb, rcr = reconstruct_frame(fs, sps_b, pps_b, som)
        np.testing.assert_array_equal(np.asarray(yb)[i], ry,
                                      err_msg=f"B pic {i} Y")
        np.testing.assert_array_equal(np.asarray(cbb)[i], rcb,
                                      err_msg=f"B pic {i} Cb")
        np.testing.assert_array_equal(np.asarray(crb)[i], rcr,
                                      err_msg=f"B pic {i} Cr")
    print(f"mh[{pid}]: phase B OK — halo lane axis "
          f"(L={batch_b * maxw}) spans {nprocs} processes, per-wave "
          f"ppermute crossed the process boundary, bit-exact x{batch_b}",
          flush=True)
    print(f"mh[{pid}]: MULTIHOST OK", flush=True)


# ---------------------------------------------------------------------------
# launcher

def run_multihost_dryrun(nprocs: int = 2, devices_per_proc: int = 4,
                         timeout: int = 600) -> str:
    """Spawn nprocs jax.distributed workers; returns combined output.
    Raises on any worker failure or missing OK marker."""
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    coordinator = f"localhost:{port}"
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [root, os.path.join(root, "tests"),
         env.get("PYTHONPATH", "")]).rstrip(os.pathsep)
    # the workers own their device layout; the parent's settings (e.g.
    # the driver's xla_force_host_platform_device_count) must not leak
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-m", "minivideo_tpu.parallel.multihost",
         "--pid", str(i), "--procs", str(nprocs),
         "--devices", str(devices_per_proc),
         "--coordinator", coordinator],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(nprocs)]
    outs = []
    try:
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
            if p.returncode != 0 or "MULTIHOST OK" not in out:
                raise RuntimeError(
                    f"multihost worker {i} failed (rc={p.returncode}):\n"
                    + out[-3000:])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return "\n".join(outs)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--procs", type=int, required=True)
    ap.add_argument("--devices", type=int, default=4)
    ap.add_argument("--coordinator", required=True)
    a = ap.parse_args(argv)
    worker(a.pid, a.procs, a.coordinator, a.devices)
    return 0


if __name__ == "__main__":
    sys.exit(main())
