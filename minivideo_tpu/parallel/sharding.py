"""Device-mesh construction and batch sharding for pod-scale decode.

The reference is a single-threaded C library (SURVEY.md §2.6: no DP/TP/PP
anywhere); the TPU-native scale-out model is:

  * data axis   — independent clips/files (embarrassingly parallel; the
    BASELINE "thumbnails/s scaling 1 chip -> N hosts" metric),
  * seq axis    — the GOP/time axis within one clip: IDR pictures are
    self-contained (the property idr_filtering relies on,
    reference filter.c:52), so frames of one clip shard cleanly.

Both axes address the same leading batch dimension of PackedFrames — a
frame is (clip, idr_index); flattening (data, seq) over it gives each chip
a contiguous run of frames.  Model tables (LevelScale matrices) are
replicated.  All collectives ride ICI via pjit-inserted ops; no manual
NCCL-style code (the reference has none to mirror anyway).
"""

from __future__ import annotations

import math

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, seq: int | None = None,
              devices=None) -> Mesh:
    """Build a ("data", "seq") mesh over the first n_devices devices.

    seq defaults to 2 when the device count is even (so single-clip jobs
    with several IDRs still use the whole mesh), else 1.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if seq is None:
        seq = 2 if n % 2 == 0 and n > 1 else 1
    if n % seq != 0:
        raise ValueError(f"seq={seq} does not divide device count {n}")
    arr = np.asarray(devices).reshape(n // seq, seq)
    return Mesh(arr, ("data", "seq"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-frame arrays: leading batch dim split over both
    mesh axes; everything else replicated within a shard."""
    return NamedSharding(mesh, P(("data", "seq")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arrays: dict, multiple: int):
    """Pad the leading batch dim of every array up to a multiple.

    Padding frames have parsed=0 everywhere, which the reconstruction
    engines treat as "emit zeros" — no wasted correctness risk, only
    bounded wasted compute (< one mesh-row of frames).

    Returns (padded_arrays, real_batch).
    """
    b = next(iter(arrays.values())).shape[0]
    target = int(math.ceil(b / multiple) * multiple)
    if target == b:
        return arrays, b
    out = {}
    for k, v in arrays.items():
        pad = np.zeros((target - b,) + v.shape[1:], dtype=v.dtype)
        out[k] = np.concatenate([np.asarray(v), pad], axis=0)
    return out, b


def shard_packed(mesh: Mesh, arrays: dict, ls4, ls8):
    """Place padded frame arrays + replicated tables onto the mesh."""
    import jax.numpy as jnp
    bs = batch_sharding(mesh)
    rp = replicated(mesh)
    arrays_s = {k: jax.device_put(jnp.asarray(v), bs)
                for k, v in arrays.items()}
    return arrays_s, (jax.device_put(jnp.asarray(ls4), rp),
                      jax.device_put(jnp.asarray(ls8), rp))
