"""Pod-scale parallel decode: mesh sharding, batch pipeline, manifests.

The reference has no parallel or distributed layer at all (SURVEY.md
§2.6); this package is the TPU-native scale-out design: clips shard over
the "data" mesh axis, a clip's IDR pictures over "seq", hosts own
disjoint clip shards, and progress is checkpointed per clip.
"""

from .manifest import Manifest
from .sharding import (batch_sharding, make_mesh, pad_to_multiple,
                       replicated, shard_packed)
from .batch import BatchResult, batch_thumbnail

__all__ = [
    "Manifest", "make_mesh", "batch_sharding", "replicated",
    "pad_to_multiple", "shard_packed", "batch_thumbnail", "BatchResult",
]
