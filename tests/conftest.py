"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
are exercised without TPU hardware (SURVEY.md §4).  Set
MINIVIDEO_TPU_TEST_TPU=1 to run on real devices instead.

Note: this image's sitecustomize force-registers the `axon` TPU plugin and
sets jax_platforms="axon,cpu" in every interpreter, ignoring the
JAX_PLATFORMS env var — and two processes touching the single tunneled TPU
chip deadlock.  So we override via jax.config *after* import, which is
still before backend initialization.
"""

import os
import sys

if os.environ.get("MINIVIDEO_TPU_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
