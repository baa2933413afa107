"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
are exercised without TPU hardware (SURVEY.md §4).  Set
MINIVIDEO_TPU_TEST_TPU=1 to run on real devices instead.
"""

import os
import sys

if os.environ.get("MINIVIDEO_TPU_TEST_TPU") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
