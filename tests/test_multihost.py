"""Real multi-process execution (parallel/multihost.py): two
jax.distributed workers on CPU with gloo cross-process collectives.

This is the multi-HOST proof the single-process 8-device mesh tests
cannot give (SURVEY.md §2.6): work partitioned per process, one SPMD
computation over devices owned by different processes, and the halo
path's ppermute crossing the process boundary.  Workers assert
bit-exactness internally; the launcher asserts both report OK.
"""

from minivideo_tpu.parallel.multihost import run_multihost_dryrun


def test_two_process_dryrun():
    out = run_multihost_dryrun(nprocs=2, devices_per_proc=2,
                               timeout=600)
    assert out.count("MULTIHOST OK") == 2
    assert out.count("phase A OK") == 2
    assert out.count("phase B OK") == 2
    assert "psum frame-count reduce across processes = 4" in out


def test_partition_covers_clips():
    from minivideo_tpu.parallel.multihost import _partition
    got = sorted(_partition(8, 0, 2) + _partition(8, 1, 2))
    assert got == list(range(8))
