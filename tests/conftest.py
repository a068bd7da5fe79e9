"""Session-scoped Ray fixture: init ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    from pds_hw2_mpi_connected_components_ray.context import configure_ray_data

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # two virtual "nodes" so placement tests can pin shard actors to
        # disjoint resource pools on this single-box sandbox
        # (tests/test_placement.py)
        resources={"vnode0": 8, "vnode1": 8},
    )
    configure_ray_data(quiet=True)
    yield
    ray.shutdown()
