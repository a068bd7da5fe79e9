"""Memory-aware wave-gated shard loading.

A 126 GB box OOM-killed 32 concurrent CSC builds at 1.31 B edge rows
(20x bench scale); `_load_wave` bounds how many GraphShardActor.load
calls run at once to ~50% of MemAvailable so oversized graphs load
slower instead of killing the pool. Gating must be a pure scheduling
change: labels bit-identical to the ungated pool.
"""

from __future__ import annotations

import os

import numpy as np
import ray

from fixtures.synth_pages import ALL_GRAPHS
from pds_hw2_mpi_connected_components_ray.pipelines.cc import PinnedCCSolver
from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges
from pds_hw2_mpi_connected_components_ray.state.shards import (
    _load_wave,
    spawn_shard_pool,
)
from tests.oracles import cc_union_find


def test_load_wave_arithmetic(monkeypatch):
    from pds_hw2_mpi_connected_components_ray.state import shards

    # plenty of memory -> no gating
    monkeypatch.setattr(shards, "_available_bytes", lambda: 100 << 30)
    assert _load_wave(1_000_000, 32) == 32
    # unknown rows / single shard -> no gating
    assert _load_wave(None, 32) == 32
    assert _load_wave(10**12, 1) == 1
    # tight budget: 1 GiB available, 10M rows over 4 shards
    # per-shard peak = 2.5M * 72B = 180MB; wave = 512MB // 180MB = 2
    monkeypatch.setattr(shards, "_available_bytes", lambda: 1 << 30)
    assert _load_wave(10_000_000, 4) == 2
    # never below 1 even when one shard exceeds the budget
    assert _load_wave(10**12, 4) == 1
    # env override wins
    monkeypatch.setenv("GRAFT_LOAD_WAVE", "3")
    assert _load_wave(10**12, 8) == 3


def test_wave_gated_load_matches_ungated(monkeypatch):
    g = ALL_GRAPHS["g_ring_of_cliques"]()
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4)).materialize()
    oracle = cc_union_find(g.n, g.edges)

    def solve(wave_env: str | None):
        if wave_env is None:
            os.environ.pop("GRAFT_LOAD_WAVE", None)
        else:
            os.environ["GRAFT_LOAD_WAVE"] = wave_env
        try:
            solver = PinnedCCSolver(edges=edges, actors=spawn_shard_pool(4))
            try:
                res = solver.solve()
                df = (
                    res.labels.to_pandas()
                    .sort_values("vertex")
                    .reset_index(drop=True)
                )
                return df["vertex"].to_numpy(), df["label"].to_numpy()
            finally:
                solver.shutdown()
        finally:
            os.environ.pop("GRAFT_LOAD_WAVE", None)

    v_free, l_free = solve(None)
    v_gated, l_gated = solve("1")  # fully serialized waves
    np.testing.assert_array_equal(v_free, v_gated)
    np.testing.assert_array_equal(l_free, l_gated)
    np.testing.assert_array_equal(l_gated, oracle[v_gated])
