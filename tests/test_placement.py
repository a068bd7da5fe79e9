"""Multi-node placement evidence (VERDICT r3 item 3).

The reference's whole point is cluster execution (one rank per node,
/root/reference/run_slurm.sh:32); this sandbox has one box, so we
evidence the placement plumbing two ways:

1. SIMULATED two-node cluster: conftest registers custom resources
   vnode0/vnode1; we pin half the shard pool to each and assert
   (a) the constraints were honored (actor-reported assigned
   resources) and (b) the CC labels are bit-identical to the
   unconstrained pool -- the reference's cross-configuration
   consistency check (/root/reference/src/benchmark.c:275-284).
2. SPREAD placement group: spawn the pool with placement="spread",
   assert the PG exists with one bundle per shard, labels unchanged,
   and the PG is released on shutdown (a leaked PG reserves CPUs).
"""

from __future__ import annotations

import numpy as np
import ray

from fixtures.synth_pages import ALL_GRAPHS
from pds_hw2_mpi_connected_components_ray.pipelines.cc import PinnedCCSolver
from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges
from pds_hw2_mpi_connected_components_ray.state.shards import (
    release_pool_placement,
    spawn_shard_pool,
)
from tests.oracles import cc_union_find


def _labels(res) -> np.ndarray:
    df = res.labels.to_pandas().sort_values("vertex").reset_index(drop=True)
    return df["vertex"].to_numpy(), df["label"].to_numpy()


def _solve_with_pool(edges, actors):
    solver = PinnedCCSolver(edges=edges, actors=actors)
    try:
        return solver.solve()
    finally:
        solver.shutdown()


def _graph_edges():
    g = ALL_GRAPHS["g_ring_of_cliques"]()
    return g, canonical_edges(from_numpy_edges(g.edges, num_blocks=4))


def test_vnode_pinned_pool_matches_unconstrained():
    g, edges = _graph_edges()
    oracle = cc_union_find(g.n, g.edges)

    # simulated 2-node layout: shards 0,2 -> vnode0; shards 1,3 -> vnode1
    res_map = [{"vnode0": 1}, {"vnode1": 1}, {"vnode0": 1}, {"vnode1": 1}]
    acts = spawn_shard_pool(4, resources_per_shard=res_map)
    got = ray.get([a.assigned_resources.remote() for a in acts])
    for want, have in zip(res_map, got):
        key = next(iter(want))
        assert key in have, f"shard not scheduled with {key}: {have}"
    res_pinned = _solve_with_pool(edges, acts)

    acts_plain = spawn_shard_pool(4)
    res_plain = _solve_with_pool(edges, acts_plain)

    v1, l1 = _labels(res_pinned)
    v2, l2 = _labels(res_plain)
    assert np.array_equal(v1, v2) and np.array_equal(l1, l2)
    # and both match the oracle's component structure exactly
    present = np.unique(g.edges.reshape(-1))
    assert np.array_equal(l1, oracle[present])
    assert res_pinned.n_components == res_plain.n_components


def test_spread_placement_group_pool():
    g, edges = _graph_edges()
    acts = spawn_shard_pool(3, placement="spread")
    try:
        pg = getattr(acts[0], "_graft_pg", None)
        assert pg is not None
        from ray.util.placement_group import placement_group_table

        info = placement_group_table(pg)
        assert len(info["bundles"]) == 3
        assert info["strategy"] == "SPREAD"
        assert info["state"] in ("CREATED", "RESCHEDULING")

        res = _solve_with_pool(edges, acts)  # shutdown releases the PG
        present = np.unique(g.edges.reshape(-1))
        oracle = cc_union_find(g.n, g.edges)
        _v, lab = _labels(res)
        assert np.array_equal(lab, oracle[present])

        info = placement_group_table(pg)
        assert info["state"] == "REMOVED", "shutdown must release the PG"
    finally:
        release_pool_placement(acts)  # idempotent safety


def test_build_shard_pool_placement_kwargs_passthrough():
    from pds_hw2_mpi_connected_components_ray.state.shards import build_shard_pool

    g, edges = _graph_edges()
    acts = build_shard_pool(
        edges, 2, resources_per_shard=[{"vnode0": 1}, {"vnode1": 1}]
    )
    got = ray.get([a.assigned_resources.remote() for a in acts])
    assert "vnode0" in got[0] and "vnode1" in got[1]
    for a in acts:
        ray.kill(a)
