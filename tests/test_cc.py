"""Connected components: exact per-vertex label equality vs three
independent oracles, across all execution strategies and parallelism
levels (SURVEY.md section 5)."""

from __future__ import annotations

import numpy as np
import pytest

from fixtures.synth_pages import ALL_GRAPHS, g_dups_selfloops, g_two_cliques
from pds_hw2_mpi_connected_components_ray.pipelines.cc import (
    component_count,
    connected_components,
)
from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges
from tests.oracles import cc_bfs, cc_hashmin_seq, cc_union_find


def _labels_df(res):
    return (
        res.labels.to_pandas().sort_values("vertex").reset_index(drop=True)
    )


def _edge_vertices(edges: np.ndarray) -> np.ndarray:
    return np.unique(edges.reshape(-1))


@pytest.mark.parametrize("gname", ["g_two_cliques", "g_ring_of_cliques", "g_random_forest"])
@pytest.mark.parametrize(
    "strategy",
    [("hashmin", "local"), ("hashmin", "shuffle"), ("hashmin", "pinned"), ("unionfind", None)],
)
def test_cc_matches_oracles(gname, strategy):
    g = ALL_GRAPHS[gname]()
    oracle = cc_union_find(g.n, g.edges)
    assert np.array_equal(oracle, cc_bfs(g.n, g.edges))
    method, mode = strategy
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    kwargs = {"method": method}
    if mode:
        kwargs["mode"] = mode
    res = connected_components(edges, **kwargs)
    df = _labels_df(res)
    # engine only labels vertices that appear in edges
    present = _edge_vertices(g.edges)
    assert np.array_equal(df["vertex"].to_numpy(), present)
    assert np.array_equal(df["label"].to_numpy(), oracle[present])


def test_cc_path_graph_deep_convergence():
    g = ALL_GRAPHS["g_path"]()
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=8))
    res = connected_components(edges, method="hashmin", mode="local")
    df = _labels_df(res)
    assert (df["label"] == 0).all()
    assert res.n_components == 1
    # pointer jumping must beat the O(diameter) bound by a lot
    assert res.supersteps < 30


def test_cc_star_graph():
    g = ALL_GRAPHS["g_star"]()
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    res = connected_components(edges, method="hashmin", mode="local")
    assert res.n_components == 1
    assert (_labels_df(res)["label"] == 0).all()


def test_cc_seq_hashmin_oracle_agrees():
    g = g_two_cliques()
    assert np.array_equal(cc_hashmin_seq(g.n, g.edges), cc_union_find(g.n, g.edges))


def test_dups_selfloops_same_result_as_clean():
    gd = g_dups_selfloops()
    gc = g_two_cliques()
    ed = canonical_edges(from_numpy_edges(gd.edges, num_blocks=4))
    ec = canonical_edges(from_numpy_edges(gc.edges, num_blocks=4))
    rd_ = connected_components(ed, method="hashmin", mode="local")
    rc = connected_components(ec, method="hashmin", mode="local")
    dd, dc = _labels_df(rd_), _labels_df(rc)
    # dup/selfloop graph has 5 extra self-loop vertices (0..4 already in cliques)
    merged = dd.merge(dc, on="vertex", suffixes=("_d", "_c"))
    assert (merged["label_d"] == merged["label_c"]).all()
    assert rd_.n_components == rc.n_components


@pytest.mark.parametrize("nblocks", [1, 2, 8])
def test_cc_deterministic_across_parallelism(nblocks):
    g = ALL_GRAPHS["g_ring_of_cliques"]()
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=nblocks))
    res = connected_components(edges, method="hashmin", mode="local")
    df = _labels_df(res)
    oracle = cc_union_find(g.n, g.edges)
    present = _edge_vertices(g.edges)
    assert np.array_equal(df["label"].to_numpy(), oracle[present])


def test_component_count_matches():
    g = g_two_cliques()
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    res = connected_components(edges, method="hashmin", mode="local")
    # isolated vertices never appear in the edge table: 2 components
    assert res.n_components == 2
    assert component_count(res.labels) == 2


def test_bfs_hops_path_and_star():
    from fixtures.synth_pages import g_path, g_star
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import bfs_hops
    from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
    from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges

    g = g_path(200)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    out = bfs_hops(edges).to_pandas().sort_values("vertex").reset_index(drop=True)
    assert np.array_equal(out["hops"].to_numpy(), np.arange(200))  # hop i at vertex i

    s = g_star(100)
    edges = canonical_edges(from_numpy_edges(s.edges, num_blocks=4))
    out = bfs_hops(edges, source=5).to_pandas()
    d = dict(zip(out["vertex"], out["hops"]))
    assert d[5] == 0 and d[0] == 1
    assert all(d[v] == 2 for v in range(1, 101) if v != 5)


def test_bfs_hops_unreachable_excluded():
    from fixtures.synth_pages import g_two_cliques
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import bfs_hops
    from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
    from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges

    g = g_two_cliques(clique=5, isolated=10)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=2))
    out = bfs_hops(edges, source=0).to_pandas()
    assert set(out["vertex"]) == set(range(5))  # only the first clique
    assert (out.set_index("vertex")["hops"][1:] == 1).all()


def test_bfs_modes_agree_random_graph():
    """Pinned (decentralized (min,+1) shard relaxation) and broadcast
    BFS produce identical (vertex, hops) tables on a random graph with
    several components."""
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import bfs_hops
    from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
    from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges

    rng = np.random.RandomState(7)
    n = 3000
    src = rng.randint(0, n, size=9000)
    dst = (src + rng.randint(1, 40, size=9000)) % n
    edges = canonical_edges(
        from_numpy_edges(np.stack([src, dst], axis=1), num_blocks=6)
    ).materialize()
    for source in (0, 17):
        pin = (
            bfs_hops(edges, source=source, mode="pinned")
            .to_pandas()
            .sort_values("vertex")
            .reset_index(drop=True)
        )
        bro = (
            bfs_hops(edges, source=source, mode="broadcast")
            .to_pandas()
            .sort_values("vertex")
            .reset_index(drop=True)
        )
        assert pin.equals(bro), (len(pin), len(bro))


def test_bfs_pinned_rejects_unowned_source():
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import bfs_hops
    from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
    from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges

    g = np.array([[0, 1], [1, 2]])
    edges = canonical_edges(from_numpy_edges(g, num_blocks=1))
    with pytest.raises(ValueError, match="not in the graph"):
        bfs_hops(edges, source=99, mode="pinned")


def test_multi_bfs_matches_per_seed_bfs():
    """k batched landmark waves == k independent single-source BFS runs
    on a random multi-component graph; default seeds = k smallest ids."""
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import (
        bfs_hops,
        multi_bfs_hops,
    )
    from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
    from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges

    rng = np.random.RandomState(11)
    n = 2500
    src = rng.randint(0, n, size=7000)
    dst = (src + rng.randint(1, 60, size=7000)) % n
    edges = canonical_edges(
        from_numpy_edges(np.stack([src, dst], axis=1), num_blocks=5)
    ).materialize()

    out = (
        multi_bfs_hops(edges, k=4)
        .to_pandas()
        .sort_values(["source", "vertex"])
        .reset_index(drop=True)
    )
    verts = np.unique(np.concatenate([src, dst]))
    seeds = verts[:4]
    assert np.array_equal(np.unique(out["source"]), seeds)
    for s in seeds:
        single = (
            bfs_hops(edges, source=int(s), mode="broadcast")
            .to_pandas()
            .sort_values("vertex")
            .reset_index(drop=True)
        )
        got = (
            out[out["source"] == s][["vertex", "hops"]]
            .reset_index(drop=True)
            .astype({"vertex": np.int64, "hops": np.int64})
        )
        assert got.equals(single.astype({"vertex": np.int64, "hops": np.int64}))


def test_multi_bfs_explicit_sources_and_bad_source():
    import pytest as _pytest

    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import multi_bfs_hops
    from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
    from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges

    g = np.array([[0, 1], [1, 2], [3, 4]])
    edges = canonical_edges(from_numpy_edges(g, num_blocks=1)).materialize()
    out = (
        multi_bfs_hops(edges, sources=[0, 3])
        .to_pandas()
        .sort_values(["source", "vertex"])
        .reset_index(drop=True)
    )
    want = {(0, 0): 0, (0, 1): 1, (0, 2): 2, (3, 3): 0, (3, 4): 1}
    got = {
        (int(r["source"]), int(r["vertex"])): int(r["hops"])
        for _, r in out.iterrows()
    }
    assert got == want
    with _pytest.raises(ValueError, match="not in the graph"):
        multi_bfs_hops(edges, sources=[0, 99])
