"""Label-propagation communities + triangle counting vs oracles."""

from __future__ import annotations

import numpy as np
import pytest

from fixtures.synth_pages import ALL_GRAPHS, g_random_forest, g_ring_of_cliques, g_star, g_two_cliques
from pds_hw2_mpi_connected_components_ray.pipelines.labelprop import labelprop
from pds_hw2_mpi_connected_components_ray.pipelines.triangles import (
    triangle_count,
    triangles_per_vertex,
)
from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges
from tests.oracles import labelprop_sync_oracle, triangles_oracle


@pytest.mark.parametrize("mode", ["local", "shuffle", "pinned"])
def test_labelprop_matches_oracle(mode):
    g = g_ring_of_cliques()
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    res = labelprop(edges, iterations=4, mode=mode)
    df = res.labels.to_pandas().sort_values("vertex").reset_index(drop=True)
    oracle = labelprop_sync_oracle(g.n, g.edges, iters=4)
    present = np.unique(g.edges.reshape(-1))
    assert np.array_equal(df["label"].to_numpy(), oracle[present])


def test_labelprop_finds_cliques_as_communities():
    g = g_ring_of_cliques(k=10, size=8)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    res = labelprop(edges, iterations=8, mode="local")
    df = res.labels.to_pandas()
    # most vertices of each clique share that clique's dominant label
    df["clique"] = df["vertex"] // 8
    agree = df.groupby("clique")["label"].apply(lambda s: (s == s.mode().iloc[0]).mean())
    assert (agree > 0.7).all()


def test_triangles_two_cliques():
    g = g_two_cliques()  # 2 * C(8,3) = 112
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    assert triangle_count(edges) == 112
    assert triangles_oracle(g.n, g.edges) == 112


def test_triangles_ring_of_cliques():
    g = g_ring_of_cliques()  # 20 * C(10,3) = 2400 (bridges add none)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    want = triangles_oracle(g.n, g.edges)
    assert want == 2400
    assert triangle_count(edges) == want


def test_triangles_star_no_explosion_and_zero():
    g = g_star(leaves=2000)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    assert triangle_count(edges) == 0


def test_triangles_random_matches_bruteforce():
    rng = np.random.RandomState(3)
    e = rng.randint(0, 60, size=(300, 2)).astype(np.int64)
    edges = canonical_edges(from_numpy_edges(e, num_blocks=4))
    assert triangle_count(edges) == triangles_oracle(60, e)


def test_triangles_per_vertex_sums_to_3x_total():
    g = g_two_cliques()
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    pv = triangles_per_vertex(edges).to_pandas()
    assert pv["triangles"].sum() == 3 * 112
    # every clique vertex touches C(7,2) = 21 triangles
    assert (pv["triangles"] == 21).all()


def test_triangles_join_degree_attach_matches_broadcast(monkeypatch):
    """With the local-closure fast path disabled, broadcast_threshold=0
    forces the two-hash-join degree attach (the web-scale path); results
    must be identical to the broadcast degree attach."""
    import pds_hw2_mpi_connected_components_ray.pipelines.triangles as tri

    monkeypatch.setattr(tri, "_LOCAL_CLOSURE_EDGES", 0)
    g = g_ring_of_cliques(k=6, size=8)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    total_b = triangle_count(edges)
    total_j = triangle_count(edges, broadcast_threshold=0)
    assert total_j == total_b
    pv_b = (
        triangles_per_vertex(edges).to_pandas().sort_values("vertex").reset_index(drop=True)
    )
    pv_j = (
        triangles_per_vertex(edges, broadcast_threshold=0)
        .to_pandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )
    assert pv_b.equals(pv_j)


def test_triangles_local_closure_matches_join_path(monkeypatch):
    """Mode equality: the broadcast-CSR local-closure fast path (default
    below _LOCAL_CLOSURE_EDGES) must produce exactly the same total,
    per-vertex credits, and per-edge support as the distributed
    wedge-join plan on a random graph with skew."""
    import pds_hw2_mpi_connected_components_ray.pipelines.triangles as tri
    from pds_hw2_mpi_connected_components_ray.pipelines.triangles import edge_support

    rng = np.random.RandomState(7)
    e = rng.randint(0, 80, size=(500, 2)).astype(np.int64)
    hub = np.stack([np.zeros(40, dtype=np.int64), rng.randint(1, 80, 40)], axis=1)
    e = np.concatenate([e, hub])
    edges = canonical_edges(from_numpy_edges(e, num_blocks=4))

    tot_c = triangle_count(edges)
    pv_c = (
        triangles_per_vertex(edges).to_pandas().sort_values("vertex").reset_index(drop=True)
    )
    es_c = (
        edge_support(edges).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )

    monkeypatch.setattr(tri, "_LOCAL_CLOSURE_EDGES", 0)
    assert triangle_count(edges) == tot_c == triangles_oracle(80, e)
    pv_j = (
        triangles_per_vertex(edges).to_pandas().sort_values("vertex").reset_index(drop=True)
    )
    assert pv_c.equals(pv_j)
    es_j = (
        edge_support(edges).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert es_c.equals(es_j)


def test_kcore_peeling():
    """k-core on a ring of 6-cliques with pendant chains: the cliques
    form the 5-core; chain/pendant vertices peel away."""
    from pds_hw2_mpi_connected_components_ray.pipelines.kcore import kcore

    g = g_ring_of_cliques(k=5, size=6)
    # add a pendant path hanging off vertex 0: 100-101-102
    extra = np.array([[0, 100], [100, 101], [101, 102]], dtype=np.int64)
    edges = canonical_edges(
        from_numpy_edges(np.concatenate([g.edges, extra]), num_blocks=4)
    )
    core = kcore(edges, 5).to_pandas()
    in_core = set(core["vertex"])
    assert all(v in in_core for v in range(30))  # all clique vertices
    assert {100, 101, 102}.isdisjoint(in_core)  # pendant path peeled
    assert (core["degree"] >= 5).all()
    # empty core when k exceeds every degree
    assert kcore(edges, 50).to_pandas().empty


def test_kcore_matches_bruteforce():
    from pds_hw2_mpi_connected_components_ray.pipelines.kcore import kcore

    g = g_random_forest(n=300, seed=11)
    # forest alone has an empty 2-core; weave in a 12-cycle so the core
    # is non-trivial
    cyc = np.array([[200 + i, 200 + (i + 1) % 12] for i in range(12)], dtype=np.int64)
    all_edges = np.concatenate([g.edges, cyc])
    edges = canonical_edges(from_numpy_edges(all_edges, num_blocks=4))
    got = kcore(edges, 2).to_pandas().sort_values("vertex").reset_index(drop=True)
    # brute-force peel
    import collections

    adj = collections.defaultdict(set)
    for a, b in all_edges.tolist():
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < 2:
                for u in adj.pop(v):
                    adj[u].discard(v)
                changed = True
    want = sorted(adj)
    assert list(got["vertex"]) == want
    assert list(got["degree"]) == [len(adj[v]) for v in want]


def test_sampled_triangle_estimate_determinism_and_accuracy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.triangles import (
        sampled_triangle_estimate,
        triangle_count,
    )

    rng = np.random.default_rng(51)
    n, m = 60, 500
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    df = pd.DataFrame({"src": src, "dst": dst})
    df = df[df["src"] != df["dst"]].drop_duplicates()
    both = pd.concat(
        [df, df.rename(columns={"src": "dst", "dst": "src"})]
    ).drop_duplicates()

    def run(parts):
        ds = rd.from_pandas([both.iloc[i::parts] for i in range(parts)])
        return sampled_triangle_estimate(ds, p=0.5, seed=7)

    a, b = run(2), run(5)
    # deterministic + partition-invariant
    pd.testing.assert_frame_equal(a, b)
    exact = triangle_count(
        rd.from_pandas([both.iloc[i::3] for i in range(3)])
    )
    est = int(a["estimate"].iloc[0])
    assert est == int(np.floor(a["sampled_triangles"].iloc[0] / 0.125 + 0.5))
    # unbiased estimator on a dense-ish graph: within a loose factor
    assert 0.3 * exact <= est <= 2.5 * exact
