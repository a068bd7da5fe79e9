"""PageRank vs power-iteration oracle: allclose 1e-6 at convergence
(BASELINE.md target), both execution modes."""

from __future__ import annotations

import numpy as np
import pytest

from fixtures.synth_pages import ALL_GRAPHS, g_star, g_two_cliques
from pds_hw2_mpi_connected_components_ray.pipelines.pagerank import pagerank
from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges
from tests.oracles import pagerank_oracle


def _ranks_np(res, verts):
    df = res.ranks.to_pandas().sort_values("vertex").reset_index(drop=True)
    assert np.array_equal(df["vertex"].to_numpy(), verts)
    return df["rank"].to_numpy()


@pytest.mark.parametrize("mode", ["local", "shuffle", "pinned"])
@pytest.mark.parametrize("gname", ["g_two_cliques", "g_ring_of_cliques"])
def test_pagerank_matches_oracle(gname, mode):
    g = ALL_GRAPHS[gname]()
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    res = pagerank(edges, mode=mode, max_iters=100, tol=1e-12)
    present = np.unique(g.edges.reshape(-1))
    got = _ranks_np(res, present)
    oracle_full = pagerank_oracle(g.n, g.edges, max_iter=100, tol=1e-12)
    # engine works on the edge-present subgraph; oracle restricted to the
    # same vertex set must use the same n -- rebuild on compacted ids
    remap = {v: i for i, v in enumerate(present)}
    compact = np.array([[remap[a], remap[b]] for a, b in g.edges.tolist()])
    oracle = pagerank_oracle(len(present), compact, max_iter=100, tol=1e-12)
    assert np.allclose(got, oracle, atol=1e-6)


def test_pagerank_star_closed_form():
    g = g_star(leaves=200)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    res = pagerank(edges, mode="local", max_iters=200, tol=1e-14)
    ranks = _ranks_np(res, np.arange(g.n))
    n, d = g.n, 0.85
    leaf = (1 - d) / n + d * ((1 - d) / n + d / n * 0) / 1  # not closed form; use oracle
    oracle = pagerank_oracle(g.n, g.edges, max_iter=500, tol=1e-14)
    assert np.allclose(ranks, oracle, atol=1e-8)
    # hub outranks leaves
    assert ranks[0] > ranks[1]
    assert np.allclose(ranks.sum(), 1.0, atol=1e-9)


def test_pagerank_dangling_mass_directed():
    """Directed chain 0->1->2 (2 is dangling): exercised dangling path."""
    e = np.array([[0, 1], [1, 2]], dtype=np.int64)
    ds = from_numpy_edges(e, num_blocks=1)
    res = pagerank(ds, mode="local", max_iters=100, tol=1e-14)
    got = _ranks_np(res, np.array([0, 1, 2]))
    oracle = pagerank_oracle(3, e, max_iter=500, tol=1e-14, symmetrize=False)
    assert np.allclose(got, oracle, atol=1e-9)
    assert np.allclose(got.sum(), 1.0, atol=1e-9)


def test_pagerank_modes_agree():
    g = g_two_cliques()
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    r1 = pagerank(edges, mode="local", max_iters=20)
    r2 = pagerank(edges, mode="shuffle", max_iters=20)
    a = r1.ranks.to_pandas().sort_values("vertex")["rank"].to_numpy()
    b = r2.ranks.to_pandas().sort_values("vertex")["rank"].to_numpy()
    assert np.allclose(a, b, atol=1e-12)
