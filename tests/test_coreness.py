"""Core-number decomposition (h-index fixpoint) vs brute-force peel."""

from __future__ import annotations

import numpy as np
import pytest

from fixtures.synth_pages import g_ring_of_cliques, g_two_cliques
from pds_hw2_mpi_connected_components_ray.pipelines.kcore import coreness
from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges


def coreness_oracle(e: np.ndarray) -> dict[int, int]:
    """Brute-force peel: coreness(v) = max k such that v survives the
    k-core peel. O(kmax * n * rounds) — fine at fixture scale."""
    e = e[e[:, 0] != e[:, 1]]
    sym = np.unique(
        np.concatenate([e, e[:, ::-1]]).view([("a", np.int64), ("b", np.int64)])
    )
    s = sym["a"].astype(np.int64)
    d = sym["b"].astype(np.int64)
    vids = np.unique(s)
    n = len(vids)
    si = np.searchsorted(vids, s)
    di = np.searchsorted(vids, d)
    alive_e = np.ones(len(si), bool)
    alive_v = np.ones(n, bool)
    core = np.zeros(n, np.int64)
    k = 0
    while alive_e.any():
        k += 1
        while True:
            deg = np.bincount(si[alive_e], minlength=n)
            kill = alive_v & (deg < k)
            if not kill.any():
                break
            alive_v[kill] = False
            alive_e &= alive_v[si] & alive_v[di]
        core[alive_v] = k
    return {int(v): int(c) for v, c in zip(vids, core) if c > 0}


def _got(edges_ds, **kw) -> dict[int, int]:
    df = coreness(edges_ds, **kw).to_pandas()
    return dict(zip(df["vertex"].astype(int), df["coreness"].astype(int)))


def test_coreness_cliques(ray_session):
    g = g_two_cliques()  # two K8s: every vertex has core number 7
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    got = _got(edges)
    assert set(got.values()) == {7}
    assert got == coreness_oracle(g.edges)


def test_coreness_path_is_one(ray_session):
    e = np.array([[i, i + 1] for i in range(30)], dtype=np.int64)
    edges = canonical_edges(from_numpy_edges(e, num_blocks=4))
    got = _got(edges)
    assert set(got.values()) == {1}
    assert len(got) == 31


def test_coreness_random_matches_peel(ray_session):
    rng = np.random.RandomState(5)
    e = rng.randint(0, 90, size=(600, 2)).astype(np.int64)
    # graft a pendant chain and a clique for core-number diversity
    chain = np.array([[90, 91], [91, 92], [92, 93]], dtype=np.int64)
    k6 = np.array(
        [[100 + i, 100 + j] for i in range(6) for j in range(i + 1, 6)], dtype=np.int64
    )
    bridge = np.array([[0, 100], [1, 93]], dtype=np.int64)
    e = np.concatenate([e, chain, k6, bridge])
    edges = canonical_edges(from_numpy_edges(e, num_blocks=4))
    want = coreness_oracle(e)
    assert _got(edges) == want


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_coreness_modes_equal(ray_session, mode):
    g = g_ring_of_cliques(k=6, size=7)
    extra = np.array([[0, 500], [500, 501], [501, 502]], dtype=np.int64)
    e = np.concatenate([g.edges, extra])
    edges = canonical_edges(from_numpy_edges(e, num_blocks=4))
    assert _got(edges, mode=mode) == coreness_oracle(e)
