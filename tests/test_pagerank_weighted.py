"""Weighted PageRank vs a sequential numpy reference (both modes)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.pipelines.pagerank_weighted import (
    pagerank_weighted,
)


def _ref(pairs, weights, iters, damping=0.85):
    verts = sorted({v for e in pairs for v in e})
    vi = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    W = np.zeros(n)
    for (s, _), w in zip(pairs, weights):
        W[vi[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inc = np.zeros(n)
        for (s, d), w in zip(pairs, weights):
            inc[vi[d]] += r[vi[s]] * w / W[vi[s]]
        dang = r[W == 0].sum()
        r = (1 - damping) / n + damping * (inc + dang / n)
    return verts, r


@pytest.mark.parametrize("mode", ["local", "shuffle"])
def test_weighted_pagerank_matches_reference(ray_session, mode):
    rng = np.random.default_rng(19)
    pairs = [tuple(e) for e in rng.integers(0, 40, size=(150, 2)) if e[0] != e[1]]
    # include a dangling vertex: 99 has only in-edges
    pairs.append((0, 99))
    weights = rng.integers(1, 6, size=len(pairs)).astype(float)
    wedges = rd.from_pandas(
        pd.DataFrame(
            {
                "src": [p[0] for p in pairs],
                "dst": [p[1] for p in pairs],
                "weight": weights,
            }
        )
    )
    iters = 3 if mode == "shuffle" else 8
    out = (
        pagerank_weighted(wedges, iters=iters, mode=mode)
        .to_pandas()
        .sort_values("vertex")
    )
    verts, r = _ref(pairs, weights, iters)
    assert list(out["vertex"]) == verts
    assert np.allclose(out["pr"].to_numpy(), np.round(r, 6), atol=2e-6)


def test_weighted_reduces_to_uniform_on_equal_weights(ray_session):
    # equal weights == unweighted pagerank (sanity link to the main kernel)
    from pds_hw2_mpi_connected_components_ray.pipelines.pagerank import pagerank

    pairs = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 1)]
    wedges = rd.from_pandas(
        pd.DataFrame(
            {
                "src": [p[0] for p in pairs],
                "dst": [p[1] for p in pairs],
                "weight": np.ones(len(pairs)),
            }
        )
    )
    edges = rd.from_pandas(
        pd.DataFrame({"src": [p[0] for p in pairs], "dst": [p[1] for p in pairs]})
    )
    w = pagerank_weighted(wedges, iters=6, mode="local").to_pandas().sort_values("vertex")
    u = pagerank(edges, max_iters=6, mode="local").ranks.to_pandas().sort_values("vertex")
    assert np.allclose(w["pr"].to_numpy(), np.round(u["rank"].to_numpy(), 6), atol=2e-6)
