"""Modularity and community quotient graph."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.pipelines.communities import (
    community_graph,
    modularity,
)


def _sym(pairs):
    """Canonical symmetric distinct edge Dataset from undirected pairs."""
    rows = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    df = pd.DataFrame(rows, columns=["src", "dst"]).astype(np.int64)
    return rd.from_pandas(df)


def _labels(d):
    df = pd.DataFrame(
        {"vertex": list(d.keys()), "label": list(d.values())}
    ).astype(np.int64)
    return rd.from_pandas(df)


# two triangles bridged by one edge; perfect 2-community split
_TRIS = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
_SPLIT = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_modularity_two_triangles(ray_session):
    out = modularity(_sym(_TRIS), _labels(_SPLIT)).to_pandas()
    # m=7 undirected, E=14; A = 12 (6 intra rows x2); d_c = 7 per side
    # Q = 12/14 - 2*(7/14)^2 = 6/7 - 1/2 = 5/14
    assert out.loc[0, "n_communities"] == 2
    assert out.loc[0, "modularity"] == np.floor(5 / 14 * 1e6 + 0.5) / 1e6


def test_modularity_single_community_is_zero(ray_session):
    out = modularity(_sym(_TRIS), _labels({v: 0 for v in range(6)})).to_pandas()
    # all-in-one labeling: Q = E/E - E^2/E^2 = 0 exactly
    assert out.loc[0, "modularity"] == 0.0
    assert out.loc[0, "n_communities"] == 1


def test_community_graph_quotient(ray_session):
    out = (
        community_graph(_sym(_TRIS), _labels(_SPLIT))
        .to_pandas()
        .sort_values(["ca", "cb"])
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {"ca": [0, 0, 3], "cb": [0, 3, 3], "weight": [6, 2, 6]}
    )
    pd.testing.assert_frame_equal(out.astype(np.int64), exp.astype(np.int64))


def test_attach_join_path_matches_broadcast(ray_session):
    rng = np.random.RandomState(7)
    pairs = {(int(a), int(b)) for a, b in rng.randint(0, 60, size=(300, 2)) if a != b}
    labels = {v: int(v % 5) for v in range(60)}
    e = _sym(pairs)
    l = _labels(labels)
    a = modularity(e, l).to_pandas()
    b = modularity(e, l, force_join=True).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ga = community_graph(e, l).to_pandas().sort_values(["ca", "cb"]).reset_index(drop=True)
    gb = (
        community_graph(e, l, force_join=True)
        .to_pandas()
        .sort_values(["ca", "cb"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ga, gb)


def test_modularity_matches_brute(ray_session):
    rng = np.random.RandomState(11)
    pairs = {(int(a), int(b)) for a, b in rng.randint(0, 40, size=(150, 2)) if a != b}
    labels = {v: int(v % 7) for v in range(40)}
    out = modularity(_sym(pairs), _labels(labels)).to_pandas()
    # brute force over the directed symmetric row set
    rows = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    e = len(rows)
    a = sum(1 for s, d in rows if labels[s] == labels[d])
    dc: dict[int, int] = {}
    for s, _ in rows:
        dc[labels[s]] = dc.get(labels[s], 0) + 1
    q = a / e - sum(v * v for v in dc.values()) / (e * e)
    assert out.loc[0, "modularity"] == np.floor(q * 1e6 + 0.5) / 1e6
    assert out.loc[0, "n_communities"] == len(dc)


def test_conductance_two_triangles(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.communities import conductance

    out = (
        conductance(_sym(_TRIS), _labels(_SPLIT))
        .to_pandas()
        .sort_values("community")
        .reset_index(drop=True)
    )
    # each side: vol=7, cut=1 (the bridge), E=14 -> phi = 1/7
    assert list(out["community"]) == [0, 3]
    assert list(out["cut"]) == [1, 1]
    assert list(out["vol"]) == [7, 7]
    exp = np.floor(1 / 7 * 1e6 + 0.5) / 1e6
    assert list(out["conductance"]) == [exp, exp]


def test_conductance_whole_graph_zero(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.communities import conductance

    out = conductance(_sym(_TRIS), _labels({v: 0 for v in range(6)})).to_pandas()
    # complement volume 0 -> 0.0 by convention
    assert out.loc[0, "conductance"] == 0.0 and out.loc[0, "cut"] == 0
