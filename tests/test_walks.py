"""Deterministic random walks vs a sequential python oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.pipelines.walks import (
    _A,
    _B,
    _C,
    _M,
    deterministic_walks,
)
from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges


def _brute(pairs, length, seed):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for w in sorted(adj):
        v = w
        rows.append((w, 0, v))
        for step in range(1, length + 1):
            nbrs = adj.get(v)
            if not nbrs:
                break
            best = min(
                nbrs,
                key=lambda u: (
                    (((u + seed) % _M) * _A + (w % _M) * _B + step * _C) % _M,
                    u,
                ),
            )
            v = best
            rows.append((w, step, v))
    return sorted(rows)


def test_walks_match_bruteforce(ray_session):
    rng = np.random.default_rng(41)
    pairs = [tuple(e) for e in rng.integers(0, 80, size=(200, 2)) if e[0] != e[1]]
    arr = np.asarray(pairs, dtype=np.int64)
    ds = canonical_edges(
        rd.from_pandas(pd.DataFrame({"src": arr[:, 0], "dst": arr[:, 1]}))
    ).materialize()
    out = deterministic_walks(ds, length=4, seed=7).to_pandas()
    got = sorted(zip(out["walk_id"], out["step"], out["vertex"]))
    assert [tuple(map(int, r)) for r in got] == _brute(pairs, 4, 7)


def test_walks_broadcast_equals_shuffle(ray_session):
    rng = np.random.default_rng(43)
    pairs = [tuple(e) for e in rng.integers(0, 60, size=(150, 2)) if e[0] != e[1]]
    arr = np.asarray(pairs, dtype=np.int64)
    ds = canonical_edges(
        rd.from_pandas(pd.DataFrame({"src": arr[:, 0], "dst": arr[:, 1]}))
    ).materialize()
    key = ["walk_id", "step"]
    a = (
        deterministic_walks(ds, length=3, seed=9, mode="broadcast")
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    b = (
        deterministic_walks(ds, length=3, seed=9, mode="shuffle")
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[key + ["vertex"]], b[key + ["vertex"]])


def test_walks_deterministic_and_seeded(ray_session):
    pairs = [(i, (i + 1) % 20) for i in range(20)] + [(i, (i + 7) % 20) for i in range(20)]
    arr = np.asarray(pairs, dtype=np.int64)
    ds = canonical_edges(
        rd.from_pandas(pd.DataFrame({"src": arr[:, 0], "dst": arr[:, 1]}))
    ).materialize()
    a = deterministic_walks(ds, length=3, seed=1).to_pandas()
    b = deterministic_walks(ds, length=3, seed=1).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["walk_id", "step"]).reset_index(drop=True),
        b.sort_values(["walk_id", "step"]).reset_index(drop=True),
    )
    c = deterministic_walks(ds, length=3, seed=2).to_pandas()
    merged = a.merge(c, on=["walk_id", "step"], suffixes=("_a", "_c"))
    assert (merged["vertex_a"] != merged["vertex_c"]).any()
