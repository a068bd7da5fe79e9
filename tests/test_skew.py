"""Skew-handling stages: combiner and salted aggregation equivalence,
star-graph (hot hub) stress through every CC strategy."""

from __future__ import annotations

import numpy as np
import pytest

import ray.data as rd

from fixtures.synth_pages import g_star
from pds_hw2_mpi_connected_components_ray.pipelines.cc import connected_components
from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges
from pds_hw2_mpi_connected_components_ray.stages.skew import (
    combine_per_batch,
    high_degree_vertices,
    salted_groupby_min,
)


def _kv_ds(n_keys=5, rows=10_000, seed=0):
    rng = np.random.RandomState(seed)
    import pyarrow as pa

    k = rng.randint(0, n_keys, size=rows).astype(np.int64)
    k[: rows // 2] = 0  # hot key
    v = rng.randint(0, 1_000_000, size=rows).astype(np.int64)
    t = pa.table({"vertex": k, "label": v})
    return rd.from_arrow(t).repartition(8), k, v


def test_combine_per_batch_preserves_min():
    ds, k, v = _kv_ds()
    combined = combine_per_batch(ds, "vertex", "label", how="min")
    from ray.data.aggregate import Min

    out = combined.groupby("vertex").aggregate(Min("label", alias_name="label")).to_pandas()
    want = {key: v[k == key].min() for key in np.unique(k)}
    got = dict(zip(out["vertex"], out["label"]))
    assert got == want
    # combiner bounded the row count: at most keys x blocks rows
    assert combined.count() <= len(want) * 8


def test_salted_groupby_min_equivalent():
    ds, k, v = _kv_ds(seed=3)
    out = salted_groupby_min(ds, "vertex", "label", salt_factor=8).to_pandas()
    want = {key: v[k == key].min() for key in np.unique(k)}
    assert dict(zip(out["vertex"], out["label"])) == want


def test_high_degree_detector():
    g = g_star(leaves=500)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=4))
    hot = high_degree_vertices(edges, threshold=100).to_pandas()
    assert hot["vertex"].tolist() == [0]
    assert hot["degree"].iloc[0] == 500


@pytest.mark.parametrize("strategy", [("hashmin", "shuffle"), ("hashmin", "pinned")])
def test_star_hub_all_strategies(strategy):
    method, mode = strategy
    g = g_star(leaves=3000)
    edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=8))
    res = connected_components(edges, method=method, mode=mode)
    df = res.labels.to_pandas()
    assert (df["label"] == 0).all()
    assert res.n_components == 1
