"""Cross-parallelism determinism: identical results regardless of block
count / batch boundaries — the engine-wide invariant mirroring the
reference's trial-consistency check (src/benchmark.c:275-284)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fixtures.synth_pages import g_random_forest
from pds_hw2_mpi_connected_components_ray.pipelines.cc import connected_components
from pds_hw2_mpi_connected_components_ray.pipelines.pagerank import pagerank
from pds_hw2_mpi_connected_components_ray.sources.edges import (
    derive_raw_edges,
    from_numpy_edges,
)
from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges

SF = "/root/testdata/sf0.001"


def test_derived_edges_deterministic_across_block_splits():
    a = (
        canonical_edges(derive_raw_edges(SF))
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    b = (
        canonical_edges(derive_raw_edges(SF).repartition(13))
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("mode", ["local", "pinned"])
def test_cc_same_labels_any_blocks(mode):
    g = g_random_forest()
    results = []
    for nblocks in (1, 7):
        edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=nblocks))
        res = connected_components(edges, mode=mode)
        results.append(
            res.labels.to_pandas().sort_values("vertex").reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(results[0], results[1])


def test_pagerank_rounded_stable_across_blocks():
    g = g_random_forest()
    vals = []
    for nblocks in (2, 9):
        edges = canonical_edges(from_numpy_edges(g.edges, num_blocks=nblocks))
        r = pagerank(edges, mode="local", max_iters=20)
        df = r.ranks.to_pandas().sort_values("vertex")
        vals.append(np.round(df["rank"].to_numpy(), 6))
    assert np.array_equal(vals[0], vals[1])
