"""Incremental CC: base fixpoint + delta edges == from-scratch solve."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.pipelines.cc import connected_components
from pds_hw2_mpi_connected_components_ray.pipelines.incremental import cc_incremental
from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges

from tests.oracles import uf_labels


def _ds(pairs):
    arr = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    return canonical_edges(
        rd.from_pandas(pd.DataFrame({"src": arr[:, 0], "dst": arr[:, 1]}))
    ).materialize()


def _check(base_pairs, delta_pairs, broadcast_threshold):
    base = _ds(base_pairs)
    res_base = connected_components(base, mode="auto")
    res = cc_incremental(
        res_base.labels, _ds(delta_pairs), broadcast_threshold=broadcast_threshold
    )
    got = res.labels.to_pandas().sort_values("vertex").reset_index(drop=True)
    exp = uf_labels(list(base_pairs) + list(delta_pairs))
    exp_df = pd.DataFrame(sorted(exp.items()), columns=["vertex", "label"])
    assert (got["vertex"].to_numpy() == exp_df["vertex"].to_numpy()).all()
    assert (got["label"].to_numpy() == exp_df["label"].to_numpy()).all()
    return res


@pytest.mark.parametrize("bt", [10**6, 0], ids=["broadcast", "join"])
def test_incremental_random_graph(ray_session, bt):
    rng = np.random.default_rng(21)
    base = [tuple(e) for e in rng.integers(0, 500, size=(900, 2)) if e[0] != e[1]]
    delta = [tuple(e) for e in rng.integers(0, 650, size=(120, 2)) if e[0] != e[1]]
    _check(base, delta, bt)


@pytest.mark.parametrize("bt", [10**6, 0], ids=["broadcast", "join"])
def test_incremental_bridges_two_chains(ray_session, bt):
    base = [(i, i + 1) for i in range(0, 49)] + [(i, i + 1) for i in range(100, 149)]
    delta = [(49, 100)]  # one bridge merges the two components
    res = _check(base, delta, bt)
    assert res.n_components == 1


@pytest.mark.parametrize("bt", [10**6, 0], ids=["broadcast", "join"])
def test_incremental_new_vertices_only(ray_session, bt):
    base = [(0, 1), (1, 2)]
    delta = [(10, 11), (11, 12)]  # entirely new component
    res = _check(base, delta, bt)
    assert res.n_components == 2


def test_incremental_no_merge_delta(ray_session):
    # delta edges inside existing components: labels must be unchanged
    base = [(0, 1), (1, 2), (5, 6)]
    delta = [(0, 2)]
    res = _check(base, delta, 10**6)
    assert res.n_components == 2
