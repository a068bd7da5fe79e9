"""Resumable partitioned sink + duplicate-group clustering."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from fixtures.synth_pages import near_dup_documents
from pds_hw2_mpi_connected_components_ray.pipelines.dedup import (
    duplicate_groups,
    minhash_lsh_pairs,
)
from pds_hw2_mpi_connected_components_ray.sources.sinks import (
    finished_partitions,
    read_partitioned,
    write_partitioned,
)


def _ds(n=1000):
    t = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(np.arange(n, dtype=np.int64) * 3),
        }
    )
    return rd.from_arrow(t).repartition(4)


def test_write_partitioned_roundtrip(tmp_path):
    root = str(tmp_path / "out")
    rep = write_partitioned(_ds(), root, key="k", num_partitions=8)
    assert sorted(rep["written"]) == list(range(8))
    assert rep["skipped"] == []
    back = read_partitioned(root).to_pandas().sort_values("k").reset_index(drop=True)
    assert len(back) == 1000
    assert (back["v"] == back["k"] * 3).all()


def test_write_partitioned_resume_skips_finished(tmp_path):
    root = str(tmp_path / "out")
    write_partitioned(_ds(), root, key="k", num_partitions=8)
    # simulate a partial failure: delete two partitions' success markers
    for p in (2, 5):
        os.remove(os.path.join(root, f"part={p:05d}", "_SUCCESS"))
    assert finished_partitions(root) == {0, 1, 3, 4, 6, 7}
    rep = write_partitioned(_ds(), root, key="k", num_partitions=8)
    assert sorted(rep["written"]) == [2, 5]
    assert sorted(rep["skipped"]) == [0, 1, 3, 4, 6, 7]
    back = read_partitioned(root).to_pandas()
    assert len(back) == 1000


def test_duplicate_groups_from_minhash_pairs():
    docs = rd.from_arrow(near_dup_documents()).repartition(4)
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    groups = duplicate_groups(pairs).to_pandas()
    # group representative is the min doc id of each cluster
    assert (groups.groupby("group_id")["doc_id"].min() == groups["group_id"].unique()).all()
    # exact duplicate pairs (base, exact-copy) must share a group
    df = near_dup_documents().to_pandas()
    base_ids = df[df["source"].str.startswith("base")].set_index(
        df[df["source"].str.startswith("base")]["source"].str.extract(r"(\d+)$")[0]
    )["doc_id"]
    g = groups.set_index("doc_id")["group_id"]
    for bnum, bid in base_ids.items():
        ex = df[df["source"] == f"exact{bnum}"]
        if len(ex) and bid in g.index and int(ex["doc_id"].iloc[0]) in g.index:
            assert g[bid] == g[int(ex["doc_id"].iloc[0])]
