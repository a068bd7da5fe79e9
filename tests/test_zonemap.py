"""Zone-map sorted layout: pruned reads equal full-filter reads."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.sources.sinks import (
    read_zonemap_range,
    write_sorted_zonemap,
)


def _ds(n=20000, seed=3):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n).astype(np.int64)
    pay = rng.integers(0, 1000, n)
    return rd.from_pandas(
        [
            pd.DataFrame({"doc_id": perm[i::4], "payload": pay[i::4]})
            for i in range(4)
        ]
    )


def test_zonemap_prunes_and_matches(ray_session, tmp_path):
    root = str(tmp_path / "zm")
    manifest = write_sorted_zonemap(_ds(), root, "doc_id", num_files=16)
    assert len(manifest["files"]) == 16
    # zones are disjoint and ordered
    maxes = [f["max"] for f in manifest["files"]]
    mins = [f["min"] for f in manifest["files"]]
    assert all(maxes[i] < mins[i + 1] for i in range(len(mins) - 1))

    out, n_read, n_total = read_zonemap_range(root, 5000, 6249)
    got = out.to_pandas().sort_values("doc_id")
    assert list(got["doc_id"]) == list(range(5000, 6250))
    assert n_total == 16
    assert n_read <= 2  # 1250-wide range over ~1250-wide zones

    # full-range read returns everything
    full, n_read_full, _ = read_zonemap_range(root, 0, 10**9)
    assert full.count() == 20000
    assert n_read_full == 16


def test_zonemap_empty_range(ray_session, tmp_path):
    root = str(tmp_path / "zm2")
    write_sorted_zonemap(_ds(2000), root, "doc_id", num_files=4)
    out, n_read, n_total = read_zonemap_range(root, 10**6, 10**7)
    assert n_read == 0 and n_total == 4
    assert out.count() == 0


def test_zonemap_atomicity(ray_session, tmp_path):
    root = str(tmp_path / "zm3")
    write_sorted_zonemap(_ds(1000), root, "doc_id", num_files=4)
    # a second write replaces the layout atomically
    write_sorted_zonemap(_ds(500, seed=9), root, "doc_id", num_files=2)
    out, _, n_total = read_zonemap_range(root, 0, 10**9)
    assert out.count() == 500 and n_total == 2
    assert os.path.exists(os.path.join(root, "_SUCCESS"))
