"""Distributed prefix scan and the ordering/packing operators on it."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.pipelines.ordering import (
    length_quantiles,
    ordered_scan,
    pack_sequences,
    training_shuffle,
)


def _ds_from_splits(ids, vals, nsplits):
    """Build a Dataset from deliberately shuffled, uneven blocks."""
    return rd.from_pandas(
        [
            pd.DataFrame({"k": ids[i::nsplits], "v": vals[i::nsplits]})
            for i in range(nsplits)
        ]
    )


def test_ordered_scan_exact_and_split_invariant(ray_session):
    rng = np.random.default_rng(7)
    ids = rng.permutation(5000).astype(np.int64)
    vals = rng.integers(0, 100, 5000).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    expect = np.r_[0, np.cumsum(vals[order])[:-1]]
    for nsplits in (1, 3, 11):
        out = (
            ordered_scan(_ds_from_splits(ids, vals, nsplits), "k", "v")
            .to_pandas()
            .sort_values("k")
        )
        assert (out["cum_prev"].to_numpy() == expect).all(), nsplits


def test_ordered_scan_few_buckets_and_dense_collision(ray_session):
    # num_buckets larger than the key range: every key maps to its own
    # bucket (width clamps to 1); also a tiny range with all rows in
    # one bucket. Both must stay exact.
    ids = np.arange(50, dtype=np.int64)
    vals = np.ones(50, dtype=np.int64)
    expect = np.arange(50, dtype=np.int64)
    for nb in (1, 1000):
        out = (
            ordered_scan(_ds_from_splits(ids, vals, 4), "k", "v", num_buckets=nb)
            .to_pandas()
            .sort_values("k")
        )
        assert (out["cum_prev"].to_numpy() == expect).all(), nb


def test_training_shuffle_is_seeded_permutation(ray_session):
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(3000, dtype=np.int64)})
    )
    a = training_shuffle(docs, seed=1).to_pandas().sort_values("doc_id")
    assert sorted(a["pos"]) == list(range(3000))  # bijection
    b = training_shuffle(docs, seed=1).to_pandas().sort_values("doc_id")
    assert (a["pos"].to_numpy() == b["pos"].to_numpy()).all()  # deterministic
    c = training_shuffle(docs, seed=2).to_pandas().sort_values("doc_id")
    assert (a["pos"].to_numpy() != c["pos"].to_numpy()).any()  # seed matters
    # not the identity order (it actually shuffles)
    assert (a["pos"].to_numpy() != np.arange(3000)).any()


def test_pack_sequences_invariants(ray_session):
    rng = np.random.default_rng(3)
    n = 400
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 300, n)]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    )
    out = pack_sequences(docs, window=256).to_pandas().sort_values("doc_id")
    toks = out["n_tokens"].to_numpy()
    cp = out["pack_id"].to_numpy() * 256 + out["pack_offset"].to_numpy()
    # start positions are the exclusive cumsum in doc_id order
    assert (cp == np.r_[0, np.cumsum(toks)[:-1]]).all()
    assert (out["pack_offset"].to_numpy() < 256).all()
    # every pack before the last is fully covered (concat-then-chunk
    # leaves no holes): the stream is contiguous by construction
    assert cp[-1] + toks[-1] == toks.sum()


def test_length_quantiles_matches_numpy_rank(ray_session):
    rng = np.random.default_rng(9)
    lens = rng.integers(10, 500, 1234).astype(np.int64)
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(lens)), "n_chars": lens})
    )
    out = length_quantiles(docs, qs=(0.5, 0.9, 0.99))
    s = np.sort(lens)
    for q, v in zip(out["q"], out["value"]):
        idx = max(0, int(np.ceil(q * len(s))) - 1)
        assert v == s[idx], q


def test_ntile_matches_sql_sizing(ray_session):
    import duckdb

    rng = np.random.default_rng(2)
    lens = rng.integers(0, 100, 437).astype(np.int64)
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(437, dtype=np.int64), "n_chars": lens})
    )
    from pds_hw2_mpi_connected_components_ray.pipelines.ordering import ntile_buckets

    out = ntile_buckets(docs, n=7, order_col="n_chars").to_pandas().sort_values("doc_id")
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"doc_id": np.arange(437), "n_chars": lens}))
    exp = con.sql(
        "SELECT doc_id, ntile(7) OVER (ORDER BY n_chars, doc_id) AS tile FROM d"
    ).df().sort_values("doc_id")
    assert (out["tile"].to_numpy() == exp["tile"].to_numpy()).all()
