"""Repetition quality signals and stratified sampling."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.pipelines.split import stratified_sample
from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import repetition_signals


def _docs(rows):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(len(rows), dtype=np.int64),
                "text": rows,
                "source": [f"s{i % 3}" for i in range(len(rows))],
            }
        )
    )


def test_repetition_signals_handcrafted(ray_session):
    docs = _docs(
        [
            "a b\na b\nc d",        # 3 lines, 2 distinct -> 1/3; 6 tokens ->
                                    # 5 bigrams (newlines are whitespace), "a b" x2
            "x y z",                 # no repeats: 0; bigrams "x y","y z" max 1/2
            "",                      # 1 empty line, 0 tokens -> 0, 0
            "tok",                   # single token: 0 bigrams -> 0
            "r r r r",               # 1 line; bigram "r r" x3 of 3 -> 1.0
        ]
    )
    out = repetition_signals(docs).to_pandas().set_index("doc_id").sort_index()
    def r6(x):
        return np.floor(x * 1e6 + 0.5) / 1e6

    assert out.loc[0, "dup_line_frac"] == r6(1 / 3)
    assert out.loc[0, "top_bigram_frac"] == 0.4
    assert out.loc[1, "dup_line_frac"] == 0.0
    assert out.loc[1, "top_bigram_frac"] == 0.5
    assert out.loc[2, "dup_line_frac"] == 0.0
    assert out.loc[2, "top_bigram_frac"] == 0.0
    assert out.loc[3, "top_bigram_frac"] == 0.0
    assert out.loc[4, "dup_line_frac"] == 0.0
    assert out.loc[4, "top_bigram_frac"] == 1.0


def test_repetition_rational_tie_rounds_half_up(ray_session):
    # 128 lines, one duplicated: dup fraction = 1/128 = 0.0078125 -- an
    # EXACT decimal tie at 6 places. np.round would give 0.007812
    # (half-to-even); the contract (= the SQL oracle) is half-up.
    text = "\n".join([f"l{i}" for i in range(127)] + ["l0"])
    out = repetition_signals(_docs([text])).to_pandas()
    assert out.loc[0, "dup_line_frac"] == 0.007813


def test_stratified_sample_caps_and_is_stable(ray_session):
    docs = _docs([f"doc {i}" for i in range(90)])
    out = stratified_sample(docs, key="source", n_per_group=5, seed=7).to_pandas()
    sizes = out.groupby("source").size()
    assert (sizes == 5).all() and len(sizes) == 3
    assert (out.groupby("source")["rnk"].max() == 5).all()
    # repartitioning must not change the sample (seeded hash rank order)
    out2 = (
        stratified_sample(docs.repartition(7), key="source", n_per_group=5, seed=7)
        .to_pandas()
    )
    key = lambda d: sorted(map(tuple, d[["source", "doc_id", "rnk"]].to_numpy()))
    assert key(out) == key(out2)


def test_stratified_sample_monotone_in_n(ray_session):
    # the n=3 sample is a prefix of the n=6 sample within every stratum
    docs = _docs([f"doc {i}" for i in range(60)])
    small = stratified_sample(docs, key="source", n_per_group=3, seed=7).to_pandas()
    big = stratified_sample(docs, key="source", n_per_group=6, seed=7).to_pandas()
    sset = set(map(tuple, small[["source", "doc_id"]].to_numpy()))
    bset = set(map(tuple, big[["source", "doc_id"]].to_numpy()))
    assert sset < bset
