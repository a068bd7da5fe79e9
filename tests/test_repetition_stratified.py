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


def test_lexical_diversity_handcrafted(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        lexical_diversity,
    )

    out = (
        lexical_diversity(_docs(["a a a b", "x y z", "", "w w"]))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_tokens"] == 4 and out.loc[0, "n_types"] == 2
    assert out.loc[0, "ttr"] == 0.5
    assert out.loc[1, "ttr"] == 1.0
    assert out.loc[2, "n_tokens"] == 0 and out.loc[2, "ttr"] == 0.0
    assert out.loc[3, "ttr"] == 0.5


def test_rate_anomalies_handcrafted(ray_session):
    import pandas as pd

    from pds_hw2_mpi_connected_components_ray.pipelines.events import rate_anomalies

    # user 1: window counts [1]*8 + [10] -> z = (10-2)/3 = 2.667 spike
    # (a single outlier among n windows caps at (n-1)/sqrt(n), so the
    # baseline must be wide enough for |z| >= 2 to be reachable);
    # user 2: constant counts -> zero variance, never scores
    rows = []
    eid = 0
    for w in range(8):
        rows.append((eid, np.datetime64(3600_000_000 * w, "us"), 1)); eid += 1
    for _ in range(10):
        rows.append((eid, np.datetime64(3600_000_000 * 8 + 5, "us"), 1)); eid += 1
    for w in range(3):
        rows.append((eid, np.datetime64(3600_000_000 * w, "us"), 2)); eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    out = rate_anomalies(rd.from_pandas(df)).to_pandas()
    assert set(out["user_id"]) == {1}
    assert out.loc[out["user_id"] == 1, "win"].tolist() == [8]
    z = (10 - 2.0) / np.std([1] * 8 + [10], ddof=1)
    assert out["z"].iloc[0] == round(z, 6)


def test_quality_by_source_consistent_with_classifier(ray_session):
    """Per-source report must re-aggregate exactly from the per-doc
    classifier output joined to sources."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        quality_by_source,
        quality_classifier,
    )

    rng = np.random.default_rng(71)
    n = 150
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": rng.choice(["wiki", "web", "code"], n),
            "text": [
                " ".join(rng.choice(["alpha", "beta", "gamma", "x"], rng.integers(1, 30)))
                for _ in range(n)
            ],
        }
    )
    ds = rd.from_pandas([docs.iloc[i::3] for i in range(3)])
    rep = quality_by_source(ds).to_pandas().set_index("source")
    per = quality_classifier(ds).to_pandas().merge(
        docs[["doc_id", "source"]], on="doc_id"
    )
    per["mu"] = np.floor(per["score"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    for src, g in per.groupby("source"):
        assert rep.loc[src, "n_docs"] == len(g)
        assert rep.loc[src, "n_keep"] == int(g["keep"].sum())
        want = np.floor(g["mu"].sum() / len(g) + 0.5) / 1e6
        assert rep.loc[src, "mean_score"] == want
