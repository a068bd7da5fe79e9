"""Per-key windowed top-k and bigram counts."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import top_bigrams
from pds_hw2_mpi_connected_components_ray.pipelines.window import top_k_per_group


def test_top_k_per_group_matches_pandas(ray_session):
    rng = np.random.default_rng(31)
    n = 500
    df = pd.DataFrame(
        {
            "key": rng.choice(list("abcdefgh"), n),
            "score": rng.integers(0, 50, n),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    out = (
        top_k_per_group(
            rd.from_pandas([df.iloc[i::4] for i in range(4)]),
            key="key",
            order_cols=["score", "id"],
            descending=[True, False],
            k=3,
        )
        .to_pandas()
        .sort_values(["key", "rnk"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["key", "score", "id"], ascending=[True, False, True])
    exp = exp.groupby("key").head(3).copy()
    exp["rnk"] = exp.groupby("key").cumcount() + 1
    exp = exp.sort_values(["key", "rnk"]).reset_index(drop=True)
    assert (out["id"].to_numpy() == exp["id"].to_numpy()).all()
    assert (out["rnk"].to_numpy() == exp["rnk"].to_numpy()).all()


def test_top_k_groups_smaller_than_k(ray_session):
    df = pd.DataFrame({"key": ["a", "a", "b"], "v": [3, 1, 9], "id": [0, 1, 2]})
    out = (
        top_k_per_group(
            rd.from_pandas(df), key="key", order_cols=["v", "id"], k=5
        )
        .to_pandas()
        .sort_values(["key", "rnk"])
    )
    assert len(out) == 3  # all rows survive when the group is short
    assert list(out["id"]) == [1, 0, 2]  # ascending v within key


def test_bigrams_no_cross_document_pairs(ray_session):
    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["a b c", "c a", "", "b c"],
            }
        )
    )
    out = top_bigrams(docs, k=10).to_pandas()
    got = dict(zip(out["bigram"], out["n"]))
    # "c c" would only arise across the doc0/doc1 boundary -- must be absent
    assert got == {"a b": 1, "b c": 2, "c a": 1}


def test_bigrams_split_invariant(ray_session):
    rng = np.random.default_rng(7)
    texts = [
        " ".join(rng.choice(list("xyzw"), rng.integers(0, 12)))
        for _ in range(200)
    ]
    outs = []
    for ns in (1, 6):
        docs = rd.from_pandas(
            [
                pd.DataFrame(
                    {
                        "doc_id": np.arange(200, dtype=np.int64)[i::ns],
                        "text": [texts[j] for j in range(i, 200, ns)],
                    }
                )
                for i in range(ns)
            ]
        )
        outs.append(
            top_bigrams(docs, k=16)
            .to_pandas()
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_neighbor_sample_deterministic_and_bounded(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.window import neighbor_sample

    rng = np.random.default_rng(41)
    src = rng.integers(0, 30, size=400).astype(np.int64)
    dst = rng.integers(0, 30, size=400).astype(np.int64)
    df = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
    df = df[df["src"] != df["dst"]]

    def run(parts):
        ds = rd.from_pandas([df.iloc[i::parts] for i in range(parts)])
        return (
            neighbor_sample(ds, k=3)
            .to_pandas()
            .sort_values(["src", "rnk"])
            .reset_index(drop=True)
        )

    a, b = run(2), run(5)
    # partitioning-invariant and fan-out bounded
    assert a.equals(b)
    assert a.groupby("src").size().max() <= 3
    # matches the SQL-expressible mix order exactly
    w = df.copy()
    w["h"] = ((w["src"] % 2147483647) * 2654435761 + (w["dst"] % 2147483647) * 40503) % 2147483647
    w = w.sort_values(["src", "h", "dst"]).groupby("src").head(3)
    w["rnk"] = w.groupby("src").cumcount() + 1
    w = w.sort_values(["src", "rnk"]).reset_index(drop=True)
    assert np.array_equal(a["dst"].to_numpy(), w["dst"].to_numpy())
    # every vertex with out-edges is represented
    assert set(a["src"]) == set(df["src"])
