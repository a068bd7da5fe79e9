"""PII scrubbing and per-source stats."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.pipelines.clean import (
    scrub_pii,
    source_stats,
)


def _run(texts):
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )
    return scrub_pii(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_scrub_pii_redacts(ray_session):
    out = _run(
        [
            "mail a.b-c_9@sub.example.org please",
            "call 555-123-4567 or 555.123.4567 now",
            "both x@y.io and 123-456-7890 here",
            "clean text with no pii at all",
            "",
        ]
    )
    assert out.loc[0, "clean_text"] == "mail <EMAIL> please"
    assert out.loc[0, "n_emails"] == 1 and out.loc[0, "n_phones"] == 0
    assert out.loc[1, "clean_text"] == "call <PHONE> or <PHONE> now"
    assert out.loc[1, "n_phones"] == 2
    assert out.loc[2, "clean_text"] == "both <EMAIL> and <PHONE> here"
    assert out.loc[3, "clean_text"] == "clean text with no pii at all"
    assert out.loc[4, "clean_text"] == ""
    assert (out.loc[3:, ["n_emails", "n_phones"]].to_numpy() == 0).all()


def test_scrub_pii_email_digits_not_double_redacted(ray_session):
    # digits inside an email local part vanish with the email; the
    # phone pass must not fire on them (order: emails first)
    out = _run(["reach 123-456-7890x@example.com maybe"])
    # the email regex grabs '456-7890x@example.com' (char class includes
    # '-'), leaving '123-' behind -- deterministic, mirrored by the SQL
    assert "<EMAIL>" in out.loc[0, "clean_text"]
    assert out.loc[0, "n_emails"] == 1


def test_source_stats_matches_pandas(ray_session):
    n = 300
    rng = np.random.default_rng(5)
    srcs = rng.choice(["a.com", "b.org", "c.net"], n)
    texts = [" ".join(["tok"] * int(k)) for k in rng.integers(1, 20, n)]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": srcs,
            "text": texts,
            "n_chars": [len(t) for t in texts],
        }
    )
    out = (
        source_stats(rd.from_pandas(df))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    exp = (
        df.assign(n_tokens=[len(t.split()) for t in texts])
        .groupby("source")
        .agg(
            n_docs=("doc_id", "size"),
            total_tokens=("n_tokens", "sum"),
            avg_chars=("n_chars", "mean"),
        )
        .reset_index()
    )
    assert (out["n_docs"].to_numpy() == exp["n_docs"].to_numpy()).all()
    assert (out["total_tokens"].to_numpy() == exp["total_tokens"].to_numpy()).all()
    assert np.allclose(out["avg_chars"], np.round(exp["avg_chars"], 6))


def _contam_brute(texts, mod=20):
    """Brute-force contamination: distinct word 3-grams (whole text if
    1-2 tokens), held-out = doc_id % mod == 0."""
    grams = {}
    for i, t in enumerate(texts):
        w = (t or "").split()
        if not w:
            g = set()
        elif len(w) < 3:
            g = {" ".join(w)}
        else:
            g = {" ".join(w[j : j + 3]) for j in range(len(w) - 2)}
        grams[i] = g
    test_vocab = set().union(*(grams[i] for i in grams if i % mod == 0))
    out = {}
    for i, g in grams.items():
        if i % mod == 0:
            continue
        n = len(g & test_vocab)
        if n:
            out[i] = n
    return out


def test_contamination_check_both_paths(ray_session):
    """Broadcast-membership and hash-join paths both equal brute force
    (short docs, empty docs, null text, overlapping grams)."""
    from pds_hw2_mpi_connected_components_ray.pipelines.clean import (
        contamination_check,
    )

    texts = []
    for i in range(60):
        if i % 7 == 0:
            texts.append("the quick brown fox jumps over the lazy dog")
        elif i % 7 == 1:
            texts.append("the quick brown cat sits still")
        elif i % 7 == 2:
            texts.append("two words")
        elif i % 7 == 3:
            texts.append("")
        elif i % 7 == 4:
            texts.append(None)
        else:
            texts.append(f"unique text of document number {i} nothing shared here")
    docs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
    ).repartition(4)
    want = _contam_brute(texts, mod=20)
    for force in (False, True):
        out = contamination_check(docs, test_mod=20, force_join=force).to_pandas()
        got = dict(
            zip(out["doc_id"].astype(int), out["n_shared"].astype(int))
        )
        assert got == want, (force, got, want)


# ---------------------------------------------------------------------------
# dedup_lines (corpus-level line scrub)
# ---------------------------------------------------------------------------


def _dl(texts, **kw):
    from pds_hw2_mpi_connected_components_ray.pipelines.clean import dedup_lines

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )
    return (
        dedup_lines(docs, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_dedup_lines_removes_cross_doc_boilerplate(ray_session):
    texts = [
        "HEADER\nunique alpha\nFOOTER",
        "HEADER\nunique beta\nFOOTER",
        "totally original document",
        "HEADER",  # doc that is ALL boilerplate
    ]
    out = _dl(texts)
    assert list(out["text"]) == ["unique alpha", "unique beta", "totally original document", ""]
    assert list(out["kept_lines"]) == [1, 1, 1, 0]
    assert list(out["total_lines"]) == [3, 3, 1, 1]


def test_dedup_lines_within_doc_repeat_kept(ray_session):
    # a line repeated inside ONE doc is not cross-doc boilerplate
    out = _dl(["same\nsame\nsame", "other text"])
    assert out.loc[0, "text"] == "same\nsame\nsame"
    assert out.loc[1, "text"] == "other text"


def test_dedup_lines_empty_and_null_docs(ray_session):
    # empty docs are one empty line; the empty line occurs in >=2 docs
    # so it is scrubbed everywhere (documented contract)
    out = _dl(["", None, "a\n\nb\n\nc", "x"])
    assert out.loc[0, "text"] == "" and out.loc[0, "total_lines"] == 1
    assert out.loc[1, "text"] == "" and out.loc[1, "kept_lines"] == 0
    assert out.loc[2, "text"] == "a\nb\nc"  # blank lines vanished
    assert out.loc[3, "text"] == "x"


def test_dedup_lines_join_path_matches_broadcast(ray_session):
    texts = [f"SHARED {i % 3}\nbody {i}\nSHARED tail" for i in range(40)] + [
        "SHARED tail"
    ]
    a = _dl(texts)
    b = _dl(texts, force_join=True)
    pd.testing.assert_frame_equal(
        a, b.astype(a.dtypes.to_dict()), check_like=True
    )


def test_neardup_contamination_cross_set_only(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import (
        neardup_contamination,
    )

    base = "the quick brown fox jumps over the lazy dog " * 6
    texts = {
        0: base,                      # test doc (id % 20 == 0)
        1: base + "tail!",            # train near-dup of 0 -> reported
        20: base + "tail!",           # test near-dup of 0/1: test-test pair dropped
        2: "completely different content here " * 8,
        3: "completely different content here " * 8 + "x",  # train-train pair dropped
    }
    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array(list(texts), dtype=np.int64),
                "text": list(texts.values()),
            }
        )
    )
    out = neardup_contamination(docs).to_pandas()
    got = {(int(r.test_doc_id), int(r.train_doc_id)) for r in out.itertuples()}
    # test ids are 0 and 20; train partners with jaccard >= 0.5
    assert got == {(0, 1), (20, 1)}
    assert (out["jaccard"] >= 0.5).all()


def test_quality_classifier_monotone_and_actor_state(ray_session):
    import math

    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import (
        QualityClassifierStage,
        quality_classifier,
    )

    texts = [
        "a a a a a a a a",                     # repetitive, low ttr
        "rich varied vocabulary with many distinct informative words",
        "",                                     # empty
    ]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )
    out = quality_classifier(docs).to_pandas().set_index("doc_id").sort_index()
    # varied text scores above the repetitive one
    assert out.loc[1, "score"] > out.loc[0, "score"]
    # brute-force one row against the planted weights
    w = QualityClassifierStage.W
    t = texts[1]
    L, T, Y = len(t), len(t.split()), len(set(t.split()))
    z = w[0] + w[1] * math.log(1 + L) + w[2] * math.log(1 + T) + w[3] * (Y / T)
    assert out.loc[1, "score"] == math.floor(1 / (1 + math.exp(-z)) * 1e6 + 0.5) / 1e6


def test_contamination_bloom_planted(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.clean import (
        contamination_bloom,
    )

    # test docs (id % 20 == 0): id 0 and 40 duplicate train docs, id 20
    # and 60 are unique -> 0/40 MUST flag (no false negatives ever)
    texts = {i: f"unique document number {i} with content" for i in range(80)}
    texts[0] = texts[7]  # exact dup of a train doc
    texts[40] = texts[13]
    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(80, dtype=np.int64),
                "text": [texts[i] for i in range(80)],
            }
        )
    ).repartition(3)
    out = contamination_bloom(docs, test_mod=20).to_pandas()
    got = dict(zip(out["doc_id"], out["flagged"]))
    assert set(got) == {0, 20, 40, 60}
    assert got[0] == 1 and got[40] == 1  # Bloom never misses a true dup
    # tiny filter (2^20 bits) over ~150 positions: false positives
    # possible in principle but astronomically unlikely here
    assert got[20] == 0 and got[60] == 0


def test_bloom_positions_overflow_safe():
    import numpy as np

    from pds_hw2_mpi_connected_components_ray.pipelines.clean import _bloom_positions

    fp = np.array([0, 1, (1 << 60) - 1, 2**31 - 2], dtype=np.int64)
    p1, p2 = _bloom_positions(fp, 1 << 20)
    assert (p1 >= 0).all() and (p1 < (1 << 20)).all()
    assert (p2 >= 0).all() and (p2 < (1 << 20)).all()
