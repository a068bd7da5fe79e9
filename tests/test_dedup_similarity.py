"""Dedup families + similarity search on the planted near-dup corpus."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from fixtures.synth_pages import near_dup_documents
from pds_hw2_mpi_connected_components_ray.functions.hashing import (
    exact_jaccard,
    char_shingles,
)
from pds_hw2_mpi_connected_components_ray.pipelines.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    exact_dedup_keep,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
    kmeans_fit,
    knn_brute,
    knn_ivf,
)


@pytest.fixture(scope="module")
def corpus():
    tab = near_dup_documents()
    return tab, rd.from_arrow(tab).repartition(4)


def _planted_pairs(tab):
    """(exact_pairs, near_pairs) of doc_id pairs planted by the fixture."""
    df = tab.to_pandas()
    exact, near = set(), set()
    for b, grp in df.groupby(df["source"].str.extract(r"(\d+)$")[0]):
        base = grp[grp["source"].str.startswith("base")]
        ex = grp[grp["source"].str.startswith("exact")]
        ne = grp[grp["source"].str.startswith("near")]
        if len(base) and len(ex):
            exact.add((int(base["doc_id"].iloc[0]), int(ex["doc_id"].iloc[0])))
        if len(base) and len(ne):
            near.add((int(base["doc_id"].iloc[0]), int(ne["doc_id"].iloc[0])))
    return exact, near


def test_exact_dedup(corpus):
    tab, ds = corpus
    df = tab.to_pandas()
    out = exact_dedup(ds).to_pandas()
    want_groups = df.groupby("text")["doc_id"].agg(["min", "count"])
    assert len(out) == len(want_groups)
    got = dict(zip(out["keep_id"], out["n_dups"]))
    for _, row in want_groups.iterrows():
        assert got[row["min"]] == row["count"]
    kept = exact_dedup_keep(ds).to_pandas()
    assert sorted(kept["doc_id"]) == sorted(want_groups["min"])


def test_minhash_lsh_finds_planted_dups(corpus):
    tab, ds = corpus
    exact, near = _planted_pairs(tab)
    pairs = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    # every exact pair is found with exact (verified) jaccard 1.0
    for p in exact:
        assert p in got
    jac = dict(zip(zip(pairs["a"], pairs["b"]), pairs["jaccard"]))
    for p in exact:
        assert jac[p] == 1.0
    # most near pairs found (minhash is probabilistic but deterministic here)
    found_near = sum(1 for p in near if p in got)
    assert found_near >= len(near) * 0.7


def test_minhash_deterministic(corpus):
    _, ds = corpus
    p1 = minhash_lsh_pairs(ds).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    p2 = minhash_lsh_pairs(ds.repartition(2)).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(p1, p2)


def test_simhash_finds_exact_dups(corpus):
    tab, ds = corpus
    exact, near = _planted_pairs(tab)
    pairs = simhash_pairs(ds, hamming_threshold=6).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    for p in exact:
        assert p in got
    ham = dict(zip(zip(pairs["a"], pairs["b"]), pairs["hamming"]))
    for p in exact:
        assert ham[p] == 0


def test_ngram_jaccard_pairs(corpus):
    tab, ds = corpus
    exact, near = _planted_pairs(tab)
    pairs = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    for p in exact:
        assert p in got
    # near dups (3 of 60 words changed) stay above 0.5 trigram jaccard
    found_near = sum(1 for p in near if p in got)
    assert found_near >= len(near) * 0.9
    # verify one reported jaccard against brute force
    df = tab.to_pandas().set_index("doc_id")
    from pds_hw2_mpi_connected_components_ray.functions.hashing import word_ngrams

    a, b = next(iter(exact))
    row = pairs[(pairs["a"] == a) & (pairs["b"] == b)].iloc[0]
    want = exact_jaccard(word_ngrams(df.loc[a, "text"]), word_ngrams(df.loc[b, "text"]))
    assert abs(row["jaccard"] - want) < 1e-12


def _toy_embeddings(n=64, d=16, seed=5):
    rng = np.random.RandomState(seed)
    base = rng.randn(n, d)
    # plant near-dups: vector i+n/2 = vector i + tiny noise for first 8
    for i in range(8):
        base[n // 2 + i] = base[i] + 0.001 * rng.randn(d)
    import pyarrow as pa

    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in base]),
            "label": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )
    return base, rd.from_arrow(tab).repartition(4)


def test_embedding_cosine_pairs_finds_planted():
    base, ds = _toy_embeddings()
    pairs = embedding_cosine_pairs(ds, threshold=0.999).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    found = sum(1 for i in range(8) if (i, 32 + i) in got)
    assert found >= 6  # LSH may split a pair across buckets, rarely


def test_knn_brute_exact():
    base, ds = _toy_embeddings()
    qids = np.array([0, 1, 2])
    out = knn_brute(ds, qids, base[qids], k=3)
    # brute-force numpy oracle
    vn = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = vn[qids] @ vn.T
    for qi, q in enumerate(qids):
        s = sims[qi].copy()
        s[q] = -np.inf
        want = set(np.argsort(-s)[:3].tolist())
        got = set(out[out["query_id"] == q]["neighbor_id"].tolist())
        assert got == want
    # planted near-dup is rank 1
    assert out[(out["query_id"] == 0) & (out["rank"] == 1)]["neighbor_id"].iloc[0] == 32


def test_knn_ivf_recall():
    base, ds = _toy_embeddings(n=128, d=16)
    qids = np.arange(8)
    brute = knn_brute(ds, qids, base[qids], k=3)
    approx = knn_ivf(ds, qids, base[qids], k=3, nlist=8, nprobe=4)
    # recall@3 over the probed queries should be high
    hits = 0
    total = 0
    for q in qids:
        want = set(brute[brute["query_id"] == q]["neighbor_id"])
        got = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.6


def test_kmeans_deterministic():
    rng = np.random.RandomState(0)
    x = rng.randn(100, 8)
    c1 = kmeans_fit(x, 4)
    c2 = kmeans_fit(x, 4)
    assert np.array_equal(c1, c2)


def test_ivf_persisted_index(tmp_path):
    """Build a list-partitioned on-disk IVF index; full probe == brute;
    partial probe reads only the probed partitions and keeps recall."""
    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
        ivf_build,
        ivf_load,
        knn_ivf_indexed,
    )

    base, ds = _toy_embeddings(n=128, d=16)
    qids = np.arange(6)
    idx = ivf_build(ds, str(tmp_path / "ivf"), nlist=8)
    # reload round-trip
    idx = ivf_load(str(tmp_path / "ivf"))
    full = knn_ivf_indexed(idx, qids, base[qids], k=3, nprobe=8)
    brute = knn_brute(ds, qids, base[qids], k=3)
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), brute.reset_index(drop=True)
    )
    part = knn_ivf_indexed(idx, qids, base[qids], k=3, nprobe=4)
    hits = total = 0
    for q in qids:
        want = set(brute[brute["query_id"] == q]["neighbor_id"])
        got = set(part[part["query_id"] == q]["neighbor_id"])
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.6


def test_corpus_prep_chain(corpus):
    """quality gate -> exact dedup -> near-dup collapse: survivors are
    the base docs (exact copies and near copies collapse into their
    base's group; the group representative is the min doc_id = base)."""
    from pds_hw2_mpi_connected_components_ray.pipelines.prep import corpus_prep

    tab, ds = corpus
    exact, near = _planted_pairs(tab)
    out = corpus_prep(ds, min_tokens=5, max_punct_ratio=0.2).to_pandas()
    kept = set(out["doc_id"])
    df = tab.to_pandas()
    # every base doc survives; every exact copy is gone
    for a, b in exact:
        assert a in kept and b not in kept
    # near copies (>= 0.5 char-shingle jaccard to base) are collapsed too
    dropped_near = sum(1 for _, b in near if b not in kept)
    assert dropped_near >= len(near) * 0.9
    # nothing outside planted dup families was dropped
    dup_ids = {b for _, b in exact} | {b for _, b in near}
    assert set(df["doc_id"]) - dup_ids - kept == set()


def test_lsh_bucket_sizes_bounded(corpus):
    """Candidate volume must stay far below all-pairs on a corpus with
    heavy vocabulary sharing (every doc drawn from a 200-word vocab)."""
    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import (
        _MinHashBandStage,
        _lsh_bucket_candidates,
        _pool,
    )

    _, ds = corpus
    n_docs = ds.count()
    sigs = ds.map_batches(
        _MinHashBandStage,
        fn_constructor_kwargs={"kind": "char"},
        batch_format="pandas",
        concurrency=_pool(2),
    )
    cands = _lsh_bucket_candidates(sigs).to_pandas().drop_duplicates(["a", "b"])
    all_pairs = n_docs * (n_docs - 1) / 2
    # planted dup families only -- nowhere near quadratic
    assert len(cands) < 0.05 * all_pairs, (len(cands), all_pairs)


def test_corpus_prep_identical_doc_flood():
    """An adversarial flood of identical documents must collapse in the
    EXACT-dedup stage (128-bit hash groupby), never reaching the LSH
    stage as a quadratic bucket -- the reason corpus_prep orders exact
    dedup before near-dup detection."""
    import pyarrow as pa

    from pds_hw2_mpi_connected_components_ray.pipelines.prep import corpus_prep

    n = 500
    rng = np.random.RandomState(9)
    vocab = [f"tok{j:03d}" for j in range(300)]
    uniques = [
        " ".join(rng.choice(vocab, size=12, replace=False)) for _ in range(20)
    ]
    texts = ["the same exact boilerplate document body repeated verbatim"] * n + uniques
    tab = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = corpus_prep(rd.from_arrow(tab).repartition(4), min_tokens=3).to_pandas()
    kept = set(out["doc_id"])
    assert 0 in kept  # one representative of the flood survives
    assert len(kept & set(range(n))) == 1  # exactly one
    assert set(range(n, n + 20)) <= kept  # unique docs all survive


def test_simhash_skips_empty_docs():
    """Empty/null texts emit NO band rows (ADVICE r2): all empties
    simhash to 0, collide in every band, and would both flood one
    bucket O(n_empty^2) and emit pairs the length(text)>0 oracle gate
    excludes."""
    import pyarrow as pa

    texts = ["", None, "", "a real document body with plenty of text here"]
    tab = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = simhash_pairs(rd.from_arrow(tab), hamming_threshold=8).to_pandas()
    assert len(out) == 0  # no empty-vs-empty pairs


def test_char_shingles_window_code_points():
    """Char shingles window over CODE POINTS like the oracle's substr()
    (round 2 windowed over UTF-8 bytes; ADVICE r2). Identical non-ASCII
    texts must reach Jaccard 1.0 and k-char semantics must count
    characters, not bytes."""
    from pds_hw2_mpi_connected_components_ray.functions.hashing import (
        jaccard_pairs_from_table,
        pack_char_shingles_batch,
    )

    # 3-char Greek text with k=3: exactly ONE shingle (byte-windowing
    # would see 6 bytes -> 4 shingles)
    vals, offs = pack_char_shingles_batch(["και"], 3)
    assert offs[1] - offs[0] == 1

    # identical Greek docs -> jaccard 1.0; one-char-changed -> < 1.0;
    # and a shingle shared between an ASCII and a mixed doc matches
    texts = ["αβγδεζη", "αβγδεζη", "abcde", "xxαβγδεζηabcdeyy"]
    vals, offs = pack_char_shingles_batch(texts, 5)
    jac = jaccard_pairs_from_table(
        vals, offs, np.array([0, 2]), np.array([1, 3])
    )
    assert jac[0] == 1.0
    assert 0 < jac[1] < 1.0
    s_ascii = set(vals[offs[2] : offs[3]].tolist())
    s_mixed = set(vals[offs[3] : offs[4]].tolist())
    assert s_ascii & s_mixed  # 'abcde' maps to the same value in both


def test_minhash_non_ascii_dups():
    """End-to-end: planted non-ASCII near-dups are found with the same
    recall as ASCII ones (the round-2 byte-windowing silently depended
    on fixtures being ASCII-only)."""
    import pyarrow as pa

    rng = np.random.RandomState(11)
    vocab = [f"λέξη{j:02d}" for j in range(50)] + [f"wörter{j:02d}" for j in range(50)]
    bases = [" ".join(rng.choice(vocab, size=30, replace=False)) for _ in range(10)]
    texts = []
    for b in bases:
        texts.append(b)
        texts.append(b + " επιπλέον")  # near-dup: tiny suffix
    tab = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = minhash_lsh_pairs(
        rd.from_arrow(tab).repartition(2), threshold=0.5
    ).to_pandas()
    got = set(zip(out["a"], out["b"]))
    want = {(2 * i, 2 * i + 1) for i in range(10)}
    assert want <= got


def test_ivf_build_atomic_lifecycle(tmp_path):
    """Build publishes atomically: manifest + _SUCCESS written last,
    partial state refuses to load, rebuild replaces in place."""
    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
        ivf_build,
        ivf_load,
    )

    base, ds = _toy_embeddings(n=96, d=8)
    root = str(tmp_path / "idx")
    idx = ivf_build(ds, root, nlist=6)
    assert os.path.exists(os.path.join(root, "_SUCCESS"))
    assert not os.path.exists(root + ".tmp")  # tmp dir consumed by rename
    loaded = ivf_load(root)
    m = loaded.manifest
    assert m["nlist"] == 6 and m["dims"] == 8 and m["n_vectors"] == 96
    assert sum(m["list_counts"].values()) == 96
    assert np.array_equal(loaded.centroids, idx.centroids)
    # a missing _SUCCESS (interrupted build) refuses to load
    os.remove(os.path.join(root, "_SUCCESS"))
    with pytest.raises(FileNotFoundError, match="_SUCCESS"):
        ivf_load(root)
    # rebuild over the broken state publishes a fresh complete index
    ivf_build(ds, root, nlist=6)
    assert ivf_load(root).manifest["n_vectors"] == 96


def test_ivf_recall_vs_nprobe_sweep(tmp_path):
    """Documented recall curve: recall@k is non-decreasing in nprobe
    (modulo its plateau) and exact at nprobe == nlist."""
    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
        ivf_build,
        knn_ivf_indexed,
    )

    base, ds = _toy_embeddings(n=160, d=16, seed=11)
    qids = np.arange(10)
    brute = knn_brute(ds, qids, base[qids], k=3)
    want = {q: set(brute[brute["query_id"] == q]["neighbor_id"]) for q in qids}
    idx = ivf_build(ds, str(tmp_path / "sweep"), nlist=8)
    recalls = []
    for nprobe in (1, 2, 4, 8):
        got = knn_ivf_indexed(idx, qids, base[qids], k=3, nprobe=nprobe)
        hits = sum(
            len(want[q] & set(got[got["query_id"] == q]["neighbor_id"])) for q in qids
        )
        recalls.append(hits / sum(len(want[q]) for q in qids))
    # non-decreasing within noise; full probe is exact
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:])), recalls
    assert recalls[-1] == 1.0, recalls
    assert recalls[0] >= 0.3, recalls


def test_dup_rate_by_source_planted(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import (
        dup_rate_by_source,
    )

    # source 'copy' has 10 docs, only 2 distinct texts; 'fresh' all unique
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(16, dtype=np.int64),
            "source": ["copy"] * 10 + ["fresh"] * 6,
            "text": ["boiler A"] * 6 + ["boiler B"] * 4
            + [f"unique {i}" for i in range(6)],
        }
    )
    ds = rd.from_pandas([docs.iloc[i::3] for i in range(3)])
    out = dup_rate_by_source(ds).to_pandas().set_index("source")
    assert out.loc["copy", "n_docs"] == 10
    assert out.loc["copy", "n_distinct"] == 2
    assert out.loc["copy", "dup_ratio"] == np.floor((1.0 - 2 / 10) * 1e6 + 0.5) / 1e6
    assert out.loc["fresh", "n_distinct"] == 6
    assert out.loc["fresh", "dup_ratio"] == 0.0


def _clustered_embeddings(nclusters=40, per=30, d=16, seed=9):
    """Well-separated unit clusters so partial-probe recall is
    structurally high (neighbors co-reside in one inverted list)."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(nclusters, d)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, per, axis=0) + 0.05 * rng.randn(nclusters * per, d)
    import pyarrow as pa

    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(len(pts), dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in pts]),
        }
    )
    return pts, rd.from_arrow(tab).repartition(4)


def test_ivf_distributed_fit_recall_at_scale_nlist(tmp_path):
    """VERDICT r3 item 7: distributed full-corpus centroid fit +
    nlist > 16, partial probe keeps high recall@k."""
    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
        ivf_build,
        ivf_load,
        knn_brute,
        knn_ivf_indexed,
    )

    base, ds = _clustered_embeddings()
    qids = np.arange(0, 1200, 120)
    idx = ivf_build(ds, str(tmp_path / "ivf32"), nlist=32, fit="distributed")
    idx = ivf_load(str(tmp_path / "ivf32"))
    assert idx.manifest["nlist"] == 32
    brute = knn_brute(ds, qids, base[qids], k=5)
    part = knn_ivf_indexed(idx, qids, base[qids], k=5, nprobe=4)
    hits = total = 0
    for q in qids:
        want = set(brute[brute["query_id"] == q]["neighbor_id"])
        got = set(part[part["query_id"] == q]["neighbor_id"])
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.9


def test_ivf_default_nlist_sqrt(tmp_path):
    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
        default_nlist,
        ivf_build,
        ivf_load,
    )

    assert default_nlist(1_000_000) == 1000
    assert default_nlist(100) == 16  # clamped floor
    base, ds = _clustered_embeddings(nclusters=30, per=40)  # n=1200 -> 35
    ivf_build(ds, str(tmp_path / "ivfauto"))
    m = ivf_load(str(tmp_path / "ivfauto")).manifest
    assert m["nlist"] == default_nlist(1200) == 35
    assert m["n_vectors"] == 1200


def test_distributed_fit_deterministic():
    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
        kmeans_fit_distributed,
    )

    _, ds = _clustered_embeddings(nclusters=10, per=20)
    c1 = kmeans_fit_distributed(ds, 10, iters=4)
    # same partitioning -> bit-identical (deterministic partial reduce)
    c2 = kmeans_fit_distributed(ds, 10, iters=4)
    assert np.array_equal(c1, c2)
    # different partitioning -> partials regroup, float association
    # shifts ~ulps; must stay numerically identical within tolerance
    c3 = kmeans_fit_distributed(ds.repartition(7), 10, iters=4)
    assert np.allclose(c1, c3, rtol=1e-9, atol=1e-12)
