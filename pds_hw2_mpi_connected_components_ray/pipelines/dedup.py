"""Deduplication families over a documents table (doc_id, text, ...).

Five operators, all deterministic (parallelism-invariant):

- exact_dedup:          groupby(text) -> keep min doc_id (hash-partition
                        the group key at scale; the shuffle key is the
                        content hash, never the raw text)
- minhash_lsh_pairs:    shingle -> minhash -> band -> bucket groupby ->
                        candidate pairs -> exact-Jaccard verify
- simhash_pairs:        64-bit simhash -> 4x16-bit band buckets ->
                        candidate pairs -> Hamming verify
- ngram_jaccard_pairs:  blocking on token count -> exact word-n-gram
                        Jaccard within block
- embedding_cosine_pairs: random-hyperplane LSH buckets -> brute cosine
                        within bucket (near-dup by embedding)

Candidate generation is always a groupby on a small derived key (band
hash / bucket id), never an all-pairs product; verification joins only
the candidate set. That keeps every stage shuffle-bounded at corpus
scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Min

from ..functions.hashing import (
    char_shingles,
    hamming64,
    minhash_bands,
    minhash_params,
    minhash_signature,
    simhash64,
    word_ngrams,
)
from ..functions.textstats import token_counts_series


def exact_dedup(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """(keep_id, n_dups) per distinct text: keep the smallest id."""
    agg = docs.select_columns([id_col, text_col]).groupby(text_col).aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups")
    )
    return agg.select_columns(["keep_id", "n_dups"])


def exact_dedup_keep(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Rows of `docs` surviving exact dedup (first == min id wins)."""
    keep = exact_dedup(docs, text_col, id_col).select_columns(["keep_id"])
    keep = keep.map_batches(
        lambda t: t.rename_columns([id_col]), batch_format="pyarrow", zero_copy_batch=True
    )
    from ..stages.joins import hash_join

    return hash_join(docs, keep, on=(id_col,))


class _MinHashStage:
    """Actor-pool stage: shingle + minhash + band keys per document.

    Stateful setup (hash parameters) happens once per actor in __init__
    -- the map_batches(Cls, concurrency=N) pattern (ST2-equivalent of
    the reference's loaded-once per-rank state, /root/reference/src/matrix.c:94).
    """

    def __init__(self, num_perm: int = 64, num_bands: int = 16, shingle_k: int = 5):
        self.a, self.b = minhash_params(num_perm)
        self.num_bands = num_bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands, bhash, sigs = [], [], [], []
        for did, text in zip(batch["doc_id"], batch["text"]):
            sh = char_shingles(text or "", self.shingle_k)
            sig = minhash_signature(sh, self.a, self.b)
            bk = minhash_bands(sig, self.num_bands)
            for i in range(self.num_bands):
                ids.append(did)
                bands.append(i)
                bhash.append(int(bk[i]) & ((1 << 63) - 1))
                sigs.append(sig.tobytes())
        return pd.DataFrame(
            {
                "doc_id": np.array(ids, dtype=np.int64),
                "band_id": np.array(bands, dtype=np.int64),
                "band_hash": np.array(bhash, dtype=np.int64),
                "sig": sigs,
            }
        )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """All candidate pairs (a<b) within one LSH bucket, with signatures."""
    g = g.sort_values("doc_id").drop_duplicates("doc_id")
    n = len(g)
    if n < 2:
        return pd.DataFrame({"a": [], "b": [], "sig_a": [], "sig_b": []})
    ids = g["doc_id"].to_numpy()
    sigs = g["sig"].tolist()
    ia, ib = np.triu_indices(n, k=1)
    return pd.DataFrame(
        {
            "a": ids[ia],
            "b": ids[ib],
            "sig_a": [sigs[i] for i in ia],
            "sig_b": [sigs[i] for i in ib],
        }
    )


def minhash_lsh_pairs(
    docs: Dataset,
    *,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
    concurrency: int = 2,
) -> Dataset:
    """Near-duplicate candidate pairs with estimated Jaccard >= threshold.

    Output: (a, b, est_jaccard) with a < b, deduped across bands.
    """
    sigs = docs.select_columns(["doc_id", "text"]).map_batches(
        _MinHashStage,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "num_bands": num_bands,
            "shingle_k": shingle_k,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )
    pairs = sigs.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
        est = [
            float(
                np.mean(
                    np.frombuffer(sa, dtype=np.uint64)
                    == np.frombuffer(sb, dtype=np.uint64)
                )
            )
            for sa, sb in zip(batch["sig_a"], batch["sig_b"])
        ]
        out = pd.DataFrame(
            {
                "a": batch["a"].to_numpy(dtype=np.int64),
                "b": batch["b"].to_numpy(dtype=np.int64),
                "est_jaccard": est,
            }
        )
        return out[out["est_jaccard"] >= threshold]

    verified = pairs.map_batches(verify, batch_format="pandas")
    # dedup pairs discovered in multiple bands: keep max estimate
    from ray.data.aggregate import Max

    return (
        verified.groupby(["a", "b"])
        .aggregate(Max("est_jaccard", alias_name="est_jaccard"))
    )


class _SimHashStage:
    def __init__(self, shingle_k: int = 5):
        self.shingle_k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_id, out_h = [], []
        for did, text in zip(batch["doc_id"], batch["text"]):
            sh = char_shingles(text or "", self.shingle_k)
            out_id.append(did)
            out_h.append(simhash64(sh))
        return pd.DataFrame(
            {"doc_id": np.array(out_id, dtype=np.int64), "simhash": np.array(out_h, dtype=np.uint64).astype(np.int64)}
        )


def simhash_pairs(
    docs: Dataset,
    *,
    hamming_threshold: int = 3,
    shingle_k: int = 5,
    concurrency: int = 2,
) -> Dataset:
    """Near-dup pairs by SimHash: band 64 bits into 4x16, bucket-join,
    verify Hamming distance <= threshold. Output (a, b, hamming)."""
    hashes = docs.select_columns(["doc_id", "text"]).map_batches(
        _SimHashStage,
        fn_constructor_kwargs={"shingle_k": shingle_k},
        batch_format="pandas",
        concurrency=concurrency,
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy().astype(np.uint64)
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        rows = []
        for band in range(4):
            key = ((h >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
            rows.append(
                pd.DataFrame(
                    {"band_id": band, "band_key": key, "doc_id": ids, "simhash": h.astype(np.int64)}
                )
            )
        return pd.concat(rows, ignore_index=True)

    exploded = hashes.map_batches(explode, batch_format="pandas")

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        n = len(g)
        if n < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        ia, ib = np.triu_indices(n, k=1)
        ham = np.array([hamming64(int(hs[i]), int(hs[j])) for i, j in zip(ia, ib)])
        keep = ham <= hamming_threshold
        return pd.DataFrame(
            {"a": ids[ia][keep], "b": ids[ib][keep], "hamming": ham[keep].astype(np.int64)}
        )

    pairs = exploded.groupby(["band_id", "band_key"]).map_groups(bucket, batch_format="pandas")
    from ray.data.aggregate import Min as _Min

    return pairs.groupby(["a", "b"]).aggregate(_Min("hamming", alias_name="hamming"))


def ngram_jaccard_pairs(
    docs: Dataset,
    *,
    n: int = 3,
    threshold: float = 0.6,
    block_width: int = 1,
) -> Dataset:
    """Exact word-n-gram Jaccard near-dup pairs, blocked on token count.

    Blocking rule: docs can only pair if their token counts fall in the
    same bucket of width `block_width` (near-dups preserve length).
    Output (a, b, jaccard). Exact within its blocking assumption.
    """

    def add_block(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[["doc_id", "text"]].copy()
        batch["block"] = (token_counts_series(batch["text"]) // block_width).astype(np.int64)
        return batch

    blocked = docs.map_batches(add_block, batch_format="pandas")

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "jaccard": []})
        ids = g["doc_id"].to_numpy()
        grams = [word_ngrams(t or "", n) for t in g["text"]]
        rows_a, rows_b, js = [], [], []
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                gi, gj = grams[i], grams[j]
                inter = np.intersect1d(gi, gj).size
                union = gi.size + gj.size - inter
                jac = inter / union if union else 1.0
                if jac >= threshold:
                    rows_a.append(ids[i])
                    rows_b.append(ids[j])
                    js.append(jac)
        return pd.DataFrame(
            {
                "a": np.array(rows_a, dtype=np.int64),
                "b": np.array(rows_b, dtype=np.int64),
                "jaccard": js,
            }
        )

    return blocked.groupby("block").map_groups(block_pairs, batch_format="pandas")


def duplicate_groups(pairs: Dataset, *, a_col: str = "a", b_col: str = "b") -> Dataset:
    """Collapse near-duplicate PAIRS into duplicate GROUPS via the
    engine's own connected components (pairs are edges; the canonical
    min-doc-id label is the group representative). Output:
    (doc_id, group_id) for every doc that appears in at least one pair.

    The standard MinHash-LSH dedup tail: pairs -> clusters -> keep one
    per cluster (keep = the doc where doc_id == group_id).
    """
    from ..stages.graph import canonical_edges
    from .cc import connected_components

    edges = pairs.map_batches(
        lambda t: pa.table(
            {
                "src": pa.compute.cast(t[a_col], pa.int64()),
                "dst": pa.compute.cast(t[b_col], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    res = connected_components(canonical_edges(edges))
    return res.labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "group_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def embedding_cosine_pairs(
    embeddings: Dataset,
    *,
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """Embedding near-dup pairs: random-hyperplane LSH bucket (the scale
    path -- each bucket holds ~n/2^planes vectors), then exact cosine
    within bucket. Output (a, b, cosine). Pairs split across buckets are
    missed with probability (1 - (angle/pi))^planes -- tiny at
    threshold ~0.95; raise num_planes tradeoff documented."""

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch[vec_col].to_numpy())
        dim = vecs.shape[1]
        rng = np.random.RandomState(seed)
        planes = rng.randn(dim, num_planes)
        signs = (vecs @ planes) > 0
        key = (signs * (1 << np.arange(num_planes))).sum(axis=1).astype(np.int64)
        return pd.DataFrame(
            {
                "bucket": key,
                id_col: batch[id_col].to_numpy(dtype=np.int64),
                vec_col: list(vecs),
            }
        )

    bucketed = embeddings.select_columns([id_col, vec_col]).map_batches(
        bucketize, batch_format="pandas"
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).drop_duplicates(id_col)
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        ids = g[id_col].to_numpy()
        vecs = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        vn = vecs / norms[:, None]
        sim = vn @ vn.T
        ia, ib = np.triu_indices(len(g), k=1)
        keep = sim[ia, ib] >= threshold
        return pd.DataFrame(
            {"a": ids[ia][keep], "b": ids[ib][keep], "cosine": sim[ia, ib][keep]}
        )

    return bucketed.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
