"""Deduplication families over a documents table (doc_id, text, ...).

Every operator follows the same scale-safe shape:

    candidate generation (LSH band -> small-key groupby, NEVER all-pairs)
        -> distinct candidate pairs (a tiny table at any corpus size)
        -> exact verification (join candidates back to the corpus, compute
           the true similarity, filter by threshold)

so the final output is EXACT with respect to its similarity definition
(Jaccard / Hamming / cosine), with LSH only deciding which pairs get
verified. That is what makes the operators oracle-checkable: a DuckDB
all-pairs similarity query over the same corpus produces the same pair
set whenever LSH recall is 1.0 on the fixture's planted duplicates
(deterministic under fixed seeds; asserted by the driver gate and tests).

Operators:

- exact_dedup:            shuffle a 128-bit content hash (never the raw
                          text), groupby -> (keep_id, n_dups)
- minhash_lsh_pairs:      char-shingle MinHash banding -> exact char
                          k-shingle Jaccard verify
- ngram_jaccard_pairs:    word-n-gram MinHash banding -> exact word
                          n-gram Jaccard verify
- simhash_pairs:          64-bit SimHash, banded buckets -> vectorized
                          Hamming verify (optional exact-Jaccard verify)
- embedding_cosine_pairs: multi-table random-hyperplane LSH -> exact
                          cosine verify
- duplicate_groups:       pairs -> groups via the engine's own CC

Shuffle volume audit (per stage, at corpus scale): band rows are
(id, band, 8-byte key) -- no text, no signatures; candidate pairs are
ids only; the verify join ships text/vectors for CANDIDATES only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from ..context import default_parallelism, exchange_partitions
from ..functions.hashing import (
    band_keys_batch,
    hamming64_batch,
    hash_word_ngrams_batch,
    jaccard_pairs_from_table,
    minhash_params,
    minhash_sigs_batch,
    pack_char_shingles_batch,
    simhash64_batch,
)

_MASK63 = (1 << 63) - 1


def _pool(concurrency):
    """Actor-pool sizing: explicit int, else autoscale to the cluster
    (round 1 hardcoded concurrency=2 and starved 32-cpu boxes)."""
    if concurrency is not None:
        return concurrency
    return (1, max(2, default_parallelism()))


def _stage_map_batches(ds, cls, kwargs, concurrency, **mb_kwargs):
    """Cheap-setup stage execution: tasks when concurrency is None,
    a dedicated actor pool otherwise (policy + measurement in
    stages/stagepool.py)."""
    from ..stages.stagepool import stage_map_batches

    return stage_map_batches(
        ds, cls, kwargs, None if concurrency is None else _pool(concurrency), **mb_kwargs
    )


def _shingle_batch(texts, kind: str, k: int, n: int):
    if kind == "char":
        return pack_char_shingles_batch(texts, k)
    return hash_word_ngrams_batch(texts, n)


# ------------------------------------------------------------ exact dedup


def _md5_cols(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Two int64 columns holding the full 128-bit md5 of each text."""
    h1 = np.empty(len(texts), dtype=np.int64)
    h2 = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts.fillna("")):
        d = hashlib.md5(t.encode("utf-8")).digest()
        h1[i] = int.from_bytes(d[:8], "big", signed=True)
        h2[i] = int.from_bytes(d[8:], "big", signed=True)
    return h1, h2


def exact_dedup(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """(keep_id, n_dups) per distinct text: keep the smallest id.

    The shuffle key is the 128-bit content hash (two int64 columns), so
    at corpus scale full document bodies never enter the exchange --
    groupby(text) would ship every byte of the corpus. A 128-bit hash
    collision (~n^2/2^129) is negligible even at 10^12 documents.
    """

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        h1, h2 = _md5_cols(batch[text_col])
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(dtype=np.int64), "_h1": h1, "_h2": h2}
        )

    # bucketed exchange on hash(_h1), exact reduce inside each bucket
    # (lexsort by (h1, h2, id): group head = min id). Ray's keyed
    # sort-aggregate costs ~ms per group, and here groups = DISTINCT
    # DOCUMENTS -- data-proportional cardinality that is structurally
    # unusable at 10^12 docs (and dominated this wall at sf).
    from ..context import default_parallelism

    nb = max(8, default_parallelism())

    def add_bucket(t: pa.Table) -> pa.Table:
        h = t["_h1"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_kb", pa.array((h * np.int64(0x9E3779B9)) % nb, pa.int64())
        )

    def bucket_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e = pa.array([], pa.int64())
            return pa.table({"keep_id": e, "n_dups": e})
        h1 = t["_h1"].to_numpy(zero_copy_only=False)
        h2 = t["_h2"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h2, h1))
        h1s, h2s, idss = h1[order], h2[order], ids[order]
        new = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
        bounds = np.flatnonzero(new)
        cnt = np.diff(np.r_[bounds, len(idss)]).astype(np.int64)
        return pa.table({"keep_id": idss[bounds], "n_dups": cnt})

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(fp, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(bucket_reduce, batch_format="pyarrow")
    )


# Survivor-id sets at or below this row count broadcast as one sorted
# int64 array (40 MB at the gate) for a shuffle-free semi-join; above
# it the id set is no longer "small side" and the hash join runs.
_BROADCAST_KEEP_ROWS = 5_000_000


def exact_dedup_keep(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Rows of `docs` surviving exact dedup (min id per text wins).

    The survivor set is ids-only (bodies never move), so below the
    broadcast gate membership is a vectorized searchsorted inside one
    streaming pass over `docs` — no all-to-all; beyond the gate it
    falls back to the key-hash join (only then do doc bodies shuffle,
    and only once)."""
    keep = exact_dedup(docs, text_col, id_col).select_columns(["keep_id"]).materialize()
    from ..stages.joins import hash_join

    if keep.count() <= _BROADCAST_KEEP_ROWS:
        parts = [
            b["keep_id"].to_numpy(zero_copy_only=False)
            for b in keep.iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        ids = np.sort(np.concatenate(parts)) if parts else np.array([], dtype=np.int64)
        ref = ray.put(ids)

        def member(t: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            if len(ks) == 0:
                return t.slice(0, 0)
            v = t[id_col].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(ks, v), len(ks) - 1)
            return t.filter(pa.array(ks[pos] == v))

        return docs.map_batches(member, batch_format="pyarrow", zero_copy_batch=True)

    renamed = keep.map_batches(
        lambda t: t.rename_columns([id_col]), batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_join(docs, renamed, on=(id_col,))


# ----------------------------------------------- LSH candidate machinery


class _MinHashBandStage:
    """Actor-pool stage: text -> (doc_id, band_id, band_hash) rows.

    Hash parameters are built once per actor in __init__ (the
    map_batches(Cls, concurrency=...) pattern); the per-batch work is
    the vectorized shingle/minhash/band kernels from functions.hashing
    (one numpy pass per batch -- no per-shingle hashlib).
    Empty documents emit no rows (an empty set matches nothing).
    """

    def __init__(
        self,
        kind: str = "char",
        shingle_k: int = 5,
        ngram_n: int = 3,
        num_perm: int = 64,
        num_bands: int = 16,
        seed: int = 42,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.a, self.b = minhash_params(num_perm, seed)
        self.kind = kind
        self.k = shingle_k
        self.n = ngram_n
        self.num_bands = num_bands
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("").tolist()
        ids = batch[self.id_col].to_numpy(dtype=np.int64)
        vals, offs = _shingle_batch(texts, self.kind, self.k, self.n)
        nonempty = np.nonzero(np.diff(offs) > 0)[0]
        if len(nonempty) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "band_id": pd.Series([], dtype="int64"),
                    "band_hash": pd.Series([], dtype="int64"),
                }
            )
        sigs = minhash_sigs_batch(vals, offs, self.a, self.b)[nonempty]
        keys = band_keys_batch(sigs, self.num_bands)
        nb = self.num_bands
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids[nonempty], nb),
                "band_id": np.tile(np.arange(nb, dtype=np.int64), len(nonempty)),
                "band_hash": (keys.ravel() & np.uint64(_MASK63)).astype(np.int64),
            }
        )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """All candidate pairs (a < b) within one LSH bucket (ids only)."""
    ids = np.unique(g["doc_id"].to_numpy(dtype=np.int64))
    n = len(ids)
    if n < 2:
        return pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
        )
    ia, ib = np.triu_indices(n, k=1)
    return pd.DataFrame({"a": ids[ia], "b": ids[ib]})


_NUM_COARSE_BUCKETS = 64
# Target band rows per coarse bucket: the adaptive knob (ADVICE r2 --
# a FIXED bucket count means per-bucket volume grows O(n*bands/64) with
# the corpus; scaling the count with volume keeps each group's local
# sort + run-scan bounded and the shuffle fan-out proportional).
_COARSE_BUCKET_TARGET_ROWS = 500_000


def _coarse_bucket_count(n_band_rows: int) -> int:
    return max(_NUM_COARSE_BUCKETS, int(n_band_rows // _COARSE_BUCKET_TARGET_ROWS) + 1)


def _coarse_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs for ALL fine (band_id, band_hash) buckets inside
    one coarse hash bucket. Grouping Ray-side on the fine key directly
    creates ~(docs x bands) tiny groups and Ray's per-group overhead
    dominates (measured 8 s for 70k groups at sf0.1); grouping on
    band_hash % 64 keeps the shuffle coarse and the fine-bucket walk is
    a local sorted-run scan."""
    g = g.sort_values(["band_id", "band_hash", "doc_id"]).drop_duplicates(
        ["band_id", "band_hash", "doc_id"]
    )
    bi = g["band_id"].to_numpy(dtype=np.int64)
    bh = g["band_hash"].to_numpy(dtype=np.int64)
    ids = g["doc_id"].to_numpy(dtype=np.int64)
    if len(ids) < 2:
        return pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
        )
    new_run = np.r_[True, (bi[1:] != bi[:-1]) | (bh[1:] != bh[:-1])]
    starts = np.flatnonzero(new_run)
    lens = np.diff(np.r_[starts, len(ids)])
    outs_a: list[np.ndarray] = []
    outs_b: list[np.ndarray] = []
    for s, ln in zip(starts[lens > 1], lens[lens > 1]):
        run = ids[s : s + ln]
        ia, ib = np.triu_indices(ln, k=1)
        outs_a.append(run[ia])
        outs_b.append(run[ib])
    if not outs_a:
        return pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
        )
    return pd.DataFrame({"a": np.concatenate(outs_a), "b": np.concatenate(outs_b)})


def _lsh_bucket_candidates(
    sigs: Dataset, num_coarse: int = _NUM_COARSE_BUCKETS
) -> Dataset:
    """(doc_id, band_id, band_hash) rows -> candidate pairs.

    Pairs are UNIQUE within a coarse bucket but may repeat across
    coarse buckets (a pair agreeing in several bands); the repeat rate
    is small (~1.2x) and the final dedup runs on the tiny VERIFIED set
    instead -- shuffling the full candidate set once more just to dedup
    it pre-verify cost more than verifying the few duplicates."""

    def add_coarse(t: pa.Table) -> pa.Table:
        bh = t["band_hash"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_cb", pa.array((bh % num_coarse).astype(np.int64))
        )

    coarse = sigs.map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
    return coarse.groupby("_cb", num_partitions=min(num_coarse, exchange_partitions())).map_groups(
        _coarse_bucket_pairs, batch_format="pandas"
    )


# Verified-pair tables at or below this row count dedup in ONE partition;
# above it they hash-bucket shuffle first. "Post-verify output is tiny"
# is an assumption, not an invariant (ADVICE r2): a corpus with large
# near-duplicate FAMILIES (templated boilerplate above threshold that
# survives exact dedup) makes the verified set O(family^2).
_SMALL_PAIRS_ROWS = 200_000


def _dedup_small(pairs: Dataset, cols: list[str]) -> Dataset:
    """Dedup a verified pair table on (a, b), keeping `cols`.

    Small outputs: single-partition drop_duplicates (one tiny task).
    Large outputs: hash-bucket shuffle on a mixed int key + per-bucket
    vectorized drop_duplicates, bucket count scaled to the row count.
    A direct groupby((a, b)) creates one Ray group PER PAIR -- measured
    127 s for 195k pairs at sf0.1 vs ~1 s bucketed; same trick as
    stages.graph.dedup_edges."""

    def uniq(df: pd.DataFrame) -> pa.Table:
        # vectorized first-per-(a,b) via lexsort + boundary scan, Arrow
        # out (pandas drop_duplicates hashed per row and the pandas
        # block forced a block-manager round-trip downstream). The kept
        # representative may differ from drop_duplicates' first-in-
        # input-order one, but every metric column is a deterministic
        # function of the (a, b) pair, so representatives are equal.
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        if len(a) == 0:
            return pa.table(
                {c: pa.array(df[c].to_numpy()[:0]) for c in cols}
            )
        o = np.lexsort((b, a))
        sa, sb = a[o], b[o]
        first = np.r_[True, (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])]
        keep = o[first]
        return pa.table({c: pa.array(df[c].to_numpy()[keep]) for c in cols})

    pairs = pairs.materialize()
    n = pairs.count()
    if n <= _SMALL_PAIRS_ROWS:
        return pairs.repartition(1).map_batches(uniq, batch_format="pandas")

    num_buckets = max(64, n // _SMALL_PAIRS_ROWS * 8)

    def bucketize(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        mix = (a * np.int64(0x9E3779B9) + b) % np.int64(num_buckets)
        return t.append_column("_pb", pa.array(mix.astype(np.int64)))

    bucketed = pairs.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby(
        "_pb", num_partitions=min(num_buckets, 4 * exchange_partitions())
    ).map_groups(uniq, batch_format="pandas")


def _empty_pairs(extra: dict[str, str] | None = None) -> Dataset:
    import ray.data as rd

    cols = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    for name, typ in (extra or {}).items():
        cols[name] = pa.array([], pa.float64() if typ == "f" else pa.int64())
    return rd.from_arrow(pa.table(cols))


# Corpora below this row count take the broadcast verify path (collect
# (id, text) once, ray.put, zero-copy lookup per batch); larger corpora
# use the join path (only candidate documents' bytes move). Two hash
# joins of a ~200k-pair candidate set measured ~30 s of pure exchange
# overhead at bench scale -- the broadcast path does it in ~2 s.
_BROADCAST_VERIFY_ROWS = 200_000


def _attach_texts_broadcast(
    cands: Dataset, docs: Dataset, id_col: str, text_col: str
) -> Dataset:
    """Small-corpus fast path: broadcast the (id -> text) arrays once."""
    tab = docs.select_columns([id_col, text_col]).to_pandas()
    ids = tab[id_col].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    texts = tab[text_col].fillna("").to_numpy()[order]
    ref = ray.put((ids, texts))

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        lk_ids, lk_texts = ray.get(ref)
        out = batch.copy()
        for key, col in (("a", "text_a"), ("b", "text_b")):
            q = batch[key].to_numpy(dtype=np.int64)
            pos = np.searchsorted(lk_ids, q)
            out[col] = lk_texts[pos]
        return out

    return cands.map_batches(attach, batch_format="pandas")


def _join_texts(
    cands: Dataset, docs: Dataset, id_col: str, text_col: str
) -> Dataset:
    """Attach text_a/text_b to candidate pairs. Small corpus ->
    broadcast lookup (no shuffle); large corpus -> two hash joins where
    only CANDIDATE documents' bytes move, never the whole corpus."""
    from ..stages.joins import hash_join

    if docs.count() <= _BROADCAST_VERIFY_ROWS:
        return _attach_texts_broadcast(cands, docs, id_col, text_col)
    n = cands.count()
    npart = max(2, min(default_parallelism(), n // 500 + 1))
    side_a = docs.select_columns([id_col, text_col]).map_batches(
        lambda t: t.rename_columns(["a", "text_a"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    side_b = docs.select_columns([id_col, text_col]).map_batches(
        lambda t: t.rename_columns(["b", "text_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j = hash_join(cands, side_a, on=("a",), num_partitions=npart)
    return hash_join(j, side_b, on=("b",), num_partitions=npart)


def _broadcast_jaccard_verify(ref, threshold, keep_cols):
    """Stateless verify stage for the small-corpus path: the WHOLE
    corpus shingle table is built ONCE ON THE DRIVER and broadcast;
    each task reads it zero-copy from plasma and verifies each
    candidate pair by two index lookups + one sorted-merge
    intersection. (The naive formulation re-shingled both texts per
    candidate ROW — ~80x corpus re-shingling. The next version
    shingled per ACTOR in an actor pool's __init__ — better, but an
    autoscaling pool re-paid the ~seconds-long corpus shingle per
    spawned actor, and once init became a plasma read the actor
    processes themselves were pure spin-up cost, so this is a plain
    task-pool map_batches.)"""

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            out_cols = {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
            }
            for c in keep_cols:
                out_cols[c] = pd.Series([], dtype="int64")
            out_cols["jaccard"] = pd.Series([], dtype="float64")
            return pd.DataFrame(out_cols)
        ids, vals, offs = ray.get(ref)
        a = batch["a"].to_numpy(dtype=np.int64)
        b = batch["b"].to_numpy(dtype=np.int64)
        ia = np.searchsorted(ids, a)
        ib = np.searchsorted(ids, b)
        jac = jaccard_pairs_from_table(vals, offs, ia, ib)
        keep = jac >= threshold
        out = {"a": a[keep], "b": b[keep]}
        for c in keep_cols:
            out[c] = batch[c].to_numpy(dtype=np.int64)[keep]
        out["jaccard"] = jac[keep]
        return pd.DataFrame(out)

    return verify


def _verify_jaccard(
    cands: Dataset,
    docs: Dataset,
    *,
    kind: str,
    shingle_k: int,
    ngram_n: int,
    threshold: float,
    id_col: str,
    text_col: str,
    keep_cols: tuple[str, ...] = (),
) -> Dataset:
    """Exact-Jaccard verification of candidate pairs. Small corpus:
    broadcast (ids, texts) once, shingle once per actor, verify by
    index. Large corpus: join texts back per candidate and recompute
    shingle sets per batch (only candidate bytes move)."""
    if docs.count() <= _BROADCAST_VERIFY_ROWS:
        tab = docs.select_columns([id_col, text_col]).to_pandas()
        ids = tab[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        vals, offs = _shingle_batch(
            list(tab[text_col].fillna("").to_numpy()[order]), kind, shingle_k, ngram_n
        )
        ref = ray.put((ids[order], vals, offs))
        return cands.map_batches(
            _broadcast_jaccard_verify(ref, threshold, keep_cols),
            batch_format="pandas",
        )
    joined = _join_texts(cands, docs, id_col, text_col)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        m = len(batch)
        out_cols = {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
        for c in keep_cols:
            out_cols[c] = pd.Series([], dtype="int64")
        out_cols["jaccard"] = pd.Series([], dtype="float64")
        if m == 0:
            return pd.DataFrame(out_cols)
        texts = batch["text_a"].fillna("").tolist() + batch["text_b"].fillna("").tolist()
        vals, offs = _shingle_batch(texts, kind, shingle_k, ngram_n)
        jac = jaccard_pairs_from_table(
            vals, offs, np.arange(m), np.arange(m) + m
        )
        keep = jac >= threshold
        out = {
            "a": batch["a"].to_numpy(dtype=np.int64)[keep],
            "b": batch["b"].to_numpy(dtype=np.int64)[keep],
        }
        for c in keep_cols:
            out[c] = batch[c].to_numpy(dtype=np.int64)[keep]
        out["jaccard"] = jac[keep]
        return pd.DataFrame(out)

    return joined.map_batches(verify, batch_format="pandas")


def _lsh_jaccard_pairs(
    docs: Dataset,
    *,
    kind: str,
    shingle_k: int,
    ngram_n: int,
    num_perm: int,
    num_bands: int,
    threshold: float,
    concurrency,
    id_col: str,
    text_col: str,
) -> Dataset:
    sigs = _stage_map_batches(
        docs.select_columns([id_col, text_col]),
        _MinHashBandStage,
        {
            "kind": kind,
            "shingle_k": shingle_k,
            "ngram_n": ngram_n,
            "num_perm": num_perm,
            "num_bands": num_bands,
            "id_col": id_col,
            "text_col": text_col,
        },
        concurrency,
        batch_format="pandas",
    )
    cands = _lsh_bucket_candidates(
        sigs, num_coarse=_coarse_bucket_count(docs.count() * num_bands)
    ).materialize()
    if cands.count() == 0:
        return _empty_pairs({"jaccard": "f"})
    verified = _verify_jaccard(
        cands,
        docs,
        kind=kind,
        shingle_k=shingle_k,
        ngram_n=ngram_n,
        threshold=threshold,
        id_col=id_col,
        text_col=text_col,
    )
    return _dedup_small(verified, ["a", "b", "jaccard"])


def minhash_lsh_pairs(
    docs: Dataset,
    *,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
    concurrency=None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Near-duplicate pairs with EXACT char-k-shingle Jaccard >= threshold,
    candidates from MinHash LSH banding. Output (a, b, jaccard), a < b.

    Recall: a pair at true similarity s is caught with probability
    1-(1-s^r)^bands (r = num_perm/num_bands); at the defaults and
    s >= 0.9 the miss probability is < 1e-7 -- and deterministic under
    the fixed seed, so fixture results are stable.

    Scale note: a flood of IDENTICAL documents lands in one bucket and
    emits O(flood^2) candidate pairs -- run exact_dedup FIRST (the
    corpus_prep pipeline does; its 128-bit hash groupby collapses exact
    floods in linear work) so LSH only sees distinct texts.
    """
    return _lsh_jaccard_pairs(
        docs,
        kind="char",
        shingle_k=shingle_k,
        ngram_n=3,
        num_perm=num_perm,
        num_bands=num_bands,
        threshold=threshold,
        concurrency=concurrency,
        id_col=id_col,
        text_col=text_col,
    )


def ngram_jaccard_pairs(
    docs: Dataset,
    *,
    n: int = 3,
    threshold: float = 0.6,
    num_perm: int = 64,
    num_bands: int = 16,
    concurrency=None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Near-dup pairs with EXACT word-n-gram Jaccard >= threshold.

    Round 1 blocked on token count with an O(b^2) Python loop per block
    -- at corpus scale millions of docs share one token count (the
    VERDICT scale-killer). Now candidates come from MinHash banding over
    the word-n-gram sets (bounded buckets), and the exact Jaccard is
    computed only for candidates. Output (a, b, jaccard), a < b.
    """
    return _lsh_jaccard_pairs(
        docs,
        kind="word",
        shingle_k=5,
        ngram_n=n,
        num_perm=num_perm,
        num_bands=num_bands,
        threshold=threshold,
        concurrency=concurrency,
        id_col=id_col,
        text_col=text_col,
    )


# ----------------------------------------------------------------- simhash


class _SimHashStage:
    """Actor-pool stage: text -> (doc_id, band_id, band_key, simhash)."""

    def __init__(
        self,
        shingle_k: int = 5,
        num_bands: int = 16,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.k = shingle_k
        self.num_bands = num_bands
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("").tolist()
        ids = batch[self.id_col].to_numpy(dtype=np.int64)
        vals, offs = pack_char_shingles_batch(texts, self.k)
        # Empty docs emit no rows ("an empty set matches nothing",
        # matching _MinHashBandStage and the SQL oracle's length(text)>0
        # gate): all empties simhash to 0, collide in EVERY band, and
        # would flood one bucket with O(n_empty^2) candidate pairs.
        nonempty = np.nonzero(np.diff(offs) > 0)[0]
        if len(nonempty) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "band_id": pd.Series([], dtype="int64"),
                    "band_key": pd.Series([], dtype="int64"),
                    "simhash": pd.Series([], dtype="int64"),
                }
            )
        h = simhash64_batch(vals, offs)[nonempty]
        ids = ids[nonempty]
        nb = self.num_bands
        width = 64 // nb
        mask = np.uint64((1 << width) - 1)
        rows_key = np.empty((len(ids), nb), dtype=np.int64)
        for i in range(nb):
            rows_key[:, i] = ((h >> np.uint64(width * i)) & mask).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, nb),
                "band_id": np.tile(np.arange(nb, dtype=np.int64), len(ids)),
                "band_key": rows_key.ravel(),
                "simhash": np.repeat(h.astype(np.int64), nb),
            }
        )


def simhash_pairs(
    docs: Dataset,
    *,
    hamming_threshold: int = 8,
    shingle_k: int = 5,
    num_bands: int = 16,
    verify_threshold: float | None = None,
    concurrency=None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Near-dup pairs by SimHash. 64 bits banded into `num_bands` keys:
    any pair within Hamming distance num_bands-1 shares at least one
    band (pigeonhole), so recall is STRUCTURAL (not probabilistic) for
    hamming_threshold < num_bands. Hamming distances are verified
    vectorized (XOR + popcount table) inside each bucket.

    Output (a, b, hamming); with ``verify_threshold`` set, candidates
    are additionally verified by exact char-shingle Jaccard and the
    output becomes (a, b, hamming, jaccard) -- the oracle-checkable
    configuration (Jaccard is SQL-expressible, Hamming is not).
    """
    hashes = _stage_map_batches(
        docs.select_columns([id_col, text_col]),
        _SimHashStage,
        {
            "shingle_k": shingle_k,
            "num_bands": num_bands,
            "id_col": id_col,
            "text_col": text_col,
        },
        concurrency,
        batch_format="pandas",
    )

    def coarse_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # All fine (band_id, band_key) buckets inside one coarse bucket:
        # grouping Ray-side on the fine key directly creates many tiny
        # groups and Ray's per-group overhead dominates (the minhash path
        # measured 8 s for 70k groups and coarse-buckets for exactly this
        # reason, _coarse_bucket_pairs); here the fine-bucket walk is a
        # local sorted-run scan with vectorized XOR/popcount verify.
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
        g = g.sort_values(["band_id", "band_key", "doc_id"]).drop_duplicates(
            ["band_id", "band_key", "doc_id"]
        )
        if len(g) < 2:
            return empty
        bi = g["band_id"].to_numpy(dtype=np.int64)
        bk = g["band_key"].to_numpy(dtype=np.int64)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        hs = g["simhash"].to_numpy(dtype=np.int64).astype(np.uint64)
        new_run = np.r_[True, (bi[1:] != bi[:-1]) | (bk[1:] != bk[:-1])]
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.r_[starts, len(ids)])
        outs: list[pd.DataFrame] = []
        for s, ln in zip(starts[lens > 1], lens[lens > 1]):
            ia, ib = np.triu_indices(ln, k=1)
            ham = hamming64_batch(hs[s + ia], hs[s + ib])
            keep = ham <= hamming_threshold
            if keep.any():
                outs.append(
                    pd.DataFrame(
                        {
                            "a": ids[s + ia[keep]],
                            "b": ids[s + ib[keep]],
                            "hamming": ham[keep],
                        }
                    )
                )
        return pd.concat(outs, ignore_index=True) if outs else empty

    num_coarse = _coarse_bucket_count(docs.count() * num_bands)

    def add_coarse(t: pa.Table) -> pa.Table:
        bi = t["band_id"].to_numpy(zero_copy_only=False)
        bk = t["band_key"].to_numpy(zero_copy_only=False)
        cb = (bi * np.int64(1315423911) + bk * np.int64(2654435761)) % np.int64(
            num_coarse
        )
        return t.append_column("_cb", pa.array(cb.astype(np.int64)))

    pairs = hashes.map_batches(
        add_coarse, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(
        "_cb", num_partitions=min(num_coarse, exchange_partitions())
    ).map_groups(coarse_bucket, batch_format="pandas")
    # pair-dedup via an a-hash bucketed exchange (groups = candidate
    # pairs, data-proportional; Ray's keyed aggregate pays ~ms/group):
    # same (a, b) always co-locates when bucketed on a alone
    from ..context import default_parallelism as _dp

    nbk = max(8, _dp())

    def _bkt_a(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_kb", pa.array((a * np.int64(0x9E3779B9)) % nbk, pa.int64())
        )

    def _pair_min(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e = pa.array([], pa.int64())
            return pa.table({"a": e, "b": e, "hamming": e})
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        h = t["hamming"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, b, a))
        as_, bs, hs = a[order], b[order], h[order]
        new = np.r_[True, (as_[1:] != as_[:-1]) | (bs[1:] != bs[:-1])]
        bounds = np.flatnonzero(new)
        return pa.table({"a": as_[bounds], "b": bs[bounds], "hamming": hs[bounds]})

    dedup = (
        pairs.map_batches(_bkt_a, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(_pair_min, batch_format="pyarrow")
    )
    if verify_threshold is None:
        return dedup
    dedup = dedup.materialize()
    if dedup.count() == 0:
        return _empty_pairs({"hamming": "i", "jaccard": "f"})
    return _verify_jaccard(
        dedup,
        docs,
        kind="char",
        shingle_k=shingle_k,
        ngram_n=3,
        threshold=verify_threshold,
        id_col=id_col,
        text_col=text_col,
        keep_cols=("hamming",),
    )


# ---------------------------------------------------------- embedding LSH


class _PlaneLSHStage:
    """Actor-pool stage: embedding -> (vec_id, table_id, bucket) rows.

    `num_tables` independent hyperplane sets (OR-amplification, like
    MinHash bands): a pair at cosine s >= 0.99 is missed by one table
    with probability 1-(1-theta/pi)^planes ~ 0.1 and by ALL tables with
    ~1e-8 -- and identical vectors collide in every table structurally.
    The plane matrix is derived from the fixed seed ONCE PER ACTOR on
    first batch (round 1 regenerated it inside every batch) and bucket
    count scales as 2^num_planes -- pick num_planes ~ log2(n/64) so
    buckets stay bounded.
    """

    def __init__(
        self,
        num_tables: int = 8,
        num_planes: int = 12,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.num_tables = num_tables
        self.num_planes = num_planes
        self.seed = seed
        self.id_col = id_col
        self.vec_col = vec_col
        self.planes: np.ndarray | None = None  # built on first batch (needs dim)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch[self.vec_col].to_numpy()).astype(np.float64)
        if self.planes is None:
            rng = np.random.RandomState(self.seed)
            self.planes = rng.randn(vecs.shape[1], self.num_tables * self.num_planes)
        signs = (vecs @ self.planes) > 0  # (n, tables*planes)
        signs = signs.reshape(len(vecs), self.num_tables, self.num_planes)
        weights = 1 << np.arange(self.num_planes, dtype=np.int64)
        buckets = (signs * weights).sum(axis=2).astype(np.int64)  # (n, tables)
        ids = batch[self.id_col].to_numpy(dtype=np.int64)
        nt = self.num_tables
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, nt),
                "table_id": np.tile(np.arange(nt, dtype=np.int64), len(ids)),
                "bucket": buckets.ravel(),
            }
        )


def embedding_cosine_pairs(
    embeddings: Dataset,
    *,
    threshold: float = 0.9,
    num_tables: int = 8,
    num_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=None,
) -> Dataset:
    """Embedding near-dup pairs with EXACT cosine >= threshold; candidates
    from multi-table hyperplane LSH buckets. Output (a, b, cosine), a < b.
    Only candidate pairs' vectors are joined back and scored."""
    bucketed = _stage_map_batches(
        embeddings.select_columns([id_col, vec_col]),
        _PlaneLSHStage,
        {
            "num_tables": num_tables,
            "num_planes": num_planes,
            "seed": seed,
            "id_col": id_col,
            "vec_col": vec_col,
        },
        concurrency,
        batch_format="pandas",
    )
    buckets = bucketed.groupby(["table_id", "bucket"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    # pairs may repeat across tables; dedup happens on the tiny verified
    # set (see _lsh_bucket_candidates note)
    cands = buckets.materialize()
    if cands.count() == 0:
        return _empty_pairs({"cosine": "f"})

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                    "cosine": pd.Series([], dtype="float64"),
                }
            )
        va = np.stack([np.frombuffer(x, dtype=np.float64) for x in batch["vec_a"]])
        vb = np.stack([np.frombuffer(x, dtype=np.float64) for x in batch["vec_b"]])
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        cos = (va * vb).sum(axis=1) / (na * nb)
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "a": batch["a"].to_numpy(dtype=np.int64)[keep],
                "b": batch["b"].to_numpy(dtype=np.int64)[keep],
                "cosine": cos[keep],
            }
        )

    if embeddings.count() <= _BROADCAST_VERIFY_ROWS:
        # small corpus: broadcast the (id -> vector) arrays once
        tab = embeddings.select_columns([id_col, vec_col]).to_pandas()
        ids = tab[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.stack(tab[vec_col].to_numpy()[order]).astype(np.float64)
        ref = ray.put((ids, mat))

        def attach(batch: pd.DataFrame) -> pd.DataFrame:
            lk_ids, lk_mat = ray.get(ref)
            out = batch.copy()
            for key, col in (("a", "vec_a"), ("b", "vec_b")):
                q = batch[key].to_numpy(dtype=np.int64)
                pos = np.searchsorted(lk_ids, q)
                out[col] = [lk_mat[p].tobytes() for p in pos]
            return out

        return _dedup_small(
            cands.map_batches(attach, batch_format="pandas").map_batches(
                verify, batch_format="pandas"
            ),
            ["a", "b", "cosine"],
        )

    from ..stages.joins import hash_join

    n = cands.count()
    npart = max(2, min(default_parallelism(), n // 500 + 1))

    def vec_side(key: str, out: str):
        # acero joins reject list<double> payload columns -- ship the
        # vector as fixed-width float64 bytes instead
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
            return pd.DataFrame(
                {
                    key: batch[id_col].to_numpy(dtype=np.int64),
                    out: [v.tobytes() for v in vecs],
                }
            )

        return embeddings.select_columns([id_col, vec_col]).map_batches(
            fn, batch_format="pandas"
        )

    side_a = vec_side("a", "vec_a")
    side_b = vec_side("b", "vec_b")
    joined = hash_join(
        hash_join(cands, side_a, on=("a",), num_partitions=npart),
        side_b,
        on=("b",),
        num_partitions=npart,
    )
    return _dedup_small(
        joined.map_batches(verify, batch_format="pandas"), ["a", "b", "cosine"]
    )


# ------------------------------------------------------------ dup groups


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


def neardup_contamination(
    docs: Dataset,
    *,
    test_mod: int = 20,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    **lsh_kw,
) -> Dataset:
    """(test_doc_id, train_doc_id, jaccard): NEAR-duplicate benchmark
    contamination — train documents whose exact char-5-shingle Jaccard
    with a held-out doc (id % test_mod == 0, the contamination_check
    split) reaches `threshold`. The exact-n-gram contamination_check
    misses paraphrased/lightly-edited leaks; this is the fuzzy
    complement every eval-decontamination pipeline runs (e.g. GPT-3's
    13-gram + near-dup filtering).

    Implementation: the minhash_lsh_pairs plan verbatim (banded LSH
    candidates + EXACT Jaccard verify, so results stay oracle-equal)
    with a vectorized cross-set filter on the verified pairs — a
    same-set near-dup pair is dedup's business, not contamination's."""
    pairs = minhash_lsh_pairs(
        docs,
        threshold=threshold,
        id_col=id_col,
        text_col=text_col,
        **lsh_kw,
    )

    def cross(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        j = t["jaccard"].to_numpy(zero_copy_only=False)
        at = a % test_mod == 0
        bt = b % test_mod == 0
        keep = at != bt
        return pa.table(
            {
                "test_doc_id": np.where(at, a, b)[keep],
                "train_doc_id": np.where(at, b, a)[keep],
                "jaccard": j[keep],
            }
        )

    return pairs.map_batches(cross, batch_format="pyarrow", zero_copy_batch=True)


def dup_rate_by_source(docs: Dataset) -> Dataset:
    """(source, n_docs, n_distinct, dup_ratio): per-source exact-
    duplicate rate — which crawl slice ships boilerplate copies (the
    curation dashboard row next to quality_by_source). The shuffle key
    is (source, 128-bit md5) — document bodies never enter the
    exchange, the exact_dedup contract — and distinct counting is one
    keyed dedup + per-source count partials. dup_ratio = 1 −
    n_distinct/n_docs, rational → exact 1e-6."""
    from ray.data.aggregate import Count, Sum

    base = docs.select_columns(["source", "text"])

    def hash_partial(b: pd.DataFrame) -> pd.DataFrame:
        h1, h2 = _md5_cols(b["text"])
        return pd.DataFrame(
            {"source": b["source"].astype(str).to_numpy(), "h1": h1, "h2": h2}
        ).drop_duplicates()

    # distinct (source, hash) INSIDE h1-hash buckets (every copy of a
    # (source, h1, h2) triple co-locates), emitting per-source distinct
    # counts straight out of the bucket -- the keyed dedup aggregate at
    # per-source-distinct-document cardinality never runs
    from ..context import default_parallelism as _dp

    nbk = max(8, _dp())

    def _bkt_h(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            _kb=(b["h1"].to_numpy(dtype=np.int64) * np.int64(0x9E3779B9)) % nbk
        )

    def _bucket_distinct_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["source", "h1", "h2"])
        out = g.groupby("source", sort=False).size().reset_index(name="d")
        out["d"] = out["d"].astype(np.int64)
        return out[["source", "d"]]

    def count_partial(col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby("source", sort=False).size().reset_index(name=col)
            g[col] = g[col].astype(np.int64)
            return g

        return fn

    nd = (
        base.map_batches(hash_partial, batch_format="pandas")
        .map_batches(_bkt_h, batch_format="pandas")
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(_bucket_distinct_counts, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("d", alias_name="n_distinct"))
        .materialize()
    )
    nt = (
        base.select_columns(["source"])
        .map_batches(count_partial("t"), batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("t", alias_name="n_docs"))
        .materialize()
    )
    ddf = pd.concat(
        list(nd.iter_batches(batch_format="pandas", batch_size=None)),
        ignore_index=True,
    ).set_index("source")
    tdf = pd.concat(
        list(nt.iter_batches(batch_format="pandas", batch_size=None)),
        ignore_index=True,
    ).set_index("source")
    out = tdf.join(ddf).reset_index()
    n = out["n_docs"].to_numpy(dtype=np.int64)
    d = out["n_distinct"].to_numpy(dtype=np.int64)
    out["dup_ratio"] = np.floor((1.0 - d / n) * 1e6 + 0.5) / 1e6
    out["n_docs"] = n
    out["n_distinct"] = d
    import ray.data as rd

    return rd.from_pandas(out[["source", "n_docs", "n_distinct", "dup_ratio"]])
