"""Text-cleaning operators for corpus curation: PII scrubbing and
per-source (domain-level) corpus statistics.

`scrub_pii` redacts emails and US-style phone numbers — the standard
pre-training privacy pass. Fully vectorized (pandas str kernels over
compiled regexes, one pass per pattern per batch, no per-row Python);
the patterns are RE2-compatible on purpose so the DuckDB oracle
(`regexp_replace(..., 'g')` / `regexp_extract_all`) mirrors the exact
replacement semantics. Redaction order is fixed (emails first, then
phones) and both sides apply it identically — order matters because a
digit run inside an email local-part must not be double-redacted.

`source_stats` is the domain-aggregation pass a web corpus needs for
blocklist/quality decisions: one groupby over the source vocabulary
(bounded cardinality), partial-aggregated per batch by Ray Data's
hash aggregate — no skew concern beyond the groupby itself.

No reference analogue (north-rule training-data extension).
"""

from __future__ import annotations

from ..context import exchange_partitions

import numpy as np
import pandas as pd

from ray.data import Dataset
from ray.data.aggregate import Count, Mean, Sum

# RE2-safe (no lookarounds/backrefs): both python `re` and DuckDB RE2
# compile these with identical match semantics.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}[-. ]\d{3}[-. ]\d{4}"
EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def scrub_pii(docs: Dataset, *, text_col: str = "text") -> Dataset:
    """(doc_id, clean_text, n_emails, n_phones): emails then phone
    numbers replaced by redaction tokens; counts = matches replaced."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].fillna("").astype(str)
        n_emails = t.str.count(EMAIL_RE).astype(np.int64)
        t = t.str.replace(EMAIL_RE, EMAIL_TOKEN, regex=True)
        n_phones = t.str.count(PHONE_RE).astype(np.int64)
        t = t.str.replace(PHONE_RE, PHONE_TOKEN, regex=True)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "clean_text": t,
                "n_emails": n_emails,
                "n_phones": n_phones,
            }
        )

    return docs.select_columns(["doc_id", text_col]).map_batches(
        fn, batch_format="pandas"
    )


def _doc_grams(df: pd.DataFrame) -> pd.DataFrame:
    """Distinct word 3-grams per document -> (doc_id, g) rows.

    Same gram semantics as the ngram-jaccard dedup oracle: whitespace
    tokens; docs with 1-2 tokens contribute their whole text as one
    gram; empty docs contribute nothing. Vectorized over the batch's
    flattened token stream with cross-document positions masked (the
    top_bigrams trick, widened to 3)."""
    toks = df["text"].fillna("").astype(str).str.split()
    lens = toks.str.len().to_numpy(dtype=np.int64)
    ids = df["doc_id"].to_numpy(dtype=np.int64)
    out_ids: list[np.ndarray] = []
    out_g: list[np.ndarray] = []
    short = (lens > 0) & (lens < 3)
    if short.any():
        out_ids.append(ids[short])
        out_g.append(toks[short].str.join(" ").to_numpy(dtype=object))
    if (lens >= 3).any():
        flat = np.concatenate(
            [np.asarray(x, dtype=object) for x in toks.to_numpy() if len(x)]
        ).astype(str)
        docpos = np.repeat(ids, lens)
        valid = docpos[:-2] == docpos[2:]
        g3 = np.char.add(
            np.char.add(np.char.add(np.char.add(flat[:-2], " "), flat[1:-1]), " "),
            flat[2:],
        )[valid]
        out_ids.append(docpos[:-2][valid])
        out_g.append(g3.astype(object))
    if not out_ids:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "g": pd.Series([], dtype=str)}
        )
    return pd.DataFrame(
        {"doc_id": np.concatenate(out_ids), "g": np.concatenate(out_g)}
    ).drop_duplicates(["doc_id", "g"])


_BROADCAST_TEST_GRAMS = 2_000_000  # ~small benchmark sets broadcast


def contamination_check(
    docs: Dataset, *, test_mod: int = 20, force_join: bool = False
) -> Dataset:
    """(doc_id, n_shared): train documents sharing at least one word
    3-gram with the held-out set (doc_id % test_mod == 0) and how many
    distinct grams they share -- the benchmark-contamination pass a
    training corpus needs before evaluation claims.

    Scale posture: two column-pruned corpus passes (the held-out side
    is read with its filter pushed into the scan, so the typically-tiny
    benchmark set never expands the full corpus's grams twice). The
    held-out gram vocabulary is counted first: below the broadcast
    threshold it ships once via ray.put and train batches membership-
    test with a sorted-array searchsorted (no shuffle); above it the
    op falls back to a gram-keyed hash-shuffle join. Both paths end in
    one doc_id-keyed groupby-count."""
    import pyarrow as pa

    import ray

    from ..stages.joins import hash_join

    base = docs.select_columns(["doc_id", "text"])

    # no pc.modulo kernel in pyarrow -- numpy mask, zero-copy ints
    def _is_test(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % test_mod == 0))

    def _is_train(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % test_mod != 0))

    # distinct held-out grams via the string-hash bucket exchange --
    # a direct groupby("g") pays Ray's string-sort keyed aggregate
    # (~ms per DISTINCT gram; see duplicate_ngram_stats note)
    from .events import _bucket_by_key

    def _bucket_uniq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": df["g"].unique().astype(str)})

    test_grams = (
        _bucket_by_key(
            base.map_batches(_is_test, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(_doc_grams, batch_format="pandas"),
            "g",
            ["g"],
        )
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(_bucket_uniq, batch_format="pandas")
    ).materialize()  # benchmark-set vocabulary: the provably small side
    train_grams = base.map_batches(
        _is_train, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(_doc_grams, batch_format="pandas")

    n_test = test_grams.count()
    if n_test <= _BROADCAST_TEST_GRAMS and not force_join:
        vocab = np.sort(
            np.concatenate(
                [
                    b["g"].to_numpy(zero_copy_only=False).astype(str)
                    for b in test_grams.iter_batches(
                        batch_format="pyarrow", batch_size=None
                    )
                ]
            )
            if n_test
            else [np.array([], dtype=str)]
        )
        ref = ray.put(vocab)

        def member(df: pd.DataFrame) -> pd.DataFrame:
            v = ray.get(ref)
            g = df["g"].to_numpy(dtype=str)
            if len(v) == 0 or len(g) == 0:
                return df.iloc[:0][["doc_id"]]
            pos = np.minimum(np.searchsorted(v, g), len(v) - 1)
            return df.loc[v[pos] == g, ["doc_id"]]

        hits = train_grams.map_batches(member, batch_format="pandas")
    else:
        hits = hash_join(train_grams, test_grams, on=("g",)).select_columns(
            ["doc_id"]
        )
    # per-doc count via the bucketed exchange: groups = contaminated
    # documents (data-proportional; see stages/skew.py on Ray's
    # ms-per-group keyed-aggregate reduce)
    from ..stages.skew import bucketed_group_reduce

    return bucketed_group_reduce(hits, "doc_id", "n_shared", "count")


def source_stats(docs: Dataset) -> Dataset:
    """(source, n_docs, total_tokens, avg_chars): per-domain corpus
    profile. Token definition matches textpipe.doc_stats (whitespace)."""
    from ..functions.textstats import token_counts_series

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("").astype(str)
        return pd.DataFrame(
            {
                "source": df["source"].astype(str),
                "n_tokens": token_counts_series(t),
                "n_chars": df["n_chars"].astype(np.int64),
            }
        )

    per = docs.select_columns(["source", "text", "n_chars"]).map_batches(
        per_doc, batch_format="pandas"
    )
    agg = per.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="total_tokens"),
        Mean("n_chars", alias_name="avg_chars"),
    )

    def round6(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["avg_chars"] = np.round(df["avg_chars"].to_numpy(dtype=np.float64), 6)
        df["n_docs"] = df["n_docs"].astype(np.int64)
        df["total_tokens"] = df["total_tokens"].astype(np.int64)
        return df

    return agg.map_batches(round6, batch_format="pandas")


def duplicate_ngram_stats(docs: Dataset, *, force_join: bool = False) -> Dataset:
    """(doc_id, n_grams, shared_grams, dup_gram_frac): per-document
    repeated-span statistics — the fraction of a document's DISTINCT
    word 3-grams that appear in at least one OTHER document (the
    gram-level "how much of this page is boilerplate shared across the
    corpus" signal behind span-level training-data dedup, Lee et al.).

    Gram semantics are `_doc_grams` — identical to contamination_check
    and the ngram-dedup oracle (whitespace tokens, 1-2-token docs
    contribute their whole text, empty docs contribute nothing; docs
    with no grams are absent from the output).

    Plan — the contamination_check adaptive shape:
      1. distinct (doc, gram) rows — exact per batch because row==doc;
      2. gram-keyed groupby count, filtered to SHARED grams (nd >= 2);
      3. membership attach: below the broadcast threshold the shared
         vocabulary ships once via ray.put and every batch does a
         vectorized sorted-array membership test (NO corpus-scale
         string shuffle, and because row==doc the whole per-doc stat
         falls out of one pass with no doc-keyed groupby either);
         above it, a gram-keyed hash join + doc-keyed groupby-sum.
      4. frac rounds half-up (rational ratio, same tie contract as
         repetition_signals)."""
    import ray

    from ray.data.aggregate import Sum
    from ..stages.joins import hash_join

    base = docs.select_columns(["doc_id", "text"])
    grams = base.map_batches(_doc_grams, batch_format="pandas")
    # shared vocabulary via the bucket-per-group pattern: hash grams
    # into ~parallelism buckets (ONE keyed all-to-all on a small int
    # key), value_counts + nd>=2 filter inside each bucket — a direct
    # groupby("g") pays Ray's string-sort aggregate (measured 13s for
    # 26k gram rows vs ~1s bucketed)
    from .events import _bucket_by_key

    def bucket_shared(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["g"].value_counts()
        return pd.DataFrame({"g": vc.index[vc.to_numpy() >= 2].astype(str)})

    shared_g = (
        _bucket_by_key(grams, "g", ["g"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(bucket_shared, batch_format="pandas")
        .materialize()
    )

    def _finalize_frame(ids, tot, sh) -> pd.DataFrame:
        frac = np.floor((sh / np.maximum(tot, 1)) * 1e6 + 0.5) / 1e6
        return pd.DataFrame(
            {
                "doc_id": ids.astype(np.int64),
                "n_grams": tot.astype(np.int64),
                "shared_grams": sh.astype(np.int64),
                "dup_gram_frac": frac,
            }
        )

    if shared_g.count() <= _BROADCAST_TEST_GRAMS and not force_join:
        vocab = np.sort(
            np.concatenate(
                [
                    b["g"].to_numpy(zero_copy_only=False).astype(str)
                    for b in shared_g.iter_batches(
                        batch_format="pyarrow", batch_size=None
                    )
                ]
                or [np.array([], dtype=str)]
            )
        )
        ref = ray.put(vocab)

        def stats(df: pd.DataFrame) -> pd.DataFrame:
            v = ray.get(ref)
            e = _doc_grams(df)
            if len(e) == 0:
                return _finalize_frame(*(np.array([], dtype=np.int64),) * 3)
            ids = e["doc_id"].to_numpy(dtype=np.int64)
            g = e["g"].to_numpy(dtype=str)
            if len(v):
                pos = np.minimum(np.searchsorted(v, g), len(v) - 1)
                hit = (v[pos] == g).astype(np.int64)
            else:
                hit = np.zeros(len(g), dtype=np.int64)
            # rows are (doc, gram) sorted by doc construction order --
            # run-boundary reduceat, no pandas groupby needed
            order = np.argsort(ids, kind="stable")
            ids_s, hit_s = ids[order], hit[order]
            bounds = np.flatnonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])
            tot = np.diff(np.r_[bounds, len(ids_s)])
            sh = np.add.reduceat(hit_s, bounds)
            return _finalize_frame(ids_s[bounds], tot, sh)

        return base.map_batches(stats, batch_format="pandas")

    # scale fallback: gram-keyed join + doc-keyed groupby-sum
    tagged = shared_g.map_batches(
        lambda df: df.assign(_sh=np.int64(1)), batch_format="pandas"
    )
    attached = hash_join(grams, tagged, on=("g",), join_type="left_outer")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        sh = df["_sh"].fillna(0).to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids_s, sh_s = ids[order], sh[order]
        bounds = np.flatnonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])
        return pd.DataFrame(
            {
                "doc_id": ids_s[bounds],
                "n_grams": np.diff(np.r_[bounds, len(ids_s)]).astype(np.int64),
                "shared_grams": np.add.reduceat(sh_s, bounds).astype(np.int64),
            }
        )

    from ..stages.skew import bucketed_group_sum

    # per-doc sums via the bucketed exchange (groups = documents)
    per = bucketed_group_sum(
        attached.map_batches(partial, batch_format="pandas"),
        "doc_id",
        "n_grams",
        extra="shared_grams",
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return _finalize_frame(
            df["doc_id"].to_numpy(dtype=np.int64),
            df["n_grams"].to_numpy(dtype=np.int64),
            df["shared_grams"].to_numpy(dtype=np.int64),
        )

    return per.map_batches(finalize, batch_format="pandas")


def length_percentile_filter(docs: Dataset, *, q: float = 0.25) -> Dataset:
    """(doc_id, n_chars) of documents at or above the corpus's exact
    q-quantile of n_chars — percentile-based gating, the corpus-level
    complement to doc_quality's absolute thresholds ("drop the
    shortest quarter" instead of "drop under 100 chars").

    The threshold comes from the distributed exact-histogram quantile
    (ordering.length_quantiles, quantile_disc semantics): one bounded
    groupby over the value vocabulary, a scalar to the driver, then a
    streaming vectorized filter — the corpus itself is never collected."""
    from .ordering import length_quantiles

    th = int(length_quantiles(docs, qs=(q,), col="n_chars")["value"].iloc[0])

    def keep(t):
        import pyarrow as pa

        n = t["n_chars"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(n >= th))

    return docs.select_columns(["doc_id", "n_chars"]).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


def dedup_lines(docs: Dataset, *, min_docs: int = 2, force_join: bool = False) -> Dataset:
    """(doc_id, text, kept_lines, total_lines): corpus-level LINE
    deduplication — every line that appears (verbatim) in at least
    `min_docs` DISTINCT documents is removed from every document, and
    the survivors are reassembled in original order (the CCNet-style
    boilerplate scrub: headers, footers, nav bars and cookie banners
    are exactly the lines shared across many pages).

    Line semantics are locked to DuckDB ``string_split(text, chr(10))``:
    python ``str.split("\\n")`` — an empty/null doc is ONE empty line,
    and the empty line is itself dedupable (it occurs in nearly every
    multi-line doc, so blank lines vanish; that is the documented
    contract, matching the oracle exactly).

    Plan — the duplicate_ngram_stats adaptive shape:
      1. distinct (doc, line) rows, exact per batch because row==doc;
      2. shared-line vocabulary via the bucket-per-group pattern (hash
         lines into ~parallelism buckets, ONE small-int keyed shuffle,
         value_counts >= min_docs inside each bucket — never a direct
         string groupby);
      3. scrub: below the broadcast threshold the vocabulary ships once
         via ray.put and each batch re-splits, membership-tests with a
         vectorized sorted-array searchsorted, and reassembles per doc
         (rows stay doc-contiguous after explode, so reassembly is a
         run-boundary pass; the final "\\n".join per doc is inherently
         a per-DOC string op, not per-line). Above the threshold: a
         line-keyed hash join + doc-bucketed reassembly, so no single
         worker ever holds the vocabulary.

    No reference analogue (north-rule training-data extension)."""
    import ray

    from .events import _bucket_by_key

    base = docs.select_columns(["doc_id", "text"])

    def _doc_lines(df: pd.DataFrame) -> pd.DataFrame:
        ex = (
            df[["doc_id"]]
            .assign(line=df["text"].fillna("").str.split("\n"))
            .explode("line")
        )
        ex = ex.drop_duplicates(["doc_id", "line"])
        return pd.DataFrame(
            {
                "doc_id": ex["doc_id"].to_numpy(dtype=np.int64),
                "line": ex["line"].astype(str).to_numpy(dtype=object),
            }
        )

    def bucket_shared(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["line"].value_counts()
        return pd.DataFrame(
            {"line": vc.index[vc.to_numpy() >= min_docs].astype(str)}
        )

    shared = (
        _bucket_by_key(
            base.map_batches(_doc_lines, batch_format="pandas"), "line", ["line"]
        )
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(bucket_shared, batch_format="pandas")
        .materialize()
    )

    def _explode_pos(df: pd.DataFrame) -> pd.DataFrame:
        """(doc_id, pos, line) rows, doc-contiguous, 1-based pos."""
        lns = df["text"].fillna("").str.split("\n")
        counts = lns.str.len().to_numpy(dtype=np.int64)
        ids = np.repeat(df["doc_id"].to_numpy(dtype=np.int64), counts)
        pos = np.concatenate([np.arange(1, c + 1) for c in counts]) if len(counts) else np.array([], dtype=np.int64)
        flat = lns.explode().astype(str).to_numpy(dtype=object) if counts.sum() else np.array([], dtype=object)
        return pd.DataFrame({"doc_id": ids, "pos": pos.astype(np.int64), "line": flat})

    def _rebuild(ids, pos, line, keep) -> pd.DataFrame:
        """Run-boundary reassembly of doc-contiguous (sorted) rows."""
        if len(ids) == 0:
            return pd.DataFrame(
                {
                    "doc_id": np.array([], dtype=np.int64),
                    "text": pd.Series([], dtype=object),
                    "kept_lines": np.array([], dtype=np.int64),
                    "total_lines": np.array([], dtype=np.int64),
                }
            )
        bounds = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        tot = np.diff(np.r_[bounds, len(ids)])
        kept_n = np.add.reduceat(keep.astype(np.int64), bounds)
        texts = []
        for b, t in zip(bounds, tot):
            sel = keep[b : b + t]
            texts.append("\n".join(line[b : b + t][sel]))
        return pd.DataFrame(
            {
                "doc_id": ids[bounds],
                "text": pd.Series(texts, dtype=object),
                "kept_lines": kept_n,
                "total_lines": tot.astype(np.int64),
            }
        )

    if shared.count() <= _BROADCAST_TEST_GRAMS and not force_join:
        vocab = np.sort(
            np.concatenate(
                [
                    b["line"].to_numpy(zero_copy_only=False).astype(str)
                    for b in shared.iter_batches(batch_format="pyarrow", batch_size=None)
                ]
                or [np.array([], dtype=str)]
            )
        )
        ref = ray.put(vocab)

        def scrub(df: pd.DataFrame) -> pd.DataFrame:
            v = ray.get(ref)
            e = _explode_pos(df)
            if len(e) == 0:
                return _rebuild(*(np.array([], dtype=np.int64),) * 2, np.array([], dtype=object), np.array([], dtype=bool))
            ids = e["doc_id"].to_numpy(dtype=np.int64)
            pos = e["pos"].to_numpy(dtype=np.int64)
            line = e["line"].to_numpy(dtype=object)
            if len(v):
                ls = e["line"].to_numpy(dtype=str)
                p = np.minimum(np.searchsorted(v, ls), len(v) - 1)
                keep = v[p] != ls
            else:
                keep = np.ones(len(ids), dtype=bool)
            return _rebuild(ids, pos, line, keep)

        return base.map_batches(scrub, batch_format="pandas")

    # scale fallback: line-keyed hash join + doc-bucketed reassembly
    from ..stages.joins import hash_join

    exploded = base.map_batches(_explode_pos, batch_format="pandas")
    tagged = shared.map_batches(
        lambda df: df.assign(_dup=np.int64(1)), batch_format="pandas"
    )
    attached = hash_join(exploded, tagged, on=("line",), join_type="left_outer")

    def rebuild_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "pos"], kind="stable")
        return _rebuild(
            df["doc_id"].to_numpy(dtype=np.int64),
            df["pos"].to_numpy(dtype=np.int64),
            df["line"].to_numpy(dtype=object),
            df["_dup"].isna().to_numpy(),
        )

    return (
        _bucket_by_key(attached, "doc_id", ["doc_id", "pos", "line", "_dup"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(rebuild_bucket, batch_format="pandas")
    )


_BLOOM_M_BITS = 1 << 20
_BLOOM_MIX_MOD = np.int64(2**31 - 1)
_BLOOM_MIX_A = np.int64(2654435761)
_BLOOM_MIX_B = np.int64(40503)


def _bloom_positions(fp: np.ndarray, m_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """Two SQL-expressible bit positions per fingerprint (mod-first
    integer mixes, overflow-safe for the 60-bit md5 fingerprints)."""
    r = fp.astype(np.int64) % _BLOOM_MIX_MOD
    p1 = ((r * _BLOOM_MIX_A + 17) % _BLOOM_MIX_MOD) % m_bits
    p2 = ((r * _BLOOM_MIX_B + 29) % _BLOOM_MIX_MOD) % m_bits
    return p1, p2


def contamination_bloom(
    docs: Dataset, *, test_mod: int = 20, m_bits: int = _BLOOM_M_BITS
) -> Dataset:
    """(doc_id, flagged) for every held-out doc (doc_id % test_mod == 0):
    does its content fingerprint hit a BLOOM FILTER built over the
    training split? The 100-TB posture of exact-membership
    contamination: the train side reduces to an m_bits bitset (128 KiB
    at the default — constant, corpus-size-independent broadcast,
    where the sorted-key set contamination_check ships grows with the
    corpus). Flags are deterministic on both sides — the two bit
    positions are integer mixes the SQL oracle replicates exactly —
    so the documented false-positive rate (~(n/m)² per probe pair) is
    reproducible, never random.

    Plan: one column-pruned pass fingerprints the train split and
    emits per-batch DISTINCT positions (≤ 2·batch rows, bounded by
    m_bits); a keyed distinct + driver packbits builds the bitset;
    test batches probe both bits locally. No shuffle touches the
    corpus body."""
    import pyarrow as pa

    import ray

    from ..functions.textstats import fingerprint64_series

    base = docs.select_columns(["doc_id", "text"])

    def _fps(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(dtype=np.int64),
                "fp": fingerprint64_series(t["text"]),
            }
        )

    def _train_pos(t: pd.DataFrame) -> pd.DataFrame:
        f = _fps(t)
        f = f[f["doc_id"].to_numpy() % test_mod != 0]
        p1, p2 = _bloom_positions(f["fp"].to_numpy(dtype=np.int64), m_bits)
        return pd.DataFrame({"pos": np.unique(np.concatenate([p1, p2]))})

    from ..stages.skew import bucketed_distinct

    pos = bucketed_distinct(
        base.map_batches(_train_pos, batch_format="pandas"), "pos"
    ).materialize()
    bits = np.zeros(m_bits, dtype=bool)
    for t in pos.iter_batches(batch_format="pyarrow", batch_size=None):
        bits[t["pos"].to_numpy(zero_copy_only=False)] = True
    bitset = np.packbits(bits)
    ref = ray.put(bitset)

    def _probe(t: pd.DataFrame) -> pd.DataFrame:
        bs = ray.get(ref)
        f = _fps(t)
        f = f[f["doc_id"].to_numpy() % test_mod == 0]
        fp = f["fp"].to_numpy(dtype=np.int64)
        p1, p2 = _bloom_positions(fp, m_bits)

        def bit(p):
            return (bs[(p >> 3).astype(np.int64)] >> (7 - (p & 7)).astype(np.uint8)) & 1

        flagged = (bit(p1) & bit(p2)).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": f["doc_id"].to_numpy(dtype=np.int64), "flagged": flagged}
        )

    return base.map_batches(_probe, batch_format="pandas")
