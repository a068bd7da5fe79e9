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

    test_grams = (
        base.map_batches(_is_test, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_doc_grams, batch_format="pandas")
        .groupby("g")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["g"])
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
    return hits.groupby("doc_id").aggregate(Count(alias_name="n_shared"))


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
