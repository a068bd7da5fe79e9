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
