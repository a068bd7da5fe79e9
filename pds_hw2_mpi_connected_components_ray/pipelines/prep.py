"""End-to-end training-data corpus preparation -- the flagship
composition of the engine's text operators, the pipeline a user of a
100 TB web corpus actually runs:

    documents
      -> quality gate        (C4-style: min token count, max punct ratio)
      -> exact dedup         (128-bit content hash; keep min doc_id)
      -> near-dup collapse   (MinHash LSH candidates -> exact char-shingle
                              Jaccard verify -> connected components ->
                              keep one representative per group)
      -> surviving doc ids

Every stage is one of the engine's oracle-checked operators, so the
whole composition is itself SQL-mirrorable (driver query `corpus_prep`).
Scale notes: the quality gate and dedup hash are streaming map_batches;
the only shuffles are the dedup groupby (hash key), the LSH bucket
groupby, and a final left-outer anti-join against the (near-dup
non-representative) drop list.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..context import default_parallelism
from ..functions.textstats import token_counts_series
from .dedup import duplicate_groups, exact_dedup_keep, minhash_lsh_pairs


def quality_gate(
    docs: Dataset,
    *,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Keep documents passing the cheap C4/Gopher-style quality gate:
    at least `min_tokens` whitespace tokens and punctuation ratio
    (chars matching [^\\w\\s] / total chars) at most `max_punct_ratio`."""

    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        n_tokens = token_counts_series(t).to_numpy()
        n_chars = t.str.len().to_numpy(dtype=np.int64)
        n_punct = t.str.count(r"[^\w\s]").to_numpy(dtype=np.int64)
        punct_ratio = n_punct / np.maximum(n_chars, 1)
        keep = (n_tokens >= min_tokens) & (punct_ratio <= max_punct_ratio)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(dtype=np.int64)[keep],
                text_col: t.to_numpy()[keep],
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        gate, batch_format="pandas"
    )


def corpus_prep(
    docs: Dataset,
    *,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    jaccard_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Full prep chain; returns the surviving (doc_id,) set."""
    q = quality_gate(
        docs,
        min_tokens=min_tokens,
        max_punct_ratio=max_punct_ratio,
        id_col=id_col,
        text_col=text_col,
    )
    kept = exact_dedup_keep(q, text_col=text_col, id_col=id_col).materialize()
    pairs = minhash_lsh_pairs(
        kept, threshold=jaccard_threshold, id_col=id_col, text_col=text_col
    ).materialize()
    ids = kept.select_columns([id_col])
    if pairs.count() == 0:
        return ids
    groups = duplicate_groups(pairs)

    def mark_drop(t: pa.Table) -> pa.Table:
        f = t.filter(pc.not_equal(t["doc_id"], t["group_id"]))
        return pa.table(
            {
                id_col: f["doc_id"],
                "_drop": pa.array(np.ones(len(f), dtype=np.int64)),
            }
        )

    drop = groups.map_batches(
        mark_drop, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if drop.count() == 0:
        return ids
    from ..stages.joins import hash_join

    npart = max(2, min(default_parallelism(), ids.count() // 500 + 1))
    j = hash_join(
        ids, drop, on=(id_col,), join_type="left_outer", num_partitions=npart
    )
    return j.map_batches(
        lambda t: pa.table({id_col: t.filter(pc.is_null(t["_drop"]))[id_col]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
