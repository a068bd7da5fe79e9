"""Per-key window operators (Ray Data has no window functions).

`top_k_per_group` = `row_number() OVER (PARTITION BY key ORDER BY ...)
<= k`, the workhorse of corpus curation (best-k docs per domain,
top-k near-dups per cluster, newest-k snapshots per url).

Shape: the events-log bucket-per-group pattern — hash keys into
~parallelism buckets (ONE keyed all-to-all whose fan-in scales with
the cluster, never with key cardinality), sort each bucket once by
(key, order...), then take each key-run's first k rows via a
vectorized run-boundary cumcount. No per-key pandas groups, no
driver-side state.
"""

from __future__ import annotations

from ..context import exchange_partitions

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .events import _bucket_by_key


def top_k_per_group(
    ds: Dataset,
    *,
    key: str,
    order_cols: list[str],
    descending: list[bool] | None = None,
    k: int = 3,
    cols: list[str] | None = None,
) -> Dataset:
    """First k rows of every `key` group under (order_cols, descending),
    with a 1-based `rnk` column. The order must be made total by
    `order_cols` (include a unique id as the last column) — that is
    what makes the result deterministic and oracle-comparable.
    """
    desc = descending or [False] * len(order_cols)
    keep = cols or ([key] + order_cols)
    if key not in keep:
        keep = [key] + keep

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key] + order_cols,
            ascending=[True] + [not d for d in desc],
            kind="stable",
        )
        keys = g[key].to_numpy()
        first = np.r_[True, keys[1:] != keys[:-1]]
        run_starts = np.flatnonzero(first)
        # 0-based position within each key run, vectorized
        pos = np.arange(len(g)) - np.repeat(run_starts, np.diff(np.r_[run_starts, len(g)]))
        out = g.loc[pos < k, keep].copy()
        out["rnk"] = (pos[pos < k] + 1).astype(np.int64)
        return out

    return (
        _bucket_by_key(ds, key, keep)
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
    )


_MIX_A = np.int64(2654435761)  # Knuth multiplicative constants — the
_MIX_B = np.int64(40503)  # sample order must be SQL-expressible
_MIX_MOD = np.int64(2**31 - 1)


def neighbor_sample(edges: Dataset, *, k: int = 3) -> Dataset:
    """(src, dst, rnk): a deterministic ≤k-neighbor sample per source
    vertex — the GraphSAGE-style fan-out cap that turns a skewed web
    graph into bounded GNN mini-batch adjacency (a 5M-degree hub
    contributes k rows, not 5M). The sample order is a seeded integer
    mix h = (src·2654435761 + dst·40503) mod (2³¹−1) with dst
    tie-break: pure int64 arithmetic, so it is vectorized here and
    byte-identical in ANSI SQL (no library RNG on either side), and it
    is stable under any partitioning. One bucketed exchange via
    top_k_per_group."""

    def add_h(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        # mod-first keeps every intermediate < 2^63 for ANY positive
        # int64 id (incl. the 63-bit minted url space) — numpy would
        # wrap silently on overflow while SQL BIGINT raises
        h = ((s % _MIX_MOD) * _MIX_A + (d % _MIX_MOD) * _MIX_B) % _MIX_MOD
        return pa.table({"src": s, "dst": d, "h": h})

    keyed = edges.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
    out = top_k_per_group(
        keyed,
        key="src",
        order_cols=["h", "dst"],
        k=k,
        cols=["src", "dst", "h"],
    )
    return out.select_columns(["src", "dst", "rnk"])
