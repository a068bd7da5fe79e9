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

import numpy as np
import pandas as pd

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
        .groupby("_kb")
        .map_groups(per_bucket, batch_format="pandas")
    )
