"""Order-dependent corpus operators: distributed prefix scan and the
training-data stages built on it.

The primitive is `ordered_scan`: an EXACT exclusive prefix sum of a
value column in ascending key order, over data far too large to sort on
one machine. Classic two-pass scan, Ray-Data-shaped:

1. range-bucket every row on the order key (pure map, no shuffle);
2. per-batch combiner -> tiny (bucket, partial_sum) table ->
   ``groupby(bucket).sum`` -> the driver prefix-sums B rows
   (B ~ parallelism, never O(n)) into per-bucket offsets;
3. one keyed all-to-all (``groupby(bucket).map_groups``): each bucket
   sorts ONCE and cumsums vectorized, adding its driver-computed
   offset.

Bucket boundaries are an equi-width split of the observed [min, max]
key range. Both key families used here are uniform by construction —
dense minted doc_ids and md5-int60 shuffle keys — so buckets balance;
boundaries affect only load balance, never results (the scan is exact
for any bucketing). A skewed key would need sampled quantile
boundaries; documented, not needed for these keys.

Built on it:

- ``training_shuffle``: deterministic global shuffle for training —
  every doc gets a unique 0-based position, ordered by
  md5("{seed}:{doc_id}") (the same int60 construction as
  pipelines.split, so the SQL oracle mirrors it bit-exactly) with
  doc_id as tiebreak. Stable under re-runs and repartitioning; a new
  seed is a new permutation.
- ``pack_sequences``: concat-then-chunk sequence packing — the
  standard LLM pretraining layout: documents are concatenated in
  doc_id order and the token stream is cut every `window` tokens. Each
  doc's pack_id/pack_offset derive from the exclusive cumsum of token
  counts, i.e. exactly `ordered_scan`.
- ``length_quantiles``: EXACT distributed quantiles of a bounded-
  cardinality integer column via a value histogram (groupby count,
  vocabulary-sized) + driver-side cumulative walk; matches DuckDB's
  quantile_disc (element at index max(0, ceil(q*n)-1)).

No reference analogue (the reference is a single-kernel CC engine,
/root/reference/src/connected_components.c); these are the north-rule
"operations a large-scale training-data pipeline would need".
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum

from ..context import default_parallelism

__all__ = [
    "ordered_scan",
    "training_shuffle",
    "pack_sequences",
    "length_quantiles",
    "ntile_buckets",
]


def _shuffle_keys(ids: np.ndarray, seed: int) -> np.ndarray:
    """md5-int60 of f"{seed}:{id}" — identical to pipelines.split's
    construction so one SQL expression mirrors both operators."""
    out = np.empty(len(ids), dtype=np.int64)
    for i, k in enumerate(ids):
        out[i] = int(hashlib.md5(f"{seed}:{k}".encode()).hexdigest()[:15], 16)
    return out


def ordered_scan(
    ds: Dataset,
    key_col: str,
    value_col: str,
    *,
    tiebreak_col: str | None = None,
    num_buckets: int | None = None,
) -> Dataset:
    """Exclusive prefix sum of `value_col` in ascending `key_col` order
    (ties broken by `tiebreak_col`, which must make the order total).

    Returns the input columns plus ``cum_prev`` (int64): the sum of
    `value_col` over all rows strictly before this one in key order.
    """
    order_cols = [key_col] + ([tiebreak_col] if tiebreak_col else [])

    stats = ds.aggregate(Min(key_col), Max(key_col))
    kmin = int(stats[f"min({key_col})"])
    kmax = int(stats[f"max({key_col})"])
    nb = num_buckets or max(8, default_parallelism() * 2)
    # +1 so kmax itself lands in bucket nb-1; uniform keys => balanced.
    width = max(1, (kmax - kmin) // nb + 1)

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return t.append_column("_sb", pa.array((k - kmin) // width, pa.int64()))

    bucketed = ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # pass 1: combiner (one row per bucket per batch) -> per-bucket sums
    def partial(t: pa.Table) -> pa.Table:
        b = t["_sb"].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        ub, inv = np.unique(b, return_inverse=True)
        return pa.table({"_sb": ub, "_ps": np.bincount(inv, weights=v).astype(np.int64)})

    sums = (
        bucketed.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_sb")
        .aggregate(Sum("_ps", alias_name="_bs"))
        .to_pandas()  # B rows ~ parallelism — driver-side by design
    )
    sums = sums.sort_values("_sb")
    offsets = dict(
        zip(
            sums["_sb"].to_numpy(dtype=np.int64),
            np.r_[0, np.cumsum(sums["_bs"].to_numpy(dtype=np.int64))[:-1]],
        )
    )

    # pass 2: per-bucket sort + vectorized cumsum + driver offset
    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="stable")
        v = g[value_col].to_numpy(dtype=np.int64)
        base = offsets[int(g["_sb"].iloc[0])]
        g = g.drop(columns=["_sb"])
        g["cum_prev"] = base + np.r_[0, np.cumsum(v)[:-1]]
        return g

    return bucketed.groupby("_sb").map_groups(scan_bucket, batch_format="pandas")


def training_shuffle(
    docs: Dataset, *, seed: int = 42, id_col: str = "doc_id"
) -> Dataset:
    """(doc_id, pos): deterministic global shuffle order for training.

    pos is the 0-based rank of md5-int60(f"{seed}:{doc_id}") with
    doc_id tiebreak — a seeded permutation independent of row order,
    block boundaries and parallelism. Rank = ordered_scan with value 1.
    """

    def add_key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return pa.table(
            {
                id_col: ids,
                "_h": _shuffle_keys(ids, seed),
                "_one": np.ones(len(ids), dtype=np.int64),
            }
        )

    keyed = docs.select_columns([id_col]).map_batches(
        add_key, batch_format="pyarrow", zero_copy_batch=True
    )
    scanned = ordered_scan(keyed, "_h", "_one", tiebreak_col=id_col)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].astype(np.int64),
                "pos": df["cum_prev"].astype(np.int64),
            }
        )

    return scanned.map_batches(finish, batch_format="pandas")


def pack_sequences(
    docs: Dataset,
    *,
    window: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """(doc_id, n_tokens, pack_id, pack_offset): concat-then-chunk
    packing. Documents are concatenated in doc_id order; the resulting
    token stream is cut into fixed `window`-token packs. A doc STARTS
    at absolute token position cum_prev, so it begins in pack
    cum_prev // window at offset cum_prev % window (long docs simply
    span packs — the standard pretraining layout, no padding).

    Token count = whitespace tokens, the same definition (and SQL
    mirror) as textpipe.doc_stats.
    """
    from ..functions.textstats import token_counts_series

    def add_tokens(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].astype(np.int64),
                "n_tokens": token_counts_series(df[text_col].astype(str)),
            }
        )

    toks = docs.select_columns([id_col, text_col]).map_batches(
        add_tokens, batch_format="pandas"
    )
    scanned = ordered_scan(toks, id_col, "n_tokens")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cp = df["cum_prev"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: df[id_col].astype(np.int64),
                "n_tokens": df["n_tokens"].astype(np.int64),
                "pack_id": cp // window,
                "pack_offset": cp % window,
            }
        )

    return scanned.map_batches(finish, batch_format="pandas")


def ntile_buckets(
    ds: Dataset,
    *,
    n: int = 10,
    order_col: str,
    id_col: str = "doc_id",
) -> Dataset:
    """(id, tile): exact n-tile bucketing by (order_col, id) — the
    stratified-sampling / difficulty-bucketing primitive. tile is
    1-based, sized like SQL's ntile(): the first (total % n) tiles get
    ceil(total/n) rows. Exact global rank comes from `ordered_scan`
    (value 1), so no driver-side sort ever happens."""

    def add_one(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].astype(np.int64),
                "_ok": df[order_col].astype(np.int64),
                "_one": np.ones(len(df), dtype=np.int64),
            }
        )

    keyed = ds.select_columns([id_col, order_col]).map_batches(
        add_one, batch_format="pandas"
    )
    scanned = ordered_scan(keyed, "_ok", "_one", tiebreak_col=id_col).materialize()
    total = scanned.count()
    q, r = divmod(total, n)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rank = df["cum_prev"].to_numpy(dtype=np.int64)  # 0-based
        big = (q + 1) * r  # rows covered by the r larger tiles
        tile = np.where(
            rank < big,
            rank // (q + 1) + 1 if q + 1 > 0 else 1,
            ((rank - big) // q + r + 1) if q > 0 else r,
        )
        return pd.DataFrame(
            {id_col: df[id_col].astype(np.int64), "tile": tile.astype(np.int64)}
        )

    return scanned.map_batches(finish, batch_format="pandas")


def length_quantiles(
    docs: Dataset,
    *,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    col: str = "n_chars",
) -> pd.DataFrame:
    """EXACT quantiles of an integer column, distributed: value
    histogram (one groupby over the value vocabulary — bounded
    cardinality by assumption, e.g. document lengths) -> driver
    cumulative walk over the sorted histogram. Matches DuckDB
    quantile_disc: element at sorted index max(0, ceil(q*n)-1).

    Returns a small pandas frame (q, value) — a scalar-sized result,
    driver-side by design.
    """
    from ray.data.aggregate import Count

    hist = (
        docs.select_columns([col])
        .groupby(col)
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
        .sort_values(col)
    )
    vals = hist[col].to_numpy(dtype=np.int64)
    cnts = hist["_n"].to_numpy(dtype=np.int64)
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        idx = max(0, int(np.ceil(q * n)) - 1)  # 0-based rank
        pos = int(np.searchsorted(cum, idx + 1))  # first value covering it
        out_q.append(q)
        out_v.append(int(vals[pos]))
    return pd.DataFrame({"q": np.round(np.array(out_q), 6), "value": np.array(out_v, dtype=np.int64)})
