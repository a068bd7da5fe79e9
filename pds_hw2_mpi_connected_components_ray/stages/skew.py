"""Skew handling for wide aggregations over power-law graphs.

Web link graphs are heavily skewed (hubs with 1e6+ in-links). A bare
``groupby(key)`` routes every row of a hot key through one reducer; the
reference's only answer was OpenMP ``schedule(guided)`` within a rank
(/root/reference/src/connected_components.c:109) -- nothing across
ranks. Here:

- ``combine_per_batch``: per-batch pre-aggregation (a combiner) before
  any groupby -- each batch contributes at most one row per key, so a
  hot key's reducer input is bounded by the block count, not its degree.
- ``salted_groupby_min``: explicit two-stage degree-threshold split:
  rows of hot keys are salted into ``salt_factor`` sub-keys (stage-1
  groupby computes partial minima per (key, salt)), then a tiny stage-2
  groupby merges the partials -- the north_star's "degree-threshold edge
  replication with a final merge pass" expressed over aggregates.
- ``high_degree_vertices``: the degree-threshold detector.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Min


def _typed_empty(t: pa.Table, cols: dict[str, pa.DataType | None]) -> pa.Table:
    """Zero-row table whose column types mirror the input block's schema
    (never schema-less — downstream unions/joins crash on schema-less
    empty blocks in Ray 2.49's acero path). `cols` maps output column ->
    explicit type, or None to inherit the type of the same-named input
    column."""
    return pa.table(
        {
            name: pa.array([], typ if typ is not None else t.schema.field(name).type)
            for name, typ in cols.items()
        }
    )


def coalesce_small_blocks(ds: Dataset, rows_per_block: int = 4_000_000) -> Dataset:
    """Bundle tiny blocks into ~rows_per_block blocks via a batch-
    bundled identity map. Bucketed exchanges emit one (mostly empty)
    block per upstream input block; iterative loops that carry such
    state as next-superstep input compound hundreds of sub-ms task
    launches per iteration unless the state is re-bundled once per
    step. 4M rows of (int64 x 4) state is ~128 MB — Ray's default
    target block size."""
    return ds.map_batches(
        lambda t: t,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=rows_per_block,
    )


def high_degree_vertices(edges: Dataset, threshold: int) -> Dataset:
    """(vertex, degree) for vertices with degree > threshold (group on
    src of the symmetric edge table)."""
    agg = edges.groupby("src").aggregate(Count(alias_name="degree"))
    return agg.map_batches(
        lambda t: t.rename_columns(["vertex", "degree"]).filter(
            pa.compute.greater(t["degree"], threshold)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def bucketed_group_sum(
    ds: Dataset,
    key: str,
    val: str,
    *,
    num_buckets: int | None = None,
    extra: str | list[str] | None = None,
) -> Dataset:
    """Exact (key -> SUM(val)) for an int64 key, as one bucketed
    exchange instead of Ray's full sort-based keyed aggregate: hash the
    key into ~parallelism integer buckets, groupby the BUCKET id (few
    groups, no tiny-group overhead), and reduce each bucket with a
    single argsort+reduceat pass. Measured ~10x cheaper than
    `groupby(key).aggregate(Sum)` on edge_support's credit rows (10.5 s
    -> ~1 s for 750k rows); the same trick behind the link-prediction
    and k-truss fast paths.

    Per-batch pre-combining (np.unique partials) belongs in the CALLER
    where it can fuse with the producing map; this helper only owns the
    exchange + final reduce.

    `extra` names one additional numeric column (or a list of them)
    summed alongside `val` in the same pass (used by the
    weighted-PageRank shuffle loop to carry the dangling flag through
    the exchange, and by the plain-PageRank merge to carry deg +
    old_rank).
    """
    from ..context import default_parallelism

    nb = num_buckets or max(8, default_parallelism())
    extras: list[str] = (
        [] if extra is None else [extra] if isinstance(extra, str) else list(extra)
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_kb", pa.array((k * np.int64(0x9E3779B9)) % nb, pa.int64())
        )

    def bucket_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols: dict[str, pa.DataType | None] = {key: None, val: None}
            for e in extras:
                cols[e] = None
            return _typed_empty(t, cols)
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[val].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order]
        bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        out = {key: ks[bounds], val: np.add.reduceat(vs, bounds)}
        for e in extras:
            es = t[e].to_numpy(zero_copy_only=False)[order]
            out[e] = np.add.reduceat(es, bounds)
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb", num_partitions=nb)
        .map_groups(bucket_sum, batch_format="pyarrow")
    )


def bucketed_group_min_max(
    ds: Dataset,
    key: str,
    min_col: str,
    max_col: str,
    *,
    num_buckets: int | None = None,
) -> Dataset:
    """Exact per-key (MIN(min_col), MAX(max_col)) via the same bucketed
    exchange as bucketed_group_sum — replaces Ray's keyed
    Min+Max aggregate whose ms-per-group reduce dominates at |V| groups
    (the CC shuffle superstep merge). Integer min/max are
    order-independent, so the result is exactly the keyed aggregate's."""
    from ..context import default_parallelism

    nb = num_buckets or max(8, default_parallelism())

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_kb", pa.array((k * np.int64(0x9E3779B9)) % nb, pa.int64())
        )

    def bucket_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _typed_empty(t, {key: None, min_col: None, max_col: None})
        k = t[key].to_numpy(zero_copy_only=False)
        mn = t[min_col].to_numpy(zero_copy_only=False)
        mx = t[max_col].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks = k[order]
        bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        return pa.table(
            {
                key: ks[bounds],
                min_col: np.minimum.reduceat(mn[order], bounds),
                max_col: np.maximum.reduceat(mx[order], bounds),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb", num_partitions=nb)
        .map_groups(bucket_reduce, batch_format="pyarrow")
    )


def bucketed_group_reduce(
    ds: Dataset,
    key: str,
    val: str,
    how: str = "min",
    *,
    num_buckets: int | None = None,
) -> Dataset:
    """Exact per-key min/max/sum/count of `val` for an int64 key via the
    bucketed exchange (see bucketed_group_sum for why: Ray's keyed
    sort-aggregate reduce costs ~ms per group, which at data-
    proportional key cardinality — per-vertex, per-document, per-pair —
    dominates the wall at small scale and is structurally unusable at
    billions of groups). `how="count"` counts rows per key (val is
    still projected but ignored)."""
    from ..context import default_parallelism

    nb = num_buckets or max(8, default_parallelism())

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_kb", pa.array((k * np.int64(0x9E3779B9)) % nb, pa.int64())
        )

    def bucket_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # count mode always emits int64 counts; min/max/sum inherit
            # the input value type
            return _typed_empty(
                t, {key: None, val: pa.int64() if how == "count" else None}
            )
        k = t[key].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks = k[order]
        bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        if how == "count":
            cnt = np.diff(np.r_[bounds, len(ks)]).astype(np.int64)
            return pa.table({key: ks[bounds], val: cnt})
        v = t[val].to_numpy(zero_copy_only=False)[order]
        red = {"min": np.minimum, "max": np.maximum, "sum": np.add}[how].reduceat
        return pa.table({key: ks[bounds], val: red(v, bounds)})

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb", num_partitions=nb)
        .map_groups(bucket_reduce, batch_format="pyarrow")
    )


def bucketed_distinct(
    ds: Dataset, key: str, *, num_buckets: int | None = None
) -> Dataset:
    """Distinct int64 keys via the bucketed exchange — replaces the
    groupby(key).count().select(key) distinct idiom whose keyed reduce
    pays ~ms per DISTINCT KEY (data-proportional)."""
    from ..context import default_parallelism

    nb = num_buckets or max(8, default_parallelism())

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_kb", pa.array((k * np.int64(0x9E3779B9)) % nb, pa.int64())
        )

    def uniq(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _typed_empty(t, {key: None})
        return pa.table({key: np.unique(t[key].to_numpy(zero_copy_only=False))})

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb", num_partitions=nb)
        .map_groups(uniq, batch_format="pyarrow")
    )


def combine_per_batch(ds: Dataset, key: str, val: str, how: str = "min") -> Dataset:
    """Per-batch (key -> min/max val) combiner. The output carries ONLY
    the (key, val) columns -- any other input columns are dropped, so
    callers must project first (current callers pass two-column tables).

    Bounds any downstream groupby's per-key fan-in to the block count.
    """
    reducer = {"min": np.minimum, "max": np.maximum}[how].reduceat

    def fn(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[val].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return t
        order = np.argsort(k, kind="stable")
        ks = k[order]
        vs = v[order]
        bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        return pa.table({key: ks[bounds], val: reducer(vs, bounds)})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def salted_groupby_min(
    ds: Dataset,
    key: str,
    val: str,
    salt_factor: int = 16,
) -> Dataset:
    """groupby(key).min(val) resilient to hot keys: stage 1 groups on
    (key, salt=row_hash % salt_factor) so a hot key's rows spread over
    ``salt_factor`` reducers; stage 2 merges the (small) partials.

    Semantically identical to a plain groupby-min (min is associative
    and commutative); only the physical plan changes.
    """

    def add_salt(t: pa.Table) -> pa.Table:
        v = t[val].to_numpy(zero_copy_only=False)
        salt = (np.arange(len(v), dtype=np.int64) % salt_factor).astype(np.int64)
        return t.append_column("_salt", pa.array(salt))

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
    stage1 = salted.groupby([key, "_salt"]).aggregate(Min(val, alias_name=val))
    return stage1.groupby(key).aggregate(Min(val, alias_name=val))
