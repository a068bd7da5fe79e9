"""General relational pipelines over the TPC-H-shaped tables — the
engine's joins/groupbys exercised on classic decision-support shapes
(pricing summary, segment top-orders, revenue rollup), proving the
substrate handles ordinary warehouse work alongside the link-graph and
curation operators.

Money determinism: every monetary expression quantizes to an integer
scale (cents / 1e-4 / 1e-6 units) IMMEDIATELY after the per-row double
arithmetic, so all aggregations are exact int64 sums and
summation-order cannot diverge from the SQL oracle (the
bigram_surprisal contract). The per-row double expressions are written
in the same operation order both sides (price·(1−disc), then ·(1+tax)).

Scale posture: joins are key-hash shuffles on high-cardinality keys
(orderkey/custkey) with partition counts from default_parallelism;
the tiny nation table broadcasts; all aggregates are per-batch
pre-combined before the keyed groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..context import default_parallelism, exchange_partitions
from ..stages.skew import bucketed_distinct, bucketed_group_sum
from ..stages.joins import hash_join


def _ts_us(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)


_CUTOFF_US = np.datetime64("2000-12-31T00:00:00", "us").view(np.int64)


def pricing_summary(lineitem: Dataset) -> Dataset:
    """TPC-H Q1 shape: per (returnflag, linestatus) over rows shipped on
    or before 2000-12-31 — quantity/base-price/discounted/charged sums
    (exact integer units) plus row count and half-up mean quantity."""

    def partial(t: pa.Table) -> pa.Table:
        ship = _ts_us(t["l_shipdate"])
        keep = ship <= _CUTOFF_US
        rf = t["l_returnflag"].to_numpy(zero_copy_only=False)[keep]
        ls = t["l_linestatus"].to_numpy(zero_copy_only=False)[keep]
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)[keep]
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[keep]
        tax = t["l_tax"].to_numpy(zero_copy_only=False)[keep]
        base_c = np.floor(price * 100 + 0.5).astype(np.int64)
        disc_e4 = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
        charge_e6 = np.floor(price * (1.0 - disc) * (1.0 + tax) * 1e6 + 0.5).astype(
            np.int64
        )
        df = pd.DataFrame(
            {
                "l_returnflag": rf,
                "l_linestatus": ls,
                "q": np.floor(qty + 0.5).astype(np.int64),
                "b": base_c,
                "d": disc_e4,
                "c": charge_e6,
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            q=("q", "sum"), b=("b", "sum"), d=("d", "sum"), c=("c", "sum"),
            n=("q", "size"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    agg = (
        lineitem.select_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_shipdate",
            ]
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("q", alias_name="sum_qty"),
            Sum("b", alias_name="sum_base_cents"),
            Sum("d", alias_name="sum_disc_e4"),
            Sum("c", alias_name="sum_charge_e6"),
            Sum("n", alias_name="n"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        q = t["sum_qty"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column(
            "avg_qty", pa.array(np.floor(q / n * 1e6 + 0.5) / 1e6)
        )

    return agg.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def top_orders_by_revenue(
    customer: Dataset,
    orders: Dataset,
    lineitem: Dataset,
    *,
    segment: str = "BUILDING",
    k: int = 10,
    broadcast_threshold: int | None = None,
) -> Dataset:
    """TPC-H Q3 shape: top-k orders of one market segment by discounted
    revenue. Below the dimension gate the segment's order-key SET
    broadcasts and the query is one filtered pass over lineitem + the
    order-keyed rollup; beyond it, two key-hash joins. Rank is
    (revenue desc, orderkey asc) either way."""
    import ray

    npart = default_parallelism()

    _thr = _BROADCAST_DIM_ROWS if broadcast_threshold is None else broadcast_threshold
    if orders.count() <= _thr and customer.count() <= _thr:
        ctab = _collect_cols(customer, ["c_custkey", "c_mktsegment"])
        seg_keys = np.sort(
            ctab.filter(pa.compute.equal(ctab["c_mktsegment"], segment))[
                "c_custkey"
            ].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        otab = _collect_cols(orders, ["o_orderkey", "o_custkey"])
        ok_all = otab["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck_all = otab["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(seg_keys):
            pos = np.minimum(np.searchsorted(seg_keys, ck_all), len(seg_keys) - 1)
            keep_orders = np.sort(ok_all[seg_keys[pos] == ck_all])
        else:
            keep_orders = np.array([], dtype=np.int64)
        kref = ray.put(keep_orders)

        def li_pass(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
            if len(ks) == 0:
                return pa.table(
                    {
                        "o_orderkey": pa.array([], pa.int64()),
                        "r": pa.array([], pa.int64()),
                    }
                )
            pos = np.minimum(np.searchsorted(ks, ok), len(ks) - 1)
            sel = ks[pos] == ok
            ok = ok[sel]
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[sel]
            disc = t["l_discount"].to_numpy(zero_copy_only=False)[sel]
            rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
            order = np.argsort(ok, kind="stable")
            oks, revs = ok[order], rev[order]
            b = np.flatnonzero(np.r_[True, oks[1:] != oks[:-1]])
            return pa.table(
                {
                    "o_orderkey": oks[b],
                    "r": np.add.reduceat(revs, b).astype(np.int64),
                }
            )

        return (
            bucketed_group_sum(
                lineitem.select_columns(
                    ["l_orderkey", "l_extendedprice", "l_discount"]
                ).map_batches(
                    li_pass, batch_format="pyarrow", zero_copy_batch=True
                ),
                "o_orderkey",
                "r",
            )
            .map_batches(
                lambda t: t.rename_columns(["o_orderkey", "revenue_e4"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .sort(["revenue_e4", "o_orderkey"], descending=[True, False])
            .limit(k)
        )

    cust = customer.map_batches(
        lambda t: t.filter(
            pa.compute.equal(t["c_mktsegment"], segment)
        ).select(["c_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ords = orders.select_columns(["o_orderkey", "o_custkey"])
    oj = hash_join(
        ords, cust, on=("o_custkey",), right_on=("c_custkey",), num_partitions=npart
    ).select_columns(["o_orderkey"])

    def li_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
        order = np.argsort(ok, kind="stable")
        oks, revs = ok[order], rev[order]
        b = np.flatnonzero(np.r_[True, oks[1:] != oks[:-1]])
        return pa.table(
            {"l_orderkey": oks[b], "r": np.add.reduceat(revs, b).astype(np.int64)}
        )

    li = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)

    j = hash_join(
        li, oj, on=("l_orderkey",), right_on=("o_orderkey",), num_partitions=npart
    )
    per_order = bucketed_group_sum(
        j.map_batches(
            lambda t: t.select(["l_orderkey", "r"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "l_orderkey",
        "r",
    ).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "revenue_e4"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return per_order.sort(
        ["revenue_e4", "o_orderkey"], descending=[True, False]
    ).limit(k)


# Dimension-side broadcast gate for the TPC-H pipelines: below this
# many rows the orders/customer key maps ship once via ray.put and the
# whole query is ONE pass over lineitem (zero joins) — measured ~10 s
# of hash-join overhead per query at sf0.1; above it the key-hash join
# plan keeps exchange edge-proportional.
_BROADCAST_DIM_ROWS = 5_000_000


def _collect_cols(ds: Dataset, cols: list[str]) -> pa.Table:
    sel = ds.select_columns(cols)
    batches = list(sel.iter_batches(batch_format="pyarrow", batch_size=None))
    if batches:
        return pa.concat_tables(batches)
    # Zero-batch plan (e.g. every upstream partial filtered to nothing):
    # preserve the column types from the dataset schema.
    schema = sel.schema()
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base.empty_table()
    return pa.table({c: pa.array([], pa.int64()) for c in cols})


def _int_lookup_ref(ds: Dataset, key: str, val: str):
    from ..stages.joins import put_lookup as _pl

    return _pl(_collect_cols(ds, [key, val]), key, val)


def revenue_by_nation(
    customer: Dataset,
    orders: Dataset,
    lineitem: Dataset,
    nation: Dataset,
    *,
    broadcast_threshold: int | None = None,
) -> Dataset:
    """TPC-H Q5 shape (simplified to the customer side): discounted
    revenue rolled up to the customer's nation. Below the dimension
    broadcast gate the orderkey→custkey and custkey→nationkey maps
    ship once and the query is one pass over lineitem; beyond it, two
    key-hash joins on the high-cardinality keys. The 25-row nation
    table always broadcasts; revenue pre-combines per order-key inside
    batches either way."""
    import ray

    npart = default_parallelism()

    _thr = _BROADCAST_DIM_ROWS if broadcast_threshold is None else broadcast_threshold
    if orders.count() <= _thr and customer.count() <= _thr:
        ntab = _collect_cols(nation, ["n_nationkey", "n_name"])
        nk = ntab["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = ntab["n_name"].to_numpy(zero_copy_only=False).astype(str)
        no = np.argsort(nk, kind="stable")
        nref = ray.put((nk[no], nn[no]))
        oref = _int_lookup_ref(orders, "o_orderkey", "o_custkey")
        cref = _int_lookup_ref(customer, "c_custkey", "c_nationkey")

        def one_pass(t: pa.Table) -> pa.Table:
            ol = ray.get(oref)
            cl = ray.get(cref)
            keys, names = ray.get(nref)
            ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = t["l_discount"].to_numpy(zero_copy_only=False)
            rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
            _, ck = ol.get(ok)
            _, nkey = cl.get(ck)
            name = names[np.searchsorted(keys, nkey)]
            df = pd.DataFrame({"n_name": name, "r": rev})
            g = df.groupby("n_name", sort=False)["r"].sum()
            return pa.table(
                {
                    "n_name": g.index.to_numpy(dtype=str),
                    "r": g.to_numpy(dtype=np.int64),
                }
            )

        return (
            lineitem.select_columns(
                ["l_orderkey", "l_extendedprice", "l_discount"]
            )
            .map_batches(one_pass, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("n_name")
            .aggregate(Sum("r", alias_name="revenue_e4"))
        )

    ntab = pa.concat_tables(
        list(nation.select_columns(["n_nationkey", "n_name"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        ))
    )
    nk = ntab["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = ntab["n_name"].to_numpy(zero_copy_only=False).astype(str)
    o = np.argsort(nk, kind="stable")
    ref = ray.put((nk[o], nn[o]))

    cust = customer.select_columns(["c_custkey", "c_nationkey"])
    ords = orders.select_columns(["o_orderkey", "o_custkey"])
    oj = hash_join(
        ords, cust, on=("o_custkey",), right_on=("c_custkey",), num_partitions=npart
    ).select_columns(["o_orderkey", "c_nationkey"])

    def li_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
        order = np.argsort(ok, kind="stable")
        oks, revs = ok[order], rev[order]
        b = np.flatnonzero(np.r_[True, oks[1:] != oks[:-1]])
        return pa.table(
            {"l_orderkey": oks[b], "r": np.add.reduceat(revs, b).astype(np.int64)}
        )

    li = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(
        li, oj, on=("l_orderkey",), right_on=("o_orderkey",), num_partitions=npart
    )

    def nat_partial(t: pa.Table) -> pa.Table:
        import ray as _ray

        k, names = _ray.get(ref)
        nkey = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        name = names[np.searchsorted(k, nkey)]
        df = pd.DataFrame({"n_name": name, "r": r})
        g = df.groupby("n_name", sort=False)["r"].sum()
        return pa.table(
            {"n_name": g.index.to_numpy(dtype=str), "r": g.to_numpy(dtype=np.int64)}
        )

    return (
        j.map_batches(nat_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(Sum("r", alias_name="revenue_e4"))
    )


def order_priority_counts(
    orders: Dataset,
    lineitem: Dataset,
    *,
    broadcast_threshold: int | None = None,
) -> Dataset:
    """TPC-H Q4 shape: count orders per o_orderpriority having at least
    one RETURNED line (l_returnflag='R') — the distributed SEMI-JOIN:
    the probe side reduces to DISTINCT order keys first (per-batch
    np.unique partial), so the join can never duplicate an order.
    Below the dimension gate the distinct key set (⊆ orderkeys, so
    gate-bounded) broadcasts as one sorted array and membership is a
    vectorized searchsorted inside the orders scan — no all-to-all at
    all. Beyond the gate, a bucketed distinct + key-hash inner join
    against orders; both paths end in a 5-row count rollup (per-batch
    pre-combined)."""
    import ray

    npart = default_parallelism()

    def key_partial(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["l_returnflag"], "R")
        ok = t.filter(keep)["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": np.unique(ok)})

    partials = lineitem.select_columns(["l_orderkey", "l_returnflag"]).map_batches(
        key_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def prio_partial(t: pa.Table) -> pa.Table:
        p = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        u, c = np.unique(p, return_counts=True)
        return pa.table(
            {"o_orderpriority": u, "c": c.astype(np.int64)}
        )

    _thr = _BROADCAST_DIM_ROWS if broadcast_threshold is None else broadcast_threshold
    if orders.count() <= _thr:
        keys = np.unique(
            _collect_cols(partials, ["l_orderkey"])["l_orderkey"].to_numpy(
                zero_copy_only=False
            )
        )
        kref = ray.put(keys)

        def member_partial(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
            if len(ks) == 0:
                return pa.table(
                    {
                        "o_orderpriority": pa.array([], t.schema.field(
                            "o_orderpriority"
                        ).type),
                        "c": pa.array([], pa.int64()),
                    }
                )
            pos = np.searchsorted(ks, ok)
            pos_c = np.minimum(pos, len(ks) - 1)
            hit = ks[pos_c] == ok
            return prio_partial(t.filter(pa.array(hit)))

        j = orders.select_columns(["o_orderkey", "o_orderpriority"]).map_batches(
            member_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        return j.groupby("o_orderpriority").aggregate(
            Sum("c", alias_name="order_count")
        )

    # Materialized so emptiness is a metadata check: Ray 2.49's native
    # join builds each partition table with ArrowBlockBuilder, so a
    # GLOBALLY empty side yields zero-column partition tables and acero
    # raises; the distinct key set is semi-join-bounded (⊆ orderkeys),
    # so pinning it is safe at any scale.
    rkeys = bucketed_distinct(partials, "l_orderkey").materialize()
    if rkeys.count() == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "order_count": pa.array([], pa.int64()),
                }
            )
        )
    j = hash_join(
        orders.select_columns(["o_orderkey", "o_orderpriority"]),
        rkeys,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
        num_partitions=npart,
    )

    return (
        j.map_batches(prio_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority")
        .aggregate(Sum("c", alias_name="order_count"))
    )


def customer_order_distribution(customer: Dataset, orders: Dataset) -> Dataset:
    """TPC-H Q13 shape: (c_count, custdist) — how many customers placed
    exactly N orders, INCLUDING the zero bucket. No outer join needed:
    per-customer order counts come from one keyed sum over per-batch
    partials, the count-of-counts is another per-batch partial + a tiny
    keyed sum, and the 0 row is n_customers − n_customers_with_orders
    (two scalar counts). Assumes o_custkey ⊆ c_custkey (enforced by the
    generator; a violation would surface as a negative zero-bucket,
    asserted)."""
    per_cust = (
        orders.select_columns(["o_custkey"])
        .map_batches(
            lambda t: pa.table(
                dict(
                    zip(
                        ("o_custkey", "n"),
                        (lambda u, c: (u, c.astype(np.int64)))(
                            *np.unique(
                                t["o_custkey"].to_numpy(zero_copy_only=False),
                                return_counts=True,
                            )
                        ),
                    )
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    per_cust = bucketed_group_sum(per_cust, "o_custkey", "n").map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_count"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        n = t["c_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(n, return_counts=True)
        return pa.table({"c_count": u, "d": c.astype(np.int64)})

    dist = (
        per_cust.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_count")
        .aggregate(Sum("d", alias_name="custdist"))
        .materialize()
    )
    n_customers = customer.count()
    n_with = int(
        sum(
            int(t["custdist"].to_numpy(zero_copy_only=False).sum())
            for t in dist.iter_batches(batch_format="pyarrow", batch_size=None)
        )
    )
    zero = n_customers - n_with
    if zero < 0:
        raise ValueError("orders reference custkeys absent from customer")
    if zero == 0:
        return dist
    return dist.union(
        rd.from_arrow(
            pa.table(
                {
                    "c_count": pa.array([0], pa.int64()),
                    "custdist": pa.array([zero], pa.int64()),
                }
            )
        )
    )


def returned_top_customers(
    customer: Dataset,
    orders: Dataset,
    lineitem: Dataset,
    *,
    k: int = 20,
    broadcast_threshold: int | None = None,
) -> Dataset:
    """TPC-H Q10 shape: top-k customers by revenue from RETURNED lines
    (l_returnflag='R'), name attached. Below the dimension gate the
    orderkey→custkey map broadcasts once (`ray.put`) and the fact scan
    is join-free: one fused pass filters R-lines, computes revenue, maps
    order→customer and pre-groups per customer inside each batch.
    Beyond the gate, revenue pre-combines per order key inside each
    lineitem batch and one key-hash join maps order→cust. Either way a
    customer-keyed bucketed sum + (revenue desc, custkey asc) top-k
    finishes, and the k-row result broadcast-filters the customer table
    for the name attach (no full-table join for k rows)."""
    import ray

    npart = default_parallelism()

    _thr = _BROADCAST_DIM_ROWS if broadcast_threshold is None else broadcast_threshold
    if orders.count() <= _thr:
        oc_ref = _int_lookup_ref(orders, "o_orderkey", "o_custkey")

        def fused_pass(t: pa.Table) -> pa.Table:
            ocl = ray.get(oc_ref)
            keep = pc.equal(t["l_returnflag"], "R")
            t = t.filter(keep)
            ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = t["l_discount"].to_numpy(zero_copy_only=False)
            rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
            _, ck = ocl.get(ok)
            order = np.argsort(ck, kind="stable")
            cks, revs = ck[order], rev[order]
            b = np.flatnonzero(np.r_[True, cks[1:] != cks[:-1]])
            return pa.table(
                {
                    "o_custkey": cks[b],
                    "r": np.add.reduceat(revs, b).astype(np.int64),
                }
            )

        summed = lineitem.select_columns(
            ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]
        ).map_batches(fused_pass, batch_format="pyarrow", zero_copy_batch=True)
    else:

        def li_partial(t: pa.Table) -> pa.Table:
            keep = pc.equal(t["l_returnflag"], "R")
            t = t.filter(keep)
            ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = t["l_discount"].to_numpy(zero_copy_only=False)
            rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
            order = np.argsort(ok, kind="stable")
            oks, revs = ok[order], rev[order]
            b = np.flatnonzero(np.r_[True, oks[1:] != oks[:-1]])
            return pa.table(
                {"l_orderkey": oks[b], "r": np.add.reduceat(revs, b).astype(np.int64)}
            )

        li = lineitem.select_columns(
            ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]
        ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
        j = hash_join(
            li,
            orders.select_columns(["o_orderkey", "o_custkey"]),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
            num_partitions=npart,
        )
        summed = j.map_batches(
            lambda t: t.select(["o_custkey", "r"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    topk = (
        bucketed_group_sum(summed, "o_custkey", "r")
        .map_batches(
            lambda t: t.rename_columns(["o_custkey", "revenue_e4"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort(["revenue_e4", "o_custkey"], descending=[True, False])
        .limit(k)
        .materialize()
    )
    ktab = pa.concat_tables(
        list(topk.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    kk = ktab["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    rv = ktab["revenue_e4"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(kk, kind="stable")
    ref = ray.put((kk[o], rv[o]))

    def attach_name(t: pa.Table) -> pa.Table:
        import ray as _ray

        keys, revs = _ray.get(ref)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, ck)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = keys[pos_c] == ck
        idx = np.nonzero(hit)[0]
        return pa.table(
            {
                "c_custkey": ck[idx],
                "c_name": t["c_name"].take(pa.array(idx)),
                "revenue_e4": revs[pos_c[idx]],
            }
        )

    return customer.select_columns(["c_custkey", "c_name"]).map_batches(
        attach_name, batch_format="pyarrow", zero_copy_batch=True
    )


def copurchase_pairs(lineitem: Dataset, *, min_orders: int = 2) -> Dataset:
    """(p1, p2, n_orders): unordered part pairs bought together in at
    least `min_orders` orders — the relational→graph bridge (the
    co-occurrence edge derivation behind recommendation graphs; feed
    the output straight into the engine's PageRank/CC/community ops).

    Plan: bucket rows by ORDER key (one small-int keyed shuffle; an
    order's lines always share a bucket, so per-order pair generation
    is local and exact), per-bucket distinct (order, part) self-merge
    emits packed-int64 pair partials, and a bucket-per-group sum +
    threshold filter finishes. Pair keys pack as (p1 << 31) | p2 —
    partkeys wider than 31 bits would need the two-column fallback
    (asserted)."""
    from .events import _bucket_by_key

    shift = np.int64(31)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lp = df.drop_duplicates(["l_orderkey", "l_partkey"])
        if lp["l_partkey"].max() >= 2**31:
            raise ValueError("copurchase_pairs packed keys need partkey < 2^31")
        m = lp.merge(lp, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        k = (
            m["l_partkey_x"].to_numpy(dtype=np.int64) << shift
        ) | m["l_partkey_y"].to_numpy(dtype=np.int64)
        u, cnt = np.unique(k, return_counts=True)
        return pd.DataFrame({"k": u, "n": cnt.astype(np.int64)})

    parts = (
        _bucket_by_key(
            lineitem.select_columns(["l_orderkey", "l_partkey"]),
            "l_orderkey",
            ["l_orderkey", "l_partkey"],
        )
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
    )

    def add_kb(df: pd.DataFrame) -> pd.DataFrame:
        nb = max(8, default_parallelism())
        df = df.copy()
        df["_kb"] = (df["k"].to_numpy(dtype=np.int64) * np.int64(0x9E3779B9)) % nb
        return df

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", sort=False)["n"].sum()
        g = g[g >= min_orders]
        k = g.index.to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "p1": k >> shift,
                "p2": k & ((np.int64(1) << shift) - 1),
                "n_orders": g.to_numpy(dtype=np.int64),
            }
        )

    return (
        parts.map_batches(add_kb, batch_format="pandas")
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(bucket_sum, batch_format="pandas")
    )


_ANTI_BROADCAST_KEYS = 5_000_000  # ~40 MB of int64 keys


def inactive_customers(
    customer: Dataset,
    orders: Dataset,
    *,
    broadcast_threshold: int = _ANTI_BROADCAST_KEYS,
) -> Dataset:
    """c_custkey of customers with NO orders — the distributed
    ANTI-JOIN exposed as a first-class relational op (corpus_prep uses
    the same shape to subtract dropped duplicates). The probe side
    reduces to DISTINCT order custkeys first (per-batch np.unique +
    one keyed count); below the threshold the key set broadcasts once
    and each customer batch drops hits locally (zero further shuffle),
    beyond it a left-outer hash join keeps the null-probe rows."""
    import ray

    from ..stages.joins import hash_join

    okeys = (
        orders.select_columns(["o_custkey"])
        .map_batches(
            lambda t: pa.table(
                {"o_custkey": np.unique(t["o_custkey"].to_numpy(zero_copy_only=False))}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    okeys = bucketed_distinct(okeys, "o_custkey").materialize()

    if okeys.count() <= broadcast_threshold:
        keys = np.sort(
            np.concatenate(
                [
                    t["o_custkey"].to_numpy(zero_copy_only=False)
                    for t in okeys.iter_batches(
                        batch_format="pyarrow", batch_size=None
                    )
                ]
                or [np.array([], dtype=np.int64)]
            ).astype(np.int64)
        )
        ref = ray.put(keys)

        def anti(t: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ks) == 0:
                return pa.table({"c_custkey": ck})
            pos = np.minimum(np.searchsorted(ks, ck), len(ks) - 1)
            return pa.table({"c_custkey": ck[ks[pos] != ck]})

        return customer.select_columns(["c_custkey"]).map_batches(
            anti, batch_format="pyarrow", zero_copy_batch=True
        )

    npart = default_parallelism()
    j = hash_join(
        customer.select_columns(["c_custkey"]),
        okeys.map_batches(
            lambda t: t.append_column(
                "_hit", pa.array(np.ones(len(t), dtype=np.int64))
            ).rename_columns(["c_custkey", "_hit"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        on=("c_custkey",),
        join_type="left_outer",
        num_partitions=npart,
    )
    return j.map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t.filter(pc.is_null(t["_hit"]))[
                    "c_custkey"
                ].combine_chunks()
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def revenue_rollup(
    customer: Dataset,
    orders: Dataset,
    lineitem: Dataset,
    nation: Dataset,
    *,
    broadcast_threshold: int | None = None,
) -> Dataset:
    """ROLLUP(n_name, o_orderpriority) over discounted revenue: the
    fine (nation, priority) cells PLUS per-nation subtotals PLUS the
    grand total, with 'ALL' as the rollup marker — multi-level
    aggregation in ONE scan: the coarser levels derive from the fine
    aggregate (vocabulary-sized: |nations|·|priorities| rows), never
    by re-reading the fact table. High-cardinality rollups would chain
    another keyed groupby over the fine cells instead of the driver
    fold used here (documented small). Below the dimension gate the
    orderkey→(custkey, priority-code) and custkey→nationkey maps
    broadcast and the fact scan is join-free."""
    import ray

    npart = default_parallelism()

    _thr = _BROADCAST_DIM_ROWS if broadcast_threshold is None else broadcast_threshold
    if orders.count() <= _thr and customer.count() <= _thr:
        from ..stages.joins import put_lookup as _pl

        ntab = _collect_cols(nation, ["n_nationkey", "n_name"])
        nk = ntab["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = ntab["n_name"].to_numpy(zero_copy_only=False).astype(str)
        no = np.argsort(nk, kind="stable")
        otab = _collect_cols(orders, ["o_orderkey", "o_custkey", "o_orderpriority"])
        prio = otab["o_orderpriority"].to_numpy(zero_copy_only=False).astype(str)
        pvocab, pcode = np.unique(prio, return_inverse=True)
        okey_tab = pa.table(
            {
                "k": otab["o_orderkey"],
                "c": pa.array(pcode.astype(np.int64)),
            }
        )
        oc_ref = _pl(otab.select(["o_orderkey", "o_custkey"]), "o_orderkey", "o_custkey")
        op_ref = _pl(okey_tab, "k", "c")
        cn_ref = _int_lookup_ref(customer, "c_custkey", "c_nationkey")
        dims_ref = ray.put((nk[no], nn[no], pvocab))

        def one_pass(t: pa.Table) -> pa.Table:
            ocl = ray.get(oc_ref)
            opl = ray.get(op_ref)
            cnl = ray.get(cn_ref)
            keys, names, pv = ray.get(dims_ref)
            ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = t["l_discount"].to_numpy(zero_copy_only=False)
            rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
            _, ck = ocl.get(ok)
            _, pc_ = opl.get(ok)
            _, nkey = cnl.get(ck)
            name = names[np.searchsorted(keys, nkey)]
            df = pd.DataFrame(
                {"n_name": name, "o_orderpriority": pv[pc_], "r": rev}
            )
            g = df.groupby(["n_name", "o_orderpriority"], sort=False)["r"].sum()
            out = g.reset_index()
            out["r"] = out["r"].astype(np.int64)
            return pa.Table.from_pandas(out, preserve_index=False)

        fine = (
            lineitem.select_columns(
                ["l_orderkey", "l_extendedprice", "l_discount"]
            )
            .map_batches(one_pass, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["n_name", "o_orderpriority"])
            .aggregate(Sum("r", alias_name="revenue_e4"))
            .materialize()
        )
        return _rollup_finalize(fine)

    ntab = pa.concat_tables(
        list(
            nation.select_columns(["n_nationkey", "n_name"]).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    )
    nk = ntab["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = ntab["n_name"].to_numpy(zero_copy_only=False).astype(str)
    o = np.argsort(nk, kind="stable")
    ref = ray.put((nk[o], nn[o]))

    cust = customer.select_columns(["c_custkey", "c_nationkey"])
    ords = orders.select_columns(["o_orderkey", "o_custkey", "o_orderpriority"])
    oj = hash_join(
        ords, cust, on=("o_custkey",), right_on=("c_custkey",), num_partitions=npart
    ).select_columns(["o_orderkey", "c_nationkey", "o_orderpriority"])

    def li_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
        order = np.argsort(ok, kind="stable")
        oks, revs = ok[order], rev[order]
        b = np.flatnonzero(np.r_[True, oks[1:] != oks[:-1]])
        return pa.table(
            {"l_orderkey": oks[b], "r": np.add.reduceat(revs, b).astype(np.int64)}
        )

    li = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(
        li, oj, on=("l_orderkey",), right_on=("o_orderkey",), num_partitions=npart
    )

    def cell_partial(t: pa.Table) -> pa.Table:
        import ray as _ray

        k, names = _ray.get(ref)
        nkey = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {
                "n_name": names[np.searchsorted(k, nkey)],
                "o_orderpriority": t["o_orderpriority"].to_numpy(
                    zero_copy_only=False
                ),
                "r": r,
            }
        )
        g = df.groupby(["n_name", "o_orderpriority"], sort=False)["r"].sum()
        out = g.reset_index()
        out["r"] = out["r"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    fine = (
        j.map_batches(cell_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["n_name", "o_orderpriority"])
        .aggregate(Sum("r", alias_name="revenue_e4"))
        .materialize()
    )
    return _rollup_finalize(fine)


def _rollup_finalize(fine: Dataset) -> Dataset:
    """Derive subtotals + grand total from the vocabulary-sized fine
    cells (driver fold, documented small)."""
    ftab = pa.concat_tables(
        list(fine.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    fdf = ftab.to_pandas()
    sub = (
        fdf.groupby("n_name", sort=False)["revenue_e4"].sum().reset_index()
    )
    sub["o_orderpriority"] = "ALL"
    grand = pd.DataFrame(
        {
            "n_name": ["ALL"],
            "o_orderpriority": ["ALL"],
            "revenue_e4": [np.int64(fdf["revenue_e4"].sum())],
        }
    )
    out = pd.concat(
        [fdf, sub[["n_name", "o_orderpriority", "revenue_e4"]], grand],
        ignore_index=True,
    )
    out["revenue_e4"] = out["revenue_e4"].astype(np.int64)
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


def order_line_stats(lineitem: Dataset) -> Dataset:
    """(n_lines, n_orders): the fact-table fan-out profile — how many
    orders have exactly N line items. The capacity-planning histogram
    for any order-bucketed stage (copurchase_pairs' per-bucket pair
    generation is quadratic in this fan-out). Two summary-proportional
    reduces: per-batch partial counts per order key → one keyed sum
    (order-count bounded), then a histogram partial → a tiny keyed
    sum (distinct-fan-out bounded)."""
    per_order = (
        lineitem.select_columns(["l_orderkey"])
        .map_batches(
            lambda t: pa.table(
                dict(
                    zip(
                        ("l_orderkey", "n"),
                        (lambda u, c: (u, c.astype(np.int64)))(
                            *np.unique(
                                t["l_orderkey"].to_numpy(zero_copy_only=False),
                                return_counts=True,
                            )
                        ),
                    )
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    per_order = bucketed_group_sum(per_order, "l_orderkey", "n").map_batches(
        lambda t: t.rename_columns(["l_orderkey", "n_lines"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        n = t["n_lines"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(n, return_counts=True)
        return pa.table({"n_lines": u, "d": c.astype(np.int64)})

    return (
        per_order.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("n_lines")
        .aggregate(Sum("d", alias_name="n_orders"))
    )


def orders_by_month(orders: Dataset) -> Dataset:
    """(month, n_orders, total_cents): monthly order volume and value —
    calendar bucketing (variable-length months, not fixed windows:
    datetime64[M] truncation here, strftime in the oracle, identical
    labels). Per-batch partials; the keyed aggregate sees one row per
    distinct month."""

    def partial(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        month = np.datetime_as_string(ts.astype("datetime64[M]"))
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"month": month, "c": cents})
        g = df.groupby("month", sort=False).agg(n=("c", "size"), s=("c", "sum"))
        out = g.reset_index()
        out["n"] = out["n"].astype(np.int64)
        out["s"] = out["s"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        orders.select_columns(["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("month")
        .aggregate(
            Sum("n", alias_name="n_orders"), Sum("s", alias_name="total_cents")
        )
    )
