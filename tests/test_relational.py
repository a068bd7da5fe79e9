"""Brute-force pandas checks for the TPC-H-shaped relational pipelines
added in round 3 (semi-join priority counts, order-count distribution
with the zero bucket, returned-revenue top-k with name attach)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _tables(seed: int = 7, n_cust: int = 60, n_orders: int = 200, n_lines: int = 700):
    rng = np.random.default_rng(seed)
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(1, n_cust + 1, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        }
    )
    # ~1/4 of customers place no orders (exercises the zero bucket)
    active = rng.choice(
        cust["c_custkey"].to_numpy(), size=max(1, 3 * n_cust // 4), replace=False
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, n_orders + 1, dtype=np.int64),
            "o_custkey": rng.choice(active, size=n_orders).astype(np.int64),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
                size=n_orders,
            ),
        }
    )
    lines = pd.DataFrame(
        {
            "l_orderkey": rng.integers(1, n_orders + 1, size=n_lines).astype(np.int64),
            "l_extendedprice": np.round(rng.uniform(10, 5000, size=n_lines), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, size=n_lines), 2),
            "l_returnflag": rng.choice(["R", "N", "A"], size=n_lines, p=[0.3, 0.5, 0.2]),
        }
    )
    return cust, orders, lines


def _ds(df: pd.DataFrame, parts: int = 3):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(
        parts
    )


def test_order_priority_counts_brute():
    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        order_priority_counts,
    )

    cust, orders, lines = _tables()
    out = (
        order_priority_counts(_ds(orders), _ds(lines))
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    rkeys = set(lines.loc[lines["l_returnflag"] == "R", "l_orderkey"])
    want = (
        orders[orders["o_orderkey"].isin(rkeys)]
        .groupby("o_orderpriority")
        .size()
        .reset_index(name="order_count")
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert list(out["o_orderpriority"]) == list(want["o_orderpriority"])
    assert np.array_equal(
        out["order_count"].to_numpy(), want["order_count"].to_numpy()
    )


def test_customer_order_distribution_brute():
    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        customer_order_distribution,
    )

    cust, orders, _ = _tables()
    out = (
        customer_order_distribution(_ds(cust), _ds(orders))
        .to_pandas()
        .sort_values("c_count")
        .reset_index(drop=True)
    )
    per = orders.groupby("o_custkey").size()
    counts = cust["c_custkey"].map(per).fillna(0).astype(np.int64)
    want = (
        counts.value_counts()
        .rename_axis("c_count")
        .reset_index(name="custdist")
        .sort_values("c_count")
        .reset_index(drop=True)
    )
    assert np.array_equal(out["c_count"].to_numpy(), want["c_count"].to_numpy())
    assert np.array_equal(out["custdist"].to_numpy(), want["custdist"].to_numpy())
    assert out["custdist"].sum() == len(cust)
    assert 0 in set(out["c_count"])  # fixture plants inactive customers


def test_returned_top_customers_brute():
    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        returned_top_customers,
    )

    cust, orders, lines = _tables()
    out = (
        returned_top_customers(_ds(cust), _ds(orders), _ds(lines), k=10)
        .to_pandas()
        .sort_values(["revenue_e4", "c_custkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    r = lines[lines["l_returnflag"] == "R"].copy()
    r["rev"] = np.floor(
        r["l_extendedprice"] * (1.0 - r["l_discount"]) * 1e4 + 0.5
    ).astype(np.int64)
    m = r.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    want = (
        m.groupby("o_custkey")["rev"]
        .sum()
        .reset_index()
        .sort_values(["rev", "o_custkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert np.array_equal(out["c_custkey"].to_numpy(), want["o_custkey"].to_numpy())
    assert np.array_equal(out["revenue_e4"].to_numpy(), want["rev"].to_numpy())
    names = cust.set_index("c_custkey")["c_name"]
    assert list(out["c_name"]) == [names[k] for k in out["c_custkey"]]


def test_inactive_customers_brute_and_modes():
    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        inactive_customers,
    )

    cust, orders, _ = _tables()
    want = sorted(set(cust["c_custkey"]) - set(orders["o_custkey"]))
    assert len(want) > 0  # fixture plants order-less customers
    for thresh in (5_000_000, 0):  # broadcast anti, then left-outer join
        out = inactive_customers(
            _ds(cust), _ds(orders), broadcast_threshold=thresh
        ).to_pandas()
        assert sorted(out["c_custkey"]) == want


def test_inactive_customers_all_active():
    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        inactive_customers,
    )

    cust = pd.DataFrame({"c_custkey": np.arange(1, 6, dtype=np.int64),
                         "c_name": [f"c{i}" for i in range(5)]})
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 11, dtype=np.int64),
            "o_custkey": np.tile(cust["c_custkey"].to_numpy(), 2),
            "o_orderpriority": ["1-URGENT"] * 10,
        }
    )
    out = inactive_customers(_ds(cust), _ds(orders)).to_pandas()
    assert len(out) == 0


def test_revenue_rollup_levels_consistent():
    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        revenue_rollup,
    )

    cust, orders, lines = _tables()
    cust = cust.copy()
    cust["c_nationkey"] = (cust["c_custkey"] % 4).astype(np.int64)
    nation = pd.DataFrame(
        {
            "n_nationkey": np.arange(4, dtype=np.int64),
            "n_name": ["ALGERIA", "BRAZIL", "CANADA", "DENMARK"],
        }
    )
    out = revenue_rollup(
        _ds(cust), _ds(orders), _ds(lines), _ds(nation, parts=1)
    ).to_pandas()
    fine = out[(out["n_name"] != "ALL") & (out["o_orderpriority"] != "ALL")]
    sub = out[(out["n_name"] != "ALL") & (out["o_orderpriority"] == "ALL")]
    grand = out[(out["n_name"] == "ALL")]
    assert len(grand) == 1
    assert grand["o_orderpriority"].iloc[0] == "ALL"
    # every level re-aggregates exactly from the level below
    assert fine["revenue_e4"].sum() == grand["revenue_e4"].iloc[0]
    per_nation = fine.groupby("n_name")["revenue_e4"].sum()
    for _, row in sub.iterrows():
        assert row["revenue_e4"] == per_nation[row["n_name"]]
    # brute check of one fine cell
    m = lines.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    ).merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    m["rev"] = np.floor(
        m["l_extendedprice"] * (1.0 - m["l_discount"]) * 1e4 + 0.5
    ).astype(np.int64)
    want = m.groupby(["n_name", "o_orderpriority"])["rev"].sum()
    got = fine.set_index(["n_name", "o_orderpriority"])["revenue_e4"]
    assert got.sort_index().equals(want.sort_index().astype(np.int64))


def test_order_line_stats_brute():
    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        order_line_stats,
    )

    _, _, lines = _tables()
    out = (
        order_line_stats(_ds(lines))
        .to_pandas()
        .sort_values("n_lines")
        .reset_index(drop=True)
    )
    per = lines.groupby("l_orderkey").size()
    want = (
        per.value_counts()
        .rename_axis("n_lines")
        .reset_index(name="n_orders")
        .sort_values("n_lines")
        .reset_index(drop=True)
    )
    assert np.array_equal(out["n_lines"].to_numpy(), want["n_lines"].to_numpy())
    assert np.array_equal(out["n_orders"].to_numpy(), want["n_orders"].to_numpy())
    assert (out["n_lines"] * out["n_orders"]).sum() == len(lines)


def test_revenue_pipelines_broadcast_vs_join_modes():
    """The one-pass broadcast plan and the key-hash join plan must
    produce identical results (rollup / by-nation / top-orders)."""
    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        revenue_by_nation,
        revenue_rollup,
        top_orders_by_revenue,
    )

    cust, orders, lines = _tables()
    cust = cust.copy()
    cust["c_nationkey"] = (cust["c_custkey"] % 4).astype(np.int64)
    cust["c_mktsegment"] = np.where(
        cust["c_custkey"] % 2 == 0, "BUILDING", "MACHINERY"
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": np.arange(4, dtype=np.int64),
            "n_name": ["ALGERIA", "BRAZIL", "CANADA", "DENMARK"],
        }
    )

    def norm(ds, cols):
        return ds.to_pandas().sort_values(cols).reset_index(drop=True)

    for thr in (None, 0):
        kw = {} if thr is None else {"broadcast_threshold": 0}
        rn = norm(
            revenue_by_nation(_ds(cust), _ds(orders), _ds(lines), _ds(nation, 1), **kw),
            ["n_name"],
        )
        rr = norm(
            revenue_rollup(_ds(cust), _ds(orders), _ds(lines), _ds(nation, 1), **kw),
            ["n_name", "o_orderpriority"],
        )
        tk = norm(
            top_orders_by_revenue(_ds(cust), _ds(orders), _ds(lines), **kw),
            ["revenue_e4", "o_orderkey"],
        )
        if thr is None:
            base_rn, base_rr, base_tk = rn, rr, tk
        else:
            pd.testing.assert_frame_equal(rn, base_rn)
            pd.testing.assert_frame_equal(rr, base_rr)
            pd.testing.assert_frame_equal(tk, base_tk)


def test_semijoin_topk_broadcast_vs_join_modes():
    """order_priority_counts (Q4) and returned_top_customers (Q10):
    the broadcast membership/lookup plan (default under the dimension
    gate) and the key-hash join plan (broadcast_threshold=0) must be
    identical."""
    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        order_priority_counts,
        returned_top_customers,
    )

    cust, orders, lines = _tables()

    def norm(ds, cols):
        return ds.to_pandas().sort_values(cols).reset_index(drop=True)

    for thr in (None, 0):
        kw = {} if thr is None else {"broadcast_threshold": 0}
        pc_ = norm(
            order_priority_counts(_ds(orders), _ds(lines), **kw),
            ["o_orderpriority"],
        )
        tc = norm(
            returned_top_customers(_ds(cust), _ds(orders), _ds(lines), k=10, **kw),
            ["revenue_e4", "c_custkey"],
        )
        if thr is None:
            base_pc, base_tc = pc_, tc
        else:
            pd.testing.assert_frame_equal(pc_, base_pc)
            pd.testing.assert_frame_equal(tc, base_tc)


def test_order_priority_counts_no_returned_lines():
    """Empty membership set: zero R-lines must yield an empty result on
    both plans (broadcast path hits the len(keys)==0 typed-empty guard)."""
    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        order_priority_counts,
    )

    cust, orders, lines = _tables()
    lines = lines.copy()
    lines["l_returnflag"] = "N"
    for kw in ({}, {"broadcast_threshold": 0}):
        out = order_priority_counts(_ds(orders), _ds(lines), **kw).to_pandas()
        assert len(out) == 0


def test_orders_by_month_brute(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.relational import (
        orders_by_month,
    )

    rng = np.random.default_rng(77)
    n = 300
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_orderdate": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 500, n), unit="D"),
            "o_totalprice": np.round(rng.uniform(10, 9000, n), 2),
        }
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    out = (
        orders_by_month(_ds(orders))
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    w = orders.copy()
    w["month"] = w["o_orderdate"].dt.strftime("%Y-%m")
    w["c"] = np.floor(w["o_totalprice"] * 100 + 0.5).astype(np.int64)
    want = (
        w.groupby("month")
        .agg(n_orders=("c", "size"), total_cents=("c", "sum"))
        .reset_index()
        .sort_values("month")
        .reset_index(drop=True)
    )
    assert list(out["month"]) == list(want["month"])
    assert np.array_equal(out["n_orders"].to_numpy(), want["n_orders"].to_numpy())
    assert np.array_equal(
        out["total_cents"].to_numpy(), want["total_cents"].to_numpy()
    )
