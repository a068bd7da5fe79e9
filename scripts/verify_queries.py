"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet views, and compares
row count, column names/dtypes, and an order-insensitive value
comparison. Usage:  python scripts/verify_queries.py [sf_dir] [name...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns differ: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"row count differs: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = normalize(ray_df), normalize(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                bad = ~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
            else:
                bad = av != bv
            n_bad = int(np.sum(bad))
            if n_bad:
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c}: {n_bad} mismatched values; first at row {i}: ray={av[i]!r} sql={bv[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        # default 8; set VERIFY_CPUS=32 to reproduce the driver's
        # parallelism (some Ray planning decisions — partition counts,
        # empty aggregate partitions — are cpu-count-dependent)
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("VERIFY_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(ray_df)} ({dt:.1f}s) [rows-only, no oracle]")
            continue
        t1 = time.perf_counter()
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dts = time.perf_counter() - t1
        problems = compare(name, ray_df, sql_df)
        if problems:
            failures += 1
            print(f"FAIL {name}: ({dt:.1f}s ray, {dts:.1f}s sql)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name}: rows={len(ray_df)} ({dt:.1f}s ray, {dts:.1f}s sql)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
