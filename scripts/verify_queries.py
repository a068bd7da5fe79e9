"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet views, and compares
row count, column names/dtypes, and an order-insensitive value
comparison. Usage:  python scripts/verify_queries.py [sf_dir] [name...]

Pass ``--json OUT.json`` to also write a per-query record in the same
shape as the driver's CORRECTNESS_r*.json (rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err), so the full registered
query list has a committed pass artifact each round.
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
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

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
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            "ray_sec": None,
        }
        records[name] = rec
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            rec["err"] = f"query raised {type(e).__name__}: {e}"
            print(f"FAIL {name}: {rec['err']}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        rec["ray_sec"] = round(dt, 3)
        rec["spark_rows"] = int(len(ray_df))
        if name not in oracles:
            rec["rows_match"] = len(ray_df) >= 0
            rec["schema_match"] = None
            rec["hash_match"] = None
            rec["err"] = "rows-only (no oracle by design)"
            print(f"ok   {name}: rows={len(ray_df)} ({dt:.1f}s) [rows-only, no oracle]")
            continue
        t1 = time.perf_counter()
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:
            rec["err"] = f"oracle SQL raised {type(e).__name__}: {e}"
            print(f"FAIL {name}: {rec['err']}")
            failures += 1
            continue
        dts = time.perf_counter() - t1
        rec["oracle_rows"] = int(len(sql_df))
        problems = compare(name, ray_df, sql_df)
        rec["schema_match"] = not any(p.startswith("columns differ") for p in problems)
        rec["rows_match"] = len(ray_df) == len(sql_df)
        rec["hash_match"] = not problems
        if problems:
            failures += 1
            rec["err"] = "; ".join(problems)
            print(f"FAIL {name}: ({dt:.1f}s ray, {dts:.1f}s sql)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name}: rows={len(ray_df)} ({dt:.1f}s ray, {dts:.1f}s sql)")
    ray.shutdown()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(records, f, indent=1, default=str)
        print(f"wrote {json_out}: {len(records)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
