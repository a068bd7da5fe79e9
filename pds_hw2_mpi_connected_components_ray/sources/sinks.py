"""Resumable partitioned Parquet sink.

Layout: one sub-directory per partition key range, written atomically
(tmp dir -> rename, `_SUCCESS` marker last) with a manifest of finished
partitions -- so a failed run re-executes only the missing partitions
instead of one giant non-restartable write (SURVEY.md "Resumable
output"; same pattern as state/checkpoint.py)."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def _part_dir(root: str, part: int) -> str:
    return os.path.join(root, f"part={part:05d}")


def finished_partitions(root: str) -> set[int]:
    if not os.path.isdir(root):
        return set()
    out = set()
    for name in os.listdir(root):
        if name.startswith("part=") and os.path.exists(
            os.path.join(root, name, "_SUCCESS")
        ):
            out.add(int(name.split("=")[1]))
    return out


def write_partitioned(
    ds: Dataset,
    root: str,
    key: str,
    num_partitions: int = 64,
    resume: bool = True,
) -> dict:
    """Write `ds` as hash(key)-partitioned Parquet; skip partitions that
    already have a `_SUCCESS` marker when resuming.

    Returns {"written": [...], "skipped": [...]} partition ids.
    """
    os.makedirs(root, exist_ok=True)
    done = finished_partitions(root) if resume else set()

    def bucket(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        return t.append_column("_part", pa.array((k % num_partitions).astype(np.int64)))

    bucketed = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)

    written: list[int] = []
    import pyarrow.parquet as pq

    def write_group(g):
        import pandas as pd_

        part = int(g["_part"].iloc[0])
        if part in done:
            return pd_.DataFrame({"part": [part], "rows": [0], "skipped": [True]})
        final = _part_dir(root, part)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        out = g.drop(columns=["_part"])
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       os.path.join(tmp, "data.parquet"))
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        with open(os.path.join(final, "_SUCCESS"), "w") as f:
            f.write("")
        return pd_.DataFrame({"part": [part], "rows": [len(out)], "skipped": [False]})

    report = (
        bucketed.groupby("_part").map_groups(write_group, batch_format="pandas").to_pandas()
    )
    with open(os.path.join(root, "manifest.json"), "w") as f:
        json.dump(
            {
                "key": key,
                "num_partitions": num_partitions,
                "finished": sorted(finished_partitions(root)),
            },
            f,
        )
    return {
        "written": sorted(report[~report["skipped"]]["part"].tolist()),
        "skipped": sorted(report[report["skipped"]]["part"].tolist()),
    }


def read_partitioned(root: str):
    import ray.data as rd

    parts = sorted(finished_partitions(root))
    paths = [os.path.join(_part_dir(root, p), "data.parquet") for p in parts]
    return rd.read_parquet(paths)
