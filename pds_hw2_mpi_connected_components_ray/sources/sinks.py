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


# ----------------------------------------------------- zone-map layout


def write_sorted_zonemap(
    ds: Dataset,
    root: str,
    key: str,
    num_files: int = 32,
) -> dict:
    """Range-layout writer with per-file zone maps: rows are range-
    bucketed on `key` (equi-width over the observed [min, max] — exact
    for any bucketing, balanced for the uniform keys this engine
    mints), each bucket sorted and written as one file, and a manifest
    records every file's (min, max) of `key`. `read_zonemap_range`
    then opens ONLY files whose zone intersects the predicate — the
    storage-pruning path that makes point/range lookups on a 100-TB
    table read file-count-proportional bytes, not table-proportional.

    Atomic like write_partitioned: tmp dir -> rename, _SUCCESS last.

    MULTI-NODE CONTRACT (ADVICE r3): zone files are written by Ray
    worker tasks, so `root` must live on storage every node shares
    (NFS / object store / fuse mount) — on a multi-node cluster a
    node-local path scatters the files across hosts. The publish step
    below verifies every zone file reported by the workers is actually
    visible on the driver's filesystem and refuses to publish an
    incomplete layout instead of silently writing a manifest that
    points at missing files.
    """
    import pyarrow.parquet as pq

    from ray.data.aggregate import Max, Min

    stats = ds.aggregate(Min(key), Max(key))
    kmin = int(stats[f"min({key})"])
    kmax = int(stats[f"max({key})"])
    width = max(1, (kmax - kmin) // num_files + 1)

    tmp = root + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    def bucket(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_zb", pa.array(((k - kmin) // width).astype(np.int64))
        )

    def write_group(g):
        import pandas as pd_

        b = int(g["_zb"].iloc[0])
        out = g.drop(columns=["_zb"]).sort_values(key, kind="stable")
        pq.write_table(
            pa.Table.from_pandas(out, preserve_index=False),
            os.path.join(tmp, f"zone-{b:05d}.parquet"),
        )
        return pd_.DataFrame(
            {
                "zone": [b],
                "rows": [len(out)],
                "zmin": [int(out[key].iloc[0])],
                "zmax": [int(out[key].iloc[-1])],
            }
        )

    report = (
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_zb")
        .map_groups(write_group, batch_format="pandas")
        .to_pandas()  # num_files rows
        .sort_values("zone")
    )
    manifest = {
        "key": key,
        "files": [
            {
                "file": f"zone-{int(r.zone):05d}.parquet",
                "min": int(r.zmin),
                "max": int(r.zmax),
                "rows": int(r.rows),
            }
            for r in report.itertuples()
        ],
    }
    missing = [
        e["file"]
        for e in manifest["files"]
        if not os.path.exists(os.path.join(tmp, e["file"]))
    ]
    if missing:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"write_sorted_zonemap: {len(missing)} zone file(s) reported by "
            f"workers are not visible on the driver (e.g. {missing[:3]}). "
            f"`{root}` must be on storage shared by every node (NFS/object "
            "store); node-local paths scatter zone files across hosts on a "
            "multi-node cluster. Nothing was published."
        )
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("")
    if os.path.exists(root):
        shutil.rmtree(root)
    os.rename(tmp, root)
    return manifest


def read_zonemap_range(root: str, lo: int, hi: int):
    """Dataset of rows with key in [lo, hi], reading ONLY intersecting
    files (returns (dataset, n_files_read, n_files_total)); the residual
    in-file filter still applies (zones bound, they don't partition
    exactly at the predicate edges)."""
    import ray.data as rd

    if not os.path.exists(os.path.join(root, "_SUCCESS")):
        raise FileNotFoundError(f"no complete zonemap layout at {root}")
    with open(os.path.join(root, "manifest.json")) as f:
        manifest = json.load(f)
    key = manifest["key"]
    hit = [
        fi["file"]
        for fi in manifest["files"]
        if fi["min"] <= hi and fi["max"] >= lo
    ]
    if not hit:
        empty = rd.from_items([])
        return empty, 0, len(manifest["files"])
    ds = rd.read_parquet([os.path.join(root, h) for h in hit])

    def residual(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((k >= lo) & (k <= hi)))

    return (
        ds.map_batches(residual, batch_format="pyarrow", zero_copy_batch=True),
        len(hit),
        len(manifest["files"]),
    )
