"""JSONL / CSV document IO — the interchange formats every training-
data pipeline meets at its edges (raw crawls arrive as JSONL shards;
labeling tools want CSV). Reads delegate to Ray Data's native readers
(`read_json` / `read_csv`: distributed, file-per-task, streaming) and
then ENFORCE the documents schema — column presence, int64 ids,
non-null text — so a malformed shard fails loudly at the read instead
of corrupting a downstream join. Writes shard one file per block
(never one giant file) via the native writers.

Round-trip contract: write_jsonl_docs → read_jsonl_docs is the
identity on (doc_id, text) — exercised by the `jsonl_roundtrip`
driver query whose oracle is the parquet source itself.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

_DOC_COLS = ["doc_id", "text"]


def _enforce_doc_schema(ds: Dataset, cols: list[str]) -> Dataset:
    def check(t: pa.Table) -> pa.Table:
        missing = [c for c in cols if c not in t.column_names]
        if missing:
            raise ValueError(
                f"document shard is missing columns {missing}; has "
                f"{t.column_names}"
            )
        out = {}
        for c in cols:
            col = t[c]
            if c == "doc_id":
                if not pa.types.is_integer(col.type):
                    col = pc.cast(col, pa.int64())
                elif col.type != pa.int64():
                    col = pc.cast(col, pa.int64())
            elif pa.types.is_large_string(col.type):
                col = pc.cast(col, pa.string())
            if c == "text":
                col = pc.fill_null(col, "")
            out[c] = col
        return pa.table(out)

    return ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)


def read_jsonl_docs(path: str, *, cols: list[str] | None = None) -> Dataset:
    """Distributed JSONL read with the documents-schema gate."""
    return _enforce_doc_schema(rd.read_json(path), cols or _DOC_COLS)


def write_jsonl_docs(ds: Dataset, path: str, *, cols: list[str] | None = None) -> str:
    """Sharded JSONL write (one file per block)."""
    ds.select_columns(cols or _DOC_COLS).write_json(path)
    return path


def read_csv_docs(path: str, *, cols: list[str] | None = None) -> Dataset:
    """Distributed CSV read with the documents-schema gate."""
    return _enforce_doc_schema(rd.read_csv(path), cols or _DOC_COLS)


def write_csv_docs(ds: Dataset, path: str, *, cols: list[str] | None = None) -> str:
    """Sharded CSV write (one file per block)."""
    ds.select_columns(cols or _DOC_COLS).write_csv(path)
    return path
