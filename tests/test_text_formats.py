"""JSONL/CSV document IO: round-trip identity (incl. newlines, commas,
quotes, unicode), schema gate failures are loud."""

from __future__ import annotations

import tempfile

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.sources.text_formats import (
    read_csv_docs,
    read_jsonl_docs,
    write_csv_docs,
    write_jsonl_docs,
)

NASTY = [
    "plain text",
    "comma, separated, values",
    'quoted "text" here',
    "line\nbreak inside",
    "unicode: καλημέρα — naïve",
    "",
    "tab\tand trailing space ",
]


def _docs():
    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(len(NASTY), dtype=np.int64),
                "text": NASTY,
            }
        )
    ).repartition(3)


@pytest.mark.parametrize(
    "write,read",
    [(write_jsonl_docs, read_jsonl_docs), (write_csv_docs, read_csv_docs)],
    ids=["jsonl", "csv"],
)
def test_roundtrip_identity(write, read, ray_session):
    tmp = tempfile.mkdtemp(prefix="fmt_rt_")
    write(_docs(), tmp)
    back = read(tmp).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(back.columns) == ["doc_id", "text"]
    assert back["doc_id"].dtype == np.int64
    assert list(back["text"]) == NASTY


def test_schema_gate_is_loud(ray_session):
    import json
    import os

    tmp = tempfile.mkdtemp(prefix="fmt_bad_")
    with open(os.path.join(tmp, "bad.json"), "w") as f:
        f.write(json.dumps({"id_wrong": 1, "body": "x"}) + "\n")
    with pytest.raises(Exception, match="missing columns"):
        read_jsonl_docs(tmp).to_pandas()
