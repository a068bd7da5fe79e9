"""End-to-end CLI: pages parquet in -> partitioned labels out, with
checkpointing. Runs main() in-process (Ray session already owned by the
test fixture; the CLI's init is guarded)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from fixtures.synth_pages import g_ring_of_cliques, pages_table, page_url
from pds_hw2_mpi_connected_components_ray.cli import main
from pds_hw2_mpi_connected_components_ray.functions.urls import mint_id
from pds_hw2_mpi_connected_components_ray.sources.sinks import read_partitioned
from tests.oracles import cc_union_find


def test_cli_end_to_end(tmp_path, capsys):
    g = g_ring_of_cliques()
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages_table(g), pages_path)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    rc = main(
        [
            "--pages", pages_path,
            "--out", out,
            "--checkpoint-dir", ck,
            "--analytics", "cc,triangles",
            "--out-partitions", "8",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["outputs"]["cc"]["n_components"] == 1
    assert report["outputs"]["triangles"]["total"] == 20 * 120  # 20 * C(10,3)
    # labels on disk match the oracle through the url->id mint
    labels = read_partitioned(f"{out}/cc_labels").to_pandas()
    oracle = cc_union_find(g.n, g.edges)
    id2vertex = {mint_id(page_url(v)): v for v in range(g.n)}
    min_id = min(mint_id(page_url(v)) for v in range(g.n))  # noqa: F841
    got = dict(zip(labels["vertex"], labels["label"]))
    # every page's component representative maps back to one oracle component
    comp_of_label: dict[int, int] = {}
    for vid, lab in got.items():
        v = id2vertex[vid]
        c = oracle[v]
        comp_of_label.setdefault(lab, c)
        assert comp_of_label[lab] == c
    # checkpoints were written
    assert any(d.startswith("superstep_") for d in os.listdir(ck))


def test_cli_prep_end_to_end(tmp_path, capsys):
    from fixtures.synth_pages import near_dup_documents
    from pds_hw2_mpi_connected_components_ray.cli_prep import main as prep_main

    docs_path = str(tmp_path / "docs.parquet")
    tab = near_dup_documents()
    pq.write_table(tab, docs_path)
    out = str(tmp_path / "prep_out")
    rc = prep_main(["--docs", docs_path, "--out", out, "--out-partitions", "4"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    df = tab.to_pandas()
    n_exact_copies = int(df["source"].str.startswith("exact").sum())
    assert report["n_after_quality_and_exact"] == len(df) - n_exact_copies
    assert report["n_kept"] < report["n_after_quality_and_exact"]  # near dups collapsed
    kept = read_partitioned(f"{out}/kept_ids").to_pandas()
    assert len(kept) == report["n_kept"]
    groups = read_partitioned(f"{out}/dup_groups").to_pandas()
    assert (groups["group_id"] <= groups["doc_id"]).all()


def test_cli_mtx_input(tmp_path, capsys):
    """The reference workflow verbatim: .mtx in → CC out. Two cliques
    {1,2,3} and {4,5} (1-based mtx ids → 0-based vertices)."""
    p = tmp_path / "g.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "5 5 4\n"
        "2 1\n3 1\n3 2\n5 4\n"
    )
    out = str(tmp_path / "out")
    rc = main(["--mtx", str(p), "--out", out, "--analytics", "cc,triangles"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["outputs"]["cc"]["n_components"] == 2
    assert report["outputs"]["triangles"]["total"] == 1
    labels = read_partitioned(f"{out}/cc_labels").to_pandas()
    got = dict(zip(labels["vertex"], labels["label"]))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}


def test_cli_bin_input(tmp_path, capsys):
    """Converted .bin in → same result (the solver-side input path)."""
    import numpy as np

    from pds_hw2_mpi_connected_components_ray.sources.mtx import write_bin

    # symmetric expanded edges of a path 0-1-2
    e = np.array([[0, 1], [1, 0], [1, 2], [2, 1]], dtype=np.int64)
    p = tmp_path / "g.bin"
    write_bin(str(p), 3, e)
    out = str(tmp_path / "out2")
    rc = main(["--bin", str(p), "--out", out, "--analytics", "cc"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["outputs"]["cc"]["n_components"] == 1
