"""Reference-format conformance: .mtx semantics and .bin round trips
(FIXTURES.md section 5). Proves the engine's ingestion agrees with the
reference converter (symmetric expansion, 0-based ids, binarization,
self-loops once, duplicates kept)."""

from __future__ import annotations

import numpy as np
import pytest

from fixtures.synth_pages import g_two_cliques
from pds_hw2_mpi_connected_components_ray.sources.mtx import (
    read_bin,
    read_mtx,
    write_bin,
    write_mtx,
)


def test_mtx_roundtrip_two_cliques(tmp_path):
    g = g_two_cliques()
    p = str(tmp_path / "g.mtx")
    write_mtx(p, g.n, g.edges)
    n, edges = read_mtx(p)
    assert n == g.n
    # expanded undirected closure must equal the planted closure
    got = set(map(tuple, edges.tolist()))
    assert got == g.undirected_closure()


def test_mtx_rejects_nonsymmetric(tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("%%MatrixMarket matrix coordinate pattern general\n2 2 1\n1 2\n")
    with pytest.raises(ValueError, match="symmetric"):
        read_mtx(str(p))


def test_mtx_binarizes_and_keeps_selfloops_once(tmp_path):
    p = tmp_path / "v.mtx"
    # valued symmetric: one zero entry (dropped), one self-loop, one edge
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "3 3 3\n"
        "1 1 2.5\n"
        "2 1 0.0\n"
        "3 2 -1.0\n"
    )
    n, edges = read_mtx(str(p))
    got = sorted(map(tuple, edges.tolist()))
    # self-loop (0,0) once; zero entry dropped; (2,1) expanded
    assert got == [(0, 0), (1, 2), (2, 1)]


def test_mtx_dense_array_form(tmp_path):
    p = tmp_path / "d.mtx"
    # 2x2 symmetric dense, column-major lower triangle: a11 a21 a22
    p.write_text("%%MatrixMarket matrix array real symmetric\n2 2\n0.0\n1.0\n0.0\n")
    n, edges = read_mtx(str(p))
    assert sorted(map(tuple, edges.tolist())) == [(0, 1), (1, 0)]


def test_mtx_dense_array_full_block_reference_layout(tmp_path):
    """The reference converter reads a FULL nrows*ncols column-major
    block for array form (mtx_to_bin.c:218-245): every nonzero (i,j)
    emits (i,j) and its mirror, so a symmetric full-dense file yields
    each undirected edge twice per direction (duplicates kept,
    :303-317). Exact file-order conformance."""
    p = tmp_path / "full.mtx"
    # 3x3 symmetric: self-loop at (0,0), edge {1,2}; column-major
    dense_cols = [
        [1.0, 0.0, 0.0],  # col 0
        [0.0, 0.0, 2.0],  # col 1
        [0.0, 2.0, 0.0],  # col 2
    ]
    vals = "\n".join(str(v) for col in dense_cols for v in col)
    p.write_text(f"%%MatrixMarket matrix array real symmetric\n3 3\n{vals}\n")
    n, edges = read_mtx(str(p))
    assert n == 3
    # reference scan order: (0,0) once; (2,1)+mirror; (1,2)+mirror
    assert edges.tolist() == [[0, 0], [2, 1], [1, 2], [1, 2], [2, 1]]


def test_mtx_dense_array_bad_count_rejected(tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("%%MatrixMarket matrix array real symmetric\n2 2\n1.0\n0.0\n")
    with pytest.raises(ValueError, match="lower triangle"):
        read_mtx(str(p))


def test_bin_roundtrip(tmp_path):
    g = g_two_cliques()
    expanded = np.array(sorted(g.undirected_closure()), dtype=np.int64)
    p = str(tmp_path / "g.bin")
    write_bin(p, g.n, expanded)
    n, edges = read_bin(p)
    assert n == g.n
    assert set(map(tuple, edges.tolist())) == g.undirected_closure()


def test_bin_cc_against_engine(tmp_path):
    """mtx -> bin -> engine CC == oracle: the full conformance loop."""
    from pds_hw2_mpi_connected_components_ray.pipelines.cc import connected_components
    from pds_hw2_mpi_connected_components_ray.sources.edges import from_numpy_edges
    from pds_hw2_mpi_connected_components_ray.stages.graph import canonical_edges
    from tests.oracles import cc_union_find

    g = g_two_cliques()
    pm = str(tmp_path / "g.mtx")
    pb = str(tmp_path / "g.bin")
    write_mtx(pm, g.n, g.edges)
    n, expanded = read_mtx(pm)
    write_bin(pb, n, expanded)
    n2, edges2 = read_bin(pb)
    res = connected_components(canonical_edges(from_numpy_edges(edges2, num_blocks=2)))
    df = res.labels.to_pandas().sort_values("vertex")
    oracle = cc_union_find(g.n, g.edges)
    present = np.unique(edges2.reshape(-1))
    assert np.array_equal(df["label"].to_numpy(), oracle[present])
    assert res.n_components == 2
