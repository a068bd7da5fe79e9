"""Extraction front-end: pure-function round trips + the per-row
byte-identical invariant across parallelism (BASELINE.json input_hint)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fixtures.synth_pages import g_ring_of_cliques, g_two_cliques, pages_table
from pds_hw2_mpi_connected_components_ray.functions.extract import (
    build_html,
    extract_links,
    extract_text,
    extract_title,
)
from pds_hw2_mpi_connected_components_ray.functions.urls import mint_id, normalize_url


def test_build_extract_roundtrip_simple():
    html = build_html("https://a.example/x", "hello <world> & \"friends\"", ["https://b.example/y"])
    assert extract_text(html) == 'hello <world> & "friends"'
    assert extract_links(html) == ["https://b.example/y"]
    assert extract_title(html) == "https://a.example/x"


def test_extract_handles_bytes_and_multiple_p():
    html = b"<html><body><p>one</p><div>skip</div><p>two &amp; three</p></body></html>"
    assert extract_text(html) == "one\ntwo & three"


def test_extract_links_keeps_duplicates_and_order():
    html = build_html("u", "t", ["https://x.example/1", "https://y.example/2", "https://x.example/1"])
    assert extract_links(html) == [
        "https://x.example/1",
        "https://y.example/2",
        "https://x.example/1",
    ]


def test_normalize_url():
    assert normalize_url("HTTPS://Site0.Example:443/p/1/") == "https://site0.example/p/1"
    assert normalize_url("../x", base="https://h.example/a/b") == "https://h.example/x"
    assert normalize_url("javascript:void(0)") == ""
    assert normalize_url("mailto:x@y") == ""
    assert normalize_url("https://h.example") == "https://h.example/"


def test_mint_id_stable_and_positive():
    a = mint_id("https://site0.example/p/0")
    assert a == mint_id("https://site0.example/p/0")
    assert 0 <= a < 2**63
    assert mint_id("x") != mint_id("y")


def test_fixture_pages_golden_text():
    tab = pages_table(g_two_cliques())
    for url, html, text in zip(
        tab["url"].to_pylist(), tab["html"].to_pylist(), tab["text"].to_pylist()
    ):
        assert extract_text(html) == text, url


@pytest.mark.parametrize("nblocks", [1, 2, 8])
def test_pipeline_text_byte_identical_any_parallelism(nblocks):
    from pds_hw2_mpi_connected_components_ray.pipelines.extract_pipeline import (
        extract_text_stage,
    )
    from pds_hw2_mpi_connected_components_ray.sources.pages import pages_from_arrow

    tab = pages_table(g_ring_of_cliques())
    pages = pages_from_arrow(tab, num_blocks=nblocks)
    out = extract_text_stage(pages).to_pandas().sort_values("url").reset_index(drop=True)
    golden = (
        pd.DataFrame({"url": tab["url"].to_pylist(), "text": tab["text"].to_pylist()})
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, golden)


def test_pipeline_edges_match_planted_graph():
    from pds_hw2_mpi_connected_components_ray.pipelines.extract_pipeline import (
        extract_link_rows,
        mint_edge_ids,
        url_id_table,
    )
    from pds_hw2_mpi_connected_components_ray.sources.pages import pages_from_arrow

    g = g_two_cliques()
    tab = pages_table(g)
    pages = pages_from_arrow(tab, num_blocks=4)
    links = mint_edge_ids(extract_link_rows(pages)).to_pandas()
    idmap = url_id_table(pages).to_pandas()
    url2id = dict(zip(idmap["url"], idmap["vertex"]))
    # planted directed edges, as minted ids
    from fixtures.synth_pages import page_url

    want = {(url2id[page_url(a)], url2id[page_url(b)]) for a, b in g.edges.tolist()}
    got = set(zip(links["src"], links["dst"]))
    assert got == want
