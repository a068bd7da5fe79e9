"""Extraction ETL: pages -> text rows / link rows / canonical edge table.

The re-imagined converter front-end (the reference's ETL is
/root/reference/src/converter/mtx_to_bin.c): instead of MatrixMarket ->
CSC binary, we go Common-Crawl-style pages -> extracted links ->
normalized urls -> minted int64 vertex ids -> symmetric deduped edge
table, all as streaming map_batches stages. The `html` binary column is
projected away immediately after extraction (early projection --
SURVEY.md section 7.4).

Batch contract is ``batch_format="pyarrow"`` end-to-end: blocks arrive
zero-copy from the object store, pass-through columns (url) are reused
as Arrow arrays without materialization, and outputs are built as Arrow
arrays directly -- no pandas block-manager round-trip on either side of
the per-row HTML parse (which is the only inherently row-wise step).

Per-row invariant: `extract_text(html) == text` byte-identically per url
(BASELINE.json input_hint), enforced by tests at every parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..functions.extract import extract_links, extract_text
from ..functions.urls import mint_id, normalize_url, normalize_urls_batch  # noqa: F401 (normalize_url re-exported for callers)
from ..stages.graph import canonical_edges
from ..sources.pages import DOC_URL_PREFIX


def _pylist(col: pa.ChunkedArray | pa.Array) -> list:
    """Arrow column -> Python list (the unavoidable boundary before a
    per-row regex parse; everything around it stays Arrow)."""
    return col.to_pylist()


def extract_text_stage(pages: Dataset) -> Dataset:
    """pages -> (url, text) with text re-extracted from html."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = pa.array(
            [extract_text(h) for h in _pylist(batch.column("html"))],
            type=pa.string(),
        )
        # url passes through zero-copy (same Arrow buffers).
        return pa.table({"url": batch.column("url"), "text": texts})

    return pages.map_batches(fn, batch_format="pyarrow")


def extract_link_rows(pages: Dataset, normalize: bool = True) -> Dataset:
    """pages -> (src_url, dst_url) one row per href (duplicates kept).

    Normalization runs through the batch fast path (already-canonical
    hrefs -- the overwhelming majority on real corpora -- skip the
    per-url urlsplit machinery; see functions.urls.normalize_urls_batch)."""

    def fn(batch: pa.Table) -> pa.Table:
        srcs: list[str] = []
        hrefs: list[str] = []
        for url, html in zip(
            _pylist(batch.column("url")), _pylist(batch.column("html"))
        ):
            for href in extract_links(html):
                srcs.append(url)
                hrefs.append(href)
        if normalize:
            dsts = normalize_urls_batch(hrefs, srcs)
        else:
            dsts = hrefs
        if normalize and any(not d for d in dsts):
            pairs = [(s, d) for s, d in zip(srcs, dsts) if d]
            srcs = [p[0] for p in pairs]
            dsts = [p[1] for p in pairs]
        return pa.table(
            {
                "src_url": pa.array(srcs, type=pa.string()),
                "dst_url": pa.array(dsts, type=pa.string()),
            }
        )

    return pages.map_batches(fn, batch_format="pyarrow")


def _mint_unique(urls: np.ndarray) -> np.ndarray:
    """Mint ids for a url array, hashing each DISTINCT url once: link
    rows repeat urls heavily (every src appears per out-link, popular
    dsts appear per in-link), so unique-then-hash cuts blake2b calls by
    the batch's duplication factor."""
    uniq, inv = np.unique(urls, return_inverse=True)
    ids = np.fromiter((mint_id(u) for u in uniq), dtype=np.int64, count=len(uniq))
    return ids[inv]


def _str_col_np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Arrow string column -> numpy object array (for np.unique minting)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def mint_edge_ids(link_rows: Dataset) -> Dataset:
    """(src_url, dst_url) -> directed (src, dst) int64 via stable hashing."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        both = np.concatenate(
            [
                _str_col_np(batch.column("src_url")),
                _str_col_np(batch.column("dst_url")),
            ]
        )
        minted = _mint_unique(both)
        # int64 numpy -> Arrow is zero-copy.
        return pa.table({"src": pa.array(minted[:n]), "dst": pa.array(minted[n:])})

    return link_rows.map_batches(fn, batch_format="pyarrow")


def url_id_table(pages: Dataset) -> Dataset:
    """(url, vertex) dimension table for joining results back to urls."""

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        minted = _mint_unique(_str_col_np(urls))
        return pa.table({"url": urls, "vertex": pa.array(minted)})

    return pages.map_batches(fn, batch_format="pyarrow")


def pages_to_edges(pages: Dataset) -> Dataset:
    """Full front-end: pages -> canonical undirected deduped edge table."""
    return canonical_edges(mint_edge_ids(extract_link_rows(pages)))


def doc_id_edges(pages: Dataset) -> Dataset:
    """For docs.example fixture pages: parse doc ids straight out of the
    urls -> directed (src_doc, dst_doc). SQL-mirrorable (ids are the url
    path tail). Fully vectorized: Arrow utf8 slice + cast, no row loop."""
    links = extract_link_rows(pages, normalize=False)
    pl = len(DOC_URL_PREFIX)

    def fn(batch: pa.Table) -> pa.Table:
        src = pc.cast(
            pc.utf8_slice_codeunits(batch.column("src_url"), start=pl), pa.int64()
        )
        dst = pc.cast(
            pc.utf8_slice_codeunits(batch.column("dst_url"), start=pl), pa.int64()
        )
        return pa.table({"src_doc": src, "dst_doc": dst})

    return links.map_batches(fn, batch_format="pyarrow")
