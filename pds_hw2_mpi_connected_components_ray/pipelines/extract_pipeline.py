"""Extraction ETL: pages -> text rows / link rows / canonical edge table.

The re-imagined converter front-end (the reference's ETL is
/root/reference/src/converter/mtx_to_bin.c): instead of MatrixMarket ->
CSC binary, we go Common-Crawl-style pages -> extracted links ->
normalized urls -> minted int64 vertex ids -> symmetric deduped edge
table, all as streaming map_batches stages. The `html` binary column is
projected away immediately after extraction (early projection --
SURVEY.md section 7.4).

Per-row invariant: `extract_text(html) == text` byte-identically per url
(BASELINE.json input_hint), enforced by tests at every parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

from ..functions.extract import extract_links, extract_text
from ..functions.urls import mint_id, normalize_url, normalize_urls_batch  # noqa: F401 (normalize_url re-exported for callers)
from ..stages.graph import canonical_edges
from ..sources.pages import DOC_URL_PREFIX


def extract_text_stage(pages: Dataset) -> Dataset:
    """pages -> (url, text) with text re-extracted from html."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        texts = [extract_text(h) for h in batch["html"]]
        return pd.DataFrame({"url": batch["url"].tolist(), "text": texts})

    return pages.map_batches(fn, batch_format="pandas")


def extract_link_rows(pages: Dataset, normalize: bool = True) -> Dataset:
    """pages -> (src_url, dst_url) one row per href (duplicates kept).

    Normalization runs through the batch fast path (already-canonical
    hrefs -- the overwhelming majority on real corpora -- skip the
    per-url urlsplit machinery; see functions.urls.normalize_urls_batch)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        srcs: list[str] = []
        hrefs: list[str] = []
        for url, html in zip(batch["url"], batch["html"]):
            for href in extract_links(html):
                srcs.append(url)
                hrefs.append(href)
        if normalize:
            dsts = normalize_urls_batch(hrefs, srcs)
        else:
            dsts = hrefs
        keep = [i for i, d in enumerate(dsts) if d]
        return pd.DataFrame(
            {
                "src_url": [srcs[i] for i in keep],
                "dst_url": [dsts[i] for i in keep],
            }
        )

    return pages.map_batches(fn, batch_format="pandas")


def _mint_unique(urls: np.ndarray) -> np.ndarray:
    """Mint ids for a url array, hashing each DISTINCT url once: link
    rows repeat urls heavily (every src appears per out-link, popular
    dsts appear per in-link), so unique-then-hash cuts blake2b calls by
    the batch's duplication factor."""
    uniq, inv = np.unique(urls, return_inverse=True)
    ids = np.fromiter((mint_id(u) for u in uniq), dtype=np.int64, count=len(uniq))
    return ids[inv]


def mint_edge_ids(link_rows: Dataset) -> Dataset:
    """(src_url, dst_url) -> directed (src, dst) int64 via stable hashing."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        both = np.concatenate(
            [batch["src_url"].to_numpy(), batch["dst_url"].to_numpy()]
        )
        minted = _mint_unique(both)
        return pd.DataFrame({"src": minted[:n], "dst": minted[n:]})

    return link_rows.map_batches(fn, batch_format="pandas")


def url_id_table(pages: Dataset) -> Dataset:
    """(url, vertex) dimension table for joining results back to urls."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        urls = batch["url"].to_numpy()
        return pd.DataFrame({"url": urls, "vertex": _mint_unique(urls)})

    return pages.map_batches(fn, batch_format="pandas")


def pages_to_edges(pages: Dataset) -> Dataset:
    """Full front-end: pages -> canonical undirected deduped edge table."""
    return canonical_edges(mint_edge_ids(extract_link_rows(pages)))


def doc_id_edges(pages: Dataset) -> Dataset:
    """For docs.example fixture pages: parse doc ids straight out of the
    urls -> directed (src_doc, dst_doc). SQL-mirrorable (ids are the url
    path tail)."""
    links = extract_link_rows(pages, normalize=False)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        pl = len(DOC_URL_PREFIX)
        return pd.DataFrame(
            {
                "src_doc": batch["src_url"].str.slice(pl).astype(np.int64),
                "dst_doc": batch["dst_url"].str.slice(pl).astype(np.int64),
            }
        )

    return links.map_batches(fn, batch_format="pandas")
