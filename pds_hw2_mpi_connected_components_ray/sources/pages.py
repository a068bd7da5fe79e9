"""Pages-table source (Common-Crawl-style: url, warc_ts, html, text, lang).

Two entry points:
- ``read_pages(path)``: column-pruned Parquet read of a real pages table
  (the engine's primary input per BASELINE.json input_hint).
- ``pages_from_documents(sf_dir)``: deterministically wraps the driver's
  `documents` table into a pages table, planting links
  doc i -> (i*31 + j) % n for j in 1..3 -- the arithmetic is mirrored in
  the DuckDB oracle, making the whole extraction front-end SQL-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from ..functions.extract import build_html

DOC_URL_PREFIX = "https://docs.example/"
LINKS_PER_DOC = 3
LINK_MULT = 31


def doc_url(doc_id: int) -> str:
    return f"{DOC_URL_PREFIX}{doc_id}"


def read_pages(path: str, columns: list[str] | None = None) -> Dataset:
    return rd.read_parquet(path, columns=columns)


def _messy_href(target: int, variant: int) -> str:
    """Deterministic NON-canonical spellings of a doc url -- each
    normalizes back to doc_url(target) via functions.urls.normalize_url
    (relative resolve, case-fold, fragment drop, trailing-slash strip,
    default-port strip). Used by the pages_to_edges_planted oracle query
    to exercise the real normalization front-end."""
    v = variant % 4
    if v == 0:
        return f"/{target}"  # relative, resolves against the page url
    if v == 1:
        return f"HTTPS://DOCS.EXAMPLE/{target}#frag"
    if v == 2:
        return f"{DOC_URL_PREFIX}{target}/"
    return f"https://docs.example:443/{target}"


def pages_from_documents(
    sf_dir: str, n_docs: int | None = None, messy_links: bool = False
) -> Dataset:
    """documents -> pages with planted links (deterministic).

    ``messy_links=True`` writes each href in a rotating non-canonical
    spelling (see _messy_href) so the full normalize -> mint front-end
    is exercised; the normalized link graph is identical either way.
    """
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    n = n_docs if n_docs is not None else docs.count()

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        texts = batch.column("text").fill_null("").to_pylist()
        urls = [doc_url(int(i)) for i in ids]
        if messy_links:
            link_targets = [
                [
                    _messy_href(int((i * LINK_MULT + j) % n), int(i * LINK_MULT + j))
                    for j in range(1, LINKS_PER_DOC + 1)
                ]
                for i in ids
            ]
        else:
            link_targets = [
                [doc_url(int((i * LINK_MULT + j) % n)) for j in range(1, LINKS_PER_DOC + 1)]
                for i in ids
            ]
        htmls = [
            build_html(u, t, ls).encode("utf-8")
            for u, t, ls in zip(urls, texts, link_targets)
        ]
        base = np.datetime64("2025-01-01T00:00:00", "us")
        ts = base + ids.astype("timedelta64[s]").astype("timedelta64[us]")
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(ts),
                "html": pa.array(htmls, type=pa.binary()),
                "text": pa.array(texts, type=pa.string()),
                "lang": batch.column("lang").fill_null("und"),
            }
        )

    return docs.map_batches(to_pages, batch_format="pyarrow")


def pages_from_arrow(table: pa.Table, num_blocks: int = 4) -> Dataset:
    """Test helper: in-memory pages table -> Dataset."""
    return rd.from_arrow(table).repartition(num_blocks)
