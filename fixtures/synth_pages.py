"""Deterministic synthetic fixture corpus (FIXTURES.md).

Pure functions of (seed, scale): planted link graphs -> pages tables
whose html embeds the graph as <a href> links, plus the golden `text`
column (the byte-identical extraction target). No external data, no
wall-clock, no unseeded randomness.

Graphs are over dense page ids 0..n-1 (vertex id = dense rank of url,
matching the reference's dense ids,
/root/reference/src/converter/mtx_to_bin.c:199-200). Edges are directed
hrefs; the engine symmetrizes to undirected closure
(/root/reference/src/converter/mtx_to_bin.c:199-213).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from pds_hw2_mpi_connected_components_ray.functions.extract import build_html

LANGS = ("en", "de", "el")


def page_url(page_id: int, hosts: int = 16) -> str:
    return f"https://site{page_id % hosts}.example/p/{page_id}"


@dataclass(frozen=True)
class PlantedGraph:
    """Directed edge list over dense ids [0, n) with known goldens."""

    name: str
    n: int
    edges: np.ndarray  # int64 (m, 2) directed

    def undirected_closure(self) -> set[tuple[int, int]]:
        s: set[tuple[int, int]] = set()
        for a, b in self.edges.tolist():
            s.add((a, b))
            s.add((b, a))
        return s


def g_two_cliques(clique: int = 8, isolated: int = 48) -> PlantedGraph:
    """Two K_clique cliques + isolated vertices. CC = isolated + 2."""
    e = []
    for base in (0, clique):
        for i in range(clique):
            for j in range(i + 1, clique):
                e.append((base + i, base + j))
    n = 2 * clique + isolated
    return PlantedGraph("g_two_cliques", n, np.array(e, dtype=np.int64))


def g_path(n: int = 1000) -> PlantedGraph:
    e = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1).astype(np.int64)
    return PlantedGraph("g_path", n, e)


def g_star(leaves: int = 5000) -> PlantedGraph:
    e = np.stack([np.zeros(leaves, dtype=np.int64), np.arange(1, leaves + 1)], axis=1)
    return PlantedGraph("g_star", leaves + 1, e)


def g_ring_of_cliques(k: int = 20, size: int = 10) -> PlantedGraph:
    e = []
    for c in range(k):
        base = c * size
        for i in range(size):
            for j in range(i + 1, size):
                e.append((base + i, base + j))
        e.append((base, ((c + 1) % k) * size))  # bridge
    return PlantedGraph("g_ring_of_cliques", k * size, np.array(e, dtype=np.int64))


def g_random_forest(n: int = 2000, seed: int = 42) -> PlantedGraph:
    """Seeded Erdos-Renyi below percolation: m = n//4 random edges."""
    rng = np.random.RandomState(seed)
    m = n // 4
    e = rng.randint(0, n, size=(m, 2)).astype(np.int64)
    return PlantedGraph("g_random_forest", n, e)


def g_dups_selfloops() -> PlantedGraph:
    """g_two_cliques + duplicate hrefs + self-links; results must equal
    g_two_cliques (reference tolerates dups, keeps self-loops:
    /root/reference/src/converter/mtx_to_bin.c:207,303-317)."""
    g = g_two_cliques()
    dups = np.concatenate([g.edges, g.edges[: len(g.edges) // 2]])
    loops = np.stack([np.arange(5, dtype=np.int64)] * 2, axis=1)
    return PlantedGraph("g_dups_selfloops", g.n, np.concatenate([dups, loops]))


ALL_GRAPHS = {
    "g_two_cliques": g_two_cliques,
    "g_path": g_path,
    "g_star": g_star,
    "g_ring_of_cliques": g_ring_of_cliques,
    "g_random_forest": g_random_forest,
    "g_dups_selfloops": g_dups_selfloops,
}


def _filler(url: str, lang: str) -> str:
    """Deterministic filler text derived from sha256(url)."""
    h = hashlib.sha256(url.encode()).hexdigest()
    words = [h[i : i + 6] for i in range(0, 36, 6)]
    lead = {"en": "the quick page of", "de": "die schnelle seite von", "el": "και το γρήγορο"}[
        lang
    ]
    return f"{lead} {url} :: " + " ".join(words)


def pages_table(graph: PlantedGraph, hosts: int = 16) -> pa.Table:
    """Pages table (url, warc_ts, html, text, lang) embedding `graph`.

    `text` is the golden extraction output: extractor(html) == text
    byte-identically per url (FIXTURES.md section 1).
    """
    n = graph.n
    out_links: list[list[str]] = [[] for _ in range(n)]
    for a, b in graph.edges.tolist():
        out_links[a].append(page_url(b, hosts))
    urls, htmls, texts, langs = [], [], [], []
    base_ts = np.datetime64("2025-01-01T00:00:00", "us")
    ts = base_ts + np.arange(n).astype("timedelta64[s]").astype("timedelta64[us]")
    for i in range(n):
        u = page_url(i, hosts)
        lang = LANGS[i % 3]
        text = _filler(u, lang)
        urls.append(u)
        htmls.append(build_html(u, text, out_links[i]).encode("utf-8"))
        texts.append(text)
        langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def near_dup_documents(n_base: int = 40, dup_frac: int = 3, seed: int = 7) -> pa.Table:
    """documents-shaped table with planted exact and near duplicates for
    the dedup family tests: every `dup_frac`-th doc gets (a) one exact
    copy and (b) one near copy with a few words perturbed."""
    rng = np.random.RandomState(seed)
    vocab = [f"w{i:03d}" for i in range(200)]
    rows = []
    did = 0
    for b in range(n_base):
        words = [vocab[rng.randint(len(vocab))] for _ in range(60)]
        text = " ".join(words)
        rows.append((did, text, "en", f"base{b}"))
        did += 1
        if b % dup_frac == 0:
            rows.append((did, text, "en", f"exact{b}"))
            did += 1
            wc = list(words)
            for _ in range(3):
                wc[rng.randint(len(wc))] = vocab[rng.randint(len(vocab))]
            rows.append((did, " ".join(wc), "en", f"near{b}"))
            did += 1
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
