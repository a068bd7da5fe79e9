"""Harmonic centrality, diameter, reciprocity, duplicated n-gram
stats, and percentile length filtering."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.pipelines.bfs import (
    double_sweep_diameter,
    landmark_harmonic_centrality,
)
from pds_hw2_mpi_connected_components_ray.pipelines.clean import (
    duplicate_ngram_stats,
    length_percentile_filter,
)
from pds_hw2_mpi_connected_components_ray.stages.graph import (
    canonical_edges,
    dedup_edges,
    reciprocity,
)


def _sym_ds(pairs):
    arr = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    return canonical_edges(
        rd.from_pandas(pd.DataFrame({"src": arr[:, 0], "dst": arr[:, 1]}))
    ).materialize()


def _dir_ds(pairs):
    arr = np.asarray(sorted(set(pairs)), dtype=np.int64).reshape(-1, 2)
    return dedup_edges(
        rd.from_pandas(pd.DataFrame({"src": arr[:, 0], "dst": arr[:, 1]}))
    ).materialize()


def test_harmonic_centrality_path_graph(ray_session):
    # path 0-1-2-3, landmarks = {0, 1}
    out = (
        landmark_harmonic_centrality(_sym_ds([(0, 1), (1, 2), (2, 3)]), k=2)
        .to_pandas()
        .set_index("vertex")["harmonic"]
    )
    assert out.loc[0] == 1.0          # only s=1 at hops 1
    assert out.loc[1] == 1.0          # only s=0 at hops 1
    assert out.loc[2] == 1.5          # 1/2 + 1/1
    assert out.loc[3] == round(1 / 3 + 1 / 2, 6)


def test_double_sweep_diameter(ray_session):
    # path of 6 vertices: true diameter 5, double sweep finds it exactly
    path = [(i, i + 1) for i in range(5)]
    out = double_sweep_diameter(_sym_ds(path)).to_pandas()
    assert int(out["diameter_lb"][0]) == 5
    # star: diameter 2
    star = [(0, i) for i in range(1, 6)]
    assert int(double_sweep_diameter(_sym_ds(star)).to_pandas()["diameter_lb"][0]) == 2


def test_reciprocity_handcrafted(ray_session):
    # 0<->1 mutual, 1->2 and 3->0 one-way, 2->2 self-loop (excluded):
    # 4 non-loop directed edges, 1 mutual pair -> 2/4 = 0.5
    ds = _dir_ds([(0, 1), (1, 0), (1, 2), (3, 0), (2, 2)])
    out = reciprocity(ds).to_pandas()
    assert out["reciprocity"][0] == 0.5


def test_reciprocity_rational_rounds_half_up(ray_session):
    # 1 mutual pair of 3 non-loop edges -> 2/3 -> 0.666667 (half-up)
    ds = _dir_ds([(0, 1), (1, 0), (1, 2)])
    assert reciprocity(ds).to_pandas()["reciprocity"][0] == 0.666667


def _docs(texts):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "text": texts,
                "n_chars": [len(t) for t in texts],
            }
        )
    )


def test_duplicate_ngram_stats_handcrafted(ray_session):
    docs = _docs(["a b c d", "x a b c", "zz", ""])
    out = duplicate_ngram_stats(docs).to_pandas().set_index("doc_id").sort_index()
    # doc0 grams {a b c, b c d}; doc1 {x a b, a b c}; shared = {a b c}
    assert out.loc[0, "n_grams"] == 2 and out.loc[0, "shared_grams"] == 1
    assert out.loc[0, "dup_gram_frac"] == 0.5
    assert out.loc[1, "dup_gram_frac"] == 0.5
    assert out.loc[2, "n_grams"] == 1 and out.loc[2, "shared_grams"] == 0
    assert 3 not in out.index  # empty doc contributes nothing


def test_duplicate_ngram_stats_join_path_equal(ray_session):
    texts = [f"w{i} common span here tail{i % 4}" for i in range(40)]
    docs = _docs(texts)
    a = duplicate_ngram_stats(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        duplicate_ngram_stats(docs, force_join=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_like=True)


def test_length_percentile_filter_quantile_disc(ray_session):
    texts = ["x" * n for n in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]]
    out = length_percentile_filter(_docs(texts), q=0.25).to_pandas()
    # quantile_disc(0.25) over 1..10 = element at ceil(0.25*10)-1 = idx 2 -> 3
    assert sorted(out["n_chars"]) == list(range(3, 11))


def _dijkstra_brute(pairs, wmod, wadd):
    import heapq

    E: dict[int, list[tuple[int, int]]] = {}
    vs = set()
    for a, b in pairs:
        for s, d in ((a, b), (b, a)):
            E.setdefault(s, []).append((d, (s + d) % wmod + wadd))
        vs.update((a, b))
    src = min(vs)
    dist = {src: 0}
    pq = [(0, src)]
    while pq:
        d, v = heapq.heappop(pq)
        if d > dist.get(v, 1 << 62):
            continue
        for u, w in E.get(v, []):
            nd = d + w
            if nd < dist.get(u, 1 << 62):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))
    return dist


def test_sssp_matches_dijkstra(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import sssp_dist_pinned

    rng = np.random.default_rng(23)
    pairs = [tuple(e) for e in rng.integers(0, 50, size=(130, 2)) if e[0] != e[1]]
    want = _dijkstra_brute(pairs, 5, 1)
    out = sssp_dist_pinned(_sym_ds(pairs)).to_pandas()
    got = dict(zip(out["vertex"].astype(int), out["dist"].astype(int)))
    assert got == want


def test_sssp_unit_weights_equal_bfs(ray_session):
    # (min,+w) with w == 1 must reproduce unit BFS exactly
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import (
        bfs_hops_pinned,
        sssp_dist_pinned,
    )

    rng = np.random.default_rng(29)
    pairs = [tuple(e) for e in rng.integers(0, 40, size=(90, 2)) if e[0] != e[1]]
    ds = _sym_ds(pairs)
    hops = bfs_hops_pinned(ds).to_pandas().sort_values("vertex").reset_index(drop=True)
    dist = (
        sssp_dist_pinned(ds, weight_mod=1, weight_add=1)
        .to_pandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )
    assert hops["vertex"].tolist() == dist["vertex"].tolist()
    assert hops["hops"].tolist() == dist["dist"].tolist()
