"""HITS, personalized PageRank, and Adamic-Adar vs brute-force refs."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.pipelines.hits import hits
from pds_hw2_mpi_connected_components_ray.pipelines.linkpred import (
    adamic_adar_candidates,
)
from pds_hw2_mpi_connected_components_ray.pipelines.pagerank import (
    personalized_pagerank,
)
from pds_hw2_mpi_connected_components_ray.stages.graph import (
    canonical_edges,
    dedup_edges,
)


def _directed_ds(pairs):
    arr = np.asarray(sorted(set(pairs)), dtype=np.int64).reshape(-1, 2)
    return dedup_edges(
        rd.from_pandas(pd.DataFrame({"src": arr[:, 0], "dst": arr[:, 1]}))
    ).materialize()


def _sym_ds(pairs):
    arr = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    return canonical_edges(
        rd.from_pandas(pd.DataFrame({"src": arr[:, 0], "dst": arr[:, 1]}))
    ).materialize()


# ------------------------------------------------------------------ HITS


def _hits_brute(pairs, iters):
    E = sorted(set(pairs))
    verts = sorted({v for e in E for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        a = np.zeros(n)
        for s, d in E:
            a[idx[d]] += h[idx[s]]
        if a.sum() > 0:
            a /= a.sum()
        h = np.zeros(n)
        for s, d in E:
            h[idx[s]] += a[idx[d]]
        if h.sum() > 0:
            h /= h.sum()
    return verts, a, h


def test_hits_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    pairs = [tuple(e) for e in rng.integers(0, 40, size=(120, 2)) if e[0] != e[1]]
    verts, a, h = _hits_brute(pairs, iters=6)
    out = hits(_directed_ds(pairs), iters=6, mode="local").scores.to_pandas()
    out = out.sort_values("vertex").reset_index(drop=True)
    assert out["vertex"].tolist() == verts
    np.testing.assert_allclose(out["auth"].to_numpy(), np.round(a, 6), atol=2e-6)
    np.testing.assert_allclose(out["hub"].to_numpy(), np.round(h, 6), atol=2e-6)


def test_hits_hub_authority_separation(ray_session):
    # pure directed star out of 0: 0 is the only hub, leaves the only
    # authorities -- symmetrizing would have collapsed the two scores
    out = hits(_directed_ds([(0, i) for i in range(1, 5)]), iters=4).scores.to_pandas()
    byv = out.set_index("vertex")
    assert byv.loc[0, "hub"] == 1.0 and byv.loc[0, "auth"] == 0.0
    for v in range(1, 5):
        assert byv.loc[v, "auth"] == 0.25 and byv.loc[v, "hub"] == 0.0


def test_hits_shuffle_equals_local(ray_session):
    rng = np.random.default_rng(11)
    pairs = [tuple(e) for e in rng.integers(0, 25, size=(80, 2)) if e[0] != e[1]]
    ds = _directed_ds(pairs)
    lo = hits(ds, iters=3, mode="local").scores.to_pandas().sort_values("vertex")
    sh = hits(ds, iters=3, mode="shuffle").scores.to_pandas().sort_values("vertex")
    np.testing.assert_allclose(lo["auth"].to_numpy(), sh["auth"].to_numpy(), atol=2e-6)
    np.testing.assert_allclose(lo["hub"].to_numpy(), sh["hub"].to_numpy(), atol=2e-6)


# ----------------------------------------------------- personalized PR


def _ppr_brute(pairs, seed_mod, iters, damping=0.85):
    # symmetric closure, deduped -- mirrors canonical_edges
    E = set()
    for s, d in pairs:
        E.add((s, d))
        E.add((d, s))
    E = sorted(E)
    verts = sorted({v for e in E for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    deg = np.zeros(n)
    for s, _ in E:
        deg[idx[s]] += 1
    seeds = np.array([v % seed_mod == 0 for v in verts])
    p = seeds / seeds.sum()
    r = p.copy()
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d in E:
            contrib[idx[d]] += r[idx[s]] / deg[idx[s]]
        dangling = r[deg == 0].sum()
        r = (1 - damping) * p + damping * (contrib + dangling * p)
    return verts, r


def test_ppr_local_matches_bruteforce(ray_session):
    rng = np.random.default_rng(3)
    pairs = [tuple(e) for e in rng.integers(0, 64, size=(150, 2)) if e[0] != e[1]]
    verts, r = _ppr_brute(pairs, seed_mod=4, iters=8)
    res = personalized_pagerank(_sym_ds(pairs), seed_mod=4, max_iters=8, mode="local")
    out = res.ranks.to_pandas().sort_values("vertex").reset_index(drop=True)
    assert out["vertex"].tolist() == verts
    np.testing.assert_allclose(out["rank"].to_numpy(), r, atol=1e-12)


def test_ppr_pinned_equals_local(ray_session):
    rng = np.random.default_rng(5)
    pairs = [tuple(e) for e in rng.integers(0, 48, size=(120, 2)) if e[0] != e[1]]
    ds = _sym_ds(pairs)
    lo = personalized_pagerank(ds, seed_mod=4, max_iters=6, mode="local")
    pi = personalized_pagerank(ds, seed_mod=4, max_iters=6, mode="pinned")
    a = lo.ranks.to_pandas().sort_values("vertex")["rank"].to_numpy()
    b = pi.ranks.to_pandas().sort_values("vertex")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_ppr_mass_concentrates_on_seed_component(ray_session):
    # two disjoint triangles; seeds only in the first -> the second
    # component's rank is exactly 0
    pairs = [(0, 4), (4, 8), (8, 0), (1, 2), (2, 3), (3, 1)]
    res = personalized_pagerank(_sym_ds(pairs), seed_mod=4, max_iters=10, mode="local")
    out = res.ranks.to_pandas().set_index("vertex")["rank"]
    assert out.loc[[1, 2, 3]].sum() == 0.0
    np.testing.assert_allclose(out.loc[[0, 4, 8]].sum(), 1.0, atol=1e-9)


# --------------------------------------------------------- Adamic-Adar


def _aa_brute(pairs, k):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for b, c in itertools.combinations(sorted(adj), 2):
        if c in adj[b]:
            continue
        common = adj[b] & adj[c]
        s = sum(1.0 / math.log(len(adj[a])) for a in common if len(adj[a]) >= 2)
        if s > 0:
            rows.append((b, c, round(s, 6)))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:k]


def test_adamic_adar_matches_bruteforce(ray_session):
    rng = np.random.default_rng(17)
    pairs = [tuple(e) for e in rng.integers(0, 50, size=(140, 2)) if e[0] != e[1]]
    out = adamic_adar_candidates(_sym_ds(pairs), k=15).to_pandas()
    got = [(int(b), int(c), float(s)) for b, c, s in zip(out["b"], out["c"], out["aa_score"])]
    assert got == _aa_brute(pairs, 15)


def test_adamic_adar_discounts_hubs(ray_session):
    # 1 and 2 share low-degree neighbor 10 (deg 2); 3 and 4 share hub 0
    # (deg 6): AA must rank (1,2) above (3,4) though both have 1 common
    pairs = [(10, 1), (10, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8)]
    out = adamic_adar_candidates(_sym_ds(pairs), k=30).to_pandas()
    scores = {(int(b), int(c)): float(s) for b, c, s in zip(out["b"], out["c"], out["aa_score"])}
    assert scores[(1, 2)] > scores[(3, 4)]
