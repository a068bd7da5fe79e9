"""Brute-force + cross-mode (broadcast vs hash-join degree attach)
checks for per-edge neighborhood Jaccard and the rich-club curve."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _random_graph(n: int = 40, m: int = 120, seed: int = 3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    df = pd.DataFrame({"src": src, "dst": dst})
    return df[df["src"] != df["dst"]].drop_duplicates()


def _sym_ds(df: pd.DataFrame) -> rd.Dataset:
    both = pd.concat(
        [df, df.rename(columns={"src": "dst", "dst": "src"})]
    ).drop_duplicates()
    return rd.from_arrow(
        pa.Table.from_pandas(both.astype(np.int64), preserve_index=False)
    ).repartition(3)


def _adj(df: pd.DataFrame) -> dict[int, set[int]]:
    adj: dict[int, set[int]] = {}
    for s, d in df.itertuples(index=False):
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    return adj


def test_jaccard_links_brute_and_modes():
    from pds_hw2_mpi_connected_components_ray.pipelines.triangles import jaccard_links

    df = _random_graph()
    ds = _sym_ds(df)
    adj = _adj(df)

    for thresh in (5_000_000, 0):  # broadcast path, then join path
        out = (
            jaccard_links(ds, broadcast_threshold=thresh)
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        want = []
        for a in sorted(adj):
            for b in sorted(adj[a]):
                if a < b:
                    inter = len(adj[a] & adj[b])
                    union = len(adj[a] | adj[b])
                    want.append(
                        (a, b, inter, np.floor(inter / union * 1e6 + 0.5) / 1e6)
                    )
        wdf = pd.DataFrame(want, columns=["a", "b", "support", "jaccard"])
        assert len(out) == len(wdf)
        assert np.array_equal(out["a"].to_numpy(), wdf["a"].to_numpy())
        assert np.array_equal(out["b"].to_numpy(), wdf["b"].to_numpy())
        assert np.array_equal(out["support"].to_numpy(), wdf["support"].to_numpy())
        assert np.array_equal(out["jaccard"].to_numpy(), wdf["jaccard"].to_numpy())


def test_jaccard_union_identity():
    # |N(a) ∪ N(b)| = deg(a) + deg(b) − support: spot-check the
    # inclusion-exclusion the pipeline relies on (b ∈ N(a), a ∈ N(b))
    df = _random_graph(seed=11)
    adj = _adj(df)
    for a in adj:
        for b in adj[a]:
            assert len(adj[a] | adj[b]) == len(adj[a]) + len(adj[b]) - len(
                adj[a] & adj[b]
            )


def test_rich_club_brute_and_modes():
    from pds_hw2_mpi_connected_components_ray.stages.graph import rich_club

    df = _random_graph(n=30, m=150, seed=5)
    ds = _sym_ds(df)
    adj = _adj(df)
    deg = {v: len(ns) for v, ns in adj.items()}
    ks = (1, 2, 4, 8)

    for thresh in (5_000_000, 0):
        tab = rich_club(ds, ks=ks, broadcast_threshold=thresh).to_pandas()
        assert list(tab["k"]) == list(ks)
        for _, row in tab.iterrows():
            k = int(row["k"])
            nodes = {v for v, d in deg.items() if d > k}
            nedges = sum(
                1
                for a in nodes
                for b in adj[a]
                if b in nodes and a < b
            )
            assert row["n_nodes"] == len(nodes)
            assert row["n_edges"] == nedges
            if len(nodes) >= 2:
                phi = np.floor(
                    2.0 * nedges / (len(nodes) * (len(nodes) - 1)) * 1e6 + 0.5
                ) / 1e6
            else:
                phi = 0.0
            assert row["phi"] == phi


def test_graph_summary_brute():
    from pds_hw2_mpi_connected_components_ray.pipelines.profile import graph_summary

    df = _random_graph(n=25, m=80, seed=17)
    ds = _sym_ds(df)
    adj = _adj(df)
    out = graph_summary(ds)
    assert len(out) == 1
    row = out.iloc[0]

    n = len(adj)
    m = sum(len(v) for v in adj.values()) // 2
    tri = 0
    for a in adj:
        for b in adj[a]:
            if b > a:
                tri += sum(1 for c in (adj[a] & adj[b]) if c > b)
    # components by hand
    seen: set[int] = set()
    comps = []
    for v in adj:
        if v in seen:
            continue
        stack, comp = [v], set()
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(adj[u] - comp)
        seen |= comp
        comps.append(len(comp))

    assert row["n_vertices"] == n
    assert row["n_edges"] == m
    assert row["max_degree"] == max(len(v) for v in adj.values())
    assert row["n_triangles"] == tri
    assert row["n_components"] == len(comps)
    assert row["largest_component"] == max(comps)
    assert row["avg_degree"] == np.floor(2.0 * m / n * 1e6 + 0.5) / 1e6
    assert row["density"] == np.floor(2.0 * m / (n * (n - 1.0)) * 1e6 + 0.5) / 1e6


def test_bipartite_check_planted():
    from pds_hw2_mpi_connected_components_ray.pipelines.bipartite import (
        bipartite_check,
    )

    # component A: even cycle 0-1-2-3-0 (bipartite)
    # component B: odd cycle 10-11-12-10 (1 conflict edge)
    # component C: path 20-21 (bipartite)
    # component D: triangle-with-tail 30-31-32-30, 32-33 (1 conflict)
    df = pd.DataFrame(
        [
            (0, 1), (1, 2), (2, 3), (3, 0),
            (10, 11), (11, 12), (12, 10),
            (20, 21),
            (30, 31), (31, 32), (32, 30), (32, 33),
        ],
        columns=["src", "dst"],
    )
    ds = _sym_ds(df)
    for thresh in (5_000_000, 0):
        out = (
            bipartite_check(ds, broadcast_threshold=thresh)
            .to_pandas()
            .sort_values("label")
            .reset_index(drop=True)
        )
        assert list(out["label"]) == [0, 10, 20, 30]
        assert list(out["n_vertices"]) == [4, 3, 2, 4]
        assert list(out["is_bipartite"]) == [1, 0, 1, 0]
        assert list(out["n_conflicts"]) == [0, 1, 0, 1]


def test_component_profiles_brute():
    from pds_hw2_mpi_connected_components_ray.pipelines.profile import (
        component_profiles,
    )

    # two components: a triangle (0,1,2) and a path (10-11-12-13)
    df = pd.DataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 13)],
        columns=["src", "dst"],
    )
    ds = _sym_ds(df)
    for thresh in (5_000_000, 0):
        out = (
            component_profiles(ds, broadcast_threshold=thresh)
            .to_pandas()
            .sort_values("label")
            .reset_index(drop=True)
        )
        assert list(out["label"]) == [0, 10]
        assert list(out["n_vertices"]) == [3, 4]
        assert list(out["sum_degree"]) == [6, 6]
        assert out["avg_degree"].iloc[0] == 2.0
        assert out["density"].iloc[0] == 1.0  # triangle is complete
        assert out["avg_degree"].iloc[1] == 1.5
        assert out["density"].iloc[1] == 0.5


def test_landmark_features_brute():
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import landmark_features

    # path 0-1-2-3-4 plus isolated pair 10-11 (unreached by landmarks
    # 0..3 -> absent unless a landmark lands in it; landmarks are the
    # 4 smallest ids = 0,1,2,3, all in the path)
    df = pd.DataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], columns=["src", "dst"]
    )
    ds = _sym_ds(df)
    out = (
        landmark_features(ds, k=4)
        .to_pandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )
    # only the path component is reached
    assert list(out["vertex"]) == [0, 1, 2, 3, 4]
    for _, row in out.iterrows():
        v = int(row["vertex"])
        for i in range(4):
            assert row[f"d{i}"] == abs(v - i)


def test_degree_gini_brute():
    from pds_hw2_mpi_connected_components_ray.stages.graph import degree_gini

    # star: one hub degree n-1, leaves degree 1 — known unequal dist
    n = 12
    df = pd.DataFrame({"src": [0] * (n - 1), "dst": list(range(1, n))})
    ds = _sym_ds(df)
    out = degree_gini(ds)
    degs = sorted([n - 1] + [1] * (n - 1))
    tot = sum(degs)
    rank_sum = sum((i + 1) * d for i, d in enumerate(degs))
    want = np.floor(
        (2.0 * rank_sum / (n * float(tot)) - (n + 1.0) / n) * 1e6 + 0.5
    ) / 1e6
    assert out["n_vertices"].iloc[0] == n
    assert out["gini"].iloc[0] == want
    # regular graph -> gini 0
    ring = pd.DataFrame({"src": list(range(8)), "dst": [(i + 1) % 8 for i in range(8)]})
    out2 = degree_gini(_sym_ds(ring))
    assert out2["gini"].iloc[0] == 0.0


def test_mean_hops_sampled_path():
    from pds_hw2_mpi_connected_components_ray.pipelines.bfs import mean_hops_sampled

    # path 0-1-2-3-4; landmarks 0..3 -> hops matrix known exactly
    df = pd.DataFrame([(0, 1), (1, 2), (2, 3), (3, 4)], columns=["src", "dst"])
    out = mean_hops_sampled(_sym_ds(df), k=4)
    hops = [abs(v - s) for s in range(4) for v in range(5)]
    assert out["n_pairs"].iloc[0] == len(hops)
    want = np.floor(sum(hops) / len(hops) * 1e6 + 0.5) / 1e6
    assert out["mean_hops"].iloc[0] == want
