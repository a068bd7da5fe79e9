"""Trusted pure-Python oracles (no engine code, no Ray).

Three independent CC oracles must agree (SURVEY.md section 5): union-find,
BFS flood-fill, and sequential hash-min. PageRank power iteration and a
brute-force triangle counter complete the set.
"""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np


def sym_edges(edges: np.ndarray) -> set[tuple[int, int]]:
    s = set()
    for a, b in np.asarray(edges, dtype=np.int64).tolist():
        s.add((a, b))
        s.add((b, a))
    return s


def cc_union_find(n: int, edges: np.ndarray) -> np.ndarray:
    """Canonical min-vertex-id labels via union-find (union by min root)."""
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in np.asarray(edges, dtype=np.int64).tolist():
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return np.array([find(v) for v in range(n)], dtype=np.int64)


def cc_bfs(n: int, edges: np.ndarray) -> np.ndarray:
    adj = defaultdict(list)
    for a, b in sym_edges(edges):
        adj[a].append(b)
    label = np.full(n, -1, dtype=np.int64)
    for start in range(n):
        if label[start] != -1:
            continue
        comp = [start]
        label[start] = start
        q = deque([start])
        while q:
            v = q.popleft()
            for w in adj[v]:
                if label[w] == -1:
                    label[w] = start
                    comp.append(w)
                    q.append(w)
        m = min(comp)
        for v in comp:
            label[v] = m
    return label


def cc_hashmin_seq(n: int, edges: np.ndarray, max_iter: int = 512) -> np.ndarray:
    """Sequential synchronous hash-min, mirroring the reference kernel
    (/root/reference/src/connected_components.c:109-128) without the
    pointer-jump shortcut."""
    es = sym_edges(edges)
    label = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        nxt = label.copy()
        for a, b in es:
            if label[a] < nxt[b]:
                nxt[b] = label[a]
        if np.array_equal(nxt, label):
            break
        label = nxt
    return label


def pagerank_oracle(
    n: int,
    directed_edges: np.ndarray,
    damping: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-12,
    symmetrize: bool = True,
) -> np.ndarray:
    """Power iteration with uniform dangling-mass redistribution."""
    if symmetrize:
        es = sorted(sym_edges(directed_edges))
    else:
        es = sorted({(int(a), int(b)) for a, b in np.asarray(directed_edges).tolist()})
    src = np.array([a for a, _ in es], dtype=np.int64)
    dst = np.array([b for _, b in es], dtype=np.int64)
    deg = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        w = r[src] / deg[src]
        np.add.at(contrib, dst, w)
        dangling = r[deg == 0].sum()
        r_new = (1 - damping) / n + damping * (contrib + dangling / n)
        if np.abs(r_new - r).sum() < tol:
            r = r_new
            break
        r = r_new
    return r


def triangles_oracle(n: int, edges: np.ndarray) -> int:
    """Brute-force triangle count on the undirected simple graph
    (self-loops/dups removed)."""
    adj = defaultdict(set)
    for a, b in sym_edges(edges):
        if a != b:
            adj[a].add(b)
    count = 0
    for a in range(n):
        for b in adj[a]:
            if b > a:
                for c in adj[a] & adj[b]:
                    if c > b:
                        count += 1
    return count


def labelprop_sync_oracle(n: int, edges: np.ndarray, iters: int = 4) -> np.ndarray:
    """Synchronous label propagation, deterministic tie-break: new label =
    most frequent neighbor label, ties -> smallest label; vertices with no
    neighbors keep their own label. Matches the engine's documented rule."""
    adj = defaultdict(list)
    for a, b in sym_edges(edges):
        adj[b].append(a)  # incoming == neighbors (symmetric)
    label = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        nxt = label.copy()
        for v in range(n):
            if not adj[v]:
                continue
            counts: dict[int, int] = {}
            for u in adj[v]:
                counts[label[u]] = counts.get(label[u], 0) + 1
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            nxt[v] = best
        label = nxt
    return label


def uf_labels(pairs) -> dict[int, int]:
    """Canonical min-label CC over a SPARSE vertex set (only edge
    endpoints), as a {vertex: label} dict."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    verts = set()
    for a, b in pairs:
        a, b = int(a), int(b)
        verts.add(a)
        verts.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in verts}
