"""BFS hop distances from a source vertex (unit-weight SSSP).

Semantics: hops(v) = length of the shortest path source -> v over the
canonical symmetric edge table; only REACHED vertices are emitted.

Physical plan (broadcast-frontier mode, the CC-``local`` analog): the
current frontier's vertex ids broadcast via one ray.put per round;
edges stream through map_batches emitting the distinct unvisited
neighbors per batch (a combiner); the driver merges the small partials
into the visited set. Rounds = eccentricity of the source. The
web-scale formulation is the same relaxation as CC-shuffle with the
(min, +1) semiring -- frontier ⋈ edges join + groupby(dst).min(hop+1)
per round, labels hash-partitioned -- and shares its scaling argument;
the broadcast mode serves the n <= threshold regime the query gate and
single-node jobs run in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


class _FrontierNeighbors:
    """Distinct dst per batch whose src is in the broadcast frontier."""

    def __init__(self, ref):
        self._ref = ref
        self._ids = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._ids is None:
            self._ids = ray.get(self._ref)
        ids = self._ids
        if len(ids) == 0 or len(t) == 0:
            return pa.table({"vertex": pa.array([], pa.int64())})
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ids, src), len(ids) - 1)
        hit = ids[pos] == src
        return pa.table({"vertex": np.unique(dst[hit])})


def bfs_hops(
    edges: Dataset, source: int | None = None, *, max_rounds: int = 512
) -> Dataset:
    """(vertex, hops) for every vertex reachable from `source`
    (default: the minimum vertex id)."""
    import ray.data as rd

    from .cc import _collect_vertices

    edges = edges.materialize()
    verts = _collect_vertices(edges)
    if len(verts) == 0:
        return rd.from_arrow(
            pa.table({"vertex": pa.array([], pa.int64()), "hops": pa.array([], pa.int64())})
        )
    src = int(verts[0]) if source is None else int(source)
    dist = np.full(len(verts), -1, dtype=np.int64)
    spos = np.searchsorted(verts, src)
    if spos >= len(verts) or verts[spos] != src:
        raise ValueError(f"source vertex {src} not in the graph")
    dist[spos] = 0
    frontier = np.array([src], dtype=np.int64)
    hop = 0
    while len(frontier) and hop < max_rounds:
        ref = ray.put(frontier)
        parts = edges.map_batches(
            _FrontierNeighbors(ref), batch_format="pyarrow", zero_copy_batch=True
        )
        seen: list[np.ndarray] = []
        for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
            v = b["vertex"].to_numpy(zero_copy_only=False)
            if len(v):
                seen.append(v)
        hop += 1
        if not seen:
            break
        cand = np.unique(np.concatenate(seen))
        pos = np.searchsorted(verts, cand)
        fresh = dist[pos] == -1
        if not fresh.any():
            break
        dist[pos[fresh]] = hop
        frontier = cand[fresh]
    reached = dist >= 0
    return rd.from_arrow(
        pa.table({"vertex": verts[reached], "hops": dist[reached]})
    )
