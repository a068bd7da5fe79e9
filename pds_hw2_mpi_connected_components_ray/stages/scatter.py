"""Pinned scatter-slice actor pool for the iterative local-mode solvers.

PageRank / personalized-PR / HITS local modes propagate an O(n) score
vector along the edge table once (or twice) per iteration. Two costs
dominated earlier designs at bench scale:

1. per-pass re-derivation: each pass paid an O(E log E) argsort plus
   O(E log V) searchsorted to map endpoint ids to score positions and
   group contributions by receiver — hoisted once (round 4) into a
   materialized pre-indexed Dataset;
2. per-pass Dataset execution: even with the indexing hoisted, every
   half-step was a full streaming-executor run over the indexed blocks.
   At gate scale the kernel is ~ms of gather+reduceat, so scheduling
   fixed costs were >90% of the wall — 16 executions for 8 HITS
   iterations, 20 for PageRank (the same lesson pagerank_weighted._local
   and the pinned CC pool already encode: load once, solve many).

This module pins the edge blocks in a slice-actor pool instead
(`ScatterPool`): raw blocks move BY REFERENCE into `ceil(E/k)`-sized
slices (never through the driver), each slice indexes its endpoints
against the broadcast sorted vertex array once per direction
(int32 positions, stable-sorted by receiver), and every subsequent
pass is one `ray.put(w)` + one RPC round of pure gather + reduceat,
returning dense n-float partials the driver `np.sum`s. No Dataset
execution, no sorts, no binary searches after prep.

Scale posture: local mode is gated on n <= broadcast_threshold by its
callers (the pinned / shuffle modes own the beyond-driver regime), so
the dense n-float partial per slice and the per-iteration n-float
broadcast are bounded (~16 MB at the 2M gate). Slice count follows
min(16, cluster CPUs, blocks); edge ids are held as int32 positions,
half the raw table's byte width.

Exactness contract: `searchsorted` over the sorted distinct vertex
array is a monotonic bijection on present ids, so receiver groups are
exactly the unindexed path's groups. Summation ORDER differs from the
per-block streaming fold (slice-concatenated reduceat + k-partial
driver sum), so float results can differ by ulps run-to-shape — all
consumers round to 6 decimals before comparison (same contract as the
DuckDB oracles, which sum in their own order).
"""

from __future__ import annotations

import numpy as np

import ray
from ray.data import Dataset


@ray.remote(num_cpus=1)
class _ScatterSlice:
    """Pinned slice of raw edge blocks, indexed per direction on demand.

    Holds (f: int32 sender positions, t_u: distinct receiver positions,
    bounds: reduceat group starts) per (from_col, to_col) direction;
    `scatter` is a pure gather + reduceat into a dense n-vector.
    """

    def __init__(self, block_refs: list, directions: list[tuple[str, str]]):
        from ..state.shards import _as_arrow

        tabs = [_as_arrow(t) for t in ray.get(list(block_refs))]
        tabs = [t for t in tabs if len(t)]
        cols = sorted({c for d in directions for c in d})
        self._col: dict[str, np.ndarray] = {}
        for c in cols:
            if tabs:
                self._col[c] = np.concatenate(
                    [t[c].to_numpy(zero_copy_only=False).astype(np.int64) for t in tabs]
                )
            else:
                self._col[c] = np.array([], dtype=np.int64)
        self._directions = [tuple(d) for d in directions]
        self._idx: dict[tuple[str, str], tuple] = {}
        self._n = 0

    def local_vertices(self) -> np.ndarray:
        parts = list(self._col.values())
        if not parts:
            return np.array([], dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def index(self, verts: np.ndarray) -> None:
        """One-time prep against the broadcast sorted vertex array; raw
        id columns are dropped afterwards (positions are int32)."""
        self._n = len(verts)
        for fc, tc in self._directions:
            f = np.searchsorted(verts, self._col[fc]).astype(np.int32)
            t = np.searchsorted(verts, self._col[tc]).astype(np.int32)
            order = np.argsort(t, kind="stable")
            f, t = f[order], t[order]
            if len(t):
                bounds = np.flatnonzero(np.r_[True, t[1:] != t[:-1]])
                t_u = t[bounds]
            else:
                bounds = np.array([], dtype=np.int64)
                t_u = t
            self._idx[(fc, tc)] = (f, t_u, bounds)
        self._col = {}

    def sender_degrees(self, fc: str, tc: str) -> np.ndarray:
        """Dense per-sender edge counts (out-degrees for (src, dst))."""
        f, _, _ = self._idx[(fc, tc)]
        cnt = np.zeros(self._n, dtype=np.int64)
        if len(f):
            np.add.at(cnt, f, 1)
        return cnt

    def scatter(self, fc: str, tc: str, w: np.ndarray) -> np.ndarray:
        """One propagation pass: weight each edge by the broadcast score
        of its sender position, partial-sum per (pre-grouped) receiver."""
        f, t_u, bounds = self._idx[(fc, tc)]
        out = np.zeros(self._n, dtype=np.float64)
        if len(f):
            out[t_u] = np.add.reduceat(w[f], bounds)
        return out


class ScatterPool:
    """Load-once / solve-many scatter pool over a MATERIALIZED edge
    Dataset. Blocks are assigned round-robin by reference; the global
    sorted vertex array derives from slice-local uniques (no extra
    Dataset pass). Use as a context manager or call `shutdown()`."""

    def __init__(
        self,
        edges: Dataset,
        directions: list[tuple[str, str]] | None = None,
    ):
        self.directions = [tuple(d) for d in (directions or [("src", "dst")])]
        block_refs = [
            ref
            for bundle in edges.iter_internal_ref_bundles()
            for ref in bundle.block_refs
        ]
        ncpus = int(ray.cluster_resources().get("CPU", 8))
        k = max(1, min(16, ncpus, len(block_refs) or 1))
        self.actors = [
            _ScatterSlice.remote(block_refs[i::k], self.directions) for i in range(k)
        ]
        locals_ = ray.get([a.local_vertices.remote() for a in self.actors])
        self.verts = np.unique(
            np.concatenate(locals_ + [np.array([], dtype=np.int64)])
        )
        self.n = len(self.verts)
        vref = ray.put(self.verts)
        ray.get([a.index.remote(vref) for a in self.actors])

    def sender_degrees(self, direction: int = 0) -> np.ndarray:
        fc, tc = self.directions[direction]
        parts = ray.get([a.sender_degrees.remote(fc, tc) for a in self.actors])
        return np.sum(parts, axis=0, dtype=np.int64)

    def scatter(self, w: np.ndarray, direction: int = 0) -> np.ndarray:
        """One pass: broadcast the n-float sender scores once, fold the
        k dense slice partials on the driver (contiguous np.sum)."""
        fc, tc = self.directions[direction]
        wref = ray.put(w)
        parts = ray.get([a.scatter.remote(fc, tc, wref) for a in self.actors])
        return np.sum(parts, axis=0)

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def __enter__(self) -> "ScatterPool":
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()
