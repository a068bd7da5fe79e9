"""Scatter-ready indexed edge blocks for the iterative local-mode solvers.

PageRank / personalized-PR / HITS local modes stream the edge table
once per iteration; each pass used to pay a per-batch O(E log E)
argsort plus O(E log V) searchsorted to (a) map endpoint ids to
positions in the driver's broadcast score vector and (b) group
contributions by receiving vertex. Both are LOOP-INVARIANT: the
endpoint-to-position mapping and the receiver grouping never change
across iterations. This module hoists them into one prep pass that
materializes (f:int32, t:int32) position blocks pre-sorted by receiver
within each block, so every subsequent pass is a pure
gather + flatnonzero + add.reduceat — all linear work, no sorts, no
binary searches — over blocks half the byte-width of the raw int64
edge table.

Exactness contract: ``searchsorted`` over the sorted distinct vertex
array is a monotonic bijection on present ids, so the receiver groups
and their stable within-group order are identical to the unindexed
path — per-group float partial sums are bit-equal to what
``_ContribProp`` / ``_EdgeScatter`` produced.

Scale posture: the indexed copy is E x 8 bytes per direction,
materialized as a normal (distributed, spillable) Dataset; the
per-iteration broadcast is the n-float score vector (``ray.put`` once,
read per task), same as the unindexed path. Local mode itself is gated
on n <= broadcast_threshold by its callers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

_EMPTY_PARTIAL = pa.table(
    {"t": pa.array([], pa.int32()), "s": pa.array([], pa.float64())}
)


def index_edges(
    edges: Dataset, verts_ref: "ray.ObjectRef", from_col: str, to_col: str
) -> Dataset:
    """One-time prep: map (from_col, to_col) ids to int32 positions in
    the broadcast sorted vertex array and sort each block by receiver
    position (stable, so within-group order matches the unindexed
    scatter). Returns a MATERIALIZED (f, t) Dataset."""

    def fn(t: pa.Table) -> pa.Table:
        verts = ray.get(verts_ref)
        f = np.searchsorted(
            verts, t[from_col].to_numpy(zero_copy_only=False)
        ).astype(np.int32)
        to = np.searchsorted(
            verts, t[to_col].to_numpy(zero_copy_only=False)
        ).astype(np.int32)
        order = np.argsort(to, kind="stable")
        return pa.table({"f": f[order], "t": to[order]})

    return edges.select_columns([from_col, to_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()


class _IdxScatter:
    """Per-batch scatter over pre-indexed blocks: weight each edge by
    the broadcast score of its sender position, partial-sum by the
    (already block-sorted) receiver position."""

    def __init__(self, wref: "ray.ObjectRef"):
        self._wref = wref
        self._w = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._w is None:
            self._w = ray.get(self._wref)
        t = batch["t"].to_numpy(zero_copy_only=False)
        if len(t) == 0:
            return _EMPTY_PARTIAL
        f = batch["f"].to_numpy(zero_copy_only=False)
        c = self._w[f]
        bounds = np.flatnonzero(np.r_[True, t[1:] != t[:-1]])
        return pa.table(
            {"t": t[bounds], "s": np.add.reduceat(c, bounds)}
        )


def scatter_pass(indexed: Dataset, w: np.ndarray, n: int) -> np.ndarray:
    """One propagation pass: broadcast the n-float sender scores once,
    stream the indexed blocks through the gather+reduceat combiner, and
    fold the receiver partials (at most distinct-receivers-per-block
    rows each) into a dense n-vector on the driver."""
    wref = ray.put(w)
    out = np.zeros(n, dtype=np.float64)
    partials = indexed.map_batches(
        _IdxScatter(wref), batch_format="pyarrow", zero_copy_batch=True
    )
    for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b["t"].to_numpy(zero_copy_only=False)
        if len(t):
            np.add.at(out, t, b["s"].to_numpy(zero_copy_only=False))
    return out
