"""HITS (hubs & authorities) over the DIRECTED link graph.

PageRank ranks by stationary visit probability; HITS (Kleinberg's
hyperlink-induced topic search) ranks pages twice — a page is a good
*authority* if good hubs point at it, a good *hub* if it points at
good authorities. On a web link graph the two scores separate index
pages from content pages, which one symmetric-PageRank number cannot.
This runs on the directed, exactly-deduped edge table (symmetrizing
would collapse hub == authority by construction).

Semantics (fixed across modes and the DuckDB oracle):

    h_0(v)  = 1.0
    a'_k(v) = sum_{u->v} h_{k-1}(u);   a_k = a'_k / sum(a'_k)
    h'_k(u) = sum_{u->v} a_k(v);       h_k = h'_k / sum(h'_k)

Synchronous, L1 normalization, fixed iteration count (the unrolled
SQL oracle mirrors it 1:1). Output: (vertex, auth, hub) rounded to 6
decimals — rounding keeps numpy/DuckDB float-sum ulp noise out of the
hash comparison (same contract as the PageRank oracles).

Two modes, the engine's standard adaptive split:

- ``local`` (n <= broadcast_threshold): the driver holds the O(n)
  score vector; edge blocks pin by reference in a slice-actor pool
  (stages/scatter.py ScatterPool: endpoint->position map + receiver
  grouping indexed once per direction at load), and each half-step is
  one O(n) broadcast + one RPC round of pure gather +
  ``np.add.reduceat`` returning dense partials — no Dataset execution
  per pass, and the edge blocks never move after load.
- ``shuffle``: scores live in a hash-partitioned Dataset; each
  half-step is one hash join (edges x scores on the emitting side)
  plus one groupby-sum on the receiving side — all-to-alls are
  score/contribution-proportional, never O(n x workers). The
  normalizer is a scalar ``.sum()``.

No reference analogue (the reference is CC-only); north-rule
link-graph extension alongside pipelines.pagerank.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..context import default_parallelism


@dataclass
class HitsResult:
    scores: Dataset  # (vertex:int64, auth:float64, hub:float64)
    iterations: int
    mode: str


def _collect_vertices(edges: Dataset) -> np.ndarray:
    """Sorted distinct vertex ids over src+dst (directed-safe). Driver
    holds O(n) — local-mode precondition, gated by broadcast_threshold."""
    from .pagerank import _all_vertices

    parts = [
        b["vertex"].to_numpy(zero_copy_only=False)
        for b in _all_vertices(edges).iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    return np.sort(np.concatenate(parts))


def hits(
    edges: Dataset,
    *,
    iters: int = 8,
    mode: str = "auto",
    broadcast_threshold: int = 2_000_000,
    num_partitions: int | None = None,
) -> HitsResult:
    """(vertex, auth, hub) after `iters` synchronous HITS iterations
    over a directed, deduped edge table."""
    edges = edges.materialize()
    if mode == "auto":
        n = len(_collect_vertices(edges))
        mode = "local" if n <= broadcast_threshold else "shuffle"
    if mode == "local":
        return _hits_local(edges, iters)
    return _hits_shuffle(edges, iters, num_partitions)


def _hits_local(edges: Dataset, iters: int) -> HitsResult:
    from ..stages.scatter import ScatterPool

    # load-once / solve-many (stages/scatter.py): edge blocks pin in a
    # slice-actor pool by reference, both directions indexed once; each
    # half-step below is one broadcast + one RPC round of gather+reduceat
    # — no Dataset execution per pass (16 executions for 8 iterations
    # was >90% scheduling fixed cost at gate scale)
    with ScatterPool(
        edges,
        directions=[("src", "dst"), ("dst", "src")],
        # fwd: hubs endorse authorities; rev: authorities credit hubs
    ) as pool:
        verts = pool.verts
        n = pool.n
        h = np.ones(n, dtype=np.float64)
        a = np.zeros(n, dtype=np.float64)

        def half_step(direction: int, w: np.ndarray) -> np.ndarray:
            out = pool.scatter(w, direction)
            tot = out.sum()
            return out / tot if tot > 0 else out

        for _ in range(iters):
            a = half_step(0, h)
            h = half_step(1, a)

    import ray.data as rd

    scores = rd.from_arrow(
        pa.table({"vertex": verts, "auth": np.round(a, 6), "hub": np.round(h, 6)})
    )
    return HitsResult(scores=scores, iterations=iters, mode="local")


def _hits_shuffle(edges: Dataset, iters: int, num_partitions: int | None) -> HitsResult:
    """Scores stay a hash-partitioned Dataset end to end; each half-step
    is one keyed join + one groupby-sum (contribution-proportional)."""
    import pyarrow.compute as pc

    from ..stages.joins import hash_join
    from ..stages.skew import bucketed_group_sum, coalesce_small_blocks
    from .pagerank import _all_vertices

    npart = num_partitions or default_parallelism()
    # clamp to data size: tiny partitions only add per-half-step fixed cost
    npart = max(2, min(npart, edges.count() // 100_000 + 2))
    verts = coalesce_small_blocks(_all_vertices(edges)).materialize()

    scores = verts.map_batches(
        lambda t: pa.table(
            {"vertex": t["vertex"], "h": np.ones(len(t), dtype=np.float64)}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def half_step(scores: Dataset, prev_tot: float, from_col: str, to_col: str):
        """One propagation: emit prev scores normalized BY THE CALLER's
        total (normalization fused into the emit map -- no separate
        divide pass + materialize per half-step), join across edges,
        reduce per receiving vertex. Returns (raw sums, their total)."""
        div = prev_tot if prev_tot > 0 else 1.0
        emit = scores.map_batches(
            lambda t: pa.table(
                {from_col: t["vertex"], "w": pc.divide(t["s"], div)}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        joined = hash_join(edges, emit, on=(from_col,), num_partitions=npart)
        contrib = joined.map_batches(
            lambda t: pa.table({"vertex": t[to_col], "s": t["w"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # zero rows for every vertex ride the same bucketed exchange, so
        # neither the per-vertex keyed aggregate (ms-per-group reduce at
        # |V| groups -- the round-3 gate's 75 s wall) nor a left_outer
        # re-attach join runs
        zeros = verts.map_batches(
            lambda t: pa.table(
                {"vertex": t["vertex"], "s": np.zeros(len(t), dtype=np.float64)}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # re-bundle the exchange's tiny per-upstream-block outputs so the
        # next half-step launches O(blocks) tasks, not O(upstream blocks)
        sums = coalesce_small_blocks(
            bucketed_group_sum(contrib.union(zeros), "vertex", "s")
        ).materialize()
        return sums, float(sums.sum("s") or 0.0)

    scores = verts.map_batches(
        lambda t: pa.table(
            {"vertex": t["vertex"], "s": np.ones(len(t), dtype=np.float64)}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    tot_h = 1.0  # initial h = 1 exactly (matches the unrolled oracle)
    auths, tot_a = None, 1.0
    for _ in range(iters):
        auths, tot_a = half_step(scores, tot_h, "src", "dst")
        scores, tot_h = half_step(auths, tot_a, "dst", "src")

    da = tot_a if tot_a > 0 else 1.0
    dh = tot_h if tot_h > 0 else 1.0
    ar = auths.map_batches(
        lambda t: pa.table({"vertex": t["vertex"], "a": pc.divide(t["s"], da)}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    hr = scores.map_batches(
        lambda t: pa.table({"vertex": t["vertex"], "h": pc.divide(t["s"], dh)}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    merged = hash_join(ar, hr, on=("vertex",), num_partitions=npart)
    out = merged.map_batches(
        lambda t: pa.table(
            {
                "vertex": t["vertex"],
                "auth": np.round(t["a"].to_numpy(zero_copy_only=False), 6),
                "hub": np.round(t["h"].to_numpy(zero_copy_only=False), 6),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return HitsResult(scores=out, iterations=iters, mode="shuffle")
