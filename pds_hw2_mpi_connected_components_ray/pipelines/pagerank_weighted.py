"""Weighted PageRank over a weighted edge table (src, dst, weight).

Real link graphs are weighted (link multiplicity, anchor-text counts);
the random surfer follows edge (u, v) with probability
w(u,v) / Σ_x w(u,x). Semantics (fixed across modes and the oracle):

    r_0(v)     = 1/n
    r_{k+1}(v) = (1-d)/n + d * ( Σ_{u→v} r_k(u)·w(u,v)/W(u) + D_k/n )
    W(u)       = Σ_x w(u,x);  D_k = Σ r_k(u) over W(u)=0 vertices

Two modes, the same adaptive split as the unweighted kernel
(pipelines.pagerank): `local` broadcasts the rank vector (n under a
threshold) and computes weighted contributions per batch with one
bincount; `shuffle` keeps ranks in a hash-partitioned Dataset — per
iteration one join (ranks ⋈ weighted edges carrying w/W precomputed)
and one groupby-sum, exchange proportional to edges + vertex summary,
never O(n)·workers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..context import default_parallelism
from ..stages.joins import hash_join
from .pagerank import _all_vertices


def pagerank_weighted(
    wedges: Dataset,
    *,
    damping: float = 0.85,
    iters: int = 10,
    mode: str = "auto",
    broadcast_threshold: int = 2_000_000,
    num_partitions: int | None = None,
) -> Dataset:
    """(vertex, pr) after `iters` synchronous weighted power steps.

    Mode gate is the EDGE count (a metadata count, free on a
    materialized dataset): m ≤ threshold bounds the vertex count at 2m,
    so the local mode's dense vectors stay broadcast-sized — round 2
    gated on a vertex count that itself cost a full groupby pass."""
    wedges = wedges.materialize()
    if mode == "auto":
        mode = "local" if wedges.count() <= broadcast_threshold else "shuffle"
    if mode == "local":
        return _local(wedges, damping, iters)
    verts = _all_vertices(wedges).materialize()
    n = verts.count()
    return _shuffle(wedges, verts, n, damping, iters, num_partitions)


def _normalized_edges(wedges: Dataset) -> Dataset:
    """(src, dst, p) with p = w/W(src) — the surfer transition matrix,
    computed once (one bucketed exchange + one join). bucketed_group_sum
    instead of Ray's keyed aggregate: the key is per-VERTEX, and the
    sort-aggregate's ~ms-per-group reduce overhead at |V| groups
    dominated this whole pipeline's wall (measured ~10 s for a 4k-vertex
    table vs ~1 s bucketed)."""
    from ..stages.skew import bucketed_group_sum

    wd = bucketed_group_sum(
        wedges.map_batches(
            lambda t: t.select(["src", "weight"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "src",
        "weight",
    ).map_batches(
        lambda t: t.rename_columns(["src", "_W"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j = hash_join(wedges, wd, on=("src",))
    return j.map_batches(
        lambda df: pd.DataFrame(
            {
                "src": df["src"].astype(np.int64),
                "dst": df["dst"].astype(np.int64),
                "p": df["weight"].to_numpy(np.float64)
                / df["_W"].to_numpy(np.float64),
            }
        ),
        batch_format="pandas",
    ).materialize()


@ray.remote
class _WprSlice:
    """Pinned slice of the RAW weighted edge table. The transition
    normalization that round 2 bought with a groupby + hash join
    (~7 s of Ray overhead on a 300k-edge graph) happens IN the pool:
    each slice reports its local vertex ids and per-src weight partial
    (both vertex-bounded), the driver reduces them, and one broadcast
    of (vid, W) back normalizes every slice locally. Index positions
    resolve once; edges pre-sort by dst so each power step is one
    gather + one reduceat; only the dense rank partial crosses the
    wire per iteration (n ≤ 2·edge-threshold by the mode gate)."""

    def __init__(self, block_refs: list):
        from ..state.shards import _as_arrow

        tabs = [_as_arrow(t) for t in ray.get(list(block_refs))]
        tabs = [t for t in tabs if len(t)]
        if tabs:
            tab = pa.concat_tables(tabs)
            self.src = tab["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            self.dst = tab["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            self.w = tab["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            self.src = np.array([], dtype=np.int64)
            self.dst = np.array([], dtype=np.int64)
            self.w = np.array([], dtype=np.float64)
        self.n = 0

    def local_vertices(self) -> np.ndarray:
        return np.unique(np.concatenate([self.src, self.dst]))

    def w_partial(self, vid: np.ndarray) -> np.ndarray:
        """Dense per-src weight sums over the global vertex index."""
        self.vid = vid
        self.n = len(vid)
        acc = np.zeros(self.n, dtype=np.float64)
        if len(self.w):
            self.si = np.searchsorted(vid, self.src)
            di = np.searchsorted(vid, self.dst)
            o = np.argsort(di, kind="stable")
            self.si, di, self.w = self.si[o], di[o], self.w[o]
            self.bounds = np.flatnonzero(np.r_[True, di[1:] != di[:-1]])
            self.dst_u = di[self.bounds]
            np.add.at(acc, self.si, self.w)
        return acc

    def normalize(self, w_total: np.ndarray) -> None:
        """p = w / W(src) against the globally reduced weight vector."""
        if len(self.w):
            self.p = self.w / w_total[self.si]
        else:
            self.p = self.w

    def step(self, r: np.ndarray) -> np.ndarray:
        acc = np.zeros(self.n, dtype=np.float64)
        if len(self.p):
            contrib = r[self.si] * self.p
            acc[self.dst_u] = np.add.reduceat(contrib, self.bounds)
        return acc


def _local(wedges, damping, iters) -> Dataset:
    """Broadcast-rank mode over a pinned slice-actor pool: raw edge
    blocks move by reference (never through the driver), W/vid derive
    from vertex-bounded pool partials (no groupby, no join, no
    vertices pass), and every iteration is one ray.put + one RPC
    round — round 2 re-executed a full Dataset pipeline per iteration
    plus a normalize join (~15 s of scheduling at bench scale)."""
    block_refs = [
        ref
        for bundle in wedges.iter_internal_ref_bundles()
        for ref in bundle.block_refs
    ]
    ncpus = int(ray.cluster_resources().get("CPU", 8))
    k = max(2, min(16, ncpus, len(block_refs)))
    actors = [_WprSlice.remote(block_refs[i::k]) for i in range(k)]
    try:
        vid = np.unique(
            np.concatenate(ray.get([a.local_vertices.remote() for a in actors]))
        )
        n = len(vid)
        vref = ray.put(vid)
        w_total = np.sum(ray.get([a.w_partial.remote(vref) for a in actors]), axis=0)
        wref = ray.put(w_total)
        ray.get([a.normalize.remote(wref) for a in actors])
        has_out = w_total > 0
        r = np.full(n, 1.0 / n, dtype=np.float64)
        for _ in range(iters):
            rref = ray.put(r)
            parts = ray.get([a.step.remote(rref) for a in actors])
            inc = np.sum(parts, axis=0)
            dang = float(r[~has_out].sum())
            r = (1 - damping) / n + damping * (inc + dang / n)
    finally:
        for a in actors:
            ray.kill(a)
    out = pd.DataFrame({"vertex": vid, "pr": np.round(r, 6)})
    import ray.data as rd

    return rd.from_pandas(out)


def _shuffle(wedges, verts, n, damping, iters, num_partitions) -> Dataset:
    npart = num_partitions or default_parallelism()
    # clamp partitions to data size (same as pipelines.triangles): tiny
    # partitions only add per-iteration shuffle-actor fixed cost
    npart = max(2, min(npart, wedges.count() // 100_000 + 2))
    from ..stages.skew import bucketed_group_sum, coalesce_small_blocks

    pe = _normalized_edges(wedges)
    # dangling flag folded into the rank table ONCE (round-3 gate audit:
    # a per-iteration hash join just to sum the dangling ranks was pure
    # fixed cost): vertices with out-edges, via one bucketed exchange
    outs = bucketed_group_sum(
        pe.map_batches(
            lambda t: pa.table(
                {
                    "vertex": t["src"],
                    "_o": np.ones(len(t), dtype=np.float64),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "vertex",
        "_o",
    )
    ranks = hash_join(
        verts, outs, on=("vertex",), join_type="left_outer", num_partitions=npart
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "vertex": df["vertex"].astype(np.int64),
                "r": np.full(len(df), 1.0 / n),
                # 1.0 for dangling vertices (no out-edges), else 0.0
                "dflag": df["_o"].isna().to_numpy().astype(np.float64),
            }
        ),
        batch_format="pandas",
    ).materialize()
    n_dang = int(
        ranks.map_batches(
            lambda df: pd.DataFrame({"s": [float(df["dflag"].sum())]}),
            batch_format="pandas",
        ).sum("s")
        or 0.0
    )
    for _ in range(iters):
        # dangling mass: one tiny scan over the materialized rank table
        dang = 0.0
        if n_dang:
            dang = float(
                ranks.map_batches(
                    lambda df: pd.DataFrame(
                        {"s": [float((df["r"] * df["dflag"]).sum())]}
                    ),
                    batch_format="pandas",
                ).sum("s")
                or 0.0
            )
        contrib = hash_join(
            pe,
            ranks.map_batches(
                lambda df: pd.DataFrame(
                    {"src": df["vertex"].astype(np.int64), "_r": df["r"]}
                ),
                batch_format="pandas",
            ),
            on=("src",),
            num_partitions=npart,
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "vertex": df["dst"].astype(np.int64),
                    "c": df["_r"].to_numpy(np.float64) * df["p"].to_numpy(np.float64),
                }
            ),
            batch_format="pandas",
        )
        # zero-contribution rows for EVERY vertex union into the same
        # bucketed exchange, so no left_outer re-attach join is needed
        # and the per-vertex keyed aggregate (ms-per-group at |V|
        # groups) never runs
        zeros = ranks.map_batches(
            lambda df: pd.DataFrame(
                {
                    "vertex": df["vertex"].astype(np.int64),
                    "c": np.zeros(len(df), dtype=np.float64),
                    "dflag": df["dflag"].to_numpy(np.float64),
                }
            ),
            batch_format="pandas",
        )
        contrib = contrib.map_batches(
            lambda df: df.assign(dflag=np.zeros(len(df), dtype=np.float64)),
            batch_format="pandas",
        )
        inc = bucketed_group_sum(contrib.union(zeros), "vertex", "c", extra="dflag")
        base = (1 - damping) / n + damping * dang / n

        def step(df: pd.DataFrame, _b=base, _d=damping) -> pd.DataFrame:
            c = df["c"].to_numpy(np.float64)
            return pd.DataFrame(
                {
                    "vertex": df["vertex"].astype(np.int64),
                    "r": _b + _d * c,
                    "dflag": df["dflag"].to_numpy(np.float64),
                }
            )

        # batch_size bundles the exchange's tiny per-upstream-block
        # outputs so the next iteration launches O(blocks) tasks
        ranks = inc.map_batches(
            step, batch_format="pandas", batch_size=4_000_000
        ).materialize()
    return ranks.map_batches(
        lambda df: pd.DataFrame(
            {"vertex": df["vertex"].astype(np.int64), "pr": np.round(df["r"].to_numpy(np.float64), 6)}
        ),
        batch_format="pandas",
    )
