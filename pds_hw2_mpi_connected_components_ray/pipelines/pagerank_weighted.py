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
    """(vertex, pr) after `iters` synchronous weighted power steps."""
    wedges = wedges.materialize()
    verts = _all_vertices(wedges).materialize()
    n = verts.count()
    if mode == "auto":
        mode = "local" if n <= broadcast_threshold else "shuffle"
    if mode == "local":
        return _local(wedges, verts, n, damping, iters)
    return _shuffle(wedges, verts, n, damping, iters, num_partitions)


def _normalized_edges(wedges: Dataset) -> Dataset:
    """(src, dst, p) with p = w/W(src) — the surfer transition matrix,
    computed once (one groupby + one join)."""
    wd = wedges.groupby("src").aggregate(Sum("weight", alias_name="_W"))
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


def _local(wedges, verts, n, damping, iters) -> Dataset:
    """Broadcast-rank mode: per iteration ship one (n,) float64 vector
    via ray.put, accumulate weighted contributions per batch."""
    vid = np.sort(
        pa.concat_tables(
            list(verts.iter_batches(batch_format="pyarrow", batch_size=None))
        )["vertex"].to_numpy(zero_copy_only=False)
    )
    pe = _normalized_edges(wedges)
    has_out = np.zeros(len(vid), dtype=bool)
    for t in pe.iter_batches(batch_format="pyarrow", batch_size=None):
        has_out[np.searchsorted(vid, np.unique(t["src"].to_numpy(zero_copy_only=False)))] = True
    r = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(iters):
        ref = ray.put((vid, r))

        def partial(t: pa.Table) -> pa.Table:
            vv, rr = ray.get(ref)
            s = np.searchsorted(vv, t["src"].to_numpy(zero_copy_only=False))
            d = np.searchsorted(vv, t["dst"].to_numpy(zero_copy_only=False))
            contrib = rr[s] * t["p"].to_numpy(zero_copy_only=False)
            acc = np.zeros(len(vv), dtype=np.float64)
            np.add.at(acc, d, contrib)
            nz = np.nonzero(acc)[0]
            return pa.table({"i": nz.astype(np.int64), "c": acc[nz]})

        # stream partials to the driver (n <= broadcast threshold by
        # mode selection), accumulate with one scatter-add per block —
        # a per-iteration groupby here cost ~4x the whole iteration at
        # bench scale (same structure as the unweighted _pagerank_local)
        inc = np.zeros(n, dtype=np.float64)
        for b in pe.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            bi = b["i"].to_numpy(zero_copy_only=False)
            if len(bi):
                np.add.at(inc, bi, b["c"].to_numpy(zero_copy_only=False))
        dang = float(r[~has_out].sum())
        r = (1 - damping) / n + damping * (inc + dang / n)
    out = pd.DataFrame({"vertex": vid, "pr": np.round(r, 6)})
    import ray.data as rd

    return rd.from_pandas(out)


def _shuffle(wedges, verts, n, damping, iters, num_partitions) -> Dataset:
    npart = num_partitions or default_parallelism()
    # clamp partitions to data size (same as pipelines.triangles): tiny
    # partitions only add per-iteration shuffle-actor fixed cost
    npart = max(2, min(npart, wedges.count() // 100_000 + 2))
    pe = _normalized_edges(wedges)
    # vertices with out-edges (for the dangling term): summary-sized
    outs = pe.groupby("src").aggregate(Sum("p", alias_name="_one"))
    ranks = verts.map_batches(
        lambda df: pd.DataFrame(
            {"vertex": df["vertex"].astype(np.int64), "r": np.full(len(df), 1.0 / n)}
        ),
        batch_format="pandas",
    ).materialize()
    dang_v = hash_join(
        verts, outs.map_batches(
            lambda df: pd.DataFrame({"vertex": df["src"].astype(np.int64), "_o": 1}),
            batch_format="pandas",
        ),
        on=("vertex",),
        join_type="left_outer",
        num_partitions=npart,
    ).map_batches(
        lambda df: pd.DataFrame({"vertex": df.loc[df["_o"].isna(), "vertex"].astype(np.int64)}),
        batch_format="pandas",
    ).materialize()
    n_dang = dang_v.count()  # static across iterations
    for _ in range(iters):
        # a symmetric edge table has no dangling vertices; skip the join
        # entirely then (it would also feed Ray's per-partition acero
        # join schema-less empty partitions, which it rejects)
        dang = 0.0
        if n_dang:
            dang = float(
                hash_join(dang_v, ranks, on=("vertex",), num_partitions=npart)
                .map_batches(
                    lambda df: pd.DataFrame({"s": [df["r"].sum()]}),
                    batch_format="pandas",
                )
                .sum("s")
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
        inc = contrib.groupby("vertex").aggregate(Sum("c", alias_name="c"))
        merged = hash_join(
            verts, inc, on=("vertex",), join_type="left_outer", num_partitions=npart
        )
        base = (1 - damping) / n + damping * dang / n

        def step(df: pd.DataFrame, _b=base, _d=damping) -> pd.DataFrame:
            c = df["c"].fillna(0.0).to_numpy(np.float64)
            return pd.DataFrame(
                {"vertex": df["vertex"].astype(np.int64), "r": _b + _d * c}
            )

        ranks = merged.map_batches(step, batch_format="pandas").materialize()
    return ranks.map_batches(
        lambda df: pd.DataFrame(
            {"vertex": df["vertex"].astype(np.int64), "pr": np.round(df["r"].to_numpy(np.float64), 6)}
        ),
        batch_format="pandas",
    )
