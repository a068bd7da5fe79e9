"""PageRank: power iteration with uniform dangling-mass redistribution.

Semantics (fixed across all execution modes and the DuckDB oracle):

    r_0(v)     = 1/n
    r_{k+1}(v) = (1-d)/n + d * ( sum_{u->v} r_k(u)/outdeg(u) + D_k/n )
    D_k        = sum of r_k over vertices with outdeg == 0

Synchronous updates; either a fixed iteration count (oracle-comparable)
or an L1 tolerance. Works on directed or symmetric edge tables (on a
symmetric table there are no dangling vertices, but the term is still
computed -- it is exactly 0).

Three modes, same adaptive split as CC (SURVEY.md section 4): ``local``
broadcasts the O(n) rank vector per iteration (n <= threshold),
``shuffle`` keeps ranks in a hash-partitioned Dataset and does one
hash join + one bucketed union-sum exchange per iteration (state rows
carry deg and old_rank through the same exchange, so there is no
keyed aggregate or re-attach join), ``pinned`` runs decentralized over
dst-hash CSC shard actors (shard-owned rank slices exchanged peer to
peer; the driver reduces two scalars per iteration).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ..context import default_parallelism
from ..stages.joins import hash_join
from ..stages.skew import (
    bucketed_distinct,
    bucketed_group_sum,
    coalesce_small_blocks,
)

_DAMPING = 0.85


@dataclass
class PageRankResult:
    ranks: Dataset  # (vertex:int64, rank:float64)
    iterations: int
    mode: str
    l1_delta: float
    resumed_from: int | None = None


def _all_vertices(edges: Dataset) -> Dataset:
    """Distinct vertices over src and dst (directed-safe)."""

    def per_batch(t: pa.Table) -> pa.Table:
        u = pc.unique(pa.concat_arrays([t["src"].combine_chunks(), t["dst"].combine_chunks()]))
        return pa.table({"vertex": u})

    local = edges.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_distinct(local, "vertex")


def pagerank(
    edges: Dataset,
    *,
    damping: float = _DAMPING,
    max_iters: int = 20,
    tol: float | None = None,
    mode: str = "auto",
    broadcast_threshold: int = 2_000_000,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> PageRankResult:
    """`checkpoint_dir` saves the exact float64 rank state after every
    iteration (atomic tmp+rename+_SUCCESS, same layout contract as the
    CC checkpoints); `resume=True` restarts from the latest complete
    iteration instead of r_0 — a 20-iteration run that dies at 18
    repeats 2 iterations, not 18. The state schema (vertex, rank) is a
    FORMAT contract: any mode can resume a checkpoint any mode wrote."""
    edges = edges.materialize()
    if mode == "auto":
        n = _all_vertices(edges).count()
        mode = "local" if n <= broadcast_threshold else "shuffle"
    if mode == "pinned":
        return _pagerank_pinned(
            edges, damping, max_iters, tol,
            checkpoint_dir=checkpoint_dir, resume=resume,
        )
    if mode == "local":
        return _pagerank_local(
            edges, damping, max_iters, tol,
            checkpoint_dir=checkpoint_dir, resume=resume,
        )
    return _pagerank_shuffle(
        edges, damping, max_iters, tol, num_partitions,
        checkpoint_dir=checkpoint_dir, resume=resume,
    )


def _pagerank_pinned(
    edges: Dataset,
    damping: float,
    max_iters: int,
    tol: float | None,
    seed_mod: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> PageRankResult:
    """DECENTRALIZED actor-pool power iteration over pinned dst-hash CSC
    shards: each shard owns the ranks of its vertex partition, peers
    pull each other's (vertex, rank/outdeg) slices through the object
    store, and the driver reduces only two scalars per iteration
    (dangling mass, L1 delta) -- no O(n) driver vector (round 1 merged
    contributions and ranks on the driver every iteration)."""
    from ..state.shards import (
        build_shard_pool,
        default_shard_count,
        init_vertex_ownership,
    )

    actors = build_shard_pool(edges, default_shard_count(edges))
    try:
        n = init_vertex_ownership(actors)
        ns = len(actors)
        if seed_mod is not None:
            # each shard derives its own p slice from the modulus; only
            # the global seed COUNT crosses the wire (two scalars/shard)
            n_seeds = int(sum(ray.get([a.pr_seed_count.remote(seed_mod) for a in actors])))
            if n_seeds == 0:
                raise ValueError(f"no seeds: no vertex id divisible by {seed_mod}")
            ray.get([a.pr_start_personalized.remote(n_seeds) for a in actors])
        else:
            ray.get([a.pr_start.remote(n) for a in actors])
        from ..state import checkpoint as ckpt

        resumed_from = None
        start_it = 1
        it = 0
        l1 = float("inf")
        if resume and checkpoint_dir is not None:
            last = ckpt.latest_superstep(checkpoint_dir)
            if last is not None:
                step_dir = ckpt.step_dir(checkpoint_dir, last)
                ray.get([a.pr_load_checkpoint.remote(step_dir) for a in actors])
                lin = ckpt.load_lineage(checkpoint_dir, last)
                resumed_from = last
                start_it = last + 1
                it = last
                l1 = float(lin.get("l1", float("inf")))
        for it in range(start_it, max_iters + 1):
            # per-subscriber weight slices (request-order values only):
            # each shard ingests exactly the weights its edges read --
            # the emit-to-all form shipped the whole O(n) vector to
            # every shard per iteration. Refs only on the driver.
            if ns > 1:
                ws = [
                    a.pr_emit_slices.options(num_returns=ns).remote()
                    for a in actors
                ]
            else:
                ws = [[a.pr_emit_slices.remote() for a in actors]]
            dangling = float(sum(ray.get([a.pr_dangling.remote() for a in actors])))
            if ns > 1:
                l1 = float(
                    sum(
                        ray.get(
                            [
                                actors[s].pr_step.remote(
                                    [ws[p][s] for p in range(ns)], dangling, damping
                                )
                                for s in range(ns)
                            ]
                        )
                    )
                )
            else:
                l1 = float(sum(ray.get([actors[0].pr_step.remote(ws[0], dangling, damping)])))
            if checkpoint_dir is not None:
                tmp = ckpt.begin_state_tmp(checkpoint_dir, it)
                ray.get([a.pr_write_checkpoint.remote(tmp) for a in actors])
                ckpt.commit_superstep(
                    checkpoint_dir,
                    it,
                    {"iteration": it, "l1": l1, "mode": "pinned",
                     "kernel": "pagerank", "damping": damping},
                )
            if tol is not None and l1 < tol:
                break
        import ray.data as rd

        ranks = rd.from_arrow_refs([a.pr_table.remote() for a in actors])
        ranks = ranks.materialize()
    finally:
        for a in actors:
            ray.kill(a)

    mode = "pinned" if seed_mod is None else "ppr-pinned"
    return PageRankResult(
        ranks=ranks, iterations=it, mode=mode, l1_delta=l1,
        resumed_from=resumed_from,
    )


# ---------------------------------------------------------------- local


def _pagerank_local(
    edges: Dataset,
    damping: float,
    max_iters: int,
    tol: float | None,
    seed_mod: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> PageRankResult:
    # load-once / solve-many (stages/scatter.py): edge blocks pin in a
    # slice-actor pool by reference; the vertex set, out-degrees and the
    # position index all derive from one pool prep (no separate
    # vertices/degree/index Dataset passes), and each iteration below is
    # one broadcast + one RPC round of gather+reduceat — no Dataset
    # execution per pass (20 executions for 20 iterations was >90%
    # scheduling fixed cost at gate scale)
    from ..stages.scatter import ScatterPool

    pool = ScatterPool(edges, directions=[("src", "dst")])
    try:
        verts = pool.verts
        n = pool.n
        deg = pool.sender_degrees(0)

        # preference vector: uniform 1/n for classic PageRank, the seed
        # distribution for personalized (r0 = p; teleport AND dangling
        # mass both land on p — the standard PPR formulation)
        if seed_mod is not None:
            seed_mask = verts % seed_mod == 0
            n_seeds = int(seed_mask.sum())
            if n_seeds == 0:
                raise ValueError(f"no seeds: no vertex id divisible by {seed_mod}")
            p = seed_mask.astype(np.float64) / n_seeds
        else:
            p = np.full(n, 1.0 / n)
        r = p.copy()
        dangling_mask = deg == 0
        from ..state import checkpoint as ckpt

        resumed_from = None
        start_it = 1
        it = 0
        l1 = float("inf")
        if resume and checkpoint_dir is not None:
            last = ckpt.latest_superstep(checkpoint_dir)
            if last is not None:
                st, lin = ckpt.load_state(checkpoint_dir, last)
                sv = st["vertex"].to_numpy(zero_copy_only=False)
                sr = st["rank"].to_numpy(zero_copy_only=False)
                r[np.searchsorted(verts, sv)] = sr
                resumed_from = last
                start_it = last + 1
                it = last
                l1 = float(lin.get("l1", float("inf")))
        for it in range(start_it, max_iters + 1):
            w = np.where(dangling_mask, 0.0, r / np.maximum(deg, 1))
            contrib = pool.scatter(w, 0)
            dangling = float(r[dangling_mask].sum())
            r_new = (1 - damping) * p + damping * (contrib + dangling * p)
            l1 = float(np.abs(r_new - r).sum())
            r = r_new
            if checkpoint_dir is not None:
                # local mode is driver-sized by definition (n <= broadcast
                # threshold), so a single-part state write is fine here
                ckpt.save_state_table(
                    checkpoint_dir,
                    it,
                    pa.table({"vertex": verts, "rank": r}),
                    {"iteration": it, "l1": l1, "mode": "local",
                     "kernel": "pagerank", "damping": damping},
                )
            if tol is not None and l1 < tol:
                break
    finally:
        pool.shutdown()

    import ray.data as rd

    mode = "local" if seed_mod is None else "ppr-local"
    ranks = rd.from_arrow(pa.table({"vertex": verts, "rank": r}))
    return PageRankResult(
        ranks=ranks, iterations=it, mode=mode, l1_delta=l1,
        resumed_from=resumed_from,
    )


def personalized_pagerank(
    edges: Dataset,
    *,
    seed_mod: int,
    damping: float = _DAMPING,
    max_iters: int = 10,
    tol: float | None = None,
    mode: str = "local",
    broadcast_threshold: int = 2_000_000,
) -> PageRankResult:
    """Personalized PageRank: teleport (and dangling mass) land on the
    planted seed set {v : v % seed_mod == 0} instead of uniformly —
    the standard seeded-relevance ranking for link graphs ("rank pages
    near these trusted roots").

        r_0      = p
        r_{k+1}  = (1-d)·p + d·(Σ_{u→v} r_k(u)/deg(u) + D_k·p(v))
        p(v)     = 1/|S| for seeds, else 0

    Classic PageRank is the p = 1/n special case — both share one
    iteration kernel, so every scale property of `pagerank` (broadcast
    ref per iteration, per-batch scatter combiner, edge table never
    moves; or the decentralized pinned pool) carries over verbatim.
    The seed set is defined by a modulus rather than an explicit list
    so each pinned shard derives its own p slice locally — only the
    global seed COUNT crosses the wire, never a seed vector.
    """
    edges = edges.materialize()
    if mode == "auto":
        n = _all_vertices(edges).count()
        mode = "local" if n <= broadcast_threshold else "pinned"
    if mode == "pinned":
        return _pagerank_pinned(edges, damping, max_iters, tol, seed_mod=seed_mod)
    return _pagerank_local(edges, damping, max_iters, tol, seed_mod=seed_mod)


# -------------------------------------------------------------- shuffle


def _pagerank_shuffle(
    edges: Dataset,
    damping: float,
    max_iters: int,
    tol: float | None,
    num_partitions: int | None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> PageRankResult:
    from ..state import checkpoint as ckpt

    npart = num_partitions or default_parallelism()
    # clamp to data size (same as hits shuffle): tiny partitions only
    # add per-iteration fixed cost to the join + reduce all-to-alls
    npart = max(2, min(npart, edges.count() // 100_000 + 2))
    verts = _all_vertices(edges).materialize()
    n = verts.count()

    # out-degree partials per batch, summed in one bucketed exchange
    # (a keyed Count at |V| groups pays ~ms per group in Ray's sort
    # aggregate; the bucketed reduce is one reduceat per bucket)
    def _deg_partial(t: pa.Table) -> pa.Table:
        s = np.sort(t["src"].to_numpy(zero_copy_only=False))
        if s.size == 0:
            return pa.table(
                {"vertex": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
            )
        b = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        return pa.table(
            {"vertex": s[b], "deg": np.diff(np.r_[b, s.size]).astype(np.int64)}
        )

    deg = edges.map_batches(
        _deg_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    # vertex table with degree (0 for dangling): union + bucketed sum
    vdeg = bucketed_group_sum(
        verts.map_batches(
            lambda t: t.append_column("deg", pa.array(np.zeros(len(t), np.int64))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).union(deg),
        "vertex",
        "deg",
        num_buckets=npart,
    )
    vdeg = coalesce_small_blocks(vdeg).materialize()

    ranks = vdeg.map_batches(
        lambda t: pa.table(
            {
                "vertex": t["vertex"],
                "deg": t["deg"],
                "rank": pa.array(np.full(len(t), 1.0 / n)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    resumed_from = None
    start_it = 1
    it = 0
    l1 = float("inf")
    if resume and checkpoint_dir is not None:
        last = ckpt.latest_superstep(checkpoint_dir)
        if last is not None:
            import os

            import ray.data as rd

            # (vertex, rank) state read as a DATASET (workers read the
            # parts); degrees re-derive from vdeg via one hash join, so
            # the checkpoint format stays mode-portable
            st = rd.read_parquet(
                os.path.join(ckpt.step_dir(checkpoint_dir, last), "state")
            ).select_columns(["vertex", "rank"])
            ranks = hash_join(
                vdeg, st, on=("vertex",), num_partitions=npart
            ).materialize()
            lin = ckpt.load_lineage(checkpoint_dir, last)
            resumed_from = last
            start_it = last + 1
            it = last
            l1 = float(lin.get("l1", float("inf")))
    for it in range(start_it, max_iters + 1):
        dangling = (
            ranks.map_batches(
                lambda t: pa.table(
                    {
                        "m": pa.array(
                            [
                                pc.sum(
                                    pc.if_else(
                                        pc.equal(t["deg"], 0), t["rank"], 0.0
                                    )
                                ).as_py()
                                or 0.0
                            ],
                            pa.float64(),
                        )
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).sum("m")
            or 0.0
        )
        contribs_src = ranks.map_batches(
            lambda t: pa.table(
                {
                    "src": t["vertex"],
                    "w": pc.divide(
                        t["rank"],
                        pc.cast(pc.max_element_wise(t["deg"], 1), pa.float64()),
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        joined = hash_join(edges, contribs_src, on=("src",), num_partitions=npart)
        # ONE bucketed exchange merges contributions back into the rank
        # state: contribution rows and state rows (carrying deg +
        # old_rank, contrib=0) hash to the same vertex bucket and a
        # single reduceat pass sums all three columns per vertex.
        # Replaces groupby(vertex).Sum + a left_outer re-attach join —
        # two keyed all-to-alls at |V| group count per iteration (the
        # same ms-per-group reduce the LP shuffle fix removed).
        contrib_rows = joined.map_batches(
            lambda t: pa.table(
                {
                    "vertex": t["dst"],
                    "contrib": t["w"],
                    "deg": pa.array(np.zeros(len(t), np.int64)),
                    "old_rank": pa.array(np.zeros(len(t), np.float64)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        state_rows = ranks.map_batches(
            lambda t: pa.table(
                {
                    "vertex": t["vertex"],
                    "contrib": pa.array(np.zeros(len(t), np.float64)),
                    "deg": t["deg"],
                    "old_rank": t["rank"],
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        base = (1 - damping) / n + damping * dangling / n
        merged = bucketed_group_sum(
            contrib_rows.union(state_rows),
            "vertex",
            "contrib",
            num_buckets=npart,
            extra=["deg", "old_rank"],
        )
        # batch_size bundles the exchange's tiny per-upstream-block
        # outputs back into a few full blocks, so the next iteration's
        # maps/joins launch O(blocks) tasks, not O(upstream blocks)
        new_ranks = merged.map_batches(
            lambda t: pa.table(
                {
                    "vertex": t["vertex"],
                    "deg": t["deg"],
                    "rank": pc.add(base, pc.multiply(damping, t["contrib"])),
                    "old_rank": t["old_rank"],
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=4_000_000,
        ).materialize()
        l1 = (
            new_ranks.map_batches(
                lambda t: pa.table(
                    {
                        "d": pa.array(
                            [pc.sum(pc.abs(pc.subtract(t["rank"], t["old_rank"]))).as_py() or 0.0],
                            pa.float64(),
                        )
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).sum("d")
            or 0.0
        )
        ranks = new_ranks.drop_columns(["old_rank"]).materialize()
        if checkpoint_dir is not None:
            # distributed parquet write of the materialized rank blocks
            # (no driver materialization; atomic tmp+rename+_SUCCESS)
            ckpt.save_state_ds(
                checkpoint_dir,
                it,
                ranks.select_columns(["vertex", "rank"]),
                {"iteration": it, "l1": l1, "mode": "shuffle",
                 "kernel": "pagerank", "damping": damping},
            )
        if tol is not None and l1 < tol:
            break

    return PageRankResult(
        ranks=ranks.drop_columns(["deg"]), iterations=it, mode="shuffle",
        l1_delta=l1, resumed_from=resumed_from,
    )
