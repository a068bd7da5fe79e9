"""Strongly connected components of a DIRECTED edge table via
decentralized FW-BW coloring over twin pinned shard pools.

Algorithm (Fleischer/Hendrickson/Pinar FW-BW peeling in its coloring
form, the standard distributed SCC formulation — e.g. Slota et al.'s
Multistep; the hash-min fixpoint kernel is the same semiring as pinned
CC/BFS, reference relax loop src/connected_components.c:109-128):

  repeat until every vertex is assigned:
    F(v) = min id of an ACTIVE vertex reaching v   (min-label fixpoint
                                                    on the forward pool)
    B(v) = min id of an ACTIVE vertex v reaches    (same, reversed pool)
    every v with F(v) == B(v) = q is mutually reachable with q ⇒
    scc(v) = q (canonical: q is the SCC's min id); peel those v.

Each round peels at least SCC(min active vertex) — and in web graphs
the giant SCC plus every "locally minimal" SCC go in round one; the
round count is bounded by the longest chain in the SCC condensation
DAG, the known cost profile of this algorithm family (a trim pass for
cycle-free tails would cut it further; not needed at bench scale).

Twin pools: the directed table loads one pool as-is and one reversed,
BOTH padded with (v, v) self-loops so every vertex is an owned dst in
each pool (the pinned ownership invariant); a self-loop is a no-op
under strict-min relax and does not alter SCC semantics. Active masks
and labels live shard-side; per superstep only improved frontier
slices cross the object store, per round only the B-slices and peeled
ids (both active-set-proportional) — the driver moves refs and scalar
counts, never O(n) state.

Self-loops in the INPUT are dropped (SCC is about cycles through
distinct vertices; the vertex set is the self-loop-free table's).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def _pad_with_self_loops(directed: Dataset, reverse: bool) -> Dataset:
    """Self-loop-free directed edges (optionally reversed) unioned with
    one (v, v) row per vertex (vertex set = src ∪ dst)."""
    import ray.data as rd

    def clean(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        if reverse:
            s, d = d, s
        return pa.table({"src": s, "dst": d})

    def vert_partial(t: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    t["src"].to_numpy(zero_copy_only=False),
                    t["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"vertex": u})

    base = directed.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)
    from ..stages.skew import bucketed_distinct

    verts = bucketed_distinct(
        base.map_batches(vert_partial, batch_format="pyarrow", zero_copy_batch=True),
        "vertex",
    )
    loops = verts.map_batches(
        lambda t: pa.table({"src": t["vertex"], "dst": t["vertex"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return base.union(loops)


def scc_labels(
    directed_edges: Dataset,
    *,
    nshards: int | None = None,
    max_peel_rounds: int = 256,
    max_supersteps: int = 4096,
    trim: bool = False,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    stop_after_rounds: int | None = None,
    info: dict | None = None,
) -> Dataset:
    """(vertex, label) with label = min vertex id of v's strongly
    connected component, over the self-loop-free directed graph.

    `checkpoint_dir` saves the peel state (vertex, label-or-−1, active)
    after every FW-BW round (atomic tmp+rename+_SUCCESS, the CC layout);
    `resume=True` reloads the graph and restarts from the latest
    complete round — in web graphs round one peels the giant SCC, so a
    resumed run skips the dominant cost. `stop_after_rounds` stops a
    checkpointed run early WITHOUT the convergence error (the
    kill-at-round-k simulation; unpeeled vertices stay unassigned).
    `info`, if passed, is filled with {rounds, supersteps, resumed_from}."""
    import ray.data as rd

    from ..state import checkpoint as ckpt
    from ..state.shards import (
        default_shard_count,
        establish_subscriptions,
        load_shard_pool,
        spawn_shard_pool,
    )

    # one padded derivation: the BW table is the FW table with the
    # columns swapped (self-loops are symmetric), a zero-copy rename
    # instead of a second clean+distinct+union pass
    fwd_tab = _pad_with_self_loops(directed_edges, reverse=False).materialize()
    bwd_tab = fwd_tab.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    # data-sized twin pools (same clamp as the BFS family): small
    # graphs get small pools -- per-superstep coordination dominates
    # below ~200k edges/shard -- while big data still gets
    # one-shard-per-core
    ns = nshards or default_shard_count(fwd_tab)
    acts_f = spawn_shard_pool(ns)
    acts_b = spawn_shard_pool(ns)
    try:
        # load + init both pools concurrently (disjoint actors); each
        # load gets HALF the usual wave budget so the combined in-flight
        # CSC-build peak stays within the one-pool bound (when gating
        # engages, the fwd loads serialize ahead of the bwd submission
        # -- memory safety over overlap on oversized graphs; ungated
        # loads keep the full overlap)
        ray.get(
            load_shard_pool(acts_f, fwd_tab, budget_frac=0.25)
            + load_shard_pool(acts_b, bwd_tab, budget_frac=0.25)
        )
        inits = ray.get(
            [a.scc_init.remote(i, ns) for i, a in enumerate(acts_f)]
            + [a.scc_init.remote(i, ns) for i, a in enumerate(acts_b)]
        )
        sizes_f = inits[:ns]
        if not all(r for _s, r in sizes_f):
            establish_subscriptions(acts_f)
        establish_subscriptions(acts_b)
        active = sum(s for s, _r in sizes_f)
        resumed_from = None
        if resume and checkpoint_dir is not None:
            last = ckpt.latest_superstep(checkpoint_dir)
            if last is not None:
                step_dir = ckpt.step_dir(checkpoint_dir, last)
                counts = ray.get(
                    [a.scc_load_checkpoint.remote(step_dir, True) for a in acts_f]
                )
                ray.get(
                    [a.scc_load_checkpoint.remote(step_dir, False) for a in acts_b]
                )
                active = int(sum(counts))
                resumed_from = last
                # restored state already incorporates any trim deaths
                trim = False
        if trim:
            # Multistep trim: peel cycle-free vertices (zero active
            # in-degree on either direction) to fixpoint before FW-BW —
            # tree tails and chains vanish without paying min-label
            # fixpoints. Labels land on the forward pool only.
            ray.get([a.scc_trim_init.remote() for a in acts_f + acts_b])
            while True:
                dead = [a.scc_trim_take.remote(True) for a in acts_f] + [
                    a.scc_trim_take.remote(False) for a in acts_b
                ]
                counts = ray.get(
                    [a.scc_apply_deaths.remote(dead, True) for a in acts_f]
                    + [a.scc_apply_deaths.remote(dead, False) for a in acts_b]
                )
                if counts[0] == 0:
                    break
            active = sum(ray.get([a.scc_active_count.remote() for a in acts_f]))
        total_steps = 0
        rounds = resumed_from or 0
        while active > 0 and rounds < max_peel_rounds:
            if stop_after_rounds is not None and rounds - (
                resumed_from or 0
            ) >= stop_after_rounds:
                break
            # F and B fixpoints run on DISJOINT actor pools with
            # independent state, so their supersteps overlap: each
            # joint step launches one superstep on every unconverged
            # pool and the round's fixpoint wall is max(F, B) steps,
            # not their sum (the driver still barriers per joint step,
            # moving only per-shard improvement counts).
            def _superstep(pool):
                if ns > 1:
                    fs = [
                        a.scc_frontier_slices.options(num_returns=ns).remote()
                        for a in pool
                    ]
                    return [
                        pool[s].scc_relax.remote([fs[p][s] for p in range(ns)])
                        for s in range(ns)
                    ]
                fs0 = [a.scc_frontier_slices.remote() for a in pool]
                return [pool[0].scc_relax.remote(fs0)]

            ray.get([a.scc_phase_init.remote() for a in acts_f + acts_b])
            converged = {True: False, False: False}
            while not (converged[True] and converged[False]):
                pending = {}
                for is_fwd, pool in ((True, acts_f), (False, acts_b)):
                    if converged[is_fwd]:
                        continue
                    if total_steps >= max_supersteps:
                        raise RuntimeError(
                            f"SCC superstep budget ({max_supersteps}) exhausted "
                            "mid-fixpoint -- peeling on a stale fixpoint would "
                            "be incorrect; raise max_supersteps"
                        )
                    pending[is_fwd] = _superstep(pool)
                    total_steps += 1
                for is_fwd, refs in pending.items():
                    converged[is_fwd] = sum(ray.get(refs)) == 0
            ray.get([a.scc_store_f.remote() for a in acts_f])
            b_slices = [a.scc_take_phase.remote() for a in acts_b]
            peeled = [
                acts_f[s].scc_merge_and_peel.remote(b_slices[s]) for s in range(ns)
            ]
            done = sum(
                ray.get(
                    [acts_b[s].scc_deactivate.remote(peeled[s]) for s in range(ns)]
                )
            )
            if done == 0:
                raise RuntimeError(
                    "FW-BW peel made no progress -- the global-min active "
                    "vertex must always peel; state is corrupt"
                )
            active -= done
            rounds += 1
            if checkpoint_dir is not None:
                tmp = ckpt.begin_state_tmp(checkpoint_dir, rounds)
                ray.get([a.scc_write_checkpoint.remote(tmp) for a in acts_f])
                ckpt.commit_superstep(
                    checkpoint_dir,
                    rounds,
                    {"round": rounds, "active": int(active), "kernel": "scc"},
                )
        if info is not None:
            info.update(
                rounds=rounds, supersteps=total_steps, resumed_from=resumed_from
            )
        if active > 0 and stop_after_rounds is not None:
            # deliberate early stop (kill simulation): return the
            # partial assignment; unpeeled vertices are absent
            refs = [a.scc_result_table.remote() for a in acts_f]
            ray.wait(refs, num_returns=len(refs), fetch_local=False)
            return rd.from_arrow_refs(refs)
        if active > 0:
            raise RuntimeError(
                f"SCC did not converge within {max_peel_rounds} peel rounds "
                f"/ {max_supersteps} supersteps ({active} vertices left)"
            )
        refs = [a.scc_result_table.remote() for a in acts_f]
        ray.wait(refs, num_returns=len(refs), fetch_local=False)
        return rd.from_arrow_refs(refs)
    finally:
        for a in acts_f + acts_b:
            ray.kill(a)


def scc_counts(directed_edges: Dataset, **kw) -> Dataset:
    """(label, size) per strongly connected component."""
    from ..stages.skew import bucketed_group_reduce

    # per-component count (groups = components, data-proportional)
    return bucketed_group_reduce(
        scc_labels(directed_edges, **kw), "label", "size", "count"
    )
