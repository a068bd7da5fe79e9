"""Label-propagation community detection (synchronous, deterministic).

Update rule (fixed K iterations, synchronous -- every vertex updates
from the previous iteration's labels):

    new_label(v) = argmax_label count(label among distinct neighbors of v)
                   ties -> smallest label; no neighbors -> keep own label

The deterministic tie-break replaces the usual randomized/async LPA so
results are parallelism-invariant and oracle-checkable (FIXTURES.md:
"seeded tie-break for determinism"); the async flavor of the north_star
is approximated by raising ``iterations`` -- labels still converge to
community consensus. Neighbor multiplicity is over the deduped
symmetric edge table (distinct neighbors).

Modes mirror cc/pagerank: ``local`` broadcasts the label vector
(n <= threshold); ``shuffle`` is one hash join + ONE bucketed exchange
per iteration (neighbor-label rows and self-fallback rows hash to the
same vertex bucket; the in-bucket reduce picks the per-vertex mode
vectorized), fully distributed; ``pinned`` is decentralized over
dst-hash CSC shard actors (shard-owned label slices, scalar-only
driver traffic).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..context import default_parallelism
from ..stages.graph import init_labels, vertices
from ..stages.joins import hash_join


@dataclass
class LabelPropResult:
    labels: Dataset  # (vertex:int64, label:int64)
    iterations: int
    mode: str
    resumed_from: int | None = None


def labelprop(
    edges: Dataset,
    *,
    iterations: int = 4,
    mode: str = "auto",
    broadcast_threshold: int = 2_000_000,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> LabelPropResult:
    """Run sync LPA on a canonical symmetric deduped edge table.

    `checkpoint_dir` saves the (vertex, label) state after every
    iteration (atomic tmp+rename+_SUCCESS, the CC checkpoint layout);
    `resume=True` restarts from the latest complete iteration and runs
    only the remaining ones — sync LPA is deterministic, so a resumed
    run's labels equal a fresh run's. The state schema is a FORMAT
    contract: any mode can resume a checkpoint any mode wrote."""
    edges = edges.materialize()
    if mode == "auto":
        n = vertices(edges).count()
        mode = "local" if n <= broadcast_threshold else "shuffle"
    if mode == "pinned":
        return _lp_pinned(
            edges, iterations, checkpoint_dir=checkpoint_dir, resume=resume
        )
    if mode == "local":
        return _lp_local(
            edges, iterations, checkpoint_dir=checkpoint_dir, resume=resume
        )
    return _lp_shuffle(
        edges, iterations, num_partitions,
        checkpoint_dir=checkpoint_dir, resume=resume,
    )


def _lp_pinned(
    edges: Dataset,
    iterations: int,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> LabelPropResult:
    """DECENTRALIZED actor-pool sync LPA over pinned dst-hash CSC
    shards: each shard owns its vertex partition's labels, computes
    COMPLETE per-dst neighbor-label modes locally (shards are
    dst-disjoint, same deterministic count-desc/label-asc tie-break),
    and peers exchange label slices through the object store. The
    driver reduces only the changed-count scalar per iteration."""
    from ..state.shards import (
        build_shard_pool,
        default_shard_count,
        init_vertex_ownership,
    )

    actors = build_shard_pool(edges, default_shard_count(edges))
    try:
        init_vertex_ownership(actors)
        ns = len(actors)
        ray.get([a.lp_start.remote() for a in actors])
        from ..state import checkpoint as ckpt

        resumed_from = None
        start_it = 1
        if resume and checkpoint_dir is not None:
            last = ckpt.latest_superstep(checkpoint_dir)
            if last is not None:
                step_dir = ckpt.step_dir(checkpoint_dir, last)
                ray.get([a.lp_load_checkpoint.remote(step_dir) for a in actors])
                resumed_from = last
                start_it = last + 1
        for it in range(start_it, iterations + 1):
            # per-subscriber label slices (request-order values only):
            # same edge-cut-proportional push as PageRank/CC; the
            # emit-to-all form shipped the whole O(n) label vector to
            # every shard per iteration. Refs only on the driver.
            if ns > 1:
                ls = [
                    a.lp_emit_slices.options(num_returns=ns).remote()
                    for a in actors
                ]
                changed = sum(
                    ray.get(
                        [
                            actors[s].lp_step.remote([ls[p][s] for p in range(ns)])
                            for s in range(ns)
                        ]
                    )
                )
            else:
                ls0 = [a.lp_emit_slices.remote() for a in actors]
                changed = sum(ray.get([actors[0].lp_step.remote(ls0)]))
            if checkpoint_dir is not None:
                tmp = ckpt.begin_state_tmp(checkpoint_dir, it)
                ray.get([a.lp_write_checkpoint.remote(tmp) for a in actors])
                ckpt.commit_superstep(
                    checkpoint_dir,
                    it,
                    {"iteration": it, "changed": int(changed),
                     "mode": "pinned", "kernel": "labelprop"},
                )
            if changed == 0:
                break
        import ray.data as rd

        labels = rd.from_arrow_refs([a.lp_table.remote() for a in actors])
        labels = labels.materialize()
    finally:
        for a in actors:
            ray.kill(a)

    return LabelPropResult(
        labels=labels, iterations=iterations, mode="pinned",
        resumed_from=resumed_from,
    )


def _mode_per_vertex(d: np.ndarray, lab: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-dst mode with (count desc, label asc) tie-break.

    Inputs: parallel arrays of (dst, neighbor_label) pairs.
    Returns (dst_unique, winning_label).
    """
    if len(d) == 0:
        return d, lab
    pairs = np.stack([d, lab], axis=1)
    uniq, counts = np.unique(pairs, axis=0, return_counts=True)
    du, lu = uniq[:, 0], uniq[:, 1]
    order = np.lexsort((lu, -counts, du))  # dst asc, count desc, label asc
    du, lu = du[order], lu[order]
    first = np.r_[True, du[1:] != du[:-1]]
    return du[first], lu[first]


# ---------------------------------------------------------------- local


class _NeighborLabels:
    def __init__(self, ref):
        self._ref = ref
        self._state = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._state is None:
            self._state = ray.get(self._ref)
        verts, labels = self._state
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        lab = labels[np.searchsorted(verts, src)]
        # per-batch partial counts as a combiner
        pairs = np.stack([dst, lab], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        return pa.table(
            {"vertex": uniq[:, 0], "label": uniq[:, 1], "cnt": counts.astype(np.int64)}
        )


def _lp_local(
    edges: Dataset,
    iterations: int,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> LabelPropResult:
    from ..state import checkpoint as ckpt
    from .cc import _collect_vertices

    verts = _collect_vertices(edges)
    n = len(verts)
    labels = verts.copy()
    resumed_from = None
    start_it = 1
    if resume and checkpoint_dir is not None:
        last = ckpt.latest_superstep(checkpoint_dir)
        if last is not None:
            st, _lin = ckpt.load_state(checkpoint_dir, last)
            sv = st["vertex"].to_numpy(zero_copy_only=False)
            sl = st["label"].to_numpy(zero_copy_only=False)
            labels[np.searchsorted(verts, sv)] = sl
            resumed_from = last
            start_it = last + 1
    for it in range(start_it, iterations + 1):
        ref = ray.put((verts, labels))
        partials = edges.map_batches(
            _NeighborLabels(ref), batch_format="pyarrow", zero_copy_batch=True
        )
        vv, ll, cc_ = [], [], []
        for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
            vv.append(b["vertex"].to_numpy(zero_copy_only=False))
            ll.append(b["label"].to_numpy(zero_copy_only=False))
            cc_.append(b["cnt"].to_numpy(zero_copy_only=False))
        if not vv:
            break
        d = np.concatenate(vv)
        lab = np.concatenate(ll)
        cnt = np.concatenate(cc_)
        # merge partial counts, then argmax with deterministic tie-break
        pairs = np.stack([d, lab], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tot, inv, cnt)
        du, lu = uniq[:, 0], uniq[:, 1]
        order = np.lexsort((lu, -tot, du))
        du, lu = du[order], lu[order]
        first = np.r_[True, du[1:] != du[:-1]]
        winners_v, winners_l = du[first], lu[first]
        new = labels.copy()
        new[np.searchsorted(verts, winners_v)] = winners_l
        if np.array_equal(new, labels):
            break
        labels = new
        if checkpoint_dir is not None:
            # local mode is driver-sized by definition
            ckpt.save_state_table(
                checkpoint_dir,
                it,
                pa.table({"vertex": verts, "label": labels}),
                {"iteration": it, "mode": "local", "kernel": "labelprop"},
            )

    import ray.data as rd

    return LabelPropResult(
        labels=rd.from_arrow(pa.table({"vertex": verts, "label": labels})),
        iterations=iterations,
        mode="local",
        resumed_from=resumed_from,
    )


# -------------------------------------------------------------- shuffle


def _bucketed_mode_merge(rows: Dataset, num_buckets: int) -> Dataset:
    """(vertex, label, _self) rows -> (vertex, label): per-vertex mode
    of the _self==0 rows (max count, tie -> smallest label), falling
    back to the vertex's _self==1 row when it has no neighbor rows.
    One hash-bucketed exchange; the in-bucket reduce is a single
    lexsort + reduceat pass (same shape as stages/skew.py helpers)."""
    nb = max(2, num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["vertex"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_kb", pa.array((k * np.int64(0x9E3779B9)) % nb, pa.int64())
        )

    def bucket_mode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vertex": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                }
            )
        v = t["vertex"].to_numpy(zero_copy_only=False)
        lab = t["label"].to_numpy(zero_copy_only=False)
        selfm = t["_self"].to_numpy(zero_copy_only=False) == 1
        vv, ll = v[~selfm], lab[~selfm]
        if vv.size:
            order = np.lexsort((ll, vv))
            vv, ll = vv[order], ll[order]
            b = np.flatnonzero(np.r_[True, (vv[1:] != vv[:-1]) | (ll[1:] != ll[:-1])])
            cnt = np.diff(np.r_[b, vv.size])
            gv, gl = vv[b], ll[b]
            # winner per vertex: sort (vertex asc, cnt desc, label asc),
            # take group heads
            w = np.lexsort((gl, -cnt, gv))
            wv, wl = gv[w], gl[w]
            wb = np.flatnonzero(np.r_[True, wv[1:] != wv[:-1]])
            win_v, win_l = wv[wb], wl[wb]
        else:
            win_v = np.empty(0, np.int64)
            win_l = np.empty(0, np.int64)
        sv, sl = v[selfm], lab[selfm]
        if sv.size:
            if win_v.size:
                pos = np.clip(np.searchsorted(win_v, sv), 0, win_v.size - 1)
                covered = win_v[pos] == sv
            else:
                covered = np.zeros(sv.size, bool)
            win_v = np.concatenate([win_v, sv[~covered]])
            win_l = np.concatenate([win_l, sl[~covered]])
        return pa.table({"vertex": win_v, "label": win_l})

    return (
        rows.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb", num_partitions=nb)
        .map_groups(bucket_mode, batch_format="pyarrow")
    )


def _lp_shuffle(
    edges: Dataset,
    iterations: int,
    num_partitions: int | None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> LabelPropResult:
    from ..state import checkpoint as ckpt

    npart = num_partitions or default_parallelism()
    # clamp to data size (same as hits shuffle): tiny partitions only
    # add per-iteration fixed cost to the join + reduce all-to-alls
    npart = max(2, min(npart, edges.count() // 100_000 + 2))
    labels = init_labels(edges).materialize()
    resumed_from = None
    start_it = 1
    if resume and checkpoint_dir is not None:
        last = ckpt.latest_superstep(checkpoint_dir)
        if last is not None:
            import os

            import ray.data as rd

            labels = (
                rd.read_parquet(
                    os.path.join(ckpt.step_dir(checkpoint_dir, last), "state")
                )
                .select_columns(["vertex", "label"])
                .materialize()
            )
            resumed_from = last
            start_it = last + 1
    for it in range(start_it, iterations + 1):
        fr = labels.map_batches(
            lambda t: t.rename_columns(["src", "slabel"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        neigh = hash_join(edges, fr, on=("src",), num_partitions=npart)
        # ONE bucketed exchange per iteration: neighbor-label rows and
        # self-fallback rows (the previous labels) hash to the same
        # vertex bucket; each bucket computes the per-vertex mode
        # (max count, tie -> smallest label) vectorized and falls back
        # to the self row for vertices with no neighbor rows. Replaces
        # groupby((vertex,label)).count + per-vertex map_groups argmax
        # + left_outer re-attach — three keyed all-to-alls at |V|(+)
        # group counts whose ms-per-group reduce dominated this mode
        # (~10 s/iter at 27k edges).
        nb_rows = neigh.map_batches(
            lambda t: pa.table(
                {
                    "vertex": t["dst"],
                    "label": t["slabel"],
                    "_self": pa.array(np.zeros(len(t), np.int64)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        self_rows = labels.map_batches(
            lambda t: pa.table(
                {
                    "vertex": t["vertex"],
                    "label": t["label"],
                    "_self": pa.array(np.ones(len(t), np.int64)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        from ..stages.skew import coalesce_small_blocks

        labels = coalesce_small_blocks(
            _bucketed_mode_merge(nb_rows.union(self_rows), npart)
        ).materialize()
        if checkpoint_dir is not None:
            # distributed parquet write of the materialized label blocks
            ckpt.save_state_ds(
                checkpoint_dir,
                it,
                labels,
                {"iteration": it, "mode": "shuffle", "kernel": "labelprop"},
            )
    return LabelPropResult(
        labels=labels, iterations=iterations, mode="shuffle",
        resumed_from=resumed_from,
    )
