"""Incremental k-truss decomposition over a sharded mutable support
index (VERDICT r3 item 6; the 100-TB shape named by truss_peel's own
docstring).

The synchronous formulation (pipelines/triangles.py::truss_peel) pays a
full O(m'^1.5) triangle-closure recomputation per peel round. Here the
closure runs ONCE to produce the triangle list; after that each round's
work and communication are proportional to the CHANGE (deleted edges +
destroyed triangles), the same frontier-proportional posture as the
pinned CC solver:

  - edge shards own (packed edge key -> support, alive) for their hash
    partition of the undirected edge set;
  - triangle shards own (e1, e2, e3) packed-key triples with an alive
    bit; a triangle dies the first round any of its edges dies, and on
    death emits one -1 credit per edge, routed to the edge's owner;
  - per round: shards delete alive edges with support < k-2, the
    deleted key sets are exchanged via the object store (deleted-edge
    proportional, never O(m)), triangle shards mark newly dead
    triangles and bucket their decrements by owner, edge shards apply.

Per-round semantics are IDENTICAL to the synchronous peel: an alive
triangle is exactly a triangle of the surviving subgraph, so "support
from alive triangles" equals "support recomputed on the subgraph", and
bounded-round results match truss_peel round for round (equality test
in tests/test_truss.py). rounds=None runs to the k-truss fixpoint.

Packing: key = (lo << 31) | hi needs vids < 2^31 (the same bound as
edge_support's packed path); wider minted-id spaces fall back to the
synchronous peel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..context import default_parallelism
from ..stages.graph import drop_self_loops
from .triangles import triangle_list, truss_peel

_SHIFT = np.int64(31)
_MASK = np.int64((1 << 31) - 1)
_MAX_ROUNDS = 512  # mirrors MAX_SUPERSTEPS (pipelines/cc.py)

_EMPTY_CREDITS = pa.table(
    {"k": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
)


def _as_arrow(block) -> pa.Table:
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block, preserve_index=False)


@ray.remote
def _split_edge_keys(block, nshards: int):
    """Pack one undirected-edge block (a < b) into keys and bucket by
    key % nshards (one object per owner via num_returns)."""
    t = _as_arrow(block)
    if t.num_rows == 0 or "a" not in t.column_names:
        out = [np.empty(0, dtype=np.int64)] * nshards
        return tuple(out) if nshards > 1 else out[0]
    a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    keys = (np.minimum(a, b) << _SHIFT) | np.maximum(a, b)
    owner = keys % nshards
    out = [keys[owner == s] for s in range(nshards)]
    return tuple(out) if nshards > 1 else out[0]


@ray.remote
class TrussShardActor:
    """One hash partition of the mutable edge-support index plus a
    round-robin slice of the triangle list."""

    def load_edges(self, key_arrays: list) -> int:
        # nested ObjectRefs are not auto-resolved inside list args
        key_arrays = ray.get(list(key_arrays))
        keys = np.unique(np.concatenate([np.asarray(k) for k in key_arrays]))
        self.keys = keys
        self.sup = np.zeros(len(keys), dtype=np.int64)
        self.alive = np.ones(len(keys), dtype=bool)
        return len(keys)

    def load_triangles(self, blocks: list, nshards: int):
        """Store this shard's triangles and emit the INITIAL +1 support
        credits per edge owner (num_returns=nshards at the call site)."""
        tabs = [_as_arrow(b) for b in ray.get(list(blocks))]
        tabs = [t for t in tabs if t.num_rows and "ta" in t.column_names]
        if tabs:
            t = pa.concat_tables(tabs)
            ta = t["ta"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            tb = t["tb"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            tc = t["tc"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            self.e1 = (np.minimum(ta, tb) << _SHIFT) | np.maximum(ta, tb)
            self.e2 = (np.minimum(tb, tc) << _SHIFT) | np.maximum(tb, tc)
            self.e3 = (np.minimum(ta, tc) << _SHIFT) | np.maximum(ta, tc)
        else:
            self.e1 = self.e2 = self.e3 = np.empty(0, dtype=np.int64)
        self.talive = np.ones(len(self.e1), dtype=bool)
        credits = self._bucket_credits(
            np.concatenate([self.e1, self.e2, self.e3]), nshards
        )
        return tuple(credits) if nshards > 1 else credits[0]

    @staticmethod
    def _bucket_credits(keys_all: np.ndarray, nshards: int) -> list:
        if len(keys_all) == 0:
            return [_EMPTY_CREDITS] * nshards
        owner = keys_all % nshards
        out = []
        for s in range(nshards):
            u, cnt = np.unique(keys_all[owner == s], return_counts=True)
            out.append(pa.table({"k": u, "c": cnt.astype(np.int64)}))
        return out

    def apply_credits(self, credit_tabs: list, sign: int = 1) -> None:
        if len(self.keys) == 0:
            return
        for t in ray.get(list(credit_tabs)):
            t = _as_arrow(t)
            if t.num_rows == 0:
                continue
            ck = t["k"].to_numpy(zero_copy_only=False)
            cc_ = t["c"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, ck)
            ok = (pos < len(self.keys)) & (self.keys[np.minimum(pos, len(self.keys) - 1)] == ck)
            np.add.at(self.sup, pos[ok], sign * cc_[ok])

    def collect_deleted(self, k: int):
        """Mark alive edges with support < k-2 dead; return (count,
        deleted key array). num_returns=2 at the call site keeps the
        keys in the object store -- the driver pulls counts only."""
        dead = self.alive & (self.sup < k - 2)
        self.alive[dead] = False
        return int(dead.sum()), self.keys[dead]

    def destroy_triangles(self, deleted_key_refs: list, nshards: int):
        """Kill alive triangles touching any newly deleted edge and
        bucket one -1 credit per (edge of a newly dead triangle) by
        owner. Work is O(alive triangles) membership checks against a
        sorted deleted set of this round's size only."""
        arrs = [np.asarray(a) for a in ray.get(list(deleted_key_refs))]
        del_sorted = np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)
        if len(del_sorted) == 0 or not self.talive.any():
            out = [_EMPTY_CREDITS] * nshards
            return tuple(out) if nshards > 1 else out[0]

        def hit(e: np.ndarray) -> np.ndarray:
            pos = np.minimum(np.searchsorted(del_sorted, e), len(del_sorted) - 1)
            return del_sorted[pos] == e

        nd = self.talive & (hit(self.e1) | hit(self.e2) | hit(self.e3))
        self.talive[nd] = False
        credits = self._bucket_credits(
            np.concatenate([self.e1[nd], self.e2[nd], self.e3[nd]]), nshards
        )
        return tuple(credits) if nshards > 1 else credits[0]

    def surviving(self) -> pa.Table:
        k = self.keys[self.alive]
        return pa.table({"a": k >> _SHIFT, "b": k & _MASK})


def truss_peel_incremental(
    edges: Dataset,
    *,
    k: int = 5,
    rounds: int | None = None,
    nshards: int | None = None,
) -> Dataset:
    """(a, b): undirected edges surviving `rounds` k-truss peel rounds
    (None = fixpoint), computed incrementally: one triangle closure up
    front, then change-proportional decrement rounds over the sharded
    support index. Round-for-round identical to truss_peel."""
    import ray.data as rd

    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    simple = drop_self_loops(edges).materialize()
    vmax = simple.max("dst")
    if vmax is None:
        return rd.from_arrow(empty)
    if int(vmax) >= 2**31:
        # minted 63-bit id space: two ids don't pack into int64
        # (rounds=0 is a valid no-op bound — don't coerce it to the max)
        return truss_peel(
            edges, k=k, rounds=rounds if rounds is not None else _MAX_ROUNDS
        )

    und = simple.map_batches(
        lambda t: t.filter(pc.less(t["src"], t["dst"])).rename_columns(["a", "b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    tri = triangle_list(simple).materialize()
    # shard count proportional to the index size (~500k keys per shard):
    # per-round cost is change-proportional regardless, but spawn + the
    # nshards^2 credit exchange are pure overhead on small graphs
    ns = nshards or max(
        2, min(default_parallelism(), 16, und.count() // 500_000 + 2)
    )

    actors = [TrussShardActor.remote() for _ in range(ns)]
    try:
        # --- load edges: split each block by key-hash owner
        eblocks = [
            r for bd in und.iter_internal_ref_bundles() for r in bd.block_refs
        ]
        if not eblocks:
            return rd.from_arrow(empty)
        if ns > 1:
            splits = [
                _split_edge_keys.options(num_returns=ns).remote(r, ns)
                for r in eblocks
            ]
            egroups = [[s[i] for s in splits] for i in range(ns)]
        else:
            egroups = [[_split_edge_keys.remote(r, 1) for r in eblocks]]
        load_refs = [a.load_edges.remote(g) for a, g in zip(actors, egroups)]

        # --- load triangles round-robin; collect initial credits
        tblocks = [
            r for bd in tri.iter_internal_ref_bundles() for r in bd.block_refs
        ]
        tgroups: list[list] = [[] for _ in range(ns)]
        for i, r in enumerate(tblocks):
            tgroups[i % ns].append(r)
        n_edges_total = sum(ray.get(load_refs))
        if ns > 1:
            init_credits = [
                a.load_triangles.options(num_returns=ns).remote(g, ns)
                for a, g in zip(actors, tgroups)
            ]
            ray.get(
                [
                    actors[s].apply_credits.remote(
                        [init_credits[i][s] for i in range(ns)], 1
                    )
                    for s in range(ns)
                ]
            )
        else:
            c0 = [actors[0].load_triangles.remote(tgroups[0], 1)]
            ray.get([actors[0].apply_credits.remote(c0, 1)])

        # --- peel rounds: deleted-set exchange + triangle decrements
        max_rounds = rounds if rounds is not None else _MAX_ROUNDS
        n_deleted_total = 0
        for _ in range(max_rounds):
            if ns > 1:
                pairs = [
                    a.collect_deleted.options(num_returns=2).remote(k)
                    for a in actors
                ]
                counts = ray.get([p[0] for p in pairs])
                del_refs = [p[1] for p in pairs]
            else:
                cnt0, dk0 = ray.get(actors[0].collect_deleted.remote(k))
                counts, del_refs = [cnt0], [ray.put(dk0)]
            if sum(counts) == 0:
                break
            n_deleted_total += sum(counts)
            if ns > 1:
                dec = [
                    a.destroy_triangles.options(num_returns=ns).remote(del_refs, ns)
                    for a in actors
                ]
                ray.get(
                    [
                        actors[s].apply_credits.remote(
                            [dec[i][s] for i in range(ns)], -1
                        )
                        for s in range(ns)
                    ]
                )
            else:
                d0 = [actors[0].destroy_triangles.remote(del_refs, 1)]
                ray.get([actors[0].apply_credits.remote(d0, -1)])

        if n_deleted_total >= n_edges_total:
            # from_arrow_refs over all-empty blocks loses the schema;
            # return the typed empty table directly
            return rd.from_arrow(empty)
        out_refs = [a.surviving.remote() for a in actors]
        ray.wait(out_refs, num_returns=len(out_refs))
        return rd.from_arrow_refs(out_refs)
    finally:
        # from_arrow_refs holds the result objects; actors can go
        for a in actors:
            ray.kill(a, no_restart=True)
