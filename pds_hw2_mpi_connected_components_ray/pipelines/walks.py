"""Deterministic random-walk corpus generation (DeepWalk/node2vec input).

Embedding pipelines train on walk sequences sampled from the link
graph. For an engine whose correctness gate is exact-match oracles,
the walks are DETERMINISTIC: at each step the walker at vertex v moves
to the neighbor u minimizing a seeded integer hash
h(seed, walk, step, u) (ties by u) — a fixed pseudo-random choice that
is (a) stable under row order, block splits and parallelism, (b) one
vectorized expression per candidate edge, and (c) exactly mirrorable
in ANSI SQL (the same multiply-mod arithmetic).

Per step, the plan is one hash join (frontier ⋈ edges on the current
vertex) plus one groupby-min over walks — candidate volume is
Σ deg(v_cur), i.e. edge-proportional, never materializing adjacency
per walker. The argmin is a single Min aggregate over the packed key
h·2³² + u (requiring u < 2³², asserted — the derived bench graphs and
any dictionary-encoded vertex space satisfy it; minted 63-bit id
spaces need re-encoding first, documented).

Dead ends (vertices with no out-edge — impossible on a symmetrized
table) simply terminate the walk; output rows exist for the steps
taken.

Adaptive execution (the engine-wide triangles/kcore convention): when
the edge table is below `_BROADCAST_EDGES`, the sorted-adjacency CSR
goes into the object store ONCE (`ray.put`) and the ENTIRE walk — all
steps — computes in a single shuffle-free `map_batches` over start
vertices (per batch: gather neighbor slices via repeat/reduceat,
argmin the same packed hash key per walker segment). Per-step cost is
one vectorized pass over Σ deg(v_cur) within the batch; zero
exchanges. Above the threshold the per-step join+groupby plan runs —
that is the 100 TB path, where adjacency cannot live on one node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Min

from ..context import default_parallelism
from ..stages.joins import hash_join

# multiply-mod mix, SQL-mirrorable: all intermediates < 2^63
_M = 1_000_000_007
_A = 2_654_435_761  # Knuth multiplicative
_B = 97
_C = 1_000_003


def _hash_expr(u: np.ndarray, walk: np.ndarray, step: int, seed: int) -> np.ndarray:
    # the seed is folded into the MULTIPLIED term ((u + seed) * A):
    # an additive-only seed shifts every candidate of one choice by the
    # same constant mod M, which flips the argmin only on wraparound --
    # i.e. almost never (caught by the seed-sensitivity test)
    return (
        ((u + np.int64(seed)) % _M) * _A + (walk % _M) * _B + np.int64(step) * _C
    ) % _M


_BROADCAST_EDGES = 5_000_000


def _walks_broadcast(
    edges: Dataset, *, length: int, seed: int
) -> Dataset:
    """Shuffle-free walk: broadcast sorted-adjacency CSR, one
    map_batches over start vertices computes every step locally."""
    import ray as _ray

    from ..stages.graph import vertices

    etab = pa.concat_tables(
        list(edges.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    src = etab["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    dst = etab["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    if len(dst) and int(dst.max()) >= 2**32:
        raise ValueError(
            "deterministic_walks requires vertex ids < 2^32 "
            "(dictionary-encode a minted 63-bit space first)"
        )
    order = np.lexsort((dst, src))
    src_s, dst_s = src[order], dst[order]
    uniq_src = np.unique(src_s)
    offs = np.searchsorted(src_s, uniq_src)
    offs = np.append(offs, len(src_s))
    csr_ref = _ray.put((uniq_src, offs, dst_s))

    def walk_all(t: pa.Table) -> pa.Table:
        uniq, off, nbrs = _ray.get(csr_ref)
        start = t["vertex"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        walk = start
        cur = start
        out_w = [walk]
        out_s = [np.zeros(len(walk), dtype=np.int64)]
        out_v = [cur]
        for step in range(1, length + 1):
            pos = np.searchsorted(uniq, cur)
            pos_c = np.minimum(pos, len(uniq) - 1)
            alive = (len(uniq) > 0) & (uniq[pos_c] == cur)
            walk, cur, pos_c = walk[alive], cur[alive], pos_c[alive]
            if len(cur) == 0:
                break
            deg = off[pos_c + 1] - off[pos_c]
            cum0 = np.cumsum(deg) - deg
            total = int(deg.sum())
            idx = np.repeat(off[pos_c] - cum0, deg) + np.arange(total, dtype=np.int64)
            u = nbrs[idx]
            h = _hash_expr(u, np.repeat(walk, deg), step, seed)
            key = np.minimum.reduceat(h * (2**32) + u, cum0)
            cur = key % (2**32)
            out_w.append(walk)
            out_s.append(np.full(len(walk), step, dtype=np.int64))
            out_v.append(cur)
        return pa.table(
            {
                "walk_id": np.concatenate(out_w),
                "step": np.concatenate(out_s),
                "vertex": np.concatenate(out_v),
            }
        )

    return vertices(edges).map_batches(
        walk_all, batch_format="pyarrow", zero_copy_batch=True
    )


def deterministic_walks(
    edges: Dataset,
    *,
    length: int = 3,
    seed: int = 42,
    num_partitions: int | None = None,
    mode: str = "auto",
) -> Dataset:
    """(walk_id, step, vertex): one walk per start vertex, `length`
    hops, deterministic seeded neighbor choice. step 0 is the start."""
    npart = num_partitions or default_parallelism()
    from ..stages.graph import vertices

    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "broadcast" or (
        mode == "auto" and edges.count() <= _BROADCAST_EDGES
    ):
        return _walks_broadcast(edges, length=length, seed=seed)

    cur = vertices(edges).map_batches(
        lambda t: pa.table(
            {
                "walk_id": t["vertex"],
                "vertex": t["vertex"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    outs = [
        cur.map_batches(
            lambda t: t.append_column(
                "step", pa.array(np.zeros(len(t), dtype=np.int64))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    ]

    for step in range(1, length + 1):
        cand = hash_join(
            cur,
            edges.map_batches(
                lambda t: pa.table({"vertex": t["src"], "u": t["dst"]}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            on=("vertex",),
            num_partitions=npart,
        )

        def pack(t: pa.Table, _step=step) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            w = t["walk_id"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            if len(u) and int(u.max()) >= 2**32:
                raise ValueError(
                    "deterministic_walks requires vertex ids < 2^32 "
                    "(dictionary-encode a minted 63-bit space first)"
                )
            h = _hash_expr(u, w, _step, seed)
            return pa.table({"walk_id": w, "_key": h * (2**32) + u})

        from ..stages.skew import bucketed_group_reduce

        # per-walk min via the bucketed exchange (groups = walks,
        # data-proportional; Ray's keyed aggregate pays ~ms per group)
        nxt = bucketed_group_reduce(
            cand.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True),
            "walk_id",
            "_key",
            "min",
        )

        def unpack(t: pa.Table, _step=step) -> pa.Table:
            key = t["_key"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "walk_id": t["walk_id"],
                    "vertex": key % (2**32),
                    "step": np.full(len(t), _step, dtype=np.int64),
                }
            )

        stepped = nxt.map_batches(
            unpack, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        outs.append(stepped)
        cur = stepped.select_columns(["walk_id", "vertex"])

    result = outs[0]
    for o in outs[1:]:
        result = result.union(o)
    return result.map_batches(
        lambda t: t.select(["walk_id", "step", "vertex"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
