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


def deterministic_walks(
    edges: Dataset,
    *,
    length: int = 3,
    seed: int = 42,
    num_partitions: int | None = None,
) -> Dataset:
    """(walk_id, step, vertex): one walk per start vertex, `length`
    hops, deterministic seeded neighbor choice. step 0 is the start."""
    npart = num_partitions or default_parallelism()
    from ..stages.graph import vertices

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

        nxt = (
            cand.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("walk_id")
            .aggregate(Min("_key", alias_name="_key"))
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
