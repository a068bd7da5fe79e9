"""k-core decomposition via iterative peeling.

The k-core is the maximal induced subgraph with minimum degree >= k.
Peeling loop: compute degrees (groupby-count), keep vertices with
degree >= k, induce the subgraph on the keepers, repeat until stable.
Each round is one aggregation plus one membership filter; rounds are
bounded by the peeling depth (typically a handful on web graphs).

Membership filtering uses the broadcast path (ray.put the sorted keeper
ids, vectorized searchsorted per batch) below `broadcast_threshold`
keepers, else a semi-join via two hash joins -- the same adaptive split
as the triangle degree attach.

Oracle: the DuckDB mirror unrolls N peel rounds (N >= convergence depth
on the fixture); extra rounds are no-ops at the fixpoint, so the
unrolled result equals the engine's fixpoint.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..context import default_parallelism
from ..stages.graph import degrees, drop_self_loops


class _EdgeMembershipFilter:
    """Keep edges whose BOTH endpoints are in the broadcast sorted ids."""

    def __init__(self, ref):
        self._ref = ref
        self._ids = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._ids is None:
            self._ids = ray.get(self._ref)
        ids = self._ids
        if len(ids) == 0 or len(t) == 0:
            return t.slice(0, 0)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)

        def member(v):
            pos = np.minimum(np.searchsorted(ids, v), len(ids) - 1)
            return ids[pos] == v

        keep = member(src) & member(dst)
        return t.filter(pa.array(keep))


def kcore(
    edges: Dataset,
    k: int,
    *,
    max_rounds: int = 64,
    broadcast_threshold: int = 5_000_000,
) -> Dataset:
    """(vertex, degree) of the k-core of a canonical symmetric edge
    table (self-loops ignored); degree is within the core."""
    import pyarrow.compute as pc

    sub = drop_self_loops(edges).materialize()
    empty = None
    for _ in range(max_rounds):
        degs = degrees(sub).materialize()
        keep = degs.map_batches(
            lambda t: t.filter(pc.greater_equal(t["degree"], k)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        n_all = degs.count()
        n_keep = keep.count()
        if n_keep == 0:
            import ray.data as rd

            empty = rd.from_arrow(
                pa.table(
                    {"vertex": pa.array([], pa.int64()), "degree": pa.array([], pa.int64())}
                )
            )
            return empty
        if n_keep == n_all:
            return keep
        if n_keep <= broadcast_threshold:
            ids = np.sort(
                np.concatenate(
                    [
                        b["vertex"].to_numpy(zero_copy_only=False)
                        for b in keep.iter_batches(
                            batch_format="pyarrow", batch_size=None
                        )
                    ]
                )
            )
            ref = ray.put(ids)
            sub = sub.map_batches(
                _EdgeMembershipFilter(ref),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize()
        else:
            from ..stages.joins import hash_join

            npart = max(2, min(default_parallelism(), n_keep // 100_000 + 2))
            ks = keep.map_batches(
                lambda t: pa.table({"src": t["vertex"]}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            kd = keep.map_batches(
                lambda t: pa.table({"dst": t["vertex"]}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            sub = hash_join(
                hash_join(sub, ks, on=("src",), num_partitions=npart),
                kd,
                on=("dst",),
                num_partitions=npart,
            ).materialize()
    return degrees(sub)
