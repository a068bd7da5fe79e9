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

from ..context import default_parallelism, exchange_partitions
from ..stages.graph import degrees, drop_self_loops


_CORENESS_BROADCAST_EDGES = 5_000_000  # symmetric rows; CSR ~80 MB


def _hindex_runs(keys: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(key, h-index of that key's values) for every distinct key.
    One lexsort by (key, -val); within a descending run the predicate
    `val_i >= i+1` is prefix-monotone, so the h-index is its count."""
    if len(keys) == 0:
        return keys.astype(np.int64), keys.astype(np.int64)
    order = np.lexsort((-vals, keys))
    k2, v2 = keys[order], vals[order]
    starts = np.flatnonzero(np.r_[True, k2[1:] != k2[:-1]])
    pos = np.arange(len(k2), dtype=np.int64) - np.repeat(
        starts, np.diff(np.r_[starts, len(k2)])
    )
    ok = (v2 >= pos + 1).astype(np.int64)
    return k2[starts], np.add.reduceat(ok, starts)


def _coreness_broadcast(simple: Dataset, max_rounds: int) -> Dataset:
    """Small-graph mode: the rank-space CSR is ray.put ONCE; each round
    ships one O(n) h vector and computes new-h slices on workers over
    contiguous rank ranges (no per-round shuffle). The driver holds only
    the h vector, bounded by _CORENESS_BROADCAST_EDGES."""
    import ray.data as rd

    tab = pa.concat_tables(
        list(simple.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    src = tab["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    dst = tab["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    vids, deg = np.unique(src, return_counts=True)
    n = len(vids)
    if n == 0:
        return rd.from_arrow(
            pa.table({"vertex": pa.array([], pa.int64()), "coreness": pa.array([], pa.int64())})
        )
    rs = np.searchsorted(vids, src)
    nbr = np.searchsorted(vids, dst)[np.argsort(rs, kind="stable")]
    off = np.searchsorted(np.sort(rs), np.arange(n + 1, dtype=np.int64))
    csr_ref = ray.put((nbr, off))

    nparts = max(2, min(default_parallelism(), n // 10_000 + 2))
    bounds = np.linspace(0, n, nparts + 1).astype(np.int64)
    ranges = rd.from_arrow(
        pa.table({"lo": bounds[:-1], "hi": bounds[1:]})
    ).repartition(nparts)

    h = deg.astype(np.int64)
    for _ in range(max_rounds):
        h_ref = ray.put(h)

        def slice_fn(t: pa.Table) -> pa.Table:
            nb, of = ray.get(csr_ref)
            hh = ray.get(h_ref)
            los = t["lo"].to_numpy(zero_copy_only=False)
            his = t["hi"].to_numpy(zero_copy_only=False)
            outs_v, outs_h = [], []
            for lo, hi in zip(los, his):
                if hi <= lo:
                    continue
                seg_nbr = nb[of[lo]:of[hi]]
                cnt = np.diff(of[lo : hi + 1])
                keys = np.repeat(np.arange(lo, hi, dtype=np.int64), cnt)
                kk, hv = _hindex_runs(keys, hh[seg_nbr])
                outs_v.append(kk)
                outs_h.append(hv)
            if not outs_v:
                return pa.table(
                    {"r": pa.array([], pa.int64()), "h": pa.array([], pa.int64())}
                )
            return pa.table(
                {"r": np.concatenate(outs_v), "h": np.concatenate(outs_h)}
            )

        newh = np.empty(n, dtype=np.int64)
        for b in ranges.map_batches(
            slice_fn, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            newh[b["r"].to_numpy(zero_copy_only=False)] = b["h"].to_numpy(
                zero_copy_only=False
            )
        if np.array_equal(newh, h):
            break
        h = newh
    return rd.from_arrow(pa.table({"vertex": vids, "coreness": h}))


def _coreness_shuffle(simple: Dataset, max_rounds: int) -> Dataset:
    """Web-scale mode: per round, attach h to the edge src side
    (broadcast lookup below threshold, hash join beyond), then ONE
    bucketed exchange computes the per-dst h-index over sorted runs
    (~parallelism buckets — no per-vertex tiny groups). The h-index
    iteration is monotone non-increasing, so convergence is detected by
    the scalar sum(h) going stationary (no comparison join needed)."""
    from ..stages.joins import broadcast_attach, hash_join, put_lookup

    h = degrees(simple).map_batches(
        lambda t: t.rename_columns(["vertex", "h"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    nvert = h.count()
    npart = max(2, min(default_parallelism(), nvert // 100_000 + 2))
    nb = max(8, default_parallelism())
    total = h.sum("h")

    def bucketize(t: pa.Table) -> pa.Table:
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dst": d,
                "hs": t["hs"].to_numpy(zero_copy_only=False).astype(np.int64),
                "_kb": (d * np.int64(0x9E3779B9)) % nb,
            }
        )

    def bucket_hindex(t: pa.Table) -> pa.Table:
        d = t["dst"].to_numpy(zero_copy_only=False)
        v = t["hs"].to_numpy(zero_copy_only=False)
        kk, hv = _hindex_runs(d, v)
        return pa.table({"vertex": kk, "h": hv})

    for _ in range(max_rounds):
        if nvert <= _CORENESS_BROADCAST_EDGES:
            h_tab = pa.concat_tables(
                list(h.iter_batches(batch_format="pyarrow", batch_size=None))
            )
            ref = put_lookup(h_tab, "vertex", "h")
            attached = broadcast_attach(
                simple.map_batches(
                    lambda t: pa.table({"vertex": t["src"], "dst": t["dst"]}),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                ),
                ref,
                "vertex",
                "hs",
            )
        else:
            attached = hash_join(
                simple.map_batches(
                    lambda t: pa.table({"vertex": t["src"], "dst": t["dst"]}),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                ),
                h.map_batches(
                    lambda t: pa.table({"vertex": t["vertex"], "hs": t["h"]}),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                ),
                on=("vertex",),
                num_partitions=npart,
            )
        h = (
            attached.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_kb", num_partitions=exchange_partitions())
            .map_groups(bucket_hindex, batch_format="pyarrow")
            .materialize()
        )
        new_total = h.sum("h")
        if new_total == total:
            break
        total = new_total
    return h.map_batches(
        lambda t: t.rename_columns(["vertex", "coreness"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def coreness(
    edges: Dataset,
    *,
    max_rounds: int = 256,
    mode: str = "auto",
) -> Dataset:
    """(vertex, coreness) for every vertex of the self-loop-free graph:
    the largest k such that the vertex survives k-core peeling.

    Computed by the h-index fixpoint (Lu et al. 2016, "The H-index of a
    network node and its relation to degree and coreness"): h_0 = degree,
    h_{t+1}(v) = H-index of {h_t(u) : u in N(v)}; the fixpoint is exactly
    the core number, and every round only needs each vertex's neighbor
    values — a per-round neighborhood aggregate, never a global peel
    ordering. `mode`: 'auto' picks 'broadcast' (ray.put CSR once,
    worker-slice rounds) below _CORENESS_BROADCAST_EDGES symmetric rows,
    else 'shuffle' (per-round h attach + one bucketed per-dst h-index
    exchange — volume ∝ m per round, the same posture as an LPA round).
    Oracle: unrolled peel per k in DuckDB (max k survived)."""
    simple = drop_self_loops(edges).materialize()
    if mode == "auto":
        mode = (
            "broadcast" if simple.count() <= _CORENESS_BROADCAST_EDGES else "shuffle"
        )
    if mode == "broadcast":
        return _coreness_broadcast(simple, max_rounds)
    if mode == "shuffle":
        return _coreness_shuffle(simple, max_rounds)
    raise ValueError(f"unknown coreness mode: {mode!r}")


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
