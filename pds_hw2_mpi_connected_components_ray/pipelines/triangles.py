"""Triangle counting via degree-ordered orientation + wedge closure.

Algorithm (the standard distributed formulation; bounds wedge explosion
on skewed graphs to O(m^1.5) total work):

 1. drop self-loops from the canonical symmetric edge table
 2. orient each undirected edge from the lexicographically smaller
    (degree, vertex) endpoint to the larger -- every undirected edge
    appears exactly once, and hubs get only IN-edges, so a 5000-leaf
    star generates zero wedges instead of 12.5M
 3. wedges: self-join oriented edges on the wedge center a:
    (a->b, a->c) with (deg_b, b) < (deg_c, c)
 4. close: join wedges against oriented edges on (b, c); matches are
    triangles, each counted exactly once

Output: total count (int) and optionally per-vertex counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..context import default_parallelism
from ..stages.graph import degrees, drop_self_loops
from ..stages.joins import broadcast_attach, hash_join, put_lookup


BROADCAST_DEGREE_THRESHOLD = 5_000_000  # vertices; ~80 MB of (id, deg) pairs
_BROADCAST_SUPPORT_PAIRS = 5_000_000  # (packed pair, support) rows; ~80 MB


def _orient(edges: Dataset, deg_ref) -> Dataset:
    """Attach degrees (broadcast lookup) and keep only low->high edges,
    carrying the destination's degree for the wedge tie-break."""

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        lk = _ray.get(deg_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        _, ds_ = lk.get(src)
        _, dd_ = lk.get(dst)
        keep = (ds_ < dd_) | ((ds_ == dd_) & (src < dst))
        return pa.table(
            {
                "a": src[keep],
                "b": dst[keep],
                "db": dd_[keep],
            }
        )

    return edges.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _orient_join(edges: Dataset, degs: Dataset, npart: int) -> Dataset:
    """Degree attach via two hash joins -- the scale path when the
    vertex set exceeds the broadcast threshold (an O(n) (id, degree)
    lookup per worker dies at web scale; a hash join ships each edge
    once per attach instead)."""
    d_src = degs.map_batches(
        lambda t: t.rename_columns(["src", "_ds"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    d_dst = degs.map_batches(
        lambda t: t.rename_columns(["dst", "_dd"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j = hash_join(
        hash_join(edges, d_src, on=("src",), num_partitions=npart),
        d_dst,
        on=("dst",),
        num_partitions=npart,
    )

    def orient(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        ds_ = t["_ds"].to_numpy(zero_copy_only=False)
        dd_ = t["_dd"].to_numpy(zero_copy_only=False)
        keep = (ds_ < dd_) | ((ds_ == dd_) & (src < dst))
        return pa.table({"a": src[keep], "b": dst[keep], "db": dd_[keep]})

    return j.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True)


def _oriented_edges(
    simple: Dataset, npart: int, broadcast_threshold: int
) -> Dataset:
    """Degree-oriented edge table (a, b, db): broadcast attach for small
    vertex sets, two-hash-join attach beyond the threshold."""
    degs = degrees(simple).materialize()
    if degs.count() <= broadcast_threshold:
        deg_tab = pa.concat_tables(
            list(degs.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        deg_ref = put_lookup(deg_tab, "vertex", "degree")
        return _orient(simple, deg_ref).materialize()
    return _orient_join(simple, degs, npart).materialize()


def triangle_count(
    edges: Dataset,
    *,
    num_partitions: int | None = None,
    broadcast_threshold: int = BROADCAST_DEGREE_THRESHOLD,
) -> int:
    """Total triangles in the canonical symmetric deduped edge table.

    Degree attach is broadcast below `broadcast_threshold` vertices
    (16 B/vertex via ray.put) and a two-hash-join beyond it (the scale
    path; semantics identical, tested through both)."""
    simple = drop_self_loops(edges).materialize()
    # clamp partitions to the data size: tiny partitions only add task
    # overhead and risk Ray's empty-partition join crash
    npart = num_partitions or default_parallelism()
    npart = max(2, min(npart, simple.count() // 100_000 + 2))
    oriented = _oriented_edges(simple, npart, broadcast_threshold)

    right = oriented.map_batches(
        lambda t: pa.table({"a2": t["a"], "c": t["b"], "dc": t["db"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    wedges = hash_join(oriented, right, on=("a",), right_on=("a2",), num_partitions=npart)
    wedges = wedges.map_batches(
        lambda t: t.filter(
            pc.or_(
                pc.less(t["db"], t["dc"]),
                pc.and_(pc.equal(t["db"], t["dc"]), pc.less(t["b"], t["c"])),
            )
        ).select(["b", "c"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    if wedges.count() == 0:
        return 0
    closing = oriented.map_batches(
        lambda t: pa.table({"b2": t["a"], "c2": t["b"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tri = hash_join(
        wedges, closing, on=("b", "c"), right_on=("b2", "c2"), num_partitions=npart
    )
    return tri.count()


def triangles_per_vertex(
    edges: Dataset,
    *,
    num_partitions: int | None = None,
    broadcast_threshold: int = BROADCAST_DEGREE_THRESHOLD,
) -> Dataset:
    """(vertex, triangles) -- number of triangles incident to each vertex.

    Same wedge-closure plan, but each closed triangle (a,b,c) credits all
    three corners before a final groupby-sum.
    """

    simple = drop_self_loops(edges).materialize()
    npart = num_partitions or default_parallelism()
    npart = max(2, min(npart, simple.count() // 100_000 + 2))
    oriented = _oriented_edges(simple, npart, broadcast_threshold)
    right = oriented.map_batches(
        lambda t: pa.table({"a2": t["a"], "c": t["b"], "dc": t["db"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    wedges = hash_join(oriented, right, on=("a",), right_on=("a2",), num_partitions=npart)
    wedges = wedges.map_batches(
        lambda t: t.filter(
            pc.or_(
                pc.less(t["db"], t["dc"]),
                pc.and_(pc.equal(t["db"], t["dc"]), pc.less(t["b"], t["c"])),
            )
        ).select(["a", "b", "c"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    if wedges.count() == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"vertex": pa.array([], pa.int64()), "triangles": pa.array([], pa.int64())})
        )
    closing = oriented.map_batches(
        lambda t: pa.table({"b2": t["a"], "c2": t["b"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tri = hash_join(
        wedges, closing, on=("b", "c"), right_on=("b2", "c2"), num_partitions=npart
    )

    def corners(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        v = np.concatenate([a, b, c])
        u, cnt = np.unique(v, return_counts=True)
        return pa.table({"vertex": u, "t": cnt.astype(np.int64)})

    from ..stages.skew import bucketed_group_sum

    partials = tri.map_batches(corners, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_group_sum(partials, "vertex", "t").map_batches(
        lambda t: t.rename_columns(["vertex", "triangles"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def edge_support(
    edges: Dataset,
    *,
    num_partitions: int | None = None,
    broadcast_threshold: int = BROADCAST_DEGREE_THRESHOLD,
) -> Dataset:
    """(a, b, support) for every undirected simple edge a < b: the
    number of triangles the edge participates in (= common neighbors
    of its endpoints) — the per-EDGE analogue of triangles_per_vertex
    and the quantity k-truss decomposition peels on.

    Same degree-oriented wedge-closure plan (O(m^1.5) bound); each
    closed triangle credits its three edges as unordered pairs, a
    pair-keyed groupby sums credits, and the unordered edge list gets
    support attached (0 for triangle-free edges).

    Pair keys PACK into one int64 ((lo << 31) | hi) whenever the max
    vertex id fits 31 bits — 1-D int uniques + a single-int groupby
    measured ~3× cheaper than 2-D lexsort uniques + a two-column
    aggregate; the 63-bit minted-id space falls back to the wide path.
    The support table attaches by broadcast below a threshold (it is
    edges-with-triangles-sized) and by left hash join beyond it."""
    from ray.data.aggregate import Sum

    simple = drop_self_loops(edges).materialize()
    # clamp partitions HARD to the data size: beyond the usual
    # task-overhead argument, a hash partition that receives right-side
    # rows but no left-side rows crashes pyarrow's join ("no match for
    # FieldRef" on the empty schema-less left block), which tiny
    # truss-peel rounds actually hit
    npart = num_partitions or default_parallelism()
    npart = max(1, min(npart, simple.count() // 100_000 + 2))

    und = simple.map_batches(
        lambda t: t.filter(pc.less(t["src"], t["dst"])).rename_columns(["a", "b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    oriented = _oriented_edges(simple, npart, broadcast_threshold)
    right = oriented.map_batches(
        lambda t: pa.table({"a2": t["a"], "c": t["b"], "dc": t["db"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    wedges = hash_join(oriented, right, on=("a",), right_on=("a2",), num_partitions=npart)
    wedges = wedges.map_batches(
        lambda t: t.filter(
            pc.or_(
                pc.less(t["db"], t["dc"]),
                pc.and_(pc.equal(t["db"], t["dc"]), pc.less(t["b"], t["c"])),
            )
        ).select(["a", "b", "c"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def zero(t: pa.Table) -> pa.Table:
        return t.append_column(
            "support", pa.array(np.zeros(len(t), dtype=np.int64), pa.int64())
        )

    wcnt = wedges.count()
    if wcnt == 0:
        return und.map_batches(zero, batch_format="pyarrow", zero_copy_batch=True)

    closing = oriented.map_batches(
        lambda t: pa.table({"b2": t["a"], "c2": t["b"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tri = hash_join(
        wedges,
        closing,
        on=("b", "c"),
        right_on=("b2", "c2"),
        num_partitions=max(1, min(npart, wcnt // 100_000 + 1)),
    )

    vmax = simple.max("dst")
    if vmax is not None and int(vmax) < 2**31:
        shift = np.int64(31)

        def edge_credits(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            c = t["c"].to_numpy(zero_copy_only=False)
            x = np.concatenate([np.minimum(a, b), np.minimum(b, c), np.minimum(a, c)])
            y = np.concatenate([np.maximum(a, b), np.maximum(b, c), np.maximum(a, c)])
            u, cnt = np.unique((x << shift) | y, return_counts=True)
            return pa.table({"k": u, "s": cnt.astype(np.int64)})

        # bucket-per-group sum: Ray's keyed aggregate on the raw packed
        # key pays the full sort-aggregate (measured 10.5s for 750k
        # credit rows); hashing into ~parallelism int buckets and
        # reducing each bucket with one sort+reduceat pass is ~10x less
        nb = max(8, default_parallelism())

        def add_bucket(t: pa.Table) -> pa.Table:
            k = t["k"].to_numpy(zero_copy_only=False)
            return t.append_column(
                "_kb", pa.array((k * np.int64(0x9E3779B9)) % nb, pa.int64())
            )

        def bucket_sum(t: pa.Table) -> pa.Table:
            k = t["k"].to_numpy(zero_copy_only=False)
            s = t["s"].to_numpy(zero_copy_only=False)
            order = np.argsort(k, kind="stable")
            ks, ss = k[order], s[order]
            bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
            return pa.table(
                {"k": ks[bounds], "s": np.add.reduceat(ss, bounds).astype(np.int64)}
            )

        sup = (
            tri.map_batches(edge_credits, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_kb")
            .map_groups(bucket_sum, batch_format="pyarrow")
            .materialize()
        )

        def und_key(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            return pa.table({"a": a, "b": b, "k": (a << shift) | b})

        und_k = und.map_batches(und_key, batch_format="pyarrow", zero_copy_batch=True)
        if sup.count() <= _BROADCAST_SUPPORT_PAIRS:
            sup_tab = pa.concat_tables(
                list(sup.iter_batches(batch_format="pyarrow", batch_size=None))
            )
            ref = put_lookup(sup_tab, "k", "s")
            return broadcast_attach(
                und_k, ref, "k", "support", keep_missing=True, missing_value=0
            ).select_columns(["a", "b", "support"])
        joined = hash_join(
            und_k, sup, on=("k",), join_type="left_outer",
            num_partitions=max(1, min(npart, simple.count() // 200_000 + 1)),
        )

        def fin_k(t: pa.Table) -> pa.Table:
            s = t["s"].to_numpy(zero_copy_only=False)
            s = np.where(np.isnan(s.astype(np.float64)), 0, s).astype(np.int64)
            return pa.table({"a": t["a"], "b": t["b"], "support": s})

        return joined.map_batches(fin_k, batch_format="pyarrow", zero_copy_batch=True)

    # wide fallback: 63-bit id spaces cannot pack two ids into int64
    def edge_credits_wide(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        x = np.concatenate([np.minimum(a, b), np.minimum(b, c), np.minimum(a, c)])
        y = np.concatenate([np.maximum(a, b), np.maximum(b, c), np.maximum(a, c)])
        key = np.stack([x, y], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table({"x": u[:, 0], "y": u[:, 1], "s": cnt.astype(np.int64)})

    sup = (
        tri.map_batches(edge_credits_wide, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["x", "y"])
        .aggregate(Sum("s", alias_name="s"))
    )
    joined = hash_join(
        und, sup, on=("a", "b"), right_on=("x", "y"), join_type="left_outer",
        num_partitions=max(1, min(npart, simple.count() // 200_000 + 1)),
    )

    def finalize(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        s = np.where(np.isnan(s.astype(np.float64)), 0, s).astype(np.int64)
        return pa.table({"a": t["a"], "b": t["b"], "support": s})

    return joined.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def truss_peel(
    edges: Dataset,
    *,
    k: int = 5,
    rounds: int = 3,
    num_partitions: int | None = None,
    broadcast_threshold: int = BROADCAST_DEGREE_THRESHOLD,
) -> Dataset:
    """(a, b): undirected edges surviving `rounds` synchronous k-truss
    peel rounds — each round recomputes triangle support over the
    surviving subgraph and drops every edge with support < k-2
    (support-0 edges drop immediately, so trees/bridges vanish in
    round 1). Bounded-round contract (the labelprop4/iterations
    convention) keeps the result SQL-unrollable; run more rounds for a
    fixpoint.

    Scale note: this is the simple synchronous formulation — each
    round pays a full O(m'^1.5) support recomputation over the
    shrinking edge set. The incremental formulation (decrement support
    of the two neighbors of every deleted edge) needs a mutable
    edge-support index; at 100 TB that is the pinned-shard-pool shape,
    left for when a truss workload actually needs it."""
    import ray.data as rd

    cur = edges
    kept: Dataset | None = None
    for _ in range(rounds):
        sup = edge_support(
            cur,
            num_partitions=num_partitions,
            broadcast_threshold=broadcast_threshold,
        )
        kept = sup.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t["support"], k - 2)
            ).select(["a", "b"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        if kept.count() == 0:
            return rd.from_arrow(
                pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
            )
        cur = kept.map_batches(
            lambda t: pa.table(
                {
                    "src": pa.concat_arrays(
                        [t["a"].combine_chunks(), t["b"].combine_chunks()]
                    ),
                    "dst": pa.concat_arrays(
                        [t["b"].combine_chunks(), t["a"].combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return kept
