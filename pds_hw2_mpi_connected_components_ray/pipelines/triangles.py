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

from ..context import default_parallelism, exchange_partitions
from ..stages.graph import degrees, drop_self_loops
from ..stages.joins import broadcast_attach, hash_join, put_lookup


BROADCAST_DEGREE_THRESHOLD = 5_000_000  # vertices; ~80 MB of (id, deg) pairs
_BROADCAST_SUPPORT_PAIRS = 5_000_000  # (packed pair, support) rows; ~80 MB
_LOCAL_CLOSURE_EDGES = 5_000_000  # symmetric rows; CSR + key array ~120 MB


def _closure_state_ref(simple: Dataset):
    """Broadcast state for the shuffle-free triangle path: the whole
    oriented adjacency as one rank-space CSR + a sorted packed edge-key
    array, ray.put ONCE. Vertices are renumbered to their
    (degree, id)-lexicographic rank so orientation is a plain rank
    compare, out-neighbor lists are rank-sorted for free, and two ranks
    always pack into one int64 regardless of how sparse the original id
    space is. Returns (ref, n_vertices)."""
    import ray as _ray

    tab = pa.concat_tables(
        list(simple.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    src = tab["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    dst = tab["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    # symmetric table: every vertex appears as src, degree = src count
    vids, deg = np.unique(src, return_counts=True)
    n = len(vids)
    order = np.lexsort((vids, deg))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    rs = rank[np.searchsorted(vids, src)]
    rd = rank[np.searchsorted(vids, dst)]
    keep = rs < rd  # orient low rank -> high rank; each undirected edge once
    rs, rd = rs[keep], rd[keep]
    o = np.lexsort((rd, rs))
    rs, rd = rs[o], rd[o]
    off = np.searchsorted(rs, np.arange(n + 1, dtype=np.int64))
    keys = (rs << np.int64(32)) | rd  # ascending by construction
    vid_of = vids[order]
    return _ray.put((vids, rank, off, rd, keys, vid_of)), n


def _closure_partials(simple: Dataset, ref, mode: str) -> Dataset:
    """One shuffle-free map_batches over vertices that generates every
    degree-oriented wedge LOCALLY from the broadcast CSR (triangular
    pair-index decode, fully vectorized) and closes it with one
    searchsorted against the sorted packed edge keys — the literal
    'per-partition triangle counting via sorted-adjacency intersection'
    of the north star. Emits per-batch partials:
      mode='count'        -> {'t': [#closed]}
      mode='corners'      -> {'vertex', 't'} (unique-combined credits)
      mode='edge_credits' -> {'k', 's'} with k = (lo_vid << 31) | hi_vid
                             (callers guarantee vids < 2^31)
      mode='triangles'    -> {'ta', 'tb', 'tc'} one row per closed
                             triangle (original vids, unordered corners)
    """
    import ray as _ray

    from ..stages.graph import vertices

    def empty() -> pa.Table:
        if mode == "count":
            return pa.table({"t": pa.array([], pa.int64())})
        if mode == "corners":
            return pa.table(
                {"vertex": pa.array([], pa.int64()), "t": pa.array([], pa.int64())}
            )
        if mode == "triangles":
            e = pa.array([], pa.int64())
            return pa.table({"ta": e, "tb": e, "tc": e})
        return pa.table({"k": pa.array([], pa.int64()), "s": pa.array([], pa.int64())})

    def fn(t: pa.Table) -> pa.Table:
        vids, rank, off, nbr, keys, vid_of = _ray.get(ref)
        v = t["vertex"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        if len(v) == 0 or len(keys) == 0:
            return empty()
        rc = rank[np.searchsorted(vids, v)]
        d = off[rc + 1] - off[rc]
        sel = d >= 2
        rc, d = rc[sel], d[sel]
        npair = d * (d - 1) // 2
        total = int(npair.sum())
        if total == 0:
            return empty()
        base = np.cumsum(npair) - npair
        p = np.arange(total, dtype=np.int64) - np.repeat(base, npair)
        dr = np.repeat(d, npair)
        # triangular decode of pair index p -> (j, k), j < k, within a
        # d-slot segment; float sqrt then two exact integer fix-ups
        tw = (2 * dr - 1).astype(np.float64)
        j = np.floor(
            (tw - np.sqrt(tw * tw - 8.0 * p.astype(np.float64))) / 2.0
        ).astype(np.int64)
        j = np.clip(j, 0, dr - 2)

        def cum(jj: np.ndarray) -> np.ndarray:
            return jj * dr - jj * (jj + 1) // 2

        for _ in range(2):
            j = np.where((j + 1 <= dr - 2) & (cum(j + 1) <= p), j + 1, j)
            j = np.where((j > 0) & (cum(j) > p), j - 1, j)
        k = p - cum(j) + j + 1
        st = np.repeat(off[rc], npair)
        x = nbr[st + j]
        y = nbr[st + k]
        key = (x << np.int64(32)) | y
        pos = np.minimum(np.searchsorted(keys, key), len(keys) - 1)
        closed = keys[pos] == key
        if mode == "count":
            return pa.table({"t": pa.array([int(closed.sum())], pa.int64())})
        av = vid_of[np.repeat(rc, npair)[closed]]
        xv = vid_of[x[closed]]
        yv = vid_of[y[closed]]
        if mode == "triangles":
            return pa.table({"ta": av, "tb": xv, "tc": yv})
        if mode == "corners":
            u, cnt = np.unique(np.concatenate([av, xv, yv]), return_counts=True)
            return pa.table({"vertex": u, "t": cnt.astype(np.int64)})
        shift = np.int64(31)
        lo = np.concatenate(
            [np.minimum(av, xv), np.minimum(av, yv), np.minimum(xv, yv)]
        )
        hi = np.concatenate(
            [np.maximum(av, xv), np.maximum(av, yv), np.maximum(xv, yv)]
        )
        u, cnt = np.unique((lo << shift) | hi, return_counts=True)
        return pa.table({"k": u, "s": cnt.astype(np.int64)})

    return vertices(simple).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def _use_local_closure(simple: Dataset, ecount: int) -> bool:
    if ecount == 0 or ecount > _LOCAL_CLOSURE_EDGES:
        return False
    vmax = simple.max("dst")
    return vmax is not None and int(vmax) < 2**31


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
    simple: Dataset, npart: int, broadcast_threshold: int,
    degs: Dataset | None = None,
) -> Dataset:
    """Degree-oriented edge table (a, b, db): broadcast attach for small
    vertex sets, two-hash-join attach beyond the threshold. Pass a
    precomputed materialized degree table via `degs` to share the scan
    with callers that already hold one (graph_summary)."""
    if degs is None:
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
    simple: Dataset | None = None,
    degs: Dataset | None = None,
) -> int:
    """Total triangles in the canonical symmetric deduped edge table.

    Degree attach is broadcast below `broadcast_threshold` vertices
    (16 B/vertex via ray.put) and a two-hash-join beyond it (the scale
    path; semantics identical, tested through both).

    Callers that already hold the materialized self-loop-free table
    and/or its materialized degree table (graph_summary) pass them via
    `simple`/`degs` to share the scans instead of recomputing."""
    if simple is None:
        simple = drop_self_loops(edges).materialize()
    ecount = simple.count()
    if _use_local_closure(simple, ecount):
        ref, _n = _closure_state_ref(simple)
        tot = _closure_partials(simple, ref, "count").sum("t")
        return int(tot or 0)
    # clamp partitions to the data size: tiny partitions only add task
    # overhead and risk Ray's empty-partition join crash
    npart = num_partitions or default_parallelism()
    npart = max(2, min(npart, ecount // 100_000 + 2))
    oriented = _oriented_edges(simple, npart, broadcast_threshold, degs=degs)

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

    from ..stages.skew import bucketed_group_sum

    simple = drop_self_loops(edges).materialize()
    ecount = simple.count()
    if _use_local_closure(simple, ecount):
        ref, _n = _closure_state_ref(simple)
        partials = _closure_partials(simple, ref, "corners")
        return bucketed_group_sum(partials, "vertex", "t").map_batches(
            lambda t: t.rename_columns(["vertex", "triangles"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    npart = num_partitions or default_parallelism()
    npart = max(2, min(npart, ecount // 100_000 + 2))
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


def _attach_support_packed(
    und: Dataset, sup: Dataset, ecount: int, npart: int
) -> Dataset:
    """(a, b) edges + (packed-key, support) sums -> (a, b, support),
    zero-filled: broadcast attach while the support table is small,
    left hash join beyond the threshold."""
    shift = np.int64(31)

    def und_key(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"a": a, "b": b, "k": (a << shift) | b})

    und_k = und.map_batches(und_key, batch_format="pyarrow", zero_copy_batch=True)
    if sup.count() <= _BROADCAST_SUPPORT_PAIRS:
        batches = list(sup.iter_batches(batch_format="pyarrow", batch_size=None))
        if not batches:  # triangle-free graph: every edge has support 0
            batches = [
                pa.table(
                    {"k": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
                )
            ]
        sup_tab = pa.concat_tables(batches)
        ref = put_lookup(sup_tab, "k", "s")
        return broadcast_attach(
            und_k, ref, "k", "support", keep_missing=True, missing_value=0
        ).select_columns(["a", "b", "support"])
    joined = hash_join(
        und_k, sup, on=("k",), join_type="left_outer",
        num_partitions=max(1, min(npart, ecount // 200_000 + 1)),
    )

    def fin_k(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        s = np.where(np.isnan(s.astype(np.float64)), 0, s).astype(np.int64)
        return pa.table({"a": t["a"], "b": t["b"], "support": s})

    return joined.map_batches(fin_k, batch_format="pyarrow", zero_copy_batch=True)


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

    if _use_local_closure(simple, simple.count()):
        from ..stages.skew import bucketed_group_sum

        ref, _n = _closure_state_ref(simple)
        partials = _closure_partials(simple, ref, "edge_credits")
        sup = bucketed_group_sum(partials, "k", "s").materialize()
        return _attach_support_packed(und, sup, simple.count(), npart)

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
            .groupby("_kb", num_partitions=exchange_partitions())
            .map_groups(bucket_sum, batch_format="pyarrow")
            .materialize()
        )

        return _attach_support_packed(und, sup, simple.count(), npart)

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


def triangle_list(
    edges: Dataset,
    *,
    num_partitions: int | None = None,
    broadcast_threshold: int = BROADCAST_DEGREE_THRESHOLD,
) -> Dataset:
    """(ta, tb, tc): one row per triangle of the undirected simple
    graph, each triangle exactly once (corners unordered). The input to
    the incremental k-truss index (pipelines/truss.py), which maintains
    per-triangle alive bits instead of recomputing closure per round.

    Same degree-oriented wedge-closure plan as edge_support; the local
    shuffle-free closure below the broadcast threshold, the two-join
    distributed plan beyond it."""
    simple = drop_self_loops(edges).materialize()
    ecount = simple.count()
    npart = num_partitions or default_parallelism()
    npart = max(1, min(npart, ecount // 100_000 + 2))

    if _use_local_closure(simple, ecount):
        ref, _n = _closure_state_ref(simple)
        return _closure_partials(simple, ref, "triangles")

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
    closing = oriented.map_batches(
        lambda t: pa.table({"b2": t["a"], "c2": t["b"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    wcnt = wedges.count()
    if wcnt == 0:
        e = pa.array([], pa.int64())
        import ray.data as rd

        return rd.from_arrow(pa.table({"ta": e, "tb": e, "tc": e}))
    tri = hash_join(
        wedges,
        closing,
        on=("b", "c"),
        right_on=("b2", "c2"),
        num_partitions=max(1, min(npart, wcnt // 100_000 + 1)),
    )
    return tri.map_batches(
        lambda t: pa.table({"ta": t["a"], "tb": t["b"], "tc": t["c"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


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


def jaccard_links(
    edges: Dataset,
    *,
    num_partitions: int | None = None,
    broadcast_threshold: int = BROADCAST_DEGREE_THRESHOLD,
) -> Dataset:
    """(a, b, support, jaccard) for every undirected simple edge a < b:
    neighborhood Jaccard |N(a)∩N(b)| / |N(a)∪N(b)| with the union by
    inclusion-exclusion (deg_a + deg_b − support, always ≥ 2 for an
    edge's endpoints) — the edge-strength / intra-community signal that
    complements the non-edge scores in linkpred (adamic_adar scores
    ABSENT pairs; this scores PRESENT edges).

    Plan: the intersection IS edge_support (same wedge-closure /
    local-closure adaptive machinery), and the two degree attaches are
    broadcast lookups below the threshold or two hash joins beyond —
    the avg_neighbor_degree shape. The quotient is rational, so the
    half-up 1e-6 quantization is order-independent vs SQL."""
    import ray as _ray

    simple = drop_self_loops(edges).materialize()
    sup = edge_support(simple, num_partitions=num_partitions)
    degs = degrees(simple).materialize()
    npart = num_partitions or default_parallelism()
    npart = max(1, min(npart, simple.count() // 100_000 + 2))

    if degs.count() <= broadcast_threshold:
        deg_tab = pa.concat_tables(
            list(degs.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        ref = put_lookup(deg_tab, "vertex", "degree")

        def attach_both(t: pa.Table) -> pa.Table:
            lk = _ray.get(ref)
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            _, da = lk.get(a)
            _, db = lk.get(b)
            return t.append_column("_da", pa.array(da, pa.int64())).append_column(
                "_db", pa.array(db, pa.int64())
            )

        attached = sup.map_batches(
            attach_both, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        da = degs.map_batches(
            lambda t: t.rename_columns(["a", "_da"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        db = degs.map_batches(
            lambda t: t.rename_columns(["b", "_db"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        attached = hash_join(
            hash_join(sup, da, on=("a",), num_partitions=npart),
            db,
            on=("b",),
            num_partitions=npart,
        )

    def finalize(t: pa.Table) -> pa.Table:
        s = t["support"].to_numpy(zero_copy_only=False).astype(np.float64)
        da_ = t["_da"].to_numpy(zero_copy_only=False).astype(np.float64)
        db_ = t["_db"].to_numpy(zero_copy_only=False).astype(np.float64)
        j = np.floor(s / (da_ + db_ - s) * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "support": t["support"],
                "jaccard": j,
            }
        )

    return attached.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


_SAMPLE_SCALE = 1 << 60


def sampled_triangle_estimate(
    edges: Dataset, *, p: float = 0.5, seed: int = 7
):
    """One row (sampled_triangles, estimate): estimate the global
    triangle count from a deterministic p-sample of UNORDERED edges
    (each triangle survives with probability p³, so count/p³ is
    unbiased — Tsourakakis et al.'s DOULION). This is the approximate-
    analytics escape hatch for graphs too large to close exactly: the
    sample is an md5-int60 threshold on the unordered pair (both
    directions kept or dropped together, reproducible under any
    partitioning and byte-identical in SQL), and the exact counter
    then runs on the p-fraction subgraph.

    The per-row md5 is the _split_hash precedent (no vectorized md5
    exists; the digest dominates and is embarrassingly parallel)."""
    import hashlib

    import pandas as pd

    thr = int(p * _SAMPLE_SCALE)

    def samp(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        h = np.empty(len(lo), dtype=np.int64)
        for i in range(len(lo)):
            h[i] = int(
                hashlib.md5(f"{seed}:{lo[i]}:{hi[i]}".encode()).hexdigest()[:15],
                16,
            )
        sel = h < thr
        return pa.table({"src": s[sel], "dst": d[sel]})

    sampled = edges.map_batches(
        samp, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n3 = int(triangle_count(sampled)) if sampled.count() else 0
    est = int(np.floor(n3 / (p * p * p) + 0.5))
    return pd.DataFrame(
        {
            "sampled_triangles": np.array([n3], dtype=np.int64),
            "estimate": np.array([est], dtype=np.int64),
        }
    )
