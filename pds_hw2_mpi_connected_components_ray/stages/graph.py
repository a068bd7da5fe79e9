"""Edge-table primitives: symmetrize, dedup, degrees, vertices.

Edge table schema: (src:int64, dst:int64) -- FIXTURES.md section 3. The
canonical undirected closure mirrors the reference converter: store
(a,b) and (b,a) for a != b, keep self-loops once, values implicitly 1
(/root/reference/src/converter/mtx_to_bin.c:199-213, src/matrix.c:8-9).
Duplicate edges are removed here (the reference tolerates them but they
only waste shuffle volume downstream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count


def _sym_batch(batch: pa.Table) -> pa.Table:
    """Emit both directions of every edge; per-batch local dedup as a
    pre-shuffle combiner (global dedup still needs the groupby)."""
    src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    pairs = np.unique(np.stack([s, d], axis=1), axis=0)
    return pa.table({"src": pairs[:, 0], "dst": pairs[:, 1]})


def _sym_batch_raw(batch: pa.Table) -> pa.Table:
    """Both directions, duplicates kept: output size is exactly 2x input
    regardless of batch boundaries (deterministic nnz, matching the
    reference's duplicate-keeping converter,
    /root/reference/src/converter/mtx_to_bin.c:303-317)."""
    src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return pa.table(
        {"src": np.concatenate([src, dst]), "dst": np.concatenate([dst, src])}
    )


def symmetrize(edges: Dataset, dedup_local: bool = True) -> Dataset:
    """Undirected closure (both directions), NOT yet globally deduped."""
    fn = _sym_batch if dedup_local else _sym_batch_raw
    return edges.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def dedup_edges(edges: Dataset, num_buckets: int = 64) -> Dataset:
    """Global exact dedup of (src, dst) pairs: hash-bucket shuffle + a
    vectorized per-bucket unique.

    A sort-based ``groupby((src,dst))`` aggregate costs a full composite
    sort (~8x slower measured); grouping on a small int bucket key and
    running np.unique inside each bucket gives identical results with a
    much cheaper shuffle. Per-batch local dedup in symmetrize acts as
    the combiner. Bucket count bounds per-group memory (edges/bucket).
    """

    def bucketize(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        mix = (src * np.int64(0x9E3779B9) + dst) % num_buckets
        return t.append_column("_b", pa.array(mix.astype(np.int64)))

    def uniq(g):
        arr = np.unique(
            np.stack(
                [g["src"].to_numpy(np.int64), g["dst"].to_numpy(np.int64)], axis=1
            ),
            axis=0,
        )
        # return Arrow so downstream blocks stay pyarrow (pandas blocks
        # would leak into zero-copy consumers like the shard actors)
        return pa.table({"src": arr[:, 0], "dst": arr[:, 1]})

    bucketed = edges.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("_b", num_partitions=num_buckets).map_groups(
        uniq, batch_format="pandas"
    )


def canonical_edges(raw_directed: Dataset) -> Dataset:
    """raw directed hrefs -> canonical undirected, deduped edge table."""
    return dedup_edges(symmetrize(raw_directed))


def degrees(edges: Dataset) -> Dataset:
    """(vertex, degree) from a symmetric edge table: degree = out-degree
    = in-degree = count of rows per src (self-loop counts once)."""
    # per-batch combiner + bucketed exchange: groups = |V| (Ray's keyed
    # sort-aggregate pays ~ms per group -- data-proportional here)
    from .skew import bucketed_group_sum

    def per_batch(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["src"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"vertex": u, "degree": c.astype(np.int64)})

    return bucketed_group_sum(
        edges.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True),
        "vertex",
        "degree",
    )


def vertices(edges: Dataset) -> Dataset:
    """Distinct vertex ids of a symmetric edge table: distinct(src).

    (On a symmetric table every vertex appears as src.)
    """

    def per_batch(t: pa.Table) -> pa.Table:
        u = pc.unique(t["src"])
        return pa.table({"vertex": u})

    from .skew import bucketed_distinct

    local = edges.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_distinct(local, "vertex")


def local_min_labels(
    src: np.ndarray, dst: np.ndarray, budget: int = 12
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized LOCAL hash-min contraction over one edge set (treated
    undirected): returns (vertices, labels) where each label is the min
    vertex id reachable within this edge set (possibly partial under
    the iteration budget -- still a VALID hash-min state, since any
    assigned label is a connected smaller vertex). Used to pre-contract
    shard/block-local components so the distributed solve starts with
    whole local components merged."""
    vs = np.unique(np.concatenate([src, dst]))
    if len(vs) == 0:
        return vs, vs
    a = np.searchsorted(vs, src)
    b = np.searchsorted(vs, dst)
    ea = np.concatenate([a, b])
    eb = np.concatenate([b, a])
    order = np.argsort(ea, kind="stable")
    ea = ea[order]
    eb = eb[order]
    bounds = np.flatnonzero(np.r_[True, ea[1:] != ea[:-1]])
    targets = ea[bounds]
    lab = np.arange(len(vs), dtype=np.int64)
    for _ in range(budget):
        cand = np.minimum.reduceat(lab[eb], bounds)
        new = lab.copy()
        new[targets] = np.minimum(new[targets], cand)
        for _j in range(3):  # bounded pointer-jump passes
            nj = np.minimum(new, new[new])
            if np.array_equal(nj, new):
                break
            new = nj
        if np.array_equal(new, lab):
            break
        lab = new
    return vs, vs[lab]


def init_labels(edges: Dataset) -> Dataset:
    """labels_0: (vertex, label=vertex) -- T5 of the reference kernel
    (/root/reference/src/connected_components.c:94-96)."""
    return vertices(edges).map_batches(
        lambda t: t.append_column("label", t["vertex"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def degree_assortativity(edges: Dataset) -> float:
    """Pearson correlation of (src degree, dst degree) over the
    symmetric edge table -- the standard degree-assortativity
    coefficient. Physical plan: broadcast the degree lookup, emit
    PARTIAL MOMENT SUMS (n, sx, sy, sxx, syy, sxy) per batch (a
    combiner -- six doubles per block cross the wire), reduce with one
    tiny aggregation, driver applies the closed-form correlation.
    Pearson r is scale-invariant, so the population formula matches
    SQL's sample corr() exactly."""
    import ray

    from ..stages.joins import put_lookup

    simple = drop_self_loops(edges).materialize()
    deg_tab = pa.concat_tables(
        list(degrees(simple).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    ref = put_lookup(deg_tab, "vertex", "degree")

    def moments(t: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        _, dx = lk.get(src)
        _, dy = lk.get(dst)
        x = dx.astype(np.float64)
        y = dy.astype(np.float64)
        return pa.table(
            {
                "n": pa.array([float(len(x))]),
                "sx": pa.array([x.sum()]),
                "sy": pa.array([y.sum()]),
                "sxx": pa.array([(x * x).sum()]),
                "syy": pa.array([(y * y).sum()]),
                "sxy": pa.array([(x * y).sum()]),
            }
        )

    parts = simple.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
    tot = parts.sum(["n", "sx", "sy", "sxx", "syy", "sxy"])
    n, sx, sy = tot["sum(n)"], tot["sum(sx)"], tot["sum(sy)"]
    sxx, syy, sxy = tot["sum(sxx)"], tot["sum(syy)"], tot["sum(sxy)"]
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    if vx <= 0 or vy <= 0:
        return 0.0
    return float(cov / np.sqrt(vx * vy))


def binarize(edges: Dataset, weight_col: str = "weight") -> Dataset:
    """Weighted edge list -> binary adjacency: keep rows with weight != 0,
    drop the weight (reference T2: value != 0.0 gate then discard,
    /root/reference/src/converter/mtx_to_bin.c:198, src/matrix.c:8-9)."""

    def fn(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.not_equal(t[weight_col], 0.0))
        return kept.drop_columns([weight_col])

    return edges.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def drop_self_loops(edges: Dataset) -> Dataset:
    return edges.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def reciprocity(directed_edges: Dataset) -> Dataset:
    """Single row (reciprocity): the fraction of non-loop DIRECTED
    edges whose reverse edge also exists — the classic web-graph
    link-symmetry statistic (symmetrizing first would make it 1.0 by
    construction, so this runs on the distinct directed table).

    Plan: one unordered-pair exchange. Each edge emits a packed pair
    key (lo << 31 | hi, ids < 2^31 after the engine's dense renumber;
    wide ids fall back to the (lo, hi) keyed aggregate) with f/b
    marking its direction, pre-combined per batch; the bucketed sum
    resolves per-pair (f, b) in one hash exchange instead of Ray's
    ms-per-group keyed aggregate over ~|E| pairs. Per-pair sums land
    in {0, 1} (input is exactly deduped), so a pair is mutual iff both
    sums are positive. The per-batch tail emits two scalars per block
    (mutual-pair count, edge count) — driver reduces a handful of
    rows, never the edge table. Rounds half-up via floor(x*1e6 + 0.5)
    (the repetition_signals contract: the ratio is rational, so exact
    decimal ties are reachable and np.round half-to-even would diverge
    from the SQL oracle).
    """
    vmax = directed_edges.max("dst")
    smax = directed_edges.max("src")
    wide = (
        vmax is None
        or smax is None
        or max(int(vmax), int(smax)) >= 2**31
    )
    if not wide:
        from .skew import bucketed_group_sum

        shift = np.int64(31)

        def tag_packed(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            keep = s != d
            s, d = s[keep], d[keep]
            k = (np.minimum(s, d) << shift) | np.maximum(s, d)
            fwd = (s < d).astype(np.int64)
            # per-batch pre-combine (each k appears at most twice)
            u, inv = np.unique(k, return_inverse=True)
            return pa.table(
                {
                    "k": u,
                    "f": np.bincount(inv, weights=fwd).astype(np.int64),
                    "b": np.bincount(inv, weights=1 - fwd).astype(np.int64),
                }
            )

        pairs = bucketed_group_sum(
            directed_edges.map_batches(
                tag_packed, batch_format="pyarrow", zero_copy_batch=True
            ),
            "k",
            "f",
            extra="b",
        )
    else:
        from ray.data.aggregate import Sum

        def tag(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            keep = s != d
            s, d = s[keep], d[keep]
            fwd = (s < d).astype(np.int64)
            return pa.table(
                {
                    "lo": np.minimum(s, d),
                    "hi": np.maximum(s, d),
                    "f": fwd,
                    "b": 1 - fwd,
                }
            )

        pairs = (
            directed_edges.map_batches(
                tag, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby(["lo", "hi"])
            .aggregate(Sum("f", alias_name="f"), Sum("b", alias_name="b"))
        )

    def partial(t: pa.Table) -> pa.Table:
        f = t["f"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        both = int(((f > 0) & (b > 0)).sum())
        return pa.table(
            {
                "mutual": pa.array([both], pa.int64()),
                "total": pa.array([int(f.sum() + b.sum())], pa.int64()),
            }
        )

    parts = pairs.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # one row per block — scalar-sized by construction
    mutual = int(parts["mutual"].sum())
    total = int(parts["total"].sum())
    r = 2.0 * mutual / total if total else 0.0
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"reciprocity": pa.array([np.floor(r * 1e6 + 0.5) / 1e6])})
    )


# Driver-local fast path for two_hop_counts (same rationale as the
# link-prediction gate): the output is DISTINCT-pair based, so the
# local pass dedupes the edge table first and cross-products unique
# neighbor sets per middle vertex. Bounds keep the driver arrays small;
# above them the distributed join/bucket plan runs unchanged.
_TWO_HOP_LOCAL_EDGE_ROWS = 4_000_000
_TWO_HOP_LOCAL_PAIR_ROWS = 64_000_000


def collect_edge_table(simple: Dataset) -> pa.Table:
    """Pull a (small, gate-checked) edge Dataset to one driver table."""
    return pa.concat_tables(
        list(simple.iter_batches(batch_format="pyarrow", batch_size=None))
    )


def run_pairs(values: np.ndarray, bounds: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-run position pairs (i < j) over a run-partitioned
    array: returns (first_idx, second_idx) into `values`. Vectorized
    (repeat + offset arithmetic), no Python loop. Shared by the
    link-prediction and two-hop driver-local fast paths."""
    n = len(values)
    if n == 0:
        e = np.array([], dtype=np.int64)
        return e, e
    runlens = np.diff(np.r_[bounds, n])
    within = np.arange(n) - np.repeat(bounds, runlens)
    counts = np.repeat(runlens, runlens) - 1 - within  # pairs led by i
    firsts = np.repeat(np.arange(n), counts)
    starts = np.r_[0, np.cumsum(counts)[:-1]]
    seconds = np.arange(counts.sum()) - np.repeat(starts, counts) + firsts + 1
    return firsts, seconds


def _two_hop_counts_local(simple: Dataset) -> "pa.Table | None":
    t = collect_edge_table(simple)
    if t.num_rows == 0:
        return pa.table(
            {
                "vertex": pa.array([], pa.int64()),
                "n_two_hop": pa.array([], pa.int64()),
            }
        )
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    if src.min() < 0 or dst.min() < 0 or max(src.max(), dst.max()) >= 2**31:
        return None
    shift = np.int64(31)
    mask = np.int64((1 << 31) - 1)
    ue = np.unique((src << shift) | dst)  # distinct directed edges, sorted
    s = (ue >> shift).astype(np.int64)
    d = (ue & mask).astype(np.int64)
    # the per-middle cross product below equals v->m->u reachability
    # ONLY for a symmetric table (in-neighbors == out-neighbors);
    # asymmetric input falls back to the distributed join plan, which
    # handles it
    if not np.array_equal(ue, np.unique((d << shift) | s)):
        return None
    bounds = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    runlens = np.diff(np.r_[bounds, len(s)])
    n_pairs = (runlens.astype(np.int64) * (runlens - 1)).sum()
    if n_pairs > _TWO_HOP_LOCAL_PAIR_ROWS:
        return None
    # unordered position pairs i < j within each middle's (unique,
    # sorted) neighbor run; values differ, so each yields BOTH ordered
    # 2-hop pairs
    fi, se = run_pairs(d, bounds)
    a, b = d[fi], d[se]
    keys = np.concatenate([(a << shift) | b, (b << shift) | a, ue])
    keys = np.unique(keys)
    v = (keys >> shift).astype(np.int64)
    vb = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
    return pa.table(
        {
            "vertex": v[vb],
            "n_two_hop": np.diff(np.r_[vb, len(v)]).astype(np.int64),
        }
    )


def two_hop_counts(edges: Dataset, num_partitions: int | None = None) -> Dataset:
    """(vertex, n_two_hop): number of DISTINCT vertices within two hops
    of v (direct neighbors ∪ neighbors-of-neighbors, self excluded) —
    the friend-of-friend reach metric behind audience-size estimation
    and sampling-free local clustering.

    Plan: one edge self-join on the shared middle vertex gives 2-hop
    pairs; the union with direct edges dedups via packed-int64-pair
    bucketing (per-bucket np.unique — every copy of a pair hashes to
    the same bucket, so per-bucket distinct is globally exact) and a
    vertex-keyed groupby sums per-bucket partial counts. O(Σ deg²)
    intermediate like every exact 2-hop formulation; ids wider than
    31 bits fall back to a two-column distinct groupby."""
    from ray.data.aggregate import Count, Sum

    from ..context import default_parallelism, exchange_partitions
    from .joins import hash_join

    simple = drop_self_loops(edges).materialize()
    npart = num_partitions or default_parallelism()
    n_rows = simple.count()
    npart = max(1, min(npart, n_rows // 100_000 + 2))

    if n_rows <= _TWO_HOP_LOCAL_EDGE_ROWS:
        local = _two_hop_counts_local(simple)
        if local is not None:
            import ray.data as _rd

            return _rd.from_arrow(local)

    mid = simple.map_batches(
        lambda t: t.rename_columns(["mid", "u"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    two = hash_join(
        simple, mid, on=("dst",), right_on=("mid",), num_partitions=npart
    ).map_batches(
        lambda t: pa.table({"v": t["src"], "u": t["u"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    one = simple.map_batches(
        lambda t: pa.table({"v": t["src"], "u": t["dst"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = two.union(one)

    vmax = simple.max("dst")
    if vmax is not None and int(vmax) < 2**31:
        shift = np.int64(31)
        nb = max(8, default_parallelism())

        def pack(t: pa.Table) -> pa.Table:
            v = t["v"].to_numpy(zero_copy_only=False)
            u = t["u"].to_numpy(zero_copy_only=False)
            keep = v != u
            k = np.unique((v[keep] << shift) | u[keep])  # per-batch pre-distinct
            return pa.table({"k": k, "_kb": (k * np.int64(0x9E3779B9)) % nb})

        def bucket_counts(t: pa.Table) -> pa.Table:
            k = np.unique(t["k"].to_numpy(zero_copy_only=False))
            v = k >> shift
            b = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
            return pa.table(
                {
                    "vertex": v[b],
                    "c": np.diff(np.r_[b, len(v)]).astype(np.int64),
                }
            )

        from .skew import bucketed_group_sum

        per_bucket = (
            pairs.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_kb", num_partitions=exchange_partitions())
            .map_groups(bucket_counts, batch_format="pyarrow")
        )
        # per-bucket partials are <= |V| x nb rows; a second bucketed
        # exchange (hashed by vertex) sums them without paying Ray's
        # ms-per-group keyed reduce at |V| groups
        return bucketed_group_sum(per_bucket, "vertex", "c").map_batches(
            lambda t: t.rename_columns(["vertex", "n_two_hop"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    # wide fallback (vertex ids >= 2**31, unpackable): bucket by hash(v)
    # so each vertex's pairs colocate; in-bucket lexsort gives distinct
    # (v,u) and the per-vertex count in one pass — no keyed groupby at
    # pair cardinality
    from ..context import default_parallelism as _dp

    nbw = max(8, _dp())

    def tag_bucket(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        u = t["u"].to_numpy(zero_copy_only=False)
        keep = v != u
        return pa.table(
            {
                "v": v[keep],
                "u": u[keep],
                "_kb": (v[keep] * np.int64(0x9E3779B9)) % nbw,
            }
        )

    def bucket_pair_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vertex": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        v = t["v"].to_numpy(zero_copy_only=False)
        u = t["u"].to_numpy(zero_copy_only=False)
        order = np.lexsort((u, v))
        vs, us = v[order], u[order]
        new = np.r_[True, (vs[1:] != vs[:-1]) | (us[1:] != us[:-1])]
        vd = vs[new]
        b = np.flatnonzero(np.r_[True, vd[1:] != vd[:-1]])
        return pa.table(
            {"vertex": vd[b], "c": np.diff(np.r_[b, vd.size]).astype(np.int64)}
        )

    per_bucket = (
        pairs.map_batches(tag_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(bucket_pair_counts, batch_format="pyarrow")
    )
    return per_bucket.map_batches(
        lambda t: t.rename_columns(["vertex", "n_two_hop"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def avg_neighbor_degree(
    edges: Dataset,
    *,
    broadcast_threshold: int = 5_000_000,
    num_partitions: int | None = None,
) -> Dataset:
    """(vertex, avg_ndeg): mean degree of v's neighbors over the
    symmetric simple table — the per-vertex assortativity signal (hubs
    linking to hubs vs leaves). Integer degree sums per src partial-
    aggregate inside each batch; one vertex-keyed groupby; the ratio
    rounds half-up (rational, the reciprocity tie contract). Degree
    attach is broadcast below the threshold, two-hash-join beyond
    (the triangles adaptive shape)."""
    from ray.data.aggregate import Sum

    from ..context import default_parallelism
    from .joins import hash_join, put_lookup

    simple = drop_self_loops(edges).materialize()
    degs = degrees(simple).materialize()
    npart = num_partitions or default_parallelism()
    npart = max(1, min(npart, simple.count() // 100_000 + 2))

    if degs.count() <= broadcast_threshold:
        import ray as _ray

        deg_tab = pa.concat_tables(
            list(degs.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        ref = put_lookup(deg_tab, "vertex", "degree")

        def attach(t: pa.Table) -> pa.Table:
            lk = _ray.get(ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            _, dd = lk.get(dst)
            return pa.table({"src": src, "_dd": dd})

        attached = simple.map_batches(
            attach, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        d_dst = degs.map_batches(
            lambda t: t.rename_columns(["dst", "_dd"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        attached = hash_join(simple, d_dst, on=("dst",), num_partitions=npart)

    def partial(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dd = t["_dd"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(src, kind="stable")
        s, d = src[order], dd[order]
        b = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        return pa.table(
            {
                "vertex": s[b],
                "sd": np.add.reduceat(d, b).astype(np.int64),
                "c": np.diff(np.r_[b, len(s)]).astype(np.int64),
            }
        )

    from .skew import bucketed_group_sum

    agg = bucketed_group_sum(
        attached.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "vertex",
        "sd",
        extra="c",
    )

    def finalize(t: pa.Table) -> pa.Table:
        sd = t["sd"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "vertex": t["vertex"],
                "avg_ndeg": np.floor(sd / c * 1e6 + 0.5) / 1e6,
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


DEFAULT_RICH_CLUB_KS = (1, 2, 4, 8, 16)


def rich_club(
    edges: Dataset,
    ks: tuple[int, ...] = DEFAULT_RICH_CLUB_KS,
    *,
    broadcast_threshold: int = 5_000_000,
    num_partitions: int | None = None,
) -> "pa.Table":
    """(k, n_nodes, n_edges, phi) per degree threshold k: the rich-club
    coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) over the subgraph induced
    by vertices of degree > k — do the hubs of the web graph link to
    each other more than chance (the classic topology diagnostic).

    Everything reduces to |ks| scalars: per-batch partial counts of
    qualifying vertices and of edges whose BOTH endpoint degrees clear
    each threshold (degree attach broadcast below the threshold, two
    hash joins beyond — the avg_neighbor_degree shape), then two tiny
    keyed sums. Only the ≤|ks|-row aggregates ever reach the driver.
    The quotient is rational → half-up 1e-6 quantization is exact."""
    import ray as _ray

    from ray.data.aggregate import Sum

    from ..context import default_parallelism
    from ..stages.joins import hash_join, put_lookup

    karr = np.asarray(sorted(set(int(k) for k in ks)), dtype=np.int64)
    simple = drop_self_loops(edges).materialize()
    degs = degrees(simple).materialize()
    npart = num_partitions or default_parallelism()
    npart = max(1, min(npart, simple.count() // 100_000 + 2))

    def node_partial(t: pa.Table) -> pa.Table:
        d = t["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        # vectorized: vertices with degree > k, for every k at once
        n = (d[:, None] > karr[None, :]).sum(axis=0).astype(np.int64)
        return pa.table({"k": karr, "n": n})

    nk = (
        degs.map_batches(node_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Sum("n", alias_name="n_nodes"))
        .materialize()
    )

    und = simple.map_batches(
        lambda t: t.filter(pc.less(t["src"], t["dst"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if degs.count() <= broadcast_threshold:
        deg_tab = pa.concat_tables(
            list(degs.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        ref = put_lookup(deg_tab, "vertex", "degree")

        def attach_both(t: pa.Table) -> pa.Table:
            lk = _ray.get(ref)
            _, da = lk.get(t["src"].to_numpy(zero_copy_only=False))
            _, db = lk.get(t["dst"].to_numpy(zero_copy_only=False))
            return pa.table({"_da": da.astype(np.int64), "_db": db.astype(np.int64)})

        attached = und.map_batches(
            attach_both, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        da = degs.map_batches(
            lambda t: t.rename_columns(["src", "_da"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        db = degs.map_batches(
            lambda t: t.rename_columns(["dst", "_db"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        attached = hash_join(
            hash_join(und, da, on=("src",), num_partitions=npart),
            db,
            on=("dst",),
            num_partitions=npart,
        )

    def edge_partial(t: pa.Table) -> pa.Table:
        da_ = t["_da"].to_numpy(zero_copy_only=False).astype(np.int64)
        db_ = t["_db"].to_numpy(zero_copy_only=False).astype(np.int64)
        mn = np.minimum(da_, db_)
        e = (mn[:, None] > karr[None, :]).sum(axis=0).astype(np.int64)
        return pa.table({"k": karr, "e": e})

    ek = (
        attached.map_batches(edge_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Sum("e", alias_name="n_edges"))
        .materialize()
    )

    def tiny(ds: Dataset, val: str) -> dict[int, int]:
        out: dict[int, int] = {}
        for t in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            for kk, vv in zip(
                t["k"].to_numpy(zero_copy_only=False),
                t[val].to_numpy(zero_copy_only=False),
            ):
                out[int(kk)] = int(vv)
        return out

    nmap, emap = tiny(nk, "n_nodes"), tiny(ek, "n_edges")
    n = np.array([nmap.get(int(k), 0) for k in karr], dtype=np.int64)
    e = np.array([emap.get(int(k), 0) for k in karr], dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.where(
            n >= 2,
            np.floor(
                2.0 * e / np.maximum(n * (n - 1), 1).astype(np.float64) * 1e6 + 0.5
            )
            / 1e6,
            0.0,
        )
    return pa.table(
        {"k": karr, "n_nodes": n, "n_edges": e, "phi": phi}
    )


def degree_powerlaw(
    edges: Dataset, *, dmin: int = 5
) -> pd.DataFrame:
    """One row (dmin, n_tail, alpha): the continuous-MLE power-law
    exponent α̂ = 1 + n / Σ ln(d / (dmin − ½)) over vertices of degree
    ≥ dmin (Clauset–Shalizi–Newman) — is this web graph's degree tail
    Zipf-like, and how heavy? Two scalars suffice: each batch emits a
    (count, Σµnat) partial with every vertex's ln term quantized to
    integer µnats BEFORE summation (the bigram_surprisal rule: exact
    int64 sums, summation order can never diverge from SQL); the final
    α quantizes half-up at 1e-6 from the two exact integers."""
    import pandas as _pd

    simple = drop_self_loops(edges)
    degs = degrees(simple)
    x0 = float(dmin) - 0.5

    def partial(t: pa.Table) -> pa.Table:
        d = t["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = d[d >= dmin]
        s = np.floor(np.log(d.astype(np.float64) / x0) * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "n": np.array([len(d)], dtype=np.int64),
                "s": np.array([int(s.sum())], dtype=np.int64),
            }
        )

    n_tail, s_mu = 0, 0
    for t in (
        degs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        n_tail += int(t["n"].to_numpy(zero_copy_only=False).sum())
        s_mu += int(t["s"].to_numpy(zero_copy_only=False).sum())
    if s_mu > 0:
        alpha = np.floor((1.0 + n_tail / (s_mu / 1e6)) * 1e6 + 0.5) / 1e6
    else:
        alpha = 0.0
    return _pd.DataFrame(
        {
            "dmin": np.array([dmin], dtype=np.int64),
            "n_tail": np.array([n_tail], dtype=np.int64),
            "alpha": np.array([alpha], dtype=np.float64),
        }
    )


def degree_gini(edges: Dataset) -> pd.DataFrame:
    """One row (n_vertices, gini): the Gini coefficient of the degree
    distribution — the single-scalar skew diagnostic that tells you
    whether hub-salting is needed before a degree-keyed shuffle.
    G = 2·Σᵢ i·dᵢ / (n·Σd) − (n+1)/n over degrees sorted ascending
    (1-based rank). Computed exactly from the degree HISTOGRAM
    (degree-vocabulary bounded: per-batch partials + one keyed sum;
    the driver fold over distinct degree values yields the two exact
    integer sums Σd and Σ rank·d via run arithmetic, never expanding
    per-vertex rows)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    degs = degrees(drop_self_loops(edges))
    hist = (
        degs.map_batches(
            lambda t: (lambda u, c: pa.table(
                {"degree": u, "c": c.astype(np.int64)}
            ))(*np.unique(
                t["degree"].to_numpy(zero_copy_only=False), return_counts=True
            )),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("degree")
        .aggregate(Sum("c", alias_name="n"))
        .materialize()
    )
    tab = pa.concat_tables(
        list(hist.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    d = tab["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = tab["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(d, kind="stable")
    d, c = d[o], c[o]
    n = int(c.sum())
    total = int((d * c).sum())
    # Σ rank·d over a run of c equal degrees starting at rank r+1:
    # d · (c·r + c(c+1)/2)
    ends = np.cumsum(c)
    starts = ends - c
    rank_sum = int((d * (c * starts + c * (c + 1) // 2)).sum())
    if n and total:
        gini = float(
            np.floor((2.0 * rank_sum / (n * float(total)) - (n + 1.0) / n) * 1e6 + 0.5)
            / 1e6
        )
    else:
        gini = 0.0
    return pd.DataFrame(
        {
            "n_vertices": np.array([n], dtype=np.int64),
            "gini": np.array([gini], dtype=np.float64),
        }
    )
