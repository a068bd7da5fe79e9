"""Link prediction by common-neighbor counting.

Candidate score for a non-adjacent pair (b, c): the number of wedges
b–a–c, i.e. |N(b) ∩ N(c)| — the classic common-neighbors predictor.
Plan (all keyed all-to-alls, no driver state):

 1. wedge join on the center: edges(a→b) ⋈ edges(a→c), b < c — every
    unordered wedge exactly once;
 2. groupby (b, c) count — per-pair common-neighbor totals (a
    per-batch combiner would not help: wedge keys rarely repeat within
    a batch);
 3. anti-join against the edge table — drop already-adjacent pairs;
 4. deterministic top-k: sort (count desc, b, c) + limit.

Cost honesty at scale: wedge volume is Σ_a deg(a)² — a true hub
explodes it (the SQL oracle pays the identical join, so the oracle
comparison stays fair). `max_degree` is the scale knob: centers above
the cap are dropped BEFORE the self-join (one broadcast/join degree
attach, the same adaptive machinery as triangles), turning the plan
into the standard approximate predictor used on web graphs; the
oracle query runs with the cap disabled.

No reference analogue (north-rule link-graph extension); the wedge
machinery parallels pipelines.triangles (which orients by degree to
count each triangle once — here every wedge must be counted, so
orientation does not apply).

Adaptive execution: when the edge table is small (≤ _LOCAL_EDGE_ROWS
rows AND ≤ _LOCAL_WEDGE_ROWS generated wedges — a dimension table
relative to a 100 TB corpus), the WHOLE predictor runs as one numpy
pass on the driver (`_local_pair_topk`); five fixed-cost Ray
executions dominated the wall there. Above either bound the
distributed wedge-join plan runs unchanged; equality is pinned by
tests/test_linkpred.py::test_local_fastpath_equals_distributed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count

from ..context import default_parallelism
from ..stages.graph import collect_edge_table as _collect_edges
from ..stages.graph import degrees, drop_self_loops
from ..stages.graph import run_pairs as _run_pairs
from ..stages.joins import hash_join, put_lookup

_PACK_SHIFT = np.int64(31)
_PACK_MASK = np.int64((1 << 31) - 1)

# Driver-local fast path: below these bounds the whole predictor runs
# as ONE numpy pass on the driver (the edge table is dimension-sized
# relative to a 100 TB corpus; five Ray executions of fixed cost
# dominate the wall at gate scale). Above either bound the distributed
# wedge-join plan runs unchanged.
_LOCAL_EDGE_ROWS = 4_000_000
_LOCAL_WEDGE_ROWS = 32_000_000




def _local_pair_topk(
    t: pa.Table, k: int, cap: int | None, weighted: bool
) -> pa.Table | None:
    """Driver-local (b, c, score) top-k over a collected symmetric
    self-loop-free edge table; replicates the distributed plans
    exactly (degree = rows per src incl. duplicate edges; CN caps
    filter BOTH wedges and adjacency, AA keeps full adjacency and
    drops deg<2 centers; round-before-rank on the AA float sum).
    Returns None when the wedge volume exceeds _LOCAL_WEDGE_ROWS or
    ids do not fit the 31-bit pack."""
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    if len(src) == 0:
        name = "aa_score" if weighted else "common_neighbors"
        return pa.table(
            {
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                name: pa.array([], pa.float64() if weighted else pa.int64()),
            }
        )
    if src.min() < 0 or dst.min() < 0 or max(src.max(), dst.max()) >= 2**31:
        return None
    order = np.argsort(src, kind="stable")
    s, d = src[order], dst[order]
    bounds = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    runlens = np.diff(np.r_[bounds, len(s)])
    deg = runlens  # rows per src == degree (symmetric table)
    if weighted:
        # AA: centers need 2 <= deg <= cap; adjacency stays FULL
        ok = deg >= 2
        if cap is not None:
            ok &= deg <= cap
        adj_src, adj_dst = src, dst
    else:
        # CN with a cap filters the TABLE (wedges and adjacency both)
        if cap is not None:
            keep = np.repeat(deg <= cap, runlens)
            s, d = s[keep], d[keep]
            bounds = np.flatnonzero(np.r_[True, s[1:] != s[:-1]]) if len(s) else np.array([], np.int64)
            runlens = np.diff(np.r_[bounds, len(s)])
            adj_src, adj_dst = s, d
        else:
            adj_src, adj_dst = src, dst
        ok = np.ones(len(runlens), dtype=bool)
    n_wedges = (runlens[ok].astype(np.int64) * (runlens[ok] - 1) // 2).sum()
    if n_wedges > _LOCAL_WEDGE_ROWS:
        return None
    keep_rows = np.repeat(ok, runlens)
    s2, d2 = s[keep_rows], d[keep_rows]
    bounds2 = (
        np.flatnonzero(np.r_[True, s2[1:] != s2[:-1]]) if len(s2) else np.array([], np.int64)
    )
    fi, se = _run_pairs(d2, bounds2)
    b = np.minimum(d2[fi], d2[se]).astype(np.int64)
    c = np.maximum(d2[fi], d2[se]).astype(np.int64)
    ne = b != c  # duplicate-edge wedges (b==c) are filtered by b<c
    b, c = b[ne], c[ne]
    key = (b << _PACK_SHIFT) | c
    if weighted:
        runlens2 = np.diff(np.r_[bounds2, len(s2)])
        # the per-center filter keeps whole runs, so runlen == full-table
        # degree for every surviving center (the AA weight's divisor)
        w_run = 1.0 / np.log(runlens2.astype(np.float64))
        w = np.repeat(w_run, (runlens2 * (runlens2 - 1) // 2))[ne]
        u, inv = np.unique(key, return_inverse=True)
        score = np.bincount(inv, weights=w)
    else:
        u, counts = np.unique(key, return_counts=True)
        score = counts.astype(np.int64)
    sel = adj_src < adj_dst
    adj_key = np.unique(
        (adj_src[sel].astype(np.int64) << _PACK_SHIFT) | adj_dst[sel].astype(np.int64)
    )
    pos = np.searchsorted(adj_key, u)
    pos_c = np.clip(pos, 0, len(adj_key) - 1) if len(adj_key) else pos
    is_adj = (
        (adj_key[pos_c] == u) & (pos < len(adj_key)) if len(adj_key) else np.zeros(len(u), bool)
    )
    keep = ~is_adj & (score > 0)
    u, score = u[keep], score[keep]
    bu = (u >> _PACK_SHIFT).astype(np.int64)
    cu = (u & _PACK_MASK).astype(np.int64)
    if weighted:
        score = np.round(score, 6)  # round-before-rank (oracle contract)
    top = np.lexsort((cu, bu, -score))[:k]
    name = "aa_score" if weighted else "common_neighbors"
    vals = score[top] if weighted else score[top].astype(np.int64)
    return pa.table({"b": bu[top], "c": cu[top], name: vals})



def _bucketed_pair_sum_max(ds, sum_col: str, max_col: str = "_adj"):
    """Per-(b, c) SUM(sum_col) + MAX(max_col) via a b-hash bucketed
    exchange — groups are candidate PAIRS (data-proportional), where
    Ray's keyed sort-aggregate pays ~ms per group; the two tag-union
    keyed all-to-alls this replaces were the link-prediction wall."""
    from ..context import default_parallelism

    nb = max(8, default_parallelism())

    def bkt(t: pa.Table) -> pa.Table:
        b = t["b"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_kb", pa.array((b * np.int64(0x9E3779B9)) % nb, pa.int64())
        )

    def red(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e = pa.array([], pa.int64())
            vt = (
                t.schema.field(sum_col).type
                if sum_col in t.column_names
                else pa.int64()
            )
            return pa.table(
                {"b": e, "c": e, sum_col: pa.array([], vt), max_col: e}
            )
        b = t["b"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        v = t[sum_col].to_numpy(zero_copy_only=False)
        m = t[max_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, b))
        bs, cs = b[order], c[order]
        new = np.r_[True, (bs[1:] != bs[:-1]) | (cs[1:] != cs[:-1])]
        bounds = np.flatnonzero(new)
        return pa.table(
            {
                "b": bs[bounds],
                "c": cs[bounds],
                sum_col: np.add.reduceat(v[order], bounds),
                max_col: np.maximum.reduceat(m[order], bounds),
            }
        )

    return (
        ds.map_batches(bkt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb", num_partitions=nb)
        .map_groups(red, batch_format="pyarrow")
    )

def _packed_pair_scores(
    simple: Dataset,
    left: Dataset,
    npart: int,
    *,
    weighted: bool,
) -> Dataset:
    """Fast path for both predictors when ids fit 31 bits (always true
    after the engine's dense renumber): pack the unordered candidate
    pair (b, c) into one int64 key, pre-combine scores per batch with
    np.unique/bincount, and resolve BOTH the global sum AND the
    adjacency anti-join in a SINGLE bucketed all-to-all — the same
    bucket-per-group reduceat trick that took `edge_support` from a
    full Ray keyed aggregate (10.5 s / 750k rows) to ~1 s. The generic
    plan pays two full keyed aggregates over wedge volume; this pays
    one shuffle of per-batch-combined partials.

    `left` carries (a, b[, w]); wedges come from the same center join
    as the generic plan. Adjacency rows ride the same shuffle tagged
    `_adj=1` with score 0, so a per-bucket max tells existing edges
    apart without a second exchange.
    """
    sdtype = np.float64 if weighted else np.int64

    def partial(t: pa.Table) -> pa.Table:
        sel = pc.less(t["b"], t["c"])
        b = t["b"].filter(sel).to_numpy(zero_copy_only=False)
        c = t["c"].filter(sel).to_numpy(zero_copy_only=False)
        if len(b) == 0:
            return pa.table(
                {
                    "k": np.empty(0, np.int64),
                    "s": np.empty(0, sdtype),
                    "_adj": np.empty(0, np.int64),
                }
            )
        k = (b << _PACK_SHIFT) | c
        if weighted:
            w = t["w"].filter(sel).to_numpy(zero_copy_only=False)
            u, inv = np.unique(k, return_inverse=True)
            s = np.bincount(inv, weights=w)
        else:
            u, cnt = np.unique(k, return_counts=True)
            s = cnt.astype(np.int64)
        return pa.table(
            {"k": u, "s": s.astype(sdtype), "_adj": np.zeros(len(u), np.int64)}
        )

    def adj_rows(t: pa.Table) -> pa.Table:
        sel = pc.less(t["src"], t["dst"])
        src = t["src"].filter(sel).to_numpy(zero_copy_only=False)
        dst = t["dst"].filter(sel).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": (src << _PACK_SHIFT) | dst,
                "s": np.zeros(len(src), sdtype),
                "_adj": np.ones(len(src), np.int64),
            }
        )

    right = simple.map_batches(
        lambda t: pa.table({"a2": t["src"], "c": t["dst"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    wedges = hash_join(left, right, on=("a",), right_on=("a2",), num_partitions=npart)
    partials = wedges.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    tagged = simple.map_batches(adj_rows, batch_format="pyarrow", zero_copy_batch=True)

    nb = max(8, default_parallelism())

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_kb", pa.array((k * np.int64(0x9E3779B9)) % nb, pa.int64())
        )

    def bucket_reduce(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        adj = t["_adj"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, ss, aj = k[order], s[order], adj[order]
        bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        tot = np.add.reduceat(ss, bounds)
        amax = np.maximum.reduceat(aj, bounds)
        keep = (amax == 0) & (tot > 0)
        ku = ks[bounds][keep]
        return pa.table(
            {
                "b": ku >> _PACK_SHIFT,
                "c": ku & _PACK_MASK,
                "s": tot[keep].astype(sdtype),
            }
        )

    return (
        partials.union(tagged)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb", num_partitions=nb)
        .map_groups(bucket_reduce, batch_format="pyarrow")
    )


def common_neighbor_candidates(
    edges: Dataset,
    *,
    k: int = 20,
    max_degree: int | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """(b, c, common_neighbors): top-k non-adjacent pairs by shared
    neighbor count over a canonical symmetric edge table."""
    simple = drop_self_loops(edges).materialize()
    npart = num_partitions or default_parallelism()
    n_rows = simple.count()
    npart = max(2, min(npart, n_rows // 100_000 + 2))

    if n_rows <= _LOCAL_EDGE_ROWS:
        local = _local_pair_topk(
            _collect_edges(simple), k, max_degree, weighted=False
        )
        if local is not None:
            import ray.data as _rd

            return _rd.from_arrow(local)

    if max_degree is not None:
        degs = degrees(simple).materialize()
        deg_tab = pa.concat_tables(
            list(degs.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        deg_ref = put_lookup(deg_tab, "vertex", "degree")

        def cap(t: pa.Table) -> pa.Table:
            import ray as _ray

            lk = _ray.get(deg_ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            _, d = lk.get(src)
            return t.filter(pa.array(d <= max_degree))

        simple = simple.map_batches(
            cap, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    left = simple.map_batches(
        lambda t: pa.table({"a": t["src"], "b": t["dst"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    vmax = simple.max("dst")
    if vmax is not None and int(vmax) < 2**31:
        cand = _packed_pair_scores(simple, left, npart, weighted=False)
        cand = cand.map_batches(
            lambda t: t.rename_columns(["b", "c", "common_neighbors"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return cand.sort(
            ["common_neighbors", "b", "c"], descending=[True, False, False]
        ).limit(k)
    right = simple.map_batches(
        lambda t: pa.table({"a2": t["src"], "c": t["dst"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    wedges = hash_join(left, right, on=("a",), right_on=("a2",), num_partitions=npart)
    wedges = wedges.map_batches(
        lambda t: t.filter(pc.less(t["b"], t["c"])).select(["b", "c"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # anti-join as a tag-union: wedge rows carry (n=1, _adj=0),
    # adjacency rows (n=0, _adj=1); ONE fused bucketed exchange sums n
    # (= common-neighbor count) and maxes the tag per pair -- replacing
    # the former two pair-keyed all-to-alls, and (unlike Ray's
    # per-partition acero join) indifferent to empty shuffle partitions.
    tagged_wedges = wedges.map_batches(
        lambda t: pa.table(
            {
                "b": t["b"],
                "c": t["c"],
                "common_neighbors": np.ones(len(t), dtype=np.int64),
                "_adj": np.zeros(len(t), dtype=np.int64),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tagged_adj = simple.map_batches(
        lambda t: pa.table(
            {
                "b": t["src"],
                "c": t["dst"],
                "common_neighbors": np.zeros(len(t), dtype=np.int64),
                "_adj": np.ones(len(t), dtype=np.int64),
            }
        ).filter(pc.less(t["src"], t["dst"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    merged = _bucketed_pair_sum_max(
        tagged_wedges.union(tagged_adj), "common_neighbors"
    )
    cand = merged.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["_adj"], 0), pc.greater(t["common_neighbors"], 0))
        ).select(["b", "c", "common_neighbors"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return cand.sort(
        ["common_neighbors", "b", "c"], descending=[True, False, False]
    ).limit(k)


def adamic_adar_candidates(
    edges: Dataset,
    *,
    k: int = 20,
    max_degree: int | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """(b, c, aa_score): top-k non-adjacent pairs by the Adamic–Adar
    index Σ_{a ∈ N(b)∩N(c)} 1/ln(deg(a)) — common-neighbor counting
    with hub centers discounted (a shared neighbor that links half the
    web says nothing; a shared neighbor of degree 3 says a lot).

    Same keyed-all-to-all plan as `common_neighbor_candidates`, with
    the center weight attached BEFORE the wedge self-join (each wedge
    then carries its weight for free):

     1. degree attach on src — broadcast lookup below the triangles
        module's vertex threshold, edge-keyed hash join above (the
        triangles `_oriented_edges` adaptive split; a hash join over a
        2-row weight table also trips Ray's empty-shuffle-partition
        acero schema error, so small sides MUST broadcast). Centers
        with deg < 2 cannot form a wedge and are dropped here, which
        also keeps ln(1) = 0 out of the divisor;
     2. wedge join on the center, b < c; groupby (b,c) SUM(1/ln(deg));
     3. adjacency anti-join (tag-union groupby, empty-partition-safe);
     4. round(score, 6) BEFORE the (score desc, b, c) top-k — rounding
        first keeps numpy/DuckDB float-sum ulp noise out of both the
        rank order and the value hash (the tfidf_top_terms contract).

    `max_degree` caps wedge volume exactly as in the unweighted
    predictor. No reference analogue (north-rule link-graph extension).
    """
    from .triangles import BROADCAST_DEGREE_THRESHOLD

    simple = drop_self_loops(edges).materialize()
    npart = num_partitions or default_parallelism()
    n_rows = simple.count()
    npart = max(2, min(npart, n_rows // 100_000 + 2))

    if n_rows <= _LOCAL_EDGE_ROWS:
        local = _local_pair_topk(
            _collect_edges(simple), k, max_degree, weighted=True
        )
        if local is not None:
            import ray.data as _rd

            return _rd.from_arrow(local)

    degs = degrees(simple).materialize()
    cap = np.iinfo(np.int64).max if max_degree is None else max_degree

    if degs.count() <= BROADCAST_DEGREE_THRESHOLD:
        deg_tab = pa.concat_tables(
            list(degs.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        deg_ref = put_lookup(deg_tab, "vertex", "degree")

        def attach(t: pa.Table) -> pa.Table:
            import ray as _ray

            lk = _ray.get(deg_ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            _, d = lk.get(src)  # symmetric table: every src has a degree
            idx = np.nonzero((d >= 2) & (d <= cap))[0]
            return pa.table(
                {
                    "a": src[idx],
                    "b": t["dst"].to_numpy(zero_copy_only=False)[idx],
                    "w": 1.0 / np.log(d[idx].astype(np.float64)),
                }
            )

        left = simple.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)
    else:

        def weight(t: pa.Table) -> pa.Table:
            d = t["degree"].to_numpy(zero_copy_only=False)
            idx = np.nonzero((d >= 2) & (d <= cap))[0]
            return pa.table(
                {
                    "a": t["vertex"].to_numpy(zero_copy_only=False)[idx],
                    "w": 1.0 / np.log(d[idx].astype(np.float64)),
                }
            )

        wtab = degs.map_batches(weight, batch_format="pyarrow", zero_copy_batch=True)
        left = hash_join(
            simple.map_batches(
                lambda t: pa.table({"a": t["src"], "b": t["dst"]}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            wtab,
            on=("a",),
            num_partitions=npart,
        )
    vmax = simple.max("dst")
    if vmax is not None and int(vmax) < 2**31:
        scored = _packed_pair_scores(simple, left, npart, weighted=True)

        def fin_packed(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "b": t["b"],
                    "c": t["c"],
                    "aa_score": np.round(t["s"].to_numpy(zero_copy_only=False), 6),
                }
            )

        cand = scored.map_batches(
            fin_packed, batch_format="pyarrow", zero_copy_batch=True
        )
        return cand.sort(["aa_score", "b", "c"], descending=[True, False, False]).limit(
            k
        )

    right = simple.map_batches(
        lambda t: pa.table({"a2": t["src"], "c": t["dst"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    wedges = hash_join(left, right, on=("a",), right_on=("a2",), num_partitions=npart)
    wedges = wedges.map_batches(
        lambda t: t.filter(pc.less(t["b"], t["c"])).select(["b", "c", "w"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tagged_wedges = wedges.map_batches(
        lambda t: pa.table(
            {
                "b": t["b"],
                "c": t["c"],
                "aa": t["w"],
                "_adj": np.zeros(len(t), dtype=np.int64),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tagged_adj = simple.map_batches(
        lambda t: pa.table(
            {
                "b": t["src"],
                "c": t["dst"],
                "aa": np.zeros(len(t), dtype=np.float64),
                "_adj": np.ones(len(t), dtype=np.int64),
            }
        ).filter(pc.less(t["src"], t["dst"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # one fused bucketed pair exchange (see _bucketed_pair_sum_max)
    merged = _bucketed_pair_sum_max(tagged_wedges.union(tagged_adj), "aa")

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.equal(t["_adj"], 0), pc.greater(t["aa"], 0.0)))
        return pa.table(
            {
                "b": t["b"],
                "c": t["c"],
                "aa_score": np.round(t["aa"].to_numpy(zero_copy_only=False), 6),
            }
        )

    cand = merged.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    return cand.sort(["aa_score", "b", "c"], descending=[True, False, False]).limit(k)


_NEG_MIX_A = np.int64(2654435761)
_NEG_MIX_B = np.int64(40503)
_NEG_MIX_MOD = np.int64(2**31 - 1)
_NEG_BROADCAST_EDGES = 20_000_000  # packed int64 pairs ~160 MB


def negative_edges(
    edges: Dataset,
    *,
    k: int = 2,
    broadcast_threshold: int = _NEG_BROADCAST_EDGES,
    num_partitions: int | None = None,
) -> Dataset:
    """(src, dst, i) for i in 1..k: deterministic NEGATIVE samples per
    vertex — candidate non-edges for link-prediction / GNN contrastive
    training. Candidate dst is vid[mix(src, i) mod n] under the
    SQL-expressible integer mix (mod-first, overflow-safe for 63-bit
    ids); candidates that hit a real edge or a self-loop are dropped,
    so a vertex yields ≤ k rows and the output is reproducible under
    any partitioning (no library RNG on either side).

    Plan: the sorted vertex-id array broadcasts once (vertex-bounded;
    the id→rank map both sides share), candidates generate per vertex
    batch, and the edge-membership rejection is a broadcast
    searchsorted against packed (src<<31|dst) keys below the threshold
    or a left-outer hash join + null filter beyond it (ids ≥ 2^31 also
    take the join path — packing needs 31-bit ids)."""
    import ray

    from ..stages.graph import drop_self_loops, vertices

    simple = drop_self_loops(edges).materialize()
    # candidates come from the FULL vertex set (a self-loop-only vertex
    # still gets negative samples); membership rejection uses the
    # simple table (candidates are never self-loops anyway)
    verts = vertices(edges).materialize()
    vid = np.sort(
        np.concatenate(
            [
                t["vertex"].to_numpy(zero_copy_only=False)
                for t in verts.iter_batches(batch_format="pyarrow", batch_size=None)
            ]
        ).astype(np.int64)
    )
    n = np.int64(len(vid))
    vref = ray.put(vid)
    iarr = np.arange(1, k + 1, dtype=np.int64)

    def gen(t: pa.Table) -> pa.Table:
        vv = ray.get(vref)
        v = t["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(v, k)
        ii = np.tile(iarr, len(v))
        h = ((src % _NEG_MIX_MOD) * _NEG_MIX_A + ii * _NEG_MIX_B) % _NEG_MIX_MOD
        dst = vv[(h % n).astype(np.int64)]
        keep = dst != src
        return pa.table({"src": src[keep], "dst": dst[keep], "i": ii[keep]})

    cands = verts.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)

    m = simple.count()
    fits31 = int(vid[-1]) < 2**31 if len(vid) else True
    if m <= broadcast_threshold and fits31:
        shift = np.int64(31)
        packed = []
        for t in simple.iter_batches(batch_format="pyarrow", batch_size=None):
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            packed.append((s << shift) | d)
        keys = np.sort(np.concatenate(packed)) if packed else np.array([], np.int64)
        kref = ray.put(keys)

        def anti(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            q = (s << shift) | d
            if len(ks) == 0:
                return t
            pos = np.minimum(np.searchsorted(ks, q), len(ks) - 1)
            return t.filter(pa.array(ks[pos] != q))

        return cands.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)

    from ..context import default_parallelism
    from ..stages.joins import hash_join

    npart = num_partitions or default_parallelism()
    marked = simple.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "_hit": np.ones(len(t), dtype=np.int64),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j = hash_join(
        cands, marked, on=("src", "dst"), join_type="left_outer",
        num_partitions=npart,
    )
    return j.map_batches(
        lambda t: t.filter(pc.is_null(t["_hit"])).select(["src", "dst", "i"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
