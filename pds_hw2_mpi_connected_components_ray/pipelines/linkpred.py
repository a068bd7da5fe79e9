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
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count

from ..context import default_parallelism
from ..stages.graph import degrees, drop_self_loops
from ..stages.joins import hash_join, put_lookup


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
    npart = max(2, min(npart, simple.count() // 100_000 + 2))

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
    counts = wedges.groupby(["b", "c"]).aggregate(Count(alias_name="common_neighbors"))

    # anti-join as a tag-union groupby: the (b, c) groups seeing an
    # adjacency tag are existing edges. One keyed all-to-all, same
    # volume as a hash anti-join, and (unlike Ray's per-partition acero
    # join) indifferent to empty shuffle partitions.
    tagged_counts = counts.map_batches(
        lambda t: t.append_column("_adj", pa.array(np.zeros(len(t), dtype=np.int64))),
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
    from ray.data.aggregate import Max, Sum

    merged = (
        tagged_counts.union(tagged_adj)
        .groupby(["b", "c"])
        .aggregate(
            Sum("common_neighbors", alias_name="common_neighbors"),
            Max("_adj", alias_name="_adj"),
        )
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
    npart = max(2, min(npart, simple.count() // 100_000 + 2))

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
    from ray.data.aggregate import Max, Sum

    scores = wedges.groupby(["b", "c"]).aggregate(Sum("w", alias_name="aa"))

    tagged_scores = scores.map_batches(
        lambda t: t.append_column("_adj", pa.array(np.zeros(len(t), dtype=np.int64))),
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
    merged = (
        tagged_scores.union(tagged_adj)
        .groupby(["b", "c"])
        .aggregate(Sum("aa", alias_name="aa"), Max("_adj", alias_name="_adj"))
    )

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
