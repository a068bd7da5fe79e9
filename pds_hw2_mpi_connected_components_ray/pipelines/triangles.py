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

import ray
from ray.data import Dataset

from ..context import default_parallelism
from ..stages.graph import degrees, drop_self_loops
from ..stages.joins import hash_join, put_lookup


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


def triangle_count(
    edges: Dataset,
    *,
    num_partitions: int | None = None,
) -> int:
    """Total triangles in the canonical symmetric deduped edge table.

    Degrees are broadcast (one (vertex,degree) int64 pair per vertex via
    ray.put -- 16 bytes/vertex; for vertex sets beyond worker memory,
    swap the broadcast for two hash joins, same semantics).
    """
    simple = drop_self_loops(edges).materialize()
    # clamp partitions to the data size: tiny partitions only add task
    # overhead and risk Ray's empty-partition join crash
    npart = num_partitions or default_parallelism()
    npart = max(2, min(npart, simple.count() // 100_000 + 2))
    deg_tab = pa.concat_tables(
        list(degrees(simple).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    deg_ref = put_lookup(deg_tab, "vertex", "degree")
    oriented = _orient(simple, deg_ref).materialize()

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
    edges: Dataset, *, num_partitions: int | None = None
) -> Dataset:
    """(vertex, triangles) -- number of triangles incident to each vertex.

    Same wedge-closure plan, but each closed triangle (a,b,c) credits all
    three corners before a final groupby-sum.
    """
    from ray.data.aggregate import Sum

    simple = drop_self_loops(edges).materialize()
    npart = num_partitions or default_parallelism()
    npart = max(2, min(npart, simple.count() // 100_000 + 2))
    deg_tab = pa.concat_tables(
        list(degrees(simple).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    deg_ref = put_lookup(deg_tab, "vertex", "degree")
    oriented = _orient(simple, deg_ref).materialize()
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

    return (
        tri.map_batches(corners, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vertex")
        .aggregate(Sum("t", alias_name="triangles"))
    )
