"""Per-component bipartiteness via multi-seed BFS parity.

A component is bipartite iff no edge joins two vertices whose BFS
layers (from the component's root) share parity — one multi-seed
pinned BFS wave (every component root starts at distance 0; waves
cannot cross component boundaries, so ONE dist vector serves all
components where a per-source matrix would be O(n·k)) plus one pass
over the simple edge list counting same-parity endpoints per
component. Self-loops are ignored (a graph with self-loops is
conventionally non-bipartite only through them; the SIMPLE graph is
what the 2-coloring question is about — documented both sides).

Root collection is component-count bounded on the driver; a shattered
crawl graph (billions of singletons) would instead keep roots as a
Dataset and seed shards through a broadcast join — the cut-over is
noted at the call site.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..stages.skew import bucketed_distinct as _bucketed_distinct
from ..stages.skew import bucketed_group_reduce as _bgr

from ..context import default_parallelism
from ..stages.graph import drop_self_loops
from ..stages.joins import hash_join, put_lookup

_BROADCAST_VERTICES = 5_000_000


def bipartite_check(
    edges: Dataset,
    *,
    labels: Dataset | None = None,
    broadcast_threshold: int = _BROADCAST_VERTICES,
    num_partitions: int | None = None,
) -> Dataset:
    """(label, n_vertices, n_conflicts, is_bipartite) per connected
    component over the canonical symmetric edge table. Pass a
    precomputed CC label table to share a solve."""
    import ray

    from .bfs import bfs_hops_pinned
    from .cc import connected_components

    if labels is None:
        labels = connected_components(edges).labels.materialize()
    else:
        labels = labels.materialize()
    roots = np.sort(
        np.concatenate(
            [
                t["label"].to_numpy(zero_copy_only=False)
                for t in _bucketed_distinct(labels, "label")
                .iter_batches(batch_format="pyarrow", batch_size=None)
            ]
        ).astype(np.int64)
    )
    dist = bfs_hops_pinned(edges, roots).materialize()

    sizes = _bgr(labels, "label", "n_vertices", "count")

    simple = drop_self_loops(edges).materialize()
    und = simple.map_batches(
        lambda t: t.filter(pc.less(t["src"], t["dst"])).rename_columns(["a", "b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    npart = num_partitions or default_parallelism()
    npart = max(1, min(npart, simple.count() // 100_000 + 2))

    nverts = labels.count()
    if nverts <= broadcast_threshold:
        dtab = pa.concat_tables(
            list(dist.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        ltab = pa.concat_tables(
            list(labels.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        dref = put_lookup(dtab, "vertex", "hops")
        lref = put_lookup(ltab, "vertex", "label")

        def conflict_partial(t: pa.Table) -> pa.Table:
            dl = ray.get(dref)
            ll = ray.get(lref)
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            _, ha = dl.get(a)
            _, hb = dl.get(b)
            _, lab = ll.get(a)
            conf = (ha + hb) % 2 == 0
            lc = lab[conf]
            u, c = np.unique(lc, return_counts=True)
            return pa.table({"label": u, "c": c.astype(np.int64)})

        confl = _bgr(
            und.map_batches(
                conflict_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            "label",
            "c",
            "sum",
        ).map_batches(
            lambda t: t.rename_columns(["label", "n_conflicts"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        da = dist.map_batches(
            lambda t: t.rename_columns(["a", "_ha"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        db = dist.map_batches(
            lambda t: t.rename_columns(["b", "_hb"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        la = labels.map_batches(
            lambda t: t.rename_columns(["a", "label"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        j = hash_join(
            hash_join(
                hash_join(und, da, on=("a",), num_partitions=npart),
                db,
                on=("b",),
                num_partitions=npart,
            ),
            la,
            on=("a",),
            num_partitions=npart,
        )

        def conflict_partial_j(t: pa.Table) -> pa.Table:
            ha = t["_ha"].to_numpy(zero_copy_only=False).astype(np.int64)
            hb = t["_hb"].to_numpy(zero_copy_only=False).astype(np.int64)
            lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            lc = lab[(ha + hb) % 2 == 0]
            u, c = np.unique(lc, return_counts=True)
            return pa.table({"label": u, "c": c.astype(np.int64)})

        confl = _bgr(
            j.map_batches(
                conflict_partial_j, batch_format="pyarrow", zero_copy_batch=True
            ),
            "label",
            "c",
            "sum",
        ).map_batches(
            lambda t: t.rename_columns(["label", "n_conflicts"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    joined = hash_join(
        sizes, confl, on=("label",), join_type="left_outer",
        num_partitions=max(1, min(npart, len(roots) // 10_000 + 1)),
    )

    def finalize(t: pa.Table) -> pa.Table:
        nc = t["n_conflicts"].to_numpy(zero_copy_only=False)
        nc = np.where(np.isnan(nc.astype(np.float64)), 0, nc).astype(np.int64)
        return pa.table(
            {
                "label": t["label"],
                "n_vertices": t["n_vertices"],
                "n_conflicts": nc,
                "is_bipartite": (nc == 0).astype(np.int64),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
