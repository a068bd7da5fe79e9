"""One-row graph profile: the summary a crawl operator reads before
deciding how to shard the real run (size, degree skew, transitivity,
connectivity) — a composition of the engine's own primitives, each of
which is independently oracle-checked.

Every quantity is a scalar or comes from an existing summary-
proportional reduce: vertex/edge counts are metadata counts, max
degree is a per-batch partial + tiny max, triangles reuse the adaptive
local-closure/wedge plan, and component stats reuse the CC solver's
label table (label-keyed count, then two scalars). Ratios are rational
in exact integers → half-up 1e-6 quantization matches SQL bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count

from ..stages.graph import degrees, drop_self_loops


def graph_summary(edges: Dataset, labels: Dataset | None = None) -> pd.DataFrame:
    """(n_vertices, n_edges, max_degree, avg_degree, density,
    n_triangles, n_components, largest_component) over the canonical
    symmetric edge table. n_edges counts undirected simple edges.
    Pass a precomputed CC label table via `labels` to share a solve
    (the driver layer memoizes one per process)."""
    from .cc import connected_components
    from .triangles import triangle_count

    # ONE materialized simple table + ONE materialized degree table are
    # shared across every leg (count/degree/triangle); the scalar
    # reductions over each small summary table are fused into a single
    # per-block-partial pass instead of separate .count()/.max()/.sum()
    # executions (r4 regression: ~6 independent Ray executions over the
    # same edge table doubled the wall).
    simple = drop_self_loops(edges).materialize()
    degs = degrees(simple).materialize()

    def deg_partial(t):
        d = t["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "s": pa.array([int(d.sum())], pa.int64()),
                "mx": pa.array([int(d.max()) if len(d) else 0], pa.int64()),
            }
        )

    sum_deg, max_degree = 0, 0
    for t in degs.map_batches(
        deg_partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        sum_deg += int(t["s"].to_numpy(zero_copy_only=False).sum())
        max_degree = max(max_degree, int(t["mx"].to_numpy(zero_copy_only=False).max()))
    # symmetric self-loop-free table: every undirected edge is 2 rows
    n_edges = sum_deg // 2

    n_triangles = int(triangle_count(edges, simple=simple, degs=degs))

    # label table has exactly one row per vertex (self-loop-only /
    # isolated-in-simple vertices included), so the component-size
    # aggregate also yields n_vertices as its size sum — one execution
    # for all three scalars.
    lab = labels if labels is not None else connected_components(edges).labels
    comp = lab.groupby("label").aggregate(Count(alias_name="sz"))

    def comp_partial(t):
        sz = t["sz"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(sz)], pa.int64()),
                "mx": pa.array([int(sz.max()) if len(sz) else 0], pa.int64()),
                "sv": pa.array([int(sz.sum())], pa.int64()),
            }
        )

    n_components, largest, n_vertices = 0, 0, 0
    for t in comp.map_batches(
        comp_partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        n_components += int(t["n"].to_numpy(zero_copy_only=False).sum())
        largest = max(largest, int(t["mx"].to_numpy(zero_copy_only=False).max()))
        n_vertices += int(t["sv"].to_numpy(zero_copy_only=False).sum())

    n = float(n_vertices)
    m = float(n_edges)
    avg_degree = np.floor(2.0 * m / n * 1e6 + 0.5) / 1e6
    density = np.floor(2.0 * m / (n * (n - 1.0)) * 1e6 + 0.5) / 1e6
    return pd.DataFrame(
        {
            "n_vertices": np.array([n_vertices], dtype=np.int64),
            "n_edges": np.array([n_edges], dtype=np.int64),
            "max_degree": np.array([max_degree], dtype=np.int64),
            "avg_degree": np.array([avg_degree], dtype=np.float64),
            "density": np.array([density], dtype=np.float64),
            "n_triangles": np.array([n_triangles], dtype=np.int64),
            "n_components": np.array([n_components], dtype=np.int64),
            "largest_component": np.array([largest], dtype=np.int64),
        }
    )


def component_profiles(
    edges: Dataset,
    labels: Dataset | None = None,
    *,
    broadcast_threshold: int = 5_000_000,
    num_partitions: int | None = None,
) -> Dataset:
    """(label, n_vertices, sum_degree, avg_degree, density) per
    connected component — the per-community structural profile
    (components are edge-closed, so within-component edge count is
    sum_degree/2 for free, no edge-side label join needed when the
    degree table carries the label). Degrees attach to labels by
    broadcast below the threshold, hash join beyond; ratios are
    rational → exact 1e-6 quantize."""
    import ray

    from ray.data.aggregate import Sum

    from ..stages.graph import degrees, drop_self_loops
    from ..stages.joins import hash_join, put_lookup
    from .cc import connected_components

    lab = (
        labels if labels is not None else connected_components(edges).labels
    ).materialize()
    simple = drop_self_loops(edges).materialize()
    degs = degrees(simple).materialize()
    npart = num_partitions or 8

    # attach degree to every labeled vertex (degree 0 for self-loop-only
    # / isolated vertices absent from the simple-degree table)
    if degs.count() <= broadcast_threshold:
        import pyarrow as pa

        dtab = pa.concat_tables(
            list(degs.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        ref = put_lookup(dtab, "vertex", "degree")

        def attach(t):
            import pyarrow as pa

            lk = ray.get(ref)
            v = t["vertex"].to_numpy(zero_copy_only=False)
            found, d = lk.get(v)
            d = np.where(found, d, 0).astype(np.int64)
            return pa.table(
                {"label": t["label"], "d": d, "one": np.ones(len(v), np.int64)}
            )

        attached = lab.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)
    else:
        import pyarrow as pa

        j = hash_join(
            lab,
            degs.map_batches(
                lambda t: t.rename_columns(["vertex", "d"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            on=("vertex",),
            join_type="left_outer",
            num_partitions=npart,
        )

        def fix(t):
            d = t["d"].to_numpy(zero_copy_only=False)
            d = np.where(np.isnan(d.astype(np.float64)), 0, d).astype(np.int64)
            return pa.table(
                {
                    "label": t["label"],
                    "d": d,
                    "one": np.ones(len(t), np.int64),
                }
            )

        attached = j.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)

    agg = attached.groupby("label").aggregate(
        Sum("one", alias_name="n_vertices"), Sum("d", alias_name="sum_degree")
    )

    def finalize(t):
        import pyarrow as pa

        n = t["n_vertices"].to_numpy(zero_copy_only=False).astype(np.float64)
        sd = t["sum_degree"].to_numpy(zero_copy_only=False).astype(np.float64)
        avg = np.floor(sd / n * 1e6 + 0.5) / 1e6
        with np.errstate(divide="ignore", invalid="ignore"):
            dens = np.where(
                n >= 2,
                np.floor(sd / (n * (n - 1.0)) * 1e6 + 0.5) / 1e6,
                0.0,
            )
        return pa.table(
            {
                "label": t["label"],
                "n_vertices": t["n_vertices"],
                "sum_degree": t["sum_degree"],
                "avg_degree": avg,
                "density": dens,
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
