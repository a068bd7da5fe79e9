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
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count

from ..stages.graph import degrees, drop_self_loops, vertices


def graph_summary(edges: Dataset, labels: Dataset | None = None) -> pd.DataFrame:
    """(n_vertices, n_edges, max_degree, avg_degree, density,
    n_triangles, n_components, largest_component) over the canonical
    symmetric edge table. n_edges counts undirected simple edges.
    Pass a precomputed CC label table via `labels` to share a solve
    (the driver layer memoizes one per process)."""
    from .cc import connected_components
    from .triangles import triangle_count

    n_vertices = vertices(edges).count()
    simple = drop_self_loops(edges).materialize()
    n_edges = simple.map_batches(
        lambda t: t.filter(pc.less(t["src"], t["dst"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).count()
    max_degree = int(degrees(simple).max("degree"))
    n_triangles = int(triangle_count(edges))

    lab = labels if labels is not None else connected_components(edges).labels
    comp = (
        lab.groupby("label")
        .aggregate(Count(alias_name="sz"))
        .materialize()
    )
    n_components = comp.count()
    largest = int(comp.max("sz"))

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
