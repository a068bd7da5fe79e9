"""Community-structure metrics over a vertex labeling: modularity and
the community quotient graph.

Both operators take the canonical symmetric deduped edge table plus a
(vertex, label) Dataset — any labeling works (LPA communities, CC
labels, an external partition); the driver queries feed them the
4-iteration sync-LPA labels so every number is oracle-checkable
against the unrolled SQL chain.

Scale posture: the only all-to-alls are (a) attaching the two endpoint
labels (broadcast lookup below a threshold, else two hash-shuffle
joins — the labels table is vertex-sized, never edge-sized) and
(b) a label-keyed groupby whose input is per-batch PRE-AGGREGATED to
one row per (community) / (community pair) per block. Modularity's
reduction is integer-exact on purpose: Q = A/E − B/E² where
A = same-community directed-edge count, B = Σ_c d_c², E = directed
edge count are all exact int64 sums, so the final two divisions are
the ONLY floating-point ops and numpy/DuckDB agree bit-for-bit
(summing per-community ratios in fp would be summation-order
dependent and break the value-hash against the oracle).

Self-loops are excluded (the `simp` convention shared with the
triangle oracle CTEs). On the symmetric table every undirected edge
appears as two directed rows, so E = 2m and d_c counts each endpoint
once — the standard Q = Σ_c [e_c/2m − (d_c/2m)²] with e_c counted in
directed rows.

No reference analogue (north-rule §2.6-style analytics extension;
reference scope is CC only, src/connected_components.c).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..stages.joins import hash_join

_BROADCAST_LABELS = 2_000_000


def _simple(edges: Dataset) -> Dataset:
    def drop_loops(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(s != d))

    return edges.map_batches(drop_loops, batch_format="pyarrow", zero_copy_batch=True)


def _endpoint_labels(
    edges: Dataset,
    labels: Dataset,
    *,
    broadcast_threshold: int = _BROADCAST_LABELS,
    force_join: bool = False,
) -> Dataset:
    """(ca, cb) per directed self-loop-free edge: the labels of src and
    dst. Broadcast one sorted (vertex → label) lookup when the vertex
    set is small; two hash-shuffle joins otherwise."""
    simp = _simple(edges)

    if labels.count() <= broadcast_threshold and not force_join:
        tabs = [
            b for b in labels.iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        lt = pa.concat_tables(tabs) if tabs else pa.table({"vertex": [], "label": []})
        keys = lt["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = lt["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        ref = ray.put((keys[order], vals[order]))

        def attach(t: pa.Table) -> pa.Table:
            k, v = ray.get(ref)
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "ca": v[np.searchsorted(k, s)],
                    "cb": v[np.searchsorted(k, d)],
                }
            )

        return simp.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)

    lab = labels.select_columns(["vertex", "label"])
    lsrc = lab.map_batches(
        lambda t: t.rename_columns(["src", "ca"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ldst = lab.map_batches(
        lambda t: t.rename_columns(["dst", "cb"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j = hash_join(hash_join(simp, lsrc, on=("src",)), ldst, on=("dst",))
    return j.select_columns(["ca", "cb"])


def modularity(edges: Dataset, labels: Dataset, **attach_kw) -> Dataset:
    """Single row (modularity, n_communities): Newman modularity Q of
    the labeling over the symmetric simple graph."""
    le = _endpoint_labels(edges, labels, **attach_kw)

    def partial(t: pa.Table) -> pa.Table:
        ca = t["ca"].to_numpy(zero_copy_only=False)
        cb = t["cb"].to_numpy(zero_copy_only=False)
        u, cnt = np.unique(ca, return_counts=True)
        same = np.zeros(len(u), dtype=np.int64)
        eq = ca == cb
        if eq.any():
            us, cs = np.unique(ca[eq], return_counts=True)
            same[np.searchsorted(u, us)] = cs
        return pa.table({"ca": u, "dc": cnt.astype(np.int64), "same": same})

    from ..stages.skew import bucketed_group_sum

    # per-community sums via the bucketed exchange (groups = communities,
    # data-proportional on fragmented graphs)
    percomm = bucketed_group_sum(
        le.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "ca",
        "dc",
        extra="same",
    )

    def squares(t: pa.Table) -> pa.Table:
        dc = t["dc"].to_numpy(zero_copy_only=False).astype(np.int64)
        same = t["same"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "a": pa.array([int(same.sum())], pa.int64()),
                "b": pa.array([int((dc * dc).sum())], pa.int64()),
                "e": pa.array([int(dc.sum())], pa.int64()),
                "n": pa.array([len(dc)], pa.int64()),
            }
        )

    parts = percomm.map_batches(
        squares, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # one row per block — scalar-sized by construction
    a = int(parts["a"].sum())
    b = int(parts["b"].sum())
    e = int(parts["e"].sum())
    n = int(parts["n"].sum())
    q = (a / e - b / (e * e)) if e else 0.0

    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "modularity": pa.array([np.floor(q * 1e6 + 0.5) / 1e6]),
                "n_communities": pa.array([n], pa.int64()),
            }
        )
    )


def community_graph(edges: Dataset, labels: Dataset, **attach_kw) -> Dataset:
    """(ca, cb, weight): the quotient multigraph of the labeling —
    unordered community pair (ca <= cb) with the count of directed
    simple-edge rows between them (intra-community rows included at
    ca == cb; every undirected edge contributes 2)."""
    le = _endpoint_labels(edges, labels, **attach_kw)

    def pair_partial(t: pa.Table) -> pa.Table:
        ca = t["ca"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = t["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(ca, cb)
        hi = np.maximum(ca, cb)
        key = np.stack([lo, hi], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {"ca": u[:, 0], "cb": u[:, 1], "weight": cnt.astype(np.int64)}
        )

    return (
        le.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["ca", "cb"])
        .aggregate(Sum("weight", alias_name="weight"))
    )


def conductance(edges: Dataset, labels: Dataset, **attach_kw) -> Dataset:
    """(community, cut, vol, conductance): per-community conductance
    φ(C) = cut(C) / min(vol(C), vol(complement)) over the symmetric
    simple graph — the standard community-quality score (low = well
    separated). cut counts directed rows leaving C, vol counts directed
    rows originating in C (so every quantity is an exact int64 and only
    the final division is floating point, the modularity contract);
    a community with empty complement volume scores 0.0 by convention.
    Same per-batch-partial + label-keyed-groupby plan as modularity."""
    le = _endpoint_labels(edges, labels, **attach_kw)

    def partial(t: pa.Table) -> pa.Table:
        ca = t["ca"].to_numpy(zero_copy_only=False)
        cb = t["cb"].to_numpy(zero_copy_only=False)
        u, cnt = np.unique(ca, return_counts=True)
        same = np.zeros(len(u), dtype=np.int64)
        eq = ca == cb
        if eq.any():
            us, cs = np.unique(ca[eq], return_counts=True)
            same[np.searchsorted(u, us)] = cs
        return pa.table({"ca": u, "vol": cnt.astype(np.int64), "same": same})

    percomm = (
        le.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ca")
        .aggregate(Sum("vol", alias_name="vol"), Sum("same", alias_name="same"))
        .materialize()
    )
    e = float(percomm.sum("vol") or 0.0)

    def finalize(t: pa.Table) -> pa.Table:
        vol = t["vol"].to_numpy(zero_copy_only=False).astype(np.int64)
        same = t["same"].to_numpy(zero_copy_only=False).astype(np.int64)
        cut = vol - same
        denom = np.minimum(vol.astype(np.float64), e - vol)
        phi = np.where(
            denom > 0, np.floor((cut / np.where(denom > 0, denom, 1.0)) * 1e6 + 0.5) / 1e6, 0.0
        )
        return pa.table(
            {
                "community": t["ca"],
                "cut": cut,
                "vol": vol,
                "conductance": phi,
            }
        )

    return percomm.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
