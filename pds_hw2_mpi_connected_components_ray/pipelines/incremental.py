"""Incremental connected components: fold a delta edge batch into an
existing label fixpoint at O(delta) exchange cost.

The 100-TB operating mode for a link graph is not "resolve from
scratch nightly" — it is "yesterday's labels + today's crawl delta".
Given `base_labels`, a valid CC fixpoint (canonical min-vertex-id
labels, the invariant every solver mode in pipelines.cc converges to
and the oracle checks), and `delta_edges`, new undirected edges:

1. restrict base labels to the delta's endpoint set (one STREAMING
   filter pass over base labels against a broadcast delta-vertex set —
   no shuffle; endpoints absent from the base are new vertices and
   label themselves);
2. contract: each delta edge becomes a (label_a, label_b) edge between
   base components — a delta-proportional edge set;
3. solve CC on the contracted graph with the engine's own solver (it
   is delta-sized, so the local mode handles it);
4. compose: one streaming relabel pass over base labels through the
   broadcast contracted root map (labels untouched by the delta pass
   through), plus label rows for the new vertices.

Every exchange is delta-proportional; the two full passes over base
labels (restrict, relabel) stream with no all-to-all. Correctness: if
base labels are component-min fixpoints, the contracted CC assigns
each merged group min(mins) = the union graph's component min, so the
composed labels equal a from-scratch solve on base ∪ delta — which is
exactly what the oracle asserts.

Above `broadcast_threshold` delta vertices the broadcast legs switch
to hash joins (restrict via inner join on vertex; relabel via
left-outer join on label) — same results, all-to-all cost, for the
"delta is not small" regime.

Reference anchor: the relaxation semantics are the reference kernel's
(/root/reference/src/connected_components.c:109-128); incremental
maintenance itself has no reference analogue (its trial loop recomputes
from scratch, /root/reference/src/benchmark.c:247-266).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from .cc import CCResult, component_count, connected_components

__all__ = ["cc_incremental"]


def _delta_vertex_array(delta_edges: Dataset) -> np.ndarray:
    """Sorted distinct endpoint ids of the delta (delta-sized)."""

    def ends(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return pa.table({"v": np.unique(np.concatenate([s, d]))})

    col = (
        delta_edges.map_batches(ends, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()["v"]  # delta-sized by contract
        .to_numpy(dtype=np.int64)
    )
    return np.unique(col)


def cc_incremental(
    base_labels: Dataset,
    delta_edges: Dataset,
    *,
    broadcast_threshold: int = 2_000_000,
) -> CCResult:
    """Labels of CC(base ∪ delta) from a base fixpoint + delta edges."""
    delta_edges = delta_edges.materialize()
    dv = _delta_vertex_array(delta_edges)
    use_broadcast = len(dv) <= broadcast_threshold

    if use_broadcast:
        dv_ref = ray.put(dv)

        def restrict(t: pa.Table) -> pa.Table:
            vs = ray.get(dv_ref)
            v = t["vertex"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            idx = np.searchsorted(vs, v)
            idx_c = np.minimum(idx, max(len(vs) - 1, 0))
            hit = (vs[idx_c] == v) if len(vs) else np.zeros(len(v), dtype=bool)
            return t.take(np.nonzero(hit)[0])

        touched = base_labels.map_batches(
            restrict, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()  # ≤ |delta vertices| rows
        if "vertex" in touched.columns:
            # vectorized (vertex -> base label) map over sorted dv:
            kv = touched.sort_values("vertex")
            kkeys = kv["vertex"].to_numpy(dtype=np.int64)
            kvals = kv["label"].to_numpy(dtype=np.int64)
        else:  # zero delta endpoints known to the base: schema-less empty
            kkeys = np.empty(0, dtype=np.int64)
            kvals = np.empty(0, dtype=np.int64)
        lab_ref = ray.put((kkeys, kvals))

        def contract(t: pa.Table) -> pa.Table:
            kk, vv = ray.get(lab_ref)

            def f(x: np.ndarray) -> np.ndarray:
                if len(kk) == 0:
                    return x
                i = np.searchsorted(kk, x)
                ic = np.minimum(i, len(kk) - 1)
                return np.where(kk[ic] == x, vv[ic], x)

            s = f(t["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False))
            d = f(t["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False))
            keep = s != d
            s, d = s[keep], d[keep]
            both = np.unique(
                np.stack([np.concatenate([s, d]), np.concatenate([d, s])], axis=1),
                axis=0,
            )
            return pa.table({"src": both[:, 0], "dst": both[:, 1]})

        # per-batch np.unique only dedups within a batch; cross-batch
        # duplicates are harmless (hash-min is idempotent under dups,
        # like the reference converter's kept duplicates,
        # mtx_to_bin.c:303-317)
        contracted = delta_edges.map_batches(
            contract, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    else:
        from ..stages.joins import hash_join

        lab = base_labels
        a = hash_join(
            delta_edges,
            lab.map_batches(
                lambda df: pd.DataFrame(
                    {"src": df["vertex"], "_la": df["label"]}
                ),
                batch_format="pandas",
            ),
            on=("src",),
            join_type="left_outer",
        )
        b = hash_join(
            a,
            lab.map_batches(
                lambda df: pd.DataFrame(
                    {"dst": df["vertex"], "_lb": df["label"]}
                ),
                batch_format="pandas",
            ),
            on=("dst",),
            join_type="left_outer",
        )

        def to_contracted(df: pd.DataFrame) -> pd.DataFrame:
            la = df["_la"].fillna(df["src"]).astype(np.int64).to_numpy()
            lb = df["_lb"].fillna(df["dst"]).astype(np.int64).to_numpy()
            keep = la != lb
            la, lb = la[keep], lb[keep]
            return pd.DataFrame(
                {
                    "src": np.concatenate([la, lb]),
                    "dst": np.concatenate([lb, la]),
                }
            )

        from ..stages.graph import dedup_edges

        contracted = dedup_edges(
            b.map_batches(to_contracted, batch_format="pandas")
        ).materialize()

    if contracted.count() == 0:
        # delta adds no inter-component edge: only new vertices appear
        merged_roots: dict[int, int] = {}
        sub_supersteps = 0
    else:
        sub = connected_components(contracted, mode="auto")
        rt = sub.labels.to_pandas()  # distinct contracted labels: delta-sized
        merged_roots = dict(
            zip(
                rt["vertex"].to_numpy(dtype=np.int64),
                rt["label"].to_numpy(dtype=np.int64),
            )
        )
        sub_supersteps = sub.supersteps

    rk = np.fromiter(merged_roots.keys(), dtype=np.int64, count=len(merged_roots))
    order = np.argsort(rk)
    rk = rk[order]
    rv = np.fromiter(merged_roots.values(), dtype=np.int64, count=len(merged_roots))[
        order
    ]
    root_ref = ray.put((rk, rv))

    def relabel(t: pa.Table) -> pa.Table:
        kk, vv = ray.get(root_ref)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        if len(kk):
            i = np.searchsorted(kk, lab)
            ic = np.minimum(i, len(kk) - 1)
            lab = np.where(kk[ic] == lab, vv[ic], lab)
        return pa.table(
            {
                "vertex": t["vertex"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False),
                "label": lab,
            }
        )

    relabeled = base_labels.map_batches(
        relabel, batch_format="pyarrow", zero_copy_batch=True
    )

    # new vertices (in delta, absent from base): label = root(v) or v
    if use_broadcast:
        if len(dv):
            # membership of dv in the base label table:
            i = np.searchsorted(kkeys, dv) if len(kkeys) else np.zeros(0, int)
            if len(kkeys):
                ic = np.minimum(i, len(kkeys) - 1)
                known_mask = kkeys[ic] == dv
            else:
                known_mask = np.zeros(len(dv), dtype=bool)
            newv = dv[~known_mask]
        else:
            newv = dv
        if len(newv):
            nl = newv.copy()
            if len(rk):
                i = np.searchsorted(rk, nl)
                ic = np.minimum(i, len(rk) - 1)
                nl = np.where(rk[ic] == nl, rv[ic], nl)
            import ray.data as rd

            relabeled = relabeled.union(
                rd.from_pandas(pd.DataFrame({"vertex": newv, "label": nl}))
            )
    else:
        from ..stages.joins import hash_join

        import ray.data as rd

        dvds = rd.from_pandas(pd.DataFrame({"vertex": dv})) if len(dv) else None
        if dvds is not None:
            missing = hash_join(
                dvds,
                base_labels.map_batches(
                    lambda df: pd.DataFrame({"vertex": df["vertex"], "_seen": 1}),
                    batch_format="pandas",
                ),
                on=("vertex",),
                join_type="left_outer",
            ).map_batches(
                lambda df: pd.DataFrame(
                    {"vertex": df.loc[df["_seen"].isna(), "vertex"].astype(np.int64)}
                ),
                batch_format="pandas",
            )

            def new_labels(t: pa.Table) -> pa.Table:
                kk, vv = ray.get(root_ref)
                v = t["vertex"].to_numpy(zero_copy_only=False).astype(
                    np.int64, copy=False
                )
                lab = v.copy()
                if len(kk):
                    i = np.searchsorted(kk, lab)
                    ic = np.minimum(i, len(kk) - 1)
                    lab = np.where(kk[ic] == lab, vv[ic], lab)
                return pa.table({"vertex": v, "label": lab})

            relabeled = relabeled.union(
                missing.map_batches(
                    new_labels, batch_format="pyarrow", zero_copy_batch=True
                )
            )

    labels = relabeled.materialize()
    return CCResult(
        labels=labels,
        supersteps=sub_supersteps,
        n_components=component_count(labels),
        mode="incremental",
    )
