"""Distributed Lloyd k-means over an embedding column.

The curation use: cluster a corpus's embeddings to stratify sampling /
spot near-domain groups. Unlike `similarity.kmeans_fit` (a driver-side
helper fit on a SAMPLE to seed IVF), this is the full-dataset
formulation shaped for 100 TB:

- centroids broadcast once per iteration (`ray.put`, k×d doubles);
- assignment + per-cluster partial sums computed per batch (a
  combiner: each batch ships k rows of (count, sum-vector), never the
  points);
- the k×nblocks partial table reduces driver-side (k·d doubles — the
  same "summary, not data" discipline as the CC frontier exchange).

Determinism: init = embeddings of the k smallest vec_ids; assignment
tie-break = lowest centroid id; fixed iteration count (no float
convergence test), so results are reproducible across parallelism and
mirror a fixed-depth unrolled SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

__all__ = ["kmeans_assign"]


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Embedding column -> (n, d) float64 ndarray, no per-row python.

    Handles both physical layouts: plain list<float> (the parquet
    path) and Ray's tensor-extension array (in-memory from_pandas)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(arr)
        return flat.reshape(n, -1) if n else flat.reshape(0, 0)
    rows = arr.to_numpy(zero_copy_only=False)
    if len(rows) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    return np.stack(list(rows)).astype(np.float64)


def kmeans_assign(
    emb: Dataset,
    *,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """(vec_id, cluster) after `iters` Lloyd steps from deterministic
    init (the k lowest-id vectors). Squared-euclidean assignment,
    ties to the lowest cluster id. Empty clusters keep their previous
    centroid (no reseeding -- keeps the SQL mirror exact)."""
    emb = emb.select_columns([id_col, vec_col]).materialize()
    init = emb.sort(id_col).limit(k).to_pandas()
    cent = np.stack(init[vec_col].to_numpy()).astype(np.float64)

    def assign_of(X: np.ndarray, C: np.ndarray) -> np.ndarray:
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin ties -> lowest id
        d = (
            (X * X).sum(axis=1, keepdims=True)
            - 2.0 * (X @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )
        return d.argmin(axis=1)

    for _ in range(iters):
        ref = ray.put(cent)

        def partials(t: pa.Table) -> pa.Table:
            C = ray.get(ref)
            X = _to_matrix(t[vec_col])
            a = assign_of(X, C)
            kk, dd = C.shape
            sums = np.zeros((kk, dd), dtype=np.float64)
            np.add.at(sums, a, X)
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            return pa.table(
                {
                    "c": np.arange(kk, dtype=np.int64),
                    "n": cnt,
                    "s": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.ravel(), pa.float64()), dd
                    ),
                }
            )

        part = emb.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()  # k rows per block -- summary-sized by design
        dd = cent.shape[1]
        sums = np.zeros((k, dd), dtype=np.float64)
        cnts = np.zeros(k, dtype=np.int64)
        for c, n, s in zip(part["c"], part["n"], part["s"]):
            sums[int(c)] += np.asarray(s, dtype=np.float64)
            cnts[int(c)] += int(n)
        nonempty = cnts > 0
        cent = cent.copy()
        cent[nonempty] = sums[nonempty] / cnts[nonempty, None]

    ref = ray.put(cent)

    def final_assign(t: pa.Table) -> pa.Table:
        C = ray.get(ref)
        X = _to_matrix(t[vec_col])
        a = assign_of(X, C)
        return pa.table(
            {
                id_col: t[id_col]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False),
                "cluster": a.astype(np.int64),
            }
        )

    return emb.map_batches(final_assign, batch_format="pyarrow", zero_copy_batch=True)
