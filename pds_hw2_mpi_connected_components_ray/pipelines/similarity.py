"""Similarity search over an embedding column (list<float>).

- knn_brute: exact cosine top-k. The query matrix is broadcast ONCE via
  ray.put; every batch does one numpy matmul against it and emits a
  per-batch partial top-k (a combiner); partials merge in a final tiny
  reduction. Scales linearly in corpus size with zero shuffles.
- knn_ivf: IVF-style bucketed ANN: deterministic k-means (seeded, fixed
  iterations) trains centroids on a sample, vectors are assigned to
  their nearest centroid (one pass), queries probe the nprobe nearest
  lists. The scale path: probe cost ~ nprobe/nlist of brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


class _BruteScore:
    """Per-batch cosine scoring against the broadcast query matrix,
    emitting a per-batch top-k partial."""

    def __init__(self, ref, k: int, id_col: str, vec_col: str):
        self._ref = ref
        self._state = None
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self._state is None:
            self._state = ray.get(self._ref)
        qids, qmat = self._state  # qmat normalized (q, d)
        ids = batch[self.id_col].to_numpy(dtype=np.int64)
        vecs = _normalize(np.stack(batch[self.vec_col].to_numpy()).astype(np.float64))
        sims = qmat @ vecs.T  # (q, batch)
        k = min(self.k + 1, sims.shape[1])  # +1 to survive self-hit removal
        part = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        rows_q, rows_n, rows_s = [], [], []
        for qi in range(len(qids)):
            idx = part[qi]
            rows_q.extend([qids[qi]] * len(idx))
            rows_n.extend(ids[idx].tolist())
            rows_s.extend(sims[qi, idx].tolist())
        return pd.DataFrame(
            {
                "query_id": np.array(rows_q, dtype=np.int64),
                "neighbor_id": np.array(rows_n, dtype=np.int64),
                "cosine": rows_s,
            }
        )


def knn_brute(
    embeddings: Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact cosine top-k for each query. Returns a small DataFrame
    (query_id, neighbor_id, cosine, rank) with deterministic tie-break
    (cosine desc, neighbor_id asc)."""
    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat))
    partials = embeddings.select_columns([id_col, vec_col]).map_batches(
        _BruteScore(ref, k, id_col, vec_col), batch_format="pandas"
    )
    allp = partials.to_pandas()  # q * (k+1) * nblocks rows: small
    if exclude_self:
        allp = allp[allp["query_id"] != allp["neighbor_id"]]
    allp = allp.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    allp = allp.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    allp["rank"] = allp.groupby("query_id").cumcount() + 1
    return allp


def kmeans_fit(
    sample: np.ndarray, nlist: int, *, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic seeded k-means (fixed iterations) on normalized rows."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cent[c] = v / norm
    return cent


def knn_ivf(
    embeddings: Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """IVF-bucketed approximate top-k: probe only the `nprobe` nearest
    inverted lists per query. Recall < 1.0 by design; at scale nlist ~
    sqrt(n) and assignment becomes a persisted partitioned layout."""
    sample = embeddings.select_columns([vec_col]).limit(sample_size).to_pandas()
    cent = kmeans_fit(np.stack(sample[vec_col].to_numpy()), nlist)
    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probes = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]  # (q, nprobe)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat, cent, probes))

    class _IVFScore:
        def __init__(self):
            self.state = None

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if self.state is None:
                self.state = ray.get(ref)
            qids, qm, cen, prb = self.state
            ids = batch[id_col].to_numpy(dtype=np.int64)
            vecs = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            assign = (vecs @ cen.T).argmax(axis=1)  # list id per vector
            rows_q, rows_n, rows_s = [], [], []
            for qi in range(len(qids)):
                mask = np.isin(assign, prb[qi])
                if not mask.any():
                    continue
                sims = qm[qi] @ vecs[mask].T
                sel_ids = ids[mask]
                kk = min(k + 1, len(sel_ids))
                idx = np.argpartition(-sims, kth=kk - 1)[:kk]
                rows_q.extend([qids[qi]] * len(idx))
                rows_n.extend(sel_ids[idx].tolist())
                rows_s.extend(sims[idx].tolist())
            return pd.DataFrame(
                {
                    "query_id": np.array(rows_q, dtype=np.int64),
                    "neighbor_id": np.array(rows_n, dtype=np.int64),
                    "cosine": rows_s,
                }
            )

    from ..context import default_parallelism

    partials = embeddings.select_columns([id_col, vec_col]).map_batches(
        _IVFScore, batch_format="pandas", concurrency=(1, max(2, default_parallelism()))
    )
    allp = partials.to_pandas()
    if exclude_self:
        allp = allp[allp["query_id"] != allp["neighbor_id"]]
    allp = allp.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    allp = allp.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    allp["rank"] = allp.groupby("query_id").cumcount() + 1
    return allp
