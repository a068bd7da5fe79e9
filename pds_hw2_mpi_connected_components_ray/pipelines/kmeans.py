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
    # deterministic init = the k lowest-id vectors, WITHOUT a global
    # sort (ADVICE r3): each block ships its own k smallest rows (a
    # combiner), the driver merges <= k*nblocks rows and keeps k.

    def k_min_ids(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if len(ids) <= k:
            return t
        keep = np.argpartition(ids, k)[:k]
        return t.take(pa.array(np.sort(keep)))

    init = (
        emb.map_batches(k_min_ids, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values(id_col, kind="stable")
        .head(k)
    )
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
        # float64 partials are reduced in a DETERMINISTIC order (sort by
        # cluster id, count, then sum-vector bytes) so the centroid is
        # partition-arrival-order invariant run to run. The SQL oracle's
        # avg() may still differ by float-association ~1ulp; an exact
        # distance tie at that scale is the documented oracle tolerance
        # (ADVICE r3) -- never observed at the gate's data scales.
        part = part.assign(_sb=[np.asarray(s, dtype=np.float64).tobytes() for s in part["s"]])
        part = part.sort_values(["c", "n", "_sb"], kind="stable")
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


def label_centroids(emb: Dataset, *, dim: int | None = None) -> Dataset:  # noqa: ARG001 -- dim kept for API compat; width now read per batch
    """(label, n_vecs, centroid_norm): per-label mean-embedding norms —
    the class-centroid primitive behind embedding-space data curation
    (cluster quality checks, centroid-distance outlier pruning).

    Determinism contract (the bigram_surprisal integer-quantization
    pattern, applied per coordinate): every element is quantized to
    integer micro-units BEFORE summation, so per-(label, coordinate)
    sums are exact int64 in any order; the mean re-quantizes and the
    norm is sqrt of an exact integer sum of squares — the only
    irrational op is the final sqrt, which numpy/DuckDB agree on
    bit-for-bit. Reduction volume is labels × dim rows (vocabulary-
    sized), never the corpus.

    Exchange: (label, ord) packs into one int64 key (ord < 2^20) fed
    to the bucketed group-sum — one hash exchange over labels×dim-row
    partials instead of Ray's sort-based keyed aggregate (measured 7 s
    -> ~1 s on the 640-group bench shape)."""
    from ..stages.skew import bucketed_group_sum

    _B = 1 << 20  # packing base: dim (ord) fits in 20 bits

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e = np.array([], dtype=np.int64)
            return pa.table({"k": e, "s": e, "n": e})
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _to_matrix(t["embedding"])
        d = mat.shape[1]
        q = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        lab_s, q_s = lab[order], q[order]
        b = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
        sums = np.add.reduceat(q_s, b, axis=0)
        cnt = np.diff(np.r_[b, len(lab_s)]).astype(np.int64)
        nl = len(b)
        key = np.repeat(lab_s[b] * _B, d) + np.tile(
            np.arange(1, d + 1, dtype=np.int64), nl
        )
        return pa.table({"k": key, "s": sums.ravel(), "n": np.repeat(cnt, d)})

    per = bucketed_group_sum(
        emb.select_columns(["label", "embedding"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "k",
        "s",
        extra="n",
    ).to_pandas()  # labels x dim rows -- vocabulary-sized by construction
    if len(per) == 0:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame(
                {
                    "label": pd.Series([], dtype="int64"),
                    "n_vecs": pd.Series([], dtype="int64"),
                    "centroid_norm": pd.Series([], dtype="float64"),
                }
            )
        )
    mean = per["s"].to_numpy(dtype=np.float64) / (per["n"].to_numpy(dtype=np.float64) * 1e6)
    mq = np.floor(mean * 1e6 + 0.5).astype(np.int64)
    out = pd.DataFrame(
        {"label": per["k"].to_numpy() // _B, "mq2": mq * mq, "n": per["n"]}
    )
    g = out.groupby("label", sort=True).agg(n_vecs=("n", "first"), ss=("mq2", "sum"))
    g = g.reset_index()
    res = pd.DataFrame(
        {
            "label": g["label"].astype(np.int64),
            "n_vecs": g["n_vecs"].astype(np.int64),
            "centroid_norm": np.round(np.sqrt(g["ss"].to_numpy(dtype=np.float64)) / 1e6, 6),
        }
    )
    import ray.data as rd

    return rd.from_pandas(res)
