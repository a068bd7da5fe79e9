"""Distributed Lloyd k-means vs a sequential numpy reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.pipelines.kmeans import kmeans_assign


def _ref(X, k, iters):
    cent = X[:k].astype(np.float64).copy()

    def assign(C):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)

    for _ in range(iters):
        a = assign(cent)
        for c in range(k):
            m = X[a == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    return assign(cent)


@pytest.mark.parametrize("iters", [1, 3])
def test_kmeans_matches_reference(ray_session, iters):
    rng = np.random.default_rng(17)
    # well-separated blobs so float-order eps cannot flip assignments
    centers = rng.normal(0, 10, size=(4, 8))
    X = np.concatenate(
        [centers[i] + rng.normal(0, 0.5, size=(50, 8)) for i in range(4)]
    )
    order = rng.permutation(len(X))
    X = X[order]
    ds = rd.from_pandas(
        [
            pd.DataFrame(
                {
                    "vec_id": np.arange(len(X), dtype=np.int64)[i::5],
                    "embedding": list(X[i::5].astype(np.float32)),
                }
            )
            for i in range(5)
        ]
    )
    out = kmeans_assign(ds, k=4, iters=iters).to_pandas().sort_values("vec_id")
    exp = _ref(
        np.stack(
            pd.concat(
                [
                    pd.DataFrame(
                        {
                            "vec_id": np.arange(len(X), dtype=np.int64)[i::5],
                            "embedding": list(X[i::5].astype(np.float32)),
                        }
                    )
                    for i in range(5)
                ]
            )
            .sort_values("vec_id")["embedding"]
            .to_numpy()
        ).astype(np.float64),
        4,
        iters,
    )
    assert (out["cluster"].to_numpy() == exp).all()


def test_kmeans_deterministic_across_block_splits(ray_session):
    rng = np.random.default_rng(23)
    X = rng.normal(size=(300, 16)).astype(np.float32)
    outs = []
    for ns in (2, 7):
        ds = rd.from_pandas(
            [
                pd.DataFrame(
                    {
                        "vec_id": np.arange(300, dtype=np.int64)[i::ns],
                        "embedding": list(X[i::ns]),
                    }
                )
                for i in range(ns)
            ]
        )
        outs.append(
            kmeans_assign(ds, k=5, iters=2)
            .to_pandas()
            .sort_values("vec_id")["cluster"]
            .to_numpy()
        )
    assert (outs[0] == outs[1]).all()


def test_label_centroids_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.kmeans import label_centroids

    rng = np.random.RandomState(2)
    n, dim = 120, 8
    vecs = rng.randn(n, dim).astype(np.float32)
    labels = rng.randint(0, 4, n).astype(np.int64)
    emb = rd.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": list(vecs),
                "label": labels,
            }
        )
    )
    out = label_centroids(emb, dim=dim).to_pandas().set_index("label").sort_index()
    for lab in range(4):
        sel = vecs[labels == lab].astype(np.float64)
        q = np.floor(sel * 1e6 + 0.5).astype(np.int64)
        mean = q.sum(axis=0) / (len(sel) * 1e6)
        mq = np.floor(mean * 1e6 + 0.5).astype(np.int64)
        norm = np.round(np.sqrt(float((mq * mq).sum())) / 1e6, 6)
        assert out.loc[lab, "n_vecs"] == len(sel)
        assert out.loc[lab, "centroid_norm"] == norm
