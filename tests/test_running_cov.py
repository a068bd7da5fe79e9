"""Brute-force checks: per-user running totals (cumulative window
function) and the distributed embedding covariance (X^T·X with
integer-quantized terms)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def test_running_totals_brute(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.events import running_totals

    rng = np.random.default_rng(13)
    n = 600
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 40, size=n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10**6, size=n), unit="s"
            ).astype("datetime64[us]"),
            "value": np.round(rng.uniform(-5, 50, size=n), 2),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    out = (
        running_totals(ds)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    w = df.copy()
    w["cents"] = np.floor(w["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    w = w.sort_values(["user_id", "ts", "event_id"], kind="stable")
    w["running"] = w.groupby("user_id")["cents"].cumsum()
    w = w.sort_values("event_id").reset_index(drop=True)
    assert len(out) == n
    assert np.array_equal(out["event_id"].to_numpy(), w["event_id"].to_numpy())
    assert np.array_equal(out["running_cents"].to_numpy(), w["running"].to_numpy())


def test_embedding_covariance_brute(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
        embedding_covariance,
    )

    rng = np.random.default_rng(21)
    n, d = 150, 6
    x = rng.normal(size=(n, d)).astype(np.float32)
    tab = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
        }
    )
    # batch_size smaller than the table → several partials must combine
    out = embedding_covariance(
        rd.from_arrow(tab).repartition(3), batch_size=32
    ).to_pandas()
    assert len(out) == d * (d + 1) // 2

    xf = x.astype(np.float64)
    got = {(int(r.i), int(r.j)): float(r.cov) for r in out.itertuples()}
    for i in range(d):
        for j in range(i, d):
            sij = float(np.floor(xf[:, i] * xf[:, j] * 1e9 + 0.5).astype(np.int64).sum())
            si = float(np.floor(xf[:, i] * 1e9 + 0.5).astype(np.int64).sum())
            sj = float(np.floor(xf[:, j] * 1e9 + 0.5).astype(np.int64).sum())
            want = (
                np.floor(
                    (sij / n / 1e9 - (si / n / 1e9) * (sj / n / 1e9)) * 1e6 + 0.5
                )
                / 1e6
            )
            assert got[(i, j)] == want
            # sanity: quantized pipeline ≈ true covariance
            true = float(np.mean(xf[:, i] * xf[:, j]) - xf[:, i].mean() * xf[:, j].mean())
            assert abs(got[(i, j)] - true) < 1e-4


def test_new_users_per_window_brute(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.events import (
        new_users_per_window,
    )

    rng = np.random.default_rng(29)
    n = 500
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 60, size=n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 48 * 3600, size=n), unit="s"
            ).astype("datetime64[us]"),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    out = (
        new_users_per_window(ds)
        .to_pandas()
        .sort_values("win")
        .reset_index(drop=True)
    )
    w = df.copy()
    w["t"] = w["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    first = w.groupby("user_id")["t"].min()
    want = (
        (first // 3_600_000_000)
        .value_counts()
        .rename_axis("win")
        .reset_index(name="n_new_users")
        .sort_values("win")
        .reset_index(drop=True)
    )
    assert np.array_equal(out["win"].to_numpy(), want["win"].to_numpy())
    assert np.array_equal(
        out["n_new_users"].to_numpy(), want["n_new_users"].to_numpy()
    )
    # every user is new exactly once
    assert out["n_new_users"].sum() == df["user_id"].nunique()


def test_embedding_project_brute(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
        embedding_project,
        projection_matrix,
    )

    rng = np.random.default_rng(33)
    n, d = 60, 8
    x = rng.normal(size=(n, d)).astype(np.float32)
    tab = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
        }
    )
    out = embedding_project(
        rd.from_arrow(tab).repartition(3), out_dims=2, batch_size=16
    ).to_pandas()
    assert len(out) == 2 * n
    p = projection_matrix(d, 2)
    xf = x.astype(np.float64)
    q = np.floor(xf[:, :, None] * p[None, :, :] * 1e9 + 0.5).astype(np.int64)
    want = np.floor(q.sum(axis=1).astype(np.float64) / 1e9 * 1e6 + 0.5) / 1e6
    got = out.sort_values(["vec_id", "dim"])["y"].to_numpy().reshape(n, 2)
    assert np.array_equal(got, want)
    # projection matrix is deterministic and in [-0.5, 0.5)
    assert np.array_equal(p, projection_matrix(d, 2))
    assert (p >= -0.5).all() and (p < 0.5).all()


def test_embedding_quantize_brute(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.similarity import (
        embedding_quantize,
    )

    rng = np.random.default_rng(61)
    n, d = 80, 5
    x = rng.normal(size=(n, d)).astype(np.float32)
    x[:, 3] = 7.0  # constant dimension -> q must be 0 everywhere
    tab = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
        }
    )
    out = embedding_quantize(
        rd.from_arrow(tab).repartition(4), batch_size=16
    ).to_pandas()
    assert len(out) == n * d
    got = out.set_index(["vec_id", "dim"])["q"]
    xf = x.astype(np.float64)
    lo, hi = xf.min(axis=0), xf.max(axis=0)
    for i in range(n):
        for j in range(d):
            if hi[j] > lo[j]:
                want = min(255, int(np.floor((xf[i, j] - lo[j]) / ((hi[j] - lo[j]) / 255.0))))
            else:
                want = 0
            assert got[(i, j)] == want
    # range sanity: 0..255, extremes hit
    assert got.min() == 0 and got.max() == 255
    assert (out.loc[out["dim"] == 3, "q"] == 0).all()
