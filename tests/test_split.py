"""Deterministic train/val/test split operators."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

import pds_hw2_mpi_connected_components_ray.pipelines.split as split_mod
from pds_hw2_mpi_connected_components_ray.pipelines.split import (
    dataset_split,
    group_safe_split,
    split_bounds,
)


def _docs(n=2000):
    return rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": ["x"] * n})
    )


def test_split_proportions_and_determinism(ray_session):
    out = dataset_split(_docs(), train=0.8, val=0.1, seed=42).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03
    again = dataset_split(_docs(), train=0.8, val=0.1, seed=42).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )
    # different seed -> different assignment (at least somewhere)
    other = dataset_split(_docs(), train=0.8, val=0.1, seed=7).to_pandas()
    merged = out.merge(other, on="doc_id")
    assert (merged["split_x"] != merged["split_y"]).any()


def test_split_stable_under_repartition(ray_session):
    docs = _docs(500)
    a = dataset_split(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        dataset_split(docs.repartition(13))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_split_bad_ratios():
    with pytest.raises(ValueError):
        split_bounds(0.9, 0.2)


def _family_fixture():
    docs = _docs(200)
    # two families: {3, 17, 50} and {80, 81}
    pairs = rd.from_pandas(
        pd.DataFrame({"a": [3, 17, 80], "b": [17, 50, 81]}).astype(np.int64)
    )
    return docs, pairs


def test_group_safe_split_families_stay_together(ray_session):
    docs, pairs = _family_fixture()
    out = group_safe_split(docs, pairs, seed=42).to_pandas().set_index("doc_id")
    assert len(out) == 200
    assert len({out.loc[i, "split"] for i in (3, 17, 50)}) == 1
    assert len({out.loc[i, "split"] for i in (80, 81)}) == 1
    # ungrouped docs match the plain hash split
    plain = dataset_split(docs, seed=42).to_pandas().set_index("doc_id")
    ungrouped = [i for i in range(200) if i not in (3, 17, 50, 80, 81)]
    assert (out.loc[ungrouped, "split"] == plain.loc[ungrouped, "split"]).all()
    # family assignment = representative's hash split
    assert out.loc[3, "split"] == plain.loc[3, "split"]
    assert out.loc[80, "split"] == plain.loc[80, "split"]


def test_group_safe_split_join_path_matches_broadcast(ray_session, monkeypatch):
    docs, pairs = _family_fixture()
    via_broadcast = (
        group_safe_split(docs, pairs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    monkeypatch.setattr(split_mod, "_BROADCAST_GROUP_ROWS", 0)
    via_join = (
        group_safe_split(docs, pairs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_broadcast, via_join)


def test_group_safe_split_no_pairs(ray_session):
    docs = _docs(50)
    empty = rd.from_pandas(
        pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")})
    )
    out = group_safe_split(docs, empty).to_pandas().sort_values("doc_id")
    plain = dataset_split(docs).to_pandas().sort_values("doc_id")
    assert (out["split"].to_numpy() == plain["split"].to_numpy()).all()

def test_weighted_sample_brute(ray_session):
    import hashlib
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.split import weighted_sample

    rng = np.random.RandomState(13)
    n = 300
    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "n_chars": rng.randint(1, 5000, n).astype(np.int64),
            }
        )
    )
    out = weighted_sample(docs, k=25, seed=11).to_pandas().reset_index(drop=True)

    rows = []
    for i in range(n):
        h = max(int(hashlib.md5(f"11:{i}".encode()).hexdigest()[:15], 16), 1)
        u = h / 2**60
        w = max(int(docs.take_all()[i]["n_chars"]), 1)
        rows.append((i, math.floor(math.log(u) / w * 1e6 + 0.5)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    exp_ids = [r[0] for r in rows[:25]]
    assert list(out["doc_id"]) == exp_ids
    # longer docs are sampled more: top-25 mean length >> corpus mean
    lens = docs.to_pandas().set_index("doc_id")["n_chars"]
    assert lens.loc[exp_ids].mean() > lens.mean()


def test_weighted_sample_deterministic_across_partitioning(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.split import weighted_sample

    df = pd.DataFrame(
        {
            "doc_id": np.arange(120, dtype=np.int64),
            "n_chars": (np.arange(120) % 17 + 1).astype(np.int64),
        }
    )
    a = weighted_sample(rd.from_pandas(df), k=10).to_pandas()
    b = weighted_sample(rd.from_pandas(df).repartition(7), k=10).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_mixture_sample_equalizes(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.split import mixture_sample

    rng = np.random.default_rng(37)
    # source 'big' has ~10x the char mass of 'small'
    n_big, n_small = 2000, 200
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n_big + n_small, dtype=np.int64),
            "source": ["big"] * n_big + ["small"] * n_small,
            "n_chars": np.r_[
                rng.integers(50, 150, n_big), rng.integers(50, 150, n_small)
            ].astype(np.int64),
        }
    )
    ds = rd.from_pandas([df.iloc[i::4] for i in range(4)])
    out = mixture_sample(ds, seed=17).to_pandas()

    kept_small = (out["source"] == "small").sum()
    assert kept_small == n_small  # under-represented passes whole
    # over-represented source downsamples toward the equal share:
    # expected keep rate = (T/2)/mass_big
    mass = df.groupby("source")["n_chars"].sum()
    rate = (mass.sum() / 2) / mass["big"]
    kept_big = (out["source"] == "big").sum()
    assert abs(kept_big / n_big - rate) < 0.05
    # determinism + partitioning invariance
    ds2 = rd.from_pandas([df.iloc[i::7] for i in range(7)])
    out2 = mixture_sample(ds2, seed=17).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_mixture_upsample_epochs(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pds_hw2_mpi_connected_components_ray.pipelines.split import mixture_upsample

    rng = np.random.default_rng(43)
    n_big, n_small = 1800, 200
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n_big + n_small, dtype=np.int64),
            "source": ["big"] * n_big + ["small"] * n_small,
            "n_chars": np.full(n_big + n_small, 100, dtype=np.int64),
        }
    )
    ds = rd.from_pandas([df.iloc[i::4] for i in range(4)])
    out = mixture_upsample(ds, seed=19).to_pandas()

    # big source is at/above the share -> exactly one copy each
    big = out[out["source"] == "big"]
    assert len(big) == n_big and (big["copy"] == 0).all()
    # small source: rate = (T/2)/mass_small = 5.0 exactly -> 5 copies
    small = out[out["source"] == "small"]
    per = small.groupby("doc_id").size()
    assert len(per) == n_small
    rate = (100.0 * (n_big + n_small) / 2) / (100.0 * n_small)
    assert per.min() >= int(np.floor(rate)) and per.max() <= int(np.ceil(rate))
    # copy indices are 0..k-1 per doc
    mx = small.groupby("doc_id")["copy"].max()
    assert (mx.to_numpy() == per.to_numpy() - 1).all()
    # partition invariance
    ds2 = rd.from_pandas([df.iloc[i::7] for i in range(7)])
    out2 = mixture_upsample(ds2, seed=19).to_pandas()
    key = lambda d: sorted(map(tuple, d[["doc_id", "copy"]].to_numpy()))
    assert key(out) == key(out2)
