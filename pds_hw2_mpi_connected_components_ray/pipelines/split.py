"""Deterministic dataset splitting for training-data prep.

Two operators a 100-TB corpus pipeline needs before training:

- `dataset_split`: pure hash split (train/val/test) -- stateless,
  embarrassingly parallel, stable under re-runs and repartitioning
  (assignment depends only on (seed, doc_id), never on row order or
  block boundaries).
- `group_safe_split`: leakage-safe variant -- every near-duplicate
  FAMILY (connected component of the verified dup-pair graph, the
  engine's `duplicate_groups`) is assigned as a unit via its group
  representative, so eval never contains a near-copy of a training
  document. This is the standard contamination control for web-scale
  training data (cf. the dedup literature in PAPERS.md).

Split assignment mirrors DuckDB exactly for the oracle: the first 15
hex chars of md5(f"{seed}:{key}") as an int60 compared against integer
thresholds floor(ratio * 2^60) -- no float rounding anywhere. Per-row
hashlib is acceptable here for the same reason as exact_dedup's
`_md5_cols` (no vectorized md5 exists; the digest dominates and is
~0.5 us/row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ray.data import Dataset

SPLIT_SCALE = 1 << 60

# Above this many grouped docs the representative map is attached via a
# left-outer hash join instead of a driver broadcast (same adaptive
# pattern as stages.graph degree attach).
_BROADCAST_GROUP_ROWS = 2_000_000


def _split_hash(keys: np.ndarray, seed: int) -> np.ndarray:
    out = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        out[i] = int(hashlib.md5(f"{seed}:{k}".encode()).hexdigest()[:15], 16)
    return out


def split_bounds(train: float, val: float) -> tuple[int, int]:
    """Exact integer thresholds; also used to build the SQL oracle."""
    if not (0 <= train and 0 <= val and train + val <= 1):
        raise ValueError(f"bad ratios train={train} val={val}")
    return int(train * SPLIT_SCALE), int((train + val) * SPLIT_SCALE)


def _assign(ids: np.ndarray, keys: np.ndarray, seed: int, b1: int, b2: int):
    h = _split_hash(keys, seed)
    split = np.where(h < b1, "train", np.where(h < b2, "val", "test"))
    return pd.DataFrame({"doc_id": ids, "split": split})


def dataset_split(
    docs: Dataset,
    *,
    train: float = 0.8,
    val: float = 0.1,
    seed: int = 42,
    id_col: str = "doc_id",
) -> Dataset:
    """(doc_id, split) with split in {train, val, test} by id hash."""
    b1, b2 = split_bounds(train, val)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype=np.int64)
        return _assign(ids, ids, seed, b1, b2)

    return docs.select_columns([id_col]).map_batches(fn, batch_format="pandas")


def group_safe_split(
    docs: Dataset,
    pairs: Dataset,
    *,
    train: float = 0.8,
    val: float = 0.1,
    seed: int = 42,
    id_col: str = "doc_id",
) -> Dataset:
    """(doc_id, split): near-dup families split as a unit.

    `pairs` is a verified duplicate-pair table (a, b) from any of the
    dedup families; the assignment key for a doc in a family is the
    family's min doc id (group representative), its own id otherwise.
    Small representative maps broadcast (one ray.put, no shuffle);
    large ones attach via a left-outer hash join keyed on doc_id.
    """
    from ..stages.joins import broadcast_attach, hash_join, put_lookup
    from .dedup import duplicate_groups

    b1, b2 = split_bounds(train, val)
    ids_ds = docs.select_columns([id_col])

    groups = duplicate_groups(pairs).materialize()  # (doc_id, group_id)
    n_grouped = groups.count()
    if n_grouped == 0:
        with_key = ids_ds.map_batches(
            lambda df: df.assign(_key=df[id_col].astype(np.int64)),
            batch_format="pandas",
        )
    elif n_grouped <= _BROADCAST_GROUP_ROWS:
        import pyarrow as pa

        import ray

        gt = pa.concat_tables(ray.get(groups.to_arrow_refs()))
        ref = put_lookup(gt, "doc_id", "group_id")
        with_key = broadcast_attach(
            ids_ds,
            ref,
            id_col,
            "_key",
            keep_missing=True,
            missing_value=-1,
        ).map_batches(
            lambda df: df.assign(
                _key=np.where(df["_key"] < 0, df[id_col], df["_key"]).astype(np.int64)
            ),
            batch_format="pandas",
        )
    else:
        joined = hash_join(
            ids_ds, groups, on=(id_col,), join_type="left_outer"
        )

        def key_of(df: pd.DataFrame) -> pd.DataFrame:
            gid = df["group_id"]
            key = gid.fillna(df[id_col]).astype(np.int64)
            return pd.DataFrame({id_col: df[id_col].astype(np.int64), "_key": key})

        with_key = joined.map_batches(key_of, batch_format="pandas")

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype=np.int64)
        keys = batch["_key"].to_numpy(dtype=np.int64)
        return _assign(ids, keys, seed, b1, b2)

    return with_key.map_batches(assign, batch_format="pandas")


def stratified_sample(
    docs: Dataset,
    *,
    key: str = "source",
    n_per_group: int = 40,
    seed: int = 7,
    id_col: str = "doc_id",
) -> Dataset:
    """(key, doc_id, rnk): a deterministic n-per-stratum sample — the
    corpus-curation "cap every domain at N docs" operator. Each group's
    sample is the first `n_per_group` rows under (md5-int60(seed:id),
    id): a seeded uniform draw that is reproducible across runs,
    repartitioning, and cluster sizes, and mirrored bit-exactly by the
    SQL oracle (same md5-hex[0:15] integerization as dataset_split).

    Plan: per-batch hash column (embarrassingly parallel) + the
    bucket-per-group window top-k — ONE keyed all-to-all whose fan-in
    scales with the cluster, never with the number of strata."""
    from .window import top_k_per_group

    def add_h(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: ids,
                key: batch[key].astype(str),
                "h": _split_hash(ids, seed),
            }
        )

    hds = docs.select_columns([id_col, key]).map_batches(add_h, batch_format="pandas")
    out = top_k_per_group(
        hds,
        key=key,
        order_cols=["h", id_col],
        k=n_per_group,
        cols=[key, id_col, "h"],
    )
    return out.drop_columns(["h"])


def weighted_sample(
    docs: Dataset,
    *,
    k: int = 100,
    seed: int = 11,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> Dataset:
    """(doc_id, n_chars, s): deterministic weighted sampling WITHOUT
    replacement (Efraimidis–Spirakis A-ES): rank by key u^(1/w) ⇔
    ln(u)/w with u a seeded md5-int60 uniform — here w = max(n_chars,1),
    i.e. token-budget-proportional corpus sampling ("sample docs with
    probability ∝ length"), the data-mixing primitive.

    Determinism: u = md5int60/2^60 is an exact power-of-two division of
    the same integer both sides; the score quantizes to integer
    µ-units before the (s desc, id asc) rank — reproducible across
    runs, repartitioning and cluster sizes, and mirrored bit-exactly by
    the SQL oracle. Embarrassingly parallel except one global
    top-k sort."""
    base = docs.select_columns([id_col, weight_col])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype=np.int64)
        w = np.maximum(batch[weight_col].to_numpy(dtype=np.int64), 1).astype(
            np.float64
        )
        h = np.maximum(_split_hash(ids, seed), 1).astype(np.float64)
        u = h / float(2**60)
        s = np.floor(np.log(u) / w * 1e6 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: ids,
                weight_col: batch[weight_col].to_numpy(dtype=np.int64),
                "s": s,
            }
        )

    return (
        base.map_batches(score, batch_format="pandas")
        .sort(["s", id_col], descending=[True, False])
        .limit(k)
    )


def mixture_sample(docs: Dataset, *, seed: int = 17) -> Dataset:
    """(doc_id, source): a deterministic subsample that EQUALIZES the
    char mass contributed by each source — the data-mixing step of a
    training recipe (don't let one crawl dominate the mix). Each
    source's keep probability is min(1, (T/k)/mass_s) with T the total
    char mass and k the source count; a doc is kept iff its seeded
    md5-int60 uniform falls under the source's integer threshold
    floor(rate·2⁶⁰) — exact integer comparison, reproducible across
    runs/partitionings, and byte-identical in the SQL oracle.

    Plan: one column-pruned pass pre-combines per-source char sums
    (source vocabulary-sized keyed sum); the ≤|sources| thresholds
    broadcast; the filter pass touches only (doc_id, source). Over-
    represented sources downsample toward the equal share;
    under-represented ones pass through whole (rate clamps at 1 —
    upsampling is a separate repeat-k op, not a filter)."""
    import pyarrow as pa

    import ray
    from ray.data.aggregate import Sum

    base = docs.select_columns(["doc_id", "source", "n_chars"])

    def mass_partial(t: pd.DataFrame) -> pd.DataFrame:
        g = t.groupby("source", sort=False)["n_chars"].sum()
        return pd.DataFrame(
            {"source": g.index.astype(str), "m": g.to_numpy(dtype=np.int64)}
        )

    mass = (
        base.map_batches(mass_partial, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("m", alias_name="mass"))
        .materialize()
    )
    rows = []
    for t in mass.iter_batches(batch_format="pandas", batch_size=None):
        rows.append(t)
    mdf = pd.concat(rows, ignore_index=True)
    k = len(mdf)
    total = float(mdf["mass"].sum())
    m = np.maximum(mdf["mass"].to_numpy(dtype=np.float64), 1.0)
    thr = np.minimum(
        np.int64(SPLIT_SCALE),
        np.floor(total / k / m * float(SPLIT_SCALE)).astype(np.int64),
    )
    names = mdf["source"].to_numpy(dtype=str)
    o = np.argsort(names, kind="stable")
    ref = ray.put((names[o], thr[o]))

    def keep(t: pd.DataFrame) -> pd.DataFrame:
        ns, th = ray.get(ref)
        ids = t["doc_id"].to_numpy(dtype=np.int64)
        src = t["source"].to_numpy(dtype=str)
        h = _split_hash(ids, seed)
        lim = th[np.searchsorted(ns, src)]
        sel = h < lim
        return pd.DataFrame({"doc_id": ids[sel], "source": src[sel]})

    return base.map_batches(keep, batch_format="pandas")


def mixture_upsample(docs: Dataset, *, seed: int = 19) -> Dataset:
    """(doc_id, source, copy): the REPETITION side of data mixing —
    under-represented sources are repeated toward the equal char-mass
    share (the "N epochs of the small high-quality corpus" recipe),
    while sources at or above the share emit one copy. Each doc gets
    floor(rate) whole copies plus one more iff its seeded md5-int60
    uniform falls under the fractional remainder's integer threshold —
    exact integer comparison, partition-invariant, byte-identical in
    SQL. Expansion is per-row flat_map-shaped (np.repeat inside the
    batch), so no shuffle is introduced; downstream training_shuffle
    handles order."""
    import pyarrow as pa

    import ray
    from ray.data.aggregate import Sum

    base = docs.select_columns(["doc_id", "source", "n_chars"])

    def mass_partial(t: pd.DataFrame) -> pd.DataFrame:
        g = t.groupby("source", sort=False)["n_chars"].sum()
        return pd.DataFrame(
            {"source": g.index.astype(str), "m": g.to_numpy(dtype=np.int64)}
        )

    mass = (
        base.map_batches(mass_partial, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("m", alias_name="mass"))
        .materialize()
    )
    mdf = pd.concat(
        list(mass.iter_batches(batch_format="pandas", batch_size=None)),
        ignore_index=True,
    )
    k = len(mdf)
    total = float(mdf["mass"].sum())
    m = np.maximum(mdf["mass"].to_numpy(dtype=np.float64), 1.0)
    rate = np.maximum(total / k / m, 1.0)  # never shrink here: ≥ 1 copy
    n_full = np.floor(rate).astype(np.int64)
    frac_thr = np.floor((rate - np.floor(rate)) * float(SPLIT_SCALE)).astype(
        np.int64
    )
    names = mdf["source"].to_numpy(dtype=str)
    o = np.argsort(names, kind="stable")
    ref = ray.put((names[o], n_full[o], frac_thr[o]))

    def expand(t: pd.DataFrame) -> pd.DataFrame:
        ns, nf, ft = ray.get(ref)
        ids = t["doc_id"].to_numpy(dtype=np.int64)
        src = t["source"].to_numpy(dtype=str)
        pos = np.searchsorted(ns, src)
        h = _split_hash(ids, seed)
        copies = nf[pos] + (h < ft[pos])
        out_ids = np.repeat(ids, copies)
        out_src = np.repeat(src, copies)
        # copy index 0..copies-1, vectorized over run boundaries
        total_rows = int(copies.sum())
        starts = np.r_[0, np.cumsum(copies)[:-1]]
        copy_idx = np.arange(total_rows) - np.repeat(starts, copies)
        return pd.DataFrame(
            {
                "doc_id": out_ids,
                "source": out_src,
                "copy": copy_idx.astype(np.int64),
            }
        )

    return base.map_batches(expand, batch_format="pandas")
