"""Streaming-shaped operators over the ordered events log.

Ray Data has no event-time windowing; the batch formulation treats the
events table as a partitioned log: windows are pure column derivations
(tumbling = integer-divide the microsecond epoch); as-of joins and
sessions hash-bucket users into ~parallelism-sized groups, sort each
bucket ONCE by (user, ts, event_id) and compute shifts / gap-islands
vectorized over run boundaries (ordering assumption: within one user,
(ts, event_id) is a total order -- the stated tiebreak makes results
deterministic). Round 2 used groupby(user).map_groups -- one pandas
group PER USER, the many-tiny-groups overhead the dedup path measured
(127 s for 195k groups) and engineered around; one group per hash
bucket does the same work in a single vectorized pass."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..context import default_parallelism, exchange_partitions

US_PER_HOUR = 3_600_000_000
US_30_MIN = 1_800_000_000


def _bucket_by_key(ds: Dataset, by: str, cols: list[str]) -> Dataset:
    """Project to `cols` and add a `_kb` hash-bucket column over `by`.

    Bucket count ~ cluster parallelism (not per-key): the downstream
    groupby("_kb") creates one group per BUCKET, each holding many
    complete users -- the keyed all-to-all is one shuffle whose fan-in
    scales with the cluster, never with the key cardinality."""
    nb = max(8, default_parallelism())

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[by].to_numpy(zero_copy_only=False)
        if k.dtype.kind in "iu":
            h = k.astype(np.int64) * np.int64(0x9E3779B9)
        else:
            # string keys: python hash() is NOT stable across workers;
            # blake2b once per DISTINCT value (vocabulary-sized work)
            import hashlib

            uniq, inv = np.unique(k, return_inverse=True)
            hu = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(str(u).encode(), digest_size=8).digest(),
                        "big",
                        signed=True,
                    )
                    for u in uniq
                ),
                dtype=np.int64,
                count=len(uniq),
            )
            h = hu[inv]
        return t.append_column("_kb", pa.array((h % nb).astype(np.int64)))

    return ds.select_columns(cols).map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )


def windowed_counts(events: Dataset, window_us: int = US_PER_HOUR) -> Dataset:
    """Tumbling-window counts+sums per event_type:
    (event_type, win, n, sum_value)."""

    def add_win(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "win": ts // window_us,
                "value": batch["value"],
            }
        )

    winds = events.select_columns(["event_type", "ts", "value"]).map_batches(
        add_win, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = winds.groupby(["event_type", "win"]).aggregate(
        Count(alias_name="n"), Sum("value", alias_name="sum_value")
    )

    # np.round matches DuckDB's round() bit-for-bit; pyarrow's pc.round
    # multiplies by an inexact 1e-6 and lands one ulp off.
    def round6(t: pa.Table) -> pa.Table:
        vals = np.round(t["sum_value"].to_numpy(zero_copy_only=False), 6)
        return t.set_column(
            t.schema.get_field_index("sum_value"), "sum_value", pa.array(vals)
        )

    return agg.map_batches(round6, batch_format="pyarrow", zero_copy_batch=True)


def hopping_counts(
    events: Dataset, window_us: int = 2 * US_PER_HOUR, hop_us: int = US_PER_HOUR
) -> Dataset:
    """Hopping (sliding) window counts+sums per event_type: each event
    belongs to window_us/hop_us overlapping windows. Windows are keyed
    by their START hop index; an event at time t falls in windows
    starting at hop indices (t//hop - k + 1) .. (t//hop) where
    k = window_us // hop_us. Pure flat-map column derivation -- no
    event-time machinery needed in a batch formulation.
    Output: (event_type, win_start, n, sum_value)."""
    k = window_us // hop_us

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        base = ts // hop_us
        n = len(ts)
        off = np.arange(k, dtype=np.int64)
        win = (base[:, None] - off[None, :]).ravel()  # k windows per event
        return pa.table(
            {
                "event_type": pa.compute.take(
                    batch["event_type"], np.repeat(np.arange(n), k)
                ),
                "win_start": win,
                "value": pa.compute.take(batch["value"], np.repeat(np.arange(n), k)),
            }
        )

    winds = events.select_columns(["event_type", "ts", "value"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = winds.groupby(["event_type", "win_start"]).aggregate(
        Count(alias_name="n"), Sum("value", alias_name="sum_value")
    )

    def round6(t: pa.Table) -> pa.Table:
        vals = np.round(t["sum_value"].to_numpy(zero_copy_only=False), 6)
        return t.set_column(
            t.schema.get_field_index("sum_value"), "sum_value", pa.array(vals)
        )

    return agg.map_batches(round6, batch_format="pyarrow", zero_copy_batch=True)


def asof_prev(
    events: Dataset,
    *,
    by: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> Dataset:
    """AS-OF self-join: each event matched to the most recent PRIOR
    event of the same `by` key ((ts, id) total order; first event of a
    key gets -1). Ray Data has no asof join; the batch formulation
    hash-buckets keys (one shuffle, ~parallelism groups), sorts each
    bucket ONCE by (key, ts, id) and computes the shift vectorized over
    key-run boundaries. A key's events always land in one bucket, so
    the per-key semantics are exact.
    Output: (event_id, prev_event_id, gap_us)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([by, ts_col, id_col], kind="stable")
        keys = g[by].to_numpy()
        t = g[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        ids = g[id_col].to_numpy(dtype=np.int64)
        first = np.r_[True, keys[1:] != keys[:-1]]  # key-run starts
        prev = np.where(first, np.int64(-1), np.r_[np.int64(-1), ids[:-1]])
        gap = np.where(first, np.int64(-1), np.r_[np.int64(-1), np.diff(t)])
        return pd.DataFrame(
            {"event_id": ids, "prev_event_id": prev, "gap_us": gap.astype(np.int64)}
        )

    return (
        _bucket_by_key(events, by, [by, ts_col, id_col])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
    )


def asof_enrich(
    events: Dataset,
    *,
    target_type: str,
    ref_type: str,
    by: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> Dataset:
    """Cross-type AS-OF enrichment: each `target_type` event joined to
    the most recent STRICTLY-PRIOR `ref_type` event of the same key
    ((ts, id) total order; -1 when none) — the streaming-enrichment
    join (e.g. every purchase annotated with the last preceding click).

    Same bucket-per-key shape as asof_prev; within a bucket the carry
    is a segmented max-accumulate over reference indices (monotone row
    indices make per-run resets a second max-accumulate of run
    starts), so the whole pass is vectorized.
    Output: (event_id, ref_event_id, ref_gap_us)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([by, ts_col, id_col], kind="stable")
        keys = g[by].to_numpy()
        t = g[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        ids = g[id_col].to_numpy(dtype=np.int64)
        types = g[type_col].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "ref_event_id": pd.Series([], dtype="int64"),
                    "ref_gap_us": pd.Series([], dtype="int64"),
                }
            )
        idx = np.arange(n, dtype=np.int64)
        first = np.r_[True, keys[1:] != keys[:-1]]
        run_base = np.maximum.accumulate(np.where(first, idx, -1))
        marker = np.where(types == ref_type, idx, -1)
        carried = np.maximum.accumulate(marker)
        prev_carried = np.r_[np.int64(-1), carried[:-1]]
        ref_idx = np.where(prev_carried >= run_base, prev_carried, -1)
        is_tgt = types == target_type
        ri = ref_idx[is_tgt]
        has = ri >= 0
        ri_c = np.maximum(ri, 0)
        return pd.DataFrame(
            {
                "event_id": ids[is_tgt],
                "ref_event_id": np.where(has, ids[ri_c], np.int64(-1)),
                "ref_gap_us": np.where(has, t[is_tgt] - t[ri_c], np.int64(-1)),
            }
        )

    return (
        _bucket_by_key(events, by, [by, ts_col, id_col, type_col])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
    )


def sessionize(events: Dataset, gap_us: int = US_30_MIN) -> Dataset:
    """(user_id, n_sessions): a new session starts when the gap to the
    previous event of that user exceeds `gap_us`. Events within a user
    are ordered by (ts, event_id) -- the deterministic tiebreak.
    Same bucketed one-pass shape as asof_prev: sessions are gap-islands
    counted vectorized over key-run boundaries (bincount of
    session-break positions per run)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        users = g["user_id"].to_numpy()
        t = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        first = np.r_[True, users[1:] != users[:-1]]
        run_id = np.cumsum(first) - 1  # 0..nruns-1, one run per user
        nruns = int(run_id[-1]) + 1 if len(run_id) else 0
        if nruns == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=users.dtype),
                    "n_sessions": pd.Series([], dtype="int64"),
                }
            )
        breaks = (~first[1:]) & (np.diff(t) > gap_us)  # intra-user gaps
        n_sessions = 1 + np.bincount(run_id[1:][breaks], minlength=nruns)
        return pd.DataFrame(
            {"user_id": users[first], "n_sessions": n_sessions.astype(np.int64)}
        )

    return (
        _bucket_by_key(events, "user_id", ["user_id", "ts", "event_id"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
    )


def event_transitions(events: Dataset) -> Dataset:
    """(prev_type, event_type, transitions): counts of consecutive
    event-type pairs within each user's (ts, event_id)-ordered stream —
    the Markov transition matrix of the event log. Same bucketed
    one-pass shape as asof_prev: each user lands whole in one hash
    bucket, the bucket is sorted once, the lag is a vectorized shift
    over key-run boundaries, and each bucket emits PARTIAL pair counts
    (pandas groupby-size over ~|types|^2 rows), so the final keyed
    aggregate sees buckets x |types|^2 rows, never the event count."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        users = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        if len(users) == 0:
            return pd.DataFrame(
                {
                    "prev_type": pd.Series([], dtype=object),
                    "event_type": pd.Series([], dtype=object),
                    "transitions": pd.Series([], dtype="int64"),
                }
            )
        cont = np.r_[False, users[1:] == users[:-1]]  # has a same-user prev
        df = pd.DataFrame(
            {"prev_type": np.r_[[""], et[:-1]][cont], "event_type": et[cont]}
        )
        out = (
            df.groupby(["prev_type", "event_type"], sort=False)
            .size()
            .reset_index(name="transitions")
        )
        out["transitions"] = out["transitions"].astype("int64")
        return out

    partials = (
        _bucket_by_key(events, "user_id", ["user_id", "ts", "event_id", "event_type"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
    )
    agg = partials.groupby(["prev_type", "event_type"]).aggregate(
        Sum("transitions", alias_name="transitions")
    )
    return agg


def rate_anomalies(
    events: Dataset,
    *,
    window_us: int = US_PER_HOUR,
    z_threshold: float = 2.0,
) -> Dataset:
    """(user_id, win, n, z): per-user windowed event counts whose
    z-score against that user's own window history is anomalous
    (|z| >= threshold) — the bot/burst detector a web event log needs.

    Statistics are over the windows in which the user HAD events (no
    zero-fill — absent windows are absent on both sides of the oracle);
    users with < 2 windows or zero variance cannot score. Sample
    stddev (ddof=1) matches DuckDB's stddev. Plan: two keyed groupbys
    ((user, win) counts, then per-user moments) + one user-keyed hash
    join back — every all-to-all is key-proportional.
    """
    from ray.data.aggregate import Count, Mean, Std

    from ..stages.joins import hash_join

    def add_win(batch: pa.Table) -> pa.Table:
        ts = (
            batch["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        return pa.table({"user_id": batch["user_id"], "win": ts // window_us})

    # (user, window) counts via a user-hash bucketed exchange: groups =
    # users x windows (data-proportional; Ray's keyed aggregate pays
    # ~ms per group). Bucket on user_id alone so each user's windows
    # co-locate; exact pair counts from one lexsort per bucket.
    from ..context import default_parallelism as _dp

    nbk = max(8, _dp())

    def _bkt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_kb", pa.array((u * np.int64(0x9E3779B9)) % nbk, pa.int64())
        )

    def _pair_count(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e = pa.array([], pa.int64())
            return pa.table({"user_id": e, "win": e, "n": e})
        u = t["user_id"].to_numpy(zero_copy_only=False)
        w = t["win"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        us, ws = u[order], w[order]
        new = np.r_[True, (us[1:] != us[:-1]) | (ws[1:] != ws[:-1])]
        bounds = np.flatnonzero(new)
        n = np.diff(np.r_[bounds, len(us)]).astype(np.int64)
        return pa.table({"user_id": us[bounds], "win": ws[bounds], "n": n})

    counts = (
        events.select_columns(["user_id", "ts"])
        .map_batches(add_win, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_bkt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(_pair_count, batch_format="pyarrow")
    ).materialize()
    stats = counts.groupby("user_id").aggregate(
        Mean("n", alias_name="m"),
        Std("n", ddof=1, alias_name="sd"),
        Count(alias_name="nw"),
    )
    # clamp partitions to data size: Ray's per-partition acero join
    # chokes on empty shuffle partitions (the linkpred/weighted-shuffle
    # clamp)
    from ..context import default_parallelism

    npart = max(2, min(default_parallelism(), counts.count() // 100_000 + 2))
    joined = hash_join(counts, stats, on=("user_id",), num_partitions=npart)

    def score(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        m = t["m"].to_numpy(zero_copy_only=False)
        sd = t["sd"].to_numpy(zero_copy_only=False)
        nw = t["nw"].to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (n - m) / sd
        keep = (nw >= 2) & (sd > 0) & (np.abs(z) >= z_threshold)
        idx = np.nonzero(keep)[0]
        return pa.table(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False)[idx],
                "win": t["win"].to_numpy(zero_copy_only=False)[idx],
                "n": t["n"].to_numpy(zero_copy_only=False)[idx],
                "z": np.round(z[idx], 6),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def funnel_stages(
    events: Dataset,
    *,
    stages: tuple = ("view", "click", "purchase"),
    by: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> Dataset:
    """Ordered-funnel analysis: per user, the first time each stage is
    reached where stage k must happen STRICTLY after the user's first
    completion of stage k-1 (first view, first click after that view,
    first purchase after that click — the standard product-analytics
    funnel, which no plain per-type min can express).

    Batch formulation (the asof_prev shape): hash-bucket users (one
    small-int keyed shuffle), sort each bucket once by (user, ts, id),
    then one masked minimum.reduceat per stage over user-run
    boundaries, threading the previous stage's time back per row — the
    whole chain is vectorized, no per-user python.

    Output: (user_id, funnel_stage, t_view, t_click, t_purchase) with
    epoch-µs times, -1 where a stage was never reached."""
    _INF = np.int64(2**62)
    _NEG = np.int64(-(2**62))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([by, ts_col, id_col], kind="stable")
        u = g[by].to_numpy(dtype=np.int64)
        t = g[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        et = g["event_type"].to_numpy()
        first = np.r_[True, u[1:] != u[:-1]]
        bounds = np.flatnonzero(first)
        runidx = np.cumsum(first) - 1
        th = np.full(len(bounds), _NEG, dtype=np.int64)
        reached = []
        for s in stages:
            cand = np.where((et == s) & (t > th[runidx]), t, _INF)
            ts_s = np.minimum.reduceat(cand, bounds)
            reached.append(ts_s)
            th = ts_s  # missing stage -> +inf threshold kills the rest
        stage_n = np.sum([r != _INF for r in reached], axis=0).astype(np.int64)
        out = {"user_id": u[bounds], "funnel_stage": stage_n}
        for name, r in zip(stages, reached):
            out[f"t_{name}"] = np.where(r == _INF, np.int64(-1), r)
        return pd.DataFrame(out)

    return (
        _bucket_by_key(events, by, [by, ts_col, id_col, "event_type"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
    )


def cohort_retention(
    events: Dataset,
    *,
    signup_type: str = "signup",
    week_us: int = 7 * 24 * US_PER_HOUR,
) -> Dataset:
    """(cohort_week, week_offset, n_users): classic retention triangle —
    users grouped by the week of their FIRST signup event, counted once
    per later week in which they produced ANY event (offset >= 0;
    pre-signup activity is out of the retention window by definition).

    Plan: per-user first-signup week (filtered pass + user-keyed
    groupby-min), distinct (user, week) activity pairs (per-batch
    distinct combiner + one keyed groupby), a user-keyed hash join,
    then one small (cohort, offset)-keyed count — every shuffle input
    is pre-aggregated."""
    from ray.data.aggregate import Count, Min

    from ..stages.joins import hash_join

    def signup_partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = et == signup_type
        u = t["user_id"].to_numpy(zero_copy_only=False)[keep]
        ts = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        )[keep]
        order = np.argsort(u, kind="stable")
        us, tss = u[order], ts[order]
        b = np.flatnonzero(np.r_[True, us[1:] != us[:-1]]) if len(us) else np.array([], dtype=np.int64)
        return pa.table(
            {
                "user_id": us[b],
                "t0": np.minimum.reduceat(tss, b) if len(us) else tss,
            }
        )

    from ..stages.skew import bucketed_group_reduce as _bgr

    su = (
        _bgr(
            events.select_columns(["user_id", "ts", "event_type"]).map_batches(
                signup_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            "user_id",
            "t0",
            "min",
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "user_id": t["user_id"],
                    "cw": t["t0"].to_numpy(zero_copy_only=False) // week_us,
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    def week_partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        w = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        ) // week_us
        k = np.stack([u, w], axis=1)
        uq = np.unique(k, axis=0)
        return pa.table({"user_id": uq[:, 0], "w": uq[:, 1]})

    aw = (
        events.select_columns(["user_id", "ts"])
        .map_batches(week_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "w"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    # clamp join partitions to the signup-user count (an empty right
    # block in a hash partition crashes pyarrow's join)
    su = su.materialize()
    npart = max(1, min(default_parallelism(), su.count() // 100_000 + 1))
    j = hash_join(aw, su, on=("user_id",), num_partitions=npart)

    def offset(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False)
        cw = t["cw"].to_numpy(zero_copy_only=False)
        keep = w >= cw
        return pa.table(
            {"cohort_week": cw[keep], "week_offset": (w - cw)[keep]}
        )

    return (
        j.map_batches(offset, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Count(alias_name="n_users"))
    )


def window_join(
    events: Dataset,
    *,
    target_type: str = "purchase",
    window_us: int = US_PER_HOUR,
    by: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> Dataset:
    """Interval (range) join: for every `target_type` event, the count
    and value-sum of the same user's events in the preceding window
    [t - window_us, t) — "what did this user do in the hour before
    purchasing", the classic feature-engineering range join Ray Data
    has no native operator for.

    Batch formulation (the asof_prev shape): bucket users, sort each
    bucket once by (user, ts, id), then answer every window query with
    two vectorized searchsorteds over a run-offset time axis (each
    user-run is shifted onto its own HUGE-spaced block, so one global
    binary search respects run boundaries; HUGE = span + window + 2
    makes dipping below a run's base land exactly at its start) and a
    prefix-sum difference. Strictly-before semantics: same-timestamp
    events (and the target itself) are excluded.

    Values aggregate as integer CENTS (round(value·100)) so the sum is
    summation-order-independent — summing raw doubles would diverge
    from the SQL oracle by ulps.

    Output: (event_id, n_prior, prior_value_cents)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([by, ts_col, id_col], kind="stable")
        u = g[by].to_numpy(dtype=np.int64)
        t = g[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        et = g["event_type"].to_numpy()
        cents = np.floor(g["value"].to_numpy(dtype=np.float64) * 100 + 0.5).astype(
            np.int64
        )
        ids = g[id_col].to_numpy(dtype=np.int64)
        if len(u) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "n_prior": pd.Series([], dtype="int64"),
                    "prior_value_cents": pd.Series([], dtype="int64"),
                }
            )
        first = np.r_[True, u[1:] != u[:-1]]
        runidx = np.cumsum(first) - 1
        span = int(t.max() - t.min())
        huge = np.int64(span + window_us + 2)
        nruns = int(runidx[-1]) + 1
        if nruns * int(huge) >= 2**62:
            raise ValueError(
                "window_join run-offset axis would overflow int64 -- "
                "raise the bucket count so fewer users share a bucket"
            )
        adj = (t - t.min()) + runidx * huge
        cum = np.concatenate([[0], np.cumsum(cents)])
        tgt = np.flatnonzero(et == target_type)
        lo = np.searchsorted(adj, adj[tgt] - window_us)
        hi = np.searchsorted(adj, adj[tgt], side="left")
        return pd.DataFrame(
            {
                "event_id": ids[tgt],
                "n_prior": (hi - lo).astype(np.int64),
                "prior_value_cents": (cum[hi] - cum[lo]).astype(np.int64),
            }
        )

    return (
        _bucket_by_key(events, by, [by, ts_col, id_col, "event_type", "value"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
    )


def active_users(events: Dataset, window_us: int = US_PER_HOUR) -> Dataset:
    """(win, n_users): DISTINCT active users per tumbling window — the
    standard DAU/WAU-style engagement count. Per-batch distinct
    (win, user) combiner, one (win, user)-keyed groupby for global
    distinctness, then a window-keyed partial count."""

    def partial(t: pa.Table) -> pa.Table:
        ts = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        )
        u = t["user_id"].to_numpy(zero_copy_only=False)
        key = np.stack([ts // window_us, u], axis=1)
        uq = np.unique(key, axis=0)
        return pa.table({"win": uq[:, 0], "user_id": uq[:, 1]})

    distinct = (
        events.select_columns(["ts", "user_id"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["win", "user_id"])
        .aggregate(Count(alias_name="_n"))
    )

    def per_win(t: pa.Table) -> pa.Table:
        w = t["win"].to_numpy(zero_copy_only=False)
        uw, c = np.unique(w, return_counts=True)
        return pa.table({"win": uw, "c": c.astype(np.int64)})

    return (
        distinct.map_batches(per_win, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("win")
        .aggregate(Sum("c", alias_name="n_users"))
    )


def winsorized_value_mean(
    events: Dataset, *, q_lo: float = 0.05, q_hi: float = 0.95
) -> Dataset:
    """(event_type, n, mean_cents): winsorized mean of `value` per
    event type — values clamped to the type's exact [q_lo, q_hi]
    quantiles before averaging, the robust-aggregation pass that keeps
    a few corrupt readings from dominating a metric.

    Values are integer cents throughout (round(value·100)), so the
    per-type histogram is over a bounded integer vocabulary, quantiles
    are exact (quantile_disc semantics: element at ceil(q·n)-1), and
    the clamped mean is an exact integer ratio rounded half-up — no
    floating-point aggregation anywhere. One (type, cents) groupby
    builds every histogram; the driver walk is per-type
    vocabulary-sized."""
    from ray.data.aggregate import Count

    def cents_partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        c = np.floor(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100 + 0.5
        ).astype(np.int64)
        return pa.table({"event_type": et, "cents": c})

    hist = (
        events.select_columns(["event_type", "value"])
        .map_batches(cents_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "cents"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()  # (type x distinct cent values) -- bounded vocabulary
    )
    out_rows = []
    for et, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("cents")
        vals = g["cents"].to_numpy(dtype=np.int64)
        cnts = g["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])

        def q_at(q):
            idx = max(0, int(np.ceil(q * n)) - 1)
            return int(vals[np.searchsorted(cum, idx + 1)])

        lo, hi = q_at(q_lo), q_at(q_hi)
        clamped = np.clip(vals, lo, hi)
        total = int((clamped * cnts).sum())
        out_rows.append(
            (et, n, np.floor(total / n * 1e6 + 0.5) / 1e6)
        )
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(out_rows, columns=["event_type", "n", "mean_cents"]).astype(
            {"n": np.int64}
        )
    )


def props_key_stats(events: Dataset) -> Dataset:
    """(k, n, sum_cents): per-extracted-property aggregation over the
    semi-structured `props` JSON column — the log-enrichment pass
    (extract a typed field from a JSON payload, roll up on it). The
    extraction is one vectorized RE2-compatible regexp per batch
    (pandas str.extract ≡ DuckDB regexp_extract, by construction);
    value sums are integer cents (exact in any order)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = (
            df["props"]
            .fillna("")
            .str.extract(r'"k": (\d+)', expand=False)
            .fillna(-1)
            .astype(np.int64)
        )
        cents = np.floor(df["value"].to_numpy(dtype=np.float64) * 100 + 0.5).astype(
            np.int64
        )
        g = pd.DataFrame({"k": k, "c": cents, "one": np.int64(1)}).groupby(
            "k", sort=False
        ).agg(n=("one", "sum"), s=("c", "sum"))
        g = g.reset_index()
        return g.astype({"k": np.int64, "n": np.int64, "s": np.int64})

    return (
        events.select_columns(["props", "value"])
        .map_batches(partial, batch_format="pandas")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="sum_cents"))
    )


def running_totals(events: Dataset) -> Dataset:
    """(event_id, user_id, running_cents): per-user cumulative sum of
    value over the (ts, event_id) order — the classic running-total
    window function (SUM ... OVER (PARTITION BY user ORDER BY ts ROWS
    UNBOUNDED PRECEDING)), which Ray Data has no operator for. Same
    bucketed one-pass shape as asof_prev: each user lands whole in one
    hash bucket, the bucket sorts once, and the per-user reset is a
    vectorized run-boundary subtraction (global cumsum minus the
    cumsum value at each user's run start). Values quantize to integer
    cents per row BEFORE summation, so every prefix sum is an exact
    int64 (the pricing_summary money contract)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "running_cents": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        users = g["user_id"].to_numpy(dtype=np.int64)
        cents = np.floor(
            g["value"].to_numpy(dtype=np.float64) * 100 + 0.5
        ).astype(np.int64)
        cs = np.cumsum(cents)
        starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        base = np.r_[0, cs[:-1]][starts]  # prefix sum before each run
        runs = np.diff(np.r_[starts, len(users)])
        running = cs - np.repeat(base, runs)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(dtype=np.int64),
                "user_id": users,
                "running_cents": running.astype(np.int64),
            }
        )

    return (
        _bucket_by_key(events, "user_id", ["event_id", "user_id", "ts", "value"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
    )


def new_users_per_window(events: Dataset, window_us: int = US_PER_HOUR) -> Dataset:
    """(win, n_new_users): users appearing for the FIRST time in each
    tumbling window — the growth/acquisition counterpart of
    active_users_per_window (which counts presence, not novelty). Two
    summary-proportional steps: per-batch (user, min-ts) partials + one
    user-keyed min (the only exchange, user-count bounded), then the
    first-seen timestamps bucket into windows with a per-batch count
    combiner + a tiny window-keyed sum."""
    from ray.data.aggregate import Min, Sum

    def first_partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(
            np.int64
        )
        o = np.argsort(u, kind="stable")
        us, tss = u[o], ts[o]
        b = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        return pa.table(
            {"user_id": us[b], "t": np.minimum.reduceat(tss, b).astype(np.int64)}
        )

    first = (
        events.select_columns(["user_id", "ts"])
        .map_batches(first_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Min("t", alias_name="t0"))
    )

    def win_partial(t: pa.Table) -> pa.Table:
        w = t["t0"].to_numpy(zero_copy_only=False).astype(np.int64) // window_us
        u, c = np.unique(w, return_counts=True)
        return pa.table({"win": u, "c": c.astype(np.int64)})

    return (
        first.map_batches(win_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("win")
        .aggregate(Sum("c", alias_name="n_new_users"))
    )


def session_length_hist(events: Dataset, gap_us: int = US_30_MIN) -> Dataset:
    """(n_events, n_sessions): the distribution of session lengths
    (events per 30-min-gap session) across all users — the engagement
    histogram behind session-based sampling decisions. Same bucketed
    one-pass shape as sessionize, but per-session sizes reduce to a
    length HISTOGRAM inside each bucket, so the keyed aggregate sees
    buckets × distinct-lengths rows, never the session count."""
    from ray.data.aggregate import Sum

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "n_events": pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        users = g["user_id"].to_numpy()
        t = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        first = np.r_[True, users[1:] != users[:-1]]
        brk = first.copy()
        brk[1:] |= (~first[1:]) & (np.diff(t) > gap_us)
        sess = np.cumsum(brk) - 1
        sizes = np.bincount(sess)
        u, c = np.unique(sizes, return_counts=True)
        return pd.DataFrame(
            {"n_events": u.astype(np.int64), "c": c.astype(np.int64)}
        )

    return (
        _bucket_by_key(events, "user_id", ["user_id", "ts", "event_id"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("n_events")
        .aggregate(Sum("c", alias_name="n_sessions"))
    )


def out_of_order_stats(events: Dataset) -> Dataset:
    """(user_id, n_events, n_late, max_disorder_us): how out-of-order
    each user's stream arrives — an event is LATE if its timestamp is
    older than the running max over earlier arrivals (event_id is the
    arrival order), and the disorder is that lag. This is the
    watermark-sizing profile: a streaming window needs its allowed
    lateness ≥ the observed disorder or it drops these events. Same
    bucketed one-pass shape as asof_prev: sort each bucket by
    (user_id, event_id), per-run vectorized cummax, per-user finished
    stats emitted directly (bucket output is user-count bounded)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "n_late": pd.Series([], dtype="int64"),
                    "max_disorder_us": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["user_id", "event_id"], kind="stable")
        users = g["user_id"].to_numpy(dtype=np.int64)
        t = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        runs = np.diff(np.r_[starts, len(users)])
        # per-run cummax: global cummax restarted at run boundaries via
        # the offset trick (subtract a huge step per run, cummax, add back)
        step = (t.max() - t.min() + 1) if len(t) else 1
        rid = np.repeat(np.arange(len(starts), dtype=np.int64), runs)
        shifted = t + rid * (2 * step)
        cm = np.maximum.accumulate(shifted) - rid * (2 * step)
        disorder = cm - t  # ≥ 0; > 0 means late vs an earlier arrival
        late = disorder > 0
        df = pd.DataFrame({"u": users, "late": late, "d": disorder})
        out = df.groupby("u", sort=False).agg(
            n_events=("late", "size"),
            n_late=("late", "sum"),
            max_disorder_us=("d", "max"),
        )
        out = out.reset_index().rename(columns={"u": "user_id"})
        for c in ("n_events", "n_late", "max_disorder_us"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        _bucket_by_key(events, "user_id", ["user_id", "event_id", "ts"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
    )


def first_touch_counts(events: Dataset) -> Dataset:
    """(event_type, n_users): how many users' FIRST event (by ts,
    event_id) was of each type — first-touch attribution. Bucketed
    one-pass shape: each user lands whole in one bucket, the bucket
    sorts once and takes its run heads, and the bucket emits partial
    TYPE counts (≤|types| rows), so the keyed aggregate never sees the
    user count."""
    from ray.data.aggregate import Sum

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=object),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        users = g["user_id"].to_numpy()
        first = np.r_[True, users[1:] != users[:-1]]
        et = g["event_type"].to_numpy()[first]
        u, c = np.unique(et, return_counts=True)
        return pd.DataFrame({"event_type": u, "c": c.astype(np.int64)})

    return (
        _bucket_by_key(events, "user_id", ["user_id", "ts", "event_id", "event_type"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("c", alias_name="n_users"))
    )


def gap_hist(events: Dataset) -> Dataset:
    """(bucket, n_gaps): log₂ histogram of per-user inter-event gaps
    (bucket = floor(ln(gap)/ln 2) µs; zero gaps land in bucket −1) —
    the arrival-process profile that sizes session-gap and rate-window
    thresholds. Same bucketed one-pass shape as asof_prev; the per-
    bucket output is ≤64 rows. ln(gap)/ln(2) (NOT log2()) keeps the
    doubles bit-identical to the SQL oracle's ln-quotient."""
    from ray.data.aggregate import Sum

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "bucket": pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        users = g["user_id"].to_numpy(dtype=np.int64)
        t = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        same = np.r_[False, users[1:] == users[:-1]]
        gaps = np.diff(t, prepend=t[:1])[same]
        b = np.full(len(gaps), -1, dtype=np.int64)
        pos = gaps > 0
        with np.errstate(divide="ignore"):
            b[pos] = np.floor(
                np.log(gaps[pos].astype(np.float64)) / np.log(2.0)
            ).astype(np.int64)
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bucket": u, "c": c.astype(np.int64)})

    return (
        _bucket_by_key(events, "user_id", ["user_id", "ts", "event_id"])
        .groupby("_kb", num_partitions=exchange_partitions())
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("c", alias_name="n_gaps"))
    )


def hour_of_day_profile(events: Dataset) -> Dataset:
    """(event_type, hour, n): the diurnal activity profile per type —
    tumbling windows folded onto the 24-hour clock. Pure column
    derivation + per-batch count partials; the keyed aggregate sees
    |types|·24 rows."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(
            np.int64
        )
        hour = (ts // US_PER_HOUR) % 24
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_numpy(zero_copy_only=False), "hour": hour}
        )
        g = df.groupby(["event_type", "hour"], sort=False).size().reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        events.select_columns(["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour"])
        .aggregate(Sum("c", alias_name="n"))
    )
