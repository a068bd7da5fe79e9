"""Streaming-shaped operators over the ordered events log.

Ray Data has no event-time windowing; the batch formulation treats the
events table as a partitioned log: windows are pure column derivations
(tumbling = integer-divide the microsecond epoch), sessions are
per-user gap-islands inside groupby(user).map_groups over ts-sorted
groups (ordering assumption: within one user, (ts, event_id) is a total
order -- stated tiebreak makes results deterministic)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

US_PER_HOUR = 3_600_000_000
US_30_MIN = 1_800_000_000


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
    key gets -1). Ray Data has no asof join; the batch formulation is a
    per-key sorted shift inside groupby(by).map_groups -- the standard
    partition-then-sorted-merge shape (keys must fit a group, which
    event streams partitioned by user satisfy).
    Output: (event_id, prev_event_id, gap_us)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        t = g[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        ids = g[id_col].to_numpy(dtype=np.int64)
        prev = np.concatenate([[-1], ids[:-1]])
        gap = np.concatenate([[-1], np.diff(t)])
        return pd.DataFrame(
            {"event_id": ids, "prev_event_id": prev, "gap_us": gap.astype(np.int64)}
        )

    return (
        events.select_columns([by, ts_col, id_col])
        .groupby(by)
        .map_groups(per_key, batch_format="pandas")
    )


def sessionize(events: Dataset, gap_us: int = US_30_MIN) -> Dataset:
    """(user_id, n_sessions): a new session starts when the gap to the
    previous event of that user exceeds `gap_us`. Events within a user
    are ordered by (ts, event_id) -- the deterministic tiebreak."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        t = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        gaps = np.diff(t)
        n_sessions = 1 + int((gaps > gap_us).sum())
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "n_sessions": [n_sessions]})

    return (
        events.select_columns(["user_id", "ts", "event_id"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )
