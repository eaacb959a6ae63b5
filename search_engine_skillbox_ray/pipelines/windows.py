"""Windowed aggregates over the ``events`` stream-shaped table.

The reference has no streaming features (SURVEY §2.9); these are the
batch-windowing operators a log/event pipeline needs, expressed on the
ordered-partitioned-log model: partition by key, order by ts inside the
partition, window inside ``map_groups`` (ray_guide streaming section).

* ``tumbling_window`` demonstrates the partial-aggregation pattern:
  per-batch pre-aggregation (one row per (key, window) per batch)
  BEFORE the groupby — the shuffle moves partials, not events.
* ``sessionize`` computes gap-based sessions per user inside
  ``groupby(user).map_groups`` over ts-sorted groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def tumbling_window(
    events: rd.Dataset,
    window_s: int = 3600,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> rd.Dataset:
    """→ (key, window_start:int64 epoch-seconds, n_events, sum_value[r6]).

    Pre-aggregates inside map_batches, then a small groupby-sum over
    partials — the canonical shuffle-minimizing aggregate shape.
    """

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch.column(ts_col), pa.int64())  # us since epoch
        win = pc.multiply(pc.divide(epoch, 1_000_000 * window_s), window_s)
        t = pa.table(
            {
                key_col: batch.column(key_col),
                "window_start": win,
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "v": pc.cast(batch.column(value_col), pa.float64()),
            }
        )
        return t.group_by([key_col, "window_start"]).aggregate([("n", "sum"), ("v", "sum")]).rename_columns(
            [key_col, "window_start", "n", "v"]
        )

    partials = events.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby([key_col, "window_start"]).sum(["n", "v"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column(key_col),
                "window_start": batch.column("window_start"),
                "n_events": pc.cast(batch.column("sum(n)"), pa.int64()),
                "sum_value": pa.array(
                    np.round(batch.column("sum(v)").to_numpy(zero_copy_only=False), 6)
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sessionize(
    events: rd.Dataset,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> rd.Dataset:
    """→ (user_id, n_sessions, n_events): gap-based sessions per user.

    Ordering assumption: each user's events fit one group and are
    sorted by ts inside ``map_groups`` — the partition key is the user,
    which is the only key this operator ever shuffles on.
    """

    def per_user(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].astype("int64").to_numpy()  # microseconds — exact gap compare
        if len(ts) == 0:
            return pd.DataFrame({user_col: [], "n_sessions": [], "n_events": []})
        new_session = np.concatenate(([True], np.diff(ts) > gap_s * 1_000_000))
        return pd.DataFrame(
            {
                user_col: [g[user_col].iloc[0]],
                "n_sessions": [int(new_session.sum())],
                "n_events": [len(ts)],
            }
        )

    return events.groupby(user_col).map_groups(per_user, batch_format="pandas")
