"""Streaming-shaped pipelines over the ``events`` log (SURVEY.md §2.9:
the reference is strictly batch; its only incremental state is the geofence
last-point store — windowing here follows the Ray-Data streaming-shaped
pattern: partition by key, sort by ts inside the group, window with pandas).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type: event count + value sum.

    Window key = floor(epoch_us / 3600e6) computed vectorized; partial
    per-batch aggregation before the groupby shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()  # microseconds since epoch
        hour = ts // 3_600_000_000
        df = pd.DataFrame(
            {"event_type": batch.column("event_type").to_pandas(), "hour_bucket": hour, "value": batch.column("value").to_numpy()}
        )
        g = df.groupby(["event_type", "hour_bucket"], sort=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ._util import int_scale_columns

    agg = partials.groupby(["event_type", "hour_bucket"]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")
    )
    return int_scale_columns(agg, {"sum_value": 100})


SQL_EVENTS_HOURLY = """
SELECT event_type,
       CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
       COUNT(*) AS n_events, CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value
FROM events GROUP BY 1, 2
"""


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user: events within ``gap_minutes`` of the
    previous event share a session. groupby(user) + sorted window inside the
    group — the ordering assumption is per-user ts order, established by the
    in-group sort (not globally)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort").copy()
        gap = g["ts"].diff().dt.total_seconds().fillna(np.inf)
        g["session_idx"] = ((gap > gap_minutes * 60).cumsum() - 1).astype(np.int64)
        out = (
            g.groupby("session_idx", sort=True)
            .agg(user_id=("user_id", "first"), n_events=("event_id", "size"), first_event=("event_id", "min"))
            .reset_index()
        )
        return out[["user_id", "session_idx", "n_events", "first_event"]]

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


SQL_SESSIONIZE = """
WITH ordered AS (
    SELECT user_id, event_id, ts,
           CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {gap} OR LAG(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, event_id,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
    FROM ordered
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events, MIN(event_id) AS first_event
FROM sess GROUP BY 1, 2
"""
