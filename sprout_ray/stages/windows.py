"""Event-time windowing over an ordered, partitioned log (stream-shaped ops).

Ray Data is a batch engine with no native event-time windows/watermarks
(absent in the reference too — SURVEY.md §2.5); windows are expressed as:

- tumbling windows: a vectorized window-id column (epoch // size) + a plain
  groupby — embarrassingly parallel, one shuffle;
- session windows: ``groupby(key).map_groups`` over ts-sorted per-key groups
  (gap-based cumsum inside pandas) — the per-key ordering assumption is the
  partitioning contract, stated here and in the oracle SQL.

Both are DuckDB-oracle-checkable (GROUP BY floor(epoch/size); window
functions with lag + cumulative sum).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_US = 1_000_000


def add_tumbling_window(batch: pa.Table, ts_col: str = "ts", size_s: int = 3600, out: str = "window") -> pa.Table:
    """Append window id = floor(epoch_seconds / size) as int64 (vectorized)."""
    epoch_us = batch[ts_col].cast(pa.int64())
    win = pc.divide(epoch_us, pa.scalar(size_s * _US, pa.int64()))
    # floor for non-negative timestamps; integer division truncates toward 0
    return batch.append_column(out, win)


def tumbling_counts(ds, key: str = "event_type", ts_col: str = "ts", size_s: int = 3600):
    """Per-(key, window) count + value sum in integer micro-units."""
    from ray.data.aggregate import Count, Sum

    def prep(t: pa.Table) -> pa.Table:
        t = add_tumbling_window(t, ts_col=ts_col, size_s=size_s)
        # DuckDB-oracle parity: Arrow's half_towards_infinity rounds halves
        # away from zero for both signs, matching DuckDB's round()
        vmicro = pc.cast(
            pc.round(
                pc.multiply(t["value"], 1_000_000.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                key: t[key],
                "window": t["window"],
                "value_micro": vmicro,
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, "window"])
        .aggregate(
            Count(alias_name="n"),
            Sum("value_micro", alias_name="sum_value_micro"),
        )
    )


def sessionize(ds, key: str = "user_id", ts_col: str = "ts", id_col: str = "event_id", gap_s: int = 1800):
    """Gap-based session windows per key.

    Events of one key are sorted by (ts, id) — the deterministic tiebreak
    mirrored in the oracle SQL — and a new session starts when the gap to the
    previous event exceeds ``gap_s``. Emits one row per session:
    (key, session_id, n_events, start_us, end_us). ``session_id`` is the
    0-based session index within the key."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        ts_us = g[ts_col].astype("int64")
        gap = ts_us.diff().fillna(0)
        new_sess = (gap > gap_s * _US).astype("int64")
        sess = new_sess.cumsum()
        out = (
            pd.DataFrame(
                {
                    key: g[key].to_numpy(),
                    "session_id": sess.to_numpy(),
                    "ts_us": ts_us.to_numpy(),
                }
            )
            .groupby("session_id")
            .agg(
                **{
                    key: (key, "first"),
                    "n_events": ("ts_us", "size"),
                    "start_us": ("ts_us", "min"),
                    "end_us": ("ts_us", "max"),
                }
            )
            .reset_index()
        )
        return out[[key, "session_id", "n_events", "start_us", "end_us"]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
