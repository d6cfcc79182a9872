"""Event-time windowing over an ordered, partitioned log (stream-shaped ops).

Ray Data is a batch engine with no native event-time windows/watermarks
(absent in the reference too — SURVEY.md §2.5); windows are expressed as:

- tumbling windows: a vectorized window-id column (epoch // size) + a plain
  groupby — embarrassingly parallel, one shuffle;
- session windows: one global ``sort([key, ts, id])`` (range shuffle), then
  a fully vectorized ``map_batches`` that finds gap boundaries with numpy
  inside each sorted batch; sessions that could straddle a batch edge (only
  those of each batch's FIRST and LAST key — everything between is provably
  complete, because a key spanning two sorted blocks must be last of one and
  first of the next) are stitched in one small driver pass. No per-group
  Python: the engine's cost is one sort plus O(rows) numpy, and the driver
  only ever sees O(batches x sessions-per-edge-key) stitch rows.

Both are DuckDB-oracle-checkable (GROUP BY floor(epoch/size); window
functions with lag + cumulative sum).
"""

from __future__ import annotations

import numpy as np
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
    """Gap-based session windows per key — sort + vectorized boundaries.

    Events are globally sorted by (key, ts, id) — the deterministic tiebreak
    mirrored in the oracle SQL — and a new session starts when the key
    changes or the gap to the previous event exceeds ``gap_s``. Emits one
    row per session: (key, session_id, n_events, start_us, end_us);
    ``session_id`` is the 0-based session index within the key.

    Scale shape: ONE range shuffle (the sort), then numpy-only batch work.
    Each sorted batch computes its sessions vectorized; only sessions
    belonging to a batch's first or last key can be split across batches —
    a key with events in two sorted blocks is necessarily the last key of
    one and the first key of the next — so interior keys finalize (with
    their session ids) inside the batch, and the tiny edge set
    (O(batches) keys) is stitched + ranked on the driver."""
    import ray.data as rd

    gap_us = gap_s * _US

    def block_sessions(t: pa.Table) -> pa.Table:
        n = t.num_rows
        key_type = t.schema.field(key).type
        if n == 0:
            return _empty_sessions(key, key_type)
        keys = t[key].to_numpy(zero_copy_only=False)
        ts_us = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        key_change = np.concatenate([[True], keys[1:] != keys[:-1]])
        gap_break = np.concatenate([[True], (ts_us[1:] - ts_us[:-1]) > gap_us])
        starts = np.flatnonzero(key_change | gap_break)
        ends = np.append(starts[1:], n)
        s_key = keys[starts]
        # 0-based session index within key (sessions of a key are contiguous)
        sess_idx = np.arange(len(starts), dtype=np.int64)
        key_first = np.concatenate([[True], s_key[1:] != s_key[:-1]])
        session_id = sess_idx - np.maximum.accumulate(
            np.where(key_first, sess_idx, 0)
        )
        edge = (s_key == keys[0]) | (s_key == keys[-1])
        return pa.table(
            {
                key: pa.array(s_key, key_type),
                "session_id": pa.array(session_id),
                "n_events": pa.array((ends - starts).astype(np.int64)),
                "start_us": pa.array(ts_us[starts]),
                "end_us": pa.array(ts_us[ends - 1]),
                "_edge": pa.array(edge),
            }
        )

    sessions = (
        ds.sort([key, ts_col, id_col])
        .map_batches(
            block_sessions,
            batch_format="pyarrow",
            batch_size=None,  # whole sorted blocks -> fewest edge rows
            zero_copy_batch=True,
        )
        .materialize()  # consumed twice (interior filter + edge collect)
    )
    interior = sessions.filter(
        expr="_edge == False"
    ).drop_columns(["_edge"])
    edge_rows = sessions.filter(expr="_edge == True").drop_columns(["_edge"]).take_all()
    if not edge_rows:
        return interior
    e = pd.DataFrame(edge_rows).sort_values([key, "start_us"], kind="stable")
    k = e[key].to_numpy()
    st = e["start_us"].to_numpy()
    en = e["end_us"].to_numpy()
    # chain-merge adjacent same-key partials whose gap closed across a block
    # edge (intervals per key are disjoint + ordered, so row-to-row suffices)
    joined = np.concatenate(
        [[False], (k[1:] == k[:-1]) & (st[1:] - en[:-1] <= gap_us)]
    )
    grp = np.cumsum(~joined) - 1
    e = e.assign(_grp=grp)
    stitched = (
        e.groupby("_grp", sort=True)
        .agg(
            **{
                key: (key, "first"),
                "n_events": ("n_events", "sum"),
                "start_us": ("start_us", "min"),
                "end_us": ("end_us", "max"),
            }
        )
        .reset_index(drop=True)
    )
    stitched["session_id"] = stitched.groupby(key, sort=False).cumcount()
    # rebuild the key column with the ORIGINAL dtype (block_sessions
    # preserved it; inferring here would make e.g. an int32/dictionary key
    # mismatch the interior schema and break the union)
    key_type = sessions.schema().base_schema.field(key).type
    out_tbl = pa.table(
        {
            key: pa.array(stitched[key].to_numpy(), type=key_type),
            "session_id": pa.array(stitched["session_id"].to_numpy(), pa.int64()),
            "n_events": pa.array(stitched["n_events"].to_numpy(), pa.int64()),
            "start_us": pa.array(stitched["start_us"].to_numpy(), pa.int64()),
            "end_us": pa.array(stitched["end_us"].to_numpy(), pa.int64()),
        }
    )
    return interior.union(rd.from_arrow(out_tbl))


def _empty_sessions(key: str, key_type) -> pa.Table:
    return pa.table(
        {
            key: pa.array([], key_type),
            "session_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "start_us": pa.array([], pa.int64()),
            "end_us": pa.array([], pa.int64()),
            "_edge": pa.array([], pa.bool_()),
        }
    )


def hopping_counts(
    ds,
    key: str = "event_type",
    ts_col: str = "ts",
    size_s: int = 3600,
    hop_s: int = 900,
):
    """Per-(key, window) count + value sum for HOPPING (sliding) windows:
    window w covers [w*hop, w*hop + size), so each event belongs to
    ~size/hop overlapping windows. The explode is fully vectorized
    (repeat + cumsum-offset arange, no Python per row); the groupby is the
    only shuffle. Output fan-out is size/hop x input rows — callers pick
    hop accordingly (exactly the tradeoff any streaming engine documents).
    """
    from ray.data.aggregate import Count, Sum

    size_us = size_s * _US
    hop_us = hop_s * _US

    def explode(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # w*hop <= us < w*hop+size  =>  (us-size)//hop + 1 <= w <= us//hop
        lo = (us - size_us) // hop_us + 1
        hi = us // hop_us
        counts = hi - lo + 1
        idx = np.repeat(np.arange(len(us)), counts)
        pos = np.arange(int(counts.sum())) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        windows = lo[idx] + pos
        vmicro = pc.cast(
            pc.round(
                pc.multiply(t["value"], 1_000_000.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key: t[key].take(pa.array(idx, pa.int64())),
                "window": pa.array(windows, pa.int64()),
                "value_micro": pa.array(vmicro[idx], pa.int64()),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, "window"])
        .aggregate(
            Count(alias_name="n"),
            Sum("value_micro", alias_name="sum_value_micro"),
        )
    )
