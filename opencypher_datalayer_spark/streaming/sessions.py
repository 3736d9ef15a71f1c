"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

This is the streaming form of ``benchqueries.temporal.ev_sessionize``
(same >gap-minutes-of-silence-closes-a-session semantics). Spark's
built-in ``session_window`` covers the aggregate case; this operator
exists to exercise the *custom state* path — arbitrary per-key state
with event-time timeouts — which is what a bespoke streaming operator
(anomaly tracker, dedup-within-horizon, CDC collapse) builds on.

Mechanics per user key and micro-batch:

- buffered events are sorted by (ts, event_id) and folded into the open
  session carried in state (epoch-microsecond start/last, count, sum);
- a gap inside the batch closes a session and emits it downstream;
- the open session is kept in state with an event-time timeout at
  ``last + gap``: when the watermark passes it, the timed-out callback
  emits the session and clears state.

State is O(1) per active user (four scalars) — the watermark bounds how
long an idle user occupies memory. Shuffle is one hash partition on
user_id, the same key the batch sessionizer shuffles on.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
STATE_SCHEMA = "start bigint, last bigint, n bigint, total double"


def _emit(user_id: int, start_us: int, end_us: int, n: int, total: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n],
            "total_value": [total],
        }
    )


def _sessionize_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                state.remove()
                yield _emit(user_id, start, last, n, total)
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        # normalize to epoch microseconds regardless of the arrow-decided
        # datetime64 resolution (ms under some pandas/arrow combos)
        ts_us = pd.to_datetime(batch["ts"]).dt.as_unit("us").astype("int64")
        values = batch["value"].astype("float64")

        gap_s = gap_us // 1_000_000
        open_s: tuple[int, int, int, float] | None = state.get if state.exists else None
        for t, v in zip(ts_us.tolist(), values.tolist()):
            if open_s is None:
                open_s = (t, t, 1, v)
            # whole-second epoch diff: identical cut to the batch
            # sessionizer's ts.cast("long") comparison
            elif t // 1_000_000 - open_s[1] // 1_000_000 > gap_s:
                yield _emit(user_id, open_s[0], open_s[1], open_s[2], open_s[3])
                open_s = (t, t, 1, v)
            else:
                open_s = (open_s[0], t, open_s[2] + 1, open_s[3] + v)

        state.update(open_s)
        # event-time timeout: fire when the watermark passes last + gap
        state.setTimeoutTimestamp(open_s[1] // 1000 + gap_us // 1000)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_min: int = SESSION_GAP_MIN,
    watermark: str = "2 hours",
) -> DataFrame:
    """events: streaming DF with (ts timestamp, event_id, user_id, value).
    Returns closed sessions (emitted on in-batch gap or state timeout)."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_min * 60 * 1_000_000),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
