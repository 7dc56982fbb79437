"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The reference has no streaming (SURVEY.md §2.10); this is the
training-data-pipeline extension pattern for operators Spark's built-ins
can't express: arbitrary per-key state machines over an unbounded stream.
Shape: groupBy(key) -> pandas callback receiving (key, event batches,
GroupState); state times out on the event-time watermark, so memory is
bounded at any scale (the same mechanism would implement, e.g., per-host
crawl-politeness accounting or incremental per-domain quality counters).

A batch twin (`sessionize_batch`, window/lag over a static DataFrame) pins
the semantics: tests assert the streaming operator emits byte-identical
sessions once every timer has fired.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_SECONDS = 30 * 60

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# State = the raw buffered events still inside the watermark horizon.
# Events can arrive out of order across micro-batches (file order != time
# order); only once the event-time watermark passes session_end + gap is a
# session immutable, so the operator buffers raw (ts, value) pairs and folds
# them into sessions lazily — the canonical watermark-correct design.
from pyspark.sql.types import ArrayType  # noqa: E402

_STATE_SCHEMA = StructType(
    [
        StructField("us", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
    ]
)


def _fold_sessions(us: list[int], vals: list[float], gap_us: int):
    """Events -> [(start, end, n, total, events)] with events = the raw
    (us, value) pairs belonging to each session (needed so closed sessions'
    events can be dropped from state and open ones retained exactly)."""
    sessions = []
    cur = None
    for u, v in sorted(zip(us, vals)):
        if cur is None:
            cur = [u, u, 1, float(v), [(u, v)]]
        elif u - cur[1] <= gap_us:
            cur[1] = max(cur[1], u)
            cur[2] += 1
            cur[3] += float(v)
            cur[4].append((u, v))
        else:
            sessions.append(cur)
            cur = [u, u, 1, float(v), [(u, v)]]
    if cur is not None:
        sessions.append(cur)
    return sessions


def sessionize_stream(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS, late: str = "1 hour") -> DataFrame:
    """Event stream -> closed sessions, emitted when the event-time watermark
    passes session_end + gap (until then a late event could still extend or
    merge the session, so nothing earlier is final)."""
    gap_us = gap_seconds * 1_000_000

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        us: list[int] = []
        vals: list[float] = []
        if state.exists:
            s_us, s_vals = state.get
            us.extend(s_us)
            vals.extend(s_vals)
        for pdf in pdfs:
            us.extend((pdf["ts"].astype("int64") // 1000).tolist())
            vals.extend(pdf["value"].astype(float).tolist())
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed, keep_us, keep_vals = [], [], []
        for sess in _fold_sessions(us, vals, gap_us):
            if sess[1] + gap_us < wm_us:
                closed.append(sess)  # immutable: no admissible event can join
            else:
                for u, v in sess[4]:  # open: retain its raw events in state
                    keep_us.append(u)
                    keep_vals.append(v)
        if keep_us:
            state.update((keep_us, keep_vals))
            # fire when the watermark passes the earliest open session's horizon
            state.setTimeoutTimestamp(max(min(keep_us) + gap_us, wm_us + 1) // 1000 + 1)
        else:
            state.remove()
        if closed:
            out = pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total_value": [c[3] for c in closed],
                }
            )
            yield out

    return (
        events.withWatermark("ts", late)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def epoch_us_ntz(col_name: str) -> F.Column:
    """Microseconds since 1970-01-01 of a wall-clock (NTZ) timestamp column,
    SESSION-TIMEZONE-INDEPENDENT: timestampdiff on NTZ operands never
    consults spark.sql.session.timeZone. The obvious
    ``unix_micros(ts.cast('timestamp'))`` does (NTZ->TZ cast applies the
    session zone), which would shift oracle-checked epoch outputs by the
    zone offset and shift gap comparisons across DST transitions — and the
    driver's session timezone is unknown (CLAUDE.md invariant). Takes a
    column NAME (timestampdiff has no pyspark function wrapper; SQL expr
    needs the reference inline)."""
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
        f"CAST({col_name} AS TIMESTAMP_NTZ))"
    )


def sessionize_ids(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Per-event session assignment: session id = cumulative count of gap
    breaks per user, via lag + running sum windows. Gap compares MICROSECOND
    epochs — the exact unit the streaming operator folds on — so batch and
    stream agree even when a gap crosses the threshold inside one second."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    us = epoch_us_ntz("ts")
    gap = us - F.lag(us).over(w)
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0),
    )
    sid = F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return marked.withColumn("session_id", sid)


def sessionize_batch(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Batch twin (semantic spec of the streaming operator)."""
    return (
        sessionize_ids(events, gap_seconds)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .drop("session_id")
    )
