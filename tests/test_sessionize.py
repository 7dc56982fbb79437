"""Stateful streaming sessionization vs its batch twin.

The stream is drained with AvailableNow; a sentinel event far in the future
pushes the watermark past every real session's gap horizon so all sessions
close. The batch twin (window/lag) is the semantic spec.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from curator_spark.streaming import ingest, sessionize

GAP = 30 * 60


@pytest.fixture(scope="module")
def events_src(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sess_src"))
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").filter(
        F.col("user_id") < 40
    )
    # sentinel: one far-future event per user advances the event-time
    # watermark so every real session's timer fires before the drain ends
    sentinel = ev.groupBy("user_id").agg(
        F.lit(0).cast("long").alias("event_id"),
        (F.max("ts") + F.expr("INTERVAL 365 DAYS")).alias("ts"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    ).select("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.select("event_id", "ts", "user_id", "event_type", "value", "props").write.mode(
        "overwrite"
    ).parquet(src)
    sentinel.write.mode("append").parquet(src)
    return src


def test_stream_sessions_match_batch_twin(spark, events_src, tmp_path):
    out = str(tmp_path / "sessions")
    q = (
        sessionize.sessionize_stream(
            ingest.read_events_stream(spark, events_src, max_files=4), gap_seconds=GAP
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    def clean(pdf):
        # sentinel sessions (1 zero-value event) are an artifact of the
        # watermark-advancing trick: the global watermark closes some users'
        # sentinels and not others, so exclude them from both sides
        pdf = pdf[~((pdf["n_events"] == 1) & (pdf["total_value"] == 0.0))]
        return pdf.sort_values(["user_id", "session_start"]).reset_index(drop=True)

    got = clean(spark.read.parquet(out).toPandas())
    batch = clean(
        sessionize.sessionize_batch(spark.read.parquet(events_src), gap_seconds=GAP).toPandas()
    )
    assert len(got) > 0
    assert len(got) == len(batch)
    assert got["user_id"].tolist() == batch["user_id"].tolist()
    assert got["n_events"].tolist() == batch["n_events"].tolist()
    assert got["session_start"].tolist() == batch["session_start"].tolist()
    assert got["session_end"].tolist() == batch["session_end"].tolist()
    for a, b in zip(got["total_value"], batch["total_value"]):
        assert abs(a - b) < 1e-9


def test_timestamp_queries_are_timezone_invariant(spark):
    """Every timestamp-touching oracle query must produce identical rows
    under any spark.sql.session.timeZone — the one session setting the
    driver's gate controls that could silently break bit-parity. (A full
    53-query sweep under UTC vs America/New_York was run once and showed
    zero variance; this pins the timestamp-touching subset.)"""
    import hashlib

    from curator_spark import queries as q

    NAMES = ("q1_pricing_summary", "q3_top_revenue_orders",
             "events_type_month", "anti_join_resume")

    def digest():
        out = {}
        for name in NAMES:
            df = q.Q[name](spark, "/root/testdata/sf0.001")
            cols = sorted(df.columns)
            rows = sorted(repr(tuple(r[c] for c in cols)) for r in df.collect())
            out[name] = hashlib.sha256("\n".join(rows).encode()).hexdigest()
        return out

    original = spark.conf.get("spark.sql.session.timeZone")
    utc = digest()
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        nyc = digest()
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    assert utc == nyc


def test_sessionize_epochs_are_timezone_invariant(spark):
    """The oracle-checked epoch outputs must not move with
    spark.sql.session.timeZone (the driver's session tz is unknown)."""
    from curator_spark import queries as q

    def run():
        return sorted(
            (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
            for r in q.Q["sessionize_events"](spark, "/root/testdata/sf0.001").collect()
        )

    original = spark.conf.get("spark.sql.session.timeZone")
    utc = run()
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        nyc = run()
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    assert utc == nyc and len(utc) > 0
