"""Structured Streaming ingestion: continuous page/event arrival.

The reference is purely batch (SURVEY.md §2.10 — its long-running pieces are
polling loops, not data-plane streams), so parity does not require this
module; it exists because a production curation pipeline ingests crawl
output continuously. The batch stages compose unchanged under
``foreachBatch`` — the quality filter is a pure DataFrame -> DataFrame
function, so the same code serves batch backfill and streaming tail.

Patterns covered (idiomatic Structured Streaming):
- file-source ``readStream`` with a pinned schema (new files = new data),
- event-time watermark + tumbling-window aggregation for late data,
- streaming dedup by key under a watermark (``dropDuplicates``),
- ``foreachBatch`` applying the batch quality filter and appending to a
  parquet sink (at real scale: Iceberg snapshot commits per micro-batch),
- ``Trigger.AvailableNow`` for test/backfill runs that drain and stop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import PAGES_SCHEMA  # noqa: F401  (arrow schema documents the layout)

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"
EVENTS_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def read_pages_stream(spark: SparkSession, src_dir: str, max_files: int = 8) -> DataFrame:
    """File-source stream of pages: each arriving parquet file is a
    micro-batch unit (crawl segments landing in object storage)."""
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_dir)
    )


def read_events_stream(spark: SparkSession, src_dir: str, max_files: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_dir)
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour", late: str = "2 hours") -> DataFrame:
    """Tumbling-window counts per event type with late-data tolerance: the
    watermark bounds state so the aggregation runs forever at 10^12 scale."""
    return (
        events.withWatermark("ts", late)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def dedup_stream(pages: DataFrame, late: str = "1 hour") -> DataFrame:
    """Streaming exact-dedup on url within the watermark horizon (state is
    dropped once the watermark passes — bounded memory)."""
    return pages.withWatermark("warc_ts", late).dropDuplicates(["url", "warc_ts"])


def filtered_pages_stream(pages: DataFrame) -> "StreamingFilterJob":
    return StreamingFilterJob(pages)


class StreamingFilterJob:
    """foreachBatch wrapper: run the batch quality filter per micro-batch and
    append committed verdicts to a parquet sink (Iceberg commit analog)."""

    def __init__(self, pages: DataFrame) -> None:
        self.pages = pages

    def start(self, out_dir: str, checkpoint_dir: str, available_now: bool = True):
        from ..plans.pipeline import quality_filter

        def process(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            out = quality_filter(batch_df)
            (
                out.withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(out_dir)
            )

        writer = (
            self.pages.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
