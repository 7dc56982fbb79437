"""Structured Streaming: file-source ingest, watermark windows, streaming
dedup, foreachBatch quality filter — drained with Trigger.AvailableNow."""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from curator_spark.datagen import pages_path_for
from curator_spark.streaming import ingest


@pytest.fixture(scope="module")
def pages_src(tmp_path_factory):
    src = str(tmp_path_factory.mktemp("pages_stream"))
    cache = pages_path_for("/root/testdata/sf0.001", cache_root=str(tmp_path_factory.mktemp("pc")))
    for f in glob.glob(os.path.join(cache, "*.parquet")):
        shutil.copy(f, src)
    return src


def test_events_windowed_counts(spark, tmp_path):
    src = str(tmp_path / "ev")
    os.makedirs(src)
    shutil.copy("/root/testdata/sf0.001/events.parquet", src)
    out = str(tmp_path / "out")
    q = (
        ingest.windowed_event_counts(ingest.read_events_stream(spark, src), "1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # append mode emits only watermark-closed windows; totals must match the
    # batch aggregation for those windows
    batch = (
        spark.read.parquet(os.path.join(src, "events.parquet"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    merged = got.select("window_start", "event_type", F.col("n").alias("n_s")).join(
        batch, ["window_start", "event_type"]
    )
    assert merged.count() == got.count() > 0
    assert merged.filter(F.col("n_s") != F.col("n")).count() == 0


def test_streaming_quality_filter_matches_batch(spark, pages_src, tmp_path, golden):
    out = str(tmp_path / "verdicts")
    q = ingest.filtered_pages_stream(
        ingest.read_pages_stream(spark, pages_src, max_files=2)
    ).start(out, str(tmp_path / "ck2"))
    q.awaitTermination(180)
    got = spark.read.parquet(out).toPandas().sort_values("url").reset_index(drop=True)
    gold = golden.sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(gold["url"])  # every page exactly once
    assert got["keep"].tolist() == gold["keep"].tolist()
    assert got["scrubbed_text"].equals(gold["scrubbed_text"])
    assert got["batch_id"].nunique() >= 1


def test_streaming_dedup(spark, pages_src, tmp_path):
    # duplicate one source file -> stream must emit each url once
    dup_src = str(tmp_path / "dup")
    os.makedirs(dup_src)
    files = sorted(glob.glob(os.path.join(pages_src, "*.parquet")))
    shutil.copy(files[0], os.path.join(dup_src, "a.parquet"))
    shutil.copy(files[0], os.path.join(dup_src, "b.parquet"))
    out = str(tmp_path / "deduped")
    q = (
        ingest.dedup_stream(ingest.read_pages_stream(spark, dup_src, max_files=1))
        .select("url")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()
    src_urls = pd.read_parquet(files[0])["url"]
    assert len(got) == len(src_urls)
    assert got["url"].is_unique
