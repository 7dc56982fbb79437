"""The quality-filter pipeline: extract -> langid -> perplexity -> heuristics
-> scrub -> verdict, as one declarative Spark plan.

Spark restatement of the reference's request->response->parse lifecycle
(SURVEY.md §3.1): the whole chain after the initial repartition is a single
shuffle-free stage — scan -> one fused pandas UDF -> whole-stage-codegen'd
heuristics/verdict — so Catalyst pipelines it end-to-end and throughput
scales with cores (no barrier, no driver round-trips).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import salted_repartition
from ..operators.heuristics import heuristics_stage
from ..operators.udf_stages import (
    extract_truncate_stage,
    fused_score_stage,
    text_score_stage,
)
from ..operators.verdict import verdict_stage

OUTPUT_COLUMNS = [
    "url",
    "warc_ts",
    "lang",
    "extracted_text",
    "scrubbed_text",
    "lang_pred",
    "lang_conf",
    "perplexity",
    "n_chars",
    "n_words",
    "mean_word_len",
    "stop_density",
    "symbol_ratio",
    "repeated_line_frac",
    "dup_word_frac",
    "scrub_email",
    "scrub_phone",
    "scrub_ip",
    "scrub_ssn",
    "scrub_toxicity",
    "drop_rules",
    "score",
    "keep",
    "error",  # per-row extract error tag (null = ok) feeding the K3 quarantine
]


def quality_filter(
    pages: DataFrame,
    repartition_to: int | None = None,
    salt: str | None = None,
    params_col: str | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> verdict table.

    ``repartition_to``: explicit salted url-hash repartition (north rule,
    host-skew defusal). The repartition happens AFTER extraction on narrow
    text columns — raw html (10-50x wider than extracted text at web scale)
    never crosses the shuffle. Leave None for the fully fused, shuffle-free
    plan when the input scan layout is already uniform.

    ``params_col``: optional per-row generation-params JSON column; its
    ``truncate`` key overrides the stage's truncation row by row (P2
    per-row-override semantics, prompt_formatter.py:108-117).
    """
    if params_col is not None:
        df = fused_score_stage(pages, params_col=params_col)
        df = heuristics_stage(df, text_col="text_t")
        df = verdict_stage(df)
        return df.select(*OUTPUT_COLUMNS)
    if repartition_to:
        df = extract_truncate_stage(pages)  # Arrow boundary 1: html -> text
        df = df.drop("html", "text")  # narrow rows only through the wire
        df = salted_repartition(df, "url", repartition_to, *( [salt] if salt else [] ))
        df = text_score_stage(df)  # Arrow boundary 2: langid+ppl+scrub
    else:
        df = fused_score_stage(pages)  # ONE Arrow boundary for everything
    df = heuristics_stage(df, text_col="text_t")  # native codegen
    df = verdict_stage(df)  # native codegen
    return df.select(*OUTPUT_COLUMNS)


def kept_pages(verdicts: DataFrame) -> DataFrame:
    """The keep side (F5) — what downstream training-data jobs consume."""
    return verdicts.filter(F.col("keep")).select("url", "warc_ts", "lang_pred", "scrubbed_text")


def export_corpus(
    verdicts: DataFrame,
    out_dir: str,
    target_rows_per_file: int = 100_000,
) -> None:
    """K4 publish analog: materialize the kept corpus as a clean, sharded
    parquet dataset partitioned by predicted language. File-count control
    via a url-hash repartition (deterministic shard membership) rather than
    coalesce, so shard sizes stay balanced under host skew; at real scale
    this is an Iceberg table write with the same layout.
    """
    kept = kept_pages(verdicts)
    # Persist before the sizing count: without it the count() executes the
    # full upstream pipeline once and the write executes it a second time.
    kept.persist()
    try:
        n = kept.count()
        shards = max(1, (n + target_rows_per_file - 1) // target_rows_per_file)
        (
            kept.repartition(shards, F.xxhash64("url"))
            .write.mode("overwrite")
            .partitionBy("lang_pred")
            .parquet(out_dir)
        )
    finally:
        kept.unpersist()
