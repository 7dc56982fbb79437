"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship quality-filter pipeline end-to-end at sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 (plus the dedup / similarity / text-analysis extensions) with
exact DuckDB oracle SQL where the semantics are SQL-expressible. The
registry itself lives in ``curator_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from curator_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full quality-filter
    pipeline (extract -> langid -> perplexity -> heuristics -> scrub ->
    verdict) over the derived Common-Crawl-style pages table."""
    return _q.Q["pipeline_verdicts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.Q)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLE)
