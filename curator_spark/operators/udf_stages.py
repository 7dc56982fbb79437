"""Arrow-batched pandas-UDF stages (the only Python in the hot path).

Reference analog: the per-row expensive map (P3, SURVEY.md §2.3) — curator's
``call_single_request`` loop (/root/reference/src/bespokelabs/curator/
request_processor/online/base_online_request_processor.py:346-398) and the
vLLM batched path (offline/vllm_offline_request_processor.py:166-225). We
keep the vLLM *shape* — load model once per worker, score a whole batch —
but as vectorized Arrow batches inside Spark executors, never per-row
asyncio.

Design rule: ONE fused UDF boundary per pipeline run. Crossing
JVM->Arrow->pandas costs serialization of the text column; doing it once for
extract+langid+perplexity+scrub amortizes that over all four models. The
individual stage functions below exist for composability/unit tests; the
pipeline uses ``fused_score_stage``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .. import rules
from ..lm import get_lm

# ---------------------------------------------------------------------------
# Individual stages
# ---------------------------------------------------------------------------


@F.pandas_udf(StringType())
def _extract_udf(html: pd.Series) -> pd.Series:
    return html.map(rules.extract_text)


def extract_stage(df: DataFrame, html_col: str = "html", out: str = "extracted_text") -> DataFrame:
    """html binary -> extracted_text (byte-identical contract, input_hint)."""
    return df.withColumn(out, _extract_udf(F.col(html_col)))


_LANGID_SCHEMA = StructType(
    [
        StructField("lang_pred", StringType()),
        StructField("lang_conf", DoubleType()),
    ]
)


@F.pandas_udf(_LANGID_SCHEMA)
def _langid_udf(text: pd.Series) -> pd.DataFrame:
    res = [rules.langid(t if t is not None else "") for t in text]
    return pd.DataFrame(res, columns=["lang_pred", "lang_conf"])


def langid_stage(df: DataFrame, text_col: str = "text_t") -> DataFrame:
    lid = _langid_udf(F.col(text_col))
    return df.withColumn("lang_pred", lid["lang_pred"]).withColumn("lang_conf", lid["lang_conf"])


@F.pandas_udf(DoubleType())
def _ppl_udf(text: pd.Series) -> pd.Series:
    lm = get_lm()  # executor-local singleton, built once per python worker
    return pd.Series(lm.perplexities(text.tolist()))


def perplexity_stage(df: DataFrame, text_col: str = "text_t") -> DataFrame:
    return df.withColumn("perplexity", _ppl_udf(F.col(text_col)))


_SCRUB_SCHEMA = StructType(
    [StructField("scrubbed_text", StringType())]
    + [
        StructField(f"scrub_{name}", IntegerType())
        for name in ("email", "phone", "ip", "ssn", "toxicity")
    ]
)


@F.pandas_udf(_SCRUB_SCHEMA)
def _scrub_udf(text: pd.Series) -> pd.DataFrame:
    rows = []
    for t in text:
        scrubbed, counts = rules.scrub_text(t if t is not None else "")
        rows.append(
            {
                "scrubbed_text": scrubbed,
                "scrub_email": counts["email"],
                "scrub_phone": counts["phone"],
                "scrub_ip": counts["ip"],
                "scrub_ssn": counts["ssn"],
                "scrub_toxicity": counts["toxicity"],
            }
        )
    return pd.DataFrame(rows)


def scrub_stage(df: DataFrame, text_col: str = "text_t") -> DataFrame:
    s = _scrub_udf(F.col(text_col))
    for f in _SCRUB_SCHEMA.fieldNames():
        df = df.withColumn(f, s[f])
    return df


# ---------------------------------------------------------------------------
# Fused stage: one Arrow boundary for all Python-side models.
# ---------------------------------------------------------------------------

_FUSED_SCHEMA = StructType(
    [
        StructField("extracted_text", StringType()),
        StructField("text_t", StringType()),
        StructField("lang_pred", StringType()),
        StructField("lang_conf", DoubleType()),
        StructField("perplexity", DoubleType()),
        StructField("scrubbed_text", StringType()),
        StructField("scrub_email", IntegerType()),
        StructField("scrub_phone", IntegerType()),
        StructField("scrub_ip", IntegerType()),
        StructField("scrub_ssn", IntegerType()),
        StructField("scrub_toxicity", IntegerType()),
    ]
)


@F.pandas_udf(_FUSED_SCHEMA)
def _fused_udf(html: pd.Series) -> pd.DataFrame:
    lm = get_lm()
    rows = []
    for h in html:
        extracted = rules.extract_text(h)
        t = extracted[: rules.TRUNCATE_CHARS]  # parity: text[:10_000], score.py:104
        lang_pred, lang_conf = rules.langid(t)
        ppl = lm.perplexity(t)
        scrubbed, counts = rules.scrub_text(t)
        rows.append(
            (
                extracted,
                t,
                lang_pred,
                lang_conf,
                ppl,
                scrubbed,
                counts["email"],
                counts["phone"],
                counts["ip"],
                counts["ssn"],
                counts["toxicity"],
            )
        )
    return pd.DataFrame(rows, columns=_FUSED_SCHEMA.fieldNames())


def fused_score_stage(df: DataFrame, html_col: str = "html") -> DataFrame:
    """html -> all model-derived columns in ONE pandas UDF call."""
    fused = _fused_udf(F.col(html_col))
    df = df.withColumn("_m", fused)
    for f in _FUSED_SCHEMA.fieldNames():
        df = df.withColumn(f, F.col("_m")[f])
    return df.drop("_m")
