"""Gopher/C4-style heuristic quality rules as NATIVE Column expressions.

Per the north rule these stay JVM-side (whole-stage codegen; no Python).
Semantics are pinned to be bit-identical with the pure-python versions in
``rules.heuristic_stats`` — the oracle runs those, tests assert equality.

Reference analog: the char-census building block
(/root/reference/examples/custom/utils.py:4-36) and the rubric's structural
criteria (coherence/promotional checks, examples/custom/score.py:21-66),
re-expressed as deterministic statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import rules

# Java regex classes (NOTE: \v means "vertical whitespace" in Java — use \x0B
# to match Python's [ \t\n\r\f\v] exactly; SURVEY.md §7 regex-dialect hazard).
_WS_CLASS = r" \t\n\r\f\x0B"
# ASCII punct/symbol only (twin of rules._SYMBOL_RE): CJK/Arabic letters are
# NOT symbols.
_SYMBOL_CLASS = r"[!-/:-@\[-`{-~]"

_EN_STOPWORDS = sorted(rules.LANG_LEXICONS["en"])


def words_col(text: Column) -> Column:
    """Whitespace tokens of the trimmed text; [] for blank (== rules.tokens)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, rf"[{_WS_CLASS}]+")
    )


def heuristics_stage(df: DataFrame, text_col: str = "text_t") -> DataFrame:
    """Adds n_chars, n_words, mean_word_len, stop_density, symbol_ratio,
    repeated_line_frac, dup_word_frac — all whole-stage-codegen'd."""
    text = F.col(text_col)
    df = df.withColumn("_words", words_col(text))
    df = df.withColumn("_lwords", F.transform(F.col("_words"), F.lower))
    n_words = F.size(F.col("_words"))
    char_sum = F.aggregate(
        F.col("_words"), F.lit(0), lambda acc, w: acc + F.length(w)
    )
    stop_hits = F.size(
        F.filter(F.col("_lwords"), lambda w: w.isin(*_EN_STOPWORDS))
    )
    n_symbols = F.length(text) - F.length(F.regexp_replace(text, _SYMBOL_CLASS, ""))
    lines = F.filter(F.split(text, r"\n"), lambda ln: F.length(F.trim(ln)) > 0)
    n_lines = F.size(lines)

    return (
        df.withColumn("n_chars", F.length(text).cast("long"))
        .withColumn("n_words", n_words.cast("long"))
        .withColumn(
            "mean_word_len",
            F.when(n_words > 0, char_sum.cast("double") / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stop_density",
            F.when(n_words > 0, stop_hits.cast("double") / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "symbol_ratio",
            F.when(n_words > 0, n_symbols.cast("double") / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "repeated_line_frac",
            F.when(
                n_lines > 1,
                F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n_lines,
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "dup_word_frac",
            F.when(
                n_words > 0,
                F.lit(1.0)
                - F.size(F.array_distinct(F.col("_lwords"))).cast("double") / n_words,
            ).otherwise(F.lit(0.0)),
        )
        .drop("_words", "_lwords")
    )


def census_stage(df: DataFrame, text_col: str = "text_t") -> DataFrame:
    """Char-class census as native columns (parity with
    /root/reference/examples/custom/utils.py:4-36; python twin:
    rules.char_census)."""
    text = F.col(text_col)

    def count_class(pattern: str) -> Column:
        return (F.length(text) - F.length(F.regexp_replace(text, pattern, ""))).cast("long")

    df = (
        df.withColumn("english_count", count_class(r"[A-Za-z]"))
        .withColumn("arabic_count", count_class(r"[؀-ۿݐ-ݿࢠ-ࣿ]"))
        .withColumn("digit_count", count_class(r"[0-9]"))
        .withColumn("whitespace_count", count_class(rf"[{_WS_CLASS}]"))
        .withColumn("punct_symbol_count", count_class(r"[!-/:-@\[-`{-~]"))
    )
    counted = (
        F.col("english_count")
        + F.col("arabic_count")
        + F.col("digit_count")
        + F.col("whitespace_count")
        + F.col("punct_symbol_count")
    )
    return df.withColumn("other_count", (F.length(text) - counted).cast("long"))
