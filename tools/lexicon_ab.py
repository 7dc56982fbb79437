"""A/B the lexicon hit-counting forms at realistic doc lengths.

Round-3 verdict: the interpreted HOF form (`F.size(F.filter(lw, isin))`)
won its A/B on ~300-char fixture docs, but real web pages run 1-4k chars
and the round-3 dead-end note predicted the regex alternation crosses over
on longer docs. This harness settles it: synthetic corpora at 300 / 1500 /
4000 chars (constant total characters, so each cell does the same volume of
text work), four candidate forms, bit-identity asserted BEFORE any timing,
interleaved best-of-k walls.

Forms (all multiplicity-preserving — per-occurrence counts):
  hof   : F.size(F.filter(words(lower(text)), isin(*lex)))  [shipped today]
  rx    : F.regexp_count(lower(text), '(?:^|\\s)(?:w1|w2|...)(?=\\s|$)')
  join  : explode_outer(words) -> broadcast join lexicon -> one per-doc agg
  intersect : F.size(F.array_intersect(...)) — DISTINCT hits, measured only
          to size the gap; semantically different, never shippable.

Usage: python tools/lexicon_ab.py [total_chars_per_corpus] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Column, DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from curator_spark import rules  # noqa: E402
from curator_spark.operators.textanalysis import lang_scores, words  # noqa: E402
from curator_spark.session import get_spark  # noqa: E402

TOTAL_CHARS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
LANGS = sorted(rules.LANG_LEXICONS)


def _rx_pattern(lex: list[str]) -> str:
    # token == maximal \s+-delimited run, so a hit is a lexicon word bounded
    # by start/whitespace on the left and whitespace/end on the right; only
    # the LEFT separator is consumed, so back-to-back stopwords both count
    return "(?:^|\\s)(?:" + "|".join(sorted(lex)) + ")(?=\\s|$)"


def lang_scores_rx(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    lt = F.lower(F.col(text_col))
    cols = [
        F.regexp_count(lt, F.lit(_rx_pattern(sorted(rules.LANG_LEXICONS[lang]))))
        .cast("long")
        .alias(f"hits_{lang}")
        for lang in LANGS
    ]
    out = df.select(F.col(key), *cols)
    top_h = F.greatest(*[F.col(f"hits_{lang}") for lang in LANGS])
    winner = F.coalesce(
        *[F.when(F.col(f"hits_{lang}") == top_h, F.lit(lang)) for lang in LANGS]
    )
    return out.withColumn("lang_pred", F.when(top_h > 0, winner).otherwise(F.lit("und")))


def lang_scores_join(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    spark = df.sparkSession
    lex_rows = [
        (w, lang) for lang in LANGS for w in sorted(rules.LANG_LEXICONS[lang])
    ]
    lex = spark.createDataFrame(lex_rows, "w string, lang string")
    toks = df.select(
        F.col(key), F.explode_outer(words(F.lower(F.col(text_col)))).alias("w")
    )
    hits = toks.join(F.broadcast(lex), "w", "left")
    agg = hits.groupBy(key).agg(
        *[
            F.sum(F.when(F.col("lang") == lang, 1).otherwise(0))
            .cast("long")
            .alias(f"hits_{lang}")
            for lang in LANGS
        ]
    )
    top_h = F.greatest(*[F.col(f"hits_{lang}") for lang in LANGS])
    winner = F.coalesce(
        *[F.when(F.col(f"hits_{lang}") == top_h, F.lit(lang)) for lang in LANGS]
    )
    return agg.withColumn("lang_pred", F.when(top_h > 0, winner).otherwise(F.lit("und")))


def lang_scores_intersect(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    lw = words(F.lower(F.col(text_col)))
    cols = [
        F.size(
            F.array_intersect(lw, F.lit(sorted(rules.LANG_LEXICONS[lang])))
        )
        .cast("long")
        .alias(f"hits_{lang}")
        for lang in LANGS
    ]
    return df.select(F.col(key), *cols)


def lang_scores_explode(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """explode + per-lang conditional sum with a codegen InSet — no join
    table, one partial-agged shuffle of n_docs tiny rows."""
    toks = df.select(
        F.col(key), F.explode_outer(words(F.lower(F.col(text_col)))).alias("w")
    )
    agg = toks.groupBy(key).agg(
        *[
            F.sum(F.when(F.col("w").isin(*sorted(rules.LANG_LEXICONS[lang])), 1).otherwise(0))
            .cast("long")
            .alias(f"hits_{lang}")
            for lang in LANGS
        ]
    )
    top_h = F.greatest(*[F.col(f"hits_{lang}") for lang in LANGS])
    winner = F.coalesce(
        *[F.when(F.col(f"hits_{lang}") == top_h, F.lit(lang)) for lang in LANGS]
    )
    return agg.withColumn("lang_pred", F.when(top_h > 0, winner).otherwise(F.lit("und")))


FORMS = {
    "hof": lang_scores,
    "rx": lang_scores_rx,
    "join": lang_scores_join,
    "explode": lang_scores_explode,
    "intersect": lang_scores_intersect,
}


def build_corpus(spark, doc_len: int, total_chars: int, path: str) -> DataFrame:
    """Deterministic synthetic web-ish corpus: ~38% stopword tokens drawn
    across the four lexicons (en-heavy), the rest seeded gibberish."""
    if not os.path.exists(path):
        rng = np.random.RandomState(doc_len)
        pool_stop = [w for lang in LANGS for w in sorted(rules.LANG_LEXICONS[lang])]
        gib = ["".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), rng.randint(3, 11)))
               for _ in range(400)]
        n_docs = max(total_chars // doc_len, 1)
        tokens_per_doc = max(doc_len // 6, 1)
        docs = []
        for i in range(n_docs):
            picks = rng.rand(tokens_per_doc)
            idx_s = rng.randint(0, len(pool_stop), tokens_per_doc)
            idx_g = rng.randint(0, len(gib), tokens_per_doc)
            toks = [
                pool_stop[idx_s[j]] if picks[j] < 0.38 else gib[idx_g[j]]
                for j in range(tokens_per_doc)
            ]
            docs.append((i, " ".join(toks)))
        import pandas as pd

        spark.createDataFrame(
            pd.DataFrame(docs, columns=["doc_id", "text"])
        ).repartition(CPUS * 2).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def assert_identical(df: DataFrame) -> None:
    cols = ["doc_id"] + [f"hits_{lang}" for lang in LANGS] + ["lang_pred"]
    base = sorted(map(tuple, FORMS["hof"](df).select(cols).collect()))
    for name in ("rx", "join", "explode"):
        got = sorted(map(tuple, FORMS[name](df).select(cols).collect()))
        assert got == base, f"{name} diverges from hof"


def quality_explode(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """quality_score with stop_hits from an explode + InSet agg joined back
    (everything else stays per-row codegen)."""
    text = F.col(text_col)
    lw = words(F.lower(text))
    en = sorted(rules.LANG_LEXICONS["en"])
    toks = df.select(F.col(key), F.explode_outer(lw).alias("w"))
    agg = toks.groupBy(key).agg(
        F.sum(F.when(F.col("w").isin(*en), 1).otherwise(0)).alias("stop_hits")
    )
    n_words = F.size(words(text))
    n_chars = F.length(text)
    n_symbols = n_chars - F.length(F.regexp_replace(text, r"[!-/:-@\[-`{-~]", ""))
    joined = df.select(F.col(key), text.alias("__t")).join(agg, key)
    text2 = F.col("__t")
    lw2 = words(F.lower(text2))
    n_words2 = F.size(words(text2))
    n_chars2 = F.length(text2)
    n_symbols2 = n_chars2 - F.length(F.regexp_replace(text2, r"[!-/:-@\[-`{-~]", ""))
    flags = [
        ((n_chars2 < rules.MIN_CHARS) | (n_chars2 > rules.MAX_CHARS)).alias("f_len"),
        ((n_words2 > 0) & (n_symbols2.cast("double") / n_words2 > rules.MAX_SYMBOL_RATIO)).alias("f_symbol"),
        ((n_words2 > 0) & (F.col("stop_hits").cast("double") / n_words2 < rules.MIN_STOPWORD_DENSITY)).alias("f_stopword"),
        ((n_words2 > 0) & (F.lit(1.0) - F.size(F.array_distinct(lw2)).cast("double") / n_words2 > rules.MAX_DUP_WORD_FRAC)).alias("f_dup_word"),
    ]
    fired = sum(f.cast("int") for f in [c for c in flags])
    score = F.least(F.greatest(F.lit(5) - fired, F.lit(0)), F.lit(5))
    return joined.select(F.col(key), *flags, score.cast("int").alias("score"))


def main() -> None:
    spark = get_spark(
        app_name="lexicon_ab", master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS
    )
    # bit-identity gate on real fixture corpora first (the semantics the
    # oracle pins), then on one synthetic corpus
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        assert_identical(spark.read.parquet(f"{sf}/documents.parquet"))
    print("bit-identity: rx == join == hof on sf0.001 + sf0.01", flush=True)

    corpora = {
        L: build_corpus(spark, L, TOTAL_CHARS, f"/tmp/lexab_{L}_{TOTAL_CHARS}.pq")
        for L in (300, 1500, 4000)
    }
    assert_identical(corpora[1500].limit(2000))

    def run(form, df):
        t0 = time.monotonic()
        FORMS[form](df).write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 3)

    # warmup every form once
    for name in FORMS:
        run(name, corpora[300].limit(5000))

    samples: dict[tuple, list[float]] = {}
    for _pass in range(3):  # interleaved: forms x lengths per pass
        for L, df in corpora.items():
            for name in FORMS:
                samples.setdefault((name, L), []).append(run(name, df))

    print(f"\ntotal_chars={TOTAL_CHARS} cpus={CPUS} (best of 3, interleaved)")
    print(f"{'form':<10}" + "".join(f"{L:>10}" for L in corpora))
    for name in FORMS:
        row = [min(samples[(name, L)]) for L in corpora]
        print(f"{name:<10}" + "".join(f"{v:>10.3f}" for v in row))
    print("\nall samples:", {f"{n}@{L}": samples[(n, L)] for (n, L) in samples})

    # --- quality_score: per-row HOF vs explode-agg + join-back -------------
    from curator_spark.operators.textanalysis import quality_score

    qcols = ["doc_id", "f_len", "f_symbol", "f_stopword", "f_dup_word", "score"]
    for sf in ("/root/testdata/sf0.001",):
        d = spark.read.parquet(f"{sf}/documents.parquet")
        a = sorted(map(tuple, quality_score(d).select(qcols).collect()))
        b = sorted(map(tuple, quality_explode(d).select(qcols).collect()))
        assert a == b, "quality_explode diverges"
    print("\nquality bit-identity ok")
    qforms = {"q_hof": quality_score, "q_explode": quality_explode}
    for name, fn in qforms.items():
        fn(corpora[300].limit(5000)).write.format("noop").mode("overwrite").save()
    qsamples: dict[tuple, list[float]] = {}
    for _pass in range(3):
        for L, df in corpora.items():
            for name, fn in qforms.items():
                t0 = time.monotonic()
                fn(df).write.format("noop").mode("overwrite").save()
                qsamples.setdefault((name, L), []).append(round(time.monotonic() - t0, 3))
    print(f"{'form':<10}" + "".join(f"{L:>10}" for L in corpora))
    for name in qforms:
        row = [min(qsamples[(name, L)]) for L in corpora]
        print(f"{name:<10}" + "".join(f"{v:>10.3f}" for v in row))
    print("\nall q samples:", {f"{n}@{L}": qsamples[(n, L)] for (n, L) in qsamples})
    spark.stop()


if __name__ == "__main__":
    main()
