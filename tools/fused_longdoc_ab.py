"""Fused long-doc A/B (round-5 verdict item #6).

The round-4 lexicon A/B ran lang_scores' candidate forms as STANDALONE
queries over a documents scan. This harness re-asks the question in the
fused context the verdict flagged: the operators composed DOWNSTREAM of the
flagship ``quality_filter``'s fused-UDF stage (so their input is a pipelined
Arrow-stage output, not a parquet scan), on long-doc corpora (the fixture
docs are ~300 chars; real web pages run 1-4k).

Protocol: synthetic corpora at 300 and 4000 chars/doc (constant total
characters — every cell does the same volume of text work) -> datagen's
REAL pages derivation (all content classes: PII, toxicity, boilerplate...)
-> quality_filter -> per-form downstream plan, full-plan noop-write walls,
interleaved best-of-3, bit-identity asserted BEFORE any timing. A baseline
arm (the UDF stage alone) is timed too so the downstream delta is readable.

Forms:
  base               : quality_filter output materialized (the shared floor)
  lang_explode       : textanalysis.lang_scores (SHIPPED: explode + InSet
                       conditional sums, one n_docs-row shuffle)
  lang_rowwise       : lang_scores_rowwise (per-row interpreted-HOF twin)
  rep_arrow          : repetition_signals (SHIPPED: one mapInPandas)
  rep_sql            : repetition_signals_sql (explode/agg/window twin)

Usage: python tools/fused_longdoc_ab.py [total_chars] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

_argv = sys.argv
sys.argv = [_argv[0]]  # lexicon_ab parses argv at import
import lexicon_ab as lab  # noqa: E402

sys.argv = _argv

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from curator_spark.operators.textanalysis import (  # noqa: E402
    lang_scores,
    lang_scores_rowwise,
    repetition_signals,
    repetition_signals_sql,
)
from curator_spark.plans.pipeline import quality_filter  # noqa: E402
from curator_spark.session import get_spark  # noqa: E402
from curator_spark.sources.tables import load_pages  # noqa: E402

TOTAL_CHARS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
LANGS = lab.LANGS


def longdoc_sf_dir(spark, doc_len: int) -> str:
    """A documents.parquet dir in the testdata layout, texts from
    lexicon_ab's generator at the requested length."""
    out = f"/tmp/fusedab_sf_{doc_len}_{TOTAL_CHARS}"
    docs_pq = os.path.join(out, "documents.parquet")
    if not os.path.exists(docs_pq):
        corp = lab.build_corpus(
            spark, doc_len, TOTAL_CHARS, f"/tmp/lexab_{doc_len}_{TOTAL_CHARS}.pq"
        ).toPandas()
        corp["lang"] = "en"
        corp["source"] = "src" + (corp["doc_id"] % 20).astype(str)
        corp["n_chars"] = corp["text"].str.len()
        os.makedirs(out, exist_ok=True)
        corp.to_parquet(docs_pq, index=False)
    return out


def main() -> None:
    spark = get_spark(
        app_name="fused_longdoc_ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )

    def downstream(base):
        return {
            "base": lambda: base,
            "lang_explode": lambda: lang_scores(base, text_col="scrubbed_text", key="url"),
            "lang_rowwise": lambda: lang_scores_rowwise(
                base, text_col="scrubbed_text", key="url"
            ),
            "rep_arrow": lambda: repetition_signals(
                base, text_col="scrubbed_text", key="url"
            ),
            "rep_sql": lambda: repetition_signals_sql(
                base, text_col="scrubbed_text", key="url"
            ),
        }

    bases = {}
    for L in (300, 4000):
        sf = longdoc_sf_dir(spark, L)
        pages = load_pages(spark, sf, cache_root="/tmp/fusedab_pages")
        v = quality_filter(pages)
        bases[L] = v.filter(F.col("scrubbed_text").isNotNull()).select(
            "url", "scrubbed_text"
        )

    # bit-identity on the fused output BEFORE timing (sorted row tuples),
    # at BOTH doc lengths — long docs are the case under test, so the
    # 4000-char corpus must be identity-checked too (r5 review finding)
    lcols = ["url"] + [f"hits_{lg}" for lg in LANGS] + ["lang_pred"]
    rcols = ["url", "n_words", "top2_frac", "top3_frac", "dup_frac"]
    for L, base in bases.items():
        small = base.limit(3000).persist()
        small.count()
        a = sorted(
            map(tuple, lang_scores(small, "scrubbed_text", "url").select(lcols).collect())
        )
        b = sorted(
            map(
                tuple,
                lang_scores_rowwise(small, "scrubbed_text", "url").select(lcols).collect(),
            )
        )
        assert a == b, f"lang forms diverge fused at {L} chars"
        c = sorted(
            map(
                tuple,
                repetition_signals(small, "scrubbed_text", "url").select(rcols).collect(),
            )
        )
        d = sorted(
            map(
                tuple,
                repetition_signals_sql(small, "scrubbed_text", "url").select(rcols).collect(),
            )
        )
        assert c == d, f"repetition forms diverge fused at {L} chars"
        small.unpersist()
        print(f"bit-identity fused at {L} chars: lang explode==rowwise, rep arrow==sql", flush=True)

    def run(fn):
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 3)

    # warmup every form once per length (JIT + pages-cache build)
    for L, base in bases.items():
        for fn in downstream(base).values():
            run(fn)

    samples: dict[tuple, list[float]] = {}
    for _pass in range(3):
        for L, base in bases.items():
            for name, fn in downstream(base).items():
                samples.setdefault((name, L), []).append(run(fn))

    print(f"\ntotal_chars={TOTAL_CHARS} cpus={CPUS} FUSED (full plan incl. UDF stage; best of 3)")
    names = ["base", "lang_explode", "lang_rowwise", "rep_arrow", "rep_sql"]
    print(f"{'form':<14}" + "".join(f"{L:>10}" for L in bases))
    for name in names:
        row = [min(samples[(name, L)]) for L in bases]
        print(f"{name:<14}" + "".join(f"{v:>10.3f}" for v in row))
    print("\nall samples:", json.dumps({f"{n}@{L}": samples[(n, L)] for (n, L) in samples}))
    spark.stop()


if __name__ == "__main__":
    main()
