"""Frozen golden hash book: pins the pipeline's exact semantics in git.

The structural golden tests (oracle vs Spark, same functions both sides)
cannot catch an accidental semantics change — both sides shift in lockstep.
This hash book (analog of the reference's sha256 hash book,
/root/reference/tests/integrations/test_all.py:24-25) freezes the expected
per-url outputs for sf0.001 at commit time; any change to rules/lm/datagen
that alters byte-level outputs fails here and must be a deliberate
regeneration (tools: regenerate via the snippet in git history / BENCH.md).
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest

BOOK_PATH = os.path.join(os.path.dirname(__file__), "golden", "sf0001_hash_book.json")


@pytest.fixture(scope="module")
def book():
    with open(BOOK_PATH) as f:
        return json.load(f)


def test_oracle_matches_frozen_book(golden, book):
    g = golden.sort_values("url").reset_index(drop=True)
    assert len(g) == book["n"]
    assert int(g["keep"].sum()) == book["keep_count"]
    records = []
    for r in g.itertuples(index=False):
        records.append(
            {
                "url": r.url,
                "scrubbed_sha256": hashlib.sha256(r.scrubbed_text.encode()).hexdigest(),
                "extracted_sha256": hashlib.sha256(r.extracted_text.encode()).hexdigest(),
                "lang_pred": r.lang_pred,
                "perplexity": repr(r.perplexity),
                "lang_conf": repr(r.lang_conf),
                "score": int(r.score),
                "keep": bool(r.keep),
                "drop_rules": list(r.drop_rules),
            }
        )
    corpus_sha = hashlib.sha256(json.dumps(records, sort_keys=True).encode()).hexdigest()
    if corpus_sha != book["corpus_sha256"]:
        frozen = {r["url"]: r for r in book["records"]}
        for rec in records:
            assert rec == frozen[rec["url"]], f"drift at {rec['url']}"
    assert corpus_sha == book["corpus_sha256"]


def test_spark_pipeline_matches_frozen_book(pages_df, book):
    from pyspark.sql import functions as F

    from curator_spark.plans.pipeline import quality_filter

    out = (
        quality_filter(pages_df)
        .select(
            "url",
            F.sha2(F.col("scrubbed_text").cast("binary"), 256).alias("s_sha"),
            "keep",
            "score",
        )
        .collect()
    )
    frozen = {r["url"]: r for r in book["records"]}
    assert len(out) == book["n"]
    for r in out:
        f = frozen[r.url]
        assert r.s_sha == f["scrubbed_sha256"], r.url
        assert r.keep == f["keep"] and r.score == f["score"], r.url
