"""JSONL line-record source: per-row error capture instead of scan failure
(S4 — the reference's line-by-line pydantic validation of stage files,
base_online_request_processor.py:346-352)."""

from __future__ import annotations

from pyspark.sql import functions as F

from curator_spark.sources.jsonl import read_jsonl_with_errors, split_valid_corrupt

DDL = "event_id long, kind string, value double"


def _write_fixture(tmp_path):
    lines = [
        '{"event_id": 1, "kind": "view", "value": 1.5}',
        '{"event_id": 2, "kind": "click", "value": 0.25}',
        '{"event_id": 3, "kind": "view"',  # truncated json
        "not json at all",
        '{"event_id": 4, "kind": "buy", "value": 9.99}',
        '{"event_id": "not-a-number", "kind": "view", "value": 1.0}',  # type error
    ]
    p = tmp_path / "events.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_corrupt_capture(spark, tmp_path):
    path = _write_fixture(tmp_path)
    df = read_jsonl_with_errors(spark, path, DDL)
    rows = df.collect()
    assert len(rows) == 6  # no row lost, scan never fails
    ok = [r for r in rows if r.ok]
    bad = [r for r in rows if not r.ok]
    assert {r.event_id for r in ok} == {1, 2, 4}
    assert len(bad) == 3
    # every corrupt row carries its raw line for inspection/re-drive
    assert all(r.raw_error for r in bad)
    assert any("not json at all" in r.raw_error for r in bad)

    valid, corrupt = split_valid_corrupt(df)
    assert valid.columns == ["event_id", "kind", "value"]
    assert valid.count() == 3 and corrupt.count() == 3
    assert valid.agg(F.sum("value")).first()[0] == 1.5 + 0.25 + 9.99


def test_jsonl_export_roundtrip(spark, pages_df, golden, tmp_path):
    """K4 json variant: gzip JSONL shards read back equal the keep set."""
    from curator_spark.plans.pipeline import export_corpus, quality_filter

    out = str(tmp_path / "corpus_jsonl")
    export_corpus(quality_filter(pages_df), out, target_rows_per_file=200, fmt="json")
    back = spark.read.json(out)
    gold = golden[golden["keep"]]
    assert back.count() == len(gold)
    got = {r.url: r.scrubbed_text for r in back.select("url", "scrubbed_text").collect()}
    for r in gold.itertuples(index=False):
        assert got[r.url] == r.scrubbed_text
