"""Lifecycle semantics: fingerprint memoization, crash-resume, metrics.

Ports the reference's cache/resume test strategy (SURVEY.md §5 items 2-3;
/root/reference/tests/unittests/test_caching.py:12-96, conftest.py:31-35
cached_working_dir resume fixtures) onto the staged-commit runner."""

from __future__ import annotations

import os

import pytest

from curator_spark.datagen import pages_path_for
from curator_spark.plans import runner as R


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    return pages_path_for(
        "/root/testdata/sf0.001", cache_root=str(tmp_path_factory.mktemp("pg"))
    )


def _config(pages_path, out_root, **kw):
    return R.RunConfig(input_path=pages_path, output_root=str(out_root), num_chunks=4, **kw)


def test_run_resume_and_cache(spark, pages_path, tmp_path, golden):
    cfg = _config(pages_path, tmp_path / "out")

    # simulate a crash after 2 chunks: pre-commit chunks 0,1 then run
    res1 = R.run_quality_filter(spark, cfg)
    assert not res1.cache_hit and res1.chunks_run == 4

    # rerun -> whole-run cache hit, no job
    res2 = R.run_quality_filter(spark, cfg)
    assert res2.cache_hit

    out = R.load_output(spark, res1).toPandas()
    assert len(out) == len(golden)
    assert out["url"].is_unique  # no duplicates across chunk commits

    # output matches golden labels regardless of chunking
    merged = out.merge(
        golden[["url", "keep", "scrubbed_text"]], on="url", suffixes=("", "_g")
    )
    assert (merged["keep"] == merged["keep_g"]).all()
    assert merged["scrubbed_text"].equals(merged["scrubbed_text_g"])

    # remainder anti-join is empty once complete
    pages = spark.read.parquet(pages_path)
    assert R.resume_remainder(spark, pages, res1).count() == 0


def test_crash_resume_skips_committed(spark, pages_path, tmp_path, golden):
    cfg = _config(pages_path, tmp_path / "out2")
    run_id = R.run_fingerprint(cfg)
    run_dir = os.path.join(cfg.output_root, "runs", run_id)

    # run only chunks 0-1 by faking a crash: run fully, then delete 2,3 + manifest
    res = R.run_quality_filter(spark, cfg)
    os.remove(os.path.join(run_dir, "manifest.json"))
    import shutil

    shutil.rmtree(os.path.join(run_dir, "chunk=2"))
    shutil.rmtree(os.path.join(run_dir, "chunk=3"))

    res2 = R.run_quality_filter(spark, cfg)
    assert not res2.cache_hit
    assert res2.chunks_skipped == 2 and res2.chunks_run == 2

    out = R.load_output(spark, res2).toPandas()
    assert len(out) == len(golden) and out["url"].is_unique


def test_quarantine_and_failed_metric(spark, tmp_path, golden):
    """K3/F2: rows whose extract fails land in a persisted failed_rows table
    with error tags (and count into docs_failed), without failing the job."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from curator_spark.datagen import PAGES_SCHEMA, build_pages_pdf

    pdf = build_pages_pdf("/root/testdata/sf0.001").iloc[:100].copy()
    bad = pd.DataFrame(
        [
            {"url": "https://bad.example/undecodable", "warc_ts": pdf["warc_ts"].iloc[0],
             "html": b"\xff\xfe\xfa broken", "text": "", "lang": "en"},
            {"url": "https://bad.example/markerless", "warc_ts": pdf["warc_ts"].iloc[1],
             "html": b"<html><body>no paragraph marker</body></html>", "text": "", "lang": "en"},
            {"url": "https://bad.example/nullhtml", "warc_ts": pdf["warc_ts"].iloc[2],
             "html": None, "text": "", "lang": "en"},
        ]
    )
    src = tmp_path / "in_bad"
    src.mkdir()
    pq.write_table(
        pa.Table.from_pandas(pd.concat([pdf, bad], ignore_index=True), schema=PAGES_SCHEMA,
                             preserve_index=False),
        str(src / "a.parquet"),
    )
    cfg = R.RunConfig(input_path=str(src), output_root=str(tmp_path / "outq"), num_chunks=2)
    res = R.run_quality_filter(spark, cfg)
    failed = R.read_table(spark, cfg.output_root, "failed_rows").toPandas()
    tags = dict(zip(failed["url"], failed["error"]))
    assert tags == {
        "https://bad.example/undecodable": "decode_error",
        "https://bad.example/markerless": "no_marker",
        "https://bad.example/nullhtml": "null_html",
    }
    assert (failed["run_id"] == res.run_id).all()
    metrics = R.read_table(spark, cfg.output_root, "metrics").toPandas()
    assert metrics["docs_failed"].sum() == 3
    # failed rows are still verdict rows (dropped by the len rule), not lost
    out = R.load_output(spark, res).toPandas()
    assert len(out) == 103
    assert not out[out["url"].str.startswith("https://bad.example/")]["keep"].any()


def test_resume_prunes_input_scan(spark, pages_path, tmp_path, monkeypatch):
    """With chunk_input staging, a resume must read ONLY the missing chunks'
    input files (scan pruning — the Iceberg-partition analog), and exactly
    one pipeline job must cover all missing chunks."""
    import shutil

    cfg = _config(pages_path, tmp_path / "outp", chunk_input=True)
    run_id = R.run_fingerprint(cfg)
    run_dir = os.path.join(cfg.output_root, "runs", run_id)
    R.run_quality_filter(spark, cfg)
    os.remove(os.path.join(run_dir, "manifest.json"))
    shutil.rmtree(os.path.join(run_dir, "chunk=2"))
    shutil.rmtree(os.path.join(run_dir, "chunk=3"))

    seen = []
    real_qf = R._pipeline_mod.quality_filter

    def spy_qf(src, **kw):
        seen.append(sorted(src.inputFiles()))
        return real_qf(src, **kw)

    monkeypatch.setattr(R._pipeline_mod, "quality_filter", spy_qf)
    res = R.run_quality_filter(spark, cfg)
    assert res.chunks_skipped == 2 and res.chunks_run == 2
    assert len(seen) == 1  # ONE job covered both missing chunks
    assert seen[0], "resume scan read no files"
    for f in seen[0]:
        assert "/input_chunked/chunk=2/" in f or "/input_chunked/chunk=3/" in f, f
    out = R.load_output(spark, res).toPandas()
    assert out["url"].is_unique and len(out) == 500


def test_retry_commits_metrics_exactly_once(spark, pages_path, tmp_path, monkeypatch):
    """A retry after partial promotion must not re-promote or double-count
    committed chunks: exactly one metrics row per chunk, exact totals."""
    calls = {"n": 0}
    real = R._chunk_metrics

    def flaky(out, run_id, chunk, wall_ms):
        calls["n"] += 1
        if calls["n"] == 2:  # fail while committing the 2nd chunk
            raise RuntimeError("injected metrics failure")
        return real(out, run_id, chunk, wall_ms)

    monkeypatch.setattr(R, "_chunk_metrics", flaky)
    cfg = _config(pages_path, tmp_path / "outr")
    res = R.run_quality_filter(spark, cfg)
    assert res.chunks_run == 4
    metrics = R.read_table(spark, cfg.output_root, "metrics").toPandas()
    assert len(metrics) == 4
    assert sorted(metrics["chunk"]) == [0, 1, 2, 3]
    assert metrics["docs_seen"].sum() == 500


def test_failed_run_leaves_no_phantom_metrics(spark, pages_path, tmp_path, monkeypatch):
    """Metrics/quarantine commit before the chunk rename; when a run fails
    terminally, the provisional rows of never-committed chunks must be
    removed — metrics must exist iff the chunk committed."""
    import pytest as _pytest

    real_rename = os.rename

    def deny_chunk_promotion(src, dst):
        if "/chunk=" in dst.replace("\\", "/"):
            raise OSError("injected promotion failure")
        return real_rename(src, dst)

    monkeypatch.setattr(R.os, "rename", deny_chunk_promotion)
    cfg = _config(pages_path, tmp_path / "outf", max_attempts=1)
    with _pytest.raises(OSError):
        R.run_quality_filter(spark, cfg)
    metrics_dir = os.path.join(cfg.output_root, "metrics")
    leftover = [f for f in os.listdir(metrics_dir)] if os.path.isdir(metrics_dir) else []
    assert leftover == [], leftover
    assert not os.path.isdir(os.path.join(cfg.output_root, "failed_rows", f"run_id={R.run_fingerprint(cfg)}"))
    cat = R.read_table(spark, cfg.output_root, "runs_catalog").toPandas()
    assert "FAILED" in set(cat["status"])
    # no staging garbage accumulates either
    run_dir = os.path.join(cfg.output_root, "runs", R.run_fingerprint(cfg))
    assert not [d for d in os.listdir(run_dir) if ".staging-" in d]


def test_cancel_run_records_catalog(spark, pages_path, tmp_path):
    cfg = _config(pages_path, tmp_path / "outc")
    run_id = R.cancel_run(cfg)
    cat = R.read_table(spark, cfg.output_root, "runs_catalog").toPandas()
    assert list(cat[cat["run_id"] == run_id]["status"]) == ["CANCELLED"]


def test_incremental_catalog_lifecycle(spark, tmp_path):
    """run_incremental records STARTED/COMPLETED like a fresh run."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from curator_spark.datagen import PAGES_SCHEMA, build_pages_pdf

    pdf = build_pages_pdf("/root/testdata/sf0.001")
    src1, src2 = tmp_path / "i1", tmp_path / "i2"
    src1.mkdir(), src2.mkdir()
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:200], schema=PAGES_SCHEMA,
                                        preserve_index=False), str(src1 / "a.parquet"))
    pq.write_table(pa.Table.from_pandas(pdf, schema=PAGES_SCHEMA,
                                        preserve_index=False), str(src2 / "a.parquet"))
    out_root = str(tmp_path / "out")
    res1 = R.run_quality_filter(spark, R.RunConfig(str(src1), out_root, num_chunks=2))
    cfg2 = R.RunConfig(str(src2), out_root, num_chunks=2)
    res2 = R.run_incremental(spark, cfg2, prior=res1)
    cat = R.read_table(spark, out_root, "runs_catalog").toPandas()
    inc = cat[cat["run_id"] == res2.run_id].sort_values("event_time")
    assert list(inc["status"]) == ["STARTED", "COMPLETED"]


def test_incremental_prior_scan_is_partition_pruned(spark, pages_path, tmp_path):
    """The per-chunk merge must read the prior output's `chunk=c` directory
    names as a partition column (file-level pruning), not recompute url-hash
    membership over the full prior output — the recompute form costs
    num_chunks full prior scans at scale. Layout mismatch falls back."""
    from pyspark.sql import functions as F

    cfg = R.RunConfig(input_path=pages_path, output_root=str(tmp_path / "outp"), num_chunks=3)
    res = R.run_quality_filter(spark, cfg)

    prior_df, pruned = R._prior_output_by_chunk(spark, cfg, res)
    assert pruned
    one = prior_df.filter(F.col("chunk") == 0)
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    # partition filter reaches the scan, and no hash recompute exists
    assert "PartitionFilters: [" in plan and "xxhash64" not in plan
    detail = plan[plan.index("PartitionFilters: [") :].splitlines()[0]
    assert "chunk" in detail
    # pruned read still yields exactly the committed chunk's rows
    direct = spark.read.parquet(os.path.join(res.run_dir, "chunk=0"))
    assert one.count() == direct.count() > 0

    # a prior run with a different layout must fall back to recompute
    cfg_other = R.RunConfig(
        input_path=pages_path, output_root=str(tmp_path / "outp"), num_chunks=5
    )
    fallback_df, pruned2 = R._prior_output_by_chunk(spark, cfg_other, res)
    assert not pruned2
    # fallback re-buckets: 5-way membership over the 3-chunk prior output
    assert fallback_df.select("chunk").distinct().count() == 5


def test_fingerprint_sensitivity(pages_path, tmp_path):
    a = R.run_fingerprint(_config(pages_path, tmp_path, salt="s1"))
    b = R.run_fingerprint(_config(pages_path, tmp_path, salt="s2"))
    c = R.run_fingerprint(_config(pages_path, tmp_path, salt="s1"))
    assert a != b and a == c


def test_metrics_and_catalog(spark, pages_path, tmp_path, golden):
    cfg = _config(pages_path, tmp_path / "out3")
    R.run_quality_filter(spark, cfg)
    metrics = R.read_table(spark, cfg.output_root, "metrics").toPandas()
    assert metrics["docs_seen"].sum() == len(golden)
    assert metrics["docs_kept"].sum() == int(golden["keep"].sum())
    # per-rule drop counters match the oracle
    fired_tox = sum(1 for lst in golden["drop_rules"] if "toxicity" in lst)
    assert metrics["drops_toxicity"].sum() == fired_tox
    cat = R.read_table(spark, cfg.output_root, "runs_catalog").toPandas()
    assert set(cat["status"]) == {"STARTED", "COMPLETED"}


def test_incremental_run(spark, tmp_path, golden):
    """Grow the input, run incrementally: only new urls are scored; output
    equals a full fresh run over the grown input."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from curator_spark.datagen import PAGES_SCHEMA, build_pages_pdf
    from curator_spark.plans.runner import load_output, metrics_summary, run_incremental

    pdf = build_pages_pdf("/root/testdata/sf0.001")
    half = pdf.iloc[:250]
    src1 = tmp_path / "in1"
    src1.mkdir()
    pq.write_table(
        pa.Table.from_pandas(half, schema=PAGES_SCHEMA, preserve_index=False),
        str(src1 / "a.parquet"),
    )
    src2 = tmp_path / "in2"
    src2.mkdir()
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=PAGES_SCHEMA, preserve_index=False),
        str(src2 / "a.parquet"),
    )

    out_root = str(tmp_path / "out")
    cfg1 = R.RunConfig(input_path=str(src1), output_root=out_root, num_chunks=3)
    res1 = R.run_quality_filter(spark, cfg1)
    assert load_output(spark, res1).count() == 250

    cfg2 = R.RunConfig(input_path=str(src2), output_root=out_root, num_chunks=3)
    res2 = run_incremental(spark, cfg2, prior=res1)
    assert not res2.cache_hit and res2.run_id != res1.run_id

    out = load_output(spark, res2).toPandas()
    assert len(out) == len(golden) and out["url"].is_unique
    merged = out.merge(golden[["url", "keep", "scrubbed_text"]], on="url", suffixes=("", "_g"))
    assert (merged["keep"] == merged["keep_g"]).all()
    assert merged["scrubbed_text"].equals(merged["scrubbed_text_g"])

    # rerun of the incremental = cache hit
    assert run_incremental(spark, cfg2, prior=res1).cache_hit

    summary = metrics_summary(spark, out_root, res2.run_id).collect()[0]
    assert summary.docs_seen == len(golden)
    assert summary.docs_kept == int(golden["keep"].sum())
