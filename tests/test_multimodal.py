"""Multimodal plumbing: schema, batching, error capture, fan-out — real;
pixel decode stubbed (no media libs in sandbox), per module docstring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curator_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, pages_df):
    df = mm.media_from_pages(pages_df)
    df.cache()
    return df


@pytest.fixture(scope="module")
def decoded(media):
    df = mm.decode_media(media)
    df.cache()
    return df


def test_media_schema_and_kinds(media):
    assert dict(media.dtypes)["payload"] == "binary"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    assert media.count() == media.select("media_id").distinct().count()


def test_decode_schema_and_per_kind_fields(decoded):
    assert decoded.schema == mm.DECODED_SCHEMA
    rows = decoded.collect()
    assert rows and all(r.ok == "ok" for r in rows)
    for r in rows:
        if r.kind == "image":
            assert r.width and r.height and r.channels == 3 and r.n_frames is None
        elif r.kind == "audio":
            assert r.sample_rate and r.n_samples and r.width is None
        else:
            assert r.n_frames and r.fps and r.sample_rate is None
        assert r.byte_entropy > 0 and 0 <= r.mean_byte <= 255


def test_decode_deterministic_under_repartition(media, decoded):
    again = {
        r.media_id: r
        for r in mm.decode_media(media.repartition(7, "media_id")).collect()
    }
    for r in decoded.collect():
        o = again[r.media_id]
        assert (r.width, r.height, r.n_frames, r.fps, r.sample_rate) == (
            o.width,
            o.height,
            o.n_frames,
            o.fps,
            o.sample_rate,
        )
        assert r.byte_entropy == o.byte_entropy


def test_frame_sample_counts(decoded):
    fs = mm.frame_sample(decoded, every_n=10)
    rows = fs.collect()
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r)
    vids = {r.media_id: r for r in decoded.filter(F.col("kind") == "video").collect()}
    assert set(per) == set(vids)
    for mid, frames in per.items():
        n = vids[mid].n_frames
        assert len(frames) == (n + 9) // 10  # ceil(n/10) sampled indices
        idxs = sorted(f.frame_idx for f in frames)
        assert idxs[0] == 0 and idxs[-1] <= n - 1
        for f in frames:
            assert abs(f.ts_sec - f.frame_idx / vids[mid].fps) < 1e-9


def test_resize_plan_bounds(decoded):
    for r in mm.resize_plan(decoded, max_side=100).collect():
        assert max(r.target_width, r.target_height) <= 100
        # aspect ratio preserved within rounding
        assert abs(r.target_width / r.target_height - r.width / r.height) < 0.15


def test_unknown_kind_and_size_guard(spark):
    rows = [(1, "hologram", b"abc", "x/y", 3), (2, "image", b"\x00" * 10, "image/x", 10)]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.decode_media(df).collect()}
    assert out[1].ok == "unsupported_kind" and out[2].ok == "ok"
