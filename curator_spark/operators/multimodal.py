"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Reference analog: curator's multimodal prompts carry base64 images/files with
mime sniffing and size guards (/root/reference/src/bespokelabs/curator/types/
prompt.py:49-135, request_processor/online/base_online_request_processor.py:
110-164, size limit openai_online_request_processor.py:260-264). Our engine
treats media as first-class table data instead of request payloads:

- media table schema: (media_id, kind, payload binary, mime, n_bytes)
- transforms are Arrow-batched ``mapInPandas`` stages with explicit output
  schemas — the Spark-side plumbing (schema, batch shape, partitioning) is
  real and tested at any scale.
- the actual pixel/sample decoding is STUBBED: the sandbox has no
  image/audio libraries, so ``decode_media`` computes deterministic
  metadata from the bytes (size-derived dims) and byte-level statistics
  (entropy, histogram) that are real computations. Plug a real decoder into
  ``_decode_payload`` (PIL/torchaudio/av) behind the same schema and the
  plan does not change.

Scale notes: payloads never leave the JVM->Arrow batch except inside the
executor (no collect); `spark.sql.files.maxPartitionBytes` governs scan
splits of wide binary rows; frame sampling fans out rows via explode after
the cheap metadata pass, so the expensive per-frame work can be repartitioned
independently of source file layout.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAX_PAYLOAD_BYTES = 20 * 1024 * 1024  # size guard, openai_online:260-264 analog

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("ok", StringType()),  # 'ok' | error tag (per-row capture)
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", DoubleType()),
        StructField("byte_entropy", DoubleType()),
        StructField("mean_byte", DoubleType()),
    ]
)


def media_from_pages(pages: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the pages fixture: html bytes
    stand in for encoded payloads; kind cycles by id hash."""
    payload = F.col("html")
    mid = F.xxhash64("url")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(mid, F.lit(3)) + 1).cast("int")
    )
    mime = F.concat(kind, F.lit("/x-stub"))
    return pages.select(
        mid.alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        mime.alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _decode_payload(kind: str, payload: bytes) -> dict:
    """STUB decoder — deterministic fake dims derived from a content hash.

    A real deployment replaces this body with PIL.Image.open /
    soundfile.read / av.open; everything else (schema, batching, explode)
    stays identical. Raises NotImplementedError only for unknown kinds."""
    h = hashlib.md5(payload).digest()
    if kind == "image":
        return {
            "width": 64 + h[0] % 192,
            "height": 64 + h[1] % 192,
            "channels": 3,
        }
    if kind == "audio":
        return {
            "sample_rate": (8000, 16000, 44100)[h[2] % 3],
            "n_samples": 1000 + int.from_bytes(h[3:5], "big"),
        }
    if kind == "video":
        return {"n_frames": 24 + h[5] % 240, "fps": float((24, 25, 30)[h[6] % 3])}
    raise NotImplementedError(f"unknown media kind: {kind}")


def _byte_stats(payload: bytes) -> tuple[float, float]:
    if not payload:
        return 0.0, 0.0
    # np.bincount on a zero-copy byte view: a pure-python per-byte loop here
    # costs 20M iterations/row at the payload size guard — ~100x slower.
    counts = np.bincount(np.frombuffer(payload, np.uint8), minlength=256)
    n = len(payload)
    nz = counts[counts > 0]
    ent = -sum((c / n) * math.log2(c / n) for c in nz.tolist())
    mean = sum(i * c for i, c in enumerate(counts.tolist())) / n
    return ent, mean


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata/feature extraction with per-row error capture
    (rows never fail the job — parity with curator's per-row error rows,
    prompt_formatter.py:129-195)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                rec = dict.fromkeys(
                    (
                        "width",
                        "height",
                        "channels",
                        "sample_rate",
                        "n_samples",
                        "n_frames",
                    ),
                    None,
                )
                rec["fps"] = None
                payload = bytes(r.payload) if r.payload is not None else b""
                rec.update(media_id=r.media_id, kind=r.kind, n_bytes=len(payload))
                if len(payload) > MAX_PAYLOAD_BYTES:
                    rec["ok"] = "too_large"
                else:
                    try:
                        rec.update(_decode_payload(r.kind, payload))
                        rec["ok"] = "ok"
                    except NotImplementedError:
                        rec["ok"] = "unsupported_kind"
                ent, mean = _byte_stats(payload)
                rec["byte_entropy"] = ent
                rec["mean_byte"] = mean
                out.append(rec)
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling as a native fan-out: one row per sampled frame
    index (cheap metadata explode; per-frame decode work would hang off
    these rows and can be repartitioned freely)."""
    v = decoded.filter((F.col("kind") == "video") & (F.col("ok") == "ok"))
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return v.select(
        "media_id",
        "n_frames",
        "fps",
        F.explode(idx).alias("frame_idx"),
    ).withColumn("ts_sec", F.col("frame_idx") / F.col("fps"))


def resize_plan(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning as native columns: target dims preserving aspect
    ratio, capped at max_side (the byte-level resize itself is the stubbed
    decoder's job downstream)."""
    img = decoded.filter((F.col("kind") == "image") & (F.col("ok") == "ok"))
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return img.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )
