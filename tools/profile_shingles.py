"""Compare shingle-row construction strategies for exact-equality + speed.

All must produce the identical (id, shingle) multiset as
explode(word_shingles(text)) — w-word shingles joined by single spaces.
Run: python tools/profile_shingles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from curator_spark.operators import dedup  # noqa: E402
from curator_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
W = 3


def mat(df, label, n=3):
    best = None
    for _ in range(n):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        w = time.monotonic() - t0
        best = w if best is None else min(best, w)
    print(f"{label:46s} {best:7.3f} s")
    return best


def spec(docs):
    return docs.select(
        F.col("doc_id").alias("id"), F.explode(dedup.word_shingles(F.col("text"), W)).alias("s")
    )


def via_seq_slice(docs):
    """explode(sequence) then slice with a column start + concat_ws (codegen)."""
    t = F.trim(F.col("text"))
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    d = docs.select(F.col("doc_id").alias("id"), toks.alias("toks")).filter(
        F.size("toks") >= W
    )
    d = d.select(
        "id", "toks", F.explode(F.sequence(F.lit(1), F.size("toks") - (W - 1))).alias("i")
    )
    return d.select(
        "id", F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), W)).alias("s")
    )


def via_window_lead(docs):
    from pyspark.sql import Window

    t = F.trim(F.col("text"))
    d = docs.filter(F.length(t) > 0).select(
        F.col("doc_id").alias("id"), F.posexplode(F.split(t, r"\s+")).alias("p", "w0")
    )
    win = Window.partitionBy("id").orderBy("p")
    cols = [F.col("w0")] + [F.lead("w0", k).over(win).alias(f"w{k}") for k in range(1, W)]
    d = d.select("id", *cols)
    return d.filter(F.col(f"w{W-1}").isNotNull()).select(
        "id", F.concat_ws(" ", *[F.col(f"w{k}") for k in range(W)]).alias("s")
    )


def via_pandas(docs):
    import pandas as pd

    @F.pandas_udf("array<string>")
    def _sh(texts):
        out = []
        for t in texts:
            toks = t.strip().split() if t and t.strip() else []
            if len(toks) < W:
                out.append([])
            else:
                out.append([" ".join(toks[i : i + W]) for i in range(len(toks) - W + 1)])
        return pd.Series(out)

    return docs.select(F.col("doc_id").alias("id"), F.explode(_sh(F.col("text"))).alias("s"))


def main():
    spark = get_spark(app_name="profile-shingles", master="local[32]", shuffle_partitions=64)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select("doc_id", "text")
    docs.count()
    rep = docs.repartition(64, "doc_id")

    variants = {
        "spec (HOF transform)": spec,
        "seq+slice codegen": via_seq_slice,
        "window lead": via_window_lead,
        "pandas UDF": via_pandas,
    }
    for name, fn in variants.items():
        mat(fn(docs), name + " [1-task scan]")
    for name, fn in variants.items():
        if name == "window lead":
            continue
        mat(fn(rep), name + " [repartitioned 64]")

    # exact multiset equality vs spec
    ref = spec(docs).groupBy("id", "s").count()
    for name, fn in variants.items():
        if name == "spec (HOF transform)":
            continue
        got = fn(docs).groupBy("id", "s").count()
        diff = ref.exceptAll(got).count() + got.exceptAll(ref).count()
        print(f"equality vs spec — {name}: diff_rows={diff}")

    # NOTE: \s+ in python split() differs from java \s+? python str.split()
    # splits on unicode whitespace; check on the actual corpus above via diff.
    spark.stop()


if __name__ == "__main__":
    main()
