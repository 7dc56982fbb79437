"""Stage-attribution profile for minhash_lsh_pairs at sf0.1 (5000 docs).

Times each subtree of the plan in isolation (noop writes so nothing is
pruned) to find which stage dominates the ~6.6 s headline wall.
Run: python tools/profile_minhash.py [sf_dir]
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


def mat(df, label, n=3):
    best = None
    for _ in range(n):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        w = time.monotonic() - t0
        best = w if best is None else min(best, w)
    print(f"{label:42s} {best:7.3f} s")
    return best


def main():
    spark = get_spark(app_name="profile-minhash", master="local[32]", shuffle_partitions=64)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select("doc_id", "text")
    docs.count()

    # 0. scan only
    mat(docs, "scan only")

    # 1. SPEC shingles (HOF transform) without explode — kept for contrast
    sh = docs.select("doc_id", dedup.word_shingles(F.col("text")).alias("s"))
    mat(sh, "spec shingles (HOF transform, no explode)")

    # 2. production shingle rows (codegen explode(sequence)+slice+concat_ws)
    ex = dedup.shingle_rows(docs)
    mat(ex, "shingle_rows (codegen)")

    # 3. + production signature agg (1x md5 -> 8 affine min-longs)
    h32 = F.conv(F.substring(F.md5(F.col("s")), 1, 8), 16, 10).cast("long")
    sig = ex.select("id", h32.alias("_h")).groupBy("id").agg(
        *[
            F.min((F.col("_h") * dedup.MINHASH_A[i] + dedup.MINHASH_B[i]) % dedup.MINHASH_P).alias(f"h{i}")
            for i in range(8)
        ]
    )
    mat(sig, "+ sig agg (1x md5 + 8 affine, production)")

    # 3b. OLD salted-md5 family (8 digests per shingle) — cost contrast
    sig_old = ex.groupBy("id").agg(
        *[F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("s")))).alias(f"h{i}") for i in range(8)]
    )
    mat(sig_old, "+ sig agg (8x salted md5, old family)")

    # 4. full operator
    mat(dedup.minhash_lsh_candidates(docs, num_hashes=8, bands=4, w=3), "full minhash_lsh_candidates")

    # 5. alternative shingle construction: posexplode tokens, window-free
    #    self-generated shingles via explode of token array + lead-free concat
    toks = F.split(F.trim(F.col("text")), r"\s+")
    ex_alt = (
        docs.select(F.col("doc_id").alias("id"), F.posexplode(toks).alias("p", "w"))
    )
    mat(ex_alt, "posexplode tokens only")

    spark.stop()


if __name__ == "__main__":
    main()
