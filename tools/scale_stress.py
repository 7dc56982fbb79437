"""10x scale-stress run (round-4 verdict item): 1.2M pages / 1.2M docs.

Every routine bench number is sf0.1 at 24x replication (120k pages, 5k base
docs). This harness exercises the same plans at 10x that volume to convert
the plan-shape scaling argument into measured evidence:

- flagship quality-filter pipeline at BENCH_PAGES_REPLICATION=240
  (1.2M pages) via bench.py's pinned --pipeline-once subprocess;
- the dedup family (exact_dedup, minhash_lsh_pairs, minhash_jaccard_dedup,
  near_dup_survivors, simhash_near_pairs) over a 240x-replicated documents
  table (1.2M docs), with a 24x (120k docs) run of the same mutated corpus
  as the linearity baseline.

Replica mutation: every token w becomes "r{k}_w" — the VOCABULARY is
renamed per replica, token/shingle counts are untouched. Within a replica
the full relationship structure (exact dups, near dups, components) is
preserved; across replicas no word or shingle is shared, so cross-replica
pairs vanish and total pair volume scales linearly in k. (A first attempt
that INSERTED a replica token between words was discarded: the inserted
token became ~half of every doc's multiset, collapsing all within-replica
simhashes onto the token's hash — 25M bogus pairs at 10k docs.)
Deterministic — pure function of (base corpus, k).

Usage: python tools/scale_stress.py [cpus] [small_rep] [big_rep]
Writes nothing outside /tmp; prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SMALL = int(sys.argv[2]) if len(sys.argv) > 2 else 24
BIG = int(sys.argv[3]) if len(sys.argv) > 3 else 240
SF_DIR = "/root/testdata/sf0.1"
DEDUP_QUERIES = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "minhash_jaccard_dedup",
    "near_dup_survivors",
    "simhash_near_pairs",
]
# STRESS_QUERIES=a,b,c overrides the query list; STRESS_SKIP_FLAGSHIP=1
# skips the pinned flagship subprocesses (re-runs of a single family).
if os.environ.get("STRESS_QUERIES"):
    DEDUP_QUERIES = os.environ["STRESS_QUERIES"].split(",")


def replicated_docs_dir(spark, k: int) -> str:
    out = f"/tmp/scale_sf_x{k}"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        reps = spark.range(k).withColumnRenamed("id", "rep")
        mutated = (
            docs.crossJoin(reps)
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(n)).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(^|\s)(?=\S)"),
                    F.concat(F.lit("$1r"), F.col("rep").cast("string"), F.lit("_")),
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        mutated.repartition(max(CPUS, 16)).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
        open(marker, "w").close()
    return out


def run_dedup_family(spark, sf_dir: str, tag: str) -> dict:
    from curator_spark import queries as q

    walls, rows = {}, {}
    for name in DEDUP_QUERIES:
        # time CONSTRUCTION + full materialization: connected_components
        # localCheckpoints eagerly during construction, so timing the action
        # alone would hide the whole pair-finding phase of
        # near_dup_survivors — and the action must be a noop WRITE, not
        # count(): Catalyst eliminates cardinality-preserving left joins
        # (aggregates are provably unique on their grouping keys) under
        # count(), which hid 98% of repetition_signals' first-cut cost
        # (count 2.6 s vs real 193 s at 1.2M docs).
        t0 = time.monotonic()
        df = q.Q[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        walls[name] = round(time.monotonic() - t0, 2)
        # rows counted OUTSIDE the timed window by re-execution: persisting
        # inside the window would fold cache-store cost into the walls and
        # break comparability with earlier recorded numbers; the re-run
        # only costs untimed harness time
        rows[name] = df.count()
    rec = {"stress": f"dedup_{tag}", "cpus": CPUS, "walls_sec": walls, "rows": rows}
    print(json.dumps(rec), flush=True)
    return rec


def run_flagship(rep: int, cores: int) -> dict:
    from curator_spark.datagen import pages_path_for

    path = pages_path_for(SF_DIR, cache_root="/tmp/scale_pages", replication=rep)
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--pipeline-once", str(cores), path]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    t0 = time.monotonic()
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, timeout=3000)
    r = json.loads(out.stdout.strip().splitlines()[-1])
    rec = {
        "stress": f"flagship_x{rep}",
        "cores": cores,
        "wall_sec": round(r["wall"], 2),
        "rows": r["rows"],
        "docs_per_sec": round(r["rows"] / r["wall"], 1),
        "subprocess_total_sec": round(time.monotonic() - t0, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


# --------------------------------------------------------------------------
# Span-family pathological skew (round-5 verdict item #3). Two adversarial
# shapes for duplicate_spans / strip_duplicate_spans:
#
# - MEGA-SHINGLE: one 8-gram present in EVERY doc (sentinel appended to all
#   1.2M texts). Stresses the partitionBy(h) detection window — that one h
#   value lands ~n_docs rows in a single sort-based window partition, which
#   must spill, not OOM, and the wall must stay ~linear in n_docs.
# - MEGA-DOC: one document of ~4M tokens built by repeating the whole base
#   corpus, unioned with the base docs. Every base shingle recurs in the
#   mega doc, so ~all of its ~4M positions are duplicated hits — the
#   partitionBy(doc) islands window sees them in ONE partition (sort-based,
#   spills), and strip's Arrow cut stage handles one ~25MB row whose drop
#   set covers ~the whole doc.
# --------------------------------------------------------------------------

_SENTINEL = " ".join(f"megaspan{i}" for i in range(8))  # exactly one 8-gram


def _timed_noop(df) -> tuple[float, int]:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    wall = round(time.monotonic() - t0, 2)
    return wall, df.count()  # rows re-executed OUTSIDE the timed window


def megadoc_dir(spark, target_tokens: int = 4_000_000) -> str:
    out = "/tmp/scale_megadoc"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        texts = [r.text for r in docs.select("text").collect()]
        blob = " ".join(texts)
        n_blob = len(blob.split())
        reps = max(1, target_tokens // n_blob)
        mega = " ".join([blob] * reps)
        mega_df = spark.createDataFrame(
            [(10**9, mega)], "doc_id long, text string"
        )
        base = docs.select("doc_id", "text")
        base.unionByName(mega_df).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
        open(marker, "w").close()
    return out


def run_span_skew(spark) -> None:
    from curator_spark.operators import dedup as dd

    # mega-shingle at both replications -> linearity bound on the h-window
    for k in (SMALL, BIG):
        d = replicated_docs_dir(spark, k)
        docs = spark.read.parquet(os.path.join(d, "documents.parquet")).select(
            "doc_id", F.concat_ws(" ", "text", F.lit(_SENTINEL)).alias("text")
        )
        wall, rows = _timed_noop(dd.duplicate_spans(docs, w=8))
        print(
            json.dumps(
                {
                    "stress": f"span_megashingle_x{k}",
                    "cpus": CPUS,
                    "wall_sec": wall,
                    "span_rows": rows,
                }
            ),
            flush=True,
        )

    # mega-doc: detection window + strip's Arrow cut on one ~4M-token row
    d = megadoc_dir(spark)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    wall_det, rows_det = _timed_noop(dd.duplicate_spans(docs, w=8))
    stripped = dd.strip_duplicate_spans(docs, w=8)
    wall_strip, rows_strip = _timed_noop(stripped)
    mega = stripped.filter(F.col("doc_id") == 10**9).select(
        "n_words", "n_removed", "n_kept_words"
    ).collect()[0]
    print(
        json.dumps(
            {
                "stress": "span_megadoc",
                "cpus": CPUS,
                "detect_wall_sec": wall_det,
                "detect_rows": rows_det,
                "strip_wall_sec": wall_strip,
                "strip_rows": rows_strip,
                "mega_n_words": mega["n_words"],
                "mega_n_removed": mega["n_removed"],
                "mega_n_kept_words": mega["n_kept_words"],
            }
        ),
        flush=True,
    )


def run_decon_skew(spark) -> None:
    """Adversarial shapes for decontaminate (r5): a ~3.8M-token mega-doc
    (one input row explodes to millions of gram rows inside ONE task, and
    — being built from the whole base corpus — it hits nearly every
    contaminant gram), and the full-corpus worst case at BIG replication
    (contaminants = every doc: the self-join-equivalent gram-set size,
    broadcast disabled so the shuffle fallback carries it)."""
    from curator_spark.operators import dedup as dd

    d = megadoc_dir(spark)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    cont = docs.filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 10**9)).select(
        "doc_id", "text"
    )
    flagged = dd.decontaminate(docs, cont, w=13, mode="flag")
    wall, rows = _timed_noop(flagged)
    mega = flagged.filter(F.col("doc_id") == 10**9).select("n_hits").collect()[0]
    print(
        json.dumps(
            {
                "stress": "decon_megadoc",
                "cpus": CPUS,
                "wall_sec": wall,
                "rows": rows,
                "mega_n_hits": mega["n_hits"],
            }
        ),
        flush=True,
    )

    d = replicated_docs_dir(spark, BIG)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    worst = dd.decontaminate(
        docs, docs.select("doc_id", "text"), w=13, mode="flag", broadcast=False
    )
    wall, rows = _timed_noop(worst)
    n_cont = worst.filter("contaminated").count()
    print(
        json.dumps(
            {
                "stress": f"decon_worstcase_x{BIG}",
                "cpus": CPUS,
                "wall_sec": wall,
                "rows": rows,
                "contaminated": n_cont,
            }
        ),
        flush=True,
    )


def main() -> None:
    from curator_spark.session import get_spark

    span_only = os.environ.get("STRESS_MODE") == "span_skew"
    decon_only = os.environ.get("STRESS_MODE") == "decon_skew"

    # flagship first (own pinned subprocesses; no session held here)
    if not (span_only or decon_only) and not os.environ.get("STRESS_SKIP_FLAGSHIP"):
        for rep in (SMALL, BIG):
            for cores in (16, 32):
                run_flagship(rep, cores)

    spark = get_spark(
        app_name="scale-stress",
        master=f"local[{CPUS}]",
        shuffle_partitions=4 * CPUS,
    )
    if span_only:
        run_span_skew(spark)
    elif decon_only:
        run_decon_skew(spark)
    else:
        for k in (SMALL, BIG):
            d = replicated_docs_dir(spark, k)
            run_dedup_family(spark, d, f"x{k}")
        if os.environ.get("STRESS_SPAN_SKEW"):
            run_span_skew(spark)
    spark.stop()


if __name__ == "__main__":
    main()
