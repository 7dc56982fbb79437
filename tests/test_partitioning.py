"""Skew defense: salted url-hash repartitioning must spread a host-skewed
crawl (datagen plants ~40% of pages on one hot host) evenly, where a naive
host-key partitioning concentrates them (north rule: explicit salted
repartitioning to defuse host-level skew at 10^12-document scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from curator_spark.functions.partitioning import salted_repartition

N_PARTS = 16


def _partition_sizes(df):
    return [
        r.n
        for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]


def test_fixture_is_host_skewed(pages_df):
    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    top = (
        pages_df.groupBy(host.alias("h")).count().orderBy(F.col("count").desc()).first()
    )
    assert top["count"] > 0.3 * pages_df.count()  # one hot host dominates


def test_salted_repartition_balances_hot_host(pages_df):
    total = pages_df.count()
    naive = pages_df.repartition(N_PARTS, F.regexp_extract("url", r"https://([^/]+)/", 1))
    salted = salted_repartition(pages_df, "url", N_PARTS)

    naive_max = max(_partition_sizes(naive))
    salted_sizes = _partition_sizes(salted)
    ideal = total / N_PARTS

    # host-partitioned: the hot host lands in one partition -> >30% of rows
    assert naive_max > 0.3 * total
    # salted: every partition within 2x of ideal, none empty of the total
    assert len(salted_sizes) == N_PARTS
    assert max(salted_sizes) < 2 * ideal
    assert min(salted_sizes) > 0.3 * ideal


def test_salt_changes_assignment_not_content(pages_df):
    a = salted_repartition(pages_df, "url", N_PARTS, salt="s1")
    b = salted_repartition(pages_df, "url", N_PARTS, salt="s2")
    assert sorted(r.url for r in a.select("url").collect()) == sorted(
        r.url for r in b.select("url").collect()
    )
