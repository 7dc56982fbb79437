"""Train-on-golden / apply-distributed classifier: the BASELINE.json
acceptance gate (keep/drop F1 >= 0.99 vs reference labels), mirrored from
the reference fork's train/predict flow (train_classifier.py, predict.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curator_spark.operators import classifier as clf
from curator_spark.plans.pipeline import quality_filter


@pytest.fixture(scope="module")
def scored(pages_df):
    df = clf.feature_stage(quality_filter(pages_df))
    df.cache()
    return df


def test_f1_gate(spark, scored, golden):
    weights = clf.fit_on_golden(golden)
    pred = clf.apply_model(scored, weights)
    gold = spark.createDataFrame(golden[["url", "keep"]].rename(columns={"keep": "gold_keep"}))
    joined = pred.select("url", "pred_keep").join(gold, "url")
    f1 = clf.f1_against(joined, "pred_keep", "gold_keep")
    assert f1 >= 0.99, f"classifier keep/drop F1 {f1} below acceptance gate"


def test_distributed_fit_matches_single_node(scored, golden):
    """The X'X/X'y aggregation fit must be BIT-identical to the driver-side
    fit on golden labels (integer normal equations, same solve)."""
    w_dist = clf.fit_distributed(scored)
    w_gold = clf.fit_on_golden(golden)
    assert w_dist.tolist() == w_gold.tolist()


def test_hard_rules_force_drop(scored, golden):
    weights = clf.fit_on_golden(golden)
    pred = clf.apply_model(scored, weights)
    assert pred.filter((F.col("f_any_hard") == 1) & F.col("pred_keep")).count() == 0


def test_score_agreement_rate(scored, golden):
    weights = clf.fit_on_golden(golden)
    pred = clf.apply_model(scored, weights).select("url", "pred_score").toPandas()
    merged = pred.merge(golden[["url", "score"]], on="url")
    agree = (merged["pred_score"] == merged["score"]).mean()
    assert agree >= 0.95, f"score agreement {agree}"
