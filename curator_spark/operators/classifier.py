"""Train-then-apply score classifier — the reference fork's quality-filter
workflow (train a classifier on LLM-scored pages, apply it to the corpus:
/root/reference/examples/custom/train_classifier.py, predict.py) re-expressed
deterministically on Spark.

- Features: the pipeline's own rule flags + hard-rule indicator (all already
  computed by native stages — no extra text pass).
- Training: closed-form ridge regression on a labeled sample, driver-side
  numpy (tiny: 10 weights). Deterministic — no SGD, no seed sensitivity.
- Inference: Arrow-batched pandas UDF over the feature columns, weights
  broadcast in the closure (executor-side, load-once), prediction
  round+clipped to [0,5] exactly like np.clip(int(x),0,5)
  (predict.py:63, train_classifier.py:54).

Acceptance: F1 of (predicted keep) vs golden keep >= 0.99 — the
BASELINE.json metric — enforced by tests/test_classifier.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from .. import rules
from .verdict import flag_columns

FEATURE_NAMES = list(rules.RULE_NAMES) + ["any_hard"]


def feature_stage(df: DataFrame) -> DataFrame:
    """Rule flags as 0/1 feature columns (native, codegen)."""
    flags = flag_columns()
    for r in rules.RULE_NAMES:
        df = df.withColumn(f"f_{r}", flags[r].cast("int"))
    any_hard = None
    for r in rules.HARD_RULES:
        c = F.col(f"f_{r}")
        any_hard = c if any_hard is None else F.greatest(any_hard, c)
    return df.withColumn("f_any_hard", any_hard)


def train_ridge(features: np.ndarray, labels: np.ndarray, l2: float = 1e-6) -> np.ndarray:
    """Closed-form ridge: w = (X'X + l2 I)^-1 X'y with bias column.
    Returns weight vector of len(FEATURE_NAMES)+1 (bias last)."""
    x = np.asarray(features, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)
    xb = np.hstack([x, np.ones((len(x), 1))])
    a = xb.T @ xb + l2 * np.eye(xb.shape[1])
    return np.linalg.solve(a, xb.T @ y)


def fit_distributed(scored: DataFrame, l2: float = 1e-6, label_col: str = "score") -> np.ndarray:
    """Closed-form ridge fit as ONE distributed aggregation — the scale path
    (the reference trains driver-side on a collected corpus,
    train_classifier.py:49-63; at 100 TB that is the whole corpus through
    one process). X'X and X'y over 0/1 feature columns are integer sums, so
    the d(d+1)/2 + d aggregate values are exact under any shuffle order and
    the solved weights are BIT-IDENTICAL to a single-node fit on the same
    rows (tests pin this against ``fit_on_golden``). One tiny row reaches
    the driver; the 11x11 solve is microseconds."""
    cols = [f"f_{name}" for name in rules.RULE_NAMES] + ["f_any_hard"]
    aggs = []
    for i, ci in enumerate(cols):
        for j in range(i, len(cols)):
            aggs.append(
                F.sum((F.col(ci) * F.col(cols[j])).cast("long")).alias(f"xx_{i}_{j}")
            )
        aggs.append(F.sum((F.col(ci) * F.col(label_col)).cast("long")).alias(f"xy_{i}"))
    aggs.append(F.sum(F.col(label_col).cast("long")).alias("y_sum"))
    aggs.append(F.count("*").alias("n"))
    row = scored.agg(*aggs).first().asDict()
    d = len(cols) + 1  # + bias
    a = np.zeros((d, d))
    b = np.zeros(d)
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            a[i, j] = a[j, i] = row[f"xx_{i}_{j}"] or 0
        # binary features: sum(ci * bias) == sum(ci) == sum(ci*ci)
        a[i, d - 1] = a[d - 1, i] = row[f"xx_{i}_{i}"] or 0
        b[i] = row[f"xy_{i}"] or 0
    a[d - 1, d - 1] = row["n"]
    b[d - 1] = row["y_sum"] or 0
    a += l2 * np.eye(d)
    return np.linalg.solve(a, b)


def fit_on_golden(golden: pd.DataFrame) -> np.ndarray:
    """Train from oracle golden labels (the reference trains on LLM scores;
    our deterministic stand-in trains on the oracle's scores)."""
    feats = []
    for r in golden.itertuples(index=False):
        fired = set(r.drop_rules)
        row = [1.0 if name in fired else 0.0 for name in rules.RULE_NAMES]
        row.append(1.0 if fired & set(rules.HARD_RULES) else 0.0)
        feats.append(row)
    return train_ridge(np.array(feats), golden["score"].to_numpy())


def apply_model(df: DataFrame, weights: np.ndarray, batch_size: int = 512) -> DataFrame:
    """Batched inference map (predict.py:52-66 shape): vectorized linear
    model over the feature columns, round + clip to [0,5]."""
    w = np.asarray(weights, dtype=np.float64)
    cols = [f"f_{name}" for name in rules.RULE_NAMES] + ["f_any_hard"]

    @F.pandas_udf(IntegerType())
    def predict(*feature_series: pd.Series) -> pd.Series:
        x = np.column_stack([s.to_numpy(dtype=np.float64) for s in feature_series])
        raw = x @ w[:-1] + w[-1]
        # np.clip(int(round(x)), 0, 5) parity, vectorized per Arrow batch
        return pd.Series(np.clip(np.rint(raw), 0, 5).astype(np.int32))

    return df.withColumn("pred_score", predict(*[F.col(c) for c in cols])).withColumn(
        "pred_keep", F.col("pred_score") >= F.lit(rules.KEEP_THRESHOLD)
    )


def f1_against(df: DataFrame, pred_col: str = "pred_keep", label_col: str = "keep") -> float:
    """A7 aggregation: F1 of predicted keep vs reference keep."""
    row = df.agg(
        F.sum((F.col(pred_col) & F.col(label_col)).cast("long")).alias("tp"),
        F.sum((F.col(pred_col) & ~F.col(label_col)).cast("long")).alias("fp"),
        F.sum((~F.col(pred_col) & F.col(label_col)).cast("long")).alias("fn"),
    ).first()
    tp, fp, fn = row.tp or 0, row.fp or 0, row.fn or 0
    if tp == 0:
        return 0.0
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    return 2 * p * r / (p + r)
