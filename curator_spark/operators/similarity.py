"""Similarity search over an embedding column (array<float>).

Two tiers, as a scale-aware pair:

- ``brute_force_topk``: exact cosine top-k, broadcast queries × corpus scan.
  O(|corpus|·|queries|) but embarrassingly parallel and shuffle-light (one
  per-corpus-partition partial top-k, then a tiny final top-k). This is the
  verifiable baseline (DuckDB oracle via list_cosine_similarity).
- ``lsh_ann_topk``: random-hyperplane sign-LSH bucketing; queries only join
  their own bucket (plus, with ``probes`` > 1, its single-bit-flip
  neighbors — multi-probe recall tuning), so work scales with bucket size,
  not corpus size. The hyperplanes are a deterministic function of
  (dim, num_planes, seed) — the same "model broadcast once" pattern as the
  pipeline's scoring UDFs.

Scoring is the vectorized ``cosine_scores`` pandas UDF (dedup.py) — the
interpreted higher-order-function fold it replaces measured ~7x slower in
the driver bench while being bit-identical (sequential cumsum accumulation).

At 10^12-vector scale brute force dies; the LSH variant's plan is:
narrow projection (bucket id per vector) -> shuffle on bucket -> per-bucket
top-k. IVF would replace the hash with a learned centroid argmin — same
plan shape, pluggable bucket function.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _as_vec, _seq_dot, cosine_scores


def _rank_window(part_col: str):
    # ORDER BY cos DESC with deterministic id tie-break
    return Window.partitionBy(part_col).orderBy(F.col("cos").desc(), F.col("id").asc())


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Physical shape: broadcast(queries) × corpus scan -> window top-k. The
    per-partition rank prune (rows > k per partition never shuffle) comes
    free from Spark's WindowGroupLimit pushdown on rank filters.
    Self-matches (same id) are excluded.
    """
    q = F.broadcast(queries.select(F.col(key).alias("qid"), F.col(vec_col).alias("qv")))
    c = corpus.select(F.col(key).alias("id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "id", cosine_scores(F.col("qv"), F.col("cv")).alias("cos"))
    )
    ranked = scored.withColumn("rank", F.row_number().over(_rank_window("qid")))
    return ranked.filter(F.col("rank") <= k).select("qid", "id", "cos", "rank")


# ---------------------------------------------------------------------------
# Sign-LSH bucketing
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, num_planes: int, seed: str = "lsh-v1") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: unit-free gaussian-ish
    components derived from sha256(seed|plane|i) — a pure function, identical
    on every executor/rerun (no RNG state, SURVEY.md §7 determinism)."""
    planes = []
    for p in range(num_planes):
        comps = []
        for i in range(dim):
            h = hashlib.sha256(f"{seed}|{p}|{i}".encode()).digest()
            # map 8 bytes -> [-0.5, 0.5)
            u = struct.unpack(">Q", h[:8])[0] / 2**64
            comps.append(u - 0.5)
        planes.append(comps)
    return planes


def lsh_bucket(vec: Column, dim: int, num_planes: int = 8, seed: str = "lsh-v1") -> Column:
    """Bucket id = sign bits of <vec, plane_p> packed into a long.

    Vectorized pandas UDF: all plane dots per Arrow batch in one stacked
    cumsum (sequential per-row accumulation — bit-identical signs to the
    fold-based expression this replaces, which Spark interpreted per plane
    per row)."""
    planes = np.array(_hyperplanes(dim, num_planes, seed), dtype=np.float64)
    weights = (1 << np.arange(num_planes)).astype(np.int64)

    @F.pandas_udf("long")
    def _bucket(vs):  # no hints: postponed annotations break pandas_udf introspection
        if len(vs) == 0:
            return pd.Series([], dtype="int64")

        def row(v):
            # degenerate vectors (_as_vec contract) -> null bucket (dropped
            # by the bucket equi-join), never a stage crash
            a = _as_vec(v, planes.shape[1])
            if a is None:
                return None
            return int(((_seq_dot(a, planes) >= 0) * weights).sum())

        try:  # uniform-dim fast path: one stacked cumsum per batch
            a = np.stack([np.asarray(v, dtype=np.float64) for v in vs])  # n×dim
            if a.ndim != 2 or a.shape[1] != planes.shape[1]:
                raise ValueError("degenerate batch")
        except (TypeError, ValueError):  # ragged/null rows: per-row fallback
            return pd.Series([row(v) for v in vs], dtype="object")
        # n×planes×dim products, cumsum over dim = sequential fold per dot
        dots = _seq_dot(a[:, None, :], planes[None, :, :])
        return pd.Series(((dots >= 0) * weights).sum(axis=1))

    return _bucket(vec)


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int,
    key: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 0,
    sample_size: int = 2048,
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: n_centroids corpus vectors chosen
    by content-hash order (md5 of the key — the same reshuffle-stable
    sampling as `deterministic_sample`), optionally refined with
    ``lloyd_iters`` rounds of spherical k-means over a bounded
    content-hash-ordered sample.

    Determinism (SURVEY §7): the sample is the FIRST ``sample_size`` rows of
    the same md5 ordering (collect preserves orderBy order), the iteration
    count is fixed (no convergence early-exit), assignment ties resolve to
    the lowest centroid index (np.argmax), and empty cells keep their
    previous centroid — the result is a pure function of (corpus content,
    n_centroids, lloyd_iters, sample_size), identical across reruns. Lloyd
    runs DRIVER-SIDE on the bounded sample (sample_size × dim floats —
    collect-trivial; the classic sample-then-broadcast quantizer build), so
    executors only ever see the finished broadcast centroids.
    """
    base = corpus.select(F.col(key).alias("id"), F.col(vec_col).alias("v")).filter(
        F.col("v").isNotNull() & (F.size(F.col("v")) > 0)
    )
    # the corpus dim = the MODAL vector length (tie -> smaller), found with
    # one tiny aggregation — never inferred from whichever row the content
    # hash happens to order first (a ragged first row must not make the
    # build discard every valid vector). Filtering ragged rows BEFORE the
    # limit also keeps the full centroid count available whenever enough
    # valid rows exist. Deterministic: pure aggregates + content-hash order.
    dims = base.groupBy(F.size(F.col("v")).alias("d")).count().collect()
    if not dims:
        return np.zeros((0, 0))
    dim = max(dims, key=lambda r: (r["count"], -r["d"]))["d"]
    # drop non-finite vectors BEFORE the limit (mirroring the ragged-row
    # pre-limit filter): a NaN/inf-element vector that md5-sorts into the
    # sampled prefix must neither poison a centroid nor shrink the returned
    # centroid count while enough finite vectors exist. Codegen-native guard
    # (no HOF): in Spark's ordering NaN sorts greatest, so array_max is NaN
    # or +inf whenever either is present, and NaN/inf comparisons below
    # evaluate false; array_min catches -inf; array_compact (null-element
    # strip) catches nulls that array_max would silently skip. All codegen-
    # native — no interpreted lambda on the corpus scan.
    finite = (
        ~F.isnan(F.array_max(F.col("v")).cast("double"))
        & (F.array_max(F.col("v")) < F.lit(float("inf")))
        & (F.array_min(F.col("v")) > F.lit(float("-inf")))
        & (F.size(F.array_compact(F.col("v"))) == F.size(F.col("v")))
    )
    rows = (
        base.filter((F.size(F.col("v")) == dim) & finite)
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(max(n_centroids, sample_size if lloyd_iters else n_centroids))
        .collect()
    )
    # belt-and-braces python-side re-check of the same invariant
    cand = [v for v in (np.array(list(r.v), dtype=np.float64) for r in rows)
            if np.isfinite(v).all()]
    sample = np.array(cand, dtype=np.float64) if cand else np.zeros((0, dim))
    cents = sample[:n_centroids].copy()
    if lloyd_iters <= 0 or len(sample) <= n_centroids:
        return cents
    xn = np.sqrt((sample * sample).sum(axis=1, keepdims=True))
    X = sample / np.where(xn == 0, 1.0, xn)
    for _ in range(lloyd_iters):
        cn = np.sqrt((cents * cents).sum(axis=1, keepdims=True))
        C = cents / np.where(cn == 0, 1.0, cn)
        # sequential cumsum dots, NOT a BLAS matmul: gemm's blocked/threaded
        # reduction order varies with the BLAS build, which could flip a
        # near-tie argmax and break cross-environment determinism — the same
        # reason every other dot in this repo is a _seq_dot
        sims = _seq_dot(X[:, None, :], C[None, :, :])
        assign = np.argmax(sims, axis=1)  # ties -> lowest index
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
    return cents


def _ivf_cells(vec: Column, centroids: np.ndarray, n_probe: int = 1) -> Column:
    """Index(es) of the nearest centroid(s) by cosine — array of the
    n_probe best cells, best first. Vectorized per Arrow batch; sequential
    cumsum dots (deterministic); ties resolve to the lowest cell index."""
    # zero-norm guard on the CENTROIDS too (a zero corpus vector sampled as a
    # centroid must not poison every row's sims with NaN)
    cn = np.sqrt((centroids * centroids).cumsum(axis=1)[:, -1:])
    c_norm = centroids / np.where(cn == 0, 1.0, cn)

    @F.pandas_udf("array<int>")
    def _cells(vs):  # no hints: postponed annotations break pandas_udf introspection
        if len(vs) == 0:
            return pd.Series([], dtype="object")

        def assign(a):
            norms = np.sqrt(_seq_dot(a, a))[..., None]
            an = a / np.where(norms == 0, 1.0, norms)
            sims = _seq_dot(an[:, None, :], c_norm[None, :, :])
            # stable argsort desc: kind='stable' on -sims keeps low index on ties
            return np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]

        def row(v):
            # degenerate vectors (_as_vec contract) -> null cell list
            # (dropped by the cell equi-join), never a stage crash
            a = _as_vec(v, c_norm.shape[1])
            if a is None:
                return None
            return assign(a[None, :])[0].astype("int32").tolist()

        try:  # uniform-dim fast path: one stacked cumsum per batch
            a = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
            if a.ndim != 2 or a.shape[1] != c_norm.shape[1]:
                raise ValueError("degenerate batch")
        except (TypeError, ValueError):
            return pd.Series([row(v) for v in vs], dtype="object")
        order = assign(a)
        return pd.Series([r.astype("int32").tolist() for r in order])

    return _cells(vec)


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    key: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest-centroid
    cell; each query searches its n_probe nearest cells only.

    Same physical shape as sign-LSH ANN (narrow cell projection -> ONE
    shuffle on the cell id -> per-cell scoring -> window top-k) with the
    hash replaced by a learned-ish coarse quantizer — the classic IVF
    recall/cost trade: n_probe tunes recall, cell count tunes cell size.
    At 10^12 vectors the centroid table stays broadcast-sized (even 2^20
    centroids × 768 dims ≈ 3 GB fp32 — shard or PQ-compress beyond that).
    """
    centroids = ivf_centroids(corpus, n_centroids, key, vec_col, lloyd_iters=lloyd_iters)
    c = corpus.select(
        F.col(key).alias("id"),
        F.col(vec_col).alias("cv"),
        F.element_at(_ivf_cells(F.col(vec_col), centroids, 1), 1).alias("cell"),
    )
    q = queries.select(
        F.col(key).alias("qid"),
        F.col(vec_col).alias("qv"),
        F.explode(_ivf_cells(F.col(vec_col), centroids, n_probe)).alias("cell"),
    )
    scored = (
        c.join(q, "cell")
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "id", cosine_scores(F.col("qv"), F.col("cv")).alias("cos"))
        .dropDuplicates(["qid", "id"])
    )
    ranked = scored.withColumn("rank", F.row_number().over(_rank_window("qid")))
    return ranked.filter(F.col("rank") <= k).select("qid", "id", "cos", "rank")


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 6,
    key: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "lsh-v1",
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Equi-join on bucket replaces the cross join — the shuffle key is the
    bucket id, so cost scales with Σ|bucket_q|·|bucket_c| per bucket. Recall
    is tunable two ways: fewer planes -> bigger buckets, or ``probes`` > 1
    -> multi-probe (each query also joins the buckets at Hamming distance 1,
    i.e. one sign bit flipped — up to 1 + num_planes probes). Probing
    explodes only the tiny query side; the corpus keeps ONE row per vector.
    """
    c = corpus.select(
        F.col(key).alias("id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), dim, num_planes, seed).alias("bucket"),
    )
    q = queries.select(
        F.col(key).alias("qid"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), dim, num_planes, seed).alias("home"),
    )
    n_probe = max(1, min(probes, num_planes + 1))
    probe_buckets = F.array(
        F.col("home"), *[F.col("home").bitwiseXOR(F.lit(1 << i)) for i in range(n_probe - 1)]
    )
    q = q.select("qid", "qv", F.explode(probe_buckets).alias("bucket"))
    scored = (
        c.join(q, "bucket")
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "id", cosine_scores(F.col("qv"), F.col("cv")).alias("cos"))
        .dropDuplicates(["qid", "id"])  # a pair can meet in several probes
    )
    ranked = scored.withColumn("rank", F.row_number().over(_rank_window("qid")))
    return ranked.filter(F.col("rank") <= k).select("qid", "id", "cos", "rank")
