"""Partitioning helpers — explicit skew handling for the 10^12-doc scale.

North-rule requirement: "explicit salted repartitioning on url-hash to
defuse host-level skew". Web crawls arrive host-clustered (one hot host can
dominate input files); a salted hash of the full url spreads every host
across all partitions, and the salt decorrelates reruns from any adversarial
url distribution. Reference analog: batch splitting into ceil(n/batch_size)
request files (/root/reference/src/bespokelabs/curator/request_processor/
base_request_processor.py:252-270) — but content-hash-spread instead of
arrival-order-split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = "curator-spark-v1"


def salted_repartition(
    df: DataFrame,
    key: str = "url",
    num_partitions: int | None = None,
    salt: str = DEFAULT_SALT,
) -> DataFrame:
    """Hash-repartition on xxhash64(key, salt).

    ``num_partitions`` should be >> cores at scale (AQE coalesces small
    partitions back; skewed ones stay split).
    """
    expr = F.xxhash64(F.col(key), F.lit(salt))
    if num_partitions:
        return df.repartition(num_partitions, expr)
    return df.repartition(expr)
