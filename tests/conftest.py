from __future__ import annotations

import pandas as pd
import pytest

from curator_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="curator_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages_pdf() -> pd.DataFrame:
    from curator_spark.datagen import build_pages_pdf

    return build_pages_pdf(SF_DIR)


@pytest.fixture(scope="session")
def golden(pages_pdf) -> pd.DataFrame:
    from curator_spark.oracle import golden_labels

    return golden_labels(pages_pdf)


@pytest.fixture(scope="session")
def pages_df(spark, tmp_path_factory):
    from curator_spark.datagen import pages_path_for

    path = pages_path_for(SF_DIR, cache_root=str(tmp_path_factory.mktemp("pages")))
    return spark.read.parquet(path)
