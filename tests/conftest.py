from __future__ import annotations

import warnings

import pytest

warnings.filterwarnings("ignore", category=FutureWarning)


@pytest.fixture(scope="session")
def spark():
    from pdf_extractors_spark.session import get_spark

    spark = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def small_transcripts(spark):
    """Deterministic 30-conversation transcripts DataFrame (sf-small)."""
    from pdf_extractors_spark.fixtures import gen

    df = gen.gen_spark(spark, 30, max_turns=40).cache()
    df.count()
    return df
