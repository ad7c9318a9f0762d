"""Salt-invariance (SURVEY.md §5.3): salted two-level aggregation equals
the plain aggregation; heavy-hitter detection finds the skewed keys."""

from pyspark.sql import functions as F

from pdf_extractors_spark import pipeline
from pdf_extractors_spark.operators import salting


def test_salted_stats_equal_plain_stats(spark, small_transcripts):
    extracted = pipeline.extract_transcripts(small_transcripts).cache()
    plain = {
        r["conv_id"]: (r["turns"], r["extracted_chars"], r["n_spans"])
        for r in pipeline.conv_stats(extracted).collect()
    }
    salted = {
        r["conv_id"]: (r["turns"], r["extracted_chars"], r["n_spans"])
        for r in salting.salted_conv_stats(
            extracted, heavy_keys=list(plain)[:3], n_salts=8
        ).collect()
    }
    assert plain == salted


def test_heavy_hitter_detection(spark):
    # one conv with 5000 rows, 50 with 10 rows
    heavy = spark.range(5000).select(
        F.lit("conv-heavy").alias("conv_id"), F.col("id").alias("turn_idx")
    )
    light = spark.range(500).select(
        F.concat(F.lit("conv-"), (F.col("id") % 50).cast("string")).alias("conv_id"),
        F.col("id").alias("turn_idx"),
    )
    found = salting.heavy_hitters(
        heavy.unionByName(light), threshold=1000, sample_fraction=0.05
    )
    assert "conv-heavy" in found
    assert len(found) < 10


def test_salt_column_spreads_only_heavy_keys(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", i) for i in range(100)],
        "conv_id string, turn_idx int",
    )
    salted = salting.with_salt(df, ["a"], n_salts=8)
    a_salts = {r["_salt"] for r in salted.filter("conv_id='a'").collect()}
    b_salts = {r["_salt"] for r in salted.filter("conv_id='b'").collect()}
    assert len(a_salts) > 1
    assert b_salts == {0}
