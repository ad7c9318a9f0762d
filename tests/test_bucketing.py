"""Bucketed co-located joins (shuffle-free) and AQE skew-join handling —
the plan properties that matter for conversation-level joins at scale."""

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from pdf_extractors_spark.operators import bucketing


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, small_transcripts, tmp_path):
    turns = small_transcripts.select("conv_id", "turn_idx", "role")
    convs = small_transcripts.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    try:
        bucketing.write_bucketed(turns, "turns_b", buckets=8, sort_by="turn_idx")
        bucketing.write_bucketed(convs, "convs_b", buckets=8)

        joined = bucketing.bucketed_join(spark, "turns_b", "convs_b")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan  # not just a small-table broadcast
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0  # co-located
        assert joined.count() == turns.count()
    finally:
        spark.sql("drop table if exists turns_b")
        spark.sql("drop table if exists convs_b")

    # contrast: the same join over plain parquet shuffles both sides
    turns.write.mode("overwrite").parquet(str(tmp_path / "t"))
    convs.write.mode("overwrite").parquet(str(tmp_path / "c"))
    plain = spark.read.parquet(str(tmp_path / "t")).join(
        spark.read.parquet(str(tmp_path / "c")).hint("merge"), "conv_id"
    )
    assert len(re.findall(r"\(\d+\) Exchange", _plan(plain))) >= 2


def test_aqe_skew_join_enabled_and_correct(spark):
    # a skewed fact (one hot key) joined to a dim; AQE must both be on and
    # produce correct results. (Plan-level skew-split only materializes on
    # real multi-hundred-MB partitions, so correctness is what we pin.)
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    hot = spark.range(20000).select(F.lit("hot").alias("k"), F.col("id"))
    cold = spark.range(50).select(
        F.concat(F.lit("c"), F.col("id")).cast("string").alias("k"),
        F.col("id"),
    )
    fact = hot.unionByName(cold)
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"c{i}", i) for i in range(50)], "k string, v int"
    )
    joined = fact.join(dim, "k")
    assert joined.count() == 20050
