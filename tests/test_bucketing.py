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


def test_write_sorted_zone_maps_are_disjoint_and_prunable(spark, tmp_path):
    """write_sorted must produce parquet whose row-group min/max stats
    (zone maps) are tight and non-overlapping across files, so a point
    predicate prunes to one file; verified at the format level with
    pyarrow (engine-independent) and at the plan level via PushedFilters."""
    import pyarrow.parquet as pq
    import glob
    import os

    path = str(tmp_path / "sorted")
    df = spark.range(0, 20000).select(
        (F.col("id") % 997).alias("conv_id"),  # unsorted, repeating keys
        F.col("id").alias("turn_idx"),
        F.concat(F.lit("payload-"), F.col("id")).alias("text"),
    )
    bucketing.write_sorted(df, path, key="conv_id", partitions=8)

    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("conv_id")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st.has_min_max
            spans.append((st.min, st.max))
    assert len(spans) >= 8
    spans.sort()
    # within a row group min<=max, and across row groups the key ranges
    # never interleave (each file owns a disjoint range): this is the
    # property that makes min/max stats prune instead of decorate
    for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
        assert lo_a <= hi_a
        assert hi_a <= lo_b or (lo_a, hi_a) == (lo_b, hi_b)

    # the reader actually exploits it: predicate reaches the scan
    rd = spark.read.parquet(path).filter("conv_id = 123")
    plan = _plan(rd)
    assert "PushedFilters" in plan and "EqualTo(conv_id,123)" in plan
    assert rd.count() == df.filter("conv_id = 123").count()


def test_write_sorted_balances_skewed_keys(spark, tmp_path):
    """repartitionByRange samples the key distribution: a 90%-one-key
    corpus must still split across multiple files instead of one giant
    straggler (the secondary sort key breaks ties inside the hot key)."""
    import glob
    import os

    path = str(tmp_path / "skewed")
    df = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("conv_id"),
        F.col("id").alias("turn_idx"),
    )
    bucketing.write_sorted(df, path, key="conv_id", partitions=8)
    files = [
        f for f in glob.glob(os.path.join(path, "*.parquet"))
        if os.path.getsize(f) > 0
    ]
    import pyarrow.parquet as pq

    rows = [pq.ParquetFile(f).metadata.num_rows for f in files]
    assert sum(rows) == 10000
    # hot key spread over >1 file: no file holds more than ~60% of rows
    assert max(rows) <= 6000, rows
