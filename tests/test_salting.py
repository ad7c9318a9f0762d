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


def test_skew_join_equals_plain_join(spark):
    facts = spark.createDataFrame(
        [("hot", i, i * 2) for i in range(200)]
        + [(f"k{i % 7}", i, i) for i in range(70)],
        "key string, seq int, v int",
    )
    dims = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"d{i}") for i in range(7)],
        "key string, label string",
    )
    plain = {
        tuple(r)
        for r in facts.join(dims, "key").select("key", "seq", "v", "label").collect()
    }
    salted = {
        tuple(r)
        for r in salting.skew_join(
            facts, dims, "key", ["hot"], order_col="seq", n_salts=8
        )
        .select("key", "seq", "v", "label")
        .collect()
    }
    assert salted == plain and len(plain) == 270


def test_skew_join_replicates_only_heavy_dim_rows(spark):
    facts = spark.createDataFrame(
        [("hot", 1, 0), ("cold", 1, 0)], "key string, seq int, v int"
    )
    dims = spark.createDataFrame(
        [("hot", "H"), ("cold", "C")], "key string, label string"
    )
    # heavy key spreads over up to n_salts reducers; a cold fact row
    # still finds its dim row (salt 0 on both sides)
    out = salting.skew_join(facts, dims, "key", ["hot"], "seq", n_salts=4)
    assert sorted(r["key"] for r in out.collect()) == ["cold", "hot"]
    # the replicated dim side is heavy-only: 1 + n_salts rows pre-join
    is_heavy = F.col("key").isin(["hot"])
    rep = dims.withColumn(
        "_salt",
        F.explode(
            F.when(is_heavy, F.sequence(F.lit(0), F.lit(3))).otherwise(
                F.array(F.lit(0))
            )
        ),
    )
    assert rep.count() == 5


def test_skew_join_no_heavy_keys_degenerates_to_plain(spark):
    facts = spark.createDataFrame([("a", 1, 5)], "key string, seq int, v int")
    dims = spark.createDataFrame([("a", "A")], "key string, label string")
    out = salting.skew_join(facts, dims, "key", [], "seq").collect()
    assert len(out) == 1 and out[0]["label"] == "A"
