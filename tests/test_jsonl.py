"""parse_jsonl / jsonl_stats (operators/jsonl.py): the five quarantine
classes (clean, missing-key, type-mismatch partial parse, malformed,
blank/null), provenance passthrough, the corrupt-col collision guard,
exact ppm math, the zero-exchange plan, and streaming parity (the
operator is a stateless projection, so availableNow over the same lines
must yield identical rows)."""

import pytest

from pdf_extractors_spark import plans
from pdf_extractors_spark.operators import jsonl

_LINES = [
    (0, '{"id": 5, "text": "hello"}'),
    (1, '{"id": 6}'),
    (2, '{"id": 7, "text": "x'),
    (3, "[1,2,3]"),
    (4, ""),
    (5, None),
    (6, '{"id": "notanint", "text": "y"}'),
    (7, '{"text": "only"}'),
]
_SCHEMA = "src long, value string"


def _parsed(spark):
    df = spark.createDataFrame(_LINES, _SCHEMA)
    return jsonl.parse_jsonl(df, "id bigint, text string", line_col="value")


def test_quarantine_classes(spark):
    got = {
        r["src"]: (r["id"], r["text"], r["_corrupt"])
        for r in _parsed(spark).collect()
    }
    assert got == {
        0: (5, "hello", None),
        1: (6, None, None),  # missing key: null field, clean
        2: (None, None, '{"id": 7, "text": "x'),  # malformed: raw line
        3: (None, None, "[1,2,3]"),  # non-object: raw line
        4: (None, None, ""),  # blank: its own class
        5: (None, None, ""),  # null line: same class as blank
        6: (None, "y", '{"id": "notanint", "text": "y"}'),  # partial
        7: (None, "only", None),
    }


def test_passthrough_and_clean_split(spark):
    df = _parsed(spark)
    assert df.columns == ["src", "id", "text", "_corrupt"]
    clean = {r["src"] for r in df.filter("_corrupt is null").collect()}
    assert clean == {0, 1, 7}


def test_corrupt_col_collision_raises(spark):
    df = spark.createDataFrame(_LINES, _SCHEMA)
    with pytest.raises(ValueError, match="collides"):
        jsonl.parse_jsonl(df, "id bigint, _corrupt string")


def test_stats_exact_ppm(spark):
    row = jsonl.jsonl_stats(_parsed(spark)).collect()[0]
    # 8 lines, 3 clean (0/1/7), 5 corrupt → 5_000_000 div 8 = 625_000
    assert (
        row["n_lines"],
        row["n_clean"],
        row["n_corrupt"],
        row["corrupt_ppm"],
    ) == (8, 3, 5, 625000)


def test_empty_input_stats(spark):
    df = spark.createDataFrame([], _SCHEMA)
    row = jsonl.jsonl_stats(
        jsonl.parse_jsonl(df, "id bigint, text string")
    ).collect()[0]
    assert (
        row["n_lines"],
        row["n_clean"],
        row["n_corrupt"],
        row["corrupt_ppm"],
    ) == (0, 0, 0, 0)


def test_parse_plan_zero_exchanges(spark):
    a = plans.assert_plan(
        _parsed(spark), max_exchanges=0, no_single_partition=True,
        no_python=True,
    )
    assert a.n_exchanges == 0, a.plan


def test_streaming_parity(spark, tmp_path):
    src = str(tmp_path / "jl_src")
    spark.createDataFrame(_LINES, _SCHEMA).coalesce(1).write.json(src)
    # batch and stream read the SAME written files; the stream applies
    # the same stateless projection, so rows must match exactly
    batch = spark.read.schema(_SCHEMA).json(src)
    expected = sorted(
        map(tuple, jsonl.parse_jsonl(batch, "id bigint").collect())
    )
    sdf = spark.readStream.schema(_SCHEMA).json(src)
    q = (
        jsonl.parse_jsonl(sdf, "id bigint")
        .writeStream.format("memory")
        .queryName("jl_stream_parity")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table("jl_stream_parity").collect()))
    assert got == expected
