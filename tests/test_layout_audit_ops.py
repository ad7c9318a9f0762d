"""zorder_key (Morton interleave), fk_violations (RI audit), plus the
pivot/percent_rank inline-query shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractors_spark.operators import bucketing, joins


def _morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for t in range(bits):
        z |= ((x >> t) & 1) << (2 * t)
        z |= ((y >> t) & 1) << (2 * t + 1)
    return z


def test_zorder_key_matches_bit_interleave(spark):
    rows = [(0, 0, 0), (1, 1, 0), (2, 0, 1), (3, 5, 9), (4, 65535, 65535)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r["id"]: r["zkey"]
        for r in bucketing.zorder_key(df, "x", "y").collect()
    }
    for i, x, y in rows:
        assert got[i] == _morton(x, y), (i, x, y)


def test_zorder_key_wraps_high_bits(spark):
    # inputs above 2^bits wrap via the modulo, never overflow
    df = spark.createDataFrame([(0, 65536 + 3, 7)], "id long, x long, y long")
    row = bucketing.zorder_key(df, "x", "y").collect()[0]
    assert row["zkey"] == _morton(3, 7)


def test_zorder_locality_beats_single_column_sort(spark):
    """The point of Z-order: sorting by zkey, BOTH dimensions are
    locally clustered — adjacent rows differ little in x AND y, where
    an x-sort leaves y unclustered."""
    rows = [(i, i % 32, i // 32) for i in range(1024)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    ordered = [
        (r["x"], r["y"])
        for r in bucketing.zorder_key(df, "x", "y").orderBy("zkey").collect()
    ]
    # 64-row "files": every file's bounding box is one 8×8 tile — zone
    # maps prune on BOTH dims. An x-sorted layout's files span the full
    # y range (no pruning on y). (Adjacent-row jumps are the wrong
    # metric: the Z curve has seams at quadrant boundaries.)
    for b in range(0, 1024, 64):
        xs = [p[0] for p in ordered[b : b + 64]]
        ys = [p[1] for p in ordered[b : b + 64]]
        assert max(xs) - min(xs) <= 7 and max(ys) - min(ys) <= 7


def test_fk_violations_exact_orphans(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (9, "d")], "user_id long, v string"
    )
    parent = spark.createDataFrame([(1,), (2,)], "c_custkey long")
    got = {
        r["user_id"]: r["n_rows"]
        for r in joins.fk_violations(child, parent, "user_id", "c_custkey").collect()
    }
    assert got == {9: 1}


def test_fk_violations_clean_child_is_empty(spark):
    child = spark.createDataFrame([(1, "a")], "user_id long, v string")
    parent = spark.createDataFrame([(1,)], "c_custkey long")
    assert joins.fk_violations(child, parent, "user_id", "c_custkey").count() == 0
