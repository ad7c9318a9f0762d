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


# --------------------------------------------------- changelog / SCD / keep


def test_compact_changelog_latest_wins_deletes_drop(spark):
    rows = [
        # user u: upsert v=1, upsert v=2 (latest) → keep v=2
        ("u", 1, 100, "upsert"),
        ("u", 2, 200, "upsert"),
        # user v: upsert then delete (latest) → gone
        ("v", 3, 300, "upsert"),
        ("v", 4, 0, "delete"),
        # user w: delete then upsert (latest) → resurrected
        ("w", 5, 0, "delete"),
        ("w", 6, 600, "upsert"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, v100 long, op string"
    )
    got = {
        r["user_id"]: r["v100"]
        for r in joins.compact_changelog(df, "user_id", ["event_id"]).collect()
    }
    assert got == {"u": 200, "w": 600}


def test_scd2_intervals_lead_chain(spark):
    from datetime import datetime

    ts = [datetime(2026, 1, 1, h) for h in (1, 5, 9)]
    df = spark.createDataFrame(
        [("u", ts[0], 0, 10), ("u", ts[1], 1, 20), ("u", ts[2], 2, 30),
         ("v", ts[0], 3, 99)],
        "user_id string, ts timestamp, event_id long, v100 long",
    )
    rows = joins.scd2_intervals(
        df, "user_id", "ts", ["v100"], ["ts", "event_id"]
    ).collect()
    by_val = {r["v100"]: (r["valid_from"], r["valid_to"]) for r in rows}
    assert by_val[10] == (ts[0], ts[1])
    assert by_val[20] == (ts[1], ts[2])
    assert by_val[30] == (ts[2], None)  # current row open-ended
    assert by_val[99] == (ts[0], None)  # other key independent


def test_cluster_keep_best_argmax_with_tiebreak(spark):
    from pdf_extractors_spark.operators import dedup

    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20)],
        "doc_id long, cluster_id long",
    )
    quality = spark.createDataFrame(
        # cluster 10: doc 2 longest; cluster 20: tie → smaller id (4)
        [(1, 5), (2, 9), (3, 7), (4, 6), (5, 6)],
        "doc_id long, quality long",
    )
    got = {
        r["cluster_id"]: (r["doc_id"], r["quality"])
        for r in dedup.cluster_keep_best(clusters, quality).collect()
    }
    assert got == {10: (2, 9), 20: (4, 6)}
