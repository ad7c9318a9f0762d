"""Bucketed storage for shuffle-free conversation-level joins.

At 10^12 turns, any per-conversation join (extracted turns ⋈ conv metadata,
stage-A households ⋈ stage-B persons) re-shuffles both sides on conv_id
every time unless the tables are written bucketed on that key. Writing
both sides with the same bucket count lets Spark plan a SortMergeJoin with
NO Exchange — the join cost collapses to a per-bucket merge.

(The Iceberg equivalent is a `bucket(N, conv_id)` partition transform +
storage-partitioned joins; this module expresses the same physical design
over the built-in catalog so it is testable in the sandbox.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "conv_id",
    buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """``sort_by`` defaults to None (sort on the bucket key only): baking
    a turns-specific column into a generic writer fails with an
    unresolved-column error for any table without it — e.g. the
    conv-metadata side of the co-located join."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort_by:
        writer = writer.sortBy(key, sort_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "conv_id"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst plans
    a SortMergeJoin without any Exchange (verified by
    tests/test_bucketing.py). The merge hint pins the SMJ path: at scale
    neither side is broadcastable, and SMJ-over-buckets is the plan whose
    cost stays flat as both sides grow."""
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), key
    )


def write_sorted(
    df: DataFrame,
    path: str,
    key: str = "conv_id",
    secondary: str | None = "turn_idx",
    partitions: int | None = None,
) -> None:
    """Zone-map-friendly parquet sink: range-partition on ``key`` (each
    output file owns a disjoint key range), then sort within partitions
    so every row group's parquet min/max statistics are tight.

    Why this matters at 100 TB: a point or range lookup on ``key``
    against an UNSORTED table reads every row group — the min/max stats
    all span the whole key domain, so nothing prunes. Range-partitioned
    + sorted, the same predicate prunes to the one file (and row group)
    whose range contains it; Spark's parquet reader does this with
    PushedFilters and so does every other engine reading the table
    (the Iceberg analogue is a sort order on the table spec — zone maps
    are the format-level mechanism either way).

    ``repartitionByRange`` samples the key distribution, so skewed keys
    still land in balanced files (unlike hash-bucketing, which this
    complements: bucketed tables kill the JOIN shuffle, sorted tables
    kill the SCAN — tests/test_bucketing.py pins both properties)."""
    cols = [key] + ([secondary] if secondary else [])
    ranged = (
        df.repartitionByRange(partitions, *cols)
        if partitions
        else df.repartitionByRange(*cols)
    )
    ranged.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


def zorder_key(
    df,
    x_col: str,
    y_col: str,
    bits: int = 16,
    out_col: str = "zkey",
):
    """Morton (Z-order) interleave of two columns' low ``bits`` bits —
    the multi-dimensional sort key behind Z-ORDER clustering: sorting
    by ``zkey`` before `write_sorted` gives BOTH columns locality in
    the file layout, so zone maps prune point/range scans on either
    dimension (single-column sort keys prune only their own column).

    Pure integer column math via an ``aggregate`` over a literal power
    array — variable bit shifts become div/mod by 2^t, exact int64 for
    bits ≤ 31, zero UDFs, zero exchanges (the sort that consumes the
    key owns the exchange). Bit t of x lands at position 2t, of y at
    2t+1 (x in the even lanes).
    """
    from pyspark.sql import functions as F

    pows = F.array(*[F.lit(2**t).cast("long") for t in range(bits)])
    x = F.col(x_col).cast("long") % F.lit(2**bits)
    y = F.col(y_col).cast("long") % F.lit(2**bits)

    z = F.aggregate(
        F.sequence(F.lit(1), F.lit(bits)),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + ((x / F.element_at(pows, t.cast("int"))).cast("long") % 2)
        * F.element_at(pows, t.cast("int"))
        * F.element_at(pows, t.cast("int"))
        + ((y / F.element_at(pows, t.cast("int"))).cast("long") % 2)
        * F.element_at(pows, t.cast("int"))
        * F.element_at(pows, t.cast("int"))
        * 2,
    )
    return df.withColumn(out_col, z)


def global_index(
    df,
    key_col: str = "doc_id",
    n_buckets: int = 256,
    out_col: str = "row_index",
):
    """Deterministic 0-based global row index, ordered by ``key_col``
    within portable hash buckets — WITHOUT a global sort.

    The naive `row_number() OVER (ORDER BY key)` collapses the whole
    table into one reducer; `monotonically_increasing_id` is
    partition-layout-dependent (different cluster → different ids) and
    gapped; RDD `zipWithIndex` leaves the DataFrame world. This is the
    scalable two-pass form: (1) one map-side-combined count per bucket
    (``n_buckets`` rows — driver-free, it stays a DataFrame), turned
    into exclusive prefix offsets by a window over the TINY bucket
    table; (2) a broadcast join of the offsets back, plus
    `row_number()` within each bucket (exchange on bucket + per-bucket
    sort — fully parallel). Index = bucket offset + local rank.

    The bucket is ``md5_bigint(key) % n_buckets`` (portable — a DuckDB
    oracle reproduces the exact assignment), so the total order realized
    is (bucket, key): stable across runs, cluster sizes, and input
    layouts. Keys must be unique for the index to be well-defined.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .hashing import md5_bigint

    bucket = F.pmod(md5_bigint(F.col(key_col).cast("string")), F.lit(n_buckets))
    keyed = df.withColumn("_bucket", bucket)
    counts = keyed.groupBy("_bucket").agg(F.count("*").alias("_n"))
    offsets = counts.select(
        "_bucket",
        (
            F.sum("_n").over(
                Window.orderBy("_bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("_offset"),
    ).fillna({"_offset": 0})
    local = F.row_number().over(
        Window.partitionBy("_bucket").orderBy(key_col)
    )
    return (
        keyed.join(F.broadcast(offsets), "_bucket")
        .withColumn(out_col, (F.col("_offset") + local - 1).cast("long"))
        .drop("_bucket", "_offset")
    )
