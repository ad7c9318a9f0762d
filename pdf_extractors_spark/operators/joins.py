"""Temporal join operators Spark's DataFrame API lacks as built-ins.

* **as-of join** — for each left row, the latest right row with
  ``right_ts <= left_ts`` per key. Implemented as the union + fill-down
  plan: one shuffle on the key, one sort within partitions, `last(...,
  ignorenulls)` carries the right side's payload forward onto left rows.
  No join explosion, no per-row Python — at 100 TB this is one exchange
  of (key, ts, carried columns), the same cost as a window aggregate.
  (The naive formulation — theta-join on ``r.ts <= l.ts`` + argmax —
  is a range join that degenerates to per-key cross products.)
* **range join** — left rows matched to right intervals
  ``[start, end]`` per key. Expressed as an equi-join on the key with
  the range predicate attached, so Catalyst plans a hash/sort-merge
  join on the key and applies the band filter on matched pairs; AQE
  skew-splitting handles hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: None = None,
) -> DataFrame:
    """For every left row, attach the most recent right ``value_cols``
    with ``right_ts <= left_ts`` (ties: the right row wins — it sorts
    before the left row at equal timestamps, matching ASOF semantics
    where an exactly-simultaneous quote applies).

    The right side must be unique per (key, ts) — pre-aggregate if not —
    or the carried value depends on sort-order among equal timestamps."""
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    # carry the right row as ONE struct so a null value column inside the
    # most recent right row stays null — per-column fill-down would blend
    # columns from different right rows (not a row that ever existed)
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("_ts"),
            F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
        )
        .withColumn("_side", F.lit(0))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn("_rf", F.last("_r", ignorenulls=True).over(w))
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            "*",
            *[F.col(f"_rf.{c}").alias(f"asof_{c}") for c in value_cols],
        )
        .drop("_side", "_ts", "_r", "_rf")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    point_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Left rows joined to right intervals containing their point value
    (inclusive bounds), equi-keyed on ``key``."""
    r = right.withColumnRenamed(key, f"_{key}")
    return left.join(
        r,
        (left[key] == r[f"_{key}"])
        & (left[point_col] >= r[start_col])
        & (left[point_col] <= r[end_col]),
    ).drop(f"_{key}")
