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


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    update_cols: list[str],
) -> DataFrame:
    """MERGE INTO semantics (the Iceberg upsert) as a single full-outer
    join: matched rows take the update's values for ``update_cols``,
    unmatched update rows are inserted, unmatched base rows pass through.
    An ``action`` column records what happened per row
    (``update``/``insert``/``keep``) — the audit trail a snapshot commit
    wants.

    Scale shape: ONE exchange of each side hashed on ``key`` (or zero
    for the base side if it is bucketed on ``key`` — see
    ``operators/bucketing.py``); when the update batch is small Catalyst
    broadcasts it and the base never shuffles at all. This is exactly
    the copy-on-write MERGE plan Iceberg executes, minus the manifest
    commit (``checkpoint.py`` owns that surface).

    Columns not in ``update_cols`` keep the base's value for matched
    rows and the update's for inserts.
    """
    u = updates.select(
        F.col(key).alias(f"_u_{key}"),
        *[F.col(c).alias(f"_u_{c}") for c in updates.columns if c != key],
    )
    joined = base.join(u, base[key] == u[f"_u_{key}"], "full_outer")
    matched = base[key].isNotNull() & u[f"_u_{key}"].isNotNull()
    out_key = F.coalesce(base[key], u[f"_u_{key}"]).alias(key)
    payload = []
    for c in base.columns:
        if c == key:
            continue
        if c in update_cols:
            # update wins on match and insert; base only on keep
            payload.append(F.coalesce(u[f"_u_{c}"], base[c]).alias(c))
        else:
            payload.append(F.coalesce(base[c], u[f"_u_{c}"]).alias(c))
    action = (
        F.when(matched, F.lit("update"))
        .when(base[key].isNull(), F.lit("insert"))
        .otherwise(F.lit("keep"))
        .alias("action")
    )
    return joined.select(out_key, *payload, action)


def parity_report(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Per-row equality audit between two runs of the same stage — the
    north rule's "per-turn text equality under stable ordering" as a
    first-class operator. Full-outer join on ``keys``; each row is
    classed ``equal`` / ``mismatch`` / ``only_a`` / ``only_b`` (nulls on
    both sides compare equal). Returns one row per key with the verdict —
    aggregate downstream for the scoreboard, or filter ``!= 'equal'``
    for the diff.

    Scale shape: one exchange per side on ``keys``; with both sides
    written bucketed on the key (the natural layout for an extraction
    output) the join is exchange-free. Payload text never widens the
    shuffle beyond the compared column.
    """
    av = a.select(*keys, F.col(value_col).alias("_va"))
    bv = b.select(
        *[F.col(k).alias(f"_b_{k}") for k in keys],
        F.col(value_col).alias("_vb"),
    )
    cond = None
    for k in keys:
        c = av[k] == bv[f"_b_{k}"]
        cond = c if cond is None else cond & c
    in_a = av[keys[0]].isNotNull()
    in_b = bv[f"_b_{keys[0]}"].isNotNull()
    verdict = (
        F.when(in_a & in_b & (F.col("_va").eqNullSafe(F.col("_vb"))), "equal")
        .when(in_a & in_b, "mismatch")
        .when(in_a, "only_a")
        .otherwise("only_b")
        .alias("verdict")
    )
    out_keys = [F.coalesce(av[k], bv[f"_b_{k}"]).alias(k) for k in keys]
    return av.join(bv, cond, "full_outer").select(*out_keys, verdict)


def trailing_counts(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    window_s: int = 3600,
    id_col: str = "event_id",
) -> DataFrame:
    """Trailing time-window aggregates per key — "events and value in
    the last hour, as of each event" — the sliding-window counterpart
    of the tumbling ``time_rollup``, and the rate-limiter / burst-
    detector primitive.

    One RANGE frame window (``rangeBetween(-window_s, 0)`` over epoch
    seconds): ONE exchange on the key + one sort, no self-join — the
    naive formulation (self-join on ``ts BETWEEN ts-w AND ts``) is a
    per-key range join that degenerates quadratically on hot keys.
    Timestamps truncate to whole epoch seconds on both engines (ties
    within a second aggregate together, deterministically — a range
    frame includes ALL peers of the current ordering value, so the
    result is order-stable under any partitioning). Values quantize to
    ``floor(value·100)`` int64 so the trailing sum is exact integer
    math. Null timestamps are excluded loudly (a trailing window over
    an unknown time is meaningless).

    ``unix_timestamp`` (not a bare long cast) so TIMESTAMP_NTZ columns
    — what parquet scans yield — resolve too; the session pins UTC
    (session.py), making NTZ epoch math engine-portable.
    """
    es = F.unix_timestamp(F.col(ts_col))
    v100 = F.floor(F.col(value_col) * 100).cast("long")
    w = (
        Window.partitionBy(key)
        .orderBy(es)
        .rangeBetween(-window_s, Window.currentRow)
    )
    return (
        df.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(key),
            F.count("*").over(w).alias("n_trailing"),
            F.sum(v100).over(w).alias("v_trailing"),
        )
    )


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity audit: child keys with no parent row —
    the data-quality gate an ingest pipeline runs before committing a
    snapshot whose downstream joins assume the FK holds (a silent
    orphan becomes silent row loss at the first inner join).

    One aggregate on the child key (map-side combined: distinct keys
    per partition, never raw child rows on the exchange) + one
    LEFT-ANTI join against the parent's key projection — the anti join
    ships only the parent's key column, and broadcasts when the parent
    is small. Emits (child_key, n_rows) per orphaned key: the triage
    list, not a boolean."""
    keyed = child.groupBy(F.col(child_key).alias("_k")).agg(
        F.count("*").alias("n_rows")
    )
    return keyed.join(
        parent.select(F.col(parent_key).alias("_k")),
        "_k",
        "left_anti",
    ).select(F.col("_k").alias(child_key), "n_rows")


def compact_changelog(
    changelog: DataFrame,
    key: str,
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Changelog compaction (the CDC → snapshot step): keep each key's
    LATEST row by ``order_cols`` and drop keys whose latest operation
    is a delete — exactly what an Iceberg/Hudi merge-on-read compaction
    materializes from an upsert/delete stream.

    One window (`row_number` over the key, descending order) → the
    WindowGroupLimit rule bounds per-partition state at one row per
    (key, map partition) before the single exchange; the delete filter
    is a plain predicate on the surviving row. ``order_cols`` must be a
    total order per key (include a tiebreaker id) or "latest" is
    partition-dependent — the docstring contract, loud in review."""
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn")
    )


def scd2_intervals(
    changes: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval build: a stream of
    per-key attribute changes becomes validity intervals
    ``[valid_from, valid_to)`` — ``valid_to`` null on the current row.
    The dimension table `asof_join` and `range_join` consume, built
    from the same changelog that feeds `compact_changelog`.

    One window per key (lead of the next change's timestamp) — single
    exchange, no self-join; ``order_cols`` (default ``[ts_col]``)
    must totally order each key's changes."""
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(key).orderBy(*order_cols)
    return changes.select(
        F.col(key),
        *[F.col(c) for c in attr_cols],
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )


def interpolate_gaps(
    df: DataFrame,
    key: str,
    ord_col: str,
    val_col: str,
    out_col: str = "value_filled",
) -> DataFrame:
    """Per-key linear interpolation of null gaps in ``val_col`` over the
    numeric order column ``ord_col`` — the standard sensor/metric
    gap-fill. Interior nulls get
    ``prev + (next - prev) * (ord - prev_ord) / (next_ord - prev_ord)``
    between their nearest non-null neighbours; leading/trailing nulls
    (no neighbour on one side) stay null; non-null rows pass through
    unchanged. Generalizes the reference's constant carry-forward
    (`mobil-oil/mobil-oil-extractor.py:93` hierarchical carry) to
    value-aware filling.

    Scale shape: ONE exchange on ``key`` shared by all four window
    functions (two backward `last(ignorenulls)` + two forward
    `first(ignorenulls)` over the same partitioning/ordering — Catalyst
    computes them in two Window operators over one sort, no joins, no
    per-row Python). Skewed keys spill in the sort exactly like any
    window aggregate; there is no join to explode."""
    back = (
        Window.partitionBy(key)
        .orderBy(ord_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key)
        .orderBy(ord_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(val_col).cast("double")
    o = F.col(ord_col).cast("double")
    marked_ord = F.when(v.isNotNull(), o)
    p_val = F.last(v, ignorenulls=True).over(back)
    p_ord = F.last(marked_ord, ignorenulls=True).over(back)
    n_val = F.first(v, ignorenulls=True).over(fwd)
    n_ord = F.first(marked_ord, ignorenulls=True).over(fwd)
    interp = p_val + (n_val - p_val) * (o - p_ord) / (n_ord - p_ord)
    return df.withColumn(
        out_col,
        F.when(v.isNotNull(), v)
        .when(p_val.isNull() | n_val.isNull(), F.lit(None).cast("double"))
        .otherwise(F.round(interp, 6)),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Two-snapshot corpus delta: per document id, whether the document
    was ``added``, ``removed``, ``changed`` (same id, different
    normalized-text hash) or ``unchanged`` between snapshots — the
    audit table a recurring ingest publishes next to each snapshot so
    downstream consumers (dedup state, index refresh, training-mix
    accounting) know exactly what moved without diffing payloads.

    One full-outer join on the id key; BOTH sides reduce to
    (id, 16-byte hash) projections before the join, so snapshot
    payloads never shuffle — the same economics as merge_upsert's
    audit, but keyed by content hash instead of carrying columns.

    Null text hashes as the empty class (explicit, never a null join
    key). Output: ``(id, status, old_hash, new_hash)`` — hashes kept so
    a consumer can route ``changed`` rows to re-processing keyed by
    content, not id."""
    def hashed(df):
        from ..operators.dedup import normalize_text

        return df.select(
            F.col(id_col),
            F.md5(
                normalize_text(F.coalesce(F.col(text_col), F.lit("")))
            ).alias("h"),
        )

    o = hashed(old).withColumnRenamed("h", "old_hash")
    n = hashed(new).withColumnRenamed("h", "new_hash")
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(id_col, status.alias("status"), "old_hash", "new_hash")


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
    window: int = 3,
    bucket_len: int = 2,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo): sort the
    corpus by a blocking key and emit every pair of rows within
    ``window``-1 positions of each other — the candidate generator for
    corpus-scale fuzzy entity resolution (the generic form of the
    census extractors' per-household name matching, which gets its
    candidates from the household grouping instead;
    cf. `roman-census/persons.py:348` name-match join). Feed the pairs
    to an exact verifier (``dedup.edit_distance_verify``) exactly like
    the LSH candidate paths.

    The naive Spark formulation — ``row_number`` over a global
    ``orderBy`` — funnels the corpus through ONE partition. Instead the
    sort key's ``bucket_len``-char prefix becomes a partition bucket
    (order-compatible with the key by construction: prefixes sort the
    same way as keys): within-bucket neighbors come from ``lead`` over
    per-bucket windows (ONE exchange, all window-1 leads share it), and
    boundary pairs come from joining each bucket's last ``window``-1
    rows to the NEXT non-empty bucket's first ``window``-1 rows, with
    the cross-boundary distance condition applied. The bucket
    successor table is #buckets rows — its single-partition window is
    over bucket NAMES, never data (the corpus-totals idiom).

    Semantics (deterministic, what the oracle replays): global order is
    ``(key, id)``; a pair is emitted iff positional distance ≤
    window-1 AND the rows share a bucket or sit in ORDER-ADJACENT
    non-empty buckets. When every bucket holds ≥ window-1 rows this is
    exactly sorted-neighborhood; sparser buckets drop the
    multi-boundary tail pairs — blocking is approximate by design, and
    a shorter ``bucket_len`` trades skew headroom for exactness.

    Output: ``(id_a, id_b, key_a, key_b, gap)`` with ``id_a``
    preceding ``id_b`` in the global order, ``gap`` the positional
    distance (1..window-1). Null keys are dropped (no block). Shuffle
    volume is (id, key) pairs — payloads never move."""
    if window < 2:
        raise ValueError("window must be >= 2 (w-1 neighbors)")
    s = df.select(
        F.col(id_col).alias("_id"), F.col(key_col).alias("_key")
    ).filter(F.col(key_col).isNotNull())
    s = s.withColumn("_b", F.substring("_key", 1, bucket_len))
    w = Window.partitionBy("_b").orderBy("_key", "_id")
    wcnt = Window.partitionBy("_b")
    ranked = (
        s.withColumn("_rn", F.row_number().over(w))
        .withColumn("_cnt", F.count(F.lit(1)).over(wcnt))
    )
    # within-bucket: all window-1 leads ride the same sort
    lead_structs = F.array(
        *[
            F.struct(
                F.lead("_id", i).over(w).alias("nid"),
                F.lead("_key", i).over(w).alias("nkey"),
                F.lit(i).alias("gap"),
            )
            for i in range(1, window)
        ]
    )
    within = (
        ranked.withColumn("_n", lead_structs)
        .select(
            F.col("_id").alias("id_a"),
            F.col("_key").alias("key_a"),
            F.explode("_n").alias("p"),
        )
        .filter(F.col("p.nid").isNotNull())
        .select(
            "id_a",
            F.col("p.nid").alias("id_b"),
            "key_a",
            F.col("p.nkey").alias("key_b"),
            F.col("p.gap").cast("long").alias("gap"),
        )
    )
    # order-adjacent non-empty buckets: tiny table, names only
    buckets = ranked.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    succ = buckets.select(
        "_b",
        F.lead("_b", 1).over(Window.orderBy("_b")).alias("_b_next"),
    ).filter(F.col("_b_next").isNotNull())
    tails = ranked.filter(F.col("_rn") > F.col("_cnt") - (window - 1)).select(
        F.col("_b"),
        F.col("_id").alias("id_a"),
        F.col("_key").alias("key_a"),
        (F.col("_cnt") - F.col("_rn")).alias("_d_end"),
    )
    heads = ranked.filter(F.col("_rn") <= window - 1).select(
        F.col("_b").alias("_b_next"),
        F.col("_id").alias("id_b"),
        F.col("_key").alias("key_b"),
        F.col("_rn").alias("_d_start"),
    )
    across = (
        tails.join(F.broadcast(succ), "_b")
        .join(heads, "_b_next")
        .filter(F.col("_d_end") + F.col("_d_start") <= window - 1)
        .select(
            "id_a",
            "id_b",
            "key_a",
            "key_b",
            (F.col("_d_end") + F.col("_d_start")).cast("long").alias("gap"),
        )
    )
    return within.unionByName(across)
