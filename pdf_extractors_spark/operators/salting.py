"""Salted skew handling for conversation-level aggregation.

A 10^12-turn transcripts table has power-law conversation lengths
(FIXTURES.md §1): a plain ``groupBy(conv_id)`` puts a 5000-turn
conversation's rows in one reducer while most reducers get a handful.
AQE's skew handling only splits *join* partitions, not aggregations, so
salting is custom (SURVEY.md §4).

Pattern: two-level aggregation.

1. detect heavy hitters by sampling (cheap approximate counts),
2. salt only the heavy keys — ``salt = pmod(hash(conv_id, turn_idx), S)``
   for heavy conv_ids, 0 otherwise,
3. partial aggregate on (conv_id, salt)  — spreads each heavy key over S
   reducers,
4. final aggregate on conv_id            — combines ≤ S partial rows per
   heavy key, a trivially small shuffle.

The per-turn extraction stage itself never needs salting: it is stateless
per turn, so round-robin input splits already balance it (pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def heavy_hitters(
    df: DataFrame,
    key: str = "conv_id",
    threshold: int = 1000,
    sample_fraction: float = 0.01,
) -> list[str]:
    """Approximate heavy-key detection via uniform sampling: a key with
    ≥ threshold rows appears ≥ threshold*fraction times in the sample in
    expectation. Deterministic seed for reproducible plans.

    ``threshold * sample_fraction`` must be ≥ 4 — below that the cutoff
    sits at the sampling noise floor and single-sampled light keys would
    be flagged heavy (at web scale that floods the driver collect and
    blows up the isin() literal list). Raise the fraction or threshold."""
    expected = threshold * sample_fraction
    if expected < 4:
        raise ValueError(
            f"threshold*sample_fraction = {expected:.2f} < 4: sampled "
            f"counts at this level are noise, not evidence of a heavy key"
        )
    min_sampled = max(2, int(expected / 2))
    rows = (
        df.sample(fraction=sample_fraction, seed=42)
        .groupBy(key)
        .count()
        .filter(F.col("count") >= min_sampled)
        .select(key)
        .collect()
    )
    return [r[0] for r in rows]


def with_salt(
    df: DataFrame,
    heavy_keys: list[str],
    key: str = "conv_id",
    order_col: str = "turn_idx",
    n_salts: int = 16,
) -> DataFrame:
    """Add a ``_salt`` column: 0 for normal keys, hash-spread for heavy
    ones. Deterministic (derived from data, not partition order)."""
    is_heavy = F.col(key).isin(heavy_keys) if heavy_keys else F.lit(False)
    return df.withColumn(
        "_salt",
        F.when(is_heavy, F.pmod(F.xxhash64(key, order_col), F.lit(n_salts)))
        .otherwise(F.lit(0))
        .cast("int"),
    )


def salted_conv_stats(
    extracted: DataFrame,
    heavy_keys: list[str] | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Per-conversation stats with salted two-level aggregation — same
    result as pipeline.conv_stats, skew-immune plan. All aggregates used
    are algebraic (count/sum), so partials combine exactly."""
    if heavy_keys is None:
        heavy_keys = heavy_hitters(extracted)
    salted = with_salt(extracted, heavy_keys, n_salts=n_salts)
    partial = salted.groupBy("conv_id", "_salt").agg(
        F.count("*").alias("turns"),
        F.sum(F.length("extracted_text")).alias("extracted_chars"),
        F.sum("parse_errors").alias("parse_errors"),
        F.sum(F.size("spans")).alias("n_spans"),
    )
    return partial.groupBy("conv_id").agg(
        F.sum("turns").alias("turns"),
        F.sum("extracted_chars").alias("extracted_chars"),
        F.sum("parse_errors").alias("parse_errors"),
        F.sum("n_spans").alias("n_spans"),
    )


def skew_report(
    df: DataFrame,
    key: str = "user_id",
    top_k: int = 20,
    scale: int = 10**6,
) -> DataFrame:
    """Exact key-skew diagnostic: the ``top_k`` heaviest keys with
    ``(rank, key, n_rows, share_ppm, cum_share_ppm, x_mean_ppm)`` — row
    share and cumulative share in parts-per-million, and the imbalance
    factor vs the MEAN per-key count (millionths). The report a pipeline
    runs before choosing salt factors / AQE thresholds: a top key at
    200x the mean needs salting; a flat report doesn't.

    All ratios are integer (``div`` against broadcast 1-row totals), so
    the output is engine-portable and value-hashable. Scale shape: one
    map-side-combined groupBy over the key, one tiny total/key-count
    aggregate that rides back as a broadcast, and ``orderBy().limit()``
    over the already-aggregated counts — Spark executes that as a
    distributed TakeOrdered (per-partition top-k heaps, then a k-row
    merge on the driver side of the exchange), NOT a global sort; the
    rank/cumulative window then runs over only ``top_k`` rows. The mean
    (not the median) is the reference level precisely because it needs
    no order statistic — an exact median of 10^8 per-host counts would
    force the global sort this plan avoids."""
    counts = df.groupBy(key).agg(F.count("*").alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count("*").alias("_nkeys"),
    )
    top = counts.orderBy(F.col("n_rows").desc(), F.col(key).asc()).limit(top_k)
    w = Window.orderBy(F.col("n_rows").desc(), F.col(key).asc())
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("cum_rows", F.sum("n_rows").over(w))
        .select(
            "rank",
            key,
            "n_rows",
            F.expr(f"n_rows * {scale} div _total").alias("share_ppm"),
            F.expr(f"cum_rows * {scale} div _total").alias("cum_share_ppm"),
            F.expr(f"n_rows * {scale} div (_total div _nkeys)").alias(
                "x_mean_ppm"
            ),
        )
    )


def skew_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    heavy_keys: list[str],
    order_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Salted equi-join for a skewed fact side: the replicate-small-side
    pattern AQE applies to *shuffle* joins, available explicitly for when
    the dimension is too big to broadcast but the fact side's key
    distribution is power-law.

    Heavy fact keys get ``salt = pmod(hash(key, order_col), S)`` (derived
    from data, never partition order — deterministic under any input
    split); normal keys keep salt 0. The dim side replicates each heavy
    key's row S times via one ``explode(sequence(...))`` — tiny, because
    only the heavy keys (dozens, not millions) replicate — and the join
    runs on (key, salt), spreading each hot key over S reducers instead
    of melting one. Join results are value-identical to the plain
    equi-join (the salt is dropped).

    At 100 TB: heavy-key detection comes from `heavy_hitters` sampling;
    the replicated dim adds |heavy| × S rows to one side of the exchange,
    noise next to the fact table, while the hottest reducer shrinks S×.
    """
    salted_facts = with_salt(
        facts, heavy_keys, key=key, order_col=order_col, n_salts=n_salts
    )
    is_heavy = F.col(key).isin(heavy_keys) if heavy_keys else F.lit(False)
    salts = F.when(
        is_heavy, F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).otherwise(F.array(F.lit(0)))
    salted_dims = dims.withColumn(
        "_salt", F.explode(F.transform(salts, lambda s: s.cast("int")))
    )
    out = salted_facts.join(salted_dims, [key, "_salt"])
    return out.drop("_salt")
