"""Deterministic sharding / splitting for training-data pipelines.

A train/val/test split at 100 TB must be a pure function of a stable key
— never ``rand()`` (non-reproducible across retries/partitions) and never
row position (changes under repartitioning). The split hash is the
portable md5-bigint (hashing.py), so the assignment is reproducible in
Spark, DuckDB and plain Python, and survives engine swaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .hashing import md5_bigint


def hash_split(
    df: DataFrame,
    weights: dict[str, int],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket.

    ``weights``: ordered {name: percent} summing to 100, e.g.
    ``{"train": 80, "val": 10, "test": 10}``. Assignment: bucket =
    hash(salt:key) mod 100 falls in the name's cumulative range. Adding a
    ``salt`` gives independent re-splits of the same corpus.
    """
    total = sum(weights.values())
    if total != 100:
        raise ValueError(f"split weights must sum to 100, got {total}")
    bucket = F.pmod(
        md5_bigint(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))),
        F.lit(100),
    )
    expr = None
    acc = 0
    for name, pct in weights.items():
        acc += pct
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def split_counts(
    df: DataFrame, weights: dict[str, int], key_col: str = "doc_id", salt: str = "split"
) -> DataFrame:
    """Per-split row counts — the sanity check a pipeline runs after
    splitting (expected proportions ± hash noise)."""
    return hash_split(df, weights, key_col, salt).groupBy("split").agg(
        F.count("*").alias("n_rows")
    )


def stratified_sample(
    df: DataFrame,
    fractions_bp: dict[str, int],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum downsampling (e.g. rebalance languages
    or sources before training): keep a row iff
    ``hash(salt:key) mod 10000 < fractions_bp[stratum]``.

    Fractions are integer basis points (10000 = keep all), so the
    decision is exact in every engine; the hash is the portable
    md5-bigint of the stable key, so the sample is reproducible under
    retries, repartitioning and engine swaps — never ``sampleBy`` (RNG
    seeded per partition). Strata absent from the map are dropped
    (fraction 0). Pure filter: pushes down, no shuffle."""
    bucket = F.pmod(
        md5_bigint(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))),
        F.lit(10000),
    )
    frac_map = F.create_map(
        *[F.lit(x) for kv in fractions_bp.items() for x in kv]
    )
    keep_bp = F.coalesce(frac_map[F.col(strata_col)], F.lit(0))
    return df.filter(bucket < keep_bp)


def temperature_sample(
    df: DataFrame,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-balanced mixture sampling (the T5/mT5 α = 0.5 mixing
    rule): a stratum with n_s rows is kept with per-row probability
    ``sqrt(n_min / n_s)`` — sampled size ∝ sqrt(n_s), flattening the
    head languages/sources without starving the tail. The smallest
    stratum keeps everything.

    α is fixed at 0.5 because sqrt is the one power both engines (and
    any IEEE-754 engine) round identically; an arbitrary ``pow(x, α)``
    could flip the basis-point floor at the boundary and break the
    value-hash oracle. Rates come from the corpus's OWN stratum counts
    via one tiny aggregate joined back as a broadcast (counts move,
    payloads never do); the keep decision is the portable hash of the
    stable key — reproducible under retries, repartitioning and engine
    swaps."""
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    n_min = counts.agg(F.min("_n").alias("_nmin"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        strata_col,
        F.floor(10000 * F.sqrt(F.col("_nmin") / F.col("_n")))
        .cast("long")
        .alias("_keep_bp"),
    )
    bucket = F.pmod(
        md5_bigint(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))),
        F.lit(10000),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(bucket < F.col("_keep_bp"))
        .drop("_keep_bp")
    )


def pack_units(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 2048,
    n_buckets: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Deterministic budget-aligned sharding for training prep: assign
    each document to a (bucket, pack) unit by its preceding cumulative
    token offset — pack ``p`` holds the documents whose offset falls in
    ``[p·budget, (p+1)·budget)``. Guarantee: within a pack, everything
    EXCEPT the last document fits the budget (the last may overflow it),
    so a pack never exceeds ``budget + max_doc_tokens``. Strict
    ≤-budget bin packing is a sequential fold (running reset), which a
    window cannot express — when that guarantee is required, run a
    per-bucket ``applyInPandas`` greedy pass over this same sharding.

    Scale design: a single global running total would serialize on one
    partition, so documents are first sharded into ``n_buckets`` by the
    portable hash of the stable id, and offsets accumulate independently
    per bucket (one window per bucket partition). Order within a bucket
    is (hash, id) — deterministic under any partitioning/retries. The
    pack id is ``floor((cumsum - tokens) / budget)``: exact integer
    math, so the assignment replays identically in SQL."""
    h = md5_bigint(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = df.select(
        F.col(id_col),
        F.col(token_col).alias("tokens"),
        h.alias("h"),
        F.pmod(h, F.lit(n_buckets)).alias("bucket"),
    )
    cum = F.sum("tokens").over(w) - F.col("tokens")
    return staged.select(
        id_col,
        "bucket",
        # integer floor-division, not double `/`: past 2^53 cumulative
        # tokens a double is inexact and floor() could misassign a pack
        cum.alias("_off"),
    ).select(
        id_col,
        "bucket",
        F.expr(f"_off div {int(budget)}").cast("long").alias("pack_id"),
    )
