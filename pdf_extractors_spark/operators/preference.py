"""Preference-pair (RLHF/DPO) dataset auditing.

A preference corpus is two texts per row — ``chosen`` beat ``rejected``
for the same prompt — and its failure modes are structural, not
textual: a labeler pool that systematically prefers the LONGER answer
teaches the reward model verbosity; duplicated pairs (or pairs whose
two sides are the same text) are wasted or actively contradictory
gradient; a chosen/rejected pair differing only in whitespace or case
is a tie mislabeled as a preference. Every statistic here is an exact
integer so DuckDB replays the audit bit-for-bit.

All single-pass column math + one map-side-combined aggregate: the
corpus collapses to a handful of longs before anything wide happens —
at 10^10 pairs the shuffle carries ONE row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import normalize_text


def preference_bias(
    df: DataFrame,
    chosen_col: str = "chosen_text",
    rejected_col: str = "rejected_text",
) -> DataFrame:
    """Corpus-level structural audit of a preference-pair dataset.

    One output row:

    * ``n_pairs`` — rows with both sides non-null;
    * ``chosen_longer`` / ``rejected_longer`` / ``len_ties`` — character
      length comparison (the verbosity-bias counter: a healthy corpus is
      near 50/50 once ties are excluded);
    * ``exact_dup`` — pairs whose two sides are byte-identical (a
      labeling-pipeline bug: the "preference" carries no signal);
    * ``norm_dup`` — pairs identical after whitespace/case
      normalization but NOT byte-identical (mislabeled ties);
    * ``chosen_longer_ppm`` — ``10^6 · chosen_longer div
      (chosen_longer + rejected_longer)``: the length-win rate among
      decided-by-length pairs (null when every pair ties);
    * ``len_gap_sum`` — Σ(len(chosen) − len(rejected)), the signed
      verbosity drift (exact; divide by n_pairs off-engine for a mean).

    Rows with a null side are dropped (they are ingest errors, counted
    by jsonl/parse stages upstream, not preferences).

    Scale shape: zero shuffles of payloads — per-row comparisons reduce
    to 0/1 longs in the map stage and ONE global aggregate (map-side
    combined) crosses the wire.
    """
    c, r = F.col("_c"), F.col("_r")
    s = (
        df.select(
            F.col(chosen_col).alias("_c"), F.col(rejected_col).alias("_r")
        )
        .filter(c.isNotNull() & r.isNotNull())
        .select(
            (F.length(c) > F.length(r)).cast("long").alias("_cl"),
            (F.length(c) < F.length(r)).cast("long").alias("_rl"),
            (F.length(c) == F.length(r)).cast("long").alias("_lt"),
            (c == r).cast("long").alias("_ed"),
            (
                (c != r) & (normalize_text(c).eqNullSafe(normalize_text(r)))
            ).cast("long").alias("_nd"),
            (F.length(c) - F.length(r)).alias("_gap"),
        )
    )
    a = s.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.sum("_cl"), F.lit(0)).cast("long").alias("chosen_longer"),
        F.coalesce(F.sum("_rl"), F.lit(0)).cast("long").alias("rejected_longer"),
        F.coalesce(F.sum("_lt"), F.lit(0)).cast("long").alias("len_ties"),
        F.coalesce(F.sum("_ed"), F.lit(0)).cast("long").alias("exact_dup"),
        F.coalesce(F.sum("_nd"), F.lit(0)).cast("long").alias("norm_dup"),
        F.coalesce(F.sum("_gap"), F.lit(0)).cast("long").alias("len_gap_sum"),
    )
    return a.select(
        "n_pairs",
        "chosen_longer",
        "rejected_longer",
        "len_ties",
        "exact_dup",
        "norm_dup",
        # integer div (never double): 10^6·count can exceed double's
        # 2^53 exact-integer range at 10^10 pairs, long div cannot
        F.when(
            (F.col("chosen_longer") + F.col("rejected_longer")) > 0,
            F.expr(
                "(1000000L * chosen_longer) div "
                "(chosen_longer + rejected_longer)"
            ),
        ).alias("chosen_longer_ppm"),
        "len_gap_sum",
    )
