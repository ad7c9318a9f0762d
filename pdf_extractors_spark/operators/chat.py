"""Chat-template rendering and loss-mask derivation — the step between
a curated transcript corpus and an SFT/RLHF training file.

A fine-tuning pipeline consumes ONE string per conversation (role-tagged
turns in order, a fixed terminator after each) plus the character spans
that are allowed to contribute loss (assistant turns only — user and
tool turns are context, not targets). Both must be deterministic pure
functions of the rows: a re-run, a different partitioning, or a
different engine has to produce byte-identical training files, or
checkpoint resumption silently trains on shifted spans.

Template (fixed, engine-portable): each turn renders as
``<|{role}|>\\n{text}\\n<|end|>\\n`` and a conversation is its turns
concatenated in ``turn_idx`` order. Null text renders as the empty
string (the turn still exists — a dropped marker would shift every
downstream span).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TURN_TERMINATOR = "\n<|end|>\n"


def _segment(role_col: str, text_col: str):
    return F.concat(
        F.lit("<|"),
        F.col(role_col),
        F.lit("|>\n"),
        F.coalesce(F.col(text_col), F.lit("")),
        F.lit(TURN_TERMINATOR),
    )


def render_chat(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    max_chars: int | None = None,
) -> DataFrame:
    """Render each conversation to its training string.

    Output: ``(conv_id, rendered, n_turns, n_chars)``, one row per
    conversation, turns concatenated in ``turn_idx`` order.

    ``max_chars``: context-window budget in characters. When set, keep
    the LONGEST SUFFIX of turns whose rendered length fits (the
    standard chat truncation — recent turns survive, oldest drop), and
    never zero turns: a conversation whose final turn alone exceeds the
    budget keeps that one turn (the caller's length filters own that
    case; silently emitting an empty string would hide it).

    Scale shape: ONE exchange on the conversation key; the optional
    truncation window rides the same partitioning (Spark plans one
    Exchange for both). Ordering inside the aggregate is explicit
    (``array_sort`` on (turn_idx, seg) structs), never
    ``collect_list``'s arrival order — partitioning cannot change the
    output. Skew: a single 10^6-turn conversation is one reducer row by
    definition; ``max_chars`` is also the skew guard a real pipeline
    runs with.
    """
    seg = _segment(role_col, text_col).alias("_seg")
    s = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).cast("long").alias("_idx"),
        seg,
    )
    if max_chars is not None:
        # suffix running length: this turn + everything after it
        w = (
            Window.partitionBy("conv_id")
            .orderBy(F.col("_idx").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        first = (
            Window.partitionBy("conv_id")
            .orderBy(F.col("_idx").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        s = (
            s.withColumn("_tail", F.sum(F.length("_seg")).over(w))
            .withColumn("_rn", F.row_number().over(first))
            .filter(
                (F.col("_tail") <= int(max_chars)) | (F.col("_rn") == 1)
            )
            .drop("_tail", "_rn")
        )
    return (
        s.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_idx"), F.col("_seg")))
            ).alias("_turns")
        )
        .select(
            "conv_id",
            F.aggregate(
                "_turns", F.lit(""), lambda acc, t: F.concat(acc, t["_seg"])
            ).alias("rendered"),
            F.size("_turns").cast("long").alias("n_turns"),
        )
        .withColumn("n_chars", F.length("rendered").cast("long"))
    )


def loss_mask_spans(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    target_role: str = "assistant",
) -> DataFrame:
    """Character spans of the loss-bearing text inside each rendered
    conversation (``render_chat`` with no truncation): for every
    ``target_role`` turn, the 0-based ``[span_start, span_end)`` of its
    raw text — header and terminator excluded — inside the
    conversation's rendered string.

    Output: ``(conv_id, turn_idx, span_start, span_end)``. A training
    job zips these with the rendered string to build the token loss
    mask; because both derive from the same running lengths, the spans
    are correct by construction (pinned by tests that slice the
    rendered string and compare to the raw text).

    Scale shape: one window over the same conversation-key partitioning
    the renderer uses — running sum of segment lengths, nothing wide
    beyond it; payload text never moves (only its lengths do).
    """
    seg_len = (
        F.lit(2)  # "<|"
        + F.length(F.col(role_col))
        + F.lit(3)  # "|>\n"
        + F.length(F.coalesce(F.col(text_col), F.lit("")))
        + F.lit(len(TURN_TERMINATOR))
    ).cast("long")
    header_len = (F.lit(5) + F.length(F.col(role_col))).cast("long")
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(idx_col).cast("long"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).cast("long").alias("turn_idx"),
        F.col(role_col).alias("_role"),
        header_len.alias("_hdr"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias(
            "_txt"
        ),
        seg_len.alias("_seg_len"),
    )
    out = s.withColumn(
        "_before", F.coalesce(F.sum("_seg_len").over(w), F.lit(0))
    )
    return out.filter(F.col("_role") == target_role).select(
        "conv_id",
        "turn_idx",
        (F.col("_before") + F.col("_hdr")).alias("span_start"),
        (F.col("_before") + F.col("_hdr") + F.col("_txt")).alias("span_end"),
    )


def context_cost(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Quadratic context-window accounting per conversation — the
    inference/training-economics audit: generating (or teacher-forcing)
    turn i re-processes every token of turns 0..i, so a conversation's
    true compute bill is the SUM OF PREFIX SUMS, not its token count.
    A corpus whose token total looks flat can hide a 40× context
    multiplier concentrated in a few marathon conversations — exactly
    the rows a packing/truncation policy (conv_truncate, chunk_windows)
    should see first.

    Per conversation: ``(conv_id, n_turns, total_tokens,
    context_tokens, cost_ratio_bp)`` where ``context_tokens =
    Σ_i prefix_tokens(i)`` (inclusive — turn i's own tokens are
    processed while generating it), and ``cost_ratio_bp`` is the
    half-up basis-point context multiplier ``context/total`` (10000 =
    single-turn, no re-processing; grows ~linearly in turn count for
    evenly-sized turns). Whitespace tokens (the ``tokens()``
    convention); null text counts zero tokens but the turn still
    counts in ``n_turns`` (it still occupies a context slot).

    Scale shape: ONE exchange on conv_id — the running prefix sum is a
    window over (conv, turn order) and the rollup groups by the same
    key the data is already partitioned on; bytes moved = (conv, turn,
    token-count) longs, payloads pruned before the exchange. Skew:
    bounded by max turns per conversation, same envelope as every
    conv-keyed window in the engine."""
    from .text_stats import tokens

    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    per_turn = df.select(
        F.col(conv_col).alias("_c"),
        F.col(turn_col).alias("_t"),
        F.coalesce(F.size(toks), F.lit(0)).cast("long").alias("_n"),
    ).filter(F.col("_c").isNotNull() & F.col("_t").isNotNull())
    w = (
        Window.partitionBy("_c")
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = per_turn.withColumn("_pref", F.sum("_n").over(w))
    agg = pref.groupBy("_c").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("_n").cast("long").alias("total_tokens"),
        F.sum("_pref").cast("long").alias("context_tokens"),
    )
    return agg.select(
        F.col("_c").alias(conv_col),
        "n_turns",
        "total_tokens",
        "context_tokens",
        F.when(
            F.col("total_tokens") > 0,
            F.expr(
                "(2 * 10000 * context_tokens + total_tokens)"
                " div (2 * total_tokens)"
            ),
        ).cast("long").alias("cost_ratio_bp"),
    )
