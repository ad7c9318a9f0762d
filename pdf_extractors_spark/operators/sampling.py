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


def chunk_windows(
    df: DataFrame,
    window: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding token-window chunker — the context-prep transform a RAG /
    long-context training pipeline runs to turn documents into
    overlapping fixed-size units: whitespace tokens, one chunk every
    ``stride`` tokens, each up to ``window`` tokens wide.

    A chunk is emitted at start ``k*stride`` while that start is inside
    the document AND the previous chunk did not already reach the end —
    so the final chunk may be short, but no chunk is ever fully
    contained in its predecessor. Chunk text is the space-joined token
    slice (whitespace-normalized by construction); ``tok_start``/
    ``tok_end`` index into the document's token sequence so chunks stay
    translatable to token coordinates. Empty/null documents emit no
    rows (a chunk table is a unit-of-work table, not a document table).

    Narrow explode only — no shuffle, no UDF; the token array is
    materialized as a column before any lambda touches it (interpreted
    higher-order functions do not CSE). Exact integer math throughout,
    replayable in ANSI SQL."""
    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride <= window, got {stride}/{window}")
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: w != "",
    )
    base = df.select(F.col(id_col), toks.alias("_toks")).select(
        id_col, "_toks", F.size("_toks").alias("_n")
    )
    starts = base.select(
        id_col,
        "_toks",
        "_n",
        F.posexplode(
            F.sequence(F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(stride))
        ).alias("chunk_idx", "tok_start"),
    ).filter(
        (F.col("tok_start") < F.col("_n"))
        & (
            (F.col("tok_start") == 0)
            | (F.col("tok_start") - stride + window < F.col("_n"))
        )
    )
    return starts.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("tok_start").cast("long").alias("tok_start"),
        F.least(F.col("tok_start") + window, F.col("_n"))
        .cast("long")
        .alias("tok_end"),
        F.array_join(
            F.slice(F.col("_toks"), F.col("tok_start") + 1, F.lit(window)), " "
        ).alias("chunk_text"),
    )


def quality_tiers(
    df: DataFrame,
    n_tiers: int = 4,
    score_col: str = "quality_bp",
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum quality tiering: ntile(``n_tiers``) over each
    stratum's documents ranked by score — the bucketing a curation
    pipeline uses to mix "top-quartile web" vs "tail web" at controlled
    ratios (quality-tier sampling). The rank order is the TOTAL order
    (score desc, id asc), so tier assignment is deterministic under
    retries and repartitioning; one window shuffle keyed on the stratum,
    ids and integer scores only — payloads never move."""
    w = Window.partitionBy(strata_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return df.select(id_col, strata_col, score_col).withColumn(
        "tier", F.ntile(n_tiers).over(w).cast("long")
    )


def perplexity_buckets(
    docs: DataFrame,
    lm_scores: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    score_col: str = "mean_bits_bp",
) -> DataFrame:
    """CCNet's head/middle/tail split: tercile each language's documents
    by LM surprisal (``unigram_lm_score``'s exact-integer
    ``mean_bits_bp`` — lowest third = most predictable = "head"). The
    rank order is total (score asc, id asc), so bucket assignment is
    deterministic under retries and repartitioning. One window shuffle
    keyed on language carrying ids + integer scores only — same scale
    shape as ``quality_tiers``. Emits (id, lang, score, bucket)."""
    w = Window.partitionBy(lang_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    joined = docs.select(id_col, lang_col).join(
        lm_scores.select(id_col, score_col), id_col
    )
    t = F.ntile(3).over(w)
    return joined.withColumn(
        "bucket",
        F.when(t == 1, F.lit("head"))
        .when(t == 2, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


def mix_epochs(
    df: DataFrame,
    epochs_bp: dict[str, int],
    strata_col: str = "source",
    key_col: str = "doc_id",
    default_bp: int = 10000,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic mixture weighting (the Pile/DoReMi data-mixing
    step): replicate each document ``epochs_bp[stratum]/10000`` times —
    whole epochs as exact copies, the fractional epoch as a
    hash-thresholded extra copy — so a source weighted 23000 bp emits
    every doc twice plus a deterministic 30% of docs a third time, and a
    source at 2500 bp keeps a 25% subsample. Emits the input columns
    plus ``copy`` (1-based replica index); zero-copy docs disappear.

    The fractional decision reuses ``stratified_sample``'s portable
    md5-bigint of the stable key, so the mixture is reproducible under
    retries, repartitioning and engine swaps. Strata absent from the map
    get ``default_bp`` (keep once). Pure column math + one explode of a
    bounded sequence — no join (the weight table rides a ``create_map``
    literal), no shuffle, no RNG."""
    if any(bp < 0 for bp in epochs_bp.values()) or default_bp < 0:
        raise ValueError("epochs_bp must be non-negative basis points")
    bucket = F.pmod(
        md5_bigint(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))),
        F.lit(10000),
    )
    w_map = F.create_map(*[F.lit(x) for kv in epochs_bp.items() for x in kv])
    w_bp = F.coalesce(w_map[F.col(strata_col)], F.lit(default_bp))
    frac_bp = F.pmod(w_bp, F.lit(10000))
    # (w - w mod 10000)/10000 is an exact-multiple division — integer-
    # exact in double for any sane weight, unlike truncating w/10000
    whole = ((w_bp.cast("long") - frac_bp) / F.lit(10000)).cast("long")
    copies = whole + (bucket < frac_bp).cast("long")
    staged = df.withColumn("_copies", copies)
    return (
        staged.withColumn(
            "copy",
            F.explode(
                F.when(
                    F.col("_copies") >= 1,
                    F.sequence(F.lit(1).cast("long"), F.col("_copies")),
                ).otherwise(F.array().cast("array<long>"))
            ),
        )
        .drop("_copies")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    k: int = 100,
    order_by: list | None = None,
) -> DataFrame:
    """Per-group document cap ("domain balancing"): keep at most ``k``
    rows per ``group_col``, taking the best rows first. The standard
    crawl-pipeline guard against a single domain (or dump, or source)
    flooding the corpus — CommonCrawl-derived corpora cap per-host
    counts exactly this way before mixing.

    ``order_by`` decides which rows survive; it MUST end in a tiebreaker
    that is unique per row (the default orders by ``n_chars`` descending
    then ``doc_id`` ascending) or the survivor set depends on partition
    iteration order and the cap stops being deterministic.

    Scale shape: one exchange on ``group_col`` + an in-partition top-k —
    Catalyst rewrites ``row_number() <= k`` into a windowed
    group-limit (WindowGroupLimit) so each partition keeps only k rows
    per key before emitting; no global sort, no second shuffle. Skewed
    groups (one host = millions of docs) cost a bounded heap insert per
    row, not a per-group sort."""
    if order_by is None:
        order_by = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    w = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def winsorize_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group outlier clipping: values clamped to the group's exact
    interpolated [lo, hi] percentiles — the tail-taming pass before
    length-weighted sampling or budget packing, where one 10⁶-char
    document would otherwise dominate its stratum.

    Shape: one map-side-combined groupBy computes the per-group
    bracket (two ``percentile`` aggregates — exact here; swap in
    ``approx_percentile`` for the single-pass bounded-memory form at
    100 TB, same plan), then the bracket table — one row per group —
    broadcasts back onto the rows. The data side shuffles ZERO times:
    scan → broadcast-join → clip projection.

    Emits the original row keys plus ``<value_col>_clipped`` (double,
    rounded to 2 — percentile interpolation is fractional even on
    integer inputs)."""
    brackets = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("_p_lo"),
        F.expr(f"percentile({value_col}, {hi})").alias("_p_hi"),
    )
    clipped = F.round(
        F.least(
            F.greatest(F.col(value_col).cast("double"), F.col("_p_lo")),
            F.col("_p_hi"),
        ),
        2,
    )
    return (
        df.join(F.broadcast(brackets), group_col)
        .select(
            *df.columns,
            clipped.alias(f"{value_col}_clipped"),
        )
    )


def group_sample(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 10,
    salt_buckets: int = 32,
) -> DataFrame:
    """Deterministic fixed-``k`` sample per group — the distributed,
    re-runnable equivalent of per-group reservoir sampling. The "random"
    order is ``md5('gs:' || id)`` (id as tiebreak), so the same corpus
    always yields the same sample, any engine can replay it, and adding
    rows to OTHER groups never disturbs a group's picks.

    Scale shape: a naive ``row_number() over (partition by group)``
    sorts every group inside one task — a 10⁹-row group is one straggler
    spilling alone. This runs the standard two-level top-k prune
    instead: per (group, salt) partial top-k first (≤ salt_buckets·k
    survivors per group, exchange hashes on the salted key so heavy
    groups spread over ``salt_buckets`` tasks), then the exact top-k of
    the survivors. Value-identical to the single-level form — a by-rank
    prefix is prunable through any partition of the rows — and the
    second window sorts ≤ salt_buckets·k rows per group.

    Emits (group, id, sample_rank 1..k); k and the hash prefix pin the
    output completely."""
    rkey = F.md5(F.concat(F.lit("gs:"), F.col(id_col).cast("string")))
    salted = df.select(
        F.col(group_col), F.col(id_col), rkey.alias("_rkey"),
        (md5_bigint(F.concat(F.lit("gss:"), F.col(id_col).cast("string")))
         % F.lit(salt_buckets)).alias("_salt"),
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy("_rkey", id_col)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(group_col).orderBy("_rkey", id_col)
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= k)
        .select(group_col, id_col, F.col("sample_rank").cast("long"))
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str] | None = None,
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Rare-stratum privacy audit: every row whose quasi-identifier
    combination (``quasi_cols``) is shared by fewer than ``k`` rows —
    the k-anonymity violation report a release pipeline runs AFTER
    regex-level PII scrubbing, because re-identification risk lives in
    attribute combinations, not in any single redactable token.

    Shape: one map-side-combined groupBy over the quasi columns, then
    the stratum-size table joins back onto the rows (equi-join on the
    same key the aggregation hashed — one exchange each side, AQE free
    to broadcast the stratum table when rare strata make it small).
    Only violating rows are emitted, with their stratum size, so the
    output is the worklist for suppression/generalization.

    Null quasi-values form their own stratum (groupBy semantics) —
    deliberately: "lang unknown" is itself an identifying combination —
    so the join back is NULL-SAFE (``<=>``); a plain equi-join would
    silently drop exactly the null strata, which are usually the rare
    ones the audit exists to catch."""
    quasi = quasi_cols or ["lang", "source"]
    sizes = df.groupBy(*quasi).agg(F.count("*").cast("long").alias("stratum_n"))
    sized = sizes.select(
        *[F.col(c).alias(f"_q_{c}") for c in quasi], F.col("stratum_n")
    )
    cond = None
    for c in quasi:
        piece = F.col(c).eqNullSafe(F.col(f"_q_{c}"))
        cond = piece if cond is None else cond & piece
    return (
        df.select(id_col, *quasi)
        .join(sized, cond)
        .filter(F.col("stratum_n") < k)
        .select(F.col(id_col), *[F.col(c) for c in quasi], F.col("stratum_n"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    bigrams: bool = True,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"), integer-exact: score each raw document by how much
    more a hashed-n-gram model of the TARGET corpus likes its features
    than a model of the raw corpus itself.

    Features are lowercase whitespace unigrams (plus space-joined
    bigrams when ``bigrams=True``) hashed into a FIXED space of
    ``n_buckets`` via the portable md5 hash, so the two bag-of-feature
    models live over the same finite vocabulary and add-one smoothing
    is over buckets, not observed types. Per bucket ``b`` with
    occurrence counts ``tf_x(b)`` and corpus totals ``N_x``:

        bits_x(b)  = floor(log2((N_x + n_buckets) div (tf_x(b) + 1)))
        score(b)   = bits_raw(b) - bits_target(b)

    i.e. the difference of the two add-one-smoothed surprisals in
    whole bits, computed exactly as binary-string length (the
    unigram_lm_score machinery — no float log, no cross-engine
    rounding drift). A document's ``log2_weight`` is the sum of
    ``score`` over its feature OCCURRENCES: positive means the target
    model assigns the document's features more probability mass than
    the raw model — the (floor-)log importance ratio of the paper.
    Selection is the caller's move (top-k, threshold, or
    temperature_sample over shifted weights); this operator is the
    scoring pass.

    Documents with no features are PRESERVED with zeros (left join to
    the input id set), matching unigram_lm_score's contract.

    Plan/scale: both bucket-count tables are bounded by ``n_buckets``
    rows regardless of corpus size, so the per-document scoring join is
    a BROADCAST — the only exchanges are the two map-side-combined
    groupBys on the bucket key (≤ n_buckets keys per partition) and the
    per-document aggregation. Corpus totals are window sums over the
    full-outer-joined count tables (≤ 2·n_buckets rows on one
    partition), so each corpus is scanned exactly once and nothing is
    collected to the driver. At
    10^12 turns the raw corpus streams past a KB-sized score table.
    Quotient-form surprisal keeps every intermediate inside int64 at
    any corpus size (``N + n_buckets`` fits; no products of counts).
    """
    from .text_stats import tokens

    toks = F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))
    if bigrams:
        tail = F.greatest(F.size(toks) - 1, F.lit(0))
        bigr = F.zip_with(
            F.slice(toks, 1, tail),
            F.slice(toks, 2, tail),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        feats_expr = F.concat(toks, bigr)
    else:
        feats_expr = toks
    bucket = F.pmod(
        md5_bigint(F.concat(F.lit("dsir:"), F.col("feat"))), F.lit(n_buckets)
    ).alias("bucket")

    feats_raw = raw.select(
        F.col(id_col), F.explode(feats_expr).alias("feat")
    ).select(F.col(id_col), bucket)
    feats_tgt = target.select(F.explode(feats_expr).alias("feat")).select(bucket)

    counts_r = feats_raw.groupBy("bucket").agg(F.count("*").alias("tf_r"))
    counts_t = feats_tgt.groupBy("bucket").agg(F.count("*").alias("tf_t"))

    def _bits(total: str, tf: str) -> F.Column:
        return (
            F.length(
                F.conv(
                    F.expr(f"({total} + {n_buckets}) div ({tf} + 1)").cast(
                        "string"
                    ),
                    10,
                    2,
                )
            )
            - 1
        ).cast("long")

    # corpus totals as window sums over the FULL-outer-joined count
    # tables (≤ 2·n_buckets rows on one partition — trivially small),
    # NOT as separate .agg() branches: a second aggregation over
    # counts_x would re-run the whole explode + groupBy subtree unless
    # exchange reuse happens to fire. Full outer keeps target-only
    # buckets so n_tgt is the exact target total; their score rows are
    # inert (no raw feature ever joins them).
    wall = Window.partitionBy()
    score = (
        counts_r.join(counts_t, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("tf_r", F.lit(0)).alias("tf_r"),
            F.coalesce("tf_t", F.lit(0)).alias("tf_t"),
        )
        .withColumn("n_raw", F.sum("tf_r").over(wall).cast("long"))
        .withColumn("n_tgt", F.sum("tf_t").over(wall).cast("long"))
        .select(
            "bucket",
            (_bits("n_raw", "tf_r") - _bits("n_tgt", "tf_t")).alias(
                "score_bits"
            ),
        )
    )
    weighted = (
        feats_raw.join(F.broadcast(score), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_features"),
            F.sum("score_bits").cast("long").alias("log2_weight"),
        )
    )
    return (
        raw.select(F.col(id_col))
        .join(weighted, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_features", F.lit(0)).cast("long").alias("n_features"),
            F.coalesce("log2_weight", F.lit(0)).cast("long").alias("log2_weight"),
        )
    )


def seeded_shuffle(
    df: DataFrame,
    seed: str,
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic global shuffle rank — the reproducible training
    order: ``(id, rank)`` where rank is the 0-based position of
    ``md5_32(seed || ':' || id)`` in ascending ``(hash, id)`` order.
    Same seed → same order on any cluster, any partitioning, any day;
    a different seed is a fresh epoch permutation. This is what makes
    "resume epoch 2 at step 41,000" meaningful when the corpus lives
    in a distributed store: the order is a FUNCTION of the data, not
    of the job that read it.

    The naive ``row_number`` over a global ``orderBy`` funnels the
    corpus through one partition. The hash's own value range is the
    escape: ``bucket = h div ceil(2^32 / n_buckets)`` is
    ORDER-COMPATIBLE with h (hash ranges are contiguous), so
    ``row_number`` runs per-bucket (one exchange), bucket offsets are a
    running sum over the n_buckets-row count table (the corpus-totals
    idiom — the SinglePartition window touches bucket COUNTS, never
    data), and the global rank is ``offset[bucket] + rn - 1``. The md5
    hash is uniform, so buckets are balanced by construction — no skew
    handling needed, unlike key-derived buckets.

    Shuffle volume: (id, 8-byte hash) pairs, payloads never move. Rows
    with null id are dropped (no stable identity → no stable order)."""
    h = md5_bigint(
        F.concat(
            F.lit(f"{seed}:"), F.col(id_col).cast("string")
        )
    )
    span = (1 << 32) // n_buckets + 1
    s = (
        df.select(F.col(id_col))
        .filter(F.col(id_col).isNotNull())
        .withColumn("_h", h)
        .withColumn("_b", (F.col("_h") / F.lit(span)).cast("long"))
    )
    w = Window.partitionBy("_b").orderBy("_h", id_col)
    ranked = s.withColumn("_rn", F.row_number().over(w))
    counts = s.groupBy("_b").agg(F.count(F.lit(1)).alias("_cnt"))
    offsets = counts.select(
        "_b",
        F.coalesce(
            F.sum("_cnt").over(
                Window.orderBy("_b").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_off"),
    )
    return (
        ranked.join(F.broadcast(offsets), "_b")
        .select(
            F.col(id_col),
            (F.col("_off") + F.col("_rn") - 1).cast("long").alias("rank"),
        )
    )


def mixture_plan(
    avail: DataFrame,
    weights: dict[str, int],
    budget_tokens: int,
    max_epochs_ppm: int = 4_000_000,
    group_col: str = "source",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Token-budget mixture solver: given per-domain available token
    counts and target mixture weights, compute what each domain must
    contribute to a ``budget_tokens`` training run — and say LOUDLY
    which domains cannot deliver it. This is the planning step every
    pretraining run does between "we counted the corpus" and "we set
    sampling rates": weights express the target distribution; epochs
    express how many times a domain must repeat to meet it; the epoch
    cap (default 4×, the common repeat-tolerance ceiling) turns
    over-asked domains into explicit shortfalls instead of silent
    40-epoch repeats.

    ``weights``: {domain: weight} in arbitrary integer parts (need not
    sum to 100). Domains in ``weights`` but missing from ``avail`` get
    0 available tokens (capped, full shortfall) — a typo'd domain name
    surfaces as a loud all-shortfall row, never a silent drop. Domains
    in ``avail`` but not in ``weights`` are excluded by construction
    (weight 0 means "not in the mix").

    Output, one row per weighted domain: ``(group, avail_tokens,
    weight, target_tokens, alloc_tokens, epochs_ppm, capped,
    shortfall_tokens)`` with ``target = budget·w div Σw``, ``alloc =
    min(target, avail·max_epochs_ppm div 10^6)``, ``epochs_ppm =
    10^6·target div avail``. All exact integer arithmetic; the two
    products that can exceed int64 at 10^13-token budgets run in
    decimal(38) (DuckDB: HUGEINT) and land back in longs.

    Scale shape: ``avail`` is already the tiny per-domain rollup (one
    row per domain), so this is a broadcast join + column math — the
    corpus itself never enters; zero wide operations.
    """
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("mixture weights must sum to a positive integer")
    spark = avail.sparkSession
    wdf = spark.createDataFrame(
        [(k, int(v)) for k, v in weights.items()], f"{group_col} string, weight long"
    )
    a = avail.select(
        F.col(group_col), F.col(tokens_col).cast("long").alias("avail_tokens")
    )
    j = (
        wdf.join(F.broadcast(a), group_col, "left")
        .withColumn("avail_tokens", F.coalesce(F.col("avail_tokens"), F.lit(0)))
        .withColumn(
            "target_tokens",
            F.expr(f"({int(budget_tokens)}L * weight) div {int(total_w)}L"),
        )
        .withColumn(
            "alloc_tokens",
            F.expr(
                "least(target_tokens, cast((cast(avail_tokens as decimal(38,0))"
                f" * {int(max_epochs_ppm)}) div 1000000 as long))"
            ),
        )
    )
    return j.select(
        group_col,
        "avail_tokens",
        "weight",
        "target_tokens",
        "alloc_tokens",
        F.when(
            F.col("avail_tokens") > 0,
            F.expr(
                "cast((cast(1000000 as decimal(38,0)) * target_tokens) "
                "div avail_tokens as long)"
            ),
        ).alias("epochs_ppm"),
        (
            (F.col("avail_tokens") == 0)
            | (F.col("alloc_tokens") < F.col("target_tokens"))
        ).alias("capped"),
        (F.col("target_tokens") - F.col("alloc_tokens")).alias(
            "shortfall_tokens"
        ),
    )
