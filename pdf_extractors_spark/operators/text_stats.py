"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure column expressions — whole-stage
codegen, no UDF — and all replayable in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .hashing import md5_bigint

# tiny per-language stopword lists for the n-gram/stopword heuristic —
# deliberately small and fixed so the oracle SQL can inline them
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
    "es": ["el", "la", "de", "que", "los", "es", "una", "por"],
}

_WS_SPLIT = r"\s+"
# BPE-ish token regex: words, numbers, or single non-space symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col):
    return F.split(F.trim(F.lower(col)), _WS_SPLIT)


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    return df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)).alias(
            "bpe_tokens"
        ),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a single
    composite score in [0,1]."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = tokens(text)
    n_tokens = F.size(toks)
    en = STOPWORDS["en"]
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(en)))
    punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    # All outputs are exact INTEGER basis points (1/10000): float term
    # sums round-tie differently across engines at the 4th decimal (a
    # real 1-in-~800-docs mismatch vs the DuckDB oracle at sf0.1), so
    # every ratio uses exact bigint half-up division, identical anywhere.
    def div_half_up(a, b):
        # (2a + b) div (2b): half-up integer division, positive operands
        return F.expr(f"(2 * ({a}) + ({b})) div (2 * ({b}))")

    base = df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        stop_hits.cast("long").alias("stopword_hits"),
        punct.cast("long").alias("punct_chars"),
    )
    mean_bp = F.when(
        F.col("n_tokens") > 0, div_half_up("10000 * n_chars", "n_tokens")
    ).otherwise(F.lit(0))
    # quality_bp = 4000·min(nc,500)/500 + 4000·hits/tokens
    #            + 2000·(1 - min(5·punct/nc, 1)), each term exact
    term1 = 8 * F.least(F.col("n_chars"), F.lit(500))
    term2 = F.when(
        F.col("n_tokens") > 0, div_half_up("4000 * stopword_hits", "n_tokens")
    ).otherwise(F.lit(0))
    term3 = F.when(
        F.col("n_chars") > 0,
        2000 - F.least(div_half_up("10000 * punct_chars", "n_chars"), F.lit(2000)),
    ).otherwise(F.lit(0))
    return base.select(
        id_col,
        "n_chars",
        "n_tokens",
        mean_bp.cast("long").alias("mean_word_len_bp"),
        "stopword_hits",
        "punct_chars",
        (term1 + term2 + term3).cast("long").alias("quality_bp"),
    )


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Stopword-vote language ID: the language whose stopword list hits
    the most tokens wins; ties broken by language code order; no hits →
    'und' (undetermined). ``keep_cols`` are carried through so per-doc
    enrichments (confusion vs a labeled column, per-source rollups)
    compose in the SAME pass instead of re-joining on id afterwards."""
    toks = tokens(F.col(text_col))
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(sw))).alias(f"hits_{lang}")
        for lang, sw in STOPWORDS.items()
    ]
    scored = df.select(F.col(id_col), *[F.col(c) for c in keep_cols], *scores)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.withColumn("lang_pred", pred)


def vocab_topk(
    df: DataFrame, k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus vocabulary: top-k tokens by document frequency then total
    count (vocab building / stopword discovery). Deterministic ordering:
    (df desc, count desc, token asc). ONE explode + ONE groupBy computing
    both frequencies (countDistinct runs as a partial-aggregated
    expand+merge plan); the final top-k is a tiny sorted limit."""
    all_tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    return (
        all_tok.groupBy("token")
        .agg(
            F.countDistinct(id_col).alias("doc_freq"),
            F.count("*").alias("total_count"),
        )
        .orderBy(F.desc("doc_freq"), F.desc("total_count"), F.asc("token"))
        .limit(k)
    )


def ngram_counts(
    df: DataFrame,
    n: int = 2,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus word-n-gram count table — the statistical-LM prep step
    (KenLM-style count collection) and the input to n-gram novelty /
    memorization analyses. Emits (ngram, total_count, doc_freq) for
    every n-gram with ``total_count ≥ min_count``.

    One explode + one map-side-combined groupBy; the ``min_count``
    filter runs after the merge, pruning the singleton long-tail (the
    overwhelming majority of distinct n-grams at corpus scale) before
    anything downstream touches the table. Unlike ``shingles`` this
    keeps duplicate occurrences — counts, not set membership. The
    groupBy key is the n-gram STRING because the string is the
    deliverable; at 100 TB sizes the shuffle carries each distinct
    n-gram once per map partition (partial aggregation), not once per
    occurrence."""
    words = tokens(F.col(text_col))
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = df.select(F.col(id_col), F.explode(grams).alias("ngram"))
    return (
        exploded.groupBy("ngram")
        .agg(
            F.count("*").alias("total_count"),
            F.countDistinct(id_col).alias("doc_freq"),
        )
        .filter(F.col("total_count") >= min_count)
    )


# PII patterns (planted-data testable; RE2-compatible for the oracle)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d{1,3}[ -]\d{3}[ -]\d{3,4}[ -]?\d{0,4}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact common PII shapes (emails, phone numbers, IPv4 addresses)
    with ``[<KIND>]`` tokens, counting redactions per kind. Pure
    ``regexp_replace``/``regexp_count`` — whole-stage codegen, and the
    patterns are RE2-safe so the DuckDB oracle replays them exactly.
    Applied in pattern order (email first, so phone digits inside an
    already-redacted token can't double-count)."""
    scrubbed = F.col(text_col)
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0)).alias(f"n_{kind}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{kind.upper()}]")
    return df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed_text"))


def repetition_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Intra-document repetition: 1 - distinct n-grams / total n-grams
    (the Gopher/C4-style duplicated-n-gram quality signal). 0 = no
    repetition; → 1 as the document degenerates into loops."""
    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return df.select(
        F.col(id_col),
        total.alias("total_ngrams"),
        distinct.alias("distinct_ngrams"),
        F.round(
            F.when(total > 0, 1.0 - distinct / total).otherwise(F.lit(0.0)), 4
        ).alias("repetition"),
    )


def _fingerprint_mins(text_col: str, k: int, n_mins: int):
    """Column expression: the ``n_mins`` smallest k-gram hashes of a
    document — the winnowing minima shared by ``fingerprint`` (per-doc
    signature string) and ``fingerprint_pairs`` (candidate join)."""
    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hashes = F.transform(F.array_distinct(grams), lambda g: md5_bigint(g))
    return F.slice(F.array_sort(hashes), 1, n_mins)


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 4, n_mins: int = 4,
) -> DataFrame:
    """Winnowing-style document fingerprint: the ``n_mins`` smallest
    hashes of the k-gram (word) set, concatenated. Robust to small edits
    anywhere outside the minimizing grams (the rolling-hash fingerprint
    family, cf. Schleimer et al. winnowing)."""
    mins = _fingerprint_mins(text_col, k, n_mins)
    return df.select(
        F.col(id_col),
        F.array_join(F.transform(mins, lambda h: h.cast("string")), "-").alias(
            "fingerprint"
        ),
    )


def fingerprint_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 4, n_mins: int = 4, min_shared: int = 2, max_bucket: int = 64,
) -> DataFrame:
    """Winnowing candidate generation (the MOSS join): documents sharing
    ≥ ``min_shared`` of their ``n_mins`` fingerprint minima become a
    candidate pair with the shared count — the second half of the
    fingerprint family (``fingerprint`` computes the per-doc signature;
    this turns signatures into pairs an exact verifier then scores).

    Plan shape (the LSH-candidate pattern, never all-pairs): explode the
    minima to (min_hash, id), window-count each hash's bucket over the
    SAME exchange the self-join reuses (the ``ngram_jaccard_pairs``
    rewrite), drop buckets larger than ``max_bucket`` — a minimum shared
    by B documents yields O(B²) pairs and is boilerplate, not signal —
    then equi-join on the hash and count shared minima per pair. Shuffle
    carries (8-byte hash, id) only; ``n_mins`` rows per document.
    """
    mins = df.select(
        F.col(id_col),
        F.explode(_fingerprint_mins(text_col, k, n_mins)).alias("h"),
    )
    rare = (
        mins.withColumn("bucket", F.count("*").over(Window.partitionBy("h")))
        .filter(F.col("bucket") <= max_bucket)
        .select(id_col, "h")
    )
    return (
        rare.alias("a")
        .join(rare.alias("b"), "h")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def unigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style LM quality signal with no external model: per-token
    surprisal under the corpus's OWN add-one-smoothed unigram
    distribution, in integer floor-bits —
    ``floor(log2((N+V)/(tf+1))) = bit_length((N+V) div (tf+1)) - 1``,
    computed exactly via binary-string length (no float log anywhere:
    float log2 + double summation rounds differently across engines and
    partition orders — the exact flake class quality_score's integer
    basis points were introduced to kill). High mean surprisal flags
    gibberish / rare-token documents; very low flags repetitive
    boilerplate.

    Output per document: ``n_tokens``, ``total_bits`` (exact sum),
    ``mean_bits_bp`` (half-up integer basis points). Documents with no
    tokens are PRESERVED with zeros (left join back to the input), not
    silently dropped.

    Plan: one explode, token counts via map-side-combined groupBy, the
    corpus totals as a 1-row aggregate broadcast back in (no driver
    collect), tokens ⋈ counts on the token key, per-document sum, left
    join to the id set. No UDF; replayable in ANSI SQL."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    scalars = counts.agg(
        F.sum("tf").alias("corpus_tokens"), F.count("*").alias("vocab")
    )
    bits = (
        F.length(
            F.conv(
                F.expr("(corpus_tokens + vocab) div (tf + 1)").cast("string"),
                10,
                2,
            )
        )
        - 1
    ).cast("long")
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(scalars))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(bits).alias("total_bits"),
        )
        .withColumn(
            "mean_bits_bp",
            F.expr(
                "(2 * 10000 * total_bits + n_tokens) div (2 * n_tokens)"
            ).cast("long"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("total_bits", F.lit(0)).cast("long").alias("total_bits"),
            F.coalesce("mean_bits_bp", F.lit(0)).cast("long").alias("mean_bits_bp"),
        )
    )


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/DataComp-style structural quality rules, one boolean per
    rule plus the combined pass flag:

    * word count outside [10, 100000],
    * mean word length outside [2, 12] chars,
    * symbol-to-word ratio ('#' chars + '...' runs) > 0.1,
    * >90% of lines start with a bullet (- * •),
    * >30% of lines end with an ellipsis,
    * stopword fraction < 2% (non-natural-language signal).

    Every threshold is evaluated with exact integer cross-multiplication
    (``10·bullets > 9·lines``), never float division — the same
    engine-exactness idiom as quality_score, so the DuckDB oracle
    matches bit-for-bit. Pure column expressions; no UDF, no shuffle."""
    text = F.col(text_col)
    words = F.filter(tokens(text), lambda t: t != F.lit(""))
    n_words = F.size(words).cast("long")
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    bullet = F.size(
        F.filter(
            lines,
            lambda l: F.ltrim(l).startswith("-")
            | F.ltrim(l).startswith("*")
            | F.ltrim(l).startswith("•"),
        )
    ).cast("long")
    ellipsis = F.size(
        F.filter(lines, lambda l: F.rtrim(l).endswith("..."))
    ).cast("long")
    hashes = (
        F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ).cast("long")
    dots = F.size(F.regexp_extract_all(text, F.lit(r"\.\.\."), 0)).cast("long")
    en = STOPWORDS["en"]
    stop_hits = F.size(F.filter(words, lambda t: t.isin(en))).cast("long")

    f_words = (n_words < 10) | (n_words > 100000)
    f_mwl = (word_chars < 2 * n_words) | (word_chars > 12 * n_words)
    f_sym = 10 * (hashes + dots) > n_words
    f_bullet = 10 * bullet > 9 * n_lines
    f_ell = 10 * ellipsis > 3 * n_lines
    f_stop = 50 * stop_hits < n_words
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        f_words.alias("flag_word_count"),
        f_mwl.alias("flag_mean_word_len"),
        f_sym.alias("flag_symbol_ratio"),
        f_bullet.alias("flag_bullet_lines"),
        f_ell.alias("flag_ellipsis_lines"),
        f_stop.alias("flag_stopword_frac"),
        (~(f_words | f_mwl | f_sym | f_bullet | f_ell | f_stop)).alias(
            "gopher_pass"
        ),
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """zlib-compressibility signal: deflate(level 6) bytes over utf-8
    bytes, in half-up integer basis points. Very low ratios flag
    repetitive/templated text; ratios near (or above) 10000 flag
    high-entropy gibberish — the Gopher-style compressibility filter.

    zlib is not expressible in SQL, so this is the engine's canonical
    scalar pandas_udf: Arrow-batched, vectorized over the batch, exact
    integer outputs (deflate level 6 is deterministic), so results are
    engine- and partition-independent even without a SQL oracle (pinned
    by pytest against the same zlib directly)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _ratio_bp(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return 0
            comp = len(zlib.compress(raw, 6))
            return (2 * 10000 * comp + len(raw)) // (2 * len(raw))

        return texts.map(one)

    return df.select(
        F.col(id_col), _ratio_bp(F.col(text_col)).alias("compress_bp")
    )


def segment_paragraphs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Offset-preserving segmentation: explode each document into its
    ``sep``-delimited segments with EXACT character offsets
    (seg_start/seg_end index into the original text, ``text[start:end]``
    == segment), the unit-of-work transform for span-labeled training
    data — downstream span labels stay translatable back to document
    coordinates. Null-text rows are preserved as a single null segment
    (seg_idx 0, offsets null), the engine's preserve-don't-drop contract.

    One narrow explode + one per-document window (cumulative sum of
    prior segment lengths); partitions only by document, so it scales
    with the corpus. Offsets are exact integers — engine-independent,
    replayable in ANSI SQL."""
    from .dedup import _regex_quote

    parts = df.select(
        F.col(id_col),
        F.col(text_col).isNull().alias("_null_text"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _regex_quote(sep), -1)
        ).alias("seg_idx", "segment"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("seg_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # start = chars of all previous segments + one separator per boundary
    start = (
        F.coalesce(F.sum(F.length("segment")).over(w), F.lit(0))
        + F.col("seg_idx") * len(sep)
    ).cast("long")
    return parts.select(
        F.col(id_col),
        F.col("seg_idx").cast("long").alias("seg_idx"),
        F.when(F.col("_null_text"), F.lit(None).cast("string"))
        .otherwise(F.col("segment"))
        .alias("segment"),
        F.when(F.col("_null_text"), F.lit(None).cast("long"))
        .otherwise(start)
        .alias("seg_start"),
        F.when(F.col("_null_text"), F.lit(None).cast("long"))
        .otherwise(start + F.length("segment"))
        .alias("seg_end"),
    )


def dup_ngram_char_frac(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Gopher/RefinedWeb duplicated-n-gram CHARACTER fraction: the
    char-weighted cousin of ``repetition_score`` — basis points of
    text characters covered by word n-grams that occur more than once in
    the document (every occurrence of a duplicated gram counts, so
    overlapping repeats weigh more; capped at 10000). Catches documents
    whose repeats are a few LONG blocks, which the count-based ratio
    underweights.

    Per-document column math only — no shuffle, no UDF: the grams are
    SORTED once per row, making duplicates adjacent, so "occurs more
    than once" is one linear zip over neighbors (O(G log G) per doc)
    instead of a per-gram rescan (O(G²)) or an exploded groupBy (a full
    shuffle of the gram stream at corpus scale). Every intermediate
    array is materialized as a real column before any lambda references
    it — higher-order-function bodies run interpreted and Catalyst does
    not CSE them, so an inline sub-expression would recompute per
    element. Null/short texts yield (0, 0) — preserve-with-zeros.
    Exact integer basis points (half-up): engine- and
    partition-independent."""
    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(
        F.col(id_col),
        F.coalesce(
            # length of the whitespace-COLLAPSED form — the same string
            # the tokens were cut from, so the fraction's denominator
            # matches its numerator (and the SQL oracle) exactly
            F.length(
                F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
            ),
            F.lit(0),
        ).cast("long").alias("norm_chars"),
        F.array_sort(grams).alias("sg"),
    )
    # pair_eq[i] ⇔ sg[i] == sg[i+1]; an occurrence is duplicated iff it
    # equals its left OR right sorted neighbor
    staged = base.withColumn(
        "pair_eq",
        F.when(
            F.size("sg") >= 2,
            F.zip_with(
                F.slice("sg", F.lit(1), F.size("sg") - 1),
                F.slice("sg", F.lit(2), F.size("sg") - 1),
                lambda a, b: a == b,
            ),
        ).otherwise(F.array().cast("array<boolean>")),
    ).withColumn(
        "dup_flags",
        F.zip_with(
            F.concat(F.array(F.lit(False)), F.col("pair_eq")),
            F.concat(F.col("pair_eq"), F.array(F.lit(False))),
            lambda a, b: a | b,
        ),
    )
    dup_chars = F.aggregate(
        F.zip_with(
            F.col("sg"),
            F.col("dup_flags"),
            lambda g, f: F.when(f, F.length(g)).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    agg = staged.select(
        F.col(id_col), F.col("norm_chars"), dup_chars.alias("dup_chars")
    )
    return agg.select(
        F.col(id_col),
        F.col("dup_chars"),
        F.when(
            F.col("norm_chars") > 0,
            F.least(
                F.lit(10000).cast("long"),
                F.expr(
                    "(2 * (10000 * dup_chars) + norm_chars)"
                    " div (2 * norm_chars)"
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dup_char_bp"),
    )


def c4_line_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_words: int = 5, min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2, public
    rules): a line survives iff it ends in a terminal punctuation mark
    (``. ! ? "``), has at least ``min_words`` whitespace words, and does
    not mention ``javascript``; the document survives (``c4_keep``) iff
    at least ``min_kept_lines`` lines survive and the page contains
    neither ``lorem ipsum`` nor a ``{``.

    Emits per document: ``clean_text`` (kept lines re-joined), line
    counters, the page-level flags and the keep verdict. Null text is
    treated as the empty page (0 lines kept). Pure column expressions —
    one narrow projection, no shuffle, no UDF; the line array is
    materialized as a column BEFORE the filter lambda references it
    (interpreted higher-order functions do not CSE their lambda bodies).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    with_lines = df.select(
        F.col(id_col),
        text.alias("_text"),
        F.split(text, "\n", -1).alias("_lines"),
    )
    def line_ok(l):
        last = F.substring(F.rtrim(l), -1, 1)
        words = F.filter(F.split(F.trim(l), _WS_SPLIT), lambda w: w != "")
        return (
            last.isin(".", "!", "?", '"')
            & (F.size(words) >= min_words)
            & ~F.contains(F.lower(l), F.lit("javascript"))
        )
    kept = with_lines.select(
        F.col(id_col),
        F.size("_lines").alias("n_lines"),
        F.filter("_lines", line_ok).alias("_kept"),
        F.contains(F.lower("_text"), F.lit("lorem ipsum")).alias("has_lorem"),
        F.contains("_text", F.lit("{")).alias("has_brace"),
    )
    return kept.select(
        F.col(id_col),
        F.col("n_lines").cast("long").alias("n_lines"),
        F.size("_kept").cast("long").alias("n_kept"),
        F.array_join("_kept", "\n").alias("clean_text"),
        "has_lorem",
        "has_brace",
        (
            (F.size("_kept") >= min_kept_lines)
            & ~F.col("has_lorem")
            & ~F.col("has_brace")
        ).alias("c4_keep"),
    )


def tfidf_terms(
    df: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf·idf — the
    keyword/topic signal a corpus-analysis pipeline derives before
    source balancing. The idf is QUANTIZED to ``floor(log2(N/df))``
    (computed as one-less-than-the-binary-digit-count of the integer
    quotient), so every value in the result is an exact integer and the
    ranking replays bit-identically in any engine — float ``ln`` sums
    round differently across engines/partition orders (the no-float
    oracle rule).

    Plan shape: one explode + map-side-combined groupBy(doc, term) for
    tf; document frequency as a count window over term (reuses the
    aggregate's term-keyed partitioning, no extra pass over payloads);
    the corpus size N rides a broadcast 1-row aggregate; final top-k is
    a row_number window per document with a (score desc, term asc) total
    order. Payload text never shuffles — only (doc, term, counts)."""
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    doc_freq = F.count("*").over(Window.partitionBy("term"))
    n_docs = df.select(F.count("*").alias("_n"))
    scored = (
        tf.withColumn("doc_freq", doc_freq)
        .join(F.broadcast(n_docs))
        .withColumn(
            "qidf",
            (
                F.length(F.conv(F.expr("_n div doc_freq"), 10, 2)) - 1
            ).cast("long"),
        )
        .withColumn("score", (F.col("tf") * F.col("qidf")).cast("long"))
    )
    rank = F.row_number().over(
        Window.partitionBy(id_col).orderBy(
            F.col("score").desc(), F.col("term").asc()
        )
    )
    return (
        scored.withColumn("rank", rank.cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
            "qidf",
            "score",
            "rank",
        )
    )


BLOCKLIST_DEFAULT = (
    "casino", "viagra", "xxx", "jackpot", "betting", "escort",
)


def blocklist_filter(
    df: DataFrame,
    terms: tuple[str, ...] = BLOCKLIST_DEFAULT,
    max_hit_bp: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bad-words filtering (the C4/CCNet blocklist stage): count
    blocked-term token hits per document; ``blocklist_keep`` holds iff
    the hit fraction stays at or below ``max_hit_bp`` basis points
    (default 1%). The raw columns (hits, fraction) are emitted alongside
    the verdict so a pipeline can pick a stricter threshold downstream
    without recomputing.

    The term list is tiny and inlined into the expression (an effective
    broadcast: every executor evaluates it locally, nothing joins);
    hit fraction is exact integer basis points (half-up), so the verdict
    replays identically in any engine. Pure single-pass column math —
    no shuffle, no UDF."""
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(F.filter(toks, lambda t: t != "")).alias("_n"),
        F.size(F.filter(toks, lambda t: t.isin(*terms))).alias("_hits"),
    )
    hit_bp = F.when(
        F.col("_n") > 0,
        F.expr("(2 * 10000 * _hits + _n) div (2 * _n)"),
    ).otherwise(F.lit(0))
    return base.select(
        id_col,
        F.col("_hits").cast("long").alias("blocked_hits"),
        hit_bp.cast("long").alias("blocked_bp"),
        (hit_bp <= max_hit_bp).alias("blocklist_keep"),
    )


def top_ngram_char_frac(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Gopher's top-n-gram rule (the other half of the repetition
    battery next to ``dup_ngram_char_frac``): basis points of text
    characters covered by occurrences of the single MOST FREQUENT word
    n-gram (count × gram length over normalized chars; Gopher gates
    2/3/4-grams at 0.20/0.18/0.16). Returns
    ``(doc_id, top_gram, top_count, top_char_bp)``.

    Per-document column math only — no shuffle, no UDF: grams are
    sorted once per row so equal grams are adjacent, and a single
    ``aggregate`` pass tracks (current run, best run); the first maximal
    run in sorted order makes the tie-break deterministic and
    SQL-replayable (max count, then lexicographically smallest gram).
    Null/short texts yield (null, 0, 0) — preserve-with-zeros. Exact
    integer basis points (half-up, capped at 10000 — overlapping
    occurrences can cover more than the text length)."""
    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(
        F.col(id_col),
        F.coalesce(
            F.length(
                F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
            ),
            F.lit(0),
        ).cast("long").alias("norm_chars"),
        F.array_sort(grams).alias("sg"),
    )
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best_run"),
        F.lit(None).cast("string").alias("best"),
    )

    def step(acc, g):
        new_run = F.when(
            acc["prev"].eqNullSafe(g), acc["run"] + F.lit(1)
        ).otherwise(F.lit(1).cast("long"))
        better = new_run > acc["best_run"]
        return F.struct(
            g.alias("prev"),
            new_run.alias("run"),
            F.when(better, new_run).otherwise(acc["best_run"]).alias("best_run"),
            F.when(better, g).otherwise(acc["best"]).alias("best"),
        )

    scan = F.aggregate(
        F.col("sg"),
        zero,
        step,
        lambda acc: F.struct(
            acc["best"].alias("top_gram"), acc["best_run"].alias("top_count")
        ),
    )
    staged = base.select(
        F.col(id_col), F.col("norm_chars"), scan.alias("t")
    ).select(
        F.col(id_col),
        "norm_chars",
        F.col("t.top_gram").alias("top_gram"),
        F.col("t.top_count").alias("top_count"),
        (F.col("t.top_count") * F.coalesce(F.length("t.top_gram"), F.lit(0)))
        .cast("long")
        .alias("top_chars"),
    )
    return staged.select(
        F.col(id_col),
        "top_gram",
        "top_count",
        F.when(
            F.col("norm_chars") > 0,
            F.least(
                F.lit(10000).cast("long"),
                F.expr(
                    "(2 * (10000 * top_chars) + norm_chars)"
                    " div (2 * norm_chars)"
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("top_char_bp"),
    )


_CARD_RUN_RE = r"[0-9]{13,19}"


def luhn_cards(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Checksum-validated card-number detection: one row per 13-19 digit
    run with its Luhn verdict — ``(id, cand_idx, candidate, luhn_valid)``.

    Plain digit-run redaction (``pii_scrub``-style) would destroy the
    invoice/order/reference numbers the extraction families exist to
    keep, so payment-card scrubbing must validate the checksum first;
    only ``luhn_valid`` rows are actual leaks. The whole check is exact
    integer column math (sequence + aggregate over substr digits —
    candidates are ≤19 chars so the interpreted HOF touches at most 19
    elements per row), no UDF, and replays exactly in the DuckDB oracle
    via list_transform/list_sum. Documents with no digit runs emit no
    rows (posexplode of an empty/null array), identical to the oracle's
    unnest; both regex engines scan greedy non-overlapping, so a 20+
    digit run yields one 19-digit candidate on both sides."""
    exploded = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(_CARD_RUN_RE), 0)
        ).alias("cand_idx", "candidate"),
    )
    length = F.length("candidate")

    def _term(i):
        d = F.substr(F.col("candidate"), i, F.lit(1)).cast("int")
        doubled = d * 2
        return F.when(
            (length - i) % 2 == 1,
            F.when(doubled > 9, doubled - 9).otherwise(doubled),
        ).otherwise(d)

    luhn_sum = F.aggregate(
        F.sequence(F.lit(1), length), F.lit(0), lambda acc, i: acc + _term(i)
    )
    return exploded.select(
        F.col(id_col),
        F.col("cand_idx").cast("long").alias("cand_idx"),
        "candidate",
        (luhn_sum % 10 == 0).alias("luhn_valid"),
    )


# every character lands in exactly one match: a position either starts
# with a non-terminator (first alternative, which swallows the following
# terminator run) or with a terminator (second alternative) — so
# consecutive matches are contiguous from offset 0 and offsets are a
# plain running sum; RE2-safe (no lookahead), replayable in the oracle
_SENTENCE_RE = r"[^.!?]+[.!?]*|[.!?]+"


def split_sentences(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Offset-preserving sentence segmentation: one row per sentence with
    EXACT character offsets (``text[sent_start:sent_end]`` == sentence,
    raw — leading whitespace kept so the invariant holds), the
    sentence-level unit-of-work for dedup/PII/chunking stages. Documents
    with no sentences (null or empty text) are preserved as a single
    null-sentence row (sent_idx 0, offsets null) — same
    preserve-don't-drop contract as ``segment_paragraphs``.

    One narrow explode + one per-document window; partitions only by
    document. The boundary grammar is deliberately simple (terminator
    runs ``[.!?]+`` end a sentence; no abbreviation lexicon) — it is the
    deterministic, engine-portable core; a smarter splitter slots into
    the same offset algebra."""
    sents = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(_SENTENCE_RE), 0
    )
    parts = df.select(
        F.col(id_col),
        (F.size(sents) == 0).alias("_empty"),
        F.posexplode(
            F.when(F.size(sents) == 0, F.array(F.lit(""))).otherwise(sents)
        ).alias("sent_idx", "sentence"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(F.length("sentence")).over(w), F.lit(0)).cast(
        "long"
    )
    return parts.select(
        F.col(id_col),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.when(F.col("_empty"), F.lit(None).cast("string"))
        .otherwise(F.col("sentence"))
        .alias("sentence"),
        F.when(F.col("_empty"), F.lit(None).cast("long"))
        .otherwise(start)
        .alias("sent_start"),
        F.when(F.col("_empty"), F.lit(None).cast("long"))
        .otherwise(start + F.length("sentence"))
        .alias("sent_end"),
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 40,
) -> DataFrame:
    """First BPE merge iteration over the corpus: count adjacent
    character pairs inside whitespace words and return the ``top_k``
    most frequent ``(pair, n)`` — exactly the statistic a BPE tokenizer
    trainer computes to pick its next merge. Running this per merge
    round (re-tokenize, re-count) IS tokenizer training; one round is
    the representative kernel and the one with a clean SQL replay.

    Pure column math: split to words, expand each word to its character
    bigrams with ``transform(sequence(...))`` (no UDF), explode, one
    map-side-combined groupBy, then a distributed TakeOrdered for the
    top-k (count desc, pair asc — total order, so the cut is
    deterministic). The double explode is the honest cost — ~2 bytes of
    shuffle per corpus character, all combiner-reduced per partition
    before the exchange."""
    words = df.select(
        F.explode(tokens(F.col(text_col))).alias("word")
    ).filter(F.length("word") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(top_k)
    )


def unicode_normalize(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFC",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Unicode normalization (UAX #15) of a text column — the repair
    pass a crawl corpus needs before ANY hash-based dedup or shingle
    operator: "café" composed (U+00E9) and decomposed (e + U+0301) are
    byte-different, so un-normalized text silently defeats exact dedup,
    MinHash and fingerprinting. Run this first; every downstream hash
    then sees one canonical byte sequence.

    Returns ``(id, text_nfc, changed)`` with original column order and
    nulls preserved. Arrow-batched scalar pandas_udf around
    ``unicodedata.normalize`` (CPython ships the full UCD; Spark has no
    normalization builtin) — per-batch Python, never per-row at the
    Spark level. Both Python and DuckDB's ``nfc_normalize`` implement
    the same UAX #15 algorithm over the same UCD, which is what makes a
    cross-engine value oracle possible for NFC."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"not a UAX #15 form: {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(texts: pd.Series) -> pd.Series:
        import unicodedata

        return texts.map(
            lambda t: None if t is None else unicodedata.normalize(form, t)
        )

    out = _norm(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        out.alias("text_nfc"),
        (~out.eqNullSafe(F.col(text_col))).alias("changed"),
    )


def tokenize_ids(
    df: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus → token-id sequences: build a frequency vocabulary from
    the corpus itself (top ``vocab_size`` whitespace tokens by count,
    ties by token; id = rank, 0 = OOV) and emit each document as its
    id sequence — the last transform a pretraining pipeline runs before
    packing and sharding. Returns ``(id, n_tokens, n_oov, ids_str)``
    with the sequence space-joined into a string (a canonical text form
    both engines order and hash identically; the array form is one
    ``split`` away).

    Scale shape: vocabulary = one map-side-combined groupBy + a
    distributed TakeOrdered (bounded at ``vocab_size`` rows), then rides
    a BROADCAST into the id-assignment join — token text never shuffles
    for lookup. Sequence reassembly is one explode + one groupBy(doc)
    carrying (pos, id) int pairs, ordered inside the aggregate
    (array_sort on the struct), so no per-document window or global
    sort. Null-text documents are preserved with null ids_str and zero
    counts (the engine's preserve-don't-drop contract)."""
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select(
            "token",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), F.col("token").asc()))
            .cast("long")
            .alias("token_id"),
        )
    )
    pos_tok = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    )
    assigned = pos_tok.join(F.broadcast(vocab), "token", "left").select(
        id_col, "pos", F.coalesce("token_id", F.lit(0)).alias("tid")
    )
    seqs = assigned.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum((F.col("tid") == 0).cast("long")).alias("n_oov"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"].cast("string"),
            ),
            " ",
        ).alias("ids_str"),
    )
    return (
        df.select(id_col)
        .join(seqs, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            "ids_str",
        )
    )


def bigram_lift(
    df: DataFrame,
    min_count: int = 5,
    scale: int = 10000,
    text_col: str = "text",
) -> DataFrame:
    """Collocation lift table over adjacent word bigrams — the
    integer-exact core of PMI (lift = P(x,y)/(P(x)P(y)), reported as
    ``floor(scale · N · c_xy / (c_x · c_y))`` so both engines compare
    exact integers; take log offline if you want PMI proper).

    One token explode feeds BOTH count tables: unigrams groupBy(word),
    bigrams groupBy(x, y) — each map-side combined, so the exchanges
    carry distinct keys per partition, not occurrences. The corpus
    bigram total N rides a broadcast 1-row aggregate (the lm_score
    pattern, no driver collect) and the two unigram lookups are plain
    hashed equi-joins on the word. ``min_count`` prunes the bigram
    long-tail BEFORE the joins. Empty tokens are dropped before
    adjacency (so bigrams span runs of whitespace).

    Overflow bound: scale·N·c_xy must fit int64 — at scale=10⁴ that
    holds to N≈10⁹ bigrams with 10⁵-count pairs; shrink ``scale`` or
    pre-aggregate per shard beyond that (docstring contract, loud in
    the comparison rather than silent)."""
    words = F.filter(tokens(F.col(text_col)), lambda w: w != F.lit(""))
    toks = df.select(words.alias("ws")).filter(F.size("ws") > 0)
    unigrams = toks.select(F.explode("ws").alias("w")).groupBy("w").agg(
        F.count("*").alias("c_w")
    )
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.element_at("ws", i).alias("x"),
                        F.element_at("ws", i + 1).alias("y"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
        ).alias("p")
    ).select("p.x", "p.y")
    big = (
        pairs.groupBy("x", "y")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    total = pairs.groupBy().agg(F.count("*").alias("n_bi"))
    cx = unigrams.select(F.col("w").alias("x"), F.col("c_w").alias("c_x"))
    cy = unigrams.select(F.col("w").alias("y"), F.col("c_w").alias("c_y"))
    return (
        big.join(cx, "x")
        .join(cy, "y")
        .crossJoin(F.broadcast(total))
        .select(
            "x",
            "y",
            "n",
            F.floor(
                (F.lit(scale) * F.col("n_bi") * F.col("n"))
                / (F.col("c_x") * F.col("c_y"))
            ).alias("lift"),
        )
    )


# content-defined chunking parameters: w-char polynomial rolling window,
# base B, modulus M (int64-safe: max_codepoint·B^(w-1)·w < 2^63), a cut
# after position i when H(i) % D == 0 → expected chunk length ≈ D chars
CDC_WINDOW = 8
CDC_BASE = 31
CDC_MOD = 1_000_000_007
CDC_DIV = 64


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_hash: bool = False,
) -> DataFrame:
    """Content-defined chunking (FastCDC/rsync-style): chunk boundaries
    where a polynomial hash of the trailing ``CDC_WINDOW`` characters
    hits ``H % CDC_DIV == 0``, so INSERTIONS SHIFT BOUNDARIES ONLY
    LOCALLY — two documents sharing a long span produce identical
    interior chunks even at different offsets, which is what makes
    chunk-hash dedup catch partially-overlapping documents where
    whole-doc hashing and fixed-width windows both miss.

    Pure higher-order-function column math (zero UDFs, ZERO exchanges —
    a per-row generate): codepoints via ``ascii(substr)``, the rolling
    hash as an ``aggregate`` over a literal power array, boundaries via
    ``filter``, chunk spans via ``arrays_zip`` + ``posexplode``. Cost
    is O(len·w) integer ops per row inside codegen — w is 8; at 100 TB
    this fuses into the scan like random_projection. Emits
    (id, chunk_idx, chunk_start, chunk_len) with 1-based character
    offsets; chunk TEXT deliberately stays behind (substr on demand)
    so the output never re-ships payloads. Null/empty documents emit
    no chunks (a chunk is a non-empty span by definition).

    Hash math is exact int64 both engines: codepoint·B^(w-1)·w ≈
    2·10¹⁶ < 2⁶³ (ASCII/BMP inputs; normalize first — see
    unicode_normalize — for combining-mark stability)."""
    pows = F.array(*[F.lit(CDC_BASE**t).cast("long") for t in range(CDC_WINDOW)])
    t = df.filter(
        F.col(text_col).isNotNull() & (F.length(text_col) > 0)
    ).select(
        F.col(id_col),
        F.col(text_col).alias("_text"),
        F.transform(
            F.sequence(F.lit(1), F.length(text_col)),
            lambda i: F.ascii(F.col(text_col).substr(i, F.lit(1))).cast("long"),
        ).alias("codes"),
    )
    n = F.size("codes")

    def rolling_hash(i):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(CDC_WINDOW - 1)),
            F.lit(0).cast("long"),
            lambda acc, tt: acc
            + F.element_at(F.col("codes"), (i - tt).cast("int"))
            * F.element_at(pows, (tt + 1).cast("int")),
        ) % CDC_MOD

    # guard: Spark's sequence(a, b) DESCENDS when b < a, so a doc
    # shorter than the window must short-circuit to "no interior cuts"
    cuts = F.when(
        n >= CDC_WINDOW,
        F.filter(
            F.sequence(F.lit(CDC_WINDOW), n),
            lambda i: rolling_hash(i) % CDC_DIV == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    # append the document end unless it is already a cut (order-preserving)
    ends = F.when(
        (F.size(cuts) > 0) & (F.element_at(cuts, -1) == n), cuts
    ).otherwise(F.concat(cuts, F.array(n)))
    spans = t.select(
        id_col,
        "_text",
        F.posexplode(ends).alias("chunk_idx", "end"),
        ends.alias("_ends"),
    )
    start = F.when(F.col("chunk_idx") == 0, F.lit(1)).otherwise(
        F.element_at("_ends", F.col("chunk_idx")) + 1
    )
    out = [
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("chunk_start"),
        (F.col("end") - start + 1).cast("long").alias("chunk_len"),
    ]
    if with_hash:
        # content hash of the chunk substring, computed here where the
        # payload is already in hand — consumers (chunk_overlap_pairs)
        # never join back to the text
        out.append(
            md5_bigint(
                F.col("_text").substr(start, F.col("end") - start + 1)
            ).alias("chunk_hash")
        )
    return spans.select(*out)


def chunk_overlap_pairs(
    df: DataFrame,
    min_shared: int = 2,
    max_bucket: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Partial-overlap candidate pairs via shared CDC chunk hashes —
    the consumer `cdc_chunks` exists for: two documents embedding the
    same long span (quoted article, boilerplate wrapper, near-identical
    revision) share its interior chunks VERBATIM even at different
    offsets, so a plain equi-join on chunk hash finds them where
    whole-document hashing (offset-sensitive) and fixed windows both
    miss.

    Plan shape is the LSH-candidate pattern (fingerprint_pairs): hash
    chunks in the same pass that cuts them (no join back to payloads),
    window-count each hash's bucket on the SAME exchange the self-join
    reuses, drop buckets over ``max_bucket`` (a chunk shared by B docs
    is boilerplate and would emit O(B²) pairs), then equi-join and
    count shared chunks per pair. Shuffle carries (8-byte hash, id)
    rows only — chunk text never moves."""
    hashed = cdc_chunks(df, text_col, id_col, with_hash=True).select(
        id_col, "chunk_hash"
    ).distinct()
    rare = (
        hashed.withColumn(
            "bucket", F.count("*").over(Window.partitionBy("chunk_hash"))
        )
        .filter(F.col("bucket") <= max_bucket)
        .select(id_col, "chunk_hash")
    )
    return (
        rare.alias("a")
        .join(rare.alias("b"), "chunk_hash")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def pii_spans(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-offset PII span extraction: one row per PII hit with its
    ``[span_start, span_end)`` character range and matched value — the
    labeled-span sibling of ``pii_scrub`` (which redacts in place), and
    the same span contract the extraction pipeline's north rule uses
    for field spans. Offsets let a downstream redactor edit the ORIGINAL
    bytes (or audit a scrub) instead of trusting a rewritten string.

    Zero UDFs, zero shuffles: for each pattern the text splits into
    non-matching segments (``split``) beside its matches
    (``regexp_extract_all``), and one ``aggregate`` fold over the match
    indices turns segment/match lengths into running start/end offsets
    — per-row column math in codegen, so the operator fuses into the
    scan. One pass per pattern kind (the pattern set is small and
    fixed); rows with no hits produce no output rows."""
    span_t = "array<struct<span_start:bigint,span_end:bigint,value:string>>"
    parts = []
    for kind, pat in PII_PATTERNS.items():
        ms = F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
        ps = F.split(F.col(text_col), pat, -1)
        idxs = F.when(
            F.size(ms) > 0, F.sequence(F.lit(1), F.size(ms))
        ).otherwise(F.array().cast("array<int>"))
        init = F.struct(
            F.lit(0).cast("long").alias("pos"),
            F.array().cast(span_t).alias("spans"),
        )

        def _make_step(ms, ps):
            def _step(acc, i):
                start = acc["pos"] + F.length(F.element_at(ps, i))
                end = start + F.length(F.element_at(ms, i))
                return F.struct(
                    end.alias("pos"),
                    F.concat(
                        acc["spans"],
                        F.array(
                            F.struct(
                                start.alias("span_start"),
                                end.alias("span_end"),
                                F.element_at(ms, i).alias("value"),
                            )
                        ),
                    ).alias("spans"),
                )

            return _step

        _step = _make_step(ms, ps)

        spans = F.aggregate(idxs, init, _step, lambda acc: acc["spans"])
        parts.append(
            df.select(
                F.col(id_col),
                F.lit(kind).alias("label"),
                F.explode(spans).alias("_s"),
            ).select(
                id_col,
                "label",
                F.col("_s.span_start").alias("span_start"),
                F.col("_s.span_end").alias("span_end"),
                F.col("_s.value").alias("value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------- BPE trainer


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    max_words: int = 100_000,
) -> "DataFrame":
    """Full BPE tokenizer training (Sennrich et al. 2016, "Neural
    Machine Translation of Rare Words with Subword Units"): returns the
    learned merge table ``(rank, left, right, merged)`` — the artifact a
    tokenizer ships. ``bpe_pair_counts`` is round one of this loop with
    a SQL replay; this is the whole loop.

    Distributed shape — the corpus is touched ONCE: a single
    map-side-combined ``groupBy(word)`` builds the weighted word
    histogram, capped to the ``max_words`` most frequent words by
    (count desc, word asc) — a deterministic total order, so the cap is
    reproducible at any parallelism. The merge loop then runs on the
    capped histogram (≤ max_words rows, broadcast-scale — the same
    driver-side class as ``salting.heavy_hitters``; corpus text never
    leaves the executors), which is how production BPE trainers work:
    merge statistics are a function of the word histogram, not of the
    corpus, so re-scanning per merge round would be pure waste.
    Tie-breaks inside the loop are lexicographic on the pair, making the
    merge table a pure function of the histogram.

    No SQL oracle BY DESIGN (iterative argmax is not expressible as one
    DuckDB query); pytest pins the trainer against hand-computed merges
    and property-checks the encode/decode round-trip instead."""
    hist = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]): r["n"] for r in hist
    }
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1]))
        merged_sym = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    spark = df.sparkSession
    return spark.createDataFrame(
        [(r, l, rt, l + rt) for r, l, rt in merges],
        "rank int, left string, right string, merged string",
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list: ``(id, bpe_tokens array<string>,
    n_bpe_tokens)`` per document. Whitespace words are split to
    characters and the merges replayed in rank order — the standard
    greedy BPE encoder.

    Arrow-batched ``mapInPandas`` with a per-batch WORD memo: each
    distinct word is encoded once per batch and the result reused
    (Zipf makes the memo hit rate ~95%+ on natural text), so the
    Python-side work scales with distinct words, not corpus tokens.
    Tokenization is an inherently per-word state machine — same
    slow-path justification as the extraction kernels; everything
    around it stays in codegen.

    Invariant (pytest property): ``concat(bpe_tokens)`` of each word
    equals the word — encoding never drops or duplicates characters."""
    ranks: dict[tuple[str, str], int] = {
        (l, r): i for i, (l, r) in enumerate(merges)
    }

    def _encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word)
        while len(syms) > 1:
            best_i, best_rank = -1, None
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_i, best_rank = i, rk
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        memo[word] = syms
        return syms

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, bpe_tokens array<string>, n_bpe_tokens int"
    )

    def _encode_batches(batches):
        for pdf_ in batches:
            memo: dict = {}
            toks = [
                [
                    t
                    for w in str(txt).lower().split()
                    for t in _encode_word(w, memo)
                ]
                if txt is not None
                else []
                for txt in pdf_[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf_[id_col],
                    "bpe_tokens": toks,
                    "n_bpe_tokens": [len(t) for t in toks],
                }
            )

    return df.select(id_col, text_col).mapInPandas(_encode_batches, out_schema)


# ------------------------------------------- extraction text repair


def dehyphenate(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PDF line-break hyphenation repair: a lowercase letter, a hyphen,
    a newline, then a lowercase letter is a typesetter's soft break
    (``exam-\\nple`` → ``example``), the single most common artifact of
    PDF text extraction (reference extractors see its input shape in
    every page dump, e.g. mobil_oil.py's line loops). Uppercase
    continuations (``UTC-\\nTIME``) and digit ranges (``2023-\\n2024``)
    are NOT joined — those hyphens are semantic.

    Emits ``(id, fixed_text, n_joins)`` where ``n_joins`` is exact:
    every repair removes precisely the two characters ``-\\n``, so the
    count is ``(len(text) - len(fixed)) / 2`` in integer math. Null
    text yields the empty string with 0 joins.

    One narrow projection — regexp_replace in whole-stage codegen, no
    shuffle, no UDF; left-to-right non-overlapping replacement
    semantics are identical in Java regex and the oracle's RE2 'g'
    mode, so the output is bit-stable across engines."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    fixed = F.regexp_replace(text, r"([a-z])-\n([a-z])", r"$1$2")
    return df.select(
        F.col(id_col),
        fixed.alias("fixed_text"),
        ((F.length(text) - F.length(fixed)) / 2)
        .cast("long")
        .alias("n_joins"),
    )


def strip_repeated_lines(
    df: DataFrame,
    doc_col: str = "doc_id",
    page_col: str = "page_no",
    text_col: str = "text",
    min_pages: int = 3,
    min_frac_bp: int = 5000,
) -> DataFrame:
    """Frequency-based header/footer removal — the main-content
    extraction heuristic the stop-list filter (F1/boilerplate_filter)
    cannot express: a line is page furniture iff ITS OWN DOCUMENT
    repeats it, so running headers, footers and page numbers are
    discovered per document instead of enumerated globally. A line is
    stripped when its digit-normalized form (digits → ``0``, trimmed,
    lowercased — so ``Page 1`` / ``Page 17`` collide) appears on at
    least ``min_frac_bp``/10000 of the document's pages, and the
    document has at least ``min_pages`` pages (short docs have no
    meaningful repetition signal). Blank lines are never treated as
    furniture. The threshold test is exact integer math
    (``n_on * 10000 >= min_frac_bp * n_pages``).

    Input is one row per (doc, page); output one row per (doc, page)
    with ``clean_text`` (kept lines re-joined in original order),
    ``n_lines`` and ``n_stripped``. Pages whose every line is stripped
    stay in the output with an empty ``clean_text``.

    Plan: explode lines once; the furniture table is a
    (doc, norm_line) → distinct-page count aggregation whose shuffle
    rows carry only the normalized line and two ids; the anti-join back
    and the per-page reassembly both cluster on ``doc_col``, so AQE
    keeps the big side's partitioning — payload lines move twice total,
    counts once. At 100 TB pages of one document are a few thousand
    rows at most, so no key can skew: the grouping key includes the
    document id."""
    norm = lambda c: F.lower(F.trim(F.regexp_replace(c, r"[0-9]+", "0")))
    lines = df.select(
        F.col(doc_col),
        F.col(page_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
        ).alias("line_no", "line"),
    ).withColumn("norm", norm(F.col("line")))
    n_pages = df.groupBy(doc_col).agg(
        F.countDistinct(page_col).alias("n_pages")
    )
    furniture = (
        lines.filter(F.col("norm") != "")
        .groupBy(doc_col, "norm")
        .agg(F.countDistinct(page_col).alias("n_on"))
        .join(n_pages, doc_col)
        .filter(
            (F.col("n_pages") >= min_pages)
            & (F.col("n_on") * 10000 >= min_frac_bp * F.col("n_pages"))
        )
        .select(doc_col, "norm")
    )
    kept = lines.join(furniture, [doc_col, "norm"], "left_anti")
    return (
        lines.groupBy(doc_col, page_col)
        .agg(F.count("*").alias("n_lines"))
        .join(
            kept.groupBy(doc_col, page_col).agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("line_no", "line"))
                        ),
                        lambda s: s["line"],
                    ),
                    "\n",
                ).alias("clean_text"),
                F.count("*").alias("n_kept"),
            ),
            [doc_col, page_col],
            "left",
        )
        .select(
            doc_col,
            page_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n_lines").cast("long").alias("n_lines"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_stripped"),
        )
    )


# ------------------------------------------------- span interval algebra


def merge_spans(
    spans: DataFrame,
    id_col: str = "doc_id",
    start_col: str = "span_start",
    end_col: str = "span_end",
) -> DataFrame:
    """Interval union per document: overlapping or end-exclusive-adjacent
    ``[start, end)`` spans coalesce into maximal merged spans with an
    exact constituent count — the post-processing pass every span
    producer here feeds (extraction field spans per the north rule's
    span contract, pii_spans, duplicate_spans) before a redactor or
    highlighter can edit text without double-applying overlapping edits.

    Gaps-and-islands: per document in (start, end) order, a span opens a
    new island iff it starts strictly after the running max end
    (``start == prev_max_end`` merges — with end-exclusive spans those
    touch). One running-max window, one cumulative-sum window and the
    final groupBy all cluster on the document id, so the operator is ONE
    exchange; per-document span counts are small by construction, so the
    key cannot skew."""
    w = Window.partitionBy(id_col).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opened = spans.select(
        F.col(id_col),
        F.col(start_col),
        F.col(end_col),
        F.when(
            prev_max.isNull() | (F.col(start_col) > prev_max), 1
        ).otherwise(0).alias("_new"),
    )
    islands = opened.select(
        id_col,
        start_col,
        end_col,
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_island"),
    )
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min(start_col).cast("long").alias("span_start"),
            F.max(end_col).cast("long").alias("span_end"),
            F.count("*").cast("long").alias("n_merged"),
        )
        .select(id_col, "span_start", "span_end", "n_merged")
    )


def span_coverage(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    start_col: str = "span_start",
    end_col: str = "span_end",
) -> DataFrame:
    """Per-document span coverage: how much of the text the (merged)
    spans address — the audit metric for an extraction or PII pass
    (a page whose spans cover 95% of its characters was swallowed by
    one field; one at 0 bp produced nothing). Overlaps are merged
    FIRST, so double-labeled characters count once.

    Emits ``(id, n_chars, covered_chars, n_spans, coverage_bp)`` with
    half-up integer basis points; documents with no spans are preserved
    with zeros (left join from the doc side), and empty/null text
    reports 0 bp. Merged-span counts aggregate per document id — one
    exchange on each side of a small left join."""
    merged = merge_spans(spans, id_col, start_col, end_col)
    per_doc = merged.groupBy(id_col).agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("covered_chars"),
        F.count("*").alias("n_spans"),
    )
    return (
        docs.select(
            F.col(id_col),
            F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias(
                "n_chars"
            ),
        )
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_chars",
            F.coalesce("covered_chars", F.lit(0)).cast("long").alias(
                "covered_chars"
            ),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.when(F.col("n_chars") > 0,
                F.expr(
                    "(2 * 10000 * coalesce(covered_chars, 0) + n_chars)"
                    " div (2 * n_chars)"
                ),
            ).otherwise(F.lit(0)).cast("long").alias("coverage_bp"),
        )
    )


# ------------------------------------------------ mixed-language pages


# deterministic argmax priority when stopword hit counts tie
LANG_TIE_ORDER = ["en", "de", "fr", "es"]


def lang_segments(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Line-level language segmentation for mixed-language documents:
    every line gets the stopword-hit argmax language (ties resolved in
    the fixed ``LANG_TIE_ORDER`` priority; zero hits → ``und``), then
    consecutive same-language lines coalesce into segments — the
    operator that lets a per-language pipeline (quality tiers,
    stratified sampling, per-language dedup) route PARTS of a document
    instead of mislabeling the whole page by its majority language.

    Emits ``(id, seg_idx, lang, line_start, line_end, n_lines)`` with
    0-based line offsets, ``seg_idx`` dense per document. Blank lines
    score zero hits and become ``und`` segments — they split language
    runs rather than gluing them (documented choice: a blank line is a
    paragraph boundary, the natural segmentation point).

    Plan: one narrow line explode with per-line hit counts in codegen,
    a lag window and a cumulative sum clustered on the document id, and
    a groupBy on (id, segment) the same hash partitioning satisfies —
    ONE exchange end-to-end."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
        ).alias("line_no", "line"),
    )
    toks = tokens(F.col("line"))

    # one-arg closure per language: a two-parameter lambda would be
    # interpreted by F.filter as (element, index)
    def _hit_pred(words: list[str]):
        return lambda t: t.isin(words)

    hits = {
        lang: F.size(F.filter(toks, _hit_pred(words)))
        for lang, words in STOPWORDS.items()
    }
    no_hits = None
    for h in hits.values():
        no_hits = (h == 0) if no_hits is None else (no_hits & (h == 0))
    pick = F.when(no_hits, F.lit("und"))
    for i, lang in enumerate(LANG_TIE_ORDER):
        cond = None
        for other in LANG_TIE_ORDER[i + 1 :]:
            c = hits[lang] >= hits[other]
            cond = c if cond is None else (cond & c)
        pick = (
            pick.when(cond, F.lit(lang))
            if cond is not None
            else pick.otherwise(F.lit(lang))
        )
    scored = lines.select(id_col, "line_no", pick.alias("lang"))
    w = Window.partitionBy(id_col).orderBy("line_no")
    changed = scored.select(
        id_col,
        "line_no",
        "lang",
        F.when(
            F.col("lang").eqNullSafe(F.lag("lang").over(w)), 0
        ).otherwise(1).alias("_new"),
    )
    segs = changed.select(
        id_col,
        "line_no",
        "lang",
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_seg"),
    )
    return (
        segs.groupBy(id_col, "_seg")
        .agg(
            F.min("lang").alias("lang"),
            F.min("line_no").cast("long").alias("line_start"),
            F.max("line_no").cast("long").alias("line_end"),
            F.count("*").cast("long").alias("n_lines"),
        )
        .select(
            id_col,
            (F.col("_seg") - 1).cast("long").alias("seg_idx"),
            "lang",
            "line_start",
            "line_end",
            "n_lines",
        )
    )


def quality_ensemble(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    lang_col: str = "lang", tiers: int = 4,
) -> DataFrame:
    """Rank-average quality ensemble: three independent integer signals
    — composite quality (``quality_score``), cross-corpus n-gram
    novelty (``ngram_novelty``) and intra-document repetition — are
    combined by PER-LANGUAGE rank sum, then cut into ``tiers`` ntile
    tiers. Rank aggregation is the standard way to blend signals with
    incomparable scales without inventing weights; ranking per language
    keeps one language's length/stopword distribution from swamping
    another's (same reasoning as ``quality_tiers``).

    Every rank is a ``row_number`` with the document id as the final
    tie-break, so the output is a pure function of the corpus at any
    parallelism. Better = rank 1: quality DESC, novelty DESC,
    repetition ASC.

    Scale: three one-exchange signal passes join on the id, then
    per-language windows. Like ``quality_tiers``, the per-language sort
    is the documented scale ceiling — beyond what one partition per
    language can sort, replace the window with range-partitioned
    ranking (the ``global_index`` construction) per language."""
    from .dedup import ngram_novelty

    q = quality_score(df, text_col, id_col).select(id_col, "quality_bp")
    nv = ngram_novelty(df, 3, text_col, id_col).select(id_col, "novelty_bp")
    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.array_join(F.slice(toks, i + 1, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # the gram array is materialized as a column first so the two
    # size() calls don't rebuild it (interpreted HOFs do not CSE)
    rep = (
        df.select(F.col(id_col), F.col(lang_col), grams.alias("_g"))
        .select(
            id_col,
            lang_col,
            F.when(
                F.size("_g") > 0,
                F.expr(
                    "((size(_g) - size(array_distinct(_g))) * 10000)"
                    " div size(_g)"
                ),
            ).otherwise(F.lit(0)).cast("long").alias("rep_bp"),
        )
    )
    joined = rep.join(q, id_col).join(nv, id_col)
    byl = Window.partitionBy(lang_col)
    r_q = F.row_number().over(
        byl.orderBy(F.col("quality_bp").desc(), F.col(id_col).asc())
    )
    r_n = F.row_number().over(
        byl.orderBy(F.col("novelty_bp").desc(), F.col(id_col).asc())
    )
    r_r = F.row_number().over(
        byl.orderBy(F.col("rep_bp").asc(), F.col(id_col).asc())
    )
    ranked = joined.select(
        id_col,
        lang_col,
        (r_q + r_n + r_r).cast("long").alias("rank_sum"),
    )
    tier = F.ntile(tiers).over(
        byl.orderBy(F.col("rank_sum").asc(), F.col(id_col).asc())
    )
    return ranked.select(
        id_col, lang_col, "rank_sum", tier.cast("long").alias("ens_tier")
    )


def length_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = "source",
) -> DataFrame:
    """Log2 length histogram per source: documents bucketed by
    ``floor(log2(n_chars))`` — the one-pass corpus-shape report that
    catches ingest regressions (a new crawler emitting 100× shorter
    pages moves a spike two buckets left) without the cost of exact
    percentiles. Bucket −1 is the explicit empty/null-text class.

    Exact integer math: the bucket is one-less-than-the-binary-digit-
    count (the ``lm_score`` trick — no float log), counts and char
    sums are plain longs. One map-side-combined aggregation; shuffle
    rows ∝ sources × ~40 buckets."""
    n = F.length(F.coalesce(F.col(text_col), F.lit("")))
    bucket = F.when(n == 0, F.lit(-1)).otherwise(
        F.length(F.conv(n.cast("string"), 10, 2)) - 1
    )
    key_names = ([group_col] if group_col else []) + ["len_bucket"]
    sel = df.select(
        *([F.col(group_col)] if group_col else []),
        bucket.cast("long").alias("len_bucket"),
        n.alias("_n"),
    )
    return sel.groupBy(*key_names).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_n").cast("long").alias("total_chars"),
        F.min("_n").cast("long").alias("min_chars"),
        F.max("_n").cast("long").alias("max_chars"),
    )


def token_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gini–Simpson token diversity in exact integer basis
    points: ``10000 · (1 − Σ c_t² / N²)`` over whitespace-token counts.
    0 = one token repeated (or empty); → 10000 as every token becomes
    unique. The entropy-style low-diversity-spam signal (keyword floods,
    SEO stuffing) without floats — unlike Shannon entropy the index is
    rational in the counts, so Spark and the DuckDB oracle agree
    bit-for-bit.

    Shape: wordcount — explode → groupBy(doc, token) with map-side
    combine → per-doc sum/sum-of-squares → left join back to the id set
    so null/empty documents survive with ``n_tokens 0, diversity_bp 0``.
    Both aggregations hash on doc-prefixed keys; shuffle rows ∝ distinct
    (doc, token), never occurrences."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    per_tok = toks.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    per_doc = per_tok.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("_s2"),
    )
    n2 = F.col("n_tokens") * F.col("n_tokens")
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(
                F.expr("10000 * (n_tokens * n_tokens - _s2)") / n2, F.lit(0)
            )
            .cast("long")
            .alias("diversity_bp"),
        )
    )


def corpus_tvd(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-distribution total-variation distance between every ordered
    pair of corpus slices (``group_col`` values): the drift report that
    says HOW differently two crawls/sources/snapshots are worded, in
    exact integer basis points (0 = identical unigram distribution,
    10000 = disjoint vocabularies).

    TVD = ½ Σ_t |p_a(t) − p_b(t)| is rational in the counts:
    ``10000 · Σ|c_a·N_b − c_b·N_a| // (2·N_a·N_b)``. Tokens present in
    only one slice are folded in WITHOUT a full-outer join: their summed
    contribution is ``(N_a − C_a∩)·N_b`` (and symmetrically), where
    C_a∩ is slice a's mass on the shared vocabulary — so the plan is a
    wordcount, one vocab-sized self-join on token (inner), one
    group-pair aggregation, and a broadcast of the per-slice totals.
    Nothing corpus-sized ever shuffles twice; the join carries one row
    per (token, slice-pair both present).

    Bigint envelope: |c·N| ≤ N_a·N_b — exact up to ~3·10⁹ tokens per
    slice; beyond that pre-scale counts (divide both sides by a common
    factor) before calling."""
    toks = df.select(
        F.col(group_col).alias("g"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    cnt = toks.groupBy("g", "tok").agg(F.count("*").cast("long").alias("c"))
    tot = cnt.groupBy("g").agg(F.sum("c").cast("long").alias("n"))
    a, b = [cnt.alias(s) for s in ("a", "b")]
    ta, tb = [
        F.broadcast(tot.select(F.col("g").alias(f"g{s}"), F.col("n").alias(f"n{s}")))
        for s in ("a", "b")
    ]
    shared = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.g") < F.col("b.g")))
        .select(
            F.col("a.g").alias("ga"),
            F.col("b.g").alias("gb"),
            F.col("a.c").alias("ca"),
            F.col("b.c").alias("cb"),
        )
        .join(ta, "ga")
        .join(tb, "gb")
        .groupBy("ga", "gb", "na", "nb")
        .agg(
            F.sum(F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")))
            .cast("long")
            .alias("_shared_num"),
            F.sum("ca").cast("long").alias("_ca_shared"),
            F.sum("cb").cast("long").alias("_cb_shared"),
        )
    )
    # pairs with NO shared vocabulary never appear in the inner join:
    # rebuild the full pair list from the (tiny) totals table so they
    # surface with tvd_bp = 10000 instead of silently vanishing
    pairs = (
        tot.select(F.col("g").alias("ga"), F.col("n").alias("na"))
        .join(tot.select(F.col("g").alias("gb"), F.col("n").alias("nb")), F.col("ga") < F.col("gb"))
    )
    num = (
        F.coalesce("_shared_num", F.lit(0))
        + (F.col("na") - F.coalesce("_ca_shared", F.lit(0))) * F.col("nb")
        + (F.col("nb") - F.coalesce("_cb_shared", F.lit(0))) * F.col("na")
    )
    return (
        pairs.join(shared, ["ga", "gb", "na", "nb"], "left")
        .select(
            F.col("ga").alias("source_a"),
            F.col("gb").alias("source_b"),
            F.col("na").alias("n_tokens_a"),
            F.col("nb").alias("n_tokens_b"),
            num.alias("_num"),
        )
        .select(
            "source_a",
            "source_b",
            "n_tokens_a",
            "n_tokens_b",
            F.expr("10000 * _num div (2 * n_tokens_a * n_tokens_b)")
            .cast("long")
            .alias("tvd_bp"),
        )
    )


def bigram_coverage(
    df: DataFrame,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document fluency proxy without a neural LM: the fraction (in
    exact basis points) of a document's adjacent word pairs that the
    corpus itself has seen ``min_count``+ times. Natural prose re-uses
    collocations, so well-formed documents score high; word-salad,
    shuffled-token spam, and OCR shred score low even when every
    individual token is common — the signal unigram quality scores miss.
    The KenLM-shaped filter (score under corpus n-gram statistics)
    reduced to rational arithmetic so the DuckDB oracle replays it
    bit-for-bit.

    Shape: two wordcount exchanges — corpus bigram counts (map-side
    combined, singleton tail pruned by ``min_count`` BEFORE the join),
    then doc-bigrams ⋈ surviving counts. The join's build side is the
    pruned bigram table (vocab-sized); marking it broadcast-eligible is
    left to AQE since "vocab" can still be large at 100 TB. Documents
    with < 2 tokens (incl. null/empty) survive via left join with
    ``n_bigrams 0, coverage_bp 0``."""
    words = tokens(F.col(text_col))
    grams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.array_join(F.slice(words, i + 1, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    doc_grams = df.select(F.col(id_col), F.explode(grams).alias("ngram"))
    common = (
        doc_grams.groupBy("ngram")
        .agg(F.count("*").alias("_tc"))
        .filter(F.col("_tc") >= min_count)
        .select("ngram")
    )
    per_doc = (
        doc_grams.join(common.withColumn("_hit", F.lit(1)), "ngram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_common"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.coalesce(
                F.expr("(2 * 10000 * n_common + n_bigrams) div (2 * n_bigrams)"),
                F.lit(0),
            )
            .cast("long")
            .alias("coverage_bp"),
        )
    )


def cdc_savings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level dedupable-bytes estimate over content-defined
    chunks — the number a storage/dedup team computes BEFORE deciding
    whether chunk-level dedup pays for itself (the FastCDC/venti use
    case): every chunk whose (hash, length) repeats stores once and
    saves ``(copies - 1) · length`` characters.

    One row::

        total_chunks   chunks across the corpus
        unique_chunks  distinct (hash, length) chunk identities
        total_chars    characters across all chunks (= corpus non-empty
                       text volume, since chunks tile each document)
        dup_chars      characters saved by storing each identity once
        savings_bp     dup_chars / total_chars in half-up basis points

    Composition: :func:`cdc_chunks` with ``with_hash=True`` (zero
    exchanges, hash computed while the payload is in hand) → one
    map-side-combined groupBy on the 8-byte (hash, len) identity —
    payloads never shuffle — → a 1-row final aggregate. Same shape at
    100 TB: the chunk-identity exchange carries ~16 bytes + a count per
    distinct chunk."""
    ch = cdc_chunks(df, text_col, id_col, with_hash=True)
    per = ch.groupBy("chunk_hash", "chunk_len").agg(
        F.count("*").cast("long").alias("_copies")
    )
    rep = per.agg(
        F.sum("_copies").cast("long").alias("total_chunks"),
        F.count("*").cast("long").alias("unique_chunks"),
        F.sum(F.col("_copies") * F.col("chunk_len"))
        .cast("long")
        .alias("total_chars"),
        F.sum((F.col("_copies") - 1) * F.col("chunk_len"))
        .cast("long")
        .alias("dup_chars"),
    )
    return rep.select(
        "total_chunks",
        "unique_chunks",
        "total_chars",
        "dup_chars",
        F.when(
            F.col("total_chars") > 0,
            F.floor(
                (F.lit(2) * 10000 * F.col("dup_chars") + F.col("total_chars"))
                / (F.lit(2) * F.col("total_chars"))
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("savings_bp"),
    )


def rank_agreement(
    df: DataFrame,
    score_a: str,
    score_b: str,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Do two quality signals agree on the ORDER of documents? Per
    group, Spearman's footrule distance between the two rankings
    (descending score, ties broken by id so the ranking — and therefore
    the oracle — is total and deterministic), normalized against the
    maximum possible footrule ``floor(n²/2)`` into an exact-integer
    agreement score. The calibration check run before swapping one
    quality filter for a cheaper one: agreement_bp near 10000 means the
    cheap signal keeps the same documents.

    Per group emits::

        n_docs        ranked documents (null scores rank last, ties
                      by id — every row participates)
        footrule      Σ |rank_a - rank_b|
        agreement_bp  10000 - half-up(footrule / floor(n²/2)); 10000
                      when n < 2 (a single document cannot disagree)

    Two per-group sorts (the two rank windows) + one per-group
    aggregate, all clustering on the group key — one exchange. At 100 TB
    per-group global ranks are the documented ceiling (same as
    quality_tiers); beyond it, range-partitioned ranks via the
    global_index construction."""
    wa = Window.partitionBy(group_col).orderBy(
        F.col(score_a).desc_nulls_last(), F.col(id_col)
    )
    wb = Window.partitionBy(group_col).orderBy(
        F.col(score_b).desc_nulls_last(), F.col(id_col)
    )
    ranked = df.select(
        group_col,
        F.row_number().over(wa).alias("_ra"),
        F.row_number().over(wb).alias("_rb"),
    )
    per = ranked.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.abs(F.col("_ra") - F.col("_rb")))
        .cast("long")
        .alias("footrule"),
    )
    max_fr = F.floor(F.col("n_docs") * F.col("n_docs") / 2)
    return per.select(
        group_col,
        "n_docs",
        "footrule",
        F.when(F.col("n_docs") < 2, F.lit(10000))
        .otherwise(
            F.lit(10000)
            - F.floor(
                (F.lit(2) * 10000 * F.col("footrule") + max_fr)
                / (F.lit(2) * max_fr)
            )
        )
        .cast("long")
        .alias("agreement_bp"),
    )


def code_detect(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold_bp: int = 1500,
) -> DataFrame:
    """Code-vs-prose routing signal: exact integer counts of code-shaped
    line and character features, blended into a basis-point score. LLM
    pipelines route code to different tokenization/dedup/quality
    settings than prose — this is the classifier that does the routing
    without a model, in pure codegen column math (zero exchanges, the
    whole thing fuses into the scan).

    Features (each an exact count, so the oracle replays bit-for-bit)::

        n_lines          non-empty lines
        n_code_lines     lines matching code shapes: indented 4+/tab,
                         brace/semicolon-terminated, or starting with a
                         keyword (def/class/import/return/if(/for(/etc.)
        n_sym_chars      {};()[]=<> characters
        code_bp          half-up basis points of
                         (n_code_lines/n_lines + n_sym_chars/n_chars)/2
        is_code          code_bp >= threshold_bp

    Null/empty documents score 0 and ``is_code = false``. The two
    ratios are averaged in exact integer arithmetic: bp = half-up of
    (10000·n_code_lines·n_chars + 10000·n_sym_chars·n_lines) /
    (2·n_lines·n_chars)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")
    code_line_re = (
        r"^(    |\t)|[;{}]\s*$|"
        r"^\s*(def |class |import |from |return |if\s*\(|for\s*\(|"
        r"while\s*\(|function |var |let |const |#include|public |private )"
    )
    n_lines = F.size(lines).cast("long")
    n_code = F.size(
        F.filter(lines, lambda l: l.rlike(code_line_re))
    ).cast("long")
    n_chars = F.length(text).cast("long")
    n_sym = (
        n_chars - F.length(F.regexp_replace(text, r"[{}()\[\]=<>;]", ""))
    ).cast("long")
    denom = F.lit(2) * n_lines * n_chars
    bp = F.when(
        (n_lines > 0) & (n_chars > 0),
        F.floor(
            (
                F.lit(2) * 10000 * (n_code * n_chars + n_sym * n_lines)
                + denom
            )
            / (F.lit(2) * denom)
        ),
    ).otherwise(F.lit(0))
    return df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        n_code.alias("n_code_lines"),
        n_sym.alias("n_sym_chars"),
        bp.cast("long").alias("code_bp"),
        (bp >= threshold_bp).alias("is_code"),
    )


def markdown_strip(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Markdown → plain text: the normalization pass run before token
    counting / dedup on scraped docs whose markup would otherwise make
    identical prose hash differently (``**bold**`` vs ``bold``). A
    fixed chain of ``regexp_replace`` rewrites — JVM codegen, zero
    exchanges, replayed verbatim by the SQL oracle:

    1. fenced code markers ``` / ~~~ lines dropped (content kept — it
       is data, only the fence is markup)
    2. ATX heading markers (``## ``) stripped, text kept
    3. images ``![alt](url)`` → alt, links ``[text](url)`` → text
    4. emphasis ``**x**``/``*x*``/``__x__``/``_x_`` unwrapped
    5. inline code backticks unwrapped
    6. blockquote ``> `` and list markers (``- ``, ``* ``, ``1. ``)
       stripped at line starts
    7. horizontal rules (``---``+ alone on a line) dropped

    Emits (id, plain_text, n_removed_chars). Null text passes through
    null with n_removed_chars 0 (the unigram_lm_score preserve
    contract)."""
    t = F.col(text_col)
    steps = [
        (r"(?m)^(```|~~~)[^\n]*$", ""),
        (r"(?m)^#{1,6}[ \t]+", ""),
        (r"!\[([^\]]*)\]\([^)]*\)", r"$1"),
        (r"\[([^\]]+)\]\([^)]*\)", r"$1"),
        (r"\*\*([^*]+)\*\*", r"$1"),
        (r"__([^_]+)__", r"$1"),
        (r"\*([^*\n]+)\*", r"$1"),
        (r"_([^_\n]+)_", r"$1"),
        (r"`([^`]+)`", r"$1"),
        (r"(?m)^[ \t]*(>[ \t]?|[-*+][ \t]+|\d+\.[ \t]+)", ""),
        (r"(?m)^[ \t]*-{3,}[ \t]*$", ""),
    ]
    out = t
    for pat, rep in steps:
        out = F.regexp_replace(out, pat, rep)
    return df.select(
        F.col(id_col),
        out.alias("plain_text"),
        F.when(
            t.isNull(), F.lit(0)
        )
        .otherwise(F.length(t) - F.length(out))
        .cast("long")
        .alias("n_removed_chars"),
    )


SPECIAL_TOKENS = [
    "<|endoftext|>",
    "<|im_start|>",
    "<|im_end|>",
    "[INST]",
    "[/INST]",
    "<s>",
    "</s>",
    "<pad>",
]


def special_token_leaks(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    tokens: list[str] | None = None,
) -> DataFrame:
    """Chat-template token leakage audit: occurrences of tokenizer
    control strings (``<|endoftext|>``, ``[INST]``, …) INSIDE document
    text. Leaked control tokens teach the model to emit its own stop
    sequences mid-generation — corpora assembled from model outputs or
    scraped chat logs carry them, and this is the scan that catches it
    before training (per-token counts, so the fix list is actionable).

    One row per (document, leaked token) with its occurrence count —
    clean documents emit nothing, keeping output proportional to the
    leak, not the corpus. Counting is substring arithmetic
    ((len(text) - len(remove(text, tok))) / len(tok)) — exact, zero
    UDFs, zero exchanges, fuses into the scan."""
    toks = tokens if tokens is not None else SPECIAL_TOKENS
    text = F.col(text_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(tok).alias("token"),
                F.when(
                    text.isNull(), F.lit(0)
                )
                .otherwise(
                    (
                        F.length(text)
                        - F.length(
                            F.replace(text, F.lit(tok), F.lit(""))
                        )
                    )
                    / len(tok)
                )
                .cast("long")
                .alias("n_hits"),
            )
            for tok in toks
        ]
    )
    return (
        df.select(
            F.col(id_col),
            F.explode(F.filter(pairs, lambda p: p["n_hits"] > 0)).alias("_p"),
        )
        .select(
            id_col,
            F.col("_p.token").alias("token"),
            F.col("_p.n_hits").alias("n_hits"),
        )
    )


def markdown_tables(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Markdown pipe-table extraction: runs of consecutive ``|``-prefixed
    lines become tables, alignment separator rows (``|---|:--:|``) are
    dropped, and every cell lands as its own row — the table-structure
    recovery pass for markdown corpora, mirroring what the reference's
    lattice/ruled extractors do for PDF text (ruled.py) but in pure
    column math.

    Emits ``(id, table_idx, row_idx, col_idx, cell)``: table_idx numbers
    tables within the document (0-based, in text order), row_idx numbers
    kept rows within the table (header = 0), col_idx the trimmed cells
    left-to-right. Documents without tables emit nothing.

    Island contract (pinned by the oracle and the fuzz reference):
    islands form over ALL ``|``-prefixed lines, so a cell-less pipe
    line (``|``, or a row missing its trailing pipe) keeps an island
    contiguous even though it emits no cells; separator and cell-less
    rows then drop, and table indices renumber densely over the
    islands that still have rows — an all-separator "table" does not
    consume an index.

    One conv-style exchange on the document id: consecutive pipe-lines
    group via gaps-and-islands (line_no − row_number), and the row
    numbering reuses the same hashpartitioning. Cell splitting is
    ``split``/``slice``/``posexplode`` codegen — payloads shuffle once,
    as (id, line) pairs for pipe-lines only."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
        .alias("_ln", "_line"),
    ).filter(F.col("_line").rlike(r"^\s*\|"))
    w = Window.partitionBy(id_col).orderBy("_ln")
    grouped = lines.withColumn(
        "_tbl_key", F.col("_ln") - F.row_number().over(w)
    )
    # cells: split on |, drop the leading/trailing empties, trim
    parts = F.split(F.trim(F.col("_line")), r"\|")
    cells = F.transform(
        F.slice(parts, 2, F.greatest(F.size(parts) - 2, F.lit(0))),
        lambda c: F.trim(c),
    )
    with_cells = grouped.withColumn("_cells", cells).filter(
        F.size("_cells") > 0
    )
    # alignment separator rows: every cell matches :?-+:? (at least one)
    sep = F.size(
        F.filter(F.col("_cells"), lambda c: c.rlike(r"^:?-+:?$"))
    ) == F.size("_cells")
    kept = with_cells.filter(~sep)
    w_tbl = Window.partitionBy(id_col).orderBy("_tbl_key")
    w_row = Window.partitionBy(id_col, "_tbl_key").orderBy("_ln")
    numbered = kept.select(
        id_col,
        (F.dense_rank().over(w_tbl) - 1).cast("long").alias("table_idx"),
        (F.row_number().over(w_row) - 1).cast("long").alias("row_idx"),
        "_cells",
    )
    return numbered.select(
        id_col,
        "table_idx",
        "row_idx",
        F.posexplode("_cells").alias("col_idx", "cell"),
    ).select(
        id_col,
        "table_idx",
        "row_idx",
        F.col("col_idx").cast("long").alias("col_idx"),
        "cell",
    )


def corpus_health(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The one-row corpus dashboard a pipeline run logs next to its
    lineage manifest — the first thing read when a training run's data
    looks wrong: volume, null rate, exact-duplicate mass, token volume,
    and mean quality, all exact integers / half-up basis points.

    Emits one row::

        n_docs           rows
        n_null_text      rows with null text
        n_distinct       distinct normalized non-null texts
        exact_dup_bp     (non-null docs − distinct) / non-null docs
        total_ws_tokens  whitespace tokens across the corpus
        mean_quality_bp  mean integer quality score (non-null docs)

    Shape: ONE scan — all features (hash, token count, quality terms)
    are computed in the same projection, so the corpus is read once; the
    only exchanges are the distinct-count on the 16-byte normalized-text
    hash and the final 1-row aggregate — ~16 bytes per document cross
    the wire, never payloads. The quality term re-states
    :func:`quality_score`'s exact integer formula inline (pinned equal
    by test) instead of joining that operator's output back, which
    would scan the corpus twice."""
    from .dedup import normalize_text
    from .hashing import md5_bigint

    text = F.col(text_col)
    toks = tokens(text)
    per_doc = df.select(
        text.isNull().cast("long").alias("_is_null"),
        F.when(text.isNotNull(), md5_bigint(normalize_text(text))).alias("_h"),
        F.coalesce(F.size(toks), F.lit(0)).cast("long").alias("_toks"),
        F.length(text).cast("long").alias("_nc"),
        F.size(toks).cast("long").alias("_nt"),
        F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"])))
        .cast("long")
        .alias("_stop"),
        F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
        .cast("long")
        .alias("_punct"),
    )
    quality = (
        8 * F.least(F.col("_nc"), F.lit(500))
        + F.when(
            F.col("_nt") > 0,
            F.expr("(2 * (4000 * _stop) + _nt) div (2 * _nt)"),
        ).otherwise(F.lit(0))
        + F.when(
            F.col("_nc") > 0,
            F.lit(2000)
            - F.least(
                F.expr("(2 * (10000 * _punct) + _nc) div (2 * _nc)"),
                F.lit(2000),
            ),
        ).otherwise(F.lit(0))
    )
    base = per_doc.withColumn("_q", quality).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_is_null").cast("long").alias("n_null_text"),
        F.count_distinct("_h").cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("_is_null") == 0, F.col("_toks")))
        .cast("long")
        .alias("total_ws_tokens"),
        F.sum(F.when(F.col("_is_null") == 0, F.col("_q")))
        .cast("long")
        .alias("_q_total"),
    )
    nonnull = F.col("n_docs") - F.col("n_null_text")
    return base.select(
        "n_docs",
        "n_null_text",
        "n_distinct",
        F.when(
            nonnull > 0,
            F.floor(
                (F.lit(2) * 10000 * (nonnull - F.col("n_distinct")) + nonnull)
                / (F.lit(2) * nonnull)
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("exact_dup_bp"),
        F.coalesce("total_ws_tokens", F.lit(0))
        .cast("long")
        .alias("total_ws_tokens"),
        F.when(
            nonnull > 0,
            F.floor(
                (F.lit(2) * F.col("_q_total") + nonnull) / (F.lit(2) * nonnull)
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mean_quality_bp"),
    )


GOPHER_RULES = [
    "word_count",
    "mean_word_len",
    "symbol_ratio",
    "bullet_lines",
    "ellipsis_lines",
    "stopword_frac",
]


def filter_attrition(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-rule attrition report over the Gopher structural rules — the
    table every pipeline paper publishes and every filter-tuning
    session starts from: for each rule, in its documented order, how
    many documents it flags in isolation and how many are gone
    cumulatively once the chain has run through it. A rule whose
    marginal removal (`n_cum_removed` delta) is ~0 is redundant; one
    that removes half the corpus is a bug or a threshold to revisit.

    One row per rule: ``(rule_order, rule, n_flagged, n_cum_removed,
    n_remaining)`` — ``n_flagged`` counts the rule alone,
    ``n_cum_removed`` counts documents failing ANY rule up to and
    including this one, so the last row's ``n_remaining`` equals the
    ``gopher_pass`` count.

    ONE scan and a single 1-row aggregate (all 13 sums share the pass),
    exploded to the 6 report rows — no per-rule jobs, no shuffle beyond
    the final funnel (the report is 6 rows; SinglePartition is its
    correct plan)."""
    flags = gopher_quality_flags(df, text_col, id_col)
    cols = [f"flag_{r}" for r in GOPHER_RULES]
    aggs = [F.count("*").cast("long").alias("_n")]
    acc = F.lit(False)
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).cast("long")).alias(f"_f{i}"))
        acc = acc | F.col(c)
        aggs.append(F.sum(acc.cast("long")).alias(f"_c{i}"))
    one = flags.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("rule_order"),
                F.lit(r).alias("rule"),
                F.col(f"_f{i}").alias("n_flagged"),
                F.col(f"_c{i}").alias("n_cum_removed"),
                (F.col("_n") - F.col(f"_c{i}")).alias("n_remaining"),
            )
            for i, r in enumerate(GOPHER_RULES)
        ]
    )
    return one.select(F.explode(rows).alias("_r")).select(
        F.col("_r.rule_order").alias("rule_order"),
        F.col("_r.rule").alias("rule"),
        F.col("_r.n_flagged").cast("long").alias("n_flagged"),
        F.col("_r.n_cum_removed").cast("long").alias("n_cum_removed"),
        F.col("_r.n_remaining").cast("long").alias("n_remaining"),
    )


def vocab_coverage(
    df: DataFrame, k: int = 1000, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One point on the vocabulary coverage curve: what share of ALL
    token occurrences the top-``k`` tokens (by total count,
    deterministic (count desc, token asc) tie-break) account for — the
    number that sizes a vocabulary/BPE budget and decides whether a
    stopword list is worth maintaining (coverage past ~50% at tiny k
    means a handful of types dominate the corpus).

    One row: ``(k_requested, k_effective, covered_occurrences,
    total_occurrences, coverage_bp)`` — k_effective < k when the corpus
    has fewer distinct tokens; coverage is half-up basis points.

    Shape: ONE wordcount exchange; the top-k is a tiny sorted limit
    over (token, count) pairs; totals ride 1-row aggregates. Empty/null
    documents contribute nothing (a whitespace split of '' is
    filtered)."""
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(k)
    covered = top.agg(
        F.count("*").cast("long").alias("k_effective"),
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("covered"),
    )
    total = counts.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("total")
    )
    # both sides are 1-row aggregates; the explicit hint pins the
    # broadcast-nested-loop plan rather than relying on AQE to pick it
    joined = covered.crossJoin(F.broadcast(total))
    return joined.select(
        F.lit(k).cast("long").alias("k_requested"),
        "k_effective",
        F.col("covered").alias("covered_occurrences"),
        F.col("total").alias("total_occurrences"),
        F.when(
            F.col("total") > 0,
            F.floor(
                (F.lit(2) * 10000 * F.col("covered") + F.col("total"))
                / (F.lit(2) * F.col("total"))
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("coverage_bp"),
    )


# ------------------------------------------------------------- mojibake

# Characters a UTF-8 continuation byte (0x80-0xBF) decodes to when the
# byte stream is mis-read as Latin-1 (U+0080-U+00BF verbatim) or CP1252
# (bytes 0x80-0x9F map to the Windows punctuation block below; 0x81,
# 0x8D, 0x8F, 0x90, 0x9D are undefined in CP1252 and appear only via
# the Latin-1 range). The class is shared verbatim by the Spark
# expressions, the DuckDB oracle and the pytest Python-re reference —
# one definition, three engines.
_MOJI_CONT = (
    "\u0080-\u00bf"
    "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160"
    "\u2039\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014"
    "\u02dc\u2122\u0161\u203a\u0153\u017e\u0178"
)
# mis-decoded UTF-8 lead bytes: C2-DF start 2-byte sequences, E0-EF
# 3-byte; both ranges decode identically under Latin-1 and CP1252.
MOJI2_RE = f"[\u00c2-\u00df][{_MOJI_CONT}]"
MOJI3_RE = f"[\u00e0-\u00ef][{_MOJI_CONT}][{_MOJI_CONT}]"
REPLACEMENT_CHAR = "\ufffd"


def mojibake_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mojibake (encoding-damage) audit — the detection half of the
    classic ftfy repair pass, and the third member of the text-repair
    family beside ``unicode_normalize`` (form damage) and
    ``dehyphenate`` (layout damage): count the signatures of UTF-8 text
    that was decoded as Latin-1/CP1252 ("caf\u00c3\u00a9",
    "don\u00e2\u20ac\u2122t") plus bare U+FFFD replacement characters
    left by earlier lossy decodes.

    Per document: ``n_moji2`` (mis-decoded 2-byte sequences,
    ``MOJI2_RE``), ``n_moji3`` (3-byte, ``MOJI3_RE``),
    ``n_replacement`` (U+FFFD count) and a ``mojibake`` verdict (any
    signature present). Null text rows are preserved with zero counts
    and a false verdict — an unreadable row is a different defect.

    Like every scan-fused audit here the counts are pure codegen column
    math (``regexp_count`` / ``length`` arithmetic — no UDF, no
    shuffle): the plan is Scan -> Project, payloads never move, and the
    operator composes into a corpus scan for free at 10^12 turns. The
    regex classes are plain character alternations, identical under
    Java regex, RE2 (DuckDB) and Python ``re``, which is what makes the
    cross-engine value oracle and the pytest reference possible."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n2 = F.regexp_count(t, F.lit(MOJI2_RE)).cast("long")
    n3 = F.regexp_count(t, F.lit(MOJI3_RE)).cast("long")
    nr = (
        F.length(t)
        - F.length(F.regexp_replace(t, REPLACEMENT_CHAR, ""))
    ).cast("long")
    return df.select(
        F.col(id_col),
        n2.alias("n_moji2"),
        n3.alias("n_moji3"),
        nr.alias("n_replacement"),
        ((n2 + n3 + nr) > 0).alias("mojibake"),
    )


def mojibake_repair(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Single-pass mojibake repair: re-encode the text as CP1252
    (falling back to Latin-1 for the five CP1252 holes) and strictly
    re-decode as UTF-8. If the full round-trip succeeds the decoded
    form is returned — pure-ASCII text round-trips to itself, and
    genuinely-accented text fails the strict UTF-8 decode and passes
    through untouched, so the operator is idempotent on clean corpora.
    One layer per pass (doubly-encoded text needs two applications);
    strict decoding means a repair can never introduce U+FFFD.

    Returns ``(id, *keep_cols, text_fixed, changed)`` (``keep_cols``
    carried through so repair composes into a pipeline pass without a
    re-join, like ``lang_id``); nulls preserved with
    ``changed = false``. Arrow-batched scalar pandas_udf (codec tables
    live in CPython; Spark has no charset round-trip builtin) — same
    stage shape as ``unicode_normalize``: zero exchanges, one
    ArrowEvalPython over the scan."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _fix(texts: pd.Series) -> pd.Series:
        def one(s):
            if s is None:
                return None
            try:
                b = s.encode("cp1252")
            except UnicodeEncodeError:
                try:
                    b = s.encode("latin-1")
                except UnicodeEncodeError:
                    return s
            try:
                return b.decode("utf-8")
            except UnicodeDecodeError:
                return s

        return texts.map(one)

    out = _fix(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        out.alias("text_fixed"),
        (~out.eqNullSafe(F.col(text_col))).alias("changed"),
    )


# Confusable → Latin canonical map: Cyrillic and Greek letters whose
# glyphs are (near-)identical to Latin in common fonts, plus the full
# fullwidth ASCII block (U+FF01–U+FF5E) and the ideographic space. A
# deliberate SPEC, not a rendering judgment — the point is a stable,
# engine-portable 1:1 char map both Spark and DuckDB `translate`
# reproduce byte-identically. Extend the pairs list, never reorder it.
_HOMOGLYPH_PAIRS: tuple[tuple[str, str], ...] = (
    # Cyrillic lowercase
    ("а", "a"), ("е", "e"), ("о", "o"), ("р", "p"),
    ("с", "c"), ("у", "y"), ("х", "x"), ("і", "i"),
    ("ѕ", "s"), ("ј", "j"),
    # Cyrillic uppercase
    ("А", "A"), ("В", "B"), ("Е", "E"), ("К", "K"),
    ("М", "M"), ("Н", "H"), ("О", "O"), ("Р", "P"),
    ("С", "C"), ("Т", "T"), ("Х", "X"), ("І", "I"),
    ("Ѕ", "S"), ("Ј", "J"),
    # Greek uppercase
    ("Α", "A"), ("Β", "B"), ("Ε", "E"), ("Ζ", "Z"),
    ("Η", "H"), ("Ι", "I"), ("Κ", "K"), ("Μ", "M"),
    ("Ν", "N"), ("Ο", "O"), ("Ρ", "P"), ("Τ", "T"),
    ("Υ", "Y"), ("Χ", "X"),
    # Greek lowercase (the unambiguous lookalikes only)
    ("ο", "o"), ("ι", "i"), ("ν", "v"),
) + tuple(
    # fullwidth ASCII block: ！..～ → !..~ (letters, digits, punctuation)
    (chr(0xFF01 + i), chr(0x21 + i))
    for i in range(0x5E)
) + (("　", " "),)  # ideographic space

HOMOGLYPH_FROM = "".join(src for src, _ in _HOMOGLYPH_PAIRS)
HOMOGLYPH_TO = "".join(dst for _, dst in _HOMOGLYPH_PAIRS)


def homoglyph_fold(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Homoglyph (confusable-script) normalization — the fourth member
    of the text-repair family (``unicode_normalize`` fixes form damage,
    ``mojibake_repair`` encoding damage, ``dehyphenate`` layout damage;
    this fixes SCRIPT SPOOFING): map Cyrillic/Greek lookalike letters,
    fullwidth ASCII, and the ideographic space to their Latin
    canonicals. Exact dedup, decontamination, and blocklists all key on
    bytes — a single Cyrillic 'о' swapped into a benchmark answer or a
    blocked domain defeats every one of them unless the key is folded
    first, which is exactly how adversarial corpora dodge filters.

    Returns ``(id, *keep_cols, folded_text, n_folded)`` — the folded
    text plus how many confusable chars were rewritten (0 = already
    canonical; the flag version is ``n_folded > 0``). Nulls preserved
    (``folded_text`` null, ``n_folded`` 0). NOT idempotency-risky:
    folding is a fixed 1:1 char map, so applying it twice is identical
    to once.

    Pure ``translate``/``length`` column math — zero exchanges, zero
    UDFs, linear in the turn's own bytes; composes into a corpus scan
    for free. Both ``translate`` implementations (Spark, DuckDB) share
    Postgres semantics, so the cross-engine value oracle is exact."""
    t = F.col(text_col)
    n_folded = (
        F.length(F.coalesce(t, F.lit("")))
        - F.length(F.translate(F.coalesce(t, F.lit("")), HOMOGLYPH_FROM, ""))
    ).cast("long")
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.translate(t, HOMOGLYPH_FROM, HOMOGLYPH_TO).alias("folded_text"),
        n_folded.alias("n_folded"),
    )


def reading_level(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch–Kincaid grade estimate as exact integer math — the
    classic readability prior quality-filter stacks combine with
    stopword/length signals (a corpus skewed to grade-16 legalese or
    grade-2 listicles both need re-weighting). Syllables are
    approximated by vowel GROUPS (runs of ``[aeiouy]+`` in the
    lowercased text) — the standard cheap estimator; its bias is
    stable across documents, which is all a ranking signal needs.

    Per document: ``n_words`` (``\\S+`` runs), ``n_sentences``
    (``[.!?]+`` runs, floored at 1 so headline-only fragments don't
    divide by zero), ``n_syllables``, and ``fk_grade_x100`` =
    ``floor(100·(0.39·words/sentences + 11.8·syllables/words −
    15.59))`` — null when the document has no words (nothing to
    grade), negative grades kept as-is (they mean "simpler than the
    formula's floor", a real signal). The arithmetic is the same
    IEEE-double expression in both engines, so the value oracle is
    exact.

    Pure ``regexp_count`` column math — zero exchanges, zero UDFs,
    linear in the document's own bytes."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    # explicit class, never \S: Java's \s includes \x0B, RE2's does not
    words = F.regexp_count(t, F.lit(r"[^ \t\n\r\f]+")).cast("long")
    sents = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")).cast("long"), F.lit(1)
    )
    syl = F.regexp_count(F.lower(t), F.lit("[aeiouy]+")).cast("long")
    grade = F.floor(
        (F.lit(39.0) * words) / sents
        + (F.lit(1180.0) * syl) / words
        - F.lit(1559.0)
    ).cast("long")
    return df.select(
        F.col(id_col),
        words.alias("n_words"),
        sents.alias("n_sentences"),
        syl.alias("n_syllables"),
        F.when(words > 0, grade).alias("fk_grade_x100"),
    )


def watermark_scan(
    df: DataFrame,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Green-list watermark detector (Kirchenbauer et al. 2023,
    context width h=1): a watermarking generator biases each token
    toward a "green" half of the vocabulary keyed on the previous
    token, so watermarked text shows a green fraction far above 1/2
    and a z-score that grows with √length — the audit that keeps
    synthetic (or self-generated) text from silently re-entering a
    training corpus. Unwatermarked text scores z ≈ 0 by construction,
    whatever the tokenizer.

    A bigram (prev, tok) is green when the portable hash
    ``md5('wm:<seed>:<prev>:<tok>') % 2 == 0`` — the same partition a
    detector and generator would share; tokens are lowercased
    whitespace splits. Per document: ``n_bigrams``, ``n_green``,
    ``green_bp`` (basis points, 0 when no bigrams), and ``z_x100`` =
    ``floor(100·(2g−n)/√n)`` (0 when no bigrams — "no evidence", kept
    non-nullable). IEEE-double √ and one floor, identical in both
    engines, so the oracle is exact.

    All in-row column math (split → transform → filter → size) — zero
    exchanges, zero UDFs; per-row cost linear in the document's own
    tokens."""
    # explicit whitespace class, never \s: Java's \s includes \x0B,
    # RE2's (the DuckDB oracle) does not
    toks = F.array_remove(
        F.split(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            r"[ \t\n\r\f]+",
        ),
        "",
    )
    n_t = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n_t - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n_t - 1, F.lit(0))),
        lambda a, b: F.concat(
            F.lit(f"wm:{seed}:"), a, F.lit(":"), b
        ),
    )
    green = F.filter(
        pairs,
        lambda p: F.conv(F.substring(F.md5(p), 1, 8), 16, 10)
        .cast("bigint")
        % 2
        == 0,
    )
    n = F.size(pairs).cast("long")
    g = F.size(green).cast("long")
    return df.select(
        F.col(id_col),
        n.alias("n_bigrams"),
        g.alias("n_green"),
        F.when(n > 0, F.floor(F.lit(10000) * g / n))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("green_bp"),
        F.when(
            n > 0,
            F.floor(
                F.lit(100.0)
                * (F.lit(2) * g - n)
                / F.sqrt(n.cast("double"))
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("z_x100"),
    )


AMOUNT_RE = r"\$[0-9][0-9,]*(?:\.[0-9][0-9]?)?"


def amounts_extract(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide currency-amount field parsing — the reference's
    per-invoice amount extraction (`reference` nordic patterns, e.g.
    'Total amount without VAT … NOK' at extractors/nordic.py:42)
    generalized to every document: find dollar amounts and normalize
    each to EXACT INTEGER CENTS, the form a downstream join or rollup
    can actually aggregate (floats lose cents; strings don't sum).

    One row per match: ``(doc_id, match_idx, raw, cents)`` —
    ``match_idx`` is the 0-based occurrence order, ``raw`` the matched
    span verbatim, ``cents`` = dollars·100 + the right-padded fraction
    ('$7.5' → 750, '$1,234' → 123400). Documents with no amounts emit
    no rows (this is an extractor, not an audit — pair with
    ``filter_attrition`` when the drop matters). The normalization is
    replace/split/rpad column math, never a float parse, so the DuckDB
    oracle replays it byte-exactly.

    Shape: regexp_extract_all fused into the scan, one posexplode —
    zero exchanges, zero UDFs; output volume is bounded by matches,
    not documents."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    matches = F.regexp_extract_all(t, F.lit(AMOUNT_RE), 0)
    exploded = df.select(
        F.col(id_col), F.posexplode(matches).alias("match_idx", "raw")
    )
    digits = F.replace(
        F.replace(F.col("raw"), F.lit("$"), F.lit("")),
        F.lit(","),
        F.lit(""),
    )
    dollars = F.split_part(digits, F.lit("."), F.lit(1)).cast("long")
    # split_part yields '' when there is no fraction; rpad('', 2, '0')
    # = '00', so the integer-cents fold needs no special case
    frac = F.rpad(F.split_part(digits, F.lit("."), F.lit(2)), 2, "0")
    cents = dollars * 100 + frac.cast("long")
    return exploded.select(
        F.col(id_col),
        F.col("match_idx").cast("long").alias("match_idx"),
        "raw",
        cents.cast("long").alias("cents"),
    )


def kv_spans(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Generic labeled key-value span extraction — the corpus-wide form
    of the reference's per-family field parsers ('Label: value' lines;
    cf. the invoice patterns at reference extractors, e.g.
    `nordic.py:42` 'Total amount without VAT …'): any line opening with
    a short alphanumeric label and a colon yields one span row. The
    family-specific extractors know their schemas; this is the
    schema-free sweep that tells you WHICH labels a new corpus even
    contains before anyone writes a parser.

    One row per matched line: ``(doc_id, line_idx, key, value)`` —
    ``line_idx`` 0-based over ``\\r?\\n`` splits, ``key`` normalized
    (lowercased, trimmed, space runs → '_'), ``value`` the trimmed
    remainder; lines whose value is empty are dropped (a bare 'Notes:'
    is a heading, not a field). Keys are capped at 40 chars by the
    pattern — longer "labels" are prose with a colon in it.

    regexp work fuses into the scan; one posexplode; zero exchanges,
    zero UDFs. Output volume is bounded by matching LINES, not
    documents."""
    key_pat = "^([A-Za-z][A-Za-z0-9 _-]{0,38}):"
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\r?\n")
    ex = df.select(
        F.col(id_col), F.posexplode(lines).alias("line_idx", "_line")
    )
    key_raw = F.regexp_extract("_line", key_pat, 1)
    value = F.trim(F.regexp_replace("_line", key_pat, ""))
    key = F.regexp_replace(F.lower(F.trim(key_raw)), "[ \t]+", "_")
    return ex.select(
        F.col(id_col),
        F.col("line_idx").cast("long").alias("line_idx"),
        key.alias("key"),
        value.alias("value"),
    ).filter((key_raw != "") & (F.col("value") != ""))


def cooccurrence_lift(
    df: DataFrame,
    window: int = 3,
    min_count: int = 5,
    scale: int = 10000,
    text_col: str = "text",
) -> DataFrame:
    """Skip-gram co-occurrence lift table — the word2vec/GloVe count
    matrix that ``bigram_lift`` is the window=1 special case of: for
    every token pair (x, y) where y follows x within ``window``
    positions, the pair count and the integer-exact PMI core
    ``floor(scale · N · c_xy / (c_x · c_y))`` (N = total emitted pairs;
    take log offline for PMI proper). Directional by construction —
    x strictly before y; a symmetric matrix is the union with the
    swapped table, which callers build without re-counting.

    Pair generation is IN-ROW column math (nested transform over the
    token array, flattened) — the window is a bounded constant, so no
    positional self-join exists anywhere in the plan; the only
    exchanges are the two map-side-combined groupBys (unigrams, pairs)
    and the two marginal equi-joins, exactly the bigram_lift shape with
    ≤ window× the pair volume. ``min_count`` prunes the long tail
    BEFORE the joins; empty tokens are dropped before pairing so
    co-occurrence spans runs of whitespace.

    Same int64 bound as bigram_lift: scale·N·c_xy must fit — shrink
    ``scale`` or shard beyond N≈10⁹·window pairs."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    words = F.filter(tokens(F.col(text_col)), lambda w: w != F.lit(""))
    toks = df.select(words.alias("ws")).filter(F.size("ws") > 0)
    unigrams = toks.select(F.explode("ws").alias("w")).groupBy("w").agg(
        F.count("*").alias("c_w")
    )
    pair_struct = "array<struct<x:string,y:string>>"
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.size("ws") - 1),
                        lambda i: F.transform(
                            F.sequence(
                                i + 1,
                                F.least(i + F.lit(window), F.size("ws")),
                            ),
                            lambda j: F.struct(
                                F.element_at("ws", i).alias("x"),
                                F.element_at("ws", j).alias("y"),
                            ),
                        ),
                    )
                ),
            ).otherwise(F.array().cast(pair_struct))
        ).alias("p")
    ).select("p.x", "p.y")
    co = (
        pairs.groupBy("x", "y")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    total = pairs.groupBy().agg(F.count("*").alias("n_pairs"))
    cx = unigrams.select(F.col("w").alias("x"), F.col("c_w").alias("c_x"))
    cy = unigrams.select(F.col("w").alias("y"), F.col("c_w").alias("c_y"))
    return (
        co.join(cx, "x")
        .join(cy, "y")
        .crossJoin(F.broadcast(total))
        .select(
            "x",
            "y",
            "n",
            F.floor(
                (F.lit(scale) * F.col("n_pairs") * F.col("n"))
                / (F.col("c_x") * F.col("c_y"))
            ).alias("lift"),
        )
    )


def linear_score(
    df: DataFrame,
    weights: DataFrame,
    n_buckets: int = 1 << 18,
    bias: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    weight_col: str = "weight",
) -> DataFrame:
    """Hashed bag-of-words linear classifier INFERENCE — the model-based
    quality gate of CCNet / GPT-3 / fineweb-style pipelines (a trained
    fastText or logistic-regression filter scoring every crawled page),
    as an engine operator: the model is DATA (a ``(bucket, weight)``
    table of integer-quantized weights — the caller quantizes the
    trained float weights once, e.g. to 1e-4 units), inference is pure
    column math. Training the model is a model call and stays out of
    the engine; scoring 10^10 documents with it is a data-pipeline
    operator and belongs here.

    One row per input document: ``(doc_id, n_tokens, logit)`` with
    ``logit = bias + Σ_t weight[md5_32(tok) mod n_buckets]`` over
    whitespace tokens of ``lower(trim(text))`` (hashing-trick feature
    map; unseen buckets contribute 0). Integer weights → integer logit,
    bit-identical on any engine — thresholding into keep/drop is one
    ``filter`` downstream, and calibration (sigmoid) is presentation,
    not pipeline state. Null/empty documents are PRESERVED with
    ``n_tokens 0, logit = bias`` (the unigram_lm_score contract).

    Scale shape: tokens explode in-partition, the weight table rides a
    broadcast (even a 2^22-bucket model is ~32 MB), and the only
    exchange carries ``(doc_id, weight)`` longs into a map-side-combined
    groupBy — document payloads never shuffle, and model size never
    touches shuffle volume. The preserve-nulls left join re-joins on the
    id column only."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    buckets = toks.select(
        F.col(id_col),
        F.pmod(md5_bigint(F.col("tok")), F.lit(n_buckets)).alias("bucket"),
    )
    w = weights.select(
        F.col(bucket_col).cast("long").alias("bucket"),
        F.col(weight_col).cast("long").alias("weight"),
    )
    scored = (
        buckets.join(F.broadcast(w), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce("weight", F.lit(0))).alias("wsum"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            (F.lit(bias) + F.coalesce("wsum", F.lit(0)))
            .cast("long")
            .alias("logit"),
        )
    )


def rank_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact-integer Mann-Whitney AUC of an integer score against a
    boolean label — the corpus-scale answer to "does this quality
    signal actually separate the classes" (a trained filter vs held-out
    judgments, a cheap heuristic vs an expensive one), run before
    anyone gates 10^10 documents on the signal. Complements
    rank_agreement (two signals vs each other) with signal-vs-truth.

    One output row: ``(n_pos, n_neg, u2, auc_ppm)``. ``u2`` is twice
    the Mann-Whitney U with average-rank tie handling — each
    (pos, neg) pair contributes 2 when the positive scores higher, 1 on
    a tie, 0 otherwise — so it stays an exact integer (no 0.5 terms),
    and ``auc_ppm = (10^6 · u2) div (2 · n_pos · n_neg)``, computed in
    decimal(38) so the product cannot overflow int64 at 10^10-row
    class sizes (DuckDB replays it in HUGEINT — same integers).

    Scores must already be integers (linear_score logits, quality_bp,
    length buckets …): quantization is what makes the statistic
    engine-portable, and ppm resolution is the quantization floor
    anyway. Rows with a null score or label are dropped.

    Scale shape: one groupBy collapses the corpus to DISTINCT scores
    (per-score pos/neg counts); the running negative-count sum is a
    SinglePartition window over that DISTINCT-SCORE table — bounded by
    score cardinality, never rows (the corpus-totals idiom; integer
    scores keep it small by construction). Degenerate inputs (a class
    absent) yield ``auc_ppm`` null rather than a fake 0.5."""
    s = df.select(
        F.col(score_col).cast("long").alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    g = s.groupBy("_s").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_np"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("_nn"),
    )
    w = Window.orderBy("_s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = g.select(
        "_np",
        "_nn",
        F.coalesce(F.sum("_nn").over(w), F.lit(0)).alias("_cb"),
    )
    a = c.agg(
        F.coalesce(F.sum("_np"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum("_nn"), F.lit(0)).cast("long").alias("n_neg"),
        F.coalesce(
            F.sum(
                F.col("_np") * (F.lit(2) * F.col("_cb") + F.col("_nn"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("u2"),
    )
    return a.select(
        "n_pos",
        "n_neg",
        "u2",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr(
                "cast((cast(1000000 as decimal(38,0)) * u2) div "
                "(2 * cast(n_pos as decimal(38,0)) * n_neg) as long)"
            ),
        ).alias("auc_ppm"),
    )


def score_label_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Reliability table of a ppm-scale score against a boolean label —
    the calibration companion to ``rank_auc`` (AUC says the signal
    RANKS; this says whether its VALUES mean what they claim before
    anyone treats "quality 0.9" as a probability and thresholds 10^10
    documents on it).

    Scores must already be ppm integers in [0, 10^6] (quality_ensemble,
    linear_score logits pushed through a ppm sigmoid, a classifier's
    probability × 10^6). Out-of-range scores clamp to the edge bins;
    null score/label rows are dropped. ``bin = clamped · n_bins div
    (10^6 + 1)`` so both endpoints land inside [0, n_bins).

    Output, one row per non-empty bin: ``(bin, n, n_pos,
    mean_score_ppm, pos_rate_ppm)`` — plot pos_rate against mean_score
    and a calibrated signal hugs the diagonal.

    Scale shape: ONE groupBy on the bin id (≤ n_bins groups, map-side
    combined) — the corpus collapses to per-bin longs; nothing else
    moves. Exact integers throughout (DuckDB replays bit-for-bit).
    """
    clamped = F.greatest(
        F.lit(0), F.least(F.lit(1000000), F.col(score_col).cast("long"))
    )
    s = df.select(
        clamped.alias("_s"), F.col(label_col).cast("boolean").alias("_y")
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    return (
        s.groupBy(
            F.expr(f"(_s * {int(n_bins)}L) div 1000001").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("_y"), 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.expr("sum(_s) div count(1)").alias("mean_score_ppm"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "mean_score_ppm",
            F.expr("(1000000L * n_pos) div n").alias("pos_rate_ppm"),
        )
    )


def ece_ppm(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Expected calibration error of a ppm score, in ppm: the
    bin-size-weighted mean |mean_score − pos_rate| over the
    ``score_label_bins`` table. One row: ``(n, ece_ppm)``. A perfectly
    calibrated ppm score reads 0; a constant score reads its distance
    from the base rate. Same exact-integer contract as the bin table;
    the final reduce runs over ≤ n_bins rows."""
    bins = score_label_bins(df, score_col, label_col, n_bins=n_bins)
    return bins.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
        F.expr(
            "coalesce(sum(n * abs(mean_score_ppm - pos_rate_ppm)), 0) "
            "div greatest(sum(n), 1)"
        ).alias("ece_ppm"),
    )


# Invisible/format characters that survive copy-paste and fool both
# humans and string equality: zero-widths (also homoglyph-adjacent spam
# padding), explicit bidi overrides (the Trojan-Source vector — code
# that renders differently than it parses), and soft hyphens. Shared
# constants so audits and tests plant with the same codepoints.
ZERO_WIDTH_CHARS = "​‌‍⁠﻿"
BIDI_CONTROL_CHARS = "؜‎‏‪‫‬‭‮⁦⁧⁨⁩"
SOFT_HYPHEN = "­"


def invisible_chars(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document invisible-character audit: zero-width characters,
    explicit bidirectional control characters, and soft hyphens.

    Why corpus-scale: zero-widths are the classic token-stuffing /
    dedup-evasion padding (two "identical" spam pages that hash apart);
    bidi overrides are the Trojan-Source class — in a CODE corpus a
    U+202E can make ``// check`` render as executable text, so a
    pretraining pipeline wants ``bidi_flag`` rows quarantined before
    the model learns to emit them; soft hyphens silently split tokens.

    Output: ``(id, zw_count, bidi_count, shy_count, invisible_ppm,
    bidi_flag)`` — counts are exact (length minus length-after-strip),
    ``invisible_ppm`` is per-character density over the raw length,
    null-text rows yield zero counts (preserve-with-zeros contract).

    Scale shape: zero shuffles — three regexp_replace + length columns
    fused into the scan; the regexes are fixed char classes (RE2-safe,
    no backtracking).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))

    def _count(cls: str):
        return (
            F.length(t) - F.length(F.regexp_replace(t, f"[{cls}]", ""))
        ).cast("long")

    zw = _count(ZERO_WIDTH_CHARS)
    bidi = _count(BIDI_CONTROL_CHARS)
    shy = _count(SOFT_HYPHEN)
    return df.select(
        F.col(id_col),
        zw.alias("zw_count"),
        bidi.alias("bidi_count"),
        shy.alias("shy_count"),
        F.length(t).alias("_len"),
    ).select(
        id_col,
        "zw_count",
        "bidi_count",
        "shy_count",
        # integer div, never double: exact and engine-portable
        F.expr(
            "(1000000L * (zw_count + bidi_count + shy_count)) "
            "div greatest(_len, 1)"
        ).alias("invisible_ppm"),
        (F.col("bidi_count") > 0).alias("bidi_flag"),
    )


def license_scan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document license detection for code/document corpora: an
    SPDX identifier if present, else a cascade of the big license-header
    phrases. Code corpora are legally FILTERED on exactly this signal
    (permissive in, copyleft out), so it has to run corpus-wide before
    any code text enters a training mix.

    Cascade (first hit wins): ``SPDX-License-Identifier: <id>`` (the
    machine-readable tag — returned verbatim in ``spdx_id``) →
    Apache-2.0 → MIT → GPL (any version phrase) → BSD (clause form) →
    MPL-2.0 → null (no recognized marker — "no license found", which a
    compliance pipeline treats as *exclude*, never as permissive).

    Output: ``(id, license, spdx_id)``; ``license`` is the normalized
    family tag (``spdx:`` prefix when it came from the tag), null text
    yields a null-license row (preserve-with-zeros contract).

    Scale shape: zero shuffles — fixed alternation-free regexes fused
    into the scan (RE2-safe); case-insensitive via ``(?i)`` so both
    engines apply the same folding.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    spdx = F.regexp_extract(
        t, r"SPDX-License-Identifier:[ \t]*([A-Za-z0-9.+-]+)", 1
    )
    apache = t.rlike(r"(?i)Apache License,? Version 2\.0")
    mit = t.rlike(r"(?i)MIT License")
    gpl = t.rlike(r"(?i)GNU (Lesser |Affero )?General Public License")
    bsd = t.rlike(r"(?i)BSD [1-4]-Clause")
    mpl = t.rlike(r"(?i)Mozilla Public License,? (Version |v\.? ?)2\.0")
    return df.select(
        F.col(id_col),
        F.when(spdx != "", F.concat(F.lit("spdx:"), spdx))
        .when(apache, F.lit("apache-2.0"))
        .when(mit, F.lit("mit"))
        .when(gpl, F.lit("gpl"))
        .when(bsd, F.lit("bsd"))
        .when(mpl, F.lit("mpl-2.0"))
        .alias("license"),
        F.when(spdx != "", spdx).alias("spdx_id"),
    )


def bigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style LM quality signal, bigram order: per-position
    surprisal of each token under the corpus's OWN add-one-smoothed
    bigram conditional ``P(w2|w1) = (c(w1 w2)+1) / (ctx(w1)+V)``, in
    integer floor-bits — ``bit_length((ctx+V) div (c+1)) - 1`` computed
    exactly via binary-string length, the same no-float-log basis as
    ``unigram_lm_score`` (float log2 + double summation rounds
    differently across engines and partition orders). ``ctx(w1)`` is the
    bigram-context count (number of corpus bigrams starting with ``w1``,
    i.e. ``sum_w2 c(w1 w2)``) so the conditional is self-consistent, and
    ``V`` is the corpus unigram vocabulary (the add-one event space of
    possible next tokens).

    Versus the unigram score: a document of individually-common tokens
    in implausible ORDER (shuffled text, keyword stuffing, word-salad
    spam) scores near-uniform surprisal here while unigram surprisal
    stays low — the pair is the cheap two-feature approximation of the
    CCNet perplexity bucketing, and both columns are exact integers so
    an interpolated gate (``a*uni + b*bi``) stays engine-portable
    downstream.

    Output per document: ``n_bigrams`` (= max(n_tokens-1, 0)),
    ``total_bits`` (exact sum), ``mean_bits_bp`` (half-up integer basis
    points). Documents with fewer than two tokens are PRESERVED with
    zeros (left join back to the input id set), never dropped.

    Plan: one explode of per-document bigram strings, bigram counts via
    map-side-combined groupBy, context counts as a second rollup OF THE
    COUNTS (vocab-sized, not corpus-sized), the 1-row (vocab) scalar
    broadcast back in, bigrams ⋈ counts on the bigram key, per-document
    sum, left join to the id set. No UDF; replayable in ANSI SQL. At
    100 TB the join key should be the 8-byte hash of the bigram rather
    than the string (the ``ngram_jaccard_pairs`` trick); kept as the
    raw string here for cross-engine value parity with the oracle.
    """
    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= 2,
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.array_join(F.slice(toks, i + 1, 2), " "),
            ),
            # an empty token only arises from all-whitespace/empty text
            # (split of trimmed text), where size==1 anyway; guard the
            # single-token-with-empty edge for belt and braces
            lambda g: ~g.startswith(" ") & ~g.endswith(" "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bgs = df.select(F.col(id_col), F.explode(grams).alias("bg"))
    counts = bgs.groupBy("bg").agg(F.count("*").alias("c"))
    ctx = counts.groupBy(
        F.split(F.col("bg"), " ").getItem(0).alias("w1")
    ).agg(F.sum("c").alias("ctx"))
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .agg(F.count_distinct("tok").alias("vocab"))
    )
    bits = (
        F.length(F.conv(F.expr("(ctx + vocab) div (c + 1)").cast("string"), 10, 2))
        - 1
    ).cast("long")
    scored = (
        bgs.join(counts, "bg")
        .join(ctx, F.split(F.col("bg"), " ").getItem(0) == F.col("w1"))
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(bits).alias("total_bits"),
        )
        .withColumn(
            "mean_bits_bp",
            F.expr(
                "(2 * 10000 * total_bits + n_bigrams) div (2 * n_bigrams)"
            ).cast("long"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("total_bits", F.lit(0)).cast("long").alias("total_bits"),
            F.coalesce("mean_bits_bp", F.lit(0)).cast("long").alias("mean_bits_bp"),
        )
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-level empirical entropy per document, in integer
    floor-bits: each character class ``c`` with count ``n_c`` of ``N``
    total contributes ``n_c * (bit_length(N div n_c) - 1)`` bits —
    exact integer arithmetic on the same no-float-log basis as
    ``unigram_lm_score`` / ``bigram_lm_score``, so the DuckDB value
    oracle replays it bit-identically.

    What it catches that ``compression_ratio`` (zlib, pandas UDF,
    ``no_oracle``) also catches — but as a pure-column, SQL-replayable
    signal: base64/hex blobs and random gibberish sit near the uniform
    ceiling (6+ floor-bits/char over their alphabet), natural language
    sits far below it (floor-bit mean ~2-3), and single-character spam
    pins to 0. The two are complementary detectors: zlib additionally
    sees ORDER (repeated phrases), this sees only the char distribution,
    and only this one is driver-value-oracled.

    Output per document: ``n_chars``, ``distinct_chars``,
    ``total_bits``, ``mean_bits_bp`` (half-up basis points of
    floor-bits/char). Null/empty documents are PRESERVED with zeros.

    Plan: per-char explode, map-side-combined count per (doc, char) —
    the shuffle after partial aggregation carries one row per document
    per DISTINCT character (~alphabet-sized, not text-sized), then one
    exchange on the id for the per-document window totals and final
    rollup. No UDF, no join. Unicode note: Spark splits on UTF-16 code
    points while DuckDB splits grapheme-aware, so supplementary-plane
    characters (emoji) count differently across engines; the oracle
    holds on BMP text (the fixture corpus is ASCII), and the Spark-side
    semantics are pinned by pytest either way.
    """
    chars = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("c")
    ).filter(F.col("c") != "")
    counts = chars.groupBy(id_col, "c").agg(F.count("*").alias("n"))
    w = Window.partitionBy(id_col)
    # NOT named "N"/"K": Spark resolves columns case-insensitively by
    # default, so withColumn("N", ...) would silently REPLACE "n"
    bits = (
        F.length(F.conv(F.expr("tot div n").cast("string"), 10, 2)) - 1
    ).cast("long")
    scored = (
        counts.withColumn("tot", F.sum("n").over(w).cast("long"))
        .withColumn("kinds", F.count("*").over(w).cast("long"))
        .groupBy(id_col)
        .agg(
            F.first("tot").alias("n_chars"),
            F.first("kinds").alias("distinct_chars"),
            F.sum(F.col("n") * bits).cast("long").alias("total_bits"),
        )
        .withColumn(
            "mean_bits_bp",
            F.expr(
                "(2 * 10000 * total_bits + n_chars) div (2 * n_chars)"
            ).cast("long"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
            F.coalesce("distinct_chars", F.lit(0)).cast("long").alias("distinct_chars"),
            F.coalesce("total_bits", F.lit(0)).cast("long").alias("total_bits"),
            F.coalesce("mean_bits_bp", F.lit(0)).cast("long").alias("mean_bits_bp"),
        )
    )


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-language tokenizer-fertility rollup: BPE-ish tokens per
    whitespace word and bytes per token — the standard suitability
    metric when one tokenizer must serve a multilingual corpus (high
    fertility = the language is being shredded into short subwords and
    effectively pays more sequence length per word of content).

    Columns per language: ``n_docs``, ``ws_tokens`` (whitespace words,
    empty-string artifacts filtered so empty/null text counts zero),
    ``bpe_tokens`` (the same ``BPE_TOKEN_RE`` basis as ``token_count``),
    ``n_bytes`` (UTF-8 octets), ``fertility_bp`` (half-up basis points
    of bpe_tokens/ws_tokens), ``bytes_per_token_bp`` (octets per BPE
    token, same rounding). Zero-denominator groups report 0 rather than
    dividing.

    Plan: pure column math per row, then ONE map-side-combined groupBy
    on the language key — the shuffle carries one partial row per
    (task, lang), never text. Integer-exact end to end, so the DuckDB
    oracle replays it bit-identically.
    """
    ws = F.size(F.filter(tokens(F.col(text_col)), lambda t: t != ""))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))
    per_doc = df.select(
        F.col(lang_col).alias("lang"),
        F.greatest(ws, F.lit(0)).cast("long").alias("ws"),
        F.greatest(bpe, F.lit(0)).cast("long").alias("bpe"),
        F.coalesce(F.octet_length(text_col), F.lit(0)).cast("long").alias("b"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            F.sum("b").alias("n_bytes"),
        )
        .select(
            "lang",
            "n_docs",
            "ws_tokens",
            "bpe_tokens",
            "n_bytes",
            F.when(
                F.col("ws_tokens") > 0,
                F.expr("(2 * 10000 * bpe_tokens + ws_tokens) div (2 * ws_tokens)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("fertility_bp"),
            F.when(
                F.col("bpe_tokens") > 0,
                F.expr("(2 * 10000 * n_bytes + bpe_tokens) div (2 * bpe_tokens)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("bytes_per_token_bp"),
        )
    )


# Combined date-mention pattern: dd.mm.yyyy (the reference's nordic
# invoice format — 'Invoice Date: 25.03.2022', reference
# extractors/nordic.py date fields), ISO yyyy-mm-dd, US m/d/yyyy, and
# English month-name dates ('March 5, 1999'). Longest-first inside the
# month alternation; no lookarounds (RE2-safe, so the DuckDB oracle
# runs the identical pattern).
DATE_RE = (
    r"\b(?:\d{2}\.\d{2}\.\d{4}"
    r"|\d{4}-\d{2}-\d{2}"
    r"|\d{1,2}/\d{1,2}/\d{4}"
    r"|(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May"
    r"|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?"
    r"|Nov(?:ember)?|Dec(?:ember)?) \d{1,2}, \d{4})\b"
)

_MONTH_NUM = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}


def dates_extract(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide date field parsing — the reference's per-invoice date
    extraction ('Invoice Date: 25.03.2022' / 'Delivery date' fields in
    the nordic patterns, reference extractors/nordic.py) generalized to
    every document and every common written form, normalized to one
    canonical ISO string a downstream join or range predicate can
    actually use (raw date strings don't sort; four formats don't
    equi-join).

    One row per match: ``(doc_id, match_idx, raw, fmt, valid, iso)`` —
    ``match_idx`` the 0-based occurrence order over the combined
    pattern, ``fmt`` one of ``dmy_dot`` (dd.mm.yyyy, European/nordic),
    ``iso`` (yyyy-mm-dd), ``mdy_slash`` (m/d/yyyy, US convention —
    slash dates are AMBIGUOUS between US and European reading; this
    operator documents its choice rather than guessing per-row),
    ``month_name`` ('March 5, 1999', full or 3-letter month). ``valid``
    is the simple bounds check month∈[1,12] ∧ day∈[1,31] (a calendar
    check — Feb 30, leap years — is deliberately out of scope: the
    signal wanted at corpus scale is "parseable date mention", and the
    simple rule replays exactly in SQL); invalid matches keep their row
    with ``iso`` null, so the extractor never silently drops what the
    pattern matched. Documents with no dates emit no rows (pair with
    ``filter_attrition`` when the drop matters, exactly like
    ``amounts_extract``).

    Shape: one ``regexp_extract_all`` fused into the scan, one
    posexplode, then pure classify/split/lpad column math — zero
    exchanges, zero UDFs, zero joins; output volume is bounded by
    matches, not documents. The DuckDB oracle replays the same pattern
    and the same arithmetic byte-exactly."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.regexp_extract_all(t, F.lit(DATE_RE), 0)).alias(
            "match_idx", "raw"
        ),
    )
    raw = F.col("raw")
    fmt = (
        F.when(raw.rlike(r"^\d{4}-"), F.lit("iso"))
        .when(raw.rlike(r"^\d{2}\."), F.lit("dmy_dot"))
        .when(raw.rlike("^[0-9]{1,2}/"), F.lit("mdy_slash"))
        .otherwise(F.lit("month_name"))
    )
    mon_name = F.lower(F.substring(raw, 1, 3))
    mon_map = F.lit(None).cast("long")
    for name, num in _MONTH_NUM.items():
        mon_map = F.when(mon_name == name, F.lit(num)).otherwise(mon_map)
    year = (
        F.when(fmt == "iso", F.split_part(raw, F.lit("-"), F.lit(1)))
        .when(fmt == "dmy_dot", F.split_part(raw, F.lit("."), F.lit(3)))
        .when(fmt == "mdy_slash", F.split_part(raw, F.lit("/"), F.lit(3)))
        .otherwise(F.regexp_extract(raw, r", (\d{4})$", 1))
        .cast("long")
    )
    month = (
        F.when(fmt == "iso", F.split_part(raw, F.lit("-"), F.lit(2)).cast("long"))
        .when(fmt == "dmy_dot", F.split_part(raw, F.lit("."), F.lit(2)).cast("long"))
        .when(
            fmt == "mdy_slash",
            F.split_part(raw, F.lit("/"), F.lit(1)).cast("long"),
        )
        .otherwise(mon_map)
    )
    day = (
        F.when(fmt == "iso", F.split_part(raw, F.lit("-"), F.lit(3)))
        .when(fmt == "dmy_dot", F.split_part(raw, F.lit("."), F.lit(1)))
        .when(fmt == "mdy_slash", F.split_part(raw, F.lit("/"), F.lit(2)))
        .otherwise(F.regexp_extract(raw, r" (\d{1,2}),", 1))
        .cast("long")
    )
    valid = month.between(1, 12) & day.between(1, 31)
    iso = F.concat(
        year.cast("string"),
        F.lit("-"),
        F.lpad(month.cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(day.cast("string"), 2, "0"),
    )
    return exploded.select(
        F.col(id_col),
        F.col("match_idx").cast("long").alias("match_idx"),
        "raw",
        fmt.alias("fmt"),
        valid.alias("valid"),
        F.when(valid, iso).otherwise(F.lit(None).cast("string")).alias("iso"),
    )


# (?is): case-insensitive + DOTALL, inline so the SAME pattern string
# runs on Java regex (Spark) and RE2 (DuckDB); non-greedy spans keep
# sibling elements separate. No lookarounds (RE2-safe).
HTML_TABLE_RE = r"(?is)<table[^>]*>.*?</table>"
_HTML_TR_RE = r"(?is)<tr[^>]*>.*?</tr>"
_HTML_CELL_RE = r"(?is)<t[dh][^>]*>.*?</t[dh]>"


def html_tables(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """HTML ``<table>`` extraction — the markup-side sibling of
    ``markdown_tables`` and the HTML analogue of the reference's core
    table recovery (lattice/ruled scans, reference extractors ruled.py):
    every cell of every ``<table>`` lands as its own typed row, ready
    for the same downstream joins/rollups the PDF-derived tables feed.

    Emits ``(id, table_idx, row_idx, col_idx, is_header, cell)``:
    indices 0-based in document order (tables within the document, rows
    within the table, cells left-to-right within the row);
    ``is_header`` marks ``<th>`` cells; ``cell`` is the inner text with
    nested tags stripped and whitespace collapsed/trimmed. Documents
    without tables emit nothing (pair with ``filter_attrition`` when
    the drop matters). Malformed markup contract: an unclosed element
    simply never matches its non-greedy span — the extractor emits what
    is well-formed and nothing else, it never guesses at repair (the
    corpus-repair pass is ``corpus_clean``'s job, not a side effect
    here). Nested tables are counted once, flattened into the outer
    table's span (the inner ``</table>`` closes the non-greedy outer
    match; cell-tag sweep then sees both layers' cells) — fine for the
    layout-table HTML this targets, documented so nobody expects a DOM.

    Shape: three chained ``regexp_extract_all`` + ``posexplode`` hops —
    document → tables → rows → cells — all narrow: zero exchanges, zero
    UDFs, zero joins; output volume is bounded by cells, not documents.
    The DuckDB oracle replays the identical patterns (inline ``(?is)``
    flags, so one pattern string serves both engines)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    tables = df.select(
        F.col(id_col),
        F.posexplode(F.regexp_extract_all(t, F.lit(HTML_TABLE_RE), 0)).alias(
            "table_idx", "_tbl"
        ),
    )
    rows = tables.select(
        F.col(id_col),
        "table_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("_tbl"), F.lit(_HTML_TR_RE), 0)
        ).alias("row_idx", "_row"),
    )
    cells = rows.select(
        F.col(id_col),
        "table_idx",
        "row_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("_row"), F.lit(_HTML_CELL_RE), 0)
        ).alias("col_idx", "_cell"),
    )
    inner = F.regexp_replace(
        F.col("_cell"), r"(?is)^<t[dh][^>]*>|</t[dh]>$", ""
    )
    text = F.trim(F.regexp_replace(F.regexp_replace(inner, r"(?s)<[^>]*>", ""), r"\s+", " "))
    return cells.select(
        F.col(id_col),
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row_idx").cast("long").alias("row_idx"),
        F.col("col_idx").cast("long").alias("col_idx"),
        F.col("_cell").rlike("(?i)^<th").alias("is_header"),
        text.alias("cell"),
    )


def rouge_n_pairs(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    id_cols: Sequence[str] = ("conv_id", "turn_idx"),
    n: int = 2,
) -> DataFrame:
    """ROUGE-N with clipped (multiset) counts between a candidate and a
    reference text per row, in exact integer basis points — the
    summarization/extractiveness measure the Jaccard family cannot
    express: ``retry_similarity``/``ngram_jaccard`` score DISTINCT
    shingle overlap, but ROUGE's clipped counts know that a candidate
    repeating one reference phrase ten times earns credit once per
    reference occurrence. The pipeline uses: response-vs-prompt
    extractiveness (is the model quoting its input?), retry-vs-retry
    drift, distillation-output-vs-teacher fidelity.

    Per row: tokenize both sides (trim/lower/whitespace — the
    ``tokens()`` convention), form word n-grams, and with multiset
    counts ``c_g`` (candidate) and ``r_g`` (reference):

        overlap   = Σ_g min(c_g, r_g)                 (clipped match)
        recall_bp    = half-up bp of overlap / Σ r_g
        precision_bp = half-up bp of overlap / Σ c_g
        f1_bp        = half-up bp of 2·overlap / (Σ c_g + Σ r_g)

    (the F1 identity 2PR/(P+R) = 2·overlap/(c+r) keeps it one exact
    division, no float P and R). A side with < n tokens has zero
    grams; its ratio is null (undefined), and ``f1_bp`` is null only
    when BOTH sides are empty. Null text = zero grams (the row is
    preserved — preserve-with-nulls contract).

    Scale shape: one explode of tagged grams, then two groupBys keyed
    by (row id, gram) → (row id) — each a superset of the row key, so
    at scale this is per-pair work that never crosses rows (same
    justification as dedup_paragraphs); bytes moved = gram tokens of
    each pair, never whole corpora. The clipped-count merge is LINEAR
    in gram count — the in-row higher-order-function form would be
    O(distinct·total) per row and is exactly what this shape avoids.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    id_cols = list(id_cols)

    def grams(col):
        words = tokens(F.col(col))
        words = F.filter(words, lambda t: t != "")
        return F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.array_join(F.slice(words, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    tagged = df.select(
        *id_cols,
        F.explode_outer(
            F.concat(
                F.transform(
                    grams(cand_col),
                    lambda g: F.struct(
                        g.alias("g"), F.lit(1).alias("c"), F.lit(0).alias("r")
                    ),
                ),
                F.transform(
                    grams(ref_col),
                    lambda g: F.struct(
                        g.alias("g"), F.lit(0).alias("c"), F.lit(1).alias("r")
                    ),
                ),
            )
        ).alias("t"),
    )
    per_gram = tagged.groupBy(*id_cols, F.col("t.g").alias("_g")).agg(
        F.sum(F.coalesce(F.col("t.c"), F.lit(0))).alias("_c"),
        F.sum(F.coalesce(F.col("t.r"), F.lit(0))).alias("_r"),
    )
    per_row = per_gram.groupBy(*id_cols).agg(
        F.sum(F.least(F.col("_c"), F.col("_r"))).cast("long").alias("overlap"),
        F.sum("_c").cast("long").alias("cand_grams"),
        F.sum("_r").cast("long").alias("ref_grams"),
    )
    # explode_outer of an all-empty concat yields one null-struct row per
    # input row, whose sums count zero grams — row preserved, g null
    per_row = per_row.select(
        *id_cols,
        "overlap",
        "cand_grams",
        "ref_grams",
        F.when(
            F.col("ref_grams") > 0,
            F.expr(
                "(2 * 10000 * overlap + ref_grams) div (2 * ref_grams)"
            ),
        ).cast("long").alias("recall_bp"),
        F.when(
            F.col("cand_grams") > 0,
            F.expr(
                "(2 * 10000 * overlap + cand_grams) div (2 * cand_grams)"
            ),
        ).cast("long").alias("precision_bp"),
        F.when(
            F.col("cand_grams") + F.col("ref_grams") > 0,
            F.expr(
                "(2 * 10000 * 2 * overlap + (cand_grams + ref_grams))"
                " div (2 * (cand_grams + ref_grams))"
            ),
        ).cast("long").alias("f1_bp"),
    )
    return per_row
