"""Deduplication operators for training-data pipelines.

Four strategies, all shuffle-conscious:

* **exact** — hash-groupBy on md5(text). One shuffle on a 16-byte key;
  at 100 TB this is the cheapest possible dedup (shuffle carries hashes
  + ids, never payloads).
* **MinHash + LSH** — word-shingle → k min-hashes → band buckets →
  candidate pairs from bucket joins only (never all-pairs), verified by
  true Jaccard. Signature build is one explode + one groupBy(doc) with
  map-side combine; banding joins are equi-joins on (band, bucket-hash),
  AQE-splittable.
* **SimHash** — 16-bit sign-vote fingerprint; near-dups share the
  fingerprint (or a Hamming-adjacent one). Pure column math, one shuffle.
* **n-gram Jaccard** — exact similarity for candidate pairs sharing a
  shingle; the join is on shingle (pre-filtered by document frequency so
  stop-shingles don't explode the join — the classic hot-key guard).

All hashing is the portable md5-bigint (hashing.py) so DuckDB oracles can
replay every step bit-for-bit.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F

from .hashing import MINHASH_PRIME, affine_perms, md5_bigint


def _regex_quote(s: str) -> str:
    """Quote a literal for a Java regex. ``re.escape`` never escapes
    alphanumerics, and Java permits a backslash before any non-alphabetic
    character, so the escape set is Java-safe — unlike ``\\Q..\\E``,
    which silently breaks when the literal itself contains ``\\E``.
    (Also used by text_stats.segment_paragraphs.)"""
    return re.escape(s)


def normalize_text(col):
    """Lowercase, collapse whitespace — the canonical form all dedup
    strategies share."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one representative (min id) per distinct normalized
    text. Returns (hash, n_dups, keep_id)."""
    return (
        df.select(
            md5_bigint(normalize_text(F.col(text_col))).alias("text_hash"),
            F.col(id_col),
        )
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
    )


def dedup_documents(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The deduplicated table itself: keep one representative row (min id)
    per distinct normalized text. Left-semi join against the keeper set —
    the big side streams, the keeper side is ids only."""
    keep = exact_dedup(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def dedup_against(
    corpus: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental dedup — the daily-ingest path: keep the rows of
    ``new`` whose normalized text was never seen in ``corpus`` and which
    are first (min id) within ``new`` itself. Returns the kept rows of
    ``new`` with all their columns.

    Scale shape: both sides reduce to (hash[, id]) BEFORE any shuffle —
    the corpus's payload bytes never move, and ``new``'s payloads move
    exactly once, in the final semi join keyed on id. Keys are the FULL
    128-bit md5 (collision-safe; the 32-bit bigint form exists only for
    DuckDB oracle replay — never key real dedup on it). At 10^12-doc
    corpus scale the ``seen`` side would come pre-distinct from the
    previous run's state table (this same function's output hashes), so
    the distinct here prices at one map-side-combined pass over hashes.
    Null text coalesces to '' — one explicit class, same contract as
    ``dedup_stream``."""
    key = F.md5(F.coalesce(normalize_text(F.col(text_col)), F.lit("")))
    seen = corpus.select(key.alias("text_hash")).distinct()
    first_in_new = (
        new.select(F.col(id_col), key.alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col))
    )
    fresh = first_in_new.join(seen, "text_hash", "left_anti")
    return new.join(fresh.select(id_col), id_col, "left_semi")


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document, as (id, shingle).
    Built with native higher-order functions (transform over a range) —
    no UDF, stays in codegen. Documents with fewer than ``n`` tokens
    yield ZERO shingles (not a truncated one)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, k: int = 8,
) -> DataFrame:
    """k-permutation MinHash signature per document: one explode + one
    groupBy(id) computing all k minima simultaneously (single shuffle,
    partial aggregation map-side).

    Permutations are universal hashes h_i(x) = (a_i·x + b_i) mod p over a
    SINGLE base md5 per shingle (hashing.affine_perms) — k salted md5
    variants cost k× the hashing; at 100 TB the md5 is the dominant cost
    of signature build."""
    sh = shingles(df, text_col, id_col, n).select(
        id_col, (md5_bigint(F.col("shingle")) % F.lit(MINHASH_PRIME)).alias("hb")
    )
    aggs = [
        F.min((F.lit(a) * F.col("hb") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
            f"h{i}"
        )
        for i, (a, b) in enumerate(affine_perms(k))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def _banded(
    signatures: DataFrame, id_col: str, bands: int, rows: int
) -> DataFrame:
    """(id, band, key) banding of a MinHash signature frame — the LSH
    bucket keys both the self-join and cross-corpus forms equi-join on."""
    return signatures.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",", *[F.col(f"h{b * rows + r}") for r in range(rows)]
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")


def lsh_candidates(
    signatures: DataFrame, id_col: str = "doc_id", bands: int = 4, rows: int = 2,
) -> DataFrame:
    """LSH banding: documents whose signature agrees on all rows of some
    band become a candidate pair. Join is per-band on the band key —
    never an all-pairs product."""
    banded = _banded(signatures, id_col, bands, rows)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "propagate",
    on_stall: str = "star",
) -> DataFrame:
    """Duplicate clusters from a candidate-pair list: min-label
    propagation to a fixpoint. Returns ``(node, comp)`` for every id in
    ``pairs``, where ``comp`` is the smallest id in the node's connected
    component — the canonical cluster representative for dedup keep-lists.

    Each round is one equi-join (labels onto edge endpoints) + one
    map-side-combined ``min`` aggregation; convergence is detected by a
    boolean changed-flag column carried on the materialized label
    checkpoint (a shuffle-free ``take(1)`` scan — not a second join
    diffing new labels against old). Lineage is truncated per round
    with ``localCheckpoint`` so the plan stays O(1) deep (at cluster
    scale swap in reliable ``checkpoint`` against the checkpoint dir).
    Converges in O(component diameter) rounds — near-dup graphs are
    dense clusters with tiny diameters (2-4 rounds in practice).

    A graph that has not converged after ``max_iter`` rounds (a
    pathological high-diameter chain) falls back to the alternating
    large-star/small-star contraction (``_star_components``, O(log²)
    rounds regardless of diameter) rather than returning silently-wrong
    clusters; pass ``on_stall="raise"`` to keep the hard failure, or
    ``algorithm="star"`` to skip propagation and contract directly
    (the right call when the pair graph is known to be chain-shaped).

    Deterministic under any partitioning: the fixpoint (min id reachable)
    is partition-order-free, and both algorithms compute the same one."""
    if algorithm not in ("propagate", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if on_stall not in ("star", "raise"):
        raise ValueError(f"unknown on_stall {on_stall!r}")
    if algorithm == "star":
        return _star_components(pairs, id_a, id_b)
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .cache()
    )
    try:
        labels = (
            edges.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("comp", F.col("node"))
            .localCheckpoint()
        )
        prev_ckpt = labels
        for _ in range(max_iter):
            neigh = (
                edges.join(
                    labels.select(
                        F.col("node").alias("b"), F.col("comp").alias("bcomp")
                    ),
                    "b",
                )
                .groupBy("a")
                .agg(F.min("bcomp").alias("ncomp"))
            )
            # convergence flag rides the label update itself: re-joining
            # new labels onto old ones to diff them would cost a second
            # shuffle join per round; a boolean column on the already-
            # materialized checkpoint costs a shuffle-free take(1) scan
            new_labels = (
                labels.join(neigh, labels["node"] == neigh["a"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("comp"), F.coalesce("ncomp", F.col("comp"))
                    ).alias("comp"),
                    (
                        F.coalesce("ncomp", F.col("comp")) < F.col("comp")
                    ).alias("chg"),
                )
                .localCheckpoint()
            )
            changed = not new_labels.filter("chg").isEmpty()
            # drop the previous round's checkpoint blocks — otherwise up
            # to max_iter label snapshots pile up in executor storage
            prev_ckpt.unpersist()
            prev_ckpt = new_labels
            labels = new_labels.select("node", "comp")
            if not changed:
                return labels
        if on_stall == "raise":
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds "
                "(component diameter exceeds max_iter)"
            )
        return _star_components(pairs, id_a, id_b)
    finally:
        edges.unpersist()


def _star_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 60,
) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014): the
    diameter-free path for pathological chain graphs where min-label
    propagation needs O(diameter) rounds. Converges in O(log² n)
    rounds for ANY graph shape; same output contract as
    ``connected_components`` — ``(node, comp)``, comp = component min.

    Each round is two window-min passes + distinct (no joins); lineage
    truncated per round with ``localCheckpoint``. Convergence is
    detected by an order-free (count, bit_xor of xxhash64) checksum of
    the (distinct) edge set — at the fixpoint the edge set IS the star
    forest, so labels fall out without further work."""
    e = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nodes = (
        pairs.select(F.col(id_a).alias("node"))
        .union(pairs.select(F.col(id_b).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    edges = e.localCheckpoint()
    prev_sig = None
    for _ in range(max_rounds):
        # large-star: m(u) = min({u} ∪ N(u)); link every v ∈ N(u), v > u
        # to m(u). Window-min over the symmetrized edge list — no join.
        sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        ls = (
            sym.withColumn(
                "m", F.least(F.col("a"), F.min("b").over(Window.partitionBy("a")))
            )
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star: orient edges large→small; m(u) = min(N(u)); link u
        # and every v ∈ N(u) except m itself to m.
        dirg = ls.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).distinct()
        withm = dirg.withColumn("m", F.min("b").over(Window.partitionBy("a")))
        ss = (
            withm.select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(withm.select("a", F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        row = ss.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(a, b))"), F.lit(0)).alias("h"),
        ).first()
        sig = (row["n"], row["h"])
        edges.unpersist()
        edges = ss
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"_star_components did not converge in {max_rounds} rounds"
        )
    # fixpoint edge set = star forest: (leaf, root) per non-root node.
    # min-agg guards the (theoretical) multi-parent case; left join
    # restores roots and self-loop-only singletons as their own comp.
    labels = edges.groupBy(F.col("a").alias("node")).agg(F.min("b").alias("comp"))
    out = (
        nodes.join(labels, "node", "left")
        .select("node", F.coalesce("comp", "node").alias("comp"))
    )
    edges.unpersist()
    return out


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, threshold: float = 0.5, max_shingle_df: int = 100,
    cache: bool = True, checkpoint_path: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing ≥1 shingle.

    ``max_shingle_df`` drops shingles appearing in more than that many
    documents before the self-join — the hot-key guard that keeps the
    join from exploding on boilerplate shingles at scale.

    The join/groupBy key is ``xxhash64(shingle)``, not the shingle
    string: shuffles carry 8 bytes per shingle instead of the text, and
    the JVM hash is ~free. Counts are identical unless two distinct
    shingles collide in 64 bits (~n²/2⁶⁴ — at 10¹² distinct shingles
    collisions would perturb a few counts by ±1, which is noise at the
    0.5-Jaccard decision boundary this feeds).

    The exploded shingle table is consumed three times (sizes, document
    frequencies, the self-join). How to materialize it is a scale
    decision, so it's a parameter:

    * ``cache=True`` (default) — ``.cache()``; right up to the point the
      explosion (~n× corpus tokens) fits the cluster's storage memory.
    * ``checkpoint_path`` — write the shingle table as parquet once and
      read it back; the 100-TB path, where caching the explosion would
      spill-storm every executor. Values identical by construction.
    * ``cache=False`` and no path — recompute per consumer; cheapest in
      memory, pays the shingling twice more, still one shuffle per use.
    """
    sh = (
        shingles(df, text_col, id_col, n)
        .select(id_col, F.xxhash64("shingle").alias("shingle"))
    )
    if checkpoint_path is not None:
        sh.write.mode("overwrite").parquet(checkpoint_path)
        sh = df.sparkSession.read.parquet(checkpoint_path)
    elif cache:
        sh = sh.cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    # Document frequency as a whole-partition window count instead of
    # groupBy + self-join: one exchange on shingle (which the self-join
    # below reuses) instead of two scans of the shingle table plus a
    # sort-merge join — measured ~20% faster at sf0.1 with an identical
    # value hash. Skew exposure is unchanged: both forms shuffle the
    # full shingle table by shingle, and a boilerplate mega-shingle
    # dominates its partition either way until the df cap drops it;
    # the window operator spills such partitions exactly where the SMJ
    # sort would have.
    rare = (
        sh.withColumn(
            "df_count", F.count("*").over(Window.partitionBy("shingle"))
        )
        .filter(F.col("df_count") <= max_shingle_df)
        .select(id_col, "shingle")
    )
    pairs = (
        rare.alias("a")
        .join(rare.alias("b"), "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("common"))
    )
    return (
        pairs.join(sizes.withColumnsRenamed({id_col: "id_a", "n_shingles": "size_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "n_shingles": "size_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("size_a") + F.col("size_b") - F.col("common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "common", "jaccard")
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark-contamination flagging: mark every document sharing at
    least one word n-gram with the (small) benchmark set, with the count
    of overlapping distinct shingles. The benchmark shingle set is tiny
    by construction, so the join broadcasts — the corpus side never
    shuffles. Returns (id, n_overlapping) for contaminated docs only."""
    corpus = shingles(df, text_col, id_col, n)
    bench = F.broadcast(
        shingles(benchmark, text_col, id_col, n).select("shingle").distinct()
    )
    return (
        corpus.join(bench, "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlapping"))
    )


def neardup_against(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    rows: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Cross-corpus NEAR-duplicate flagging when the reference set is
    itself web-scale — the path past ``decontaminate`` (whose broadcast
    needs a small benchmark) and ``dedup_against`` (exact hashes only):
    e.g. scrubbing a new crawl against last year's trained corpus.

    Shape: MinHash signatures on BOTH sides (one explode + one
    map-side-combined groupBy each), LSH banding, per-band equi-join
    corpus↔reference on (band, key) — never all-pairs, and never a
    self-join, so neither side's internal duplicates generate pairs —
    then exact n-gram Jaccard computed ONLY for candidate pairs:
    shingle tables are semi-join-restricted to candidate ids before the
    intersection count, so shuffle volume tracks candidates, not the
    corpora. Returns (id, ref_id, common, jaccard) for verified pairs
    with Jaccard ≥ ``threshold``; jaccard rounded to 4 decimals before
    the compare (cross-engine reproducible)."""
    sig_c = minhash_signatures(corpus, text_col, id_col, n, k)
    sig_r = minhash_signatures(reference, text_col, id_col, n, k)
    b_c = _banded(sig_c, id_col, bands, rows)
    b_r = _banded(sig_r, id_col, bands, rows).withColumnRenamed(id_col, "ref_id")
    cand = (
        b_c.join(b_r, ["band", "key"])
        .select(id_col, "ref_id")
        .distinct()
    )
    sh_c = shingles(corpus, text_col, id_col, n).select(
        id_col, F.xxhash64("shingle").alias("shingle")
    )
    sh_r = shingles(reference, text_col, id_col, n).select(
        F.col(id_col).alias("ref_id"), F.xxhash64("shingle").alias("shingle")
    )
    sh_c = sh_c.join(cand.select(id_col).distinct(), id_col, "left_semi")
    sh_r = sh_r.join(cand.select("ref_id").distinct(), "ref_id", "left_semi")
    common = (
        cand.join(sh_c, id_col)
        .join(sh_r, ["ref_id", "shingle"])
        .groupBy(id_col, "ref_id")
        .agg(F.count("*").alias("common"))
    )
    size_c = sh_c.groupBy(id_col).agg(F.count("*").alias("size_a"))
    size_r = sh_r.groupBy("ref_id").agg(F.count("*").alias("size_b"))
    return (
        common.join(size_c, id_col)
        .join(size_r, "ref_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("size_a") + F.col("size_b") - F.col("common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(id_col, "ref_id", "common", "jaccard")
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """16-bit SimHash fingerprint: per bit, sign-vote over token hashes.
    Pure column math over the token array — no explode, no UDF.

    Single traversal: one ``aggregate`` pass carries all ``bits`` vote
    counters in an array accumulator, so each token is md5-hashed exactly
    once (a per-bit formulation re-evaluates the hash array ``bits``
    times — measured 16× slower at sf0.1)."""
    tokens = F.split(normalize_text(F.col(text_col)), " ")
    hashes = F.transform(tokens, lambda t: md5_bigint(t))
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        # shiftright/shiftleft need literal shift counts, so the per-bit
        # shift uses exact double pow (h < 2^32, j ≤ 16 — all exact)
        lambda acc, h: F.zip_with(
            acc,
            bit_idx,
            lambda a, j: a
            + F.when(
                F.floor(h / F.pow(F.lit(2.0), j)).cast("long").bitwiseAND(F.lit(1))
                == 1,
                1,
            ).otherwise(-1),
        ),
    )
    fingerprint = F.aggregate(
        F.zip_with(
            votes,
            bit_idx,
            lambda v, j: F.when(v > 0, F.pow(F.lit(2.0), j).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc + b,
    )
    extra = [F.col(c) for c in (keep_cols or [])]
    return df.select(
        F.col(id_col), fingerprint.cast("bigint").alias("simhash"), *extra
    )


def simhash_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group documents by identical SimHash (near-dup buckets)."""
    return (
        simhash(df, text_col, id_col)
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_paragraphs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Within-document repetition removal: drop repeated paragraphs
    (``sep``-delimited blocks), keeping each block's FIRST occurrence,
    and reassemble the text in original order. The standard cleanup for
    templated/boilerplate repetition inside a single document.

    One explode + one window over (doc, block-hash) ordered by position
    + one ordered re-aggregation — entirely per-document partitions, so
    it scales with the corpus, never across it.

    Null-text rows are preserved (dedup_text null, n_removed 0) — the
    same contract as ``unigram_lm_score`` — via a per-row null flag, not
    a join, so the plan stays one exchange."""
    # F.split takes a Java REGEX while array_join re-joins the literal
    # separator — per-char escape (never \Q..\E, which breaks for
    # separators containing \E) so both agree for any sep
    parts = df.select(
        F.col(id_col),
        F.col(text_col).isNull().alias("_null_text"),
        F.posexplode(
            F.split(
                F.coalesce(F.col(text_col), F.lit("")), _regex_quote(sep), -1
            )
        ).alias("pos", "para"),
    ).withColumn("n_parts", F.count("*").over(Window.partitionBy(id_col)))
    first = parts.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(id_col, F.xxhash64("para")).orderBy("pos")
        ),
    ).filter(F.col("rn") == 1)
    return (
        first.groupBy(id_col)
        .agg(
            F.when(F.first("_null_text"), F.lit(None).cast("string"))
            .otherwise(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("pos"), F.col("para")))
                        ),
                        lambda s: s["para"],
                    ),
                    sep,
                )
            )
            .alias("dedup_text"),
            F.when(F.first("_null_text"), F.lit(0))
            .otherwise(F.max("n_parts") - F.count("*"))
            .cast("long")
            .alias("n_removed"),
        )
    )


def duplicate_spans(
    df: DataFrame, n: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicated-substring spans (the ExactSubstr dedup of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499): every maximal run of word positions
    whose length-``n`` gram occurs MORE THAN ONCE in the corpus
    (across documents or repeated within one) becomes a span
    ``[tok_start, tok_end)`` over the document's normalized-token
    sequence. Downstream, a pipeline cuts those spans from all-but-one
    occurrence; emitting coordinates (not mutated text) keeps the
    operator composable with the offset-preserving segmenters.

    Suffix arrays don't distribute; the equivalent gram formulation
    does: positions sharing a gram are found with ONE count window over
    md5(gram) — the only wide exchange, carrying (id, position, 16-byte
    hash), never payload text — then maximal spans are rebuilt per
    document by gaps-and-islands (a lag + running-sum window, exact
    because all gram intervals have equal length ``n``: interval i
    touches the open island iff p_i − p_{i−1} ≤ n). The per-document
    windows and the final aggregate all reuse one hashpartitioning(id).
    At Lee et al.'s n≈50 hot grams are rare; at small n a boilerplate
    gram can skew the count window — AQE skew-join handles it, or raise
    ``n``. Token arrays are materialized as columns before any lambda
    references them (interpreted HOFs do not CSE).
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    base = df.select(F.col(id_col), words.alias("_w")).select(
        id_col, "_w", F.size("_w").alias("_nw")
    )
    grams = base.filter(F.col("_nw") >= n).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("_nw") - n),
                lambda i: F.md5(F.array_join(F.slice("_w", i + 1, n), " ")),
            )
        ).alias("p", "gh"),
    )
    marked = (
        grams.withColumn("_c", F.count("*").over(Window.partitionBy("gh")))
        .filter(F.col("_c") > 1)
        .select(id_col, "p")
    )
    w_doc = Window.partitionBy(id_col).orderBy("p")
    prev = F.lag("p").over(w_doc)
    flagged = marked.select(
        id_col,
        "p",
        F.when(prev.isNull() | (F.col("p") - prev > n), 1)
        .otherwise(0)
        .alias("_new"),
    )
    islands = flagged.select(
        id_col,
        "p",
        F.sum("_new")
        .over(w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_island"),
    )
    spans = islands.groupBy(id_col, "_island").agg(
        F.min("p").cast("long").alias("tok_start"),
        (F.max("p") + n).cast("long").alias("tok_end"),
    )
    span_idx = F.row_number().over(
        Window.partitionBy(id_col).orderBy("tok_start")
    )
    return spans.select(
        id_col,
        span_idx.cast("long").alias("span_idx"),
        "tok_start",
        "tok_end",
        (F.col("tok_end") - F.col("tok_start")).alias("n_tokens"),
    )


def cut_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply ``duplicate_spans`` output: cut every spanned token run
    from each document's normalized token sequence and re-join — the
    conservative drop-all-copies variant of ExactSubstr cleaning (the
    keep-one-occurrence policy is a keeper join away and deliberately
    not baked in). Null-text documents pass through with null
    ``clean_text``; span-free documents emit their whitespace-normalized
    text unchanged.

    The span table is one-row-per-span and orders of magnitude smaller
    than the corpus; it aggregates to per-document arrays and joins back
    on the id — payloads move through exactly one equi-join, and the cut
    itself is an index-aware higher-order filter (no UDF, no second
    explode of the corpus)."""
    spans_arr = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("tok_start", "tok_end")).alias("_spans")
    )
    base = (
        df.select(
            F.col(id_col),
            F.col(text_col).isNull().alias("_null_text"),
            F.split(normalize_text(F.col(text_col)), " ").alias("_w"),
        )
        .join(spans_arr, id_col, "left")
        .select(
            id_col,
            "_null_text",
            "_w",
            F.coalesce(
                "_spans",
                F.array().cast("array<struct<tok_start:long,tok_end:long>>"),
            ).alias("_sp"),
        )
    )
    kept = F.filter(
        "_w",
        lambda t, i: ~F.exists(
            F.col("_sp"),
            lambda s: (i >= s["tok_start"]) & (i < s["tok_end"]),
        ),
    )
    out = base.select(
        id_col,
        "_null_text",
        F.size("_w").alias("_n"),
        kept.alias("_kept"),
        F.size("_sp").cast("long").alias("n_spans"),
    )
    return out.select(
        id_col,
        F.when(F.col("_null_text"), F.lit(None).cast("string"))
        .otherwise(F.array_join("_kept", " "))
        .alias("clean_text"),
        F.when(F.col("_null_text"), F.lit(0))
        .otherwise(F.col("_n") - F.size("_kept"))
        .cast("long")
        .alias("n_tokens_cut"),
        "n_spans",
    )


def global_line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Cross-corpus line/paragraph dedup (the CCNet/RefinedWeb page-level
    cleanup): every ``sep``-delimited block that appears anywhere else in
    the corpus survives only at its globally-first occurrence — first by
    ``(doc_id, pos)`` order, a partition-free total order — and is cut
    everywhere else. Returns ``(doc_id, dedup_text, n_removed)``;
    null-text documents pass through as ``(null, 0)`` and documents whose
    every block is cut still emit a row (empty ``dedup_text``).

    Blocks shorter than ``min_chars`` are pass-through (never dedup
    candidates): with the default 1, empty lines — which would otherwise
    all collapse into the corpus's single first empty line — keep their
    positions.

    Scale shape: explode → map-side-combined ``min(struct(doc_id,pos))``
    per block key → one equi-join back on the key → per-doc reassembly;
    three exchanges total, and the shuffled key is ``md5(para)`` (32
    bytes, collision-negligible AND exactly replayable in the SQL
    oracle), never the paragraph text. The min-agg crushes hot boilerplate
    blocks map-side before the shuffle, so the classic "same footer on a
    billion pages" skew never reaches a single reducer as raw rows; the
    join on the same key is AQE-skew-splittable."""
    parts = df.select(
        F.col(id_col),
        F.col(text_col).isNull().alias("_null_text"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _regex_quote(sep), -1)
        ).alias("pos", "para"),
    ).withColumn(
        "_k", F.when(F.length("para") >= min_chars, F.md5("para"))
    )
    keep_keys = (
        parts.filter(F.col("_k").isNotNull())
        .groupBy("_k")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_keep"))
    )
    flagged = parts.join(keep_keys, "_k", "left").withColumn(
        "_keep_row",
        F.col("_k").isNull()
        | (
            (F.col(id_col) == F.col(f"_keep.{id_col}"))
            & (F.col("pos") == F.col("_keep.pos"))
        ),
    )
    return flagged.groupBy(id_col).agg(
        F.when(F.first("_null_text"), F.lit(None).cast("string"))
        .otherwise(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep_row"), F.struct(F.col("pos"), F.col("para"))
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                sep,
            )
        )
        .alias("dedup_text"),
        F.when(F.first("_null_text"), F.lit(0))
        .otherwise(F.count("*") - F.sum(F.col("_keep_row").cast("long")))
        .cast("long")
        .alias("n_removed"),
    )


def edit_distance_verify(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_bp: int = 2000,
) -> DataFrame:
    """Exact-verify candidate pairs by normalized edit distance:
    ``(id_a, id_b, edit_dist, is_dup)`` where ``is_dup`` holds iff

        levenshtein(norm_a, norm_b) / max(len_a, len_b) <= threshold_bp/10⁴

    evaluated as a cross-multiplied integer comparison (no float — the
    verdict is bit-identical in the DuckDB oracle). The character-level
    complement to ``ngram_jaccard_pairs``: Jaccard is blind to
    transpositions within a shingle and to heavy repetition; edit
    distance is the sharper metric for short texts and templated
    near-misses.

    Scale: runs ONLY on the candidate pairs (LSH-restricted — never
    all-pairs); two keyed equi-joins move each normalized payload once,
    to its pair. Levenshtein is O(len_a·len_b) per pair JVM-side — at
    corpus scale cap payloads first (``substr`` to a few KB) or keep the
    shingle-Jaccard verify for long documents; the quadratic cost is the
    price of the exact metric, which is why it sits behind candidate
    generation."""
    norm = docs.select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("norm")
    )
    joined = pairs.join(
        norm.select(F.col(id_col).alias("id_a"), F.col("norm").alias("norm_a")),
        "id_a",
    ).join(
        norm.select(F.col(id_col).alias("id_b"), F.col("norm").alias("norm_b")),
        "id_b",
    )
    dist = F.levenshtein("norm_a", "norm_b")
    return joined.select(
        "id_a",
        "id_b",
        dist.cast("long").alias("edit_dist"),
        (
            dist * 10000
            <= F.greatest(F.length("norm_a"), F.length("norm_b")) * threshold_bp
        ).alias("is_dup"),
    )


def cluster_keep_best(
    clusters: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    quality_col: str = "quality",
) -> DataFrame:
    """Quality-aware cluster representative selection: within each
    duplicate cluster keep the HIGHEST-``quality_col`` member (ties →
    smallest id) instead of `neardup_keep`'s smallest-id convention —
    what a production dedup actually wants (drop the truncated mirror,
    keep the clean original).

    One join of the cluster map to the per-doc quality column (ids and
    one numeric only — payloads never move), then a single
    ``max(struct(quality, -id))`` aggregate per cluster: partial-agg
    combinable (one struct per cluster per map partition), no window
    sort, no second pass. Singleton docs (absent from ``clusters``)
    are implicitly kept — compose with a left-anti like `neardup_keep`.
    Emits (cluster_id, keeper id, keeper quality)."""
    scored = clusters.join(
        quality.select(
            F.col(id_col), F.col(quality_col).cast("long").alias("_q")
        ),
        id_col,
    )
    best = scored.groupBy(cluster_col).agg(
        F.max(F.struct(F.col("_q"), (-F.col(id_col)).alias("_nid"))).alias(
            "_best"
        )
    )
    return best.select(
        cluster_col,
        (-F.col(f"_best._nid")).alias(id_col),
        F.col("_best._q").alias(quality_col),
    )


def containment_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, threshold: float = 0.8, max_shingle_df: int = 100,
    cache: bool = True,
) -> DataFrame:
    """Asymmetric shingle containment: directed pairs (src, dst) where
    containment(src→dst) = |shingles(src) ∩ shingles(dst)| / |shingles(src)|
    ≥ ``threshold``. Catches inclusion near-dups Jaccard misses — a short
    document quoted wholesale inside a long one has high containment but
    low Jaccard (the reference's duplicate-prefix trimmer,
    `mobil-oil/mobil-oil-extractor.py:77`, is the one-document analogue
    of this cross-document test).

    Scale shape: identical to ``ngram_jaccard_pairs`` — intersections
    come from a per-shingle equi-join (never all-pairs), document
    frequencies from a window count over the SAME shingle exchange the
    join reuses, and the hot-key guard (``max_shingle_df``) drops
    boilerplate shingles before the join. The join key is
    ``xxhash64(shingle)`` (8-byte shuffle rows). Each unordered pair's
    intersection is aggregated ONCE; both directions then come from a
    2-element explode over the aggregated row — NOT a union of two
    reads of the pair subplan, which would plan the shingle self-join
    twice (verified in the physical plan; plan-pinned single pair
    aggregation).

    ``cache`` — the exploded shingle table feeds four consumers (sizes,
    the df window, both self-join sides); same materialization contract
    as ``ngram_jaccard_pairs``: cache by default, pass ``cache=False``
    to recompute per consumer when the explosion exceeds storage
    memory."""
    sh = (
        shingles(df, text_col, id_col, n)
        .select(id_col, F.xxhash64("shingle").alias("shingle"))
    )
    if cache:
        sh = sh.cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    rare = (
        sh.withColumn(
            "df_count", F.count("*").over(Window.partitionBy("shingle"))
        )
        .filter(F.col("df_count") <= max_shingle_df)
        .select(id_col, "shingle")
    )
    common = (
        rare.alias("a")
        .join(rare.alias("b"), "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("common"))
    )
    with_sizes = common.join(
        sizes.withColumnsRenamed({id_col: "id_a", "n_shingles": "size_a"}),
        "id_a",
    ).join(
        sizes.withColumnsRenamed({id_col: "id_b", "n_shingles": "size_b"}),
        "id_b",
    )
    directed = with_sizes.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src_id"),
                    F.col("id_b").alias("dst_id"),
                    F.col("common").alias("common"),
                    F.col("size_a").alias("size_src"),
                ),
                F.struct(
                    F.col("id_b").alias("src_id"),
                    F.col("id_a").alias("dst_id"),
                    F.col("common").alias("common"),
                    F.col("size_b").alias("size_src"),
                ),
            )
        ).alias("_d")
    ).select("_d.*")
    return (
        directed.withColumn(
            "containment",
            F.round(F.col("common") / F.col("size_src"), 4),
        )
        .filter(F.col("containment") >= threshold)
        .select("src_id", "dst_id", "common", "containment")
    )


def boundary_stitch(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 64,
) -> DataFrame:
    """Shard-boundary stitch detection: pairs (left_id, right_id) where
    the LAST ``k`` normalized characters of one document equal the FIRST
    ``k`` of another — the signature of a single logical document split
    across ingestion shard boundaries (the cross-document analogue of the
    reference's continuation-line merger,
    `roman-census/household.py:78`).

    Scale shape: each side reduces to (id, 16-byte md5 of its k-char
    edge) before the shuffle — payloads never move; one equi-join on the
    hash, then an exact string re-check of the k-char edges (carried only
    for rows that matched, so the verify costs k bytes per CANDIDATE,
    not per row). Documents shorter than ``k`` normalized chars are
    excluded (their edges overlap themselves)."""
    norm = normalize_text(F.col(text_col))
    base = df.select(
        F.col(id_col), norm.alias("_t")
    ).filter(F.length("_t") >= k)
    tails = base.select(
        F.col(id_col).alias("left_id"),
        F.substring(F.col("_t"), -k, k).alias("_edge_l"),
    ).withColumn("_h", F.md5("_edge_l"))
    heads = base.select(
        F.col(id_col).alias("right_id"),
        F.substring(F.col("_t"), 1, k).alias("_edge_r"),
    ).withColumn("_h", F.md5("_edge_r"))
    return (
        tails.join(heads, "_h")
        .filter(
            (F.col("left_id") != F.col("right_id"))
            & (F.col("_edge_l") == F.col("_edge_r"))
        )
        .select("left_id", "right_id")
    )


def split_leakage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    weights: dict[str, int] | None = None,
    salt: str = "split",
    from_split: str = "train",
    to_split: str = "test",
    max_shingle_df: int = 100,
) -> DataFrame:
    """Cross-split contamination audit: for every document the hash
    split assigns to ``to_split``, count the distinct rare shingles it
    shares with ANY ``from_split`` document — the train→test leakage
    report a pipeline must run after splitting (``decontaminate``'s
    within-corpus sibling: same shingle-overlap evidence, but both
    sides come from one table and the split itself is the portable
    hash, so the audit is reproducible from doc ids alone).

    Scale shape: the split label is pure column math on the id (no
    join), shingles explode ONCE and both sides filter from that
    exchange; the train side reduces to distinct 8-byte shingle hashes
    before the equi-join, and the document-frequency hot-key guard
    (``max_shingle_df``, computed over the WHOLE corpus) drops
    boilerplate shingles before any pair forms. Output: (id, n_shared)
    for leaking ``to_split`` docs only — clean docs are absent, so the
    report is small even at corpus scale."""
    from .sampling import hash_split

    sh = hash_split(
        shingles(df, text_col, id_col, n),
        weights or {"train": 80, "val": 10, "test": 10},
        id_col,
        salt,
    ).select(id_col, F.xxhash64("shingle").alias("shingle"), "split")
    rare = (
        sh.withColumn(
            "df_count", F.count("*").over(Window.partitionBy("shingle"))
        )
        .filter(F.col("df_count") <= max_shingle_df)
        .select(id_col, "shingle", "split")
    )
    train = (
        rare.filter(F.col("split") == from_split).select("shingle").distinct()
    )
    return (
        rare.filter(F.col("split") == to_split)
        .join(train, "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )


def lsh_eval(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    bands: int = 4,
    rows: int = 2,
    max_shingle_df: int = 100,
) -> DataFrame:
    """Self-audit of the LSH candidate generator against exact n-gram
    Jaccard ground truth: ONE summary row with the true-pair count, the
    candidate count, the true positives, and integer-exact recall /
    precision in basis points — the report that justifies (or vetoes)
    replacing the exact O(pairs-sharing-a-shingle) join with banding at
    corpus scale. Run it on a sample tier before trusting the banded
    path at 100 TB; the band/row knobs trade recall against candidate
    volume and this measures both sides of that trade.

    Scale shape: the truth side is ``ngram_jaccard_pairs`` (hot-key
    guarded equi-join), the candidate side ``minhash_signatures`` →
    ``lsh_candidates`` (per-band equi-join); both emit (id_a < id_b)
    pairs, so the comparison is one full-outer join on the pair key
    followed by a single 1-row aggregate. Ratios are floor'd basis
    points (bigint), bit-identical at any parallelism."""
    truth = ngram_jaccard_pairs(
        df, text_col, id_col, n, threshold, max_shingle_df
    ).select("id_a", "id_b", F.lit(1).alias("_t"))
    cand = lsh_candidates(
        minhash_signatures(df, text_col, id_col, n, k=bands * rows),
        id_col,
        bands,
        rows,
    ).select("id_a", "id_b", F.lit(1).alias("_c"))
    both = truth.join(cand, ["id_a", "id_b"], "full_outer")
    n_true = F.sum(F.coalesce(F.col("_t"), F.lit(0)))
    n_cand = F.sum(F.coalesce(F.col("_c"), F.lit(0)))
    n_tp = F.sum(
        (F.col("_t").isNotNull() & F.col("_c").isNotNull()).cast("int")
    )
    summary = both.agg(
        F.coalesce(n_true, F.lit(0)).cast("long").alias("n_true"),
        F.coalesce(n_cand, F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce(n_tp, F.lit(0)).cast("long").alias("n_true_positive"),
    )
    # `div` (integer division), not `/`: basis points stay exact int64
    # at any count magnitude — no double rounding anywhere
    return summary.select(
        "n_true",
        "n_candidates",
        "n_true_positive",
        F.expr(
            "case when n_true > 0 then (n_true_positive * 10000) div n_true "
            "else 10000 end"
        ).cast("long").alias("recall_bp"),
        F.expr(
            "case when n_candidates > 0 then "
            "(n_true_positive * 10000) div n_candidates else 10000 end"
        ).cast("long").alias("precision_bp"),
    )


def bag_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-insensitive exact dedup: the fingerprint is the hash of the
    SORTED token multiset, so two documents containing the same words
    the same number of times — shuffled paragraphs, re-ordered list
    items, column-order-scrambled table dumps from a PDF extractor —
    collapse to one group where normalized-text hashing (offset- and
    order-sensitive) sees two distinct documents. Sits between exact
    dedup (stricter) and MinHash (looser: MinHash also fires on
    *partial* overlap; the bag hash fires only on exact multiset
    equality).

    Per document: ``bag_hash`` (hex md5 of the sorted tokens joined on
    an ASCII unit separator — a byte whitespace tokenization can never
    leave inside a token is not guaranteed, but U+001F never occurs in
    the fixture corpus and concat ambiguity additionally requires a
    colliding token multiset, so the join is unambiguous in practice),
    ``bag_size`` (group width) and ``keep`` (true for the min-id
    representative). Null and whitespace-only text all land in ONE
    explicit empty-bag class (the hash of the empty join, via a
    coalesce BEFORE hashing — never a null key, which groupBy would
    silently merge), so empties are visible in the output, not
    dropped and not accidentally deduped against each other as nulls.

    Scale: one narrow projection (the sort happens per row inside
    codegen), then ONE shuffle carrying (16-byte hash, id) — identical
    cost shape to exact_dedup; payloads never move. String sort order
    is binary UTF-8 in both engines, so the oracle replays
    bit-for-bit."""
    hashed = df.select(
        F.col(id_col),
        F.md5(
            F.array_join(
                F.array_sort(
                    F.filter(
                        F.split(
                            normalize_text(
                                F.coalesce(F.col(text_col), F.lit(""))
                            ),
                            " ",
                            -1,
                        ),
                        lambda t: t != F.lit(""),
                    )
                ),
                "\x1f",
            )
        ).alias("bag_hash"),
    )
    groups = hashed.groupBy("bag_hash").agg(
        F.count("*").cast("long").alias("bag_size"),
        F.min(id_col).alias("_keep_id"),
    )
    return hashed.join(groups, "bag_hash").select(
        id_col,
        "bag_hash",
        "bag_size",
        (F.col(id_col) == F.col("_keep_id")).alias("keep"),
    )


def minhash_jaccard_est(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 4,
    rows: int = 2,
) -> DataFrame:
    """Per-candidate-pair estimator audit: for every LSH candidate pair,
    the MinHash ESTIMATE of Jaccard (fraction of agreeing signature
    components) next to the EXACT shingle-set Jaccard and the absolute
    error — the companion to ``lsh_eval`` (which scores the candidate
    GENERATOR); this scores the ESTIMATOR, answering "can the verify
    join be skipped and the signature agreement trusted instead" with
    per-pair integer evidence. All three values are exact integer basis
    points (``agree·10000 div k``; ``common·10000 div union``).

    Scale: signatures and candidates are the existing one-shuffle
    builds; the exact side restricts the shingle self-join to documents
    that appear in some candidate pair (left-semi on the id set) before
    joining, so the verify cost scales with candidate volume, not
    corpus size. k = bands·rows stays small (8), so the agreement sum
    is a fixed-width column expression."""
    k = bands * rows
    sig = minhash_signatures(df, text_col, id_col, n, k)
    cand = lsh_candidates(sig, id_col, bands, rows)
    sig_a = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"h{i}").alias(f"_a{i}") for i in range(k)],
    )
    sig_b = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"h{i}").alias(f"_b{i}") for i in range(k)],
    )
    agree_sql = " + ".join(f"cast(_a{i} = _b{i} as int)" for i in range(k))
    est = cand.join(sig_a, "id_a").join(sig_b, "id_b").select(
        "id_a",
        "id_b",
        F.expr(f"({agree_sql}) * 10000 div {k}").cast("long").alias("est_bp"),
    )
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select("id_b"))
        .distinct()
    )
    sh = shingles(df.join(ids, id_col, "left_semi"), text_col, id_col, n).select(
        id_col, F.xxhash64("shingle").alias("shingle")
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    common = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("common"))
    )
    exact = (
        cand.join(common, ["id_a", "id_b"], "left")
        .join(
            sizes.withColumnsRenamed({id_col: "id_a", "n_sh": "size_a"}),
            "id_a",
            "left",
        )
        .join(
            sizes.withColumnsRenamed({id_col: "id_b", "n_sh": "size_b"}),
            "id_b",
            "left",
        )
        .select(
            "id_a",
            "id_b",
            F.expr(
                "case when coalesce(size_a, 0) + coalesce(size_b, 0)"
                " - coalesce(common, 0) > 0 then"
                " coalesce(common, 0) * 10000 div (coalesce(size_a, 0)"
                " + coalesce(size_b, 0) - coalesce(common, 0))"
                " else 0 end"
            ).cast("long").alias("jacc_bp"),
        )
    )
    return (
        est.join(exact, ["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            "est_bp",
            "jacc_bp",
            F.abs(F.col("est_bp") - F.col("jacc_bp"))
            .cast("long")
            .alias("err_bp"),
        )
    )


BLOOM_WORDS = 2048  # 32-bit words → 65,536-bit filter
BLOOM_K = 3


def _bloom_positions(shingle_col, k: int = BLOOM_K):
    """k salted md5 bit positions in [0, BLOOM_WORDS·32) for a shingle."""
    return [
        F.pmod(
            md5_bigint(F.concat(F.lit(f"bl{j}:"), shingle_col)),
            F.lit(BLOOM_WORDS * 32),
        )
        for j in range(k)
    ]


def bloom_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination — the shape
    ``decontaminate`` grows into when the benchmark suite is too large
    to broadcast as a raw shingle set: the benchmark compresses to a
    fixed ``BLOOM_WORDS``-row bitmap table (k salted md5 positions per
    shingle, OR-folded into 32-bit words held in int64 columns — no
    sign-bit hazards), the corpus probes the broadcast bitmap, and only
    Bloom-positive shingles reach the exact verify join. False
    positives are pruned by the verify; false negatives are impossible
    (every inserted shingle's bits are set), so the output EQUALS
    ``decontaminate``'s exactly — same oracle — while the broadcast
    payload is a constant 2048 rows regardless of benchmark size.

    Emits ``(id, n_candidate_shingles, n_overlapping)`` for documents
    with at least one Bloom-positive shingle: the candidate column is
    the filter's observed selectivity (candidates − verified = false
    positives), the evidence a pipeline needs before trusting the
    prefilter at 100 TB. Documents whose candidates all verify to zero
    still appear (n_overlapping = 0) — they are exactly the
    false-positive-only docs.

    Plan: benchmark side = explode + one ≤2048-group aggregation; corpus
    side = explode + k broadcast-hash-join probes + per-(doc, shingle)
    bit test in codegen; exact verify = broadcast semi-join of ONLY the
    candidates. The corpus never shuffles."""
    word = lambda pos: (pos / F.lit(32)).cast("int")
    # shiftleft() takes a literal bit count, so the 32 possible masks
    # ride a literal array indexed by (pos % 32) — pure codegen math
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(32)])
    mask = lambda pos: F.element_at(masks, (pos % 32).cast("int") + 1)

    bench_sh = shingles(benchmark, text_col, id_col, n).select("shingle").distinct()
    bitmap_rows = []
    for j in range(BLOOM_K):
        pos = _bloom_positions(F.col("shingle"))[j]
        bitmap_rows.append(
            bench_sh.select(word(pos).alias("w"), mask(pos).alias("m"))
        )
    bits = bitmap_rows[0]
    for b in bitmap_rows[1:]:
        bits = bits.unionByName(b)
    bitmap = bits.groupBy("w").agg(F.bit_or("m").alias("bits"))

    corpus = shingles(df, text_col, id_col, n)
    probed = corpus
    hit_all = None
    for j in range(BLOOM_K):
        pos = _bloom_positions(F.col("shingle"))[j]
        bm = bitmap.withColumnsRenamed({"w": f"_w{j}", "bits": f"_bits{j}"})
        probed = probed.join(
            F.broadcast(bm), word(pos) == F.col(f"_w{j}"), "left"
        )
        hj = (
            F.coalesce(F.col(f"_bits{j}"), F.lit(0)).bitwiseAND(mask(pos))
            != 0
        )
        hit_all = hj if hit_all is None else (hit_all & hj)
    candidates = probed.filter(hit_all).select(id_col, "shingle")

    verified = candidates.join(
        F.broadcast(bench_sh), "shingle", "left_semi"
    ).groupBy(id_col).agg(F.count("*").alias("n_overlapping"))
    return (
        candidates.groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_candidate_shingles"))
        .join(verified, id_col, "left")
        .select(
            id_col,
            "n_candidate_shingles",
            F.coalesce("n_overlapping", F.lit(0))
            .cast("long")
            .alias("n_overlapping"),
        )
    )


def prefix_dedup(
    df: DataFrame,
    k: int = 16,
    max_bucket: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Truncated-duplicate detection: document A is a strict TOKEN-
    PREFIX of document B (A = B cut off mid-crawl, a page fetched twice
    with different truncation, a log shipped before rotation finished).
    Exact hashing misses these (different lengths → different hash) and
    Jaccard under-fires when the truncation is early; the prefix
    relation is directional and exact.

    Candidates: documents with at least ``k`` normalized tokens sharing
    the hash of their FIRST ``k`` tokens (docs shorter than k are
    excluded by construction — documented scope; exact/bag dedup covers
    them). Buckets over ``max_bucket`` docs are dropped (a shared
    boilerplate opening would emit O(B²) pairs). Verification is exact:
    ``norm(B)`` must start with ``norm(A) + ' '`` (the trailing space
    pins the match to a token boundary) and A must be strictly shorter.

    Emits ``(id_prefix, id_full, n_tokens_prefix, n_tokens_full)``.
    Shuffle: the candidate join is keyed by the 8-byte prefix hash;
    normalized payloads ride ONLY into guarded buckets (≤ max_bucket
    rows each) for the startswith verify — the corpus at large never
    ships text."""
    norm = normalize_text(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.split(norm, " ", -1)
    keyed = df.select(
        F.col(id_col),
        norm.alias("_norm"),
        F.size(toks).alias("_n_tok"),
        F.xxhash64(F.array_join(F.slice(toks, 1, k), " ")).alias("_pk"),
    ).filter(F.col("_n_tok") >= k)
    guarded = (
        keyed.withColumn(
            "_bucket", F.count("*").over(Window.partitionBy("_pk"))
        )
        .filter(F.col("_bucket") <= max_bucket)
        .drop("_bucket")
    )
    a = guarded.select(
        F.col(id_col).alias("id_prefix"),
        F.col("_norm").alias("_norm_a"),
        F.col("_n_tok").alias("n_tokens_prefix"),
        "_pk",
    )
    b = guarded.select(
        F.col(id_col).alias("id_full"),
        F.col("_norm").alias("_norm_b"),
        F.col("_n_tok").alias("n_tokens_full"),
        "_pk",
    )
    return (
        a.join(b, "_pk")
        .filter(
            (F.col("n_tokens_prefix") < F.col("n_tokens_full"))
            & F.col("_norm_b").startswith(
                F.concat(F.col("_norm_a"), F.lit(" "))
            )
        )
        .select(
            "id_prefix",
            "id_full",
            F.col("n_tokens_prefix").cast("long").alias("n_tokens_prefix"),
            F.col("n_tokens_full").cast("long").alias("n_tokens_full"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus novelty score: the fraction of a document's distinct
    n-gram shingles that appear in NO other document (corpus df = 1) —
    the mirror image of contamination/duplication metrics. Low novelty
    flags documents assembled from corpus commonplaces (spun content,
    template farms); high novelty flags unique material worth keeping
    through aggressive dedup. Distinct from ``dup_ngram_frac``, which
    measures repetition WITHIN a document.

    Integer basis points: ``novelty_bp = unique·10000 div n_shingles``
    (half-up is unnecessary — callers threshold, and floor keeps the
    SQL replay one operator). Documents with fewer than ``n`` tokens
    have zero shingles and are PRESERVED with ``n_shingles = 0``,
    ``novelty_bp = 0``.

    Plan: the shingle explode feeds one groupBy(shingle-hash) document-
    frequency count (8-byte keys, map-side combined) joined straight
    back to the same exploded rows, then a per-document aggregate —
    two exchanges total, payloads never move."""
    sh = shingles(df, text_col, id_col, n).select(
        id_col, F.xxhash64("shingle").alias("sh")
    )
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df_count"))
    per = (
        sh.join(dfreq, "sh")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("df_count") == 1).cast("int")).alias("n_unique"),
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_unique", F.lit(0)).cast("long").alias("n_unique"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.expr("n_unique * 10000 div n_shingles"),
            ).otherwise(F.lit(0)).cast("long").alias("novelty_bp"),
        )
    )


def simhash_wide(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 48,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Wide SimHash fingerprint (default 48-bit) — the input to
    Hamming-distance near-dup search, where 16 bits is far too coarse
    (at corpus scale a 16-bit space conflates everything). Two
    independent 32-bit token hashes (the base md5 plus an ``'sh2:'``
    salt) supply the bit pool; the sign-vote is the same single
    ``aggregate`` traversal as :func:`simhash` — each token hashed
    exactly twice, all ``bits`` counters carried in one array
    accumulator, no explode, no UDF.

    48 keeps every power of two exact in double math (the shift trick
    needs 2^j ≤ 2^52) and the fingerprint comfortably inside a signed
    bigint; for Manku-faithful 64-bit fingerprints at 100 TB, store the
    two 32-bit halves as separate columns instead of packing."""
    if not 1 <= bits <= 48:
        raise ValueError(f"bits must be in [1, 48], got {bits}")
    tokens = F.split(normalize_text(F.col(text_col)), " ")
    hashes = F.transform(
        tokens,
        lambda t: F.struct(
            md5_bigint(t).alias("lo"),
            md5_bigint(F.concat(F.lit("sh2:"), t)).alias("hi"),
        ),
    )
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            bit_idx,
            lambda a, j: a
            + F.when(
                F.floor(
                    F.when(j < 32, h["lo"]).otherwise(h["hi"])
                    / F.pow(F.lit(2.0), F.when(j < 32, j).otherwise(j - 32))
                )
                .cast("long")
                .bitwiseAND(F.lit(1))
                == 1,
                1,
            ).otherwise(-1),
        ),
    )
    fingerprint = F.aggregate(
        F.zip_with(
            votes,
            bit_idx,
            lambda v, j: F.when(v > 0, F.pow(F.lit(2.0), j).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc + b,
    )
    extra = [F.col(c) for c in (keep_cols or [])]
    return df.select(
        F.col(id_col), fingerprint.cast("bigint").alias("simhash"), *extra
    )


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 48,
    max_bucket: int = 10_000,
) -> DataFrame:
    """All document pairs within SimHash Hamming distance ``max_hamming``
    — Manku/Jain/Sarma's multi-probe construction (WWW'07), the
    web-crawl near-dup algorithm, as a pure DataFrame plan. Pigeonhole:
    split the ``bits``-bit fingerprint into ``max_hamming + 1`` chunks;
    any pair within distance d agrees exactly on ≥ 1 chunk, so an
    equi-join per chunk finds every candidate and ``bit_count(xor)``
    verifies exactly. Never an all-pairs comparison: candidate volume is
    Σ_buckets |bucket|², concentrated by the chunk width (12 bits here —
    expected bucket n/4096; widen ``bits``/chunks at 100 TB).

    Shape: fingerprint (no shuffle) → 4-way chunk explode → one
    self-equi-join on (chunk_idx, chunk_value) → distinct pair →
    integer popcount verify. The ``max_bucket`` guard drops chunk
    buckets bigger than the bound (degenerate mass — e.g. empty
    documents sharing one fingerprint) the same way the Jaccard path
    guards hot shingles: loudly in the contract, deterministically in
    the plan, and replayed identically by the oracle. Route exact-equal
    fingerprints through :func:`simhash_dup_groups` first — identical
    fingerprints are an exact-dup class, not a near-dup search problem.

    Emits (id_a, id_b, hamming), id_a < id_b."""
    n_chunks = max_hamming + 1
    if bits % n_chunks:
        raise ValueError(f"bits={bits} not divisible by {n_chunks} chunks")
    w = bits // n_chunks
    fp = simhash_wide(df, text_col, id_col, bits)
    chunk = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("ci"),
                    F.shiftright(F.col("simhash"), w * i)
                    .bitwiseAND(F.lit((1 << w) - 1))
                    .alias("cv"),
                )
                for i in range(n_chunks)
            ]
        )
    )
    keyed = fp.select(F.col(id_col), "simhash", chunk.alias("ch")).select(
        id_col, "simhash", F.col("ch.ci").alias("ci"), F.col("ch.cv").alias("cv")
    )
    ok_buckets = (
        keyed.groupBy("ci", "cv")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .select("ci", "cv")
    )
    guarded = keyed.join(ok_buckets, ["ci", "cv"])
    a = guarded.select(
        F.col("ci"), F.col("cv"),
        F.col(id_col).alias("id_a"), F.col("simhash").alias("_sa"),
    )
    b = guarded.select(
        F.col("ci"), F.col("cv"),
        F.col(id_col).alias("id_b"), F.col("simhash").alias("_sb"),
    )
    cand = (
        a.join(b, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
    )
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (
        cand.select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            ham.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def lsh_degree_hist(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows: int = 2,
) -> DataFrame:
    """Candidate-graph health report for the banded-MinHash path: the
    degree distribution of :func:`lsh_candidates` — per degree (number
    of candidate partners a document has, 0 included), how many
    documents. THE pre-flight check before running the exact-verify
    stage at scale: a banding whose histogram grows a heavy tail of
    high-degree hubs is about to quadratically explode the verify join
    (candidates ∝ Σ degree), and the fix — more rows per band, a
    hot-key guard — is chosen from this table, not discovered from a
    straggler stage at 100 TB.

    Emits ``(degree, n_docs)``. The degree-0 basis is the signature id
    set (a document too short to produce a shingle has no signature and
    no row — it cannot be a candidate by construction). Both endpoints
    of every pair count (the graph is undirected).

    Cost on top of the candidate join itself: one map-side-combined
    count per endpoint id, one left join back onto the (id)-projected
    signature set, one count on the (tiny) degree key. The signatures
    frame feeds BOTH the candidate join and the zero-degree basis; pass
    a cached/checkpointed frame (materialization is caller-owned, same
    contract as ngram_jaccard_pairs) to avoid rebuilding the signature
    aggregation on each branch."""
    pairs = lsh_candidates(signatures, id_col, bands, rows)
    # explode each pair into its two endpoints in ONE pass — a unionAll
    # of two projections would duplicate the whole candidate-join
    # subtree in the plan (Spark does not share common subexpressions
    # across union branches), doubling the join cost
    endpoints = pairs.select(
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias(id_col)
    )
    deg = endpoints.groupBy(id_col).agg(
        F.count("*").cast("long").alias("_degree")
    )
    based = (
        signatures.select(id_col)
        .join(deg, id_col, "left")
        .select(F.coalesce("_degree", F.lit(0)).cast("long").alias("degree"))
    )
    return based.groupBy("degree").agg(
        F.count("*").cast("long").alias("n_docs")
    )


def lsh_tuning(threshold: float, k: int = 8) -> list[dict]:
    """Banding-parameter design table (driver-side math, no data): for
    every (bands, rows) factorization of a ``k``-hash MinHash signature,
    the S-curve collision probability ``1 - (1 - s^r)^b`` at the target
    Jaccard ``threshold`` and the similarity at which collision
    probability crosses 1/2 (``s50 = (1 - (1/2)^(1/b))^(1/r)``). The
    table one reads BEFORE committing a banding to a 100-TB run: pick
    the row whose ``s50`` brackets the threshold, then verify with
    lsh_eval on a sample and check the join fan-out with
    lsh_degree_hist. Pure reference math (Leskovec et al., MMDS ch.3);
    deterministic, unit-tested against hand-computed values."""
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    out = []
    for rows in range(1, k + 1):
        if k % rows:
            continue
        bands = k // rows
        p = 1.0 - (1.0 - threshold**rows) ** bands
        s50 = (1.0 - 0.5 ** (1.0 / bands)) ** (1.0 / rows)
        out.append(
            {
                "bands": bands,
                "rows": rows,
                "p_collision_at_threshold": p,
                "s50": s50,
            }
        )
    return out


def windowed_dedup(
    df: DataFrame,
    window_s: int = 3600,
    ts_col: str = "ts",
    text_col: str = "text",
    id_col: str = "doc_id",
    window: str | None = None,
) -> DataFrame:
    """Exact dedup with a TIME HORIZON: duplicates collapse only within
    the same tumbling event-time window — the batch form of
    ``dropDuplicatesWithinWatermark`` and the standard bounded-state
    compromise for perpetual crawls, where global dedup state would
    grow forever but a re-crawl within the horizon is still junk. The
    horizon is explicit: a duplicate straddling two windows SURVIVES
    (that is the contract, not a bug — global collapse is exact_dedup).

    Emits one row per (window, distinct normalized text):
    ``(window_start, text_hash, n_dups, keep_id)``. Null event times
    form their own explicit window (null window_start) rather than
    vanishing — deliberately NOT ``F.window()``, which silently drops
    null-timestamp rows (it generates no window for them); the tumbling
    start is epoch arithmetic, aligned to the unix epoch exactly like
    the native operator for post-1970 timestamps. ``window`` accepts
    the streaming-style strings "N hours"/"N minutes"/"N seconds" as a
    convenience. One map-side-combined groupBy on (window_start,
    16-byte hash); payloads never shuffle."""
    if window is not None:
        qty, unit = window.split()
        window_s = int(qty) * {"second": 1, "minute": 60, "hour": 3600}[
            unit.rstrip("s")
        ]
    win_start = F.timestamp_seconds(
        F.expr(f"(cast({ts_col} as long) div {int(window_s)})")
        * F.lit(int(window_s))
    )
    return (
        df.select(
            F.when(F.col(ts_col).isNotNull(), win_start).alias(
                "window_start"
            ),
            md5_bigint(normalize_text(F.col(text_col))).alias("text_hash"),
            F.col(id_col),
        )
        .groupBy("window_start", "text_hash")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
    )


def source_mirror_pairs(
    df: DataFrame,
    text_col: str = "text",
    src_col: str = "source",
    min_shared: int = 2,
) -> DataFrame:
    """Mirror detection at SOURCE granularity: which pairs of sources
    keep publishing the same documents. Exact-dup analysis says *what*
    is duplicated; a mixture builder needs to know *which feeds* mirror
    each other, because the fix is dropping/down-weighting a whole
    source, not deleting rows one at a time.

    Per unordered source pair (src_a < src_b) seen sharing
    ``min_shared``+ distinct normalized texts, emits ``(src_a, src_b,
    n_shared)``. A text present in k sources contributes to all
    C(k, 2) pairs — the fan-out is bounded by the SOURCE count, not the
    corpus (sources are catalog-sized, so the self-join explodes to at
    most |sources|² rows per text identity).

    Shape: one distinct on (16-byte hash, source) — payloads never
    shuffle — then a hash-keyed self-join and a map-side-combined pair
    count."""
    hs = df.select(
        md5_bigint(normalize_text(F.col(text_col))).alias("_h"),
        F.col(src_col).alias("_src"),
    ).distinct()
    a = hs.alias("a")
    b = hs.alias("b")
    return (
        a.join(
            b,
            (F.col("a._h") == F.col("b._h"))
            & (F.col("a._src") < F.col("b._src")),
        )
        .groupBy(
            F.col("a._src").alias("src_a"), F.col("b._src").alias("src_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
