"""Lexical retrieval over the corpus: exact-integer BM25 top-k.

The search-side counterpart of the embedding ANN operators in
``similarity.py`` — the term-statistics path a training-data pipeline
uses for decontamination lookups, targeted corpus probes, and
quality-set mining when no embedding column exists.

All scoring is exact integer arithmetic (the no-float oracle rule):

* idf is quantized to ``floor(log2(N / df))`` — one-less-than-the-
  binary-digit-count of the integer quotient, exact in both Spark
  (``conv``) and DuckDB (``bin``);
* BM25's k1=1.2, b=0.75 are the rationals 6/5 and 3/4, and the
  tf-saturation fraction is cross-multiplied into integers:
  with S = total corpus tokens and N = total docs (avgdl = S/N),

      tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
        = 22·S·tf / (10·S·tf + 3·S + 9·dl·N)

  and each term contributes half-up basis points of that fraction,
  scaled by its quantized idf, so per-document scores are integer sums
  that replay bit-identically in any engine (the intermediate products
  stay inside int64 up to ~10^9-token corpora per the 10^4·22·S·tf
  bound; past that, rank with doubles — ordering, not values, is the
  contract at that scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text_stats import tokens


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> DataFrame:
    """Top-``k`` documents per query by exact-integer BM25 (see module
    docstring for the integerization). Returns
    ``(query_id, doc_id, score_bp, rank)``, rank 1..k per query under
    the total order (score desc, doc_id asc).

    Scale shape: the corpus reduces to (doc, term, tf, dl) before any
    join — payload text never moves; document frequency is a count
    window over the tf aggregate's own term-keyed exchange; corpus
    totals (S, N) ride a broadcast 1-row aggregate; the query-term
    table broadcasts (queries are few). The final per-query rank is
    two-phase: a local top-k per input partition prunes candidates to
    ≤ k·partitions rows BEFORE the per-query exchange, so one query's
    full candidate set (potentially the whole corpus) never funnels
    into a single reducer — the pruned set provably contains the global
    top-k (any row with global rank ≤ k has partition-local rank ≤ k
    under the same total order), so the result is exact and
    partition-count-independent."""
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    base = df.select(
        F.col(id_col),
        F.coalesce(toks, F.array().cast("array<string>")).alias("_w"),
    )
    stats = base.agg(
        F.sum(F.size("_w")).cast("long").alias("S"),
        F.count("*").cast("long").alias("N"),
    )
    tf = (
        base.select(
            id_col, F.size("_w").alias("dl"), F.explode("_w").alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(
            F.array_distinct(
                F.filter(tokens(F.col(query_text_col)), lambda t: t != "")
            )
        ).alias("term"),
    )
    cand = (
        tf.withColumn("doc_freq", F.count("*").over(Window.partitionBy("term")))
        .join(F.broadcast(qterms), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "qidf",
            (F.length(F.conv(F.expr("N div doc_freq"), 10, 2)) - 1).cast("long"),
        )
        .withColumn(
            "_den",
            (
                F.lit(10) * F.col("S") * F.col("tf")
                + F.lit(3) * F.col("S")
                + F.lit(9) * F.col("dl") * F.col("N")
            ).cast("long"),
        )
        .withColumn(
            "_num",
            (F.lit(22) * F.col("S") * F.col("tf") * F.col("qidf")).cast("long"),
        )
        .withColumn(
            "_bp", F.expr("(2 * (10000 * _num) + _den) div (2 * _den)")
        )
    )
    scores = cand.groupBy(query_id_col, id_col).agg(
        F.sum("_bp").cast("long").alias("score_bp")
    )
    order = [F.desc("score_bp"), F.asc(id_col)]
    local = (
        scores.withColumn("_p", F.spark_partition_id())
        .withColumn(
            "_lr",
            F.row_number().over(
                Window.partitionBy(query_id_col, "_p").orderBy(*order)
            ),
        )
        .filter(F.col("_lr") <= k)
        .drop("_p", "_lr")
    )
    rank = F.row_number().over(Window.partitionBy(query_id_col).orderBy(*order))
    return local.withColumn("rank", rank.cast("long")).filter(F.col("rank") <= k)


def postings(
    df: DataFrame,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted-index construction: the (term, doc, tf, df) posting
    table behind bm25_topk/tfidf, exposed as its own sink-able output —
    what a search-index build job materializes per corpus snapshot.

    Two map-side-combined aggregations sharing one token explode:
    tf on (term, doc), then df as a count over the ALREADY-collapSED
    (term, doc) rows — the second exchange carries one row per distinct
    (term, doc), never per occurrence. ``min_df`` prunes hapax terms
    (the overwhelming majority of the distinct-term space at corpus
    scale) before the df table joins back on the term. Empty tokens
    are dropped; null-text docs contribute nothing.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(tokens(F.col(text_col)), lambda w: w != F.lit(""))
        ).alias("term"),
    )
    tf = toks.groupBy("term", id_col).agg(F.count("*").alias("tf"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
    )
    return tf.join(dfreq, "term").select("term", id_col, "tf", "df")


def sparse_cosine_pairs(
    df: DataFrame,
    min_df: int = 2,
    max_df: int = 64,
    min_cos2_bp: int = 2500,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All-pairs document cosine similarity over raw term-frequency
    vectors, computed THROUGH the inverted index (the classic
    "all-pairs similarity search" join, Bayardo et al. 2007 shape):
    two documents meet only where they share a term, so the join is
    postings ⋈ postings on the term key — never a document cross
    product. Complements the shingle/MinHash family: token-multiset
    cosine fires on topical near-duplication (same vocabulary,
    different order/length) that exact shingle overlap misses.

    The df-window prune is the scale guard: terms with df > ``max_df``
    (stop-words — present in nearly every document) would each emit
    O(df²) join rows and contribute near-zero discrimination, so they
    are cut from the PAIRING side; terms with df < ``min_df`` pair
    nothing and are cut too. Norms are computed over the SAME pruned
    vocabulary, so the reported value is the exact cosine of the
    pruned vectors (documented estimator, not an approximation of the
    unpruned one).

    No floats: the output is squared cosine in half-up integer basis
    points, ``cos2_bp = 10000·dot² / (|a|²·|b|²)`` — monotone in
    cosine for non-negative tf vectors, so thresholding/ranking is
    preserved and every engine replays the integers bit-for-bit.
    (int64 bound: dot ≤ ~3·10⁹ keeps 10⁴·dot² < 2⁶³; per-document tf
    over the pruned vocab stays far below that in natural text.)

    Plan: one explode + map-side-combined groupBy builds tf; df as a
    count over the already-collapsed (term, doc) rows; the self-join
    clusters on the term key with AQE skew handling; dot/count
    aggregate on (id_a, id_b). Shuffles carry (term-hash, id, tf)
    triples — payloads never move."""
    tf = (
        df.select(
            F.col(id_col),
            F.explode(
                F.filter(tokens(F.col(text_col)), lambda w: w != F.lit(""))
            ).alias("term"),
        )
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    pruned = (
        tf.join(
            dfreq.filter(
                (F.col("df") >= min_df) & (F.col("df") <= max_df)
            ).select("term"),
            "term",
        )
    )
    norms = pruned.groupBy(id_col).agg(
        F.sum(F.col("tf") * F.col("tf")).alias("norm2")
    )
    pairs = (
        pruned.alias("a")
        .join(pruned.alias("b"), "term")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(
            F.sum(F.col("a.tf") * F.col("b.tf")).alias("dot"),
            F.count("*").cast("long").alias("n_shared_terms"),
        )
    )
    return (
        pairs.join(norms.withColumnRenamed(id_col, "id_a"), "id_a")
        .withColumnRenamed("norm2", "norm2_a")
        .join(norms.withColumnRenamed(id_col, "id_b"), "id_b")
        .withColumnRenamed("norm2", "norm2_b")
        .withColumn(
            "cos2_bp",
            F.expr(
                "(2 * 10000 * dot * dot + norm2_a * norm2_b)"
                " div (2 * norm2_a * norm2_b)"
            ).cast("long"),
        )
        .filter(F.col("cos2_bp") >= min_cos2_bp)
        .select(
            "id_a",
            "id_b",
            F.col("dot").cast("long").alias("dot"),
            "n_shared_terms",
            F.col("norm2_a").cast("long").alias("norm2_a"),
            F.col("norm2_b").cast("long").alias("norm2_b"),
            "cos2_bp",
        )
    )


# ------------------------------------------------------------- ndcg_at_k


def ndcg_discounts(k: int) -> list[int]:
    """Integer rank-discount table for :func:`ndcg_at_k`:
    ``W[p] = round(2^32 / log2(p + 1))`` for positions ``1..k``. The
    scale is fixed (2^32) and the table is computed once from the same
    formula in every engine's driver, so DCG becomes an exact integer
    dot product — the float ``log2`` lives only in this constant table,
    never in per-row engine math (the no-float oracle rule, same move
    as bm25_topk's rational k1/b)."""
    import math

    return [int(round(2**32 / math.log2(p + 1))) for p in range(1, k + 1)]


def ndcg_at_k(
    df: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
    max_rel: int = 20,
) -> DataFrame:
    """Exact-integer NDCG@k per query — the graded-relevance companion
    to ``rank_auc`` (binary, corpus-level) and ``ann_recall`` (set
    overlap): given a retrieval system's integer scores and graded
    judgments, how close is each query's ranking to its ideal one?
    This is the gate a pipeline runs on a reranker or embedding model
    before letting it mine hard negatives / quality sets from 10^10
    candidates.

    Semantics (one row per query):

    * ranking = order by (score desc, id asc) — the id tiebreak makes
      the permutation TOTAL, so the statistic is engine-portable even
      with duplicate scores (an arbitrary-tiebreak NDCG is not a
      well-defined number at all);
    * ``gain = 2^rel - 1`` with ``rel`` clamped to ``[0, max_rel]``
      (bit-shift, exact; max_rel=20 with k ≤ 1000 keeps the scaled
      DCG sum < 2^62 — both bounds enforced);
    * ``dcg_scaled = Σ_{p ≤ k} gain · W[p]`` over the realized ranking
      and ``idcg_scaled`` over the ideal (rel-desc) one, with ``W``
      from :func:`ndcg_discounts`;
    * ``ndcg_ppm = (10^6 · dcg) div idcg`` in decimal(38); a query
      whose judged items are all rel=0 has idcg=0 and yields null
      (not a fake 1.0).

    Null query/id/score/rel rows are dropped (a null judgment is not a
    zero judgment).

    Scale shape: ONE exchange on the query key; both the realized and
    the ideal rank are windows over that same partitioning (two sorts,
    one shuffle), then a map-side-combined groupBy on the key the data
    is already partitioned by. Bytes moved = (query, id, score, rel)
    tuples — never payloads. Skew bound: a query's cost is its
    candidate-list length; cap candidate generation upstream (top-N
    per query) rather than here.
    """
    if not 1 <= k <= 1000:
        raise ValueError(f"k must be in [1, 1000], got {k}")
    if not 0 <= max_rel <= 20:
        raise ValueError(f"max_rel must be in [0, 20], got {max_rel}")
    w_arr = F.array(*[F.lit(w) for w in ndcg_discounts(k)])
    # null filters run on the INPUT df, before the projection renames
    # anything: filtering post-projection on F.col(rel_col) relied on
    # Spark's missing-attribute resolution and would silently bind to
    # the wrong column if rel_col collided with an output name (e.g. a
    # rel column literally named 'query'). The clamp can't stand in for
    # the filter because least/greatest skip nulls (a null rel would
    # clamp to max_rel, turning "unjudged" into "perfect").
    s = (
        df.filter(
            F.col(query_col).isNotNull()
            & F.col(id_col).isNotNull()
            & F.col(rel_col).isNotNull()
        )
        .select(
            F.col(query_col).alias("query"),
            F.col(id_col).alias("_id"),
            F.col(score_col).cast("long").alias("_s"),
            F.greatest(
                F.lit(0), F.least(F.lit(max_rel), F.col(rel_col).cast("long"))
            ).alias("_r"),
        )
        .filter(F.col("_s").isNotNull())
    )
    w_rank = Window.partitionBy("query").orderBy(
        F.desc("_s"), F.asc("_id")
    )
    w_ideal = Window.partitionBy("query").orderBy(
        F.desc("_r"), F.asc("_id")
    )
    # shiftleft's PySpark wrapper only takes a literal bit count; the
    # SQL form accepts a column
    gain = F.expr("shiftleft(cast(1 as bigint), cast(_r as int))") - 1
    ranked = s.select(
        "query",
        gain.alias("_g"),
        F.row_number().over(w_rank).alias("_p"),
        F.row_number().over(w_ideal).alias("_ip"),
    )
    agg = ranked.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_p") <= k,
                    F.col("_g") * F.element_at(w_arr, F.col("_p").cast("int")),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("dcg_scaled"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_ip") <= k,
                    F.col("_g")
                    * F.element_at(w_arr, F.col("_ip").cast("int")),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("idcg_scaled"),
    )
    return agg.select(
        "query",
        "n_items",
        "dcg_scaled",
        "idcg_scaled",
        F.when(
            F.col("idcg_scaled") > 0,
            F.expr(
                "cast((cast(1000000 as decimal(38,0)) * dcg_scaled)"
                " div idcg_scaled as long)"
            ),
        ).alias("ndcg_ppm"),
    )


# --------------------------------------------------------- hard_negatives


def hard_negatives(
    scored: DataFrame,
    positives: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    k: int = 8,
) -> DataFrame:
    """Top-k hardest negatives per query for contrastive training:
    from a scored candidate table, the k highest-scored documents that
    are NOT labeled positive for that query — the mining step between
    a retriever's candidate lists and a reranker/embedding trainer's
    (query, positive, hard-negative) triples. Beside ndcg_at_k (does
    the ranking rank?) this is what the ranking is FOR.

    Semantics: ``positives`` rows are dropped per (query, id); ties on
    score break by id asc (total order — the mined set is
    engine-portable, like ndcg_at_k's permutation); output carries
    ``neg_rank`` 1..k. Null query/id/score rows are dropped. A query
    whose candidates are all positive emits nothing.

    Scale shape: one anti-join on (query, id) — positives move as
    (query, id) pairs only, never payloads — then the bm25_topk
    two-phase top-k: a per-partition WindowGroupLimit prunes to ≤ k
    rows per (query, partition) BEFORE the query exchange, so a
    query with 10^6 candidates ships k per map partition, not 10^6.
    The final window sorts ≤ k·n_partitions rows per query."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    s = scored.select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_id"),
        F.col(score_col).cast("long").alias("_s"),
    ).filter(
        F.col("_q").isNotNull()
        & F.col("_id").isNotNull()
        & F.col("_s").isNotNull()
    )
    p = positives.select(
        F.col(query_col).alias("_q"), F.col(id_col).alias("_id")
    )
    negs = s.join(p, ["_q", "_id"], "left_anti")
    w = Window.partitionBy("_q").orderBy(F.desc("_s"), F.asc("_id"))
    return (
        negs.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(
            F.col("_q").alias(query_col),
            F.col("_id").alias(id_col),
            F.col("_s").alias(score_col),
            F.col("neg_rank").cast("long").alias("neg_rank"),
        )
    )
