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
