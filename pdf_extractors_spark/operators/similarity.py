"""Similarity search over an embedding column (``array<float>``).

* **brute-force cosine top-k** — the correctness baseline: native
  higher-order functions (``zip_with`` + ``aggregate``) compute the dot
  product JVM-side; window ``row_number`` takes top-k. No UDF, no
  collect. Cost O(N·Q) — fine for verification, not the scale path.
* **IVF (inverted-file) ANN** — the scale path: partition vectors into C
  cells by nearest centroid (broadcast join against the tiny centroid
  set), then search only the query's ``n_probe`` nearest cells. At 100 TB
  the cell assignment is one broadcast-join pass and each query touches
  ~n_probe/C of the data. Centroids here are taken deterministically
  (first C vectors) — a k-means refinement would slot into the same API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k cosine neighbors for each query vector. ``queries`` has
    (query_id, embedding). Self-matches (same id) are excluded when the
    id columns share values."""
    v = vectors.select(F.col(id_col), F.col(vec_col).alias("_v"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_q"))
    # queries are few, vectors are many: broadcast the query side so the
    # big side never shuffles
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col(query_id_col) != F.col(id_col))
        .withColumn("cos", F.round(cosine(F.col("_q"), F.col("_v")), 4))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast join — the
    centroid set is tiny by construction)."""
    c = F.broadcast(
        centroids.select(
            F.col("centroid_id"), F.col(vec_col).alias("_c")
        )
    )
    # rounded before ordering so cell assignment is reproducible across
    # engines (the DuckDB oracle replays this ordering bit-for-bit)
    scored = vectors.select(F.col(id_col), F.col(vec_col)).join(c).withColumn(
        "cos_c", F.round(cosine(F.col(vec_col), F.col("_c")), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cos_c"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(id_col, vec_col, "centroid_id")
    )


def take_centroids(vectors: DataFrame, n: int = 8, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic centroid seed: the n lowest-id vectors."""
    return (
        vectors.orderBy(id_col)
        .limit(n)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col)
        )
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k: search only the n_probe cells nearest each query."""
    assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    c = F.broadcast(centroids.select("centroid_id", F.col(vec_col).alias("_c")))
    q_cells = (
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_q"))
        .join(c)
        .withColumn("cos_c", F.round(cosine(F.col("_q"), F.col("_c")), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_c"), F.asc("centroid_id"))
    probes = (
        q_cells.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probe)
        .select(query_id_col, "_q", "centroid_id")
    )
    scored = (
        probes.join(assigned, "centroid_id")
        .filter(F.col(query_id_col) != F.col(id_col))
        .withColumn("cos", F.round(cosine(F.col("_q"), F.col(vec_col)), 4))
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )
