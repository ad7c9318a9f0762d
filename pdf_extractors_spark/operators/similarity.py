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

import pandas as pd
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


def kmeans_centroids(
    vectors: DataFrame,
    n: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means refinement of the deterministic seed centroids
    (``take_centroids``): iteratively assign (broadcast join) and re-mean
    per cell with ``aggregate``/``zip_with`` column math — no UDF, no
    collect of the big side. The driver loop holds only n centroid rows
    per iteration; each iteration is one broadcast-join pass over the
    vectors, the same cost profile at 100 TB as the final IVF assignment
    itself. Empty cells keep their previous centroid."""
    head = vectors.select(vec_col).first()
    if head is None:
        raise ValueError("kmeans_centroids: vectors DataFrame is empty")
    dim = len(head[0])
    cents = take_centroids(vectors, n, id_col, vec_col)
    for _ in range(iters):
        assigned = ivf_assign(vectors, cents, id_col, vec_col)
        # per-dimension algebraic sums (map-side combinable) — never
        # collect a cell's vectors into one row
        sums = assigned.groupBy("centroid_id").agg(
            *[
                F.sum(F.element_at(F.col(vec_col), d + 1)).alias(f"_s{d}")
                for d in range(dim)
            ],
            F.count("*").alias("_n"),
        )
        moved = sums.select(
            "centroid_id",
            F.array(
                *[(F.col(f"_s{d}") / F.col("_n")).cast("float") for d in range(dim)]
            ).alias(vec_col),
        )
        # empty cells: keep the old centroid (left join, coalesce)
        cents = (
            cents.select("centroid_id", F.col(vec_col).alias("_old"))
            .join(moved, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col(vec_col), F.col("_old")).alias(vec_col),
            )
        )
    return cents


def _rotation_planes(dim: int, n_planes: int, seed: int):
    """Seeded gaussian hyperplane matrix (dim × n_planes) — deterministic
    for a given (dim, n_planes, seed), so runs are reproducible and an
    oracle can replay the bucketing from the same literals."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_planes))


def signbit_buckets(
    vectors: DataFrame,
    bands: int = 4,
    rows: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation_seed: int | None = None,
    dim: int | None = None,
    cache: bool = True,
) -> DataFrame:
    """Hyperplane-LSH bucket keys for cosine similarity: band ``b`` hashes
    the vector to the sign pattern of components ``[b*rows, (b+1)*rows)``
    (axis-aligned hyperplanes — deterministic, so the DuckDB oracle can
    replay the bucketing bit-for-bit). Two vectors that agree on all
    ``rows`` signs of some band land in the same bucket for that band.

    Sizing: expected bucket occupancy is N / 2^rows per band, and
    candidate volume grows with occupancy² — pick rows ≈ log2(N / B)
    for target bucket size B. ``bands`` trades recall for cost.

    Vectors must have ≥ bands·rows dimensions: under Spark's ANSI mode
    (the session default) an out-of-range ``element_at`` FAILS the job
    with INVALID_ARRAY_INDEX — loud, not a silent all-zeros-key bucket
    collapse. Do not swap in ``try_element_at`` here.

    ``rotation_seed`` switches from axis-aligned planes to a seeded
    random gaussian hyperplane matrix — the recall-correct choice for
    real embeddings, whose components are axis-correlated (axis-aligned
    signs then collapse into a few mega-buckets: recall survives but
    candidate volume explodes). The projection runs as ONE Arrow-batched
    matmul per batch (pandas UDF) — the per-plane ``zip_with``
    formulation was rejected for the same reason simhash's per-bit form
    was: higher-order lambdas run interpreted and Catalyst does not CSE
    their bodies. Deterministic for a fixed seed under any partitioning.
    Pass ``dim`` explicitly when the vectors lineage is expensive —
    otherwise it is inferred with a one-row job.

    ``cache`` (rotation path only): the keyed frame feeds both sides of
    the downstream candidate self-join, so by default it is ``.cache()``d
    to run the matmul UDF once — the caller owns the lifetime (unpersist
    via ``df.sparkSession.catalog.clearCache()`` or keep the session
    short). Pass ``cache=False`` in long-lived sessions to recompute per
    consumer instead of accumulating executor storage (the same
    materialization contract as ``ngram_jaccard_pairs``)."""
    if rotation_seed is not None:
        from pyspark.sql.functions import pandas_udf

        if dim is None:
            first = vectors.select(vec_col).first()
            if first is None:
                return vectors.select(
                    id_col, F.lit(0).alias("band"), F.lit("").alias("key")
                ).limit(0)
            dim = len(first[0])
        planes = _rotation_planes(dim, bands * rows, rotation_seed)

        @pandas_udf("string")
        def _sign_key(v: pd.Series) -> pd.Series:
            import numpy as np

            mat = np.stack(v.to_numpy())
            bits = np.where(mat @ planes > 0, "1", "0")
            return pd.Series(["".join(row) for row in bits])

        # cached by default: the bucket table feeds both sides of the
        # candidate self-join, and this frame is tiny (id + bands·rows
        # chars per vector) — without it the matmul UDF runs twice over
        # the full vectors lineage. Lifetime is caller-owned (cache=).
        keyed = vectors.select(id_col, _sign_key(F.col(vec_col)).alias("_k"))
        if cache:
            keyed = keyed.cache()
        banded = [
            F.struct(
                F.lit(b).alias("band"),
                F.substring("_k", b * rows + 1, rows).alias("key"),
            )
            for b in range(bands)
        ]
        return keyed.select(
            id_col, F.explode(F.array(*banded)).alias("bk")
        ).select(id_col, "bk.band", "bk.key")
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(
                *[
                    F.when(
                        F.element_at(F.col(vec_col), b * rows + r + 1) > 0, F.lit("1")
                    ).otherwise(F.lit("0"))
                    for r in range(rows)
                ]
            ).alias("key"),
        )
        for b in range(bands)
    ]
    return vectors.select(
        id_col, F.explode(F.array(*entries)).alias("bk")
    ).select(id_col, "bk.band", "bk.key")


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    bands: int = 4,
    rows: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation_seed: int | None = None,
    dim: int | None = None,
    cache: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection, the scale path:

    1. **bucket** — sign-bit LSH (``signbit_buckets``): per-band equi-join
       on (band, key) yields candidate pairs only — never the all-pairs
       product, so at 100 TB the join cost tracks bucket occupancy, not N².
    2. **verify** — exact cosine (JVM-side ``zip_with``/``aggregate``,
       no UDF) on candidates; keep pairs with cosine ≥ ``threshold``.

    Returns (id_a, id_b, cos), id_a < id_b. The candidate join carries only
    (id, band, key); embeddings are re-joined for the (much smaller)
    verification, so shuffles never move vectors for non-candidates."""
    b = signbit_buckets(
        vectors, bands, rows, id_col, vec_col,
        rotation_seed=rotation_seed, dim=dim, cache=cache,
    )
    cand = (
        b.alias("l")
        .join(
            b.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", F.round(cosine(F.col("_va"), F.col("_vb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def with_flipped_copies(
    vectors: DataFrame,
    id_offset: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic near-duplicate planting for tests/benchmarks: union the
    input with a copy of every vector whose LAST component has its sign
    flipped (cosine = 1 - 2·v_d²/‖v‖² ≈ 0.97 for 64-dim vectors — near
    but never exactly 1). Copies get ``id + id_offset``."""
    d = F.size(F.col(vec_col))
    flipped = vectors.select(
        (F.col(id_col) + F.lit(id_offset)).alias(id_col),
        F.transform(
            F.col(vec_col), lambda x, i: F.when(i == d - 1, -x).otherwise(x)
        ).alias(vec_col),
    )
    return vectors.select(id_col, vec_col).unionByName(flipped)


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


def semdedup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by
    within-cluster pairwise cosine. Assign every vector to its nearest
    centroid (broadcast join, ``ivf_assign``), self-join each cell on
    ``centroid_id``, and mark for removal any vector that has a
    LOWER-id neighbor with cosine ≥ ``threshold`` in its cell — the
    deterministic greedy form of the paper's keep-one-per-group rule
    (same min-id-keeper convention as ``exact_dedup``).

    Returns (id, centroid_id, keep): the verdict table a pipeline joins
    back to the corpus, every input row present exactly once.

    Scale: the only shuffle of vector payloads is the single exchange on
    ``centroid_id``; the pairwise stage is an equi-join within cells, so
    cost is Σ|cell|² — bounded by the centroid count C, which is the
    operating knob (SemDeDup ran 11k clusters on LAION; size C ≈ N/B for
    target cell size B). Cells are verified with JVM-side column math
    (``zip_with``/``aggregate``), no UDF. For skewed cells, compose with
    ``signbit_buckets`` inside the cell — same candidate-then-verify
    shape as ``embedding_neardup_pairs``. Cosines are rounded to 4
    decimals BEFORE the threshold compare so verdicts are reproducible
    across engines (the DuckDB oracle replays them bit-for-bit).

    ``cache``: the assignment feeds three consumers (both sides of the
    pairwise join and the final verdict join) — by default it is
    ``.cache()``d so the broadcast-assign pass runs once, with the
    caller owning the lifetime (same materialization contract as
    ``signbit_buckets``/``ngram_jaccard_pairs``); pass ``cache=False``
    in long-lived sessions to recompute per consumer instead."""
    assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    if cache:
        assigned = assigned.cache()
    left = assigned.select(
        "centroid_id", F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    right = assigned.select(
        "centroid_id", F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    dropped = (
        left.join(right, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("_va"), F.col("_vb")), 4))
        .filter(F.col("cos") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        assigned.select(id_col, "centroid_id")
        .join(dropped, id_col, "left")
        .select(
            id_col,
            "centroid_id",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


def random_projection(
    vectors: DataFrame,
    k: int = 8,
    seed: int = 7919,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Seeded sign-matrix random projection to ``k`` dimensions
    (Achlioptas-style ±1 entries), entirely in native higher-order
    functions — zero UDFs, zero shuffles, one map-side pass.

    The input is quantized to integers (``floor(x * scale)``) before the
    matmul so the output is exact integer arithmetic: deterministic,
    engine-portable (bit-identical in any SQL engine), and insensitive
    to float summation order. The sign matrix is a pure function of
    (row index, output dim, seed): ``((i*1299721 + j*104729 + seed) %
    7919) % 2`` — no materialized matrix, no broadcast, nothing to ship
    to executors.

    At 100 TB this is the cheapest possible plan shape: a narrow
    per-row projection with no exchange at all; downstream LSH/ANN
    (`signbit_buckets`, `ivf_assign`) run on the reduced vectors.
    Output columns: ``id_col, proj_0..proj_{k-1}`` (bigint).
    """
    idx = F.sequence(F.lit(0), F.size(vec_col) - 1)
    quant = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
    )
    projections = []
    for j in range(k):
        sign = lambda i, j=j: F.when(
            ((i * F.lit(1299721) + F.lit(j * 104729 + seed)) % 7919) % 2 == 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(-1).cast("long"))
        proj = F.aggregate(
            F.zip_with(quant, idx, lambda q, i: q * sign(i.cast("long"))),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        projections.append(proj.alias(f"proj_{j}"))
    return vectors.select(F.col(id_col), *projections)


def embedding_stats(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Per-vector embedding QA — the sanity scan run on every embedding
    delivery before it reaches dedup/ANN: a broken encoder batch shows
    up as zero vectors, NaN components, or collapsed norms, and at
    10^12 rows nobody eyeballs parquet. All outputs are exact integers
    (the random_projection idiom: components quantize to
    ``floor(x·scale)`` before any arithmetic, so the numbers are
    engine-portable and summation-order-free).

    Per vector emits::

        dim       components (0 for a null embedding column)
        n_zeros   exactly-0.0 components
        n_bad     components that do not survive quantization —
                  NaN/Inf/null (floor→cast(long) nulls them)
        norm2_q   Σ quantized² over good components — 0 means the
                  zero/dead vector, collapsed values flag a batch
                  whose scale is wrong

    Pure higher-order-function column math: zero UDFs, zero exchanges,
    fuses into the scan."""
    vec = F.col(vec_col)

    def _q(x):
        d = x.cast("double")
        # explicit: the non-ANSI cast maps NaN->0 and Inf->Long.Max
        # SILENTLY, which would launder a broken component into a
        # plausible quantized value — bad components must null out
        bad = x.isNull() | F.isnan(d) | (F.abs(d) == F.lit(float("inf")))
        return F.when(~bad, F.floor(d * F.lit(scale)).cast("long"))

    quant = F.transform(vec, _q)
    return vectors.select(
        F.col(id_col),
        F.coalesce(F.size(vec), F.lit(0)).cast("long").alias("dim"),
        F.coalesce(
            F.size(F.filter(vec, lambda x: x == 0)), F.lit(0)
        )
        .cast("long")
        .alias("n_zeros"),
        (
            F.coalesce(F.size(vec), F.lit(0))
            - F.coalesce(
                F.size(F.filter(quant, lambda x: x.isNotNull())), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_bad"),
        F.coalesce(
            F.aggregate(
                quant,
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.coalesce(x * x, F.lit(0)),
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("norm2_q"),
    )


def centroid_shift(
    old: DataFrame,
    new: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Per-group embedding centroid drift between two corpus snapshots —
    the monitoring scan run after a re-embedding or encoder upgrade:
    a silently changed encoder shows up as every group's centroid
    rotating at once, a data regression as one group drifting alone.

    All arithmetic is on components quantized to ``floor(x·scale)``
    longs BEFORE any summation (the ``embedding_stats`` /
    ``random_projection`` idiom), so every output is summation-order-
    free and engine-portable. The count factors cancel inside centroid
    cosine — ``cos(Σo/n_o, Σn/n_n) == cos(Σo, Σn)`` — so the exact
    per-dim SUM vectors are compared directly, no division until the
    final scalar. NaN/Inf/null components null out of the quantization
    and contribute nothing (matching ``embedding_stats``' explicit-bad
    contract); null embedding rows contribute to no dimension and are
    not counted.

    Per group emits::

        n_old, n_new   vectors with a non-null embedding per snapshot
        dot_q          Σ_d sum_old_d · sum_new_d      (exact integer)
        norm2_old_q    Σ_d sum_old_d²                 (exact integer)
        norm2_new_q    Σ_d sum_new_d²                 (exact integer)
        cos_bp         floor(10⁴·dot/√(norm2_old·norm2_new)) — basis
                       points, null when either snapshot's sum vector
                       is zero/absent
        shift2_q       Σ_d (sum_old_d div n_old − sum_new_d div n_new)²
                       — squared L2 between the integer-division
                       centroids, in quantized units²

    Integer headroom: the binding constraint is the Σ_d sum² folds —
    with per-(group, snapshot) quantized mass ``S = n·scale·max|x|``
    per dimension, int64 needs ``dims·S² < 2⁶³``, i.e. ``S ≲ 3·10⁸``
    at 768 dims. Beyond that shrink ``scale`` (cos_bp and shift2_q are
    scale-invariant up to quantization granularity). At corpus scale
    groups are sources/shards, so per-group counts are the corpus
    divided by thousands, not the corpus; the final scalar division
    runs in double, on identical integers in any engine.

    Two exchanges: one groupBy on (group, dim) over the posexploded
    union (snapshots disambiguated by a tag column, map-side combined),
    one on group for the final fold. No joins, no UDFs."""

    def _q(x):
        d = x.cast("double")
        bad = x.isNull() | F.isnan(d) | (F.abs(d) == F.lit(float("inf")))
        return F.when(~bad, F.floor(d * F.lit(scale)).cast("long"))

    def _side(df: DataFrame, tag: int) -> DataFrame:
        return (
            df.filter(F.col(vec_col).isNotNull())
            .select(
                F.col(group_col).alias("grp"),
                F.lit(tag).alias("snap"),
                F.posexplode(F.transform(F.col(vec_col), _q)).alias(
                    "dim", "q"
                ),
            )
        )

    per_dim = (
        _side(old, 0)
        .unionByName(_side(new, 1))
        .groupBy("grp", "dim")
        .agg(
            F.sum(F.when(F.col("snap") == 0, F.col("q"))).alias("so"),
            F.sum(F.when(F.col("snap") == 1, F.col("q"))).alias("sn"),
            F.sum(
                F.when((F.col("snap") == 0) & (F.col("dim") == 0), 1)
                .otherwise(0)
            ).alias("cnt_o"),
            F.sum(
                F.when((F.col("snap") == 1) & (F.col("dim") == 0), 1)
                .otherwise(0)
            ).alias("cnt_n"),
        )
    )
    # group-level vector counts ride a window over the SAME grp
    # partitioning the final fold uses — the aggregate below reuses the
    # window's exchange, so the count never costs a join or a third
    # shuffle. (cnt_o/cnt_n are nonzero only on the dim-0 row, so the
    # window sum is exactly the per-snapshot vector count.)
    w = Window.partitionBy("grp")
    so = F.coalesce(F.col("so"), F.lit(0).cast("long"))
    sn = F.coalesce(F.col("sn"), F.lit(0).cast("long"))
    with_counts = per_dim.select(
        "grp",
        so.alias("so"),
        sn.alias("sn"),
        F.sum("cnt_o").over(w).cast("long").alias("n_old"),
        F.sum("cnt_n").over(w).cast("long").alias("n_new"),
    )
    # integer-division centroids: exact, engine-portable (div truncates
    # toward negative infinity differently per engine for negatives —
    # use floor-division semantics explicitly via `div` on both sides
    # of the oracle; Spark's `div` truncates toward zero, DuckDB's `//`
    # floors, so the SQL oracle mirrors Spark with trunc-division)
    c_old = F.when(F.col("n_old") > 0, F.expr("so div n_old")).otherwise(
        F.lit(0).cast("long")
    )
    c_new = F.when(F.col("n_new") > 0, F.expr("sn div n_new")).otherwise(
        F.lit(0).cast("long")
    )
    per_group = with_counts.groupBy("grp").agg(
        F.max("n_old").cast("long").alias("n_old"),
        F.max("n_new").cast("long").alias("n_new"),
        F.sum(F.col("so") * F.col("sn")).cast("long").alias("dot_q"),
        F.sum(F.col("so") * F.col("so")).cast("long").alias("norm2_old_q"),
        F.sum(F.col("sn") * F.col("sn")).cast("long").alias("norm2_new_q"),
        F.sum((c_old - c_new) * (c_old - c_new))
        .cast("long")
        .alias("shift2_q"),
    )
    return per_group.select(
        F.col("grp").alias(group_col),
        "n_old",
        "n_new",
        "dot_q",
        "norm2_old_q",
        "norm2_new_q",
        F.when(
            (F.col("norm2_old_q") > 0) & (F.col("norm2_new_q") > 0),
            F.floor(
                F.lit(10000.0)
                * F.col("dot_q").cast("double")
                / F.sqrt(
                    F.col("norm2_old_q").cast("double")
                    * F.col("norm2_new_q").cast("double")
                )
            ).cast("long"),
        ).alias("cos_bp"),
        "shift2_q",
    )


def quantize_int8(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the storage
    path for a 100-TB vector store: 4x less scan IO than float32 and
    integer dot products downstream, at a recall cost the pytest recall
    gate pins. Per vector: components quantize to micro-units
    (``floor(x·scale)``, the embedding_stats idiom — one floor, then
    integer math only, so every output is engine-portable and
    summation-order-free), the max |micro-unit| becomes the per-vector
    scale, and each code is ``sign(q)·(|q|·127 div m)`` — positive
    operands on both sides of the division, because Spark ``div``
    truncates while DuckDB ``//`` floors and they disagree below zero.
    (The division runs in double and truncates; with |q|·127 ≤ ~1e11 a
    non-integer rational a/b with b ≤ 1e9 sits ≥ 1/b ≫ ulp away from
    any integer, so the truncated double equals exact integer division
    — same argument as the quality_score half-up divisions.)

    Emits ``(vec_id, dim, n_bad, scale_q, codes array<int> in
    [-127,127])``. NaN/Inf/null components become NULL codes and count
    in ``n_bad`` — nulled loudly, never laundered into a plausible 0
    (the embedding_stats stance); screen with ``n_bad = 0`` before
    ANN. The all-zero vector keeps scale_q 0 and all-zero codes.

    Pure higher-order-function column math: zero UDFs, zero exchanges,
    fuses into the scan. Dequantization is ``code · scale_q / 127``
    per component; int8 cosine is exact integer Σ ca·cb over two
    codes arrays."""
    vec = F.col(vec_col)

    def _q(x):
        d = x.cast("double")
        bad = x.isNull() | F.isnan(d) | (F.abs(d) == F.lit(float("inf")))
        return F.when(~bad, F.floor(d * F.lit(scale)).cast("long"))

    # staged projections: HOF lambdas don't whole-stage-codegen and
    # Catalyst doesn't CSE identical transform() trees across output
    # columns — naming the micro-unit array once saves re-evaluating it
    # per output (measured ~25% at sf0.1, value-identical)
    s1 = vectors.select(
        F.col(id_col), vec.alias("_v"), F.transform(vec, _q).alias("_q")
    )
    s2 = s1.select(
        id_col,
        "_v",
        "_q",
        F.coalesce(
            F.array_max(F.transform("_q", lambda q: F.abs(q))), F.lit(0)
        ).alias("_m"),
    )
    safe_m = F.greatest(F.col("_m"), F.lit(1))
    return s2.select(
        F.col(id_col),
        F.coalesce(F.size("_v"), F.lit(0)).cast("long").alias("dim"),
        F.coalesce(
            F.size(F.filter("_q", lambda q: q.isNull())), F.lit(0)
        )
        .cast("long")
        .alias("n_bad"),
        F.col("_m").cast("long").alias("scale_q"),
        F.transform(
            "_q",
            lambda q: F.when(q.isNotNull(), (
                F.signum(q).cast("long")
                * ((F.abs(q) * F.lit(127)) / safe_m).cast("long")
            ).cast("int")),
        ).alias("codes"),
    )
