"""quantize_int8 (operators/similarity.py): hand-computed codes, the
NaN/Inf/null → NULL-code (never 0) contract, the all-zero vector, the
zero-exchange plan, and an end-to-end recall gate — int8 cosine top-5
must recover ≥ 0.9 of float cosine top-5 on the sf0.001 embeddings."""

import math

from pyspark.sql import functions as F

from pdf_extractors_spark import plans
from pdf_extractors_spark.operators import similarity

_SCHEMA = "vec_id long, embedding array<float>"


def _rows(spark, data, **kw):
    return {
        r["vec_id"]: (r["dim"], r["n_bad"], r["scale_q"], r["codes"])
        for r in similarity.quantize_int8(
            spark.createDataFrame(data, _SCHEMA), **kw
        ).collect()
    }


def test_hand_computed_codes(spark):
    got = _rows(spark, [(1, [0.5, -1.0, 0.25, 0.0])])
    # micro-units: [500000, -1000000, 250000, 0]; m = 1000000
    # codes: (500000*127) div 1e6 = 63; 127; (250000*127) div 1e6 = 31
    assert got == {1: (4, 0, 1000000, [63, -127, 31, 0])}


def test_bad_components_null_not_zero(spark):
    got = _rows(
        spark,
        [(1, [float("nan"), 1.0, float("inf"), None, -0.5])],
    )
    dim, n_bad, scale_q, codes = got[1]
    assert (dim, n_bad, scale_q) == (5, 3, 1000000)
    assert codes == [None, 127, None, None, -63]
    # -0.5 → floor(-500000) = -500000 → -1 * (500000*127 div 1e6) = -63


def test_zero_and_null_vectors(spark):
    got = _rows(spark, [(1, [0.0, 0.0]), (2, None)])
    assert got[1] == (2, 0, 0, [0, 0])
    assert got[2] == (0, 0, 0, None)


def test_negative_floor_convention(spark):
    # floor(-0.3 * 1e6) with float32 widening: -0.3f widens to
    # -0.30000001192..., floor → -300001 (NOT -300000) — pinned so the
    # oracle's identical widening is load-bearing, not accidental
    got = _rows(spark, [(1, [-0.3, 1.0])])
    assert got[1][3][0] == -(300001 * 127 // 10**6)


def test_plan_zero_exchanges(spark):
    df = similarity.quantize_int8(
        spark.createDataFrame([(1, [0.1])], _SCHEMA)
    )
    a = plans.assert_plan(
        df, max_exchanges=0, no_single_partition=True, no_python=True
    )
    assert a.n_exchanges == 0, a.plan


def test_int8_recall_vs_float(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb = emb.filter("vec_id < 60").select("vec_id", "embedding")
    queries = [r for r in emb.filter("vec_id < 5").collect()]
    base = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def topk(vecs, qv, k=5):
        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return d / (na * nb) if na and nb else 0.0

        scored = sorted(
            ((cos(v, qv), vid) for vid, v in vecs.items()),
            key=lambda t: (-t[0], t[1]),
        )
        return [vid for _, vid in scored[:k]]

    qz = {
        r["vec_id"]: (r["scale_q"], r["codes"])
        for r in similarity.quantize_int8(emb).collect()
    }
    hits = total = 0
    for q in queries:
        float_top = set(topk(base, q["embedding"]))
        int8_vecs = {vid: c for vid, (_, c) in qz.items()}
        int8_top = set(topk(int8_vecs, int8_vecs[q["vec_id"]]))
        hits += len(float_top & int8_top)
        total += len(float_top)
    assert hits / total >= 0.9, f"int8 recall {hits}/{total}"
