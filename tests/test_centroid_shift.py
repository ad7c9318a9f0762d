"""centroid_shift: per-group embedding centroid drift between two
snapshots (operators/similarity.py). Hand-computed integer outputs,
bad-component and null-vector handling, identity drift, plan budget
(two exchanges, no Python), partitioning invariance."""

from pyspark.sql import functions as F

from pdf_extractors_spark import plans
from pdf_extractors_spark.operators.similarity import centroid_shift

_SCHEMA = "vec_id long, embedding array<float>, label int"


def _rows(df):
    return {r["label"]: r.asDict() for r in df.collect()}


def test_hand_computed_drift_and_counts(spark):
    old = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [0.0, 2.0], 1)],
        _SCHEMA,
    )
    new = spark.createDataFrame(
        [(4, [0.0, 1.0], 0), (5, [float("nan"), 2.0], 1), (6, None, 1)],
        _SCHEMA,
    )
    got = _rows(centroid_shift(old, new))
    # label 0: sums old=(2000,0) new=(0,1000) -> orthogonal centroids
    assert got[0] == {
        "label": 0, "n_old": 2, "n_new": 1, "dot_q": 0,
        "norm2_old_q": 4_000_000, "norm2_new_q": 1_000_000,
        "cos_bp": 0, "shift2_q": 2_000_000,
    }
    # label 1: vec 5's NaN dim nulls out but the vector still counts;
    # vec 6 (null embedding) contributes nothing and is not counted
    assert got[1] == {
        "label": 1, "n_old": 1, "n_new": 1, "dot_q": 4_000_000,
        "norm2_old_q": 4_000_000, "norm2_new_q": 4_000_000,
        "cos_bp": 10_000, "shift2_q": 0,
    }


def test_identical_snapshots_are_zero_drift(spark):
    df = spark.createDataFrame(
        [(i, [0.5 * i, -1.25, 3.0], i % 3) for i in range(1, 31)], _SCHEMA
    )
    for r in centroid_shift(df, df).collect():
        assert r["n_old"] == r["n_new"]
        assert r["shift2_q"] == 0
        assert r["cos_bp"] == 10_000
        assert r["norm2_old_q"] == r["norm2_new_q"]


def test_group_absent_from_one_snapshot_gets_null_cos(spark):
    old = spark.createDataFrame([(1, [1.0, 1.0], 7)], _SCHEMA)
    new = spark.createDataFrame([(2, [1.0, 1.0], 8)], _SCHEMA)
    got = _rows(centroid_shift(old, new))
    assert got[7]["n_new"] == 0 and got[7]["cos_bp"] is None
    assert got[8]["n_old"] == 0 and got[8]["cos_bp"] is None
    # one-sided shift is the present side's own quantized centroid mass
    assert got[7]["shift2_q"] == 2_000_000
    assert got[8]["shift2_q"] == 2_000_000


def test_negative_components_truncate_like_spark_div(spark):
    # so = -3000 over 2 vectors: -3000 div 2 = -1500 exactly; the
    # odd-sum case (-3001 div 2 = -1500, trunc toward zero) is the one
    # that would expose floor-division drift vs the oracle
    old = spark.createDataFrame(
        [(1, [-1.5005], 0), (2, [-1.5005], 0)], _SCHEMA
    )
    new = spark.createDataFrame([(3, [0.0], 0)], _SCHEMA)
    r = centroid_shift(old, new).collect()[0]
    # floor(-1.5005 * 1000) = -1501 per vector -> so = -3002
    assert r["norm2_old_q"] == 3002 * 3002
    assert r["shift2_q"] == 1501 * 1501


def test_plan_budget_two_exchanges_no_python(spark):
    df = spark.createDataFrame([(1, [1.0], 0)], _SCHEMA)
    plans.assert_plan(
        centroid_shift(df, df),
        max_exchanges=2,
        no_single_partition=True,
        no_python=True,
    )


def test_partitioning_invariant(spark):
    rows = [
        (i, [float(i % 5) - 2.0, 0.25 * (i % 7)], i % 4)
        for i in range(1, 101)
    ]
    a = spark.createDataFrame(rows, _SCHEMA)
    out1 = centroid_shift(a.repartition(1), a.repartition(3))
    out2 = centroid_shift(a.repartition(17), a.repartition(2))
    assert sorted(map(tuple, out1.collect())) == sorted(
        map(tuple, out2.collect())
    )
