"""sorted_neighborhood_pairs (operators/joins.py): within-bucket
neighbor pairs, cross-boundary pairs with the distance condition, the
documented sparse-bucket drop (pairs spanning two boundaries), null-key
rows, the window<2 guard, and the plan budget (the only SinglePartition
window runs over bucket NAMES, so the corpus-side plan stays bounded)."""

import pytest

from pdf_extractors_spark import plans
from pdf_extractors_spark.operators import joins

_SCHEMA = "doc_id long, block_key string"


def _pairs(spark, rows, **kw):
    return {
        (r["id_a"], r["id_b"], r["gap"])
        for r in joins.sorted_neighborhood_pairs(
            spark.createDataFrame(rows, _SCHEMA),
            key_col="block_key",
            **kw,
        ).collect()
    }


def test_within_and_boundary_pairs(spark):
    rows = [
        (1, "aa1"), (2, "aa2"), (3, "aa3"),  # bucket aa
        (4, "ab1"),                          # bucket ab (sparse: 1 row)
        (5, "ac1"),                          # bucket ac
    ]
    got = _pairs(spark, rows, window=3, bucket_len=2)
    # global order 1,2,3,4,5; true SN(3) would add (3,5,2), but that
    # pair spans TWO boundaries (aa→ab→ac) through the 1-row bucket ab
    # — the documented approximation drops it
    assert got == {
        (1, 2, 1), (1, 3, 2), (2, 3, 1),   # within aa
        (2, 4, 2), (3, 4, 1),              # aa → ab boundary
        (4, 5, 1),                         # ab → ac boundary
    }


def test_key_ties_break_on_id(spark):
    rows = [(7, "aax"), (3, "aax"), (5, "aax")]
    got = _pairs(spark, rows, window=2, bucket_len=2)
    # order on (key, id): 3, 5, 7 — adjacent pairs only (window 2)
    assert got == {(3, 5, 1), (5, 7, 1)}


def test_null_keys_dropped(spark):
    rows = [(1, "aa1"), (2, None), (3, "aa2")]
    got = _pairs(spark, rows, window=2, bucket_len=2)
    assert got == {(1, 3, 1)}


def test_window_guard(spark):
    df = spark.createDataFrame([(1, "aa")], _SCHEMA)
    with pytest.raises(ValueError, match="window"):
        joins.sorted_neighborhood_pairs(df, key_col="block_key", window=1)


def test_plan_budget(spark):
    df = spark.createDataFrame([(1, "aa"), (2, "ab")], _SCHEMA)
    out = joins.sorted_neighborhood_pairs(
        df, key_col="block_key", window=3
    )
    # the bucket-successor window is SinglePartition by design (bucket
    # names only), so no_single_partition is NOT asserted; the corpus
    # side must stay within a bounded exchange budget
    a = plans.assert_plan(out, max_exchanges=8, no_python=True)
    assert a.n_exchanges <= 8, a.plan
