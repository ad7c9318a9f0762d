"""amounts_extract (operators/text_stats.py): exact cent normalization
across the amount shapes (thousands commas, 1-2 digit fractions, bare
dollars, sub-dollar), occurrence ordering, the no-match empty output,
and the zero-exchange plan budget."""

from pdf_extractors_spark import plans
from pdf_extractors_spark.operators import text_stats

_SCHEMA = "doc_id long, text string"


def _rows(spark, rows):
    return [
        (r["doc_id"], r["match_idx"], r["raw"], r["cents"])
        for r in text_stats.amounts_extract(
            spark.createDataFrame(rows, _SCHEMA)
        )
        .orderBy("doc_id", "match_idx")
        .collect()
    ]


def test_cent_normalization_shapes(spark):
    got = _rows(
        spark,
        [
            (1, "total $1,234.56 due"),
            (2, "fee $7.5 charged"),
            (3, "paid $10 and $0.99"),
            (4, "no amounts here"),
            (5, None),
        ],
    )
    assert got == [
        (1, 0, "$1,234.56", 123456),
        (2, 0, "$7.5", 750),
        (3, 0, "$10", 1000),
        (3, 1, "$0.99", 99),
    ]


def test_match_idx_orders_occurrences(spark):
    got = _rows(spark, [(1, "$1 then $2.00 then $3,000")])
    assert got == [
        (1, 0, "$1", 100),
        (1, 1, "$2.00", 200),
        (1, 2, "$3,000", 300000),
    ]


def test_third_fraction_digit_is_not_consumed(spark):
    # the pattern takes at most two fraction digits; '$1.234' matches
    # '$1.23' and leaves the trailing '4' — pinned so the regex can't
    # drift silently
    got = _rows(spark, [(1, "rate $1.234 per unit")])
    assert got == [(1, 0, "$1.23", 123)]


def test_amounts_plan_budget(spark):
    df = text_stats.amounts_extract(
        spark.createDataFrame([(1, "$1")], _SCHEMA)
    )
    a = plans.assert_plan(
        df, max_exchanges=0, no_single_partition=True, no_python=True
    )
    assert a.n_exchanges == 0, a.plan
