"""kv_spans (operators/text_stats.py): label matching and key
normalization on hand-built documents — multi-word keys, the 40-char
label cap, value-empty drops, CRLF splits, and the zero-exchange plan."""

from pdf_extractors_spark import plans
from pdf_extractors_spark.operators import text_stats

_SCHEMA = "doc_id long, text string"


def _spans(spark, rows):
    return {
        (r["doc_id"], r["line_idx"]): (r["key"], r["value"])
        for r in text_stats.kv_spans(
            spark.createDataFrame(rows, _SCHEMA)
        ).collect()
    }


def test_labels_extracted_and_normalized(spark):
    rows = [
        (
            1,
            "Invoice Number: INV-7\n"
            "Total Amount Due: $5.00\n"
            "just prose here\n"
            "Notes:\n"  # empty value: a heading, dropped
            "  Indented: not a label (line starts with spaces)",
        ),
    ]
    got = _spans(spark, rows)
    assert got == {
        (1, 0): ("invoice_number", "INV-7"),
        (1, 1): ("total_amount_due", "$5.00"),
    }


def test_key_cap_and_colon_in_prose(spark):
    rows = [
        # 39-char label (fits the {0,38} tail) extracts
        (1, "A" + "b" * 38 + ": ok"),
        # 41-char label is prose with a colon
        (2, "A" + "b" * 40 + ": not extracted"),
        # URL-ish colon does not match (no space-free label rule —
        # 'https' IS a valid label shape, pinned here as accepted)
        (3, "https://example.com/x"),
    ]
    got = _spans(spark, rows)
    assert got == {
        (1, 0): ("a" + "b" * 38, "ok"),
        (3, 0): ("https", "//example.com/x"),
    }


def test_crlf_and_null_text(spark):
    rows = [(1, "Key One: v1\r\nKey Two: v2"), (2, None)]
    got = _spans(spark, rows)
    assert got == {
        (1, 0): ("key_one", "v1"),
        (1, 1): ("key_two", "v2"),
    }


def test_kv_plan_budget(spark):
    df = text_stats.kv_spans(
        spark.createDataFrame([(1, "K: v")], _SCHEMA)
    )
    a = plans.assert_plan(
        df, max_exchanges=0, no_single_partition=True, no_python=True
    )
    assert a.n_exchanges == 0, a.plan
