"""url_frontier (operators/urls.py): per-host politeness waves —
priority ordering with url tiebreak, null-priority-last, the per-host
cap, host extraction edge cases, and the single host-partitioned
window in the plan."""

from pdf_extractors_spark import plans
from pdf_extractors_spark.operators import urls

_SCHEMA = "url string, priority long"


def _waves(spark, rows, **kw):
    return {
        r["url"]: (r["host"], r["wave"])
        for r in urls.url_frontier(
            spark.createDataFrame(rows, _SCHEMA), **kw
        ).collect()
    }


def test_politeness_waves(spark):
    rows = [
        ("https://a.com/low", 1),
        ("https://a.com/high", 9),
        ("https://a.com/mid", 5),
        ("https://b.com/only", 1),
    ]
    got = _waves(spark, rows)
    assert got == {
        "https://a.com/high": ("a.com", 1),
        "https://a.com/mid": ("a.com", 2),
        "https://a.com/low": ("a.com", 3),
        "https://b.com/only": ("b.com", 1),
    }


def test_tiebreak_and_null_priority_last(spark):
    rows = [
        ("https://a.com/z", 5),
        ("https://a.com/a", 5),
        ("https://a.com/unscored", None),
    ]
    got = _waves(spark, rows)
    assert got["https://a.com/a"] == ("a.com", 1)
    assert got["https://a.com/z"] == ("a.com", 2)
    assert got["https://a.com/unscored"] == ("a.com", 3)


def test_per_host_cap_and_dirty_urls(spark):
    rows = [("https://a.com/%d" % i, 10 - i) for i in range(5)] + [
        (None, 1),
        ("not-a-url", 1),
        ("HTTPS://UP.example.COM/x", 1),  # host lowercased
    ]
    got = _waves(spark, rows, per_host_cap=2)
    assert set(got) == {
        "https://a.com/0",
        "https://a.com/1",
        "HTTPS://UP.example.COM/x",
    }
    assert got["HTTPS://UP.example.COM/x"] == ("up.example.com", 1)


def test_plan_single_host_window(spark):
    df = spark.createDataFrame([("https://a.com/x", 1)], _SCHEMA)
    out = urls.url_frontier(df)
    a = plans.assert_plan(
        out, max_exchanges=1, no_single_partition=True, no_python=True
    )
    assert a.n_exchanges <= 1, a.plan
