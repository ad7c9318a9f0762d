"""retry_similarity + pii_linkage (pipeline.py): hand-built
conversations with exact expected pair Jaccards and linkage groups,
the empty-token and null-text edge classes, the role scope, the
n_convs floor/cap, and the plan budgets."""

from pdf_extractors_spark import pipeline, plans

_SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _t(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


# ---------------------------------------------------------------- retry


def _pairs(df):
    return {
        (r["conv_id"], r["turn_idx"]): (
            r["prev_turn_idx"],
            r["role"],
            r["n_tokens"],
            r["n_prev_tokens"],
            r["n_common"],
            r["jaccard_bp"],
        )
        for r in df.collect()
    }


def test_retry_pairs_and_exact_jaccard(spark):
    rows = [
        ("A", 0, "user", "hello there"),
        # same-role consecutive: exact duplicate -> 10000
        ("A", 1, "assistant", "a b c"),
        ("A", 2, "assistant", "a b c"),
        # same-role again: {a,b,c} vs {a,b,c,d} -> 3/4 -> 7500
        ("A", 3, "assistant", "a b c d"),
        # role flips: (3,4) is NOT a pair
        ("A", 4, "user", "a b c d"),
    ]
    got = _pairs(pipeline.retry_similarity(_t(spark, rows)))
    assert got == {
        ("A", 2): (1, "assistant", 3, 3, 3, 10000),
        ("A", 3): (2, "assistant", 4, 3, 3, 7500),
    }


def test_retry_tokens_distinct_lowercased_whitespace(spark):
    # duplicates within a turn collapse; case folds; runs of whitespace
    # are one separator
    rows = [
        ("B", 0, "user", "Foo  foo\tBAR"),
        ("B", 1, "user", "bar baz"),
    ]
    got = _pairs(pipeline.retry_similarity(_t(spark, rows)))
    # {foo,bar} vs {bar,baz}: common 1, union 3 -> 3333
    assert got == {("B", 1): (0, "user", 2, 2, 1, 3333)}


def test_retry_empty_and_null_text_classes(spark):
    rows = [
        # both empty (null and "") -> identical emptiness -> 10000
        ("C", 0, "assistant", None),
        ("C", 1, "assistant", ""),
        # one empty, one not -> 0
        ("C", 2, "assistant", "words here"),
    ]
    got = _pairs(pipeline.retry_similarity(_t(spark, rows)))
    assert got[("C", 1)] == (0, "assistant", 0, 0, 0, 10000)
    assert got[("C", 2)] == (1, "assistant", 2, 0, 0, 0)


def test_retry_role_scope(spark):
    rows = [
        ("D", 0, "user", "x"),
        ("D", 1, "user", "x"),
        ("D", 2, "assistant", "y"),
        ("D", 3, "assistant", "y"),
    ]
    all_roles = _pairs(pipeline.retry_similarity(_t(spark, rows)))
    assert set(all_roles) == {("D", 1), ("D", 3)}
    scoped = _pairs(
        pipeline.retry_similarity(_t(spark, rows), role="assistant")
    )
    assert set(scoped) == {("D", 3)}


def test_retry_plan_budget(spark):
    df = pipeline.retry_similarity(
        _t(spark, [("A", 0, "user", "a"), ("A", 1, "user", "a")])
    )
    a = plans.assert_plan(
        df,
        no_single_partition=True,
        no_python=True,
        shuffle_keys={"conv_id"},
    )
    # one window exchange on conv_id, nothing else
    assert a.n_exchanges <= 1, a.plan


# -------------------------------------------------------------- linkage


def _links(df):
    return {
        (r["kind"], r["value"]): (
            r["n_convs"],
            r["n_mentions"],
            r["first_conv"],
            r["last_conv"],
        )
        for r in df.collect()
    }


def test_linkage_floor_exemplars_and_mentions(spark):
    rows = [
        # shared email across three convs; twice-mentioned in A
        ("A", 0, "user", "mail me p@q.io and again p@q.io"),
        ("B", 0, "user", "p@q.io"),
        ("C", 3, "user", "see p@q.io"),
        # singleton value: dropped by the n_convs >= 2 floor
        ("A", 1, "user", "only 10.0.0.9 once"),
        # assistant-typed PII never links (user turns only)
        ("D", 0, "assistant", "p@q.io"),
    ]
    got = _links(pipeline.pii_linkage(_t(spark, rows)))
    assert got == {("email", "p@q.io"): (3, 4, "A", "C")}


def test_linkage_max_convs_cap_drops_boilerplate(spark):
    rows = [
        (c, 0, "user", "support@corp.example") for c in ("A", "B", "C")
    ] + [("A", 1, "user", "me@solo.io"), ("B", 1, "user", "me@solo.io")]
    got = _links(pipeline.pii_linkage(_t(spark, rows), max_convs=2))
    # the 3-conv value exceeds the cap and is dropped as boilerplate
    assert got == {("email", "me@solo.io"): (2, 2, "A", "B")}


def test_linkage_same_conv_repeats_are_one_conv(spark):
    rows = [
        ("A", 0, "user", "x@y.zz"),
        ("A", 5, "user", "x@y.zz again"),
    ]
    assert pipeline.pii_linkage(_t(spark, rows)).count() == 0


def test_linkage_plan_budget(spark):
    df = pipeline.pii_linkage(
        _t(spark, [("A", 0, "user", "a@b.cc"), ("B", 0, "user", "a@b.cc")])
    )
    a = plans.assert_plan(
        df,
        no_single_partition=True,
        no_python=True,
        shuffle_keys={"kind", "value", "conv_id"},
    )
    # (kind,value,conv_id) groupBy then (kind,value) rollup
    assert a.n_exchanges <= 2, a.plan
