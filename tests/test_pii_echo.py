"""pii_echo: user-typed PII re-emitted verbatim by later assistant
turns (pipeline.pii_echo). Hand-built conversations with known echo
structure, ordering (echo BEFORE the user turn does not count),
multi-echo counting, never-echoed zeros, and the plan budget."""

from pdf_extractors_spark import pipeline, plans

_SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _t(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _by_key(df):
    return {
        (r["conv_id"], r["kind"], r["value"]): (
            r["first_user_turn"],
            r["n_echoes"],
            r["first_echo_turn"],
        )
        for r in df.collect()
    }


def test_echo_counting_and_ordering(spark):
    rows = [
        # echo BEFORE the user turn: does not count
        ("A", 0, "assistant", "mail bob@x.io first"),
        ("A", 1, "user", "I am bob@x.io"),
        ("A", 2, "assistant", "ok bob@x.io noted, again bob@x.io"),
        ("A", 3, "assistant", "bye bob@x.io"),
        # never echoed
        ("B", 0, "user", "ip 10.0.0.7 here"),
        ("B", 1, "assistant", "no address repeated"),
    ]
    got = _by_key(pipeline.pii_echo(_t(spark, rows)))
    # turn 2 carries TWO matches of the value — both count
    assert got[("A", "email", "bob@x.io")] == (1, 3, 2)
    assert got[("B", "ipv4", "10.0.0.7")] == (0, 0, None)
    assert len(got) == 2


def test_value_equality_is_per_conversation(spark):
    # the same value in another conversation's assistant turn is NOT an
    # echo — the join is keyed on conv_id too
    rows = [
        ("C", 0, "user", "c@x.io"),
        ("D", 1, "assistant", "c@x.io"),
    ]
    got = _by_key(pipeline.pii_echo(_t(spark, rows)))
    assert got == {("C", "email", "c@x.io"): (0, 0, None)}


def test_assistant_only_pii_produces_no_rows(spark):
    # PII the user never typed is out of scope for the propagation
    # audit (that's pii_scrub/pii_spans' job)
    rows = [("E", 0, "assistant", "see 10.1.2.3")]
    assert pipeline.pii_echo(_t(spark, rows)).count() == 0


def test_null_text_and_duplicate_user_mentions(spark):
    rows = [
        ("F", 0, "user", None),
        ("F", 1, "user", "x@y.zz and x@y.zz twice"),
        ("F", 2, "user", "x@y.zz again"),
        ("F", 3, "assistant", "x@y.zz"),
    ]
    got = _by_key(pipeline.pii_echo(_t(spark, rows)))
    # duplicates across/within user turns collapse to one row keyed at
    # the FIRST carrying turn
    assert got == {("F", "email", "x@y.zz"): (1, 1, 3)}


def test_pii_echo_plan_budget(spark):
    df = pipeline.pii_echo(
        _t(spark, [("A", 0, "user", "a@b.cc"), ("A", 1, "assistant", "a@b.cc")])
    )
    a = plans.assert_plan(
        df,
        no_single_partition=True,
        no_python=True,
        shuffle_keys={"conv_id", "kind", "value"},
    )
    # explode+groupBy on the user side, join shuffle per side; the
    # post-join rollup must REUSE the join partitioning, not re-shuffle
    assert a.n_exchanges <= 3, a.plan
