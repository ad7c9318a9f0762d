"""response_length_drift + tool_chain_topk (pipeline.py): exact bucket
stats including the terminal-bucket fold, empty-response drag, chain
ordering/truncation semantics, top-k tie-breaks, and plan budgets."""

from pdf_extractors_spark import pipeline, plans

_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string"
)


def _t(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


# ---------------------------------------------------------------- drift


def _drift(df):
    return {
        r["turn_bucket"]: (
            r["n_turns"],
            r["total_chars"],
            r["max_chars"],
            r["avg_chars_x100"],
        )
        for r in df.collect()
    }


def test_drift_buckets_cap_and_average(spark):
    rows = [
        # bucket 0 (turn_idx 0-3): lengths 10 and 0 (null drags)
        ("A", 1, "assistant", "x" * 10, None),
        ("A", 3, "assistant", None, None),
        # bucket 1 (turn_idx 4-7)
        ("A", 5, "assistant", "y" * 7, None),
        # deep turns fold into the terminal bucket 7 (idx >= 28)
        ("A", 40, "assistant", "z" * 3, None),
        ("B", 99, "assistant", "w" * 5, None),
        # non-assistant rows are out of scope
        ("A", 0, "user", "u" * 100, None),
    ]
    got = _drift(pipeline.response_length_drift(_t(spark, rows)))
    assert got[0] == (2, 10, 10, 500)
    assert got[1] == (1, 7, 7, 700)
    assert got[7] == (2, 8, 5, 400)
    assert len(got) == 3


def test_drift_bucket_geometry_is_configurable(spark):
    rows = [("A", i, "assistant", "x", None) for i in range(6)]
    got = _drift(
        pipeline.response_length_drift(
            _t(spark, rows), bucket_size=2, n_buckets=3
        )
    )
    assert {b: v[0] for b, v in got.items()} == {0: 2, 1: 2, 2: 2}


def test_drift_plan_budget(spark):
    df = pipeline.response_length_drift(
        _t(spark, [("A", 0, "assistant", "x", None)])
    )
    a = plans.assert_plan(
        df,
        no_single_partition=True,
        no_python=True,
        shuffle_keys={"turn_bucket"},
    )
    assert a.n_exchanges <= 1, a.plan


# ---------------------------------------------------------------- chains


def _chains(df):
    return [(r["chain"], r["n_convs"]) for r in df.collect()]


def test_chain_order_count_and_tiebreak(spark):
    rows = [
        # A and B share the motif search>fetch (order by turn_idx,
        # not input order)
        ("A", 4, "tool", "", "fetch"),
        ("A", 2, "tool", "", "search"),
        ("B", 0, "tool", "", "search"),
        ("B", 1, "tool", "", "fetch"),
        # C: singleton chain; D: null tool name folds to '?'
        ("C", 0, "tool", "", "answer"),
        ("D", 0, "tool", "", None),
        # assistant/user rows never join a chain
        ("A", 3, "assistant", "x", None),
    ]
    got = _chains(pipeline.tool_chain_topk(_t(spark, rows)))
    # top by count first, then ties by chain string ascending
    # ('?' sorts before 'answer')
    assert got == [
        ("search>fetch", 2),
        ("?", 1),
        ("answer", 1),
    ]


def test_chain_truncation_marks_capped_conversations(spark):
    rows = [("A", i, "tool", "", "t") for i in range(5)]
    got = _chains(pipeline.tool_chain_topk(_t(spark, rows), max_calls=3))
    assert got == [("t>t>t>…", 1)]
    # a genuinely-3-call chain never collides with the capped one
    rows3 = [("B", i, "tool", "", "t") for i in range(3)]
    got3 = _chains(pipeline.tool_chain_topk(_t(spark, rows3), max_calls=3))
    assert got3 == [("t>t>t", 1)]


def test_chain_topk_limit(spark):
    rows = [
        (f"C{i}", 0, "tool", "", f"tool{i:02d}") for i in range(10)
    ]
    got = _chains(pipeline.tool_chain_topk(_t(spark, rows), k=4))
    # all counts tie at 1 -> lexicographic chain order decides
    assert got == [
        ("tool00", 1), ("tool01", 1), ("tool02", 1), ("tool03", 1),
    ]


def test_chain_plan_budget(spark):
    df = pipeline.tool_chain_topk(
        _t(spark, [("A", 0, "tool", "", "t")])
    )
    a = plans.assert_plan(
        df,
        no_python=True,
        shuffle_keys={"conv_id", "chain"},
    )
    # conv groupBy + chain groupBy + the top-k ordering
    assert a.n_exchanges <= 3, a.plan
