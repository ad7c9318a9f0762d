"""conv_forks: bounded-depth conversation regeneration/fork detection
(pipeline.conv_forks). Hand-built branch structures with exact expected
group rows, the null-text signature class, the depth cap, and the plan
budget (two exchanges, conv_id + rollup keys only, no Python)."""

from pyspark.sql import functions as F

from pdf_extractors_spark import pipeline, plans

_SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _t(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _by_key(df):
    return {
        (r["depth"], r["prefix_hash"]): (
            r["n_convs"],
            r["n_branches"],
            r["n_terminal"],
            r["is_fork"],
        )
        for r in df.collect()
    }


def test_fork_duplicate_and_unique_heads(spark):
    # A and C are verbatim duplicates; B shares their 2-turn head then
    # diverges; D shares nothing. Expected groups:
    #   depth 1 {A,B,C}: one continuation, no fork
    #   depth 2 {A,B,C}: two continuations -> fork
    #   depth 3 {A,C}:   both end here -> duplicate, not fork
    rows = [
        ("A", 0, "user", "hi"),
        ("A", 1, "assistant", "yo"),
        ("A", 2, "user", "more"),
        ("B", 0, "user", "hi"),
        ("B", 1, "assistant", "yo"),
        ("B", 2, "user", "other"),
        ("C", 0, "user", "hi"),
        ("C", 1, "assistant", "yo"),
        ("C", 2, "user", "more"),
        ("D", 0, "user", "different"),
    ]
    out = _by_key(pipeline.conv_forks(_t(spark, rows)))
    assert len(out) == 3
    by_depth = {d: v for (d, _h), v in out.items()}
    assert by_depth[1] == (3, 1, 0, False)
    assert by_depth[2] == (3, 2, 0, True)
    assert by_depth[3] == (2, 0, 2, False)


def test_fork_continue_vs_end_counts_as_fork(spark):
    # E continues past the shared head, F ends there: outcomes
    # {continuation, END} = 2 -> fork at the shared depth
    rows = [
        ("E", 0, "user", "q"),
        ("E", 1, "assistant", "a"),
        ("F", 0, "user", "q"),
    ]
    out = _by_key(pipeline.conv_forks(_t(spark, rows)))
    assert len(out) == 1
    ((depth, _h),) = out.keys()
    assert depth == 1
    assert out[(depth, _h)] == (2, 1, 1, True)


def test_null_text_and_role_form_one_signature_class(spark):
    # null text must group with empty text (coalesced signature), not
    # vanish or form per-null groups
    rows = [
        ("G", 0, "user", None),
        ("G", 1, "assistant", "x"),
        ("H", 0, "user", ""),
        ("H", 1, "assistant", "y"),
    ]
    out = _by_key(pipeline.conv_forks(_t(spark, rows)))
    by_depth = {d: v for (d, _h), v in out.items()}
    assert by_depth == {1: (2, 2, 0, True)}


def test_max_depth_caps_rows_and_sees_shared_continuation(spark):
    # two conversations identical for 6 turns, diverging at turn 7:
    # with max_depth=4 the fork is past the cap — rows stop at depth 4
    # and the cap row still knows both members CONTINUE identically
    rows = []
    for cid in ("P", "Q"):
        for i in range(6):
            rows.append((cid, i, "user", f"t{i}"))
        rows.append((cid, 6, "user", f"tail-{cid}"))
    out = pipeline.conv_forks(_t(spark, rows), max_depth=4)
    got = _by_key(out)
    assert set(d for d, _ in got) == {1, 2, 3, 4}
    for v in got.values():
        assert v == (2, 1, 0, False)


def test_conv_forks_plan_budget(spark):
    df = pipeline.conv_forks(
        _t(spark, [("A", 0, "user", "hi"), ("B", 0, "user", "hi")])
    )
    plans.assert_plan(
        df,
        max_exchanges=2,
        no_single_partition=True,
        no_python=True,
        shuffle_keys={"conv_id", "depth", "prefix_hash"},
    )


def test_conv_forks_partitioning_invariant(spark):
    rows = [
        (f"c{i % 7}", i // 7, "user", f"txt{i % 11}") for i in range(70)
    ]
    a = pipeline.conv_forks(_t(spark, rows).repartition(1))
    b = pipeline.conv_forks(_t(spark, rows).repartition(13))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
