"""render_chat / loss_mask_spans (operators/chat.py): deterministic
template rendering, suffix truncation semantics, and span correctness
pinned by slicing the rendered string."""

from pdf_extractors_spark.operators import chat

_SCHEMA = "conv_id string, turn_idx int, role string, text string"

_ROWS = [
    ("c1", 0, "user", "hello"),
    ("c1", 1, "assistant", "hi there"),
    ("c1", 2, "tool", "result"),
    ("c1", 3, "assistant", None),  # null text renders empty, turn kept
    ("c2", 0, "user", "solo"),
]


def _render(spark, rows, **kw):
    return {
        r["conv_id"]: (r["rendered"], r["n_turns"], r["n_chars"])
        for r in chat.render_chat(
            spark.createDataFrame(rows, _SCHEMA), **kw
        ).collect()
    }


def test_render_exact_string(spark):
    got = _render(spark, _ROWS)
    assert got["c2"][0] == "<|user|>\nsolo\n<|end|>\n"
    assert got["c1"][0] == (
        "<|user|>\nhello\n<|end|>\n"
        "<|assistant|>\nhi there\n<|end|>\n"
        "<|tool|>\nresult\n<|end|>\n"
        "<|assistant|>\n\n<|end|>\n"
    )
    assert got["c1"][1] == 4
    assert got["c1"][2] == len(got["c1"][0])


def test_render_order_independent_of_input_order(spark):
    shuffled = list(reversed(_ROWS))
    assert _render(spark, shuffled) == _render(spark, _ROWS)


def test_render_suffix_truncation(spark):
    # c1 segments: 23, 31, 24, 23 chars (oldest → newest).
    # budget 60 keeps the last two (23+24=47; adding 31 → 78 > 60)
    got = _render(spark, _ROWS, max_chars=60)
    assert got["c1"][0] == (
        "<|tool|>\nresult\n<|end|>\n" "<|assistant|>\n\n<|end|>\n"
    )
    assert got["c1"][1] == 2
    assert got["c2"][1] == 1  # untouched


def test_render_truncation_never_empties(spark):
    # budget smaller than even the last turn: keep exactly that turn
    got = _render(spark, _ROWS, max_chars=5)
    assert got["c1"][0] == "<|assistant|>\n\n<|end|>\n"
    assert got["c1"][1] == 1


def test_loss_mask_spans_slice_back_to_text(spark):
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    rendered = {
        r["conv_id"]: r["rendered"] for r in chat.render_chat(df).collect()
    }
    spans = chat.loss_mask_spans(df).collect()
    texts = {(r[0], r[1]): (r[3] or "") for r in _ROWS}
    assert {(s["conv_id"], s["turn_idx"]) for s in spans} == {
        ("c1", 1),
        ("c1", 3),
    }
    for s in spans:
        sliced = rendered[s["conv_id"]][s["span_start"] : s["span_end"]]
        assert sliced == texts[(s["conv_id"], s["turn_idx"])]


def test_loss_mask_other_target_role(spark):
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    spans = chat.loss_mask_spans(df, target_role="tool").collect()
    assert [(s["conv_id"], s["turn_idx"]) for s in spans] == [("c1", 2)]


def test_plans_chat(spark):
    from pdf_extractors_spark import plans

    df = spark.createDataFrame(_ROWS, _SCHEMA)
    # one conversation-keyed exchange; truncation window rides the same
    # partitioning (AQE may stage it as a reused exchange)
    a = plans.assert_plan(chat.render_chat(df), no_python=True)
    assert a.n_exchanges <= 1, a.plan
    a2 = plans.assert_plan(
        chat.render_chat(df, max_chars=100), no_python=True
    )
    assert a2.n_exchanges <= 2, a2.plan
    assert set(a2.shuffles_only_on) <= {"conv_id"}, a2.plan
    a3 = plans.assert_plan(chat.loss_mask_spans(df), no_python=True)
    assert a3.n_exchanges <= 1, a3.plan
