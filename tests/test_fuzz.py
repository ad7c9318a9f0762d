"""Robustness fuzzing: every extractor must survive arbitrary text without
raising (the dispatch layer quarantines per-row failures, but extractors
should not rely on it for ordinary garbage), and must be deterministic.

Uses hypothesis with a bounded example budget so the suite stays fast.
"""

import json

from hypothesis import given, settings, strategies as st

from pdf_extractors_spark.extractors import dispatch
from pdf_extractors_spark.fixtures import payloads

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=60, deadline=None)
@given(kind=st.sampled_from(payloads.FAMILIES), text=TEXT)
def test_extractors_never_crash_on_garbage(kind, text):
    out = dispatch.extract_one(kind, text)
    assert set(out) == {"extracted_text", "spans", "records", "parse_errors"}
    json.dumps(out["records"])  # records must stay JSON-serializable


@settings(max_examples=30, deadline=None)
@given(kind=st.sampled_from(payloads.FAMILIES), text=TEXT)
def test_extractors_deterministic(kind, text):
    a = dispatch.extract_one(kind, text)
    b = dispatch.extract_one(kind, text)
    assert a == b


@settings(max_examples=25, deadline=None)
@given(
    conv=st.integers(min_value=0, max_value=10**6),
    turn=st.integers(min_value=0, max_value=5000),
    kind=st.sampled_from(payloads.FAMILIES),
)
def test_fixture_payloads_extract_cleanly(conv, turn, kind):
    """Every payload the generator can produce parses with zero errors."""
    fam, text = payloads.payload_for(f"conv-{conv:08d}", turn, kind)
    out = dispatch.extract_one(fam, text)
    assert out["parse_errors"] == 0


@settings(max_examples=25, deadline=None)
@given(
    conv=st.integers(min_value=0, max_value=10**6),
    turn=st.integers(min_value=0, max_value=5000),
)
def test_payload_generation_is_pure(conv, turn):
    a = payloads.payload_for(f"conv-{conv:08d}", turn)
    b = payloads.payload_for(f"conv-{conv:08d}", turn)
    assert a == b


# ---------------------------------------------------- cdc_chunks vs python


def _py_cdc_ends(text: str) -> list[int]:
    """Pure-Python reference of the CDC boundary rule (text_stats.CDC_*)."""
    from pdf_extractors_spark.operators.text_stats import (
        CDC_BASE, CDC_DIV, CDC_MOD, CDC_WINDOW,
    )

    codes = [ord(c) for c in text]
    n = len(codes)
    cuts = []
    for i in range(CDC_WINDOW, n + 1):
        h = sum(
            codes[i - 1 - t] * CDC_BASE**t for t in range(CDC_WINDOW)
        ) % CDC_MOD
        if h % CDC_DIV == 0:
            cuts.append(i)
    if not (cuts and cuts[-1] == n):
        cuts.append(n)
    return cuts


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=400,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_cdc_chunks_match_python_reference(spark, texts):
    from pdf_extractors_spark.operators import text_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, list[tuple[int, int]]] = {}
    for r in text_stats.cdc_chunks(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"] + r["chunk_len"] - 1)
        )
    for i, t in enumerate(texts):
        if len(t) == 0:
            assert i not in got
            continue
        ends = [e for _, e in sorted(got[i])]
        assert ends == _py_cdc_ends(t), (i, t)
