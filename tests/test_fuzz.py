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
