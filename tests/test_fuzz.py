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


_LEAK_ALPHABET = st.text(
    alphabet=st.sampled_from(list("ab<|>[]/INSTendofximpad_ ")), max_size=80
)


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(_LEAK_ALPHABET, min_size=1, max_size=5))
def test_special_token_leaks_match_python_count(spark, texts):
    """Substring arithmetic == str.count for every control token, on
    adversarial text drawn from the tokens' own alphabet (overlapping
    near-matches, partial markers)."""
    from pdf_extractors_spark.operators import text_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["token"]): r["n_hits"]
        for r in text_stats.special_token_leaks(df).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        for tok in text_stats.SPECIAL_TOKENS:
            n = t.count(tok)
            if n > 0:
                want[(i, tok)] = n
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    epochs=st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=500)),
        min_size=1,
        max_size=12,
    ),
    delay=st.integers(min_value=0, max_value=100),
)
def test_watermark_lateness_matches_python_fold(spark, epochs, delay):
    """The operator == the sequential fold a streaming engine actually
    runs: track running max event time over arrivals, drop rows more
    than `delay` behind it."""
    from datetime import datetime, timezone

    from pdf_extractors_spark import pipeline

    rows = [
        (
            "c",
            i,
            None
            if e is None
            else datetime.fromtimestamp(1_700_000_000 + e, tz=timezone.utc),
        )
        for i, e in enumerate(epochs)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    r = pipeline.watermark_lateness(df, delay_s=delay).collect()[0]

    run_max, n_late, max_dis, n_rows, n_null = None, 0, 0, 0, 0
    for e in epochs:
        if e is None:
            n_null += 1
            continue
        n_rows += 1
        if run_max is not None:
            dis = max(run_max - e, 0)
            max_dis = max(max_dis, dis)
            if dis > delay:
                n_late += 1
        run_max = e if run_max is None else max(run_max, e)
    assert (r["n_rows"], r["n_late"], r["max_disorder_secs"], r["n_null_ts"]) == (
        n_rows, n_late, max_dis, n_null,
    )


@settings(max_examples=10, deadline=None)
@given(
    turns=st.lists(
        st.tuples(
            st.sampled_from(["user", "assistant", "tool"]),
            st.text(alphabet=st.sampled_from(list("ab c")), max_size=30),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_parrot_rate_matches_python_sets(spark, turns):
    from pdf_extractors_spark import pipeline

    rows = [("c", i, role, text) for i, (role, text) in enumerate(turns)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    r = pipeline.parrot_rate(df).collect()[0]
    a_set, u_set = set(), set()
    for role, text in turns:
        toks = {w for w in text.lower().strip().split() if w}
        if role == "assistant":
            a_set |= toks
        elif role == "user":
            u_set |= toks
    n_a, n_s = len(a_set), len(a_set & u_set)
    bp = (2 * 10000 * n_s + n_a) // (2 * n_a) if n_a else 0
    assert (r["n_asst_types"], r["n_shared"], r["parrot_bp"]) == (n_a, n_s, bp)


def _py_markdown_tables(text: str) -> list[tuple[int, int, int, str]]:
    """Sequential reference for markdown_tables, replaying the operator's
    island contract exactly: islands form over ALL pipe-prefixed lines
    (so a zero-cell or separator line keeps an island contiguous), then
    cell-less and separator rows drop, tables renumber densely over the
    SURVIVING islands, and rows number over surviving lines."""
    import re as _re

    islands: dict[int, list] = {}
    seq = 0
    for ln, line in enumerate((text or "").split("\n")):
        if not _re.match(r"^\s*\|", line):
            continue
        seq += 1
        key = ln - seq
        parts = _re.split(r"\|", line.strip())
        cells = [c.strip() for c in parts[1:-1]]
        if not cells:
            continue
        if all(_re.fullmatch(r":?-+:?", c) for c in cells):
            continue
        islands.setdefault(key, []).append((ln, cells))
    out = []
    for tbl, key in enumerate(sorted(islands)):
        for row, (_ln, cells) in enumerate(sorted(islands[key])):
            for col, c in enumerate(cells):
                out.append((tbl, row, col, c))
    return out


_MD_ALPHABET = st.text(
    alphabet=st.sampled_from(list("|-: abc\n")), max_size=120
)


@settings(max_examples=20, deadline=None)
@given(texts=st.lists(_MD_ALPHABET, min_size=1, max_size=4))
def test_markdown_tables_match_python_reference(spark, texts):
    from pdf_extractors_spark.operators import text_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, list] = {i: [] for i in range(len(texts))}
    for r in text_stats.markdown_tables(df).collect():
        got[r["doc_id"]].append(
            (r["table_idx"], r["row_idx"], r["col_idx"], r["cell"])
        )
    for i, t in enumerate(texts):
        assert sorted(got[i]) == sorted(_py_markdown_tables(t)), (i, t)


# ------------------------------------------------------------- mojibake

# adversarial alphabet for the codec round-trip: ASCII, the Latin-1 /
# CP1252 block (lead + continuation chars), Windows punctuation
# artifacts, genuine accents, CJK (outside CP1252), and U+FFFD
_MOJI_ALPHABET = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.characters(min_codepoint=0xA0, max_codepoint=0xFF),
        st.sampled_from("\u20ac\u2122\u0153\u2018\u2019\u201c\u201d"
                        "\u2013\u2014\u2026\ufffd\u4e2d\u6587"),
    ),
    max_size=60,
)


def _py_moji_repair(s):
    try:
        b = s.encode("cp1252")
    except UnicodeEncodeError:
        try:
            b = s.encode("latin-1")
        except UnicodeEncodeError:
            return s
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return s


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(_MOJI_ALPHABET, min_size=1, max_size=6))
def test_mojibake_repair_matches_python_codec(spark, texts):
    """The Arrow-batched repair == the plain CPython round-trip on
    arbitrary mixed-script text (the subtle cases: strings valid under
    BOTH readings, CP1252 holes, partial artifact sequences)."""
    from pdf_extractors_spark.operators import text_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text_fixed"], r["changed"])
        for r in text_stats.mojibake_repair(df).collect()
    }
    for i, t in enumerate(texts):
        want = _py_moji_repair(t)
        assert got[i] == (want, want != t), (i, t)


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(_MOJI_ALPHABET, min_size=1, max_size=6))
def test_mojibake_scan_matches_python_re(spark, texts):
    """Java-regex artifact counts == Python re over the same shared
    class constants (engine-parity is what the DuckDB oracle assumes)."""
    import re

    from pdf_extractors_spark.operators import text_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in text_stats.mojibake_scan(df).collect()}
    for i, t in enumerate(texts):
        assert got[i]["n_moji2"] == len(re.findall(text_stats.MOJI2_RE, t))
        assert got[i]["n_moji3"] == len(re.findall(text_stats.MOJI3_RE, t))
        assert got[i]["n_replacement"] == t.count("\ufffd")


# ----------------------------------------------------------------- dsir

# token alphabet with few distinct tokens + tiny bucket space: forces
# hash collisions, shared buckets between target and raw, and bigram
# overlap — the regimes where the windowed-total / coalesce algebra
# could drift from the reference
_DSIR_TOKENS = st.lists(
    st.sampled_from(["the", "cat", "zzq", "a", "b", "lorem", "x1"]),
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(
    raw_docs=st.lists(_DSIR_TOKENS, min_size=1, max_size=6),
    tgt_docs=st.lists(_DSIR_TOKENS, min_size=0, max_size=4),
    bigrams=st.booleans(),
)
def test_dsir_weights_match_python_reference(spark, raw_docs, tgt_docs, bigrams):
    """dsir_weights == the sequential reference on adversarial corpora:
    colliding buckets (n_buckets=8), empty targets (every tf_t = 0),
    empty documents, and both feature modes."""
    import hashlib

    from pdf_extractors_spark.operators import sampling

    n_buckets = 8
    raw_rows = [(i, " ".join(toks)) for i, toks in enumerate(raw_docs)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(" ".join(toks),) for toks in tgt_docs] or [(None,)], "text string"
    )

    def feats(toks):
        fs = list(toks)
        if bigrams:
            fs += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [
            int(hashlib.md5(f"dsir:{f}".encode()).hexdigest()[:8], 16)
            % n_buckets
            for f in fs
        ]

    tf_r, tf_t = {}, {}
    for toks in raw_docs:
        for b in feats(toks):
            tf_r[b] = tf_r.get(b, 0) + 1
    for toks in tgt_docs:
        for b in feats(toks):
            tf_t[b] = tf_t.get(b, 0) + 1
    n_raw, n_tgt = sum(tf_r.values()), sum(tf_t.values())

    def bits(total, tf):
        return ((total + n_buckets) // (tf + 1)).bit_length() - 1

    got = {
        r["doc_id"]: (r["n_features"], r["log2_weight"])
        for r in sampling.dsir_weights(
            raw, target, n_buckets=n_buckets, bigrams=bigrams
        ).collect()
    }
    for i, toks in enumerate(raw_docs):
        bs = feats(toks)
        want = sum(bits(n_raw, tf_r[b]) - bits(n_tgt, tf_t.get(b, 0)) for b in bs)
        assert got[i] == (len(bs), want), (i, toks, bigrams)
