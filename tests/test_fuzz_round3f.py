"""Differential fuzzing for this round's audit operators: each Spark
result is replayed against an independent pure-Python reference over
hypothesis-generated text (full-unicode alphabet minus surrogates —
the explicit whitespace classes and \\z anchors in the operators exist
precisely so Java, RE2 and Python agree on these inputs)."""

import math
import re

from hypothesis import assume, given, settings, strategies as st

from pdf_extractors_spark import pipeline
from pdf_extractors_spark.operators import text_stats
from pdf_extractors_spark.operators.hashing import md5_bigint_py

# lowercase-only alphabet: the operators lowercase via JVM semantics,
# which diverge from Python's on a handful of exotic uppercase points
# (İ, ﬀ ligature folds) — tokenization/flag logic is what is under test
TEXT = st.text(
    alphabet=st.sampled_from(
        list("ab c.!?()[]{}$,:'\"`\n\t\r\x0b\f…é日本0123456789")
    ),
    max_size=120,
)

_WS = re.compile(r"[ \t\n\r\f]+")


def _toks(s):
    return [t for t in _WS.split(s.lower()) if t]


# ------------------------------------------------------ truncation_scan


def _py_truncation(t):
    fence_n = (len(t) - len(t.replace("```", ""))) // 3
    tr = t.strip(" ")
    ends_clean = re.search(r"[.!?:`'\")\]}…]\Z", tr) is not None
    flags = (
        fence_n % 2 == 1,
        len(tr) > 0 and not ends_clean,
        re.search(r"(?:\.\.\.|…)\Z", tr) is not None,
        sum(t.count(c) for c in "([{") != sum(t.count(c) for c in ")]}"),
    )
    return (len(t), *flags, sum(flags))


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(TEXT, min_size=1, max_size=6))
def test_truncation_scan_matches_python(spark, texts):
    rows = [("C", i, "assistant", t) for i, t in enumerate(texts)]
    got = {
        r["turn_idx"]: (
            r["n_chars"],
            r["open_fence"],
            r["no_terminal"],
            r["ends_ellipsis"],
            r["unbalanced_brackets"],
            r["n_flags"],
        )
        for r in pipeline.truncation_scan(
            spark.createDataFrame(
                rows, "conv_id string, turn_idx int, role string, text string"
            )
        ).collect()
    }
    assert got == {i: _py_truncation(t) for i, t in enumerate(texts)}


# ------------------------------------------------------- reading_level


def _py_reading(t):
    words = len(re.findall(r"[^ \t\n\r\f]+", t))
    sents = max(len(re.findall(r"[.!?]+", t)), 1)
    syl = len(re.findall(r"[aeiouy]+", t.lower()))
    grade = (
        math.floor(39.0 * words / sents + 1180.0 * syl / words - 1559.0)
        if words
        else None
    )
    return (words, sents, syl, grade)


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(TEXT, min_size=1, max_size=6))
def test_reading_level_matches_python(spark, texts):
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_sentences"],
            r["n_syllables"],
            r["fk_grade_x100"],
        )
        for r in text_stats.reading_level(
            spark.createDataFrame(
                list(enumerate(texts)), "doc_id long, text string"
            )
        ).collect()
    }
    assert got == {i: _py_reading(t) for i, t in enumerate(texts)}


# ----------------------------------------------------- retry_similarity


def _py_retry(turns):
    out = {}
    for (i_prev, r_prev, t_prev), (i, r, t) in zip(turns, turns[1:]):
        if r != r_prev:
            continue
        a, b = set(_toks(t)), set(_toks(t_prev))
        union = a | b
        if not a and not b:
            j = 10000
        elif not union:
            j = 0
        else:
            j = math.floor(10000 * len(a & b) / len(union))
        out[i] = (i_prev, r, len(a), len(b), len(a & b), j)
    return out


@settings(max_examples=12, deadline=None)
@given(
    turns=st.lists(
        st.tuples(st.sampled_from(["user", "assistant"]), TEXT),
        min_size=2,
        max_size=8,
    )
)
def test_retry_similarity_matches_python(spark, turns):
    indexed = [(i, r, t) for i, (r, t) in enumerate(turns)]
    rows = [("C", i, r, t) for i, r, t in indexed]
    got = {
        r["turn_idx"]: (
            r["prev_turn_idx"],
            r["role"],
            r["n_tokens"],
            r["n_prev_tokens"],
            r["n_common"],
            r["jaccard_bp"],
        )
        for r in pipeline.retry_similarity(
            spark.createDataFrame(
                rows, "conv_id string, turn_idx int, role string, text string"
            )
        ).collect()
    }
    assert got == _py_retry(indexed)


# ------------------------------------------------------- watermark_scan


def _py_watermark(t, seed=0):
    toks = _toks(t)
    pairs = list(zip(toks, toks[1:]))
    n = len(pairs)
    g = sum(
        1
        for a, b in pairs
        if md5_bigint_py(f"wm:{seed}:{a}:{b}") % 2 == 0
    )
    bp = math.floor(10000 * g / n) if n else 0
    z = math.floor(100.0 * (2 * g - n) / math.sqrt(n)) if n else 0
    return (n, g, bp, z)


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(TEXT, min_size=1, max_size=6))
def test_watermark_scan_matches_python(spark, texts):
    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["n_green"],
            r["green_bp"],
            r["z_x100"],
        )
        for r in text_stats.watermark_scan(
            spark.createDataFrame(
                list(enumerate(texts)), "doc_id long, text string"
            )
        ).collect()
    }
    assert got == {i: _py_watermark(t) for i, t in enumerate(texts)}


# ------------------------------------------------------ amounts_extract


_AMT = re.compile(text_stats.AMOUNT_RE)


def _py_amounts(t):
    out = []
    for i, m in enumerate(_AMT.findall(t)):
        digits = m.replace("$", "").replace(",", "")
        dollars, _, frac = digits.partition(".")
        out.append((i, m, int(dollars) * 100 + int((frac + "00")[:2])))
    return out


AMT_TEXT = st.text(
    alphabet=st.sampled_from(list("$ 0123456789,.ab\n")), max_size=80
)


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(AMT_TEXT, min_size=1, max_size=6))
def test_amounts_extract_matches_python(spark, texts):
    # the operator documents an int64 cents bound; keep the fuzz inside
    # it (Python ints are unbounded, Spark longs are not)
    assume(all(not re.search(r"[0-9][0-9,]{14,}", t) for t in texts))
    got = {}
    for r in (
        text_stats.amounts_extract(
            spark.createDataFrame(
                list(enumerate(texts)), "doc_id long, text string"
            )
        )
        .orderBy("doc_id", "match_idx")
        .collect()
    ):
        got.setdefault(r["doc_id"], []).append(
            (r["match_idx"], r["raw"], r["cents"])
        )
    expected = {
        i: _py_amounts(t) for i, t in enumerate(texts) if _py_amounts(t)
    }
    assert got == expected


# -------------------------------------------------------- homoglyph_fold

HOMO_TEXT = st.text(
    alphabet=st.sampled_from(
        list("abc ABC" + text_stats.HOMOGLYPH_FROM[:40])
    ),
    max_size=80,
)

_FOLD = str.maketrans(
    text_stats.HOMOGLYPH_FROM, text_stats.HOMOGLYPH_TO
)


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(HOMO_TEXT, min_size=1, max_size=6))
def test_homoglyph_fold_matches_python(spark, texts):
    got = {
        r["doc_id"]: (r["folded_text"], r["n_folded"])
        for r in text_stats.homoglyph_fold(
            spark.createDataFrame(
                list(enumerate(texts)), "doc_id long, text string"
            )
        ).collect()
    }
    expected = {
        i: (
            t.translate(_FOLD),
            sum(1 for c in t if c in set(text_stats.HOMOGLYPH_FROM)),
        )
        for i, t in enumerate(texts)
    }
    assert got == expected
