"""Round-3 batch-4 operator tests: hyphenation repair, frequency-based
header/footer stripping, consecutive-duplicate turn collapse,
order-insensitive bag dedup, and inverted-index cosine pairs."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from pdf_extractors_spark import pipeline
from pdf_extractors_spark.operators import retrieval, text_stats
from pdf_extractors_spark.operators.dedup import bag_dedup


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# -------------------------------------------------------- dehyphenate


def test_dehyphenate_joins_soft_breaks_only(spark):
    text = (
        "the exam-\nple contin-\nued; the UTC-\nTIME label, the "
        "2023-\n2024 range and a trailing dash-\n"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = text_stats.dehyphenate(df).collect()[0]
    assert "example" in r["fixed_text"]
    assert "continued" in r["fixed_text"]
    # uppercase continuation and digit range keep their hyphen+newline
    assert "UTC-\nTIME" in r["fixed_text"]
    assert "2023-\n2024" in r["fixed_text"]
    # the trailing dash has no following letter — untouched
    assert r["fixed_text"].endswith("dash-\n")
    assert r["n_joins"] == 2


def test_dehyphenate_null_and_consecutive(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a-\nb-\nc")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in text_stats.dehyphenate(df).collect()}
    assert got[1]["fixed_text"] == "" and got[1]["n_joins"] == 0
    # left-to-right non-overlap: "a-\nb" joins and CONSUMES b, so the
    # scan resumes at "-\nc" where no starting letter is available —
    # the second break survives (identical semantics in Java and RE2)
    assert got[2]["fixed_text"] == "ab-\nc"
    assert got[2]["n_joins"] == 1


# ---------------------------------------------- strip_repeated_lines


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, page_no long, text string"
    )


def test_strip_repeated_lines_header_footer_watermark(spark):
    # body words differ per page (not just digits: digit normalization
    # would make "body 1"/"body 2" collide on purpose — that IS the
    # page-number trick, so genuine bodies must differ in letters)
    words = {1: "alpha", 2: "beta", 3: "gamma", 4: "delta"}
    rows = [
        (1, p, "\n".join(
            ["RUNNING HEADER",
             f"unique body {words[p]}",
             *(["Draft watermark"] if p <= 2 else []),
             f"Page {p} of 4"]
        ))
        for p in (1, 2, 3, 4)
    ]
    out = {
        r["page_no"]: r
        for r in text_stats.strip_repeated_lines(_pages(spark, rows)).collect()
    }
    assert len(out) == 4
    for p in (1, 2, 3, 4):
        # header (4/4), watermark (2/4 = exactly the 50% threshold) and
        # the digit-normalized footer are all stripped; the body stays
        assert out[p]["clean_text"] == f"unique body {words[p]}"
    assert out[1]["n_stripped"] == 3 and out[3]["n_stripped"] == 2


def test_strip_repeated_lines_min_pages_guard_and_blanks(spark):
    # 2-page document: below min_pages, nothing is stripped even though
    # the header repeats on every page; blank lines always survive
    rows = [(1, p, f"SAME HEADER\n\nbody {p}") for p in (1, 2)]
    out = {
        r["page_no"]: r
        for r in text_stats.strip_repeated_lines(_pages(spark, rows)).collect()
    }
    assert out[1]["n_stripped"] == 0
    assert out[1]["clean_text"] == "SAME HEADER\n\nbody 1"


def test_strip_repeated_lines_all_stripped_page_survives(spark):
    # a page containing ONLY furniture stays in the output, empty
    rows = [
        (1, 1, "HDR\nbody one"),
        (1, 2, "HDR\nbody two"),
        (1, 3, "HDR"),
    ]
    out = {
        r["page_no"]: r
        for r in text_stats.strip_repeated_lines(_pages(spark, rows)).collect()
    }
    assert out[3]["clean_text"] == "" and out[3]["n_stripped"] == 1
    assert out[1]["clean_text"] == "body one"


# ------------------------------------------------------ collapse_repeats


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_collapse_repeats_runs_and_nonadjacent(spark):
    rows = [
        ("c", 0, "user", "hi"),
        ("c", 1, "user", "hi"),       # adjacent dup -> collapses into 0
        ("c", 2, "assistant", "yo"),
        ("c", 3, "user", "hi"),       # NON-adjacent reuse -> survives
        ("c", 4, "tool", None),
        ("c", 5, "tool", None),       # null-text run -> null-safe collapse
    ]
    out = sorted(
        (r["turn_idx"], r["role"], r["text"], r["n_repeats"])
        for r in pipeline.collapse_repeats(_turns(spark, rows)).collect()
    )
    assert out == [
        (0, "user", "hi", 2),
        (2, "assistant", "yo", 1),
        (3, "user", "hi", 1),
        (4, "tool", None, 2),
    ]


def test_collapse_repeats_role_change_breaks_run(spark):
    rows = [
        ("c", 0, "user", "same"),
        ("c", 1, "assistant", "same"),  # same text, different role
    ]
    out = pipeline.collapse_repeats(_turns(spark, rows)).collect()
    assert len(out) == 2


def test_collapse_repeats_single_exchange(spark):
    df = _turns(spark, [("c", 0, "user", "x")])
    plan = _plan(pipeline.collapse_repeats(df))
    # the window's hashpartitioning(conv_id) satisfies the (conv_id, run)
    # grouping — the whole operator is one shuffle
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


# ------------------------------------------------------------ bag_dedup


def test_bag_dedup_order_insensitive_groups(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "gamma alpha beta"),   # same multiset, different order
        (3, "alpha beta gamma"),   # exact dup
        (4, "alpha beta"),         # different multiset
        (5, "alpha beta gamma gamma"),  # different MULTIPLICITY
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bag_dedup(df).collect()}
    assert out[1]["bag_hash"] == out[2]["bag_hash"] == out[3]["bag_hash"]
    assert out[1]["bag_size"] == 3
    assert out[1]["keep"] and not out[2]["keep"] and not out[3]["keep"]
    assert out[4]["bag_hash"] != out[1]["bag_hash"]
    assert out[5]["bag_hash"] != out[1]["bag_hash"]  # multiset, not set


def test_bag_dedup_empty_class_explicit(spark):
    rows = [(1, None), (2, ""), (3, "   "), (4, "real text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bag_dedup(df).collect()}
    # null / empty / whitespace-only all land in ONE visible empty class
    assert out[1]["bag_hash"] == out[2]["bag_hash"] == out[3]["bag_hash"]
    assert out[1]["bag_size"] == 3 and out[1]["keep"]
    assert out[4]["bag_size"] == 1


# -------------------------------------------------- sparse_cosine_pairs


def test_sparse_cosine_identical_docs_hit_10000(spark):
    rows = [
        (1, "spark shuffle join window"),
        (2, "spark shuffle join window"),
        (3, "entirely unrelated words here"),
        (4, "entirely unrelated words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in retrieval.sparse_cosine_pairs(df, min_df=2, max_df=3).collect()
    }
    assert out[(1, 2)]["cos2_bp"] == 10000
    assert out[(3, 4)]["cos2_bp"] == 10000
    assert (1, 3) not in out and (2, 4) not in out


def test_sparse_cosine_stopword_pruned_by_max_df(spark):
    # "the" appears in all 4 docs (df=4 > max_df=3): without the prune
    # it would connect every pair; with it, disjoint docs never meet
    rows = [
        (1, "the alpha alpha"),
        (2, "the alpha beta"),
        (3, "the gamma delta"),
        (4, "the gamma epsilon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in retrieval.sparse_cosine_pairs(
            df, min_df=2, max_df=3, min_cos2_bp=0
        ).collect()
    }
    assert (1, 2) in pairs and (3, 4) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_sparse_cosine_exact_value(spark):
    # a=[2,1] ("x x y"), b=[1,1] ("x y") over shared terms x,y:
    # dot=3, |a|2=5, |b|2=2 -> cos2 = 9/10 -> 9000 bp exactly
    rows = [(1, "x x y"), (2, "x y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = retrieval.sparse_cosine_pairs(
        df, min_df=2, max_df=4, min_cos2_bp=0
    ).collect()[0]
    assert (r["dot"], r["norm2_a"], r["norm2_b"]) == (3, 5, 2)
    assert r["cos2_bp"] == 9000
    assert r["n_shared_terms"] == 2
