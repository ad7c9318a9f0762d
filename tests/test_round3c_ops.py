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


# ----------------------------------------------------------- merge_spans


def test_merge_spans_overlap_adjacency_isolation(spark):
    from pdf_extractors_spark.operators.text_stats import merge_spans

    rows = [
        (1, 0, 10), (1, 5, 12), (1, 12, 20),   # overlap + adjacency
        (1, 40, 45),                           # isolated
        (2, 3, 4),                             # other doc untouched
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, span_start long, span_end long"
    )
    out = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_merged"])
        for r in merge_spans(df).collect()
    )
    assert out == [(1, 0, 20, 3), (1, 40, 45, 1), (2, 3, 4, 1)]


def test_merge_spans_single_exchange(spark):
    from pdf_extractors_spark.operators.text_stats import merge_spans

    df = spark.createDataFrame(
        [(1, 0, 5)], "doc_id long, span_start long, span_end long"
    )
    plan = _plan(merge_spans(df))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_span_coverage_counts_overlaps_once(spark):
    from pdf_extractors_spark.operators.text_stats import span_coverage

    docs = spark.createDataFrame(
        [(1, "x" * 100), (2, "y" * 50), (3, None)],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [(1, 0, 30), (1, 20, 50)],  # union covers [0,50): 50 chars, once
        "doc_id long, span_start long, span_end long",
    )
    out = {r["doc_id"]: r for r in span_coverage(docs, spans).collect()}
    assert out[1]["covered_chars"] == 50 and out[1]["coverage_bp"] == 5000
    assert out[2]["covered_chars"] == 0 and out[2]["n_spans"] == 0
    assert out[3]["n_chars"] == 0 and out[3]["coverage_bp"] == 0


# --------------------------------------------------------- lang_segments


def test_lang_segments_splits_mixed_page(spark):
    from pdf_extractors_spark.operators.text_stats import lang_segments

    page = "\n".join(
        [
            "the cat and the dog is in the house",
            "the end of that for is in the",
            "der hund und die katze ist nicht das",
            "",
            "le chat et la vache est dans les",
        ]
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    out = sorted(
        (r["seg_idx"], r["lang"], r["line_start"], r["line_end"], r["n_lines"])
        for r in lang_segments(df).collect()
    )
    assert out == [
        (0, "en", 0, 1, 2),
        (1, "de", 2, 2, 1),
        (2, "und", 3, 3, 1),   # blank line: its own und segment
        (3, "fr", 4, 4, 1),
    ]


def test_lang_segments_tie_priority_and_null(spark):
    from pdf_extractors_spark.operators.text_stats import lang_segments

    # 'in' is an en stopword; 'das ist' are de stopwords: de wins 2-1.
    # A pure tie ('is das' = 1 en hit, 1 de hit) goes to en by priority.
    df = spark.createDataFrame(
        [(1, "das ist in"), (2, "is das"), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["lang"] for r in lang_segments(df).collect()
    }
    assert got[1] == "de" and got[2] == "en" and got[3] == "und"


# ------------------------------------------------- minhash_jaccard_est


def test_minhash_est_exact_dups_agree_fully(spark):
    from pdf_extractors_spark.operators.dedup import minhash_jaccard_est

    rows = [
        (1, "one two three four five six seven eight nine"),
        (2, "one two three four five six seven eight nine"),
        (3, "alpha beta gamma delta epsilon zeta eta theta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in minhash_jaccard_est(df).collect()
    }
    r = out[(1, 2)]
    # identical docs: every signature component agrees AND exact
    # jaccard is 1.0 -> error is exactly zero
    assert r["est_bp"] == 10000 and r["jacc_bp"] == 10000
    assert r["err_bp"] == 0
    assert (1, 3) not in out and (2, 3) not in out


# ---------------------------------------------------- bloom_decontaminate


def test_bloom_decontaminate_matches_exact_path(spark):
    from pdf_extractors_spark.operators.dedup import (
        bloom_decontaminate,
        decontaminate,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon completely different ending"),
        (3, "nothing in common with the benchmark at all here folks"),
        (4, "zeta eta theta iota kappa plus some extra trailing words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = df.filter("doc_id = 1")
    exact = {
        r["doc_id"]: r["n_overlapping"]
        for r in decontaminate(df, bench, n=5).collect()
    }
    bloom = {
        r["doc_id"]: r
        for r in bloom_decontaminate(df, bench, n=5).collect()
    }
    # no false negatives: every exact-overlap doc appears with the SAME
    # verified count; candidates >= verified (Bloom can only over-select)
    for doc, n in exact.items():
        assert bloom[doc]["n_overlapping"] == n
        assert bloom[doc]["n_candidate_shingles"] >= n
    # docs in bloom but not exact are false-positive-only: verified 0
    for doc, r in bloom.items():
        if doc not in exact:
            assert r["n_overlapping"] == 0


def test_bloom_bitmap_is_constant_size(spark):
    from pdf_extractors_spark.operators.dedup import BLOOM_WORDS

    assert BLOOM_WORDS == 2048  # 65,536 bits — the broadcast is O(1)


# -------------------------------------------------------- template_turns


def test_template_turns_cross_conv_threshold(spark):
    rows = []
    for c in range(4):
        rows.append((f"c{c}", 0, "assistant", "Please   hold."))  # template
        rows.append((f"c{c}", 1, "user", f"unique question {c}"))
    rows.append(("c0", 2, "assistant", "Please hold."))  # extra occurrence
    rows.append(("c9", 0, "user", ""))                   # empty: excluded
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = pipeline.template_turns(df, min_convs=3).collect()
    assert len(out) == 1
    r = out[0]
    # whitespace-normalized: 'Please   hold.' and 'Please hold.' collide
    assert r["n_convs"] == 4 and r["n_turns"] == 5
    assert r["sample_text"] == "Please   hold."  # lexicographic min


# ---------------------------------------------------- turn_latency_stats


def test_turn_latency_user_assistant_only(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        ("c", 0, "user", ts(0)),
        ("c", 1, "assistant", ts(7)),    # +7
        ("c", 2, "tool", ts(9)),         # not a user->assistant edge
        ("c", 3, "assistant", ts(12)),   # prev is tool: ignored
        ("c", 4, "user", ts(20)),
        ("c", 5, "assistant", ts(23)),   # +3
        ("d", 0, "user", ts(0)),         # no response at all
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    out = {r["conv_id"]: r for r in pipeline.turn_latency_stats(df).collect()}
    c = out["c"]
    assert (c["n_responses"], c["total_secs"], c["min_secs"], c["max_secs"]) \
        == (2, 10, 3, 7)
    assert c["mean_secs_bp"] == 50000  # mean 5.0 s
    d = out["d"]
    assert (d["n_responses"], d["mean_secs_bp"]) == (0, 0)


# ----------------------------------------------------------- prefix_dedup


def test_prefix_dedup_finds_truncation(spark):
    from pdf_extractors_spark.operators.dedup import prefix_dedup

    words = [f"w{i}" for i in range(30)]
    full = " ".join(words)
    trunc = " ".join(words[:20])
    near_miss = " ".join(words[:19] + ["DIFFERENT"])  # same first-16 key
    df = spark.createDataFrame(
        [(1, full), (2, trunc), (3, near_miss), (4, "short doc")],
        "doc_id long, text string",
    )
    out = {
        (r["id_prefix"], r["id_full"]): r
        for r in prefix_dedup(df, k=16).collect()
    }
    assert (2, 1) in out
    r = out[(2, 1)]
    assert (r["n_tokens_prefix"], r["n_tokens_full"]) == (20, 30)
    # near_miss shares the 16-token key but fails the exact verify
    assert (3, 1) not in out and (1, 3) not in out
    # doc 4 is below k tokens: out of scope entirely
    assert not any(3 in p or 4 in p for p in out if p != (2, 1) and 3 in p)


def test_prefix_dedup_token_boundary(spark):
    from pdf_extractors_spark.operators.dedup import prefix_dedup

    base = " ".join(f"t{i}" for i in range(16))
    a = base + " abc"
    b = base + " abcdef more words here"   # 'abc' is a CHAR prefix of
    df = spark.createDataFrame(            # 'abcdef' but not a TOKEN one
        [(1, a), (2, b)], "doc_id long, text string"
    )
    assert prefix_dedup(df, k=16).count() == 0


# -------------------------------------------------------- quality_ensemble


def test_quality_ensemble_deterministic_and_tiered(spark):
    rows = [
        (1, "en", "the cat and the dog is in the house for that reason"),
        (2, "en", "loop loop loop loop loop loop loop loop loop loop"),
        (3, "en", "a unique sentence about astrophysics and marmalade"),
        (4, "en", "the cat and the dog is in the house for that reason"),
        (5, "de", "der hund und die katze ist nicht das problem heute"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in text_stats.quality_ensemble(df).collect()}
    assert len(out) == 5
    # per-language ntile: the single de doc is tier 1 of its own group
    assert out[5]["ens_tier"] == 1
    # the degenerate loop doc must not beat a clean unique doc
    assert out[2]["rank_sum"] > out[3]["rank_sum"]
    # determinism: same input, same output
    again = {r["doc_id"]: r for r in text_stats.quality_ensemble(df).collect()}
    assert {k: (v["rank_sum"], v["ens_tier"]) for k, v in out.items()} == {
        k: (v["rank_sum"], v["ens_tier"]) for k, v in again.items()
    }


# --------------------------------------------------------- neardup_stream


def test_neardup_stream_matches_batch_distinct(spark, tmp_path):
    from pdf_extractors_spark.operators.dedup import simhash
    from pdf_extractors_spark.streaming import extract_stream as es

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # dup
        (3, "completely different content about spark and shuffles"),
        (4, None),
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    batch = spark.read.parquet(src)
    expected = {
        r["simhash"]
        for r in simhash(
            batch.withColumn("text", F.coalesce("text", F.lit("")))
        ).collect()
    }

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        es.neardup_stream(stream)
        .select("simhash")
        .writeStream.format("memory")
        .queryName("t_neardup_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["simhash"] for r in spark.table("t_neardup_stream").collect()
    }
    assert got == expected


# ---------------------------------------------------------- conv_truncate


def test_conv_truncate_suffix_packing(spark):
    rows = [
        ("c", 0, "system", "one two three four five"),          # 5 tokens
        ("c", 1, "user", "six seven eight"),                    # 3
        ("c", 2, "assistant", "nine ten"),                      # 2
        ("c", 3, "user", "eleven"),                             # 1
    ]
    df = _turns(spark, rows)
    out = {
        r["turn_idx"]: r
        for r in pipeline.conv_truncate(df, budget_tokens=6).collect()
    }
    # suffix totals from the end: t3=1, t2=3, t1=6, t0=11
    assert [out[i]["suffix_tokens"] for i in (3, 2, 1, 0)] == [1, 3, 6, 11]
    assert [out[i]["kept"] for i in (3, 2, 1, 0)] == [True, True, True, False]


def test_conv_truncate_final_turn_always_kept(spark):
    rows = [("c", 0, "user", " ".join(["w"] * 50))]  # alone over budget
    out = pipeline.conv_truncate(_turns(spark, rows), budget_tokens=6).collect()
    assert out[0]["kept"] and out[0]["n_tokens"] == 50


def test_conv_truncate_null_text_zero_tokens(spark):
    rows = [("c", 0, "user", "a b c"), ("c", 1, "tool", None)]
    out = {
        r["turn_idx"]: r
        for r in pipeline.conv_truncate(_turns(spark, rows), budget_tokens=3).collect()
    }
    assert out[1]["n_tokens"] == 0 and out[1]["kept"]
    assert out[0]["suffix_tokens"] == 3 and out[0]["kept"]


# --------------------------------------------------------- length_buckets


def test_length_buckets_log2_and_empty_class(spark):
    rows = [
        (1, "web", "x"),          # 1 char  -> bucket 0
        (2, "web", "xxxx"),       # 4 chars -> bucket 2
        (3, "web", "xxxxx"),      # 5 chars -> bucket 2
        (4, "web", None),         # empty   -> bucket -1
        (5, "pdf", "x" * 1024),   # bucket 10
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        (r["source"], r["len_bucket"]): r
        for r in text_stats.length_buckets(df).collect()
    }
    assert out[("web", 2)]["n_docs"] == 2
    assert out[("web", 2)]["total_chars"] == 9
    assert out[("web", -1)]["n_docs"] == 1
    assert out[("pdf", 10)]["max_chars"] == 1024
