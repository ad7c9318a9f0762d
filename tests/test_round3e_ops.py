"""Round-3 batch-8 operators: watermark_lateness, retry_runs,
tool_args_keys."""

from __future__ import annotations

from datetime import datetime, timedelta

from pdf_extractors_spark import pipeline

# ---------------------------------------------------- watermark_lateness


def _ts(s: int) -> datetime:
    return datetime(2026, 1, 1) + timedelta(seconds=s)


def test_watermark_lateness_counts_and_disorder(spark):
    rows = [
        # conv a: arrival order 0..4, event times with one late row
        ("a", 0, _ts(100)),
        ("a", 1, _ts(200)),
        ("a", 2, _ts(50)),   # 150s behind the running max (200): late at 60
        ("a", 3, _ts(190)),  # 10s behind: within a 60s watermark
        ("a", 4, _ts(300)),
        # conv b: perfectly ordered
        ("b", 0, _ts(0)),
        ("b", 1, _ts(10)),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    got = {r["conv_id"]: r.asDict() for r in pipeline.watermark_lateness(df, delay_s=60).collect()}
    assert got["a"]["n_rows"] == 5
    assert got["a"]["n_late"] == 1
    assert got["a"]["max_disorder_secs"] == 150
    assert got["a"]["n_null_ts"] == 0
    assert got["b"]["n_late"] == 0
    assert got["b"]["max_disorder_secs"] == 0


def test_watermark_lateness_null_ts_audited_not_dropped(spark):
    rows = [
        ("a", 0, _ts(100)),
        ("a", 1, None),
        ("a", 2, _ts(90)),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    r = pipeline.watermark_lateness(df, delay_s=5).collect()[0]
    # null ts row is counted separately; the 10s-disorder row IS late at 5s
    assert (r["n_rows"], r["n_null_ts"], r["n_late"], r["max_disorder_secs"]) == (2, 1, 1, 10)


def test_watermark_lateness_min_delay_property(spark):
    """max_disorder_secs is exactly the smallest delay that drops nothing:
    re-running with delay = max_disorder yields n_late == 0, and with
    delay = max_disorder - 1 yields n_late >= 1."""
    rows = [("a", i, _ts((i * 37) % 100)) for i in range(20)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    d = pipeline.watermark_lateness(df, delay_s=0).collect()[0]["max_disorder_secs"]
    assert d > 0
    at_d = pipeline.watermark_lateness(df, delay_s=d).collect()[0]
    below = pipeline.watermark_lateness(df, delay_s=d - 1).collect()[0]
    assert at_d["n_late"] == 0
    assert below["n_late"] >= 1


# ------------------------------------------------------------ retry_runs


def test_retry_runs_islands_and_zeros(spark):
    rows = [
        # conv a tool sequence: x x x y x  -> runs [3,1,1], max 3, one >=3
        ("a", 0, "user", None),
        ("a", 1, "tool", "x"),
        ("a", 2, "tool", "x"),
        ("a", 3, "tool", "x"),
        ("a", 4, "tool", "y"),
        ("a", 5, "tool", "x"),
        # conv b: no tool turns at all -> preserved with zeros
        ("b", 0, "user", None),
        ("b", 1, "assistant", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, tool string")
    got = {r["conv_id"]: r.asDict() for r in pipeline.retry_runs(df, min_run=3).collect()}
    assert got["a"] == {
        "conv_id": "a", "n_tool_calls": 5, "n_runs": 3,
        "max_run": 3, "n_runs_ge_min": 1,
    }
    assert got["b"] == {
        "conv_id": "b", "n_tool_calls": 0, "n_runs": 0,
        "max_run": 0, "n_runs_ge_min": 0,
    }


def test_retry_runs_null_tool_is_an_island_value(spark):
    rows = [
        ("a", 0, "tool", None),
        ("a", 1, "tool", None),
        ("a", 2, "tool", "x"),
        ("a", 3, "tool", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, tool string")
    r = pipeline.retry_runs(df, min_run=2).collect()[0]
    # runs: [null,null] [x] [null] -> 3 runs, max 2, one >= 2
    assert (r["n_runs"], r["max_run"], r["n_runs_ge_min"]) == (3, 2, 1)


# -------------------------------------------------------- tool_args_keys


def test_tool_args_keys_counts_and_pct(spark):
    rows = [
        ("a", 0, "tool", "srch", '{"status":"ok","latency_ms":"12"}'),
        ("a", 1, "tool", "srch", '{"status":"err"}'),
        ("a", 2, "tool", "srch", "not json at all"),
        ("a", 3, "tool", "calc", "{}"),
        ("a", 4, "user", None, '{"status":"ok"}'),  # non-tool role: ignored
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, text string"
    )
    got = {(r["tool"], r["key"]): r.asDict() for r in pipeline.tool_args_keys(df).collect()}
    assert got[("srch", "status")]["n_calls"] == 3
    assert got[("srch", "status")]["n_json"] == 2
    assert got[("srch", "status")]["n_with_key"] == 2
    assert got[("srch", "status")]["pct_bp"] == 10000
    assert got[("srch", "latency_ms")]["n_with_key"] == 1
    assert got[("srch", "latency_ms")]["pct_bp"] == 5000
    # calc parsed one empty object: no key rows, so no (calc, *) entry
    assert not any(t == "calc" for t, _ in got)


def test_tool_args_keys_half_up_rounding(spark):
    # 1 of 3 json rows carry the key -> 3333.33..bp, half-up floor -> 3333
    rows = [
        ("a", i, "tool", "t", p)
        for i, p in enumerate(['{"k":"1"}', '{"j":"1"}', '{"j":"2"}'])
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, text string"
    )
    got = {r["key"]: r["pct_bp"] for r in pipeline.tool_args_keys(df).collect()}
    assert got == {"k": 3333, "j": 6667}


# --------------------------------------------------------- lsh_degree_hist


def test_lsh_degree_hist_counts_zero_degree(spark):
    from pdf_extractors_spark.operators import dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
        (3, "completely different text with many unrelated words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(df)
    hist = {r["degree"]: r["n_docs"] for r in dedup.lsh_degree_hist(sigs).collect()}
    # docs 1 and 2 are candidates of each other (degree 1); doc 3 alone
    assert hist[1] == 2
    assert hist[0] == 1
    # histogram mass equals the signature basis
    assert sum(hist.values()) == sigs.count()


def test_lsh_degree_hist_mass_conserves_pairs(spark):
    from pdf_extractors_spark.operators import dedup

    rows = [(i, f"shared common prefix words here tail {i % 2}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(df)
    pairs = dedup.lsh_candidates(sigs).count()
    hist = dedup.lsh_degree_hist(sigs).collect()
    # sum(degree * n_docs) == 2 * |pairs|  (each pair contributes 2 endpoints)
    assert sum(r["degree"] * r["n_docs"] for r in hist) == 2 * pairs


# ------------------------------------------------------------ cdc_savings


def test_cdc_savings_duplicate_docs_save_chars(spark):
    from pdf_extractors_spark.operators import text_stats

    body = "abcdefgh" * 30
    rows = [(1, body), (2, body), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = text_stats.cdc_savings(df).collect()[0]
    # two identical docs: every chunk identity repeats exactly twice
    assert r["total_chunks"] == 2 * r["unique_chunks"]
    assert r["total_chars"] == 2 * len(body)
    assert r["dup_chars"] == len(body)
    assert r["savings_bp"] == 5000


def test_cdc_savings_unique_corpus_saves_nothing(spark):
    from pdf_extractors_spark.operators import text_stats

    rows = [(1, "first body with words"), (2, "second unrelated body")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = text_stats.cdc_savings(df).collect()[0]
    assert r["dup_chars"] == 0
    assert r["savings_bp"] == 0
    assert r["total_chars"] == sum(len(t) for _, t in rows)


# --------------------------------------------------------- rank_agreement


def test_rank_agreement_identical_and_reversed(spark):
    from pdf_extractors_spark.operators import text_stats

    # lang a: scores agree perfectly; lang b: perfectly reversed (n=4,
    # max footrule = floor(16/2) = 8, reversal achieves it)
    rows = [("a", i, i, i) for i in range(4)] + [
        ("b", i, i, 10 - i) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, sa long, sb long")
    got = {r["lang"]: r.asDict() for r in
           text_stats.rank_agreement(df, "sa", "sb", "lang").collect()}
    assert got["a"]["footrule"] == 0
    assert got["a"]["agreement_bp"] == 10000
    assert got["b"]["footrule"] == 8
    assert got["b"]["agreement_bp"] == 0


def test_rank_agreement_singleton_and_ties(spark):
    from pdf_extractors_spark.operators import text_stats

    rows = [("a", 1, 5, 7), ("b", 1, 3, 3), ("b", 2, 3, 3)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, sa long, sb long")
    got = {r["lang"]: r.asDict() for r in
           text_stats.rank_agreement(df, "sa", "sb", "lang").collect()}
    # n=1: defined as full agreement
    assert got["a"]["agreement_bp"] == 10000
    # all-tied scores: id tie-break makes both rankings identical
    assert got["b"]["footrule"] == 0 and got["b"]["agreement_bp"] == 10000


# ------------------------------------------------------------ parrot_rate


def test_parrot_rate_overlap_and_zeros(spark):
    rows = [
        ("a", 0, "user", "alpha beta gamma"),
        ("a", 1, "assistant", "alpha beta delta delta"),  # 3 types, 2 shared
        ("b", 0, "user", "only user words"),              # no assistant turn
        ("c", 0, "tool", "ignored entirely"),             # tool-only conv
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = {r["conv_id"]: r.asDict() for r in pipeline.parrot_rate(df).collect()}
    assert got["a"]["n_asst_types"] == 3
    assert got["a"]["n_shared"] == 2
    assert got["a"]["parrot_bp"] == 6667  # 2/3 half-up
    assert got["b"] == {"conv_id": "b", "n_asst_types": 0, "n_shared": 0, "parrot_bp": 0}
    assert got["c"]["parrot_bp"] == 0


def test_parrot_rate_distinct_types_not_occurrences(spark):
    # echoing one shared word many times cannot inflate the score
    rows = [
        ("a", 0, "user", "hello"),
        ("a", 1, "assistant", "hello hello hello hello novel"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    r = pipeline.parrot_rate(df).collect()[0]
    assert (r["n_asst_types"], r["n_shared"], r["parrot_bp"]) == (2, 1, 5000)


# ----------------------------------------------------------- prompt_dedup


def test_prompt_dedup_groups_normalized_first_prompts(spark):
    rows = [
        ("a", 0, "user", "Reset my   password"),
        ("a", 2, "user", "different later turn"),   # not the first
        ("b", 0, "user", "reset my password"),      # same after normalize
        ("c", 0, "user", "unrelated opener"),
        ("d", 1, "user", "RESET MY PASSWORD"),      # first user turn at idx 1
        ("d", 0, "assistant", "greeting first"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = pipeline.prompt_dedup(df, min_convs=2).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_convs"] == 3
    assert r["sample_conv"] == "a"
    # min raw text of the group (capital R sorts before lowercase r)
    assert r["sample_prompt"] == "RESET MY PASSWORD"


def test_prompt_dedup_null_and_empty_form_one_class(spark):
    rows = [
        ("a", 0, "user", None),
        ("b", 0, "user", "   "),
        ("c", 0, "user", ""),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = pipeline.prompt_dedup(df, min_convs=3).collect()
    assert len(got) == 1 and got[0]["n_convs"] == 3


# ------------------------------------------------------------- code_detect


def test_code_detect_routes_code_vs_prose(spark):
    from pdf_extractors_spark.operators import text_stats

    code = "def add(a, b):\n    return a + b\n\nx = add(1, 2);\n"
    prose = "The weather was pleasant and everyone enjoyed the walk today."
    df = spark.createDataFrame([(1, code), (2, prose), (3, None)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in text_stats.code_detect(df).collect()}
    assert got[1]["is_code"] is True
    assert got[1]["n_code_lines"] == 3  # def line, indented return, `;` line
    assert got[2]["is_code"] is False
    assert got[2]["n_code_lines"] == 0
    assert got[3] == {"doc_id": 3, "n_lines": 0, "n_code_lines": 0,
                      "n_sym_chars": 0, "code_bp": 0, "is_code": False}


# ---------------------------------------------------------- markdown_strip


def test_markdown_strip_rewrites(spark):
    from pdf_extractors_spark.operators import text_stats

    md = (
        "## Title\n"
        "Some **bold** and *em* and `code` here.\n"
        "- item one\n"
        "1. item two\n"
        "> quoted\n"
        "[link text](http://x) and ![alt](http://y)\n"
        "```python\n"
        "print(1)\n"
        "```\n"
        "---\n"
    )
    df = spark.createDataFrame([(1, md), (2, None)], "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in text_stats.markdown_strip(df).collect()}
    plain = got[1]["plain_text"]
    assert "Title" in plain and "##" not in plain
    assert "bold" in plain and "**" not in plain
    assert "code" in plain and "`" not in plain
    assert "item one" in plain and "- item" not in plain
    assert "quoted" in plain and "> " not in plain
    assert "link text" in plain and "http://x" not in plain
    assert "alt" in plain and "![" not in plain
    assert "print(1)" in plain and "```" not in plain
    assert got[1]["n_removed_chars"] == len(md) - len(plain)
    assert got[2]["plain_text"] is None
    assert got[2]["n_removed_chars"] == 0


# ----------------------------------------------------- special_token_leaks


def test_special_token_leaks_counts_per_token(spark):
    from pdf_extractors_spark.operators import text_stats

    rows = [
        (1, "clean document, nothing leaked"),
        (2, "x <|endoftext|> y <|endoftext|> z [INST] w"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["token"]): r["n_hits"]
           for r in text_stats.special_token_leaks(df).collect()}
    assert got == {(2, "<|endoftext|>"): 2, (2, "[INST]"): 1}


# -------------------------------------------------------------- plan_audit


def test_plan_audit_reads_shuffle_facts(spark):
    from pdf_extractors_spark import plans
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("c", 1)], "conv_id string, v int"
    ).groupBy("conv_id").agg(F.sum("v").alias("s"))
    a = plans.plan_audit(df)
    assert a.n_exchanges == 1
    assert a.shuffles_only_on == {"conv_id"}
    assert not a.has_single_partition
    assert a.python_stages == []


def test_assert_plan_raises_with_plan_attached(spark):
    import pytest

    from pdf_extractors_spark import plans

    from pyspark.sql import functions as F

    df = (
        spark.createDataFrame([(1, 2)], "k int, v int")
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    # the aggregation shuffles once; a zero-exchange budget must fail
    # and carry the plan text in the message
    with pytest.raises(AssertionError) as e:
        plans.assert_plan(df, max_exchanges=0)
    assert "exchanges > budget" in str(e.value)
    assert "Physical Plan" in str(e.value)


def test_assert_plan_flags_python_and_passes_clean(spark):
    import pytest

    from pdf_extractors_spark import pipeline, plans

    t = spark.createDataFrame(
        [("c", 0, "user", "x")],
        "conv_id string, turn_idx int, role string, text string",
    )
    # the Arrow extraction stage IS a python stage — no_python must flag it
    with pytest.raises(AssertionError, match="Python stages"):
        plans.assert_plan(
            t.withColumnRenamed("role", "tool").withColumn(
                "ts", pipeline.F.current_timestamp()
            ).transform(lambda d: pipeline.extract_transcripts(
                d.select("conv_id", "turn_idx", "text", "tool", "ts",
                         pipeline.F.lit("user").alias("role")))),
            no_python=True,
        )
    # a pure-column audit passes the full budget
    plans.assert_plan(
        pipeline.watermark_lateness(
            t.select("conv_id", "turn_idx",
                     pipeline.F.current_timestamp().alias("ts"))
        ),
        max_exchanges=1,
        no_single_partition=True,
        no_python=True,
        shuffle_keys={"conv_id"},
    )


# ----------------------------------------------------------- domain_quality


def test_domain_quality_rollup_and_verdict(spark):
    from pdf_extractors_spark.operators import urls

    good = ("the quick brown fox jumps with many common stopwords and the "
            "usual flowing prose that scores well " * 5)
    spam = "$$$ !!! @@@ ### %%% ^^^ &&& *** ((( )))"
    rows = (
        [(i, f"{good} https://good.example.org/a") for i in range(3)]
        + [(10 + i, f"{spam} http://spam.example.net/b") for i in range(3)]
        + [(20, f"{good} https://rare.example.io/once")]  # below min_docs
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["domain"]: r.asDict() for r in urls.domain_quality(df).collect()}
    assert set(got) == {"good.example.org", "spam.example.net"}
    assert got["good.example.org"]["n_docs"] == 3
    assert got["good.example.org"]["blocked"] is False
    assert got["spam.example.net"]["blocked"] is True


def test_domain_quality_distinct_per_doc(spark):
    from pdf_extractors_spark.operators import urls

    # one doc stuffing its own domain 5 times still counts once
    text = "words " * 30 + "http://stuff.example.com/a " * 5
    df = spark.createDataFrame(
        [(i, text) for i in range(3)], "doc_id long, text string"
    )
    r = urls.domain_quality(df).collect()
    assert len(r) == 1 and r[0]["n_docs"] == 3


# --------------------------------------------------------------- lsh_tuning


def test_lsh_tuning_table_matches_hand_math(spark):
    from pdf_extractors_spark.operators import dedup

    table = {(d["bands"], d["rows"]): d for d in dedup.lsh_tuning(0.5, k=8)}
    # factorizations of 8 only
    assert set(table) == {(8, 1), (4, 2), (2, 4), (1, 8)}
    # hand math at s=0.5, b=4, r=2: 1 - (1 - 0.25)^4 = 0.68359375
    assert abs(table[(4, 2)]["p_collision_at_threshold"] - 0.68359375) < 1e-12
    # s50 rises with rows (stricter banding catches only higher similarity)
    s50s = [table[k]["s50"] for k in [(8, 1), (4, 2), (2, 4), (1, 8)]]
    assert s50s == sorted(s50s)
    import pytest

    with pytest.raises(ValueError):
        dedup.lsh_tuning(1.5)


# ---------------------------------------------------------- markdown_tables


def test_markdown_tables_cells_and_separator(spark):
    from pdf_extractors_spark.operators import text_stats

    md = (
        "intro prose\n"
        "| h1 | h2 |\n"
        "|----|:--:|\n"
        "| a  | b  |\n"
        "| c  | d  |\n"
        "gap line\n"
        "| x |\n"
    )
    df = spark.createDataFrame([(1, md), (2, "no tables here")],
                               "doc_id long, text string")
    rows = text_stats.markdown_tables(df).collect()
    got = {(r["table_idx"], r["row_idx"], r["col_idx"]): r["cell"] for r in rows}
    assert all(r["doc_id"] == 1 for r in rows)
    # table 0: header + 2 data rows (separator dropped), 2 cols
    assert got[(0, 0, 0)] == "h1" and got[(0, 0, 1)] == "h2"
    assert got[(0, 1, 0)] == "a" and got[(0, 2, 1)] == "d"
    # table 1 (after the gap): single cell
    assert got[(1, 0, 0)] == "x"
    assert len(got) == 7


def test_markdown_tables_empty_and_null(spark):
    from pdf_extractors_spark.operators import text_stats

    df = spark.createDataFrame([(1, None), (2, "| |")], "doc_id long, text string")
    rows = text_stats.markdown_tables(df).collect()
    # "| |" has one empty cell -> one row with cell ""
    assert [(r["doc_id"], r["cell"]) for r in rows] == [(2, "")]


# ------------------------------------------------------------ render_chatml


def test_render_chatml_order_and_markers(spark):
    rows = [
        ("a", 1, "assistant", "hi there"),
        ("a", 0, "user", "hello"),
        ("a", 2, "tool", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    r = pipeline.render_chatml(df).collect()[0]
    assert r["n_turns"] == 3
    assert r["chatml_text"] == (
        "<|im_start|>user\nhello<|im_end|>\n"
        "<|im_start|>assistant\nhi there<|im_end|>\n"
        "<|im_start|>tool\n<|im_end|>"
    )


def test_render_chatml_roundtrip_with_leak_audit(spark):
    """The rendered text is exactly what special_token_leaks should
    flag: n markers of each kind per conversation."""
    from pdf_extractors_spark.operators import text_stats

    rows = [("a", i, "user", f"t{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    rendered = pipeline.render_chatml(df).select(
        pipeline.F.col("conv_id").alias("doc_id"),
        pipeline.F.col("chatml_text").alias("text"),
    )
    got = {r["token"]: r["n_hits"]
           for r in text_stats.special_token_leaks(rendered).collect()}
    assert got == {"<|im_start|>": 4, "<|im_end|>": 4}


# ------------------------------------------------------------ corpus_health


def test_corpus_health_dashboard(spark):
    from pdf_extractors_spark.operators import text_stats

    rows = [
        (1, "the quick brown fox"),
        (2, "THE  quick  brown FOX"),  # same after normalization
        (3, "something else entirely"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = text_stats.corpus_health(df).collect()[0]
    assert r["n_docs"] == 4 and r["n_null_text"] == 1
    assert r["n_distinct"] == 2
    # 3 non-null docs, 2 distinct -> 1/3 duplicate mass, half-up
    assert r["exact_dup_bp"] == 3333
    assert r["total_ws_tokens"] == 4 + 4 + 3


def test_corpus_health_quality_matches_quality_score(spark):
    """The inlined quality term must equal quality_score's quality_bp
    exactly (single doc: mean == the score)."""
    from pdf_extractors_spark.operators import text_stats

    text = "the and was with some words of ordinary prose, twice over."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    want = text_stats.quality_score(df).collect()[0]["quality_bp"]
    got = text_stats.corpus_health(df).collect()[0]["mean_quality_bp"]
    assert got == want


# --------------------------------------------------------- filter_attrition


def test_filter_attrition_marginal_and_cumulative(spark):
    from pdf_extractors_spark.operators import text_stats

    prose = ("the cat and the dog sat in the sun and that was good for "
             "everyone involved in the afternoon.")
    rows = [
        (1, prose),                       # passes everything
        (2, "too short"),                 # fails word_count
        (3, "#### " * 40),                # fails symbol ratio (and stopwords)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rep = {r["rule"]: r.asDict() for r in text_stats.filter_attrition(df).collect()}
    assert list(text_stats.GOPHER_RULES) == sorted(rep, key=lambda k: rep[k]["rule_order"])
    assert rep["word_count"]["n_flagged"] == 1   # doc2 only (doc3 has 40 words)
    assert rep["symbol_ratio"]["n_flagged"] == 1  # doc3's hash flood
    # cumulative never decreases and last row matches gopher_pass count
    cums = [rep[r]["n_cum_removed"] for r in text_stats.GOPHER_RULES]
    assert cums == sorted(cums)
    n_pass = text_stats.gopher_quality_flags(df).filter("gopher_pass").count()
    assert rep["stopword_frac"]["n_remaining"] == n_pass


# ----------------------------------------------------------- windowed_dedup


def test_windowed_dedup_horizon_contract(spark):
    from datetime import datetime

    from pdf_extractors_spark.operators import dedup

    t = lambda h, m=0: datetime(2026, 1, 1, h, m)
    rows = [
        (1, "same text", t(10, 5)),
        (2, "same text", t(10, 40)),   # same hour window: collapses
        (3, "same text", t(11, 5)),    # next window: SURVIVES (horizon)
        (4, "other", t(10, 5)),
        (5, "null ts", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    got = dedup.windowed_dedup(df, window="1 hour").collect()
    by = {}
    for r in got:
        by.setdefault(r["text_hash"], []).append((r["window_start"], r["n_dups"], r["keep_id"]))
    counts = sorted(
        (len(v), sorted(n for _, n, _ in v)) for v in by.values()
    )
    # "same text": two windows, (2 dups, 1 dup); "other": 1; "null ts": 1
    assert counts == [(1, [1]), (1, [1]), (2, [1, 2])]
    # null event time forms its own explicit window
    assert any(r["window_start"] is None for r in got)
    # the within-window keeper is the min id
    same = [v for v in by.values() if len(v) == 2][0]
    assert sorted(k for _, n, k in same if n == 2) == [1]


# ---------------------------------------------------------- embedding_stats


def test_embedding_stats_flags_broken_vectors(spark):
    from pdf_extractors_spark.operators import similarity

    rows = [
        (1, [1.0, 0.0, -2.0]),
        (2, [0.0, 0.0, 0.0]),         # the dead vector
        (3, [float("nan"), 1.0]),     # NaN component
        (4, None),                    # null embedding column
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r.asDict() for r in similarity.embedding_stats(df).collect()}
    assert got[1] == {"vec_id": 1, "dim": 3, "n_zeros": 1, "n_bad": 0,
                      "norm2_q": 1000**2 + 0 + 2000**2}
    assert got[2]["norm2_q"] == 0 and got[2]["n_zeros"] == 3
    assert got[3]["n_bad"] == 1 and got[3]["norm2_q"] == 1000**2
    assert got[4] == {"vec_id": 4, "dim": 0, "n_zeros": 0, "n_bad": 0,
                      "norm2_q": 0}


# ------------------------------------------------------ source_mirror_pairs


def test_source_mirror_pairs_attribution(spark):
    from pdf_extractors_spark.operators import dedup

    rows = [
        (1, "shared story A", "feed1"),
        (2, "Shared  STORY a", "feed2"),  # same after normalization
        (3, "shared story B", "feed1"),
        (4, "shared story B", "feed2"),
        (5, "shared story B", "feed3"),  # 3-way: C(3,2) pairs
        (6, "unique to feed3", "feed3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r["src_a"], r["src_b"]): r["n_shared"]
           for r in dedup.source_mirror_pairs(df, min_shared=1).collect()}
    assert got == {
        ("feed1", "feed2"): 2,  # story A (normalized) + story B
        ("feed1", "feed3"): 1,
        ("feed2", "feed3"): 1,
    }
    # min_shared floor drops the weak pairs
    got2 = {(r["src_a"], r["src_b"]): r["n_shared"]
            for r in dedup.source_mirror_pairs(df, min_shared=2).collect()}
    assert got2 == {("feed1", "feed2"): 2}


# ------------------------------------------------- tool_latency_percentiles


def test_tool_latency_percentiles_tails(spark):
    rows = (
        [("a", i, "tool", "srch", f'{{"status":"ok","latency_ms":{10 * (i + 1)}}}')
         for i in range(9)]
        + [("a", 9, "tool", "srch", '{"status":"ok","latency_ms":1000}')]  # the tail
        + [("a", 10, "tool", "srch", "not an envelope")]   # excluded from basis
        + [("a", 11, "user", None, '{"latency_ms":5}')]    # wrong role: ignored
    )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, text string"
    )
    r = pipeline.tool_latency_percentiles(df).collect()[0]
    assert r["n_timed"] == 10
    assert r["p50_ms"] == 55.0   # interpolated between 50 and 60
    assert r["max_ms"] == 1000
    assert r["p99_ms"] > r["p90_ms"] >= r["p50_ms"]


# --------------------------------------------------------- role_token_share


def test_role_token_share_balance(spark):
    rows = [
        ("a", "user", "three words here"),
        ("a", "assistant", "one two three four five six seven"),
        ("a", "tool", "tool output not dialogue"),
        ("b", "tool", "only tooling"),      # no dialogue: share 0
        ("c", "user", "   "),               # whitespace-only: 0 tokens
    ]
    df = spark.createDataFrame(rows, "conv_id string, role string, text string")
    got = {r["conv_id"]: r.asDict() for r in pipeline.role_token_share(df).collect()}
    assert got["a"]["user_tokens"] == 3
    assert got["a"]["assistant_tokens"] == 7
    assert got["a"]["tool_tokens"] == 4
    assert got["a"]["assistant_share_bp"] == 7000
    assert got["b"]["assistant_share_bp"] == 0 and got["b"]["tool_tokens"] == 2
    assert got["c"]["user_tokens"] == 0


# ----------------------------------------------------------- vocab_coverage


def test_vocab_coverage_top_k_share(spark):
    from pdf_extractors_spark.operators import text_stats

    # 10 'a', 5 'b', 1 each of c d e -> total 18; top-2 covers 15
    text = " ".join(["a"] * 10 + ["b"] * 5 + ["c", "d", "e"])
    df = spark.createDataFrame([(1, text), (2, None)], "doc_id long, text string")
    r = text_stats.vocab_coverage(df, k=2).collect()[0]
    assert (r["k_requested"], r["k_effective"]) == (2, 2)
    assert (r["covered_occurrences"], r["total_occurrences"]) == (15, 18)
    assert r["coverage_bp"] == 8333
    # k beyond the vocabulary: full coverage, k_effective = distinct tokens
    r2 = text_stats.vocab_coverage(df, k=100).collect()[0]
    assert r2["k_effective"] == 5 and r2["coverage_bp"] == 10000


# ------------------------------------------------- response_grounding


def test_response_grounding_planted(spark):
    rows = [
        # conv a: user context at 0, assistant at 1 reuses 3 of 4 tokens
        ("a", 0, "user", "the quick brown fox"),
        ("a", 1, "assistant", "the brown fox jumps"),
        # later context must NOT ground an EARLIER assistant turn
        ("a", 2, "tool", "jumps jumps jumps"),
        ("a", 3, "assistant", "jumps again"),   # 'jumps' now grounded (turn 2)
        # blank assistant turn: preserved with zeros
        ("a", 4, "assistant", "   "),
        # conv b: assistant with no prior context at all
        ("b", 0, "assistant", "hello world"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in pipeline.response_grounding(df).collect()
    }
    assert set(got) == {("a", 1), ("a", 3), ("a", 4), ("b", 0)}
    a1 = got[("a", 1)]
    assert (a1["n_tokens"], a1["grounded_tokens"]) == (4, 3)
    assert a1["grounding_bp"] == 7500
    a3 = got[("a", 3)]
    assert (a3["n_tokens"], a3["grounded_tokens"]) == (2, 1)
    assert a3["grounding_bp"] == 5000
    assert got[("a", 4)]["n_tokens"] == 0
    assert got[("a", 4)]["grounding_bp"] == 0
    assert got[("b", 0)]["grounded_tokens"] == 0


def test_response_grounding_matches_sequential_reference(spark):
    import random

    rng = random.Random(20260819)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for c in range(8):
        for t in range(rng.randrange(1, 9)):
            role = rng.choice(["user", "assistant", "tool"])
            text = (
                None
                if rng.random() < 0.1
                else " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 6)))
            )
            rows.append((f"c{c}", t, role, text))

    # sequential reference: context tokens register their first-seen
    # turn index as the conversation streams in turn order
    want = {}
    for conv in {r[0] for r in rows}:
        turns = sorted((r for r in rows if r[0] == conv), key=lambda r: r[1])
        first = {}
        for _, idx, role, text in turns:
            toks = (text or "").strip().lower().split()
            if role == "assistant":
                g = sum(1 for w in toks if first.get(w, 10**9) < idx)
                n = len(toks)
                bp = (2 * 10000 * g + n) // (2 * n) if n else 0
                want[(conv, idx)] = (n, g, bp)
            else:
                for w in toks:
                    first.setdefault(w, idx)

    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["n_tokens"], r["grounded_tokens"], r["grounding_bp"]
        )
        for r in pipeline.response_grounding(df).collect()
    }
    assert got == want


# ------------------------------------------------------- refusal_scan


def test_refusal_scan_planted(spark):
    rows = [
        ("a", 0, "user", "please do the thing"),
        ("a", 1, "assistant", "I'm sorry, I can't help with that."),
        ("a", 2, "user", "ok try again"),
        ("a", 3, "assistant", "Here is the answer you wanted."),
        # unanchored cue mid-text
        ("b", 0, "assistant", "Well, as an AI I summarize documents."),
        # anchored cue NOT at start: must not match
        ("c", 0, "assistant", "He said I cannot and left."),
        # null text and a conversation with no assistant turns at all
        ("c", 1, "assistant", None),
        ("d", 0, "user", "just a user monologue"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        r["conv_id"]: r.asDict() for r in pipeline.refusal_scan(df).collect()
    }
    assert set(got) == {"a", "b", "c"}  # 'd' has no assistant turn: no row
    a = got["a"]
    assert (a["n_assistant"], a["n_refusals"], a["first_refusal_idx"]) == (2, 1, 1)
    assert a["refusal_bp"] == 5000
    assert got["b"]["n_refusals"] == 1 and got["b"]["first_refusal_idx"] == 0
    c = got["c"]
    assert (c["n_refusals"], c["first_refusal_idx"]) == (0, -1)
    assert c["refusal_bp"] == 0


def test_refusal_scan_battery_parity_with_python_re(spark):
    """The Spark rlike battery and Python re agree cue-by-cue — the
    guarantee the DuckDB oracle leans on (Java regex vs RE2 vs sre all
    executing the same anchors/alternation/literals identically)."""
    import re

    from pdf_extractors_spark.pipeline import REFUSAL_PATTERNS

    rx = re.compile("|".join(f"(?:{p})" for p in REFUSAL_PATTERNS))
    texts = [
        "i cannot do that",
        "I can't help",
        "i'm sorry about this",
        "i am sorry, no",
        "speaking as an ai model",
        "i am unable to comply",
        "i'm unable to verify",
        "sorry is not a prefix here",
        "can i help you cannot be matched",
        "",
        "   i cannot (leading spaces trimmed first)",
    ]
    rows = [("c", i, "assistant", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = pipeline.refusal_scan(df).collect()[0]
    want_hits = sum(1 for t in texts if rx.search(t.strip().lower()))
    assert got["n_refusals"] == want_hits == 8
