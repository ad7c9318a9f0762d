"""Round-3 operator tests: per-group caps, skew diagnostics, BPE pair
counts, unicode normalization, tool-call JSON rollups."""

from __future__ import annotations

import unicodedata

from pdf_extractors_spark import pipeline
from pdf_extractors_spark.operators import salting, sampling, text_stats


# --------------------------------------------------------- cap_per_group


def test_cap_per_group_keeps_best_k(spark):
    rows = [(i, f"src{i % 3}", 100 - i) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = sampling.cap_per_group(df, "source", k=4).collect()
    assert len(out) == 12
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["n_chars"])
    # the 4 longest docs of each source survive
    for src in ("src0", "src1", "src2"):
        base = int(src[-1])
        expected = sorted(
            (100 - i for i in range(base, 30, 3)), reverse=True
        )[:4]
        assert sorted(by_src[src], reverse=True) == expected


def test_cap_per_group_partitioning_invariant(spark):
    rows = [(i, f"s{i % 5}", (i * 37) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    a = {tuple(r) for r in sampling.cap_per_group(df, "source", k=7).collect()}
    b = {
        tuple(r)
        for r in sampling.cap_per_group(df.repartition(13), "source", k=7).collect()
    }
    assert a == b and len(a) == 35


def test_cap_per_group_ties_break_on_doc_id(spark):
    # all same length: survivors must be the k smallest doc_ids
    rows = [(i, "s", 50) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = sorted(r["doc_id"] for r in sampling.cap_per_group(df, "source", k=3).collect())
    assert out == [0, 1, 2]


# ----------------------------------------------------------- skew_report


def test_skew_report_exact_values(spark):
    # keys: a=6 rows, b=3, c=1  \u2192 total 10, nkeys 3, mean = 10 div 3 = 3
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(rows, "user_id string")
    got = {r["user_id"]: r.asDict() for r in salting.skew_report(df, "user_id", top_k=2).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["rank"] == 1 and got["b"]["rank"] == 2
    assert got["a"]["n_rows"] == 6 and got["b"]["n_rows"] == 3
    assert got["a"]["share_ppm"] == 600000
    assert got["b"]["share_ppm"] == 300000
    assert got["a"]["cum_share_ppm"] == 600000
    assert got["b"]["cum_share_ppm"] == 900000
    assert got["a"]["x_mean_ppm"] == 2000000  # 6 / mean(3)
    assert got["b"]["x_mean_ppm"] == 1000000


def test_skew_report_rank_ties_deterministic(spark):
    rows = [("x",)] * 2 + [("y",)] * 2 + [("z",)]
    df = spark.createDataFrame(rows, "user_id string")
    out = salting.skew_report(df, "user_id", top_k=3).collect()
    assert [r["user_id"] for r in out] == ["x", "y", "z"]


# ------------------------------------------------------- bpe_pair_counts


def test_bpe_pair_counts_hand_checked(spark):
    df = spark.createDataFrame(
        [(0, "abab ab"), (1, "Ba  x")], "doc_id long, text string"
    )
    got = {r["pair"]: r["n"] for r in text_stats.bpe_pair_counts(df).collect()}
    # lowercased: "abab" -> ab, ba, ab ; "ab" -> ab ; "ba" -> ba ;
    # "x" has length 1 -> no pairs
    assert got == {"ab": 3, "ba": 2}


def test_bpe_pair_counts_topk_order_deterministic(spark):
    df = spark.createDataFrame([(0, "aa bb cc aa bb aa")], "doc_id long, text string")
    out = text_stats.bpe_pair_counts(df, top_k=2).collect()
    assert [(r["pair"], r["n"]) for r in out] == [("aa", 3), ("bb", 2)]


def test_bpe_pair_counts_null_and_empty(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "hi")], "doc_id long, text string"
    )
    got = {r["pair"]: r["n"] for r in text_stats.bpe_pair_counts(df).collect()}
    assert got == {"hi": 1}


# ----------------------------------------------------- unicode_normalize


def test_unicode_normalize_composes_nfc(spark):
    decomposed = "cafe\u0301 u\u0308ber"
    df = spark.createDataFrame(
        [(0, decomposed), (1, "plain ascii"), (2, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in text_stats.unicode_normalize(df).collect()}
    assert got[0]["text_nfc"] == unicodedata.normalize("NFC", decomposed)
    assert got[0]["text_nfc"] == "caf\u00e9 \u00fcber"
    assert got[0]["changed"] is True
    assert got[1]["text_nfc"] == "plain ascii" and got[1]["changed"] is False
    assert got[2]["text_nfc"] is None and got[2]["changed"] is False


def test_unicode_normalize_nfkc_folds_compat(spark):
    df = spark.createDataFrame([(0, "\ufb01ne \u2460")], "doc_id long, text string")
    got = text_stats.unicode_normalize(df, form="NFKC").collect()[0]
    assert got["text_nfc"] == "fine 1"
    assert got["changed"] is True


def test_unicode_normalize_rejects_bad_form(spark):
    import pytest

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        text_stats.unicode_normalize(df, form="NFX")


def test_unicode_normalize_enables_exact_dedup(spark):
    # the motivating property: composed and decomposed 'caf\u00e9' dedup to
    # one doc after normalization, two without
    df = spark.createDataFrame(
        [(0, "caf\u00e9"), (1, "cafe\u0301")], "doc_id long, text string"
    )
    assert df.select("text").distinct().count() == 2
    assert (
        text_stats.unicode_normalize(df).select("text_nfc").distinct().count()
        == 1
    )


# -------------------------------------------------------- tool_call_stats


def test_tool_call_stats_counts_and_latency(spark):
    rows = [
        ("c0", 0, "tool", '{"status": "ok", "latency_ms": 10}', "search"),
        ("c0", 1, "tool", '{"status": "ok", "latency_ms": 30}', "search"),
        ("c0", 2, "tool", '{"status": "error", "latency_ms": 5}', "search"),
        ("c0", 3, "tool", "raw text, not json", "search"),
        ("c0", 4, "tool", '{"other": 1}', "search"),  # valid JSON, no status
        ("c0", 5, "tool", None, "search"),
        ("c0", 6, "assistant", '{"status": "ok"}', "search"),  # not a tool turn
        ("c1", 0, "tool", '{"status": "ok", "latency_ms": 7}', "fetch"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = {r["tool"]: r.asDict() for r in pipeline.tool_call_stats(df).collect()}
    s = got["search"]
    assert s["n_calls"] == 6
    assert s["n_ok"] == 2 and s["n_error"] == 1 and s["n_invalid"] == 3
    assert s["total_latency_ms"] == 45 and s["max_latency_ms"] == 30
    f = got["fetch"]
    assert (f["n_calls"], f["n_ok"], f["total_latency_ms"]) == (1, 1, 7)


def test_tool_call_stats_all_invalid_tool(spark):
    rows = [("c0", 0, "tool", "oops", "shell"), ("c0", 1, "tool", "{bad", "shell")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = pipeline.tool_call_stats(df).collect()[0]
    assert got["n_invalid"] == 2 and got["n_ok"] == 0
    assert got["total_latency_ms"] is None and got["max_latency_ms"] is None


# ------------------------------------------------------------ tokenize_ids


def test_tokenize_ids_hand_checked(spark):
    df = spark.createDataFrame(
        [(0, "a b a c"), (1, "b a zzz"), (2, None)],
        "doc_id long, text string",
    )
    # counts: a=3, b=2, c=1, zzz=1 -> vocab(3): a=1, b=2, c=3; zzz OOV
    got = {
        r["doc_id"]: r.asDict()
        for r in text_stats.tokenize_ids(df, vocab_size=3).collect()
    }
    assert got[0]["ids_str"] == "1 2 1 3"
    assert got[0]["n_tokens"] == 4 and got[0]["n_oov"] == 0
    assert got[1]["ids_str"] == "2 1 0"
    assert got[1]["n_oov"] == 1
    assert got[2]["n_tokens"] == 0 and got[2]["ids_str"] is None


def test_tokenize_ids_order_survives_repartition(spark):
    rows = [(i, " ".join(f"w{(i * 31 + j) % 9}" for j in range(20))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["ids_str"] for r in text_stats.tokenize_ids(df, 5).collect()}
    b = {
        r["doc_id"]: r["ids_str"]
        for r in text_stats.tokenize_ids(df.repartition(11), 5).collect()
    }
    assert a == b
    assert all(len(v.split(" ")) == 20 for v in a.values())


# -------------------------------------------- time_sessionize / bigrams


def test_time_sessionize_gaps_and_null_ts(spark):
    from datetime import datetime, timedelta, timezone

    def ts(s):
        return datetime(2026, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=s)

    rows = [
        ("a", 0, ts(0)), ("a", 1, ts(10)), ("a", 2, ts(20)),
        ("a", 3, ts(3000)), ("a", 4, ts(3010)), ("a", 5, ts(7000)),
        ("b", 0, ts(5)),
        # a null timestamp starts a session loudly, and so does the row
        # after it (its gap is null too)
        ("c", 0, ts(0)), ("c", 1, None), ("c", 2, ts(100)),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    got = {
        (r["conv_id"], r["turn_idx"]): r["session_idx"]
        for r in pipeline.time_sessionize(df).collect()
    }
    assert got == {
        ("a", 0): 0, ("a", 1): 0, ("a", 2): 0,
        ("a", 3): 1, ("a", 4): 1, ("a", 5): 2,
        ("b", 0): 0,
        ("c", 0): 0, ("c", 1): 1, ("c", 2): 2,
    }


def test_time_sessionize_partitioning_invariant(spark):
    from datetime import datetime, timedelta, timezone

    base = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        (f"c{i % 7}", i // 7, base + timedelta(seconds=(i * 733) % 5000))
        for i in range(140)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    a = {tuple(r) for r in pipeline.time_sessionize(df).collect()}
    b = {tuple(r) for r in pipeline.time_sessionize(df.repartition(13)).collect()}
    assert a == b


def test_tool_transitions_counts(spark):
    rows = [
        ("a", 0, "user", None), ("a", 1, "tool", "grep"),
        ("a", 2, "assistant", None), ("a", 3, "tool", "read"),
        ("a", 4, "tool", "grep"),
        ("b", 0, "tool", "read"),          # lone tool turn: no edge
        ("c", 0, "tool", "grep"), ("c", 1, "tool", "read"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )
    got = {
        (r["tool"], r["next_tool"]): r["n_transitions"]
        for r in pipeline.tool_transitions(df).collect()
    }
    assert got == {("grep", "read"): 2, ("read", "grep"): 1}


# ------------------------------------------------------ fingerprint_pairs


def test_fingerprint_pairs_exact_dups(spark):
    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "alpha beta gamma delta epsilon zeta eta theta",
        2: "one two three four five six seven eight nine",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    out = [
        (r["id_a"], r["id_b"], r["n_shared"])
        for r in text_stats.fingerprint_pairs(df).collect()
    ]
    # identical docs share all 4 minima; doc 2 shares none
    assert out == [(0, 1, 4)]


def test_fingerprint_pairs_hot_bucket_guard(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    many = spark.createDataFrame(
        [(i, text) for i in range(50)], "doc_id long, text string"
    )
    # every minimum sits in a 50-doc bucket > the cap: no candidates at
    # all (boilerplate, not signal), instead of 50*49/2 pairs
    assert text_stats.fingerprint_pairs(many, max_bucket=10).count() == 0


# ------------------------------------- lang keep_cols / approx / report


def test_lang_id_keep_cols_carries_label(spark):
    df = spark.createDataFrame(
        [(0, "the cat and the dog is here", "en"),
         (1, "der hund und die katze ist da", "de")],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: (r["lang"], r["lang_pred"])
        for r in text_stats.lang_id(df, keep_cols=("lang",)).collect()
    }
    assert out == {0: ("en", "en"), 1: ("de", "de")}


def test_approx_percentile_brackets_exact(spark):
    # the sketch must land within the value range and, at accuracy 1000
    # on ~hundreds of rows per group, equal the exact percentile
    import pyspark.sql.functions as F

    rows = [(i, "en" if i % 2 else "de", (i * 37) % 997) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    exact = {
        r["lang"]: r["p50"]
        for r in df.groupBy("lang")
        .agg(F.expr("percentile(n_chars, 0.5)").alias("p50"))
        .collect()
    }
    approx = {
        r["lang"]: r["p50"]
        for r in df.groupBy("lang")
        .agg(F.expr("approx_percentile(n_chars, 0.5, 1000)").alias("p50"))
        .collect()
    }
    for lang in exact:
        assert abs(approx[lang] - exact[lang]) <= max(2.0, 0.01 * exact[lang])


def test_cluster_size_histogram_from_pairs(spark):
    import pyspark.sql.functions as F

    from pdf_extractors_spark.operators import dedup

    # two components: {1,2,3} (size 3) and {10,11} (size 2)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = dedup.connected_components(pairs)
    sizes = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    hist = {
        r["cluster_size"]: r["n_clusters"]
        for r in sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .collect()
    }
    assert hist == {3: 1, 2: 1}
