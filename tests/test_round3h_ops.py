"""Round-3h operators: ndcg_at_k (graded ranking eval), rouge_n_pairs
(clipped n-gram overlap), warc_records/warc_render (crawl-container
source). All hand-computed exact-integer expectations."""

import pytest

from pyspark.sql import functions as F

from pdf_extractors_spark.operators import warc
from pdf_extractors_spark.operators.retrieval import ndcg_at_k, ndcg_discounts
from pdf_extractors_spark.operators.text_stats import rouge_n_pairs


# --------------------------------------------------------------- ndcg_at_k

# the first three discount weights, hardcoded so silent drift in
# ndcg_discounts (scale change, rounding change) fails loudly here
_W1, _W2, _W3 = 4294967296, 2709822658, 2147483648

_N_SCHEMA = "q string, id string, score long, rel long"


def test_ndcg_discounts_pinned():
    assert ndcg_discounts(3) == [_W1, _W2, _W3]


def _ndcg(spark, rows, k=3, **kw):
    out = ndcg_at_k(
        spark.createDataFrame(rows, _N_SCHEMA), "q", "id", "score", "rel",
        k=k, **kw,
    ).collect()
    return {r["query"]: r.asDict() for r in out}


def test_ndcg_hand_computed(spark):
    rows = [
        # q1 ranking by score desc: d(rel 0), a(rel 3), b(rel 0), c(rel 1)
        # — c sits at position 4, outside k=3, so its gain never counts
        ("q1", "a", 30, 3),
        ("q1", "b", 20, 0),
        ("q1", "c", 10, 1),
        ("q1", "d", 40, 0),
    ]
    r = _ndcg(spark, rows)["q1"]
    assert r["n_items"] == 4
    assert r["dcg_scaled"] == 7 * _W2  # gain 2^3-1 at realized position 2
    assert r["idcg_scaled"] == 7 * _W1 + 1 * _W2  # ideal: a then c
    assert r["ndcg_ppm"] == (7 * _W2 * 10**6) // (7 * _W1 + 1 * _W2)
    assert r["ndcg_ppm"] == 578764


def test_ndcg_perfect_and_degenerate(spark):
    rows = [
        # q2: realized order == ideal order -> ndcg exactly 10^6
        ("q2", "a", 9, 2),
        ("q2", "b", 5, 1),
        # q3: all rel 0 -> idcg 0 -> null, never a fake score
        ("q3", "a", 9, 0),
        ("q3", "b", 5, 0),
    ]
    out = _ndcg(spark, rows)
    assert out["q2"]["ndcg_ppm"] == 10**6
    assert out["q3"]["ndcg_ppm"] is None
    assert out["q3"]["idcg_scaled"] == 0


def test_ndcg_tiebreak_is_total(spark):
    # equal scores: id asc breaks the tie, so b (rel 2) ranks AFTER a
    # (rel 0) — the statistic is defined, not engine-dependent
    rows = [("q", "a", 7, 0), ("q", "b", 7, 2)]
    r = _ndcg(spark, rows)["q"]
    assert r["dcg_scaled"] == 3 * _W2
    assert r["idcg_scaled"] == 3 * _W1


def test_ndcg_clamps_and_drops_nulls(spark):
    rows = [
        ("q", "a", 9, -5),   # clamps to rel 0
        ("q", "b", 5, 1),
        ("q", "c", 1, None), # null judgment dropped, not zeroed
    ]
    r = _ndcg(spark, rows)["q"]
    assert r["n_items"] == 2
    assert r["dcg_scaled"] == 0 * _W1 + 1 * _W2
    assert r["idcg_scaled"] == 1 * _W1


def test_ndcg_bounds_enforced():
    with pytest.raises(ValueError):
        ndcg_at_k(None, "q", "id", "s", "r", k=0)
    with pytest.raises(ValueError):
        ndcg_at_k(None, "q", "id", "s", "r", max_rel=21)


# ----------------------------------------------------------- rouge_n_pairs

_R_SCHEMA = "conv_id string, turn_idx int, cand string, ref string"


def _rouge(spark, rows, n=2):
    out = rouge_n_pairs(
        spark.createDataFrame(rows, _R_SCHEMA), "cand", "ref",
        ("conv_id", "turn_idx"), n=n,
    ).collect()
    return {(r["conv_id"], r["turn_idx"]): r.asDict() for r in out}


def test_rouge_clipped_counts(spark):
    # cand bigrams {a b: 2, b a: 2} (4 total), ref {a b: 1, b a: 1} (2)
    # clipped overlap = min(2,1) + min(2,1) = 2 — a Jaccard-style
    # distinct overlap would claim 2/2 precision; ROUGE clips it to 2/4
    r = _rouge(spark, [("c", 0, "a b a b a", "a b a")])[("c", 0)]
    assert (r["overlap"], r["cand_grams"], r["ref_grams"]) == (2, 4, 2)
    assert r["recall_bp"] == 10000
    assert r["precision_bp"] == 5000
    assert r["f1_bp"] == (2 * 10000 * 2 * 2 + 6) // 12  # half-up of 2/3


def test_rouge_empty_sides(spark):
    out = _rouge(
        spark,
        [
            ("c", 0, "x", "y z"),     # cand has < n tokens: 0 grams
            ("c", 1, None, None),     # both null: row PRESERVED, all null
            ("c", 2, "A  b", "a b"),  # normalization: identical bigram
        ],
    )
    r0 = out[("c", 0)]
    assert (r0["overlap"], r0["cand_grams"], r0["ref_grams"]) == (0, 0, 1)
    assert r0["precision_bp"] is None  # undefined, not 0
    assert r0["recall_bp"] == 0
    assert r0["f1_bp"] == 0
    r1 = out[("c", 1)]
    assert (r1["overlap"], r1["cand_grams"], r1["ref_grams"]) == (0, 0, 0)
    assert r1["recall_bp"] is None
    assert r1["precision_bp"] is None
    assert r1["f1_bp"] is None
    r2 = out[("c", 2)]
    assert r2["f1_bp"] == 10000


def test_rouge_unigram_mode(spark):
    # n=1: plain clipped token overlap
    r = _rouge(spark, [("c", 0, "a a b", "a c")], n=1)[("c", 0)]
    assert (r["overlap"], r["cand_grams"], r["ref_grams"]) == (1, 3, 2)


def test_rouge_rejects_bad_n():
    with pytest.raises(ValueError):
        rouge_n_pairs(None, "c", "r", ("id",), n=0)


# ------------------------------------------------------------ warc records

_W_SCHEMA = (
    "container_id long, typ string, uri string, rid string, body string"
)


def _container(spark, rows, declared=None):
    df = spark.createDataFrame(rows, _W_SCHEMA)
    rec = warc.warc_render("typ", "uri", "rid", "body", declared)
    return (
        df.select("container_id", F.struct(F.col("rid"), rec.alias("r")).alias("s"))
        .groupBy("container_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")), lambda s: s["r"]),
                "",
            ).alias("container")
        )
    )


def test_warc_round_trip(spark):
    rows = [
        (1, "response", "https://x.test/a", "<urn:uuid:1>", "hello world"),
        (1, "request", "https://x.test/b", "<urn:uuid:2>", ""),  # empty body
        (1, "metadata", "https://x.test/c", "<urn:uuid:3>",
         "line one\n\nline three"),  # interior blank lines survive
        (2, "response", "https://x.test/d", "<urn:uuid:4>", "héllo"),
    ]
    out = warc.warc_records(_container(spark, rows)).collect()
    by_rid = {r["record_id"]: r for r in out}
    assert len(out) == 4
    a = by_rid["<urn:uuid:1>"]
    assert (a["warc_type"], a["target_uri"]) == ("response", "https://x.test/a")
    assert a["body"] == "hello world"
    assert a["content_length"] == 11 and a["length_ok"]
    assert by_rid["<urn:uuid:2>"]["body"] == ""
    assert by_rid["<urn:uuid:2>"]["content_length"] == 0
    assert by_rid["<urn:uuid:3>"]["body"] == "line one\n\nline three"
    # WARC counts OCTETS: 'héllo' is 5 chars, 6 utf-8 bytes
    d = by_rid["<urn:uuid:4>"]
    assert d["content_length"] == 6 and d["length_ok"]
    # rec_idx is the stable per-container address (rid sort order here)
    assert [r["rec_idx"] for r in out if r["container_id"] == 1] == [0, 1, 2]


def test_warc_bad_length_flagged_not_dropped(spark):
    rows = [(1, "response", "u", "<r1>", "abc")]
    bad = _container(spark, rows, declared=F.octet_length(F.col("body")) + 2)
    out = warc.warc_records(bad).collect()
    assert len(out) == 1
    assert out[0]["content_length"] == 5
    assert out[0]["body"] == "abc"
    assert out[0]["length_ok"] is False


def test_warc_null_and_empty_container(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "container_id long, container string"
    )
    assert warc.warc_records(df).count() == 0


def test_warc_missing_header_is_null(spark):
    raw = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "Content-Length: 2\r\n"
        "\r\n"
        "ok\r\n\r\n"
    )
    df = spark.createDataFrame([(1, raw)], "container_id long, container string")
    r = warc.warc_records(df).collect()[0]
    assert r["target_uri"] is None and r["record_id"] is None
    assert r["warc_type"] == "response" and r["length_ok"]


# ---------------------------------------------------------- hard_negatives


def test_hard_negatives_hand_computed(spark):
    from pdf_extractors_spark.operators.retrieval import hard_negatives

    scored = spark.createDataFrame(
        [
            ("q1", "a", 90),  # positive — never mined
            ("q1", "b", 80),
            ("q1", "c", 80),  # positive — its tie with b vanishes
            ("q1", "d", 70),
            ("q1", "e", 60),  # rank 3, outside k=2
        ],
        "query_id string, doc_id string, score long",
    )
    pos = spark.createDataFrame(
        [("q1", "a"), ("q1", "c")], "query_id string, doc_id string"
    )
    out = hard_negatives(scored, pos, k=2).collect()
    assert [(r["doc_id"], r["score"], r["neg_rank"]) for r in
            sorted(out, key=lambda r: r["neg_rank"])] == [
        ("b", 80, 1), ("d", 70, 2)
    ]


def test_hard_negatives_tie_and_all_positive(spark):
    from pdf_extractors_spark.operators.retrieval import hard_negatives

    scored = spark.createDataFrame(
        [("q", "y", 50), ("q", "x", 50), ("p", "a", 1)],
        "query_id string, doc_id string, score long",
    )
    pos = spark.createDataFrame(
        [("p", "a")], "query_id string, doc_id string"
    )
    out = hard_negatives(scored, pos, k=5).collect()
    # tie breaks by id asc; query p (all positive) emits nothing
    assert [(r["query_id"], r["doc_id"], r["neg_rank"]) for r in
            sorted(out, key=lambda r: r["neg_rank"])] == [
        ("q", "x", 1), ("q", "y", 2)
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hard_negatives(scored, pos, k=0)


# ------------------------------------------------------------ context_cost


def test_context_cost_hand_computed(spark):
    from pdf_extractors_spark.operators.chat import context_cost

    df = spark.createDataFrame(
        [
            ("c", 0, "a b"),      # prefix 2
            ("c", 1, "x"),        # prefix 3
            ("c", 2, None),       # 0 tokens, still a turn; prefix 3
            ("c", 3, "y z w"),    # prefix 6
            ("d", 0, ""),         # empty conv: 0 tokens total
        ],
        "conv_id string, turn_idx int, text string",
    )
    out = {r["conv_id"]: r.asDict() for r in context_cost(df).collect()}
    c = out["c"]
    assert (c["n_turns"], c["total_tokens"], c["context_tokens"]) == (4, 6, 14)
    assert c["cost_ratio_bp"] == (2 * 10000 * 14 + 6) // 12  # 14/6 in bp
    d = out["d"]
    assert (d["n_turns"], d["total_tokens"], d["context_tokens"]) == (1, 0, 0)
    assert d["cost_ratio_bp"] is None


def test_context_cost_partition_invariant(spark):
    # the prefix sum orders by turn_idx inside the window — physical
    # row order / partitioning must not matter
    from pdf_extractors_spark.operators.chat import context_cost

    rows = [("c", i, "t " * (i % 5)) for i in range(40, -1, -1)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )
    a = sorted(context_cost(df.coalesce(1)).collect())
    b = sorted(context_cost(df.repartition(16)).collect())
    assert a == b
