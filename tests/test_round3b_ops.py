"""Round-3 batch-3 operator tests: directed shingle containment,
scalable global row indexing, shard-boundary stitching, and per-key
linear gap interpolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractors_spark.operators import dedup
from pdf_extractors_spark.operators.bucketing import global_index
from pdf_extractors_spark.operators.hashing import md5_bigint_py
from pdf_extractors_spark.operators.joins import interpolate_gaps


# ----------------------------------------------------- containment_pairs


def test_containment_asymmetric_inclusion(spark):
    # doc 1 = 8 words fully quoted inside doc 2's 20 words:
    # containment(1→2) = 1.0 but jaccard is low (6/18 shingles shared)
    short = "alpha beta gamma delta epsilon zeta eta theta"
    long = (
        "prelude one two three four five six "
        + short
        + " coda seven eight nine ten"
    )
    df = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    out = {
        (r["src_id"], r["dst_id"]): r["containment"]
        for r in dedup.containment_pairs(df, threshold=0.8).collect()
    }
    assert out == {(1, 2): 1.0}
    # the reverse direction (long into short) is far below threshold,
    # and so is jaccard: 6 shared / (6 + 18 - 6)
    jac = dedup.ngram_jaccard_pairs(df, threshold=0.0).collect()
    assert len(jac) == 1 and jac[0]["jaccard"] < 0.5


def test_containment_emits_both_directions_for_exact_dups(spark):
    t = "one two three four five six seven"
    df = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string"
    )
    out = {
        (r["src_id"], r["dst_id"]): r["containment"]
        for r in dedup.containment_pairs(df, threshold=0.8).collect()
    }
    assert out == {(1, 2): 1.0, (2, 1): 1.0}


def test_containment_hot_shingle_guard(spark):
    # a shingle present in every doc is dropped by max_shingle_df, so
    # sharing ONLY boilerplate yields no pairs
    rows = [(i, f"the common boilerplate line plus unique{i} word{i} tail{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.containment_pairs(df, threshold=0.1, max_shingle_df=3).collect()
    assert out == []


# ---------------------------------------------------------- global_index


def test_global_index_is_dense_permutation(spark):
    df = spark.createDataFrame(
        [(i, f"p{i}") for i in range(500)], "doc_id long, payload string"
    )
    out = global_index(df, key_col="doc_id", n_buckets=16)
    idx = [r["row_index"] for r in out.collect()]
    assert sorted(idx) == list(range(500))


def test_global_index_matches_bucket_key_order(spark):
    n_buckets = 8
    keys = [f"k{i}" for i in range(100)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    out = {
        r["key"]: r["row_index"]
        for r in global_index(df, key_col="key", n_buckets=n_buckets).collect()
    }
    expected_order = sorted(keys, key=lambda k: (md5_bigint_py(k) % n_buckets, k))
    assert out == {k: i for i, k in enumerate(expected_order)}


def test_global_index_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(300)], "doc_id long"
    )
    a = {tuple(r) for r in global_index(df, n_buckets=32).collect()}
    b = {
        tuple(r)
        for r in global_index(df.repartition(17), n_buckets=32).collect()
    }
    assert a == b


# ------------------------------------------------------- boundary_stitch


def test_boundary_stitch_finds_planted_split(spark):
    head = "alpha " * 30  # 180 chars incl. trailing space
    # the duplicated boundary region must be exactly k chars for the
    # suffix-k == prefix-k test to fire (A ends with it, B starts with it)
    overlap = "".join(chr(97 + i % 26) for i in range(64))
    tail = " omega" * 30
    df = spark.createDataFrame(
        [(1, head + overlap), (2, overlap + tail), (3, "unrelated " * 20)],
        "doc_id long, text string",
    )
    out = [
        (r["left_id"], r["right_id"])
        for r in dedup.boundary_stitch(df, k=64).collect()
    ]
    assert out == [(1, 2)]


def test_boundary_stitch_skips_short_and_self(spark):
    t = "x" * 100
    df = spark.createDataFrame(
        [(1, t), (2, "tiny"), (3, t)], "doc_id long, text string"
    )
    out = {
        (r["left_id"], r["right_id"])
        for r in dedup.boundary_stitch(df, k=64).collect()
    }
    # identical all-'x' docs overlap each other in both directions but
    # never themselves; the short doc never appears
    assert out == {(1, 3), (3, 1)}


# ------------------------------------------------------ interpolate_gaps


def test_interpolate_linear_exact(spark):
    rows = [
        ("u", 0, 10.0),
        ("u", 10, None),
        ("u", 30, None),
        ("u", 40, 50.0),
    ]
    df = spark.createDataFrame(rows, "k string, o long, v double")
    out = {
        r["o"]: r["value_filled"]
        for r in interpolate_gaps(df, "k", "o", "v").collect()
    }
    # slope = (50-10)/40 = 1.0 per unit
    assert out == {0: 10.0, 10: 20.0, 30: 40.0, 40: 50.0}


def test_interpolate_edges_stay_null(spark):
    rows = [
        ("u", 0, None),
        ("u", 1, 5.0),
        ("u", 2, None),
        ("u", 3, 7.0),
        ("u", 4, None),
    ]
    df = spark.createDataFrame(rows, "k string, o long, v double")
    out = {
        r["o"]: r["value_filled"]
        for r in interpolate_gaps(df, "k", "o", "v").collect()
    }
    assert out[0] is None and out[4] is None
    assert out == {**out, 1: 5.0, 2: 6.0, 3: 7.0}


def test_interpolate_per_key_isolation(spark):
    rows = [
        ("a", 0, 0.0),
        ("a", 2, None),
        ("a", 4, 4.0),
        ("b", 3, None),  # b has no neighbours at all → stays null
    ]
    df = spark.createDataFrame(rows, "k string, o long, v double")
    out = {
        (r["k"], r["o"]): r["value_filled"]
        for r in interpolate_gaps(df, "k", "o", "v").collect()
    }
    assert out[("a", 2)] == 2.0
    assert out[("b", 3)] is None


def test_interpolate_partitioning_invariant(spark):
    rows = [
        (f"k{i % 7}", i, float(i) if i % 3 else None) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k string, o long, v double")
    a = {tuple(r) for r in interpolate_gaps(df, "k", "o", "v").collect()}
    b = {
        tuple(r)
        for r in interpolate_gaps(df.repartition(13), "k", "o", "v").collect()
    }
    assert a == b


# -------------------------------------------------------------- sft_pack


def test_sft_pack_spans_address_response_text(spark):
    from pdf_extractors_spark import pipeline

    rows = [
        ("c1", 0, "user", "hi", None, None),
        ("c1", 1, "assistant", "hello there", None, None),
        ("c1", 2, "user", "bye", None, None),
        ("c1", 3, "assistant", "farewell", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = pipeline.sft_pack(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["packed_text"] == (
        "user: hi\nassistant: hello there\nuser: bye\nassistant: farewell\n"
    )
    assert r["n_turns"] == 4
    # every span must slice exactly the assistant payload out of the
    # packed text
    got = [
        r["packed_text"][int(s) : int(e)]
        for s, e in (sp.split(":") for sp in r["mask_spans"].split(";"))
    ]
    assert got == ["hello there", "farewell"]


def test_sft_pack_null_text_and_no_assistant(spark):
    from pdf_extractors_spark import pipeline

    rows = [
        ("c1", 0, "user", None, None, None),
        ("c1", 1, "tool", "result", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    r = pipeline.sft_pack(df).collect()[0]
    assert r["packed_text"] == "user: \ntool: result\n"
    assert r["mask_spans"] == ""


def test_sft_pack_order_survives_repartition(spark):
    from pdf_extractors_spark import pipeline

    rows = [
        (f"c{i % 5}", j, "assistant" if j % 2 else "user", f"t{i}-{j}", None, None)
        for i in range(10)
        for j in range(6)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    a = {tuple(r) for r in pipeline.sft_pack(df).collect()}
    b = {tuple(r) for r in pipeline.sft_pack(df.repartition(13)).collect()}
    assert a == b


# --------------------------------------------------------- split_leakage


def test_split_leakage_counts_shared_rare_shingles(spark):
    from pdf_extractors_spark.operators.sampling import hash_split

    # find ids the 80/10/10 split maps to train vs test, then plant an
    # overlapping phrase across the boundary
    probe = spark.createDataFrame(
        [(i,) for i in range(60)], "doc_id long"
    )
    splits = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            probe, {"train": 80, "val": 10, "test": 10}
        ).collect()
    }
    train_id = next(i for i, s in splits.items() if s == "train")
    test_id = next(i for i, s in splits.items() if s == "test")
    other_test = next(
        i for i, s in splits.items() if s == "test" and i != test_id
    )
    leak = "the secret benchmark answer is forty two exactly"
    rows = [
        (train_id, "prefix words here " + leak),
        (test_id, leak + " plus trailing content words"),
        (other_test, "completely different text with no overlap at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n_shared"] for r in dedup.split_leakage(df).collect()}
    assert test_id in out and out[test_id] >= 6  # the 8-word leak → 6 3-grams
    assert other_test not in out


def test_split_leakage_ignores_boilerplate(spark):
    from pdf_extractors_spark.operators.sampling import hash_split

    probe = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    splits = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            probe, {"train": 80, "val": 10, "test": 10}
        ).collect()
    }
    # every doc shares the same boilerplate → df cap drops those
    # shingles, so nothing leaks
    rows = [
        (i, f"standard footer boilerplate text unique{i} word{i}")
        for i in splits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.split_leakage(df, max_shingle_df=50).collect() == []


# -------------------------------------------------------------- pii_spans


def test_pii_spans_offsets_slice_the_source(spark):
    from pdf_extractors_spark.operators import text_stats

    text = (
        "reach me at a.b@example.com or +1 555 0199 today; "
        "backup c_d@test.org from 10.0.0.7"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = text_stats.pii_spans(df).collect()
    # every span must slice its own value out of the original text
    for r in out:
        assert text[r["span_start"] : r["span_end"]] == r["value"], r
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r["value"])
    assert by_label["email"] == ["a.b@example.com", "c_d@test.org"]
    assert by_label["phone"] == ["+1 555 0199 "]  # pattern eats the optional trailing sep
    assert by_label["ipv4"] == ["10.0.0.7"]


def test_pii_spans_no_hits_no_rows_and_null_safe(spark):
    from pdf_extractors_spark.operators import text_stats

    df = spark.createDataFrame(
        [(1, "perfectly clean text"), (2, None)], "doc_id long, text string"
    )
    assert text_stats.pii_spans(df).collect() == []


def test_pii_spans_adjacent_matches(spark):
    from pdf_extractors_spark.operators import text_stats

    # two emails separated by one space; offsets must not drift
    text = "a@x.com b@y.org"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        (r["span_start"], r["span_end"], r["value"])
        for r in text_stats.pii_spans(df).collect()
    )
    assert out == [(0, 7, "a@x.com"), (8, 15, "b@y.org")]


# --------------------------------------------------------------- lsh_eval


def test_lsh_eval_perfect_on_exact_dups(spark):
    # exact duplicates: identical signatures -> candidates, jaccard 1.0
    # -> truth; disjoint docs are neither
    rows = [
        (1, "one two three four five six seven eight"),
        (2, "one two three four five six seven eight"),
        (3, "alpha beta gamma delta epsilon zeta eta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = dedup.lsh_eval(df).collect()[0]
    assert r["n_true"] == 1 and r["n_true_positive"] == 1
    assert r["recall_bp"] == 10000
    assert r["n_candidates"] >= 1
    assert 0 < r["precision_bp"] <= 10000


def test_lsh_eval_empty_corpus_degenerate(spark):
    df = spark.createDataFrame(
        [(1, "solo document with no pair at all")], "doc_id long, text string"
    )
    r = dedup.lsh_eval(df).collect()[0]
    assert (
        r["n_true"],
        r["n_candidates"],
        r["recall_bp"],
        r["precision_bp"],
    ) == (0, 0, 10000, 10000)
