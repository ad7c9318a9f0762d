"""cdc_chunks (content-defined chunking), bigram_lift (collocations),
winsorize_per_group (percentile clipping)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractors_spark.operators import sampling, text_stats


# -------------------------------------------------------------- cdc_chunks


def _chunks(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return text_stats.cdc_chunks(df).collect()


def test_cdc_chunks_partition_the_document(spark):
    text = "the quick brown fox jumps over the lazy dog " * 20
    rows = sorted(_chunks(spark, [text]), key=lambda r: r["chunk_idx"])
    assert rows[0]["chunk_start"] == 1
    # contiguous: each chunk starts right after the previous one ends
    for prev, cur in zip(rows, rows[1:]):
        assert cur["chunk_start"] == prev["chunk_start"] + prev["chunk_len"]
    assert sum(r["chunk_len"] for r in rows) == len(text)
    assert len(rows) > 1  # long text must actually split


def test_cdc_chunks_short_null_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, "abc"), (1, None), (2, "")], "doc_id long, text string"
    )
    rows = text_stats.cdc_chunks(df).collect()
    # sub-window doc: one chunk covering everything; null/empty: no rows
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 0
    assert (rows[0]["chunk_start"], rows[0]["chunk_len"]) == (1, 3)


def test_cdc_chunks_boundaries_shift_locally_on_insert(spark):
    """The CDC property: prepending bytes must not move interior
    boundaries — every cut of the original reappears shifted by the
    insertion length (the window spans only original chars there)."""
    base = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 15
    shifted = "XYZ" + base
    rows_a = _chunks(spark, [base])
    df_b = spark.createDataFrame([(0, shifted)], "doc_id long, text string")
    rows_b = text_stats.cdc_chunks(df_b).collect()
    ends_a = sorted(r["chunk_start"] + r["chunk_len"] - 1 for r in rows_a)
    ends_b = {r["chunk_start"] + r["chunk_len"] - 1 for r in rows_b}
    # all interior cuts of the original (not the synthetic doc-end)
    for e in ends_a[:-1]:
        assert e + 3 in ends_b, (e, sorted(ends_b))


# ------------------------------------------------------------- bigram_lift


def test_bigram_lift_hand_computed(spark):
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c"), (3, "b a")],
        "doc_id long, text string",
    )
    got = {
        (r["x"], r["y"]): (r["n"], r["lift"])
        for r in text_stats.bigram_lift(docs, min_count=1).collect()
    }
    # N=4 bigrams; unigrams a=4 b=3 c=1
    assert got == {
        ("a", "b"): (2, 10000 * 4 * 2 // (4 * 3)),
        ("a", "c"): (1, 10000 * 4 * 1 // (4 * 1)),
        ("b", "a"): (1, 10000 * 4 * 1 // (3 * 4)),
    }


def test_bigram_lift_min_count_prunes_and_empty_tokens_dropped(spark):
    docs = spark.createDataFrame(
        [(0, "x  y"), (1, "x \t y"), (2, None)], "doc_id long, text string"
    )
    # whitespace runs collapse: (x,y) twice despite the double spaces
    got = text_stats.bigram_lift(docs, min_count=2).collect()
    assert len(got) == 1 and got[0]["n"] == 2
    assert text_stats.bigram_lift(docs, min_count=3).count() == 0


# ----------------------------------------------------- winsorize_per_group


def test_winsorize_clips_group_tails(spark):
    rows = [(i, "en", i * 10) for i in range(11)]  # 0,10,...,100
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    got = {
        r["doc_id"]: r["n_chars_clipped"]
        for r in sampling.winsorize_per_group(df, "lang", "n_chars").collect()
    }
    # exact interpolated p05 = 5.0, p95 = 95.0 on 0..100 step 10
    assert got[0] == 5.0 and got[10] == 95.0
    assert got[5] == 50.0  # interior values untouched


def test_winsorize_groups_are_independent(spark):
    rows = [(0, "en", 0), (1, "en", 100), (2, "fr", 1000), (3, "fr", 2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    got = {
        r["doc_id"]: r["n_chars_clipped"]
        for r in sampling.winsorize_per_group(df, "lang", "n_chars", 0.0, 1.0).collect()
    }
    # lo=0/hi=1 → identity per group, proving the bracket join keyed right
    assert got == {0: 0.0, 1: 100.0, 2: 1000.0, 3: 2000.0}


# ------------------------------------------------------ postings (index)


def test_postings_tf_df_hand_computed(spark):
    from pdf_extractors_spark.operators import retrieval

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a c"), (2, "b  b c")], "doc_id long, text string"
    )
    got = {
        (r["term"], r["doc_id"]): (r["tf"], r["df"])
        for r in retrieval.postings(docs, min_df=2).collect()
    }
    # df: a→2 docs, b→2 docs, c→2 docs; all survive min_df=2
    assert got == {
        ("a", 0): (2, 2),
        ("a", 1): (1, 2),
        ("b", 0): (1, 2),
        ("b", 2): (2, 2),
        ("c", 1): (1, 2),
        ("c", 2): (1, 2),
    }


def test_postings_min_df_prunes_hapax(spark):
    from pdf_extractors_spark.operators import retrieval

    docs = spark.createDataFrame(
        [(0, "unique common"), (1, "common")], "doc_id long, text string"
    )
    terms = {r["term"] for r in retrieval.postings(docs, min_df=2).collect()}
    assert terms == {"common"}


# -------------------------------------------------------- trailing_counts


def test_trailing_counts_window_arithmetic(spark):
    from datetime import datetime

    from pdf_extractors_spark.operators import joins

    rows = [
        # user u: events at t=0, 1800, 3600, 7201 (s), value 1.0 each
        (0, "u", datetime(2026, 1, 1, 0, 0, 0), 1.0),
        (1, "u", datetime(2026, 1, 1, 0, 30, 0), 1.0),
        (2, "u", datetime(2026, 1, 1, 1, 0, 0), 1.0),
        (3, "u", datetime(2026, 1, 1, 2, 0, 1), 1.0),
        (4, "v", datetime(2026, 1, 1, 0, 0, 0), 2.5),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double"
    )
    got = {
        r["event_id"]: (r["n_trailing"], r["v_trailing"])
        for r in joins.trailing_counts(df, "user_id", "ts", "value").collect()
    }
    # t=3600 still sees t=0 (inclusive frame); t=7201 sees only itself
    assert got[0] == (1, 100)
    assert got[1] == (2, 200)
    assert got[2] == (3, 300)
    assert got[3] == (1, 100)
    assert got[4] == (1, 250)


def test_trailing_counts_same_second_ties_are_peers(spark):
    from datetime import datetime

    from pdf_extractors_spark.operators import joins

    t = datetime(2026, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [(0, "u", t, 1.0), (1, "u", t, 1.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["n_trailing"]
        for r in joins.trailing_counts(df, "user_id", "ts", "value").collect()
    }
    # RANGE frame: both rows see both peers — deterministic under ties
    assert got == {0: 2, 1: 2}


def test_trailing_counts_null_ts_excluded(spark):
    from datetime import datetime

    from pdf_extractors_spark.operators import joins

    df = spark.createDataFrame(
        [(0, "u", datetime(2026, 1, 1), 1.0), (1, "u", None, 1.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    rows = joins.trailing_counts(df, "user_id", "ts", "value").collect()
    assert [r["event_id"] for r in rows] == [0]


# ------------------------------------------------------ chunk_overlap_pairs


def test_chunk_overlap_finds_embedded_span(spark):
    """A long span embedded at DIFFERENT offsets in two documents
    produces shared interior chunks — the partial-overlap case that
    whole-document hashing misses."""
    # NON-periodic span: a repeated phrase would make every interior
    # chunk the same string and distinct() collapses it to one
    span = " ".join(f"alpha{i} beta{i * 7} gamma{i * 13}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (0, "intro A. " + span + " outro A."),
            (1, "a completely different and longer introduction B! " + span),
            (2, "unrelated content with nothing in common at all " * 9),
        ],
        "doc_id long, text string",
    )
    pairs = text_stats.chunk_overlap_pairs(docs, min_shared=2).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]
    assert pairs[0]["n_shared"] >= 2


def test_chunk_overlap_hot_chunk_guard(spark):
    """A chunk shared by more than max_bucket docs is boilerplate: the
    guard drops it before the self-join (no O(B^2) pair flood)."""
    boiler = " ".join(f"footer{i} legal{i * 3} notice{i * 11}" for i in range(30))
    docs = spark.createDataFrame(
        [(i, f"unique head {i} " * 6 + boiler) for i in range(6)],
        "doc_id long, text string",
    )
    n_all = text_stats.chunk_overlap_pairs(docs, min_shared=1, max_bucket=64).count()
    n_guarded = text_stats.chunk_overlap_pairs(docs, min_shared=1, max_bucket=3).count()
    assert n_all > 0 and n_guarded < n_all


# ------------------------------------------------------- cooccurrence_lift


def test_cooccurrence_matches_python_reference(spark):
    """Window-3 skip-gram pairs + integer lift == a sequential
    reference over mixed docs (repeats, whitespace runs, empties)."""
    import math
    import re
    from collections import Counter

    texts = [
        "a b c a b",
        "a  b\tc",
        "",
        "z",
        "the cat the cat the",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    window, scale = 3, 100
    got = sorted(
        (r["x"], r["y"], r["n"], r["lift"])
        for r in text_stats.cooccurrence_lift(
            df, window=window, min_count=1, scale=scale
        ).collect()
    )
    docs = [[w for w in re.split(r"\s+", t.strip().lower()) if w] for t in texts]
    uni = Counter(w for d in docs for w in d)
    pairs = Counter()
    for d in docs:
        for i in range(len(d)):
            for j in range(i + 1, min(i + window, len(d) - 1) + 1):
                pairs[(d[i], d[j])] += 1
    n_pairs = sum(pairs.values())
    want = sorted(
        (x, y, n, math.floor(scale * n_pairs * n / (uni[x] * uni[y])))
        for (x, y), n in pairs.items()
    )
    assert got == want


def test_cooccurrence_window1_equals_bigram_lift(spark):
    """bigram_lift IS the window=1 special case — same counts, same
    lift values, row for row."""
    df = spark.createDataFrame(
        [(1, "a b c a b a"), (2, "x y x y"), (3, "lone")],
        "doc_id long, text string",
    )
    co = sorted(
        (r["x"], r["y"], r["n"], r["lift"])
        for r in text_stats.cooccurrence_lift(df, window=1, min_count=1).collect()
    )
    bi = sorted(
        (r["x"], r["y"], r["n"], r["lift"])
        for r in text_stats.bigram_lift(df, min_count=1).collect()
    )
    assert co == bi


def test_cooccurrence_plan_has_no_join_for_pair_generation(spark):
    """Pair generation is in-row: the only joins in the plan are the
    two marginal lookups + the broadcast total — no positional
    self-join of the token table, no cartesian."""
    from pdf_extractors_spark import plans

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    a = plans.assert_plan(
        text_stats.cooccurrence_lift(df, window=4), no_python=True
    )
    # exchanges: unigram groupBy, pair groupBy, 1-row total, join sides
    assert a.n_exchanges <= 7
