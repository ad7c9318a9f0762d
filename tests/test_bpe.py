"""BPE tokenizer training and encoding: hand-computed merge parity,
determinism across parallelism, encode round-trip property, and
consistency between the trainer's first merge and the SQL-replayed
bpe_pair_counts statistic."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractors_spark.operators import text_stats


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_bpe_learn_hand_computed(spark):
    # "ababab" x3, "abc" x1: pair counts round 1 — ('a','b'): 3*3+1=10,
    # ('b','a'): 6, ('b','c'): 1 → merge ab. Round 2 over {('ab','ab','ab')
    # x3, ('ab','c') x1}: ('ab','ab'): 6, ('ab','c'): 1 → merge abab.
    df = _corpus(spark, ["ababab ababab ababab abc"])
    merges = text_stats.bpe_learn(df, n_merges=2).collect()
    got = [(r["rank"], r["left"], r["right"], r["merged"]) for r in merges]
    assert got == [(0, "a", "b", "ab"), (1, "ab", "ab", "abab")]


def test_bpe_learn_tiebreak_lexicographic(spark):
    # "xy" and "xz" each appear twice: counts tie at 2 — the merge must
    # be the lexicographically smaller pair ('x','y'), deterministically
    df = _corpus(spark, ["xy xz xy xz"])
    (m,) = text_stats.bpe_learn(df, n_merges=1).collect()
    assert (m["left"], m["right"]) == ("x", "y")


def test_bpe_learn_parallelism_invariant(spark):
    rows = [f"hello world w{i % 7} banana bandana" for i in range(64)]
    df = _corpus(spark, rows)
    one = text_stats.bpe_learn(df.coalesce(1), n_merges=8).collect()
    many = text_stats.bpe_learn(df.repartition(16), n_merges=8).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_bpe_first_merge_matches_pair_counts(spark):
    # the trainer's round-1 argmax must equal the top row of the
    # SQL-oracled bpe_pair_counts statistic on the same corpus
    rows = ["the cat sat on the mat", "the bat and the rat", "thistle the"]
    df = _corpus(spark, rows)
    (m,) = text_stats.bpe_learn(df, n_merges=1).collect()
    top = text_stats.bpe_pair_counts(df, top_k=1).collect()[0]
    assert m["left"] + m["right"] == top["pair"]


def test_bpe_encode_roundtrip_and_memo(spark):
    rows = [
        "banana bandana cabana",
        "the theme anthem",
        None,
        "",
    ]
    df = _corpus(spark, rows)
    merges = [
        (r["left"], r["right"])
        for r in text_stats.bpe_learn(df, n_merges=6)
        .orderBy("rank")
        .collect()
    ]
    out = {
        r["doc_id"]: r
        for r in text_stats.bpe_encode(df, merges).collect()
    }
    # round-trip: concatenating a word's tokens reproduces the word
    for doc_id, text in enumerate(rows):
        toks = out[doc_id]["bpe_tokens"]
        assert out[doc_id]["n_bpe_tokens"] == len(toks)
        joined = "".join(toks)
        expected = "".join((text or "").lower().split())
        assert joined == expected, (doc_id, toks)
    # merges actually fire: 'banana' must compress below character count
    assert out[0]["n_bpe_tokens"] < len("bananabandanacabana")


def test_bpe_encode_greedy_rank_order(spark):
    # rank order matters: with merges [(a,b) then (ab,c)] the word 'abc'
    # becomes ['abc']; with only (b,c) available first it could not
    df = _corpus(spark, ["abc"])
    out = text_stats.bpe_encode(df, [("a", "b"), ("ab", "c")]).collect()
    assert out[0]["bpe_tokens"] == ["abc"]
    out2 = text_stats.bpe_encode(df, [("b", "c"), ("a", "bc")]).collect()
    assert out2[0]["bpe_tokens"] == ["abc"]


def test_bpe_merges_table_well_formed():
    """Import-time invariant guard (round-4 advisor item): the checked-in
    table passes, and an ill-formed table (multi-char component with no
    earlier-ranked producer) is rejected loudly."""
    import pytest

    import __spark_entry__ as entrymod

    entrymod._assert_bpe_merges_well_formed(entrymod._BPE_MERGES)
    with pytest.raises(AssertionError, match="not produced"):
        entrymod._assert_bpe_merges_well_formed([("t", "h"), ("xy", "e")])
