"""Round-3g operators: preference_bias (RLHF pair audit),
score_label_bins / ece_ppm (calibration), invisible_chars
(zero-width / bidi / soft-hyphen audit), license_scan, mixture_plan
(token-budget solver). All hand-computed exact-integer expectations."""

import pytest

from pdf_extractors_spark.operators import preference, sampling, text_stats


# ------------------------------------------------------ preference_bias

_P_SCHEMA = "chosen_text string, rejected_text string"


def _bias(spark, rows):
    r = preference.preference_bias(
        spark.createDataFrame(rows, _P_SCHEMA)
    ).collect()[0]
    return r.asDict()


def test_preference_bias_counters(spark):
    rows = [
        ("longer chosen text", "short"),      # chosen longer
        ("short", "longer rejected text"),    # rejected longer
        ("same text", "same text"),           # exact dup (also len tie)
        ("Same  Text", "same text"),          # norm dup, chosen longer
        ("abcde", "edcba"),                   # len tie, not a dup
    ]
    got = _bias(spark, rows)
    assert got["n_pairs"] == 5
    assert got["chosen_longer"] == 2  # row1 + the norm-dup row (10 > 9)
    assert got["rejected_longer"] == 1
    assert got["len_ties"] == 2
    assert got["exact_dup"] == 1
    assert got["norm_dup"] == 1
    assert got["chosen_longer_ppm"] == 1000000 * 2 // 3
    # gaps: +13, -15, 0, +1, 0
    assert got["len_gap_sum"] == -1


def test_preference_bias_null_sides_dropped(spark):
    rows = [("a", None), (None, "b"), (None, None), ("ab", "c")]
    got = _bias(spark, rows)
    assert got["n_pairs"] == 1 and got["chosen_longer"] == 1


def test_preference_bias_all_ties_null_ppm(spark):
    got = _bias(spark, [("aa", "bb"), ("cc", "dd")])
    assert got["len_ties"] == 2
    assert got["chosen_longer_ppm"] is None


# ------------------------------------------- score_label_bins / ece_ppm

_S_SCHEMA = "score long, label boolean"


def _bins(spark, rows, **kw):
    return {
        r["bin"]: (r["n"], r["n_pos"], r["mean_score_ppm"], r["pos_rate_ppm"])
        for r in text_stats.score_label_bins(
            spark.createDataFrame(rows, _S_SCHEMA), "score", "label", **kw
        ).collect()
    }


def test_bins_edges_and_rates(spark):
    rows = [(0, False), (0, True), (1000000, True), (1000000, True)]
    got = _bins(spark, rows)
    assert got == {
        0: (2, 1, 0, 500000),
        19: (2, 2, 1000000, 1000000),
    }


def test_bins_clamp_out_of_range(spark):
    got = _bins(spark, [(-50, False), (2000000, True)])
    assert set(got) == {0, 19}
    assert got[0] == (1, 0, 0, 0)
    assert got[19] == (1, 1, 1000000, 1000000)


def test_ece_perfectly_calibrated_is_zero(spark):
    rows = [(0, False), (0, False), (1000000, True), (1000000, True)]
    r = text_stats.ece_ppm(
        spark.createDataFrame(rows, _S_SCHEMA), "score", "label"
    ).collect()[0]
    assert (r["n"], r["ece_ppm"]) == (4, 0)


def test_ece_constant_overconfident_score(spark):
    rows = [(500000, False)] * 4
    r = text_stats.ece_ppm(
        spark.createDataFrame(rows, _S_SCHEMA), "score", "label"
    ).collect()[0]
    assert (r["n"], r["ece_ppm"]) == (4, 500000)


# ------------------------------------------------------ invisible_chars

def _inv(spark, rows):
    return {
        r["doc_id"]: (
            r["zw_count"],
            r["bidi_count"],
            r["shy_count"],
            r["invisible_ppm"],
            r["bidi_flag"],
        )
        for r in text_stats.invisible_chars(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }


def test_invisible_chars_counts(spark):
    rows = [
        (1, "ab​cd‍"),          # 2 zero-widths in 6 chars
        (2, "x‮evil⁩y"),        # 2 bidi controls in 8 chars
        (3, "co­op"),                # 1 soft hyphen in 5 chars
        (4, "clean text"),
        (5, None),
    ]
    got = _inv(spark, rows)
    assert got[1] == (2, 0, 0, 1000000 * 2 // 6, False)
    assert got[2] == (0, 2, 0, 1000000 * 2 // 8, True)
    assert got[3] == (0, 0, 1, 1000000 // 5, False)
    assert got[4] == (0, 0, 0, 0, False)
    assert got[5] == (0, 0, 0, 0, False)  # preserve-with-zeros


def test_invisible_chars_full_battery(spark):
    text = text_stats.ZERO_WIDTH_CHARS + text_stats.BIDI_CONTROL_CHARS
    got = _inv(spark, [(1, text)])
    assert got[1][0] == len(text_stats.ZERO_WIDTH_CHARS)
    assert got[1][1] == len(text_stats.BIDI_CONTROL_CHARS)
    assert got[1][3] == 1000000  # every char invisible


# --------------------------------------------------------- license_scan

def _lic(spark, rows):
    return {
        r["doc_id"]: (r["license"], r["spdx_id"])
        for r in text_stats.license_scan(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }


def test_license_cascade(spark):
    rows = [
        (1, "SPDX-License-Identifier: MIT\nMIT License text"),
        (2, "Licensed under the Apache License, Version 2.0"),
        (3, "released under the mit license"),
        (4, "GNU Lesser General Public License v2.1"),
        (5, "BSD 3-Clause"),
        (6, "Mozilla Public License, v. 2.0"),
        (7, "no license here"),
        (8, None),
    ]
    got = _lic(spark, rows)
    assert got[1] == ("spdx:MIT", "MIT")  # tag beats the phrase
    assert got[2] == ("apache-2.0", None)
    assert got[3] == ("mit", None)  # case-insensitive
    assert got[4] == ("gpl", None)
    assert got[5] == ("bsd", None)
    assert got[6] == ("mpl-2.0", None)
    assert got[7] == (None, None)
    assert got[8] == (None, None)  # null text preserved


# --------------------------------------------------------- mixture_plan

def test_mixture_plan_hand_computed(spark):
    avail = spark.createDataFrame(
        [("a", 100), ("b", 10)], "source string, tokens long"
    )
    out = {
        r["source"]: r.asDict()
        for r in sampling.mixture_plan(
            avail, {"a": 1, "b": 1, "c": 2}, budget_tokens=200
        ).collect()
    }
    # Σw=4: targets a=50 b=50 c=100; caps (4 epochs): a→400 b→40 c→0
    assert out["a"]["target_tokens"] == 50
    assert out["a"]["alloc_tokens"] == 50
    assert out["a"]["epochs_ppm"] == 500000
    assert out["a"]["capped"] is False
    assert out["a"]["shortfall_tokens"] == 0
    assert out["b"]["alloc_tokens"] == 40
    assert out["b"]["epochs_ppm"] == 5000000
    assert out["b"]["capped"] is True
    assert out["b"]["shortfall_tokens"] == 10
    # missing domain: loud all-shortfall row, never a silent drop
    assert out["c"]["avail_tokens"] == 0
    assert out["c"]["alloc_tokens"] == 0
    assert out["c"]["epochs_ppm"] is None
    assert out["c"]["capped"] is True
    assert out["c"]["shortfall_tokens"] == 100


def test_mixture_plan_rejects_zero_weights(spark):
    avail = spark.createDataFrame([("a", 1)], "source string, tokens long")
    with pytest.raises(ValueError):
        sampling.mixture_plan(avail, {"a": 0}, budget_tokens=10)


# ----------------------------------------------------------- plan audits

def test_plans_round3g(spark):
    from pdf_extractors_spark import plans

    docs = spark.createDataFrame(
        [(1, "text", "src0")], "doc_id long, text string, source string"
    )
    pairs = spark.createDataFrame(
        [("a", "b")], "chosen_text string, rejected_text string"
    )
    scored = spark.createDataFrame([(5, True)], "score long, label boolean")

    # single-pass column math fused into the scan: zero exchanges
    plans.assert_plan(
        text_stats.invisible_chars(docs),
        max_exchanges=0, no_python=True,
    )
    plans.assert_plan(
        text_stats.license_scan(docs),
        max_exchanges=0, no_python=True,
    )
    # one map-side-combined aggregate; the single-partition final agg
    # over partial rows is the corpus-totals idiom, not a data funnel
    plans.assert_plan(
        preference.preference_bias(pairs), max_exchanges=1, no_python=True
    )
    # one groupBy on the bin id (<= n_bins groups)
    plans.assert_plan(
        text_stats.score_label_bins(scored, "score", "label"),
        max_exchanges=1, no_python=True,
    )
    # bins + the tiny <=n_bins reduce
    plans.assert_plan(
        text_stats.ece_ppm(scored, "score", "label"),
        max_exchanges=2, no_python=True,
    )
    # per-domain rollup rides a broadcast join; corpus never enters
    avail = spark.createDataFrame([("src0", 10)], "source string, tokens long")
    mp = sampling.mixture_plan(avail, {"src0": 1}, budget_tokens=10)
    a = plans.assert_plan(mp, no_python=True)
    assert a.broadcast_joins >= 1 or a.n_exchanges <= 1, a.plan
