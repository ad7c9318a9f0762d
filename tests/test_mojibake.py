"""Mojibake detection/repair (operators/text_stats.mojibake_scan /
mojibake_repair): Python-re reference parity for the scan classes,
direct codec-round-trip parity for the repair, adversarial inputs
(double-encoded, lone continuation, genuine accents, CJK, null), and
the zero-exchange plan budgets."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pdf_extractors_spark import plans
from pdf_extractors_spark.operators import text_stats
from pdf_extractors_spark.operators.text_stats import (
    MOJI2_RE,
    MOJI3_RE,
    mojibake_repair,
    mojibake_scan,
)

# ids are stable keys; texts exercise every branch of the contract
_CASES = [
    (0, "plain ascii, nothing to see"),
    (1, "caf\u00c3\u00a9 and na\u00c3\u00afve"),            # 2-byte artifacts
    (2, "don\u00e2\u20ac\u2122t \u00e2\u20ac\u0153quote"),  # 3-byte artifacts
    (3, "lost \ufffd bytes \ufffd\ufffd here"),               # replacement chars
    (4, "genuine caf\u00e9 r\u00e9sum\u00e9"),                # real accents: no repair
    (5, "\u4e2d\u6587 text"),                                  # CJK: encode fails, untouched
    (6, None),                                                   # null row
    (7, ""),                                                     # empty row
    (8, "lone continuation \u00a9 \u20ac"),                    # no lead byte: clean
    # double-encoded: one repair pass peels exactly one layer
    (9, "caf\u00c3\u0192\u00c2\u00a9"),
]


def _py_repair(s):
    if s is None:
        return None
    try:
        b = s.encode("cp1252")
    except UnicodeEncodeError:
        try:
            b = s.encode("latin-1")
        except UnicodeEncodeError:
            return s
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return s


def _df(spark):
    return spark.createDataFrame(_CASES, "doc_id long, text string")


def test_mojibake_scan_matches_python_re(spark):
    got = {r["doc_id"]: r.asDict() for r in mojibake_scan(_df(spark)).collect()}
    for doc_id, text in _CASES:
        t = text or ""
        want2 = len(re.findall(MOJI2_RE, t))
        want3 = len(re.findall(MOJI3_RE, t))
        wantr = t.count("\ufffd")
        g = got[doc_id]
        assert (g["n_moji2"], g["n_moji3"], g["n_replacement"]) == (
            want2,
            want3,
            wantr,
        ), (doc_id, text)
        assert g["mojibake"] == (want2 + want3 + wantr > 0)


def test_mojibake_scan_planted_counts(spark):
    """The specific planted shapes the driver query relies on."""
    got = {r["doc_id"]: r.asDict() for r in mojibake_scan(_df(spark)).collect()}
    assert (got[1]["n_moji2"], got[1]["n_moji3"]) == (2, 0)
    assert (got[2]["n_moji2"], got[2]["n_moji3"]) == (0, 2)
    assert got[3]["n_replacement"] == 3
    assert not got[0]["mojibake"] and not got[4]["mojibake"]
    assert not got[8]["mojibake"]  # continuation chars without a lead
    assert got[6]["n_moji2"] == 0 and not got[6]["mojibake"]  # null row


def test_mojibake_repair_matches_codec_round_trip(spark):
    got = {
        r["doc_id"]: (r["text_fixed"], r["changed"])
        for r in mojibake_repair(_df(spark)).collect()
    }
    for doc_id, text in _CASES:
        want = _py_repair(text)
        changed = (want is not None) and (want != text)
        assert got[doc_id] == (want, changed), (doc_id, text)


def test_mojibake_repair_semantics(spark):
    got = {
        r["doc_id"]: (r["text_fixed"], r["changed"])
        for r in mojibake_repair(_df(spark)).collect()
    }
    assert got[1] == ("caf\u00e9 and na\u00efve", True)
    assert got[2] == ("don\u2019t \u201cquote", True)
    # genuine accents and CJK pass through untouched
    assert got[4] == ("genuine caf\u00e9 r\u00e9sum\u00e9", False)
    assert got[5] == ("\u4e2d\u6587 text", False)
    assert got[6] == (None, False)
    # double-encoded peels ONE layer per pass; a second pass finishes
    assert got[9] == ("caf\u00c3\u00a9", True)
    assert _py_repair(got[9][0]) == "caf\u00e9"


def test_mojibake_repair_idempotent_on_clean_text(spark):
    clean = _df(spark).filter("doc_id in (0, 4, 5, 7, 8)")
    once = mojibake_repair(clean)
    twice = mojibake_repair(
        once.selectExpr("doc_id", "text_fixed as text")
    )
    a = {r["doc_id"]: r["text_fixed"] for r in once.collect()}
    b = {r["doc_id"]: r["text_fixed"] for r in twice.collect()}
    assert a == b


def test_mojibake_plan_budgets(spark):
    df = _df(spark)
    a = plans.assert_plan(
        mojibake_scan(df), max_exchanges=0, no_python=True
    )
    assert "Exchange" not in a.plan
    # repair is one Arrow-batched Python stage, still zero exchanges
    r = plans.plan_audit(mojibake_repair(df))
    assert r.n_exchanges == 0
    assert r.python_stages, "expected the ArrowEvalPython repair stage"


def test_repair_before_dedup_collapses_encoding_damaged_duplicates(spark):
    """The refinery's stage order is load-bearing: two copies of the
    same text where one suffered CP1252 mojibake (and one NFC-decomposed
    copy) are DIFFERENT md5 keys raw — exact dedup keeps all three.
    After mojibake_repair + NFC normalization they collapse to one
    representative. This is the semantic reason jobs/refinery.py runs
    repaired/ before dedup/."""
    import unicodedata

    from pdf_extractors_spark.operators import dedup, text_stats

    clean = "expos\u00e9 caf\u00e9 menu"                      # NFC form
    moji = "expos\u00c3\u00a9 caf\u00c3\u00a9 menu"          # UTF-8 read as Latin-1
    nfd = unicodedata.normalize("NFD", clean)                    # decomposed
    other = "an unrelated document"
    df = spark.createDataFrame(
        [(1, clean), (2, moji), (3, nfd), (4, other)],
        "doc_id long, text string",
    )

    # raw bytes: four distinct md5 keys, nothing collapses
    assert dedup.dedup_documents(df).count() == 4

    fixed = text_stats.mojibake_repair(df).select(
        "doc_id", F.col("text_fixed").alias("text")
    )
    normed = text_stats.unicode_normalize(fixed).select(
        "doc_id", F.col("text_nfc").alias("text")
    )
    survivors = {r["doc_id"] for r in dedup.dedup_documents(normed).collect()}
    assert survivors == {1, 4}  # min-id keeper of the collapsed trio + other
