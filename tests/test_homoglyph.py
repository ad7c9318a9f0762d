"""homoglyph_fold (operators/text_stats.py): confusable-script
normalization — exact fold values, idempotence, the map's 1:1
invariants, null preservation, keep_cols passthrough, and the
zero-exchange plan budget."""

from pdf_extractors_spark import plans
from pdf_extractors_spark.operators import text_stats

_SCHEMA = "doc_id long, text string, lang string"


def _t(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _by_id(df):
    return {r["doc_id"]: (r["folded_text"], r["n_folded"]) for r in df.collect()}


def test_fold_values_exact(spark):
    rows = [
        # Cyrillic 'сору' -> 'copy' (4 folds)
        (1, "сору paste", "en"),
        # Greek caps spoof of 'ABEO' (4 folds)
        (2, "ΑΒΕΟ", "en"),
        # fullwidth + ideographic space -> ASCII (7 folds)
        (3, "ＡＢＣ　１２３", "en"),
        # already canonical: unchanged, zero folds
        (4, "plain ascii.", "en"),
    ]
    got = _by_id(text_stats.homoglyph_fold(_t(spark, rows)))
    assert got[1] == ("copy paste", 4)
    assert got[2] == ("ABEO", 4)
    assert got[3] == ("ABC 123", 7)
    assert got[4] == ("plain ascii.", 0)


def test_fold_is_idempotent_and_defeats_spoofed_dedup_key(spark):
    spoof = "pаypal.com"  # Cyrillic а inside a Latin domain
    rows = [(1, spoof, "en"), (2, "paypal.com", "en")]
    once = _by_id(text_stats.homoglyph_fold(_t(spark, rows)))
    assert once[1][0] == once[2][0] == "paypal.com"
    twice = text_stats.homoglyph_fold(
        _t(spark, [(3, once[1][0], "en")])
    ).collect()[0]
    assert twice["folded_text"] == "paypal.com" and twice["n_folded"] == 0


def test_map_invariants():
    # 1:1, no duplicate sources, every target outside the source set
    # (so folding can never cascade), lengths equal
    f, t = text_stats.HOMOGLYPH_FROM, text_stats.HOMOGLYPH_TO
    assert len(f) == len(t)
    assert len(set(f)) == len(f)
    assert not set(t) & set(f)
    assert all(ord(c) > 0x7F for c in f)
    assert all(ord(c) <= 0x7F for c in t)


def test_null_preserved_and_keep_cols(spark):
    rows = [(1, None, "xx")]
    r = text_stats.homoglyph_fold(
        _t(spark, rows), keep_cols=("lang",)
    ).collect()[0]
    assert r["folded_text"] is None
    assert r["n_folded"] == 0
    assert r["lang"] == "xx"


def test_homoglyph_plan_budget(spark):
    df = text_stats.homoglyph_fold(_t(spark, [(1, "x", "en")]))
    a = plans.assert_plan(
        df, max_exchanges=0, no_single_partition=True, no_python=True
    )
    assert a.n_exchanges == 0, a.plan
