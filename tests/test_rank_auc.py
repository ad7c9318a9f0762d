"""rank_auc (operators/text_stats.py): hand-computed U against a tiny
labeled set (including heavy ties), perfect and inverted separations,
the absent-class null, null-row drops, and agreement with a sequential
scipy-free reference implementation on planted data."""

from pdf_extractors_spark.operators import text_stats

_SCHEMA = "score long, label boolean"


def _auc(spark, rows):
    r = text_stats.rank_auc(
        spark.createDataFrame(rows, _SCHEMA), "score", "label"
    ).collect()[0]
    return (r["n_pos"], r["n_neg"], r["u2"], r["auc_ppm"])


def _seq_u2(rows):
    u2 = 0
    for sp, yp in rows:
        if not yp:
            continue
        for sn, yn in rows:
            if yn:
                continue
            u2 += 2 if sp > sn else (1 if sp == sn else 0)
    return u2


def test_hand_computed_with_ties(spark):
    rows = [(3, True), (3, False), (2, True), (1, False), (3, True)]
    # pairs: pos(3)>neg(1):2, pos(3)=neg(3):1  → per pos-at-3: 3
    # pos(2)>neg(1):2, pos(2)<neg(3):0         → 2
    # u2 = 3 + 3 + 2 = 8; n_pos=3, n_neg=2 → auc = 8/12
    assert _seq_u2(rows) == 8
    assert _auc(spark, rows) == (3, 2, 8, 1000000 * 8 // 12)


def test_perfect_and_inverted(spark):
    perfect = [(10, True), (11, True), (1, False), (2, False)]
    assert _auc(spark, perfect) == (2, 2, 8, 1000000)
    inverted = [(1, True), (2, True), (10, False), (11, False)]
    assert _auc(spark, inverted) == (2, 2, 0, 0)


def test_absent_class_yields_null(spark):
    assert _auc(spark, [(1, True), (2, True)]) == (2, 0, 0, None)
    assert _auc(spark, [(1, False)]) == (0, 1, 0, None)


def test_null_rows_dropped(spark):
    rows = [(3, True), (None, True), (1, None), (1, False)]
    assert _auc(spark, rows) == (1, 1, 2, 1000000)


def test_matches_sequential_on_planted(spark):
    rows = [
        ((i * 7) % 5, (i * 13) % 3 == 0) for i in range(60)
    ]
    n_pos = sum(1 for _, y in rows if y)
    n_neg = len(rows) - n_pos
    u2 = _seq_u2(rows)
    assert _auc(spark, rows) == (
        n_pos,
        n_neg,
        u2,
        1000000 * u2 // (2 * n_pos * n_neg),
    )
