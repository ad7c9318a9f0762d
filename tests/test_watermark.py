"""watermark_scan (operators/text_stats.py): green membership pinned
against the portable Python hash, exact bigram/green counts and the
integer z arithmetic, the no-bigram zero class, a synthetic
watermarked-vs-natural separation check, and the zero-exchange plan."""

import math

from pdf_extractors_spark import plans
from pdf_extractors_spark.operators import text_stats
from pdf_extractors_spark.operators.hashing import md5_bigint_py

_SCHEMA = "doc_id long, text string"


def _scan(spark, rows, seed=0):
    return {
        r["doc_id"]: (
            r["n_bigrams"],
            r["n_green"],
            r["green_bp"],
            r["z_x100"],
        )
        for r in text_stats.watermark_scan(
            spark.createDataFrame(rows, _SCHEMA), seed=seed
        ).collect()
    }


def _is_green(prev, tok, seed=0):
    return md5_bigint_py(f"wm:{seed}:{prev}:{tok}") % 2 == 0


def _expected(text, seed=0):
    toks = [t for t in text.lower().split() if t]
    pairs = list(zip(toks, toks[1:]))
    n = len(pairs)
    g = sum(1 for a, b in pairs if _is_green(a, b, seed))
    bp = math.floor(10000 * g / n) if n else 0
    z = math.floor(100.0 * (2 * g - n) / math.sqrt(n)) if n else 0
    return (n, g, bp, z)


def test_counts_match_portable_hash(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "a b a b a b a b",
        3: "word",  # single token: no bigrams
        4: "",
        5: None,
    }
    got = _scan(spark, [(i, t) for i, t in texts.items()])
    for i, t in texts.items():
        assert got[i] == _expected(t or ""), (i, got[i])
    assert got[3] == (0, 0, 0, 0)
    assert got[4] == (0, 0, 0, 0)


def test_seed_changes_the_partition(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta")]
    g0 = _scan(spark, rows, seed=0)[1]
    g7 = _scan(spark, rows, seed=7)[1]
    assert g0 == _expected(rows[0][1], 0)
    assert g7 == _expected(rows[0][1], 7)
    # same bigram count, (almost surely) different green split
    assert g0[0] == g7[0]


def test_watermarked_text_separates_from_natural(spark):
    # build a greedily-watermarked sequence: from each token, pick the
    # first numbered continuation that is green — the generator a
    # green-list watermark implements
    vocab = [f"w{i}" for i in range(50)]
    tok = "w0"
    seq = [tok]
    for _ in range(60):
        tok = next(v for v in vocab if _is_green(tok, v))
        seq.append(tok)
    marked = " ".join(seq)
    natural = " ".join(f"n{i}" for i in range(61))
    got = _scan(spark, [(1, marked), (2, natural)])
    assert got[1][2] == 10000  # all green by construction
    assert got[1][3] > 700  # z = 100*sqrt(60) ≈ 774
    assert abs(got[2][3]) < 300  # natural text: |z| small
    assert got[1] == _expected(marked)
    assert got[2] == _expected(natural)


def test_watermark_plan_budget(spark):
    df = text_stats.watermark_scan(
        spark.createDataFrame([(1, "a b c")], _SCHEMA)
    )
    a = plans.assert_plan(
        df, max_exchanges=0, no_single_partition=True, no_python=True
    )
    assert a.n_exchanges == 0, a.plan
