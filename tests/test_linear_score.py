"""linear_score (operators/text_stats.py): hashed-BoW linear classifier
inference — hand-computed logits against a tiny explicit weight table,
null/empty preservation with logit=bias, unseen-bucket zero
contribution, and the plan budget (broadcast model join, shuffles keyed
on bucket-join/doc_id only)."""

from pdf_extractors_spark import plans
from pdf_extractors_spark.operators import text_stats
from pdf_extractors_spark.operators.hashing import md5_bigint_py

_DOCS = "doc_id long, text string"
_W = "bucket long, weight long"


def _score(spark, docs, weights, **kw):
    return {
        r["doc_id"]: (r["n_tokens"], r["logit"])
        for r in text_stats.linear_score(
            spark.createDataFrame(docs, _DOCS),
            spark.createDataFrame(weights, _W),
            **kw,
        ).collect()
    }


def test_hand_computed_logits(spark):
    n_buckets, bias = 64, 5
    toks = {w: md5_bigint_py(w) % n_buckets for w in ("good", "bad", "ok")}
    # distinct buckets required for the hand computation to be exact
    assert len(set(toks.values())) == 3
    weights = [(toks["good"], 10), (toks["bad"], -20), (toks["ok"], 1)]
    docs = [
        (1, "good good ok"),  # 10+10+1  + bias
        (2, "bad"),  # -20 + bias
        (3, "unseen words only"),  # all-zero buckets unless collision
        (4, "GOOD  Bad"),  # lowercased, multi-space split
    ]
    # doc 3's tokens must not collide into a weighted bucket
    assert all(
        md5_bigint_py(w) % n_buckets not in toks.values()
        for w in ("unseen", "words", "only")
    )
    got = _score(
        spark, docs, weights, n_buckets=n_buckets, bias=bias
    )
    assert got == {
        1: (3, 21 + bias),
        2: (1, -20 + bias),
        3: (3, bias),
        4: (2, 10 - 20 + bias),
    }


def test_null_and_empty_preserved_at_bias(spark):
    got = _score(
        spark,
        [(1, None), (2, ""), (3, "   ")],
        [(0, 99)],
        n_buckets=8,
        bias=-3,
    )
    assert got == {1: (0, -3), 2: (0, -3), 3: (0, -3)}


def test_plan_budget(spark):
    docs = spark.createDataFrame([(1, "a b")], _DOCS)
    w = spark.createDataFrame([(0, 1)], _W)
    df = text_stats.linear_score(docs, w, n_buckets=8)
    a = plans.assert_plan(
        df,
        max_exchanges=3,
        no_python=True,
        shuffle_keys={"doc_id"},
    )
    # the model join must be a broadcast, never a shuffle of the corpus
    # on bucket
    assert "BroadcastHashJoin" in a.plan, a.plan
