"""DSIR importance-resampling weights (operators/sampling.dsir_weights):
pure-Python reference parity (including the bigram feature path the
driver oracle does not cover), empty-document preservation, the
target-affinity semantic property, and the plan budget."""

from __future__ import annotations

import hashlib
import re

from pdf_extractors_spark import plans
from pdf_extractors_spark.operators import sampling

_TARGETY = [
    "the quick brown fox jumps over the lazy dog",
    "a model of the english language prefers english words",
    "the cat sat on the mat and the dog sat too",
    "english text with the usual function words of the language",
]
_NOISY = [
    "zzq qqz xk jjw vv zzq qqz",
    "lorem ipsum dolor sit amet consectetur adipiscing elit",
    "0x1f 0x2e 0x3d deadbeef cafebabe 0x4c",
]


def _py_dsir(raw_rows, target_texts, n_buckets, bigrams):
    """Sequential reference of the documented contract."""

    def feats(text):
        toks = [t for t in re.split(r"\s+", (text or "").strip().lower()) if t]
        fs = list(toks)
        if bigrams:
            fs += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [
            int(hashlib.md5(f"dsir:{f}".encode()).hexdigest()[:8], 16)
            % n_buckets
            for f in fs
        ]

    tf_r, tf_t = {}, {}
    per_doc = {}
    for doc_id, text in raw_rows:
        bs = feats(text)
        per_doc[doc_id] = bs
        for b in bs:
            tf_r[b] = tf_r.get(b, 0) + 1
    for text in target_texts:
        for b in feats(text):
            tf_t[b] = tf_t.get(b, 0) + 1
    n_raw, n_tgt = sum(tf_r.values()), sum(tf_t.values())

    def bits(total, tf):
        return ((total + n_buckets) // (tf + 1)).bit_length() - 1

    out = {}
    for doc_id, bs in per_doc.items():
        w = sum(
            bits(n_raw, tf_r[b]) - bits(n_tgt, tf_t.get(b, 0)) for b in bs
        )
        out[doc_id] = (len(bs), w)
    return out


def _frames(spark):
    raw_rows = [(i, t) for i, t in enumerate(_TARGETY + _NOISY)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(t,) for t in _TARGETY], "text string"
    )
    return raw_rows, raw, target


def test_dsir_weights_matches_python_reference_bigrams(spark):
    raw_rows, raw, target = _frames(spark)
    for bigrams in (True, False):
        got = {
            r["doc_id"]: (r["n_features"], r["log2_weight"])
            for r in sampling.dsir_weights(
                raw, target, n_buckets=64, bigrams=bigrams
            ).collect()
        }
        want = _py_dsir(raw_rows, _TARGETY, n_buckets=64, bigrams=bigrams)
        assert got == want, f"bigrams={bigrams}"


def test_dsir_weights_preserves_empty_docs(spark):
    raw = spark.createDataFrame(
        [(1, "some text here"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([("some text",)], "text string")
    got = {
        r["doc_id"]: (r["n_features"], r["log2_weight"])
        for r in sampling.dsir_weights(raw, target, n_buckets=32).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == (0, 0) and got[3] == (0, 0) and got[4] == (0, 0)
    assert got[1][0] > 0


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """Semantic sanity: with a target of English-like docs, every
    English-like raw doc outweighs every noise doc (per-feature
    normalization makes the comparison length-robust here because the
    planted vocabularies are disjoint)."""
    raw_rows, raw, target = _frames(spark)
    got = {
        r["doc_id"]: r["log2_weight"] / max(r["n_features"], 1)
        for r in sampling.dsir_weights(
            raw, target, n_buckets=4096, bigrams=True
        ).collect()
    }
    n_targety = len(_TARGETY)
    worst_target = min(got[i] for i in range(n_targety))
    best_noise = max(got[i] for i in range(n_targety, len(raw_rows)))
    assert worst_target > best_noise


def test_dsir_weights_plan_budget(spark):
    _, raw, target = _frames(spark)
    df = sampling.dsir_weights(raw, target, n_buckets=64)
    # two bucket groupBys (raw + target), the per-doc aggregation, and
    # the id-set left join: the scoring join itself must stay broadcast
    a = plans.assert_plan(df, max_exchanges=6, no_python=True)
    assert "BroadcastHashJoin" in a.plan
