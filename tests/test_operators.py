"""Tests for the training-data operators (dedup / similarity / text stats /
multimodal), cross-checked against DuckDB where a SQL oracle exists."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_extractors_spark.operators import (
    dedup,
    multimodal,
    salting,
    sampling,
    similarity,
    text_stats,
)
from pdf_extractors_spark.operators.hashing import (
    MINHASH_PRIME,
    affine_perms,
    md5_bigint_py,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


# ---------------------------------------------------------------- hashing


def test_md5_bigint_portable(spark):
    from pdf_extractors_spark.operators.hashing import md5_bigint

    df = spark.createDataFrame([("hello",), ("world",)], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", md5_bigint(F.col("s")).alias("h")).collect()}
    duck = dict(
        duckdb.sql(
            "select s, cast(concat('0x', substr(md5(s),1,8)) as bigint) from (values ('hello'),('world')) t(s)"
        ).fetchall()
    )
    py = {s: md5_bigint_py(s) for s in ("hello", "world")}
    assert got == duck == py


# ------------------------------------------------------------------ dedup


def test_exact_dedup_matches_duckdb(spark, documents):
    got = {
        r["text_hash"]: (r["n_dups"], r["keep_id"])
        for r in dedup.exact_dedup(documents).collect()
    }
    duck = {
        h: (n, k)
        for h, n, k in duckdb.sql(
            f"""
            select cast(concat('0x', substr(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))),1,8)) as bigint) as th,
                   count(*) as n, min(doc_id) as k
            from '{SF_DIR}/documents.parquet' group by th
            """
        ).fetchall()
    }
    assert got == duck


def test_minhash_signatures_match_duckdb(spark, documents):
    got = {
        r["doc_id"]: tuple(r[f"h{i}"] for i in range(4))
        for r in dedup.minhash_signatures(documents, k=4).collect()
    }
    duck = {
        row[0]: tuple(row[1:])
        for row in duckdb.sql(
            f"""
            with t as (
              select doc_id,
                     string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') as w
              from '{SF_DIR}/documents.parquet'
            ), sh as (
              select doc_id,
                     unnest(case when len(w) >= 3 then
                        list_distinct(list_transform(
                          range(1, len(w) - 1),
                          i -> array_to_string(w[i:i+2], ' ')))
                        else [] end) as shingle
              from t
            )
            select doc_id, {", ".join(
                f"min(({a} * (cast(concat('0x', substr(md5(shingle),1,8)) as bigint) % {MINHASH_PRIME}) + {b}) % {MINHASH_PRIME}) as h{i}"
                for i, (a, b) in enumerate(affine_perms(4))
            )}
            from sh group by doc_id
            """
        ).fetchall()
    }
    assert got == duck


def test_lsh_candidates_include_exact_dups(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (3, "totally different words entirely here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(df, k=8)
    cands = {(r["id_a"], r["id_b"]) for r in dedup.lsh_candidates(sigs, bands=4, rows=2).collect()}
    assert (1, 2) in cands
    assert (1, 3) not in cands and (2, 3) not in cands


def test_ngram_jaccard(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g h"),
        (3, "a b c d e f x y"),
        (4, "q r s t u v w z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, n=2, threshold=0.0).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0 < pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs  # no shared shingle


def test_ngram_jaccard_materialization_invariant(spark, tmp_path):
    """The cached, uncached, and checkpointed shingle-table paths return
    identical pairs — materialization is a scale knob, not a semantic."""
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g h"),
        (3, "a b c d e f x y"),
        (4, "q r s t u v w z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(**kw):
        return sorted(
            tuple(r) for r in dedup.ngram_jaccard_pairs(
                df, n=2, threshold=0.0, **kw
            ).collect()
        )

    cached = run(cache=True)
    assert run(cache=False) == cached
    assert run(checkpoint_path=str(tmp_path / "shingles")) == cached


def test_simhash_identical_and_different(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, "completely unrelated tokens xyzzy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    assert sh[1] == sh[2]
    assert sh[1] != sh[3]
    groups = dedup.simhash_dup_groups(df).collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 2


# -------------------------------------------------------------- similarity


def test_brute_force_topk_matches_duckdb(spark, embeddings):
    queries = (
        embeddings.filter("vec_id < 3")
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cos"])
        for r in similarity.brute_force_topk(embeddings, queries, k=3).collect()
    }
    duck = {
        (q, rk): (v, c)
        for q, v, c, rk in duckdb.sql(
            f"""
            with e as (select vec_id, cast(embedding as double[]) as embedding
                       from '{SF_DIR}/embeddings.parquet'),
            q as (select vec_id as query_id, embedding as qe from e where vec_id < 3)
            select query_id, vec_id,
                   round(list_cosine_similarity(qe, embedding), 4) as cos,
                   row_number() over (partition by query_id
                                      order by round(list_cosine_similarity(qe, embedding),4) desc, vec_id) as rk
            from q, e where vec_id != query_id
            qualify rk <= 3
            """
        ).fetchall()
    }
    assert got == duck


def test_ivf_topk_reasonable_recall(spark, embeddings):
    queries = (
        embeddings.filter("vec_id >= 100 and vec_id < 110")
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    cents = similarity.take_centroids(embeddings, n=8)
    exact = similarity.brute_force_topk(embeddings, queries, k=5)
    approx = similarity.ivf_topk(embeddings, queries, cents, k=5, n_probe=3)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3  # ANN with 3/8 cells probed on random vectors


def test_embedding_neardup_finds_planted_pairs(spark, embeddings):
    """Sign-bit LSH bucketing + exact-cosine verify recovers every planted
    near-duplicate: a last-component sign flip leaves the first 32
    components' signs unchanged, so original and copy share all 4 band
    keys; their cosine is 1 - 2·v_d²/‖v‖² ≈ 0.97 for 64-dim vectors."""
    planted = similarity.with_flipped_copies(embeddings, id_offset=1_000_000)
    pairs = similarity.embedding_neardup_pairs(planted, threshold=0.9)
    rows = pairs.collect()
    assert rows, "no near-dup pairs found"
    got = {(r["id_a"], r["id_b"]): r["cos"] for r in rows}
    for (a, b), cos in got.items():
        assert a < b
        assert cos >= 0.9
    n_vecs = embeddings.count()
    planted_found = sum(1 for (a, b) in got if b == a + 1_000_000)
    # nearly all planted pairs clear the 0.9 cosine bar (a vector with an
    # unusually large last component legitimately falls below it)
    assert planted_found >= 0.9 * n_vecs
    # verification actually filters: no pair below threshold sneaks in
    assert all(c >= 0.9 for c in got.values())


def test_embedding_neardup_no_false_positives_on_base(spark, embeddings):
    """On the raw table (max pairwise cosine ≈ 0.51) the verify stage
    leaves nothing — buckets alone never produce output pairs."""
    assert similarity.embedding_neardup_pairs(embeddings, threshold=0.9).count() == 0


def test_embedding_neardup_rotation_recall_vs_brute_force(spark):
    """The seeded random-rotation LSH variant recovers ≥0.9 of the
    brute-force ground-truth pairs at threshold 0.9 — on embeddings with
    a shared positive bias, where axis-aligned planes degenerate (every
    vector has the same sign pattern on the biased axes)."""
    import numpy as np

    rng = np.random.RandomState(7)
    dim, n_base, n_dup = 32, 60, 25
    base = rng.standard_normal((n_base, dim)) + 1.2  # axis-correlated bias
    dups = base[:n_dup] + 0.05 * rng.standard_normal((n_dup, dim))
    vecs = np.vstack([base, dups])
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    truth = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if round(sims[i, j], 4) >= 0.9
    }
    assert truth, "planting produced no ground-truth pairs"

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_pairs(
            df, threshold=0.9, rotation_seed=42
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"rotation-LSH recall {recall:.2f} < 0.9"
    assert got <= truth  # exact verify: no pair below threshold survives

    # determinism: same seed → same buckets → same pairs
    again = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_pairs(
            df, threshold=0.9, rotation_seed=42
        ).collect()
    }
    assert again == got


# -------------------------------------------------------------- text stats


def test_token_count_matches_duckdb(spark, documents):
    got = {
        r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"])
        for r in text_stats.token_count(documents).collect()
    }
    duck = {
        d: (w, b)
        for d, w, b in duckdb.sql(
            f"""
            select doc_id,
                   len(string_split_regex(trim(lower(text)), '\\s+')) as ws,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) as bpe
            from '{SF_DIR}/documents.parquet'
            """
        ).fetchall()
    }
    assert got == duck


def test_quality_and_langid_run(spark, documents):
    q = text_stats.quality_score(documents)
    rows = q.collect()
    assert all(0 <= r["quality_bp"] <= 10000 for r in rows)
    li = text_stats.lang_id(documents)
    preds = {r["lang_pred"] for r in li.collect()}
    assert preds <= {"en", "de", "fr", "es", "und"}


def test_fingerprint_stability(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "entirely different content with no overlap whatsoever in grams"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r["doc_id"]: r["fingerprint"] for r in text_stats.fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]


# ------------------------------------------------- training-data pipeline ops


def test_repetition_score_detects_loops(spark):
    rows = [
        (1, "a b c d e f g h i j"),          # no repeats
        (2, "spam spam spam spam spam spam"),  # degenerate loop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["repetition"] for r in text_stats.repetition_score(df).collect()}
    assert got[1] == 0.0
    assert got[2] == 0.75  # 4 trigrams, 1 distinct


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail me at jane.doe@corp.io or call +1 555 0100 from 10.1.2.3 ok")],
        "doc_id long, text string",
    )
    r = text_stats.pii_scrub(df).collect()[0]
    assert r["n_email"] == 1 and r["n_phone"] == 1 and r["n_ipv4"] == 1
    s = r["scrubbed_text"]
    assert "[EMAIL]" in s and "[PHONE]" in s and "[IPV4]" in s
    assert "jane.doe" not in s and "555 0100" not in s and "10.1.2.3" not in s


def test_hash_split_deterministic_and_proportional(spark, documents):
    from pdf_extractors_spark.operators import sampling

    w = {"train": 80, "val": 10, "test": 10}
    a = {r["doc_id"]: r["split"] for r in sampling.hash_split(documents, w).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(documents.repartition(7), w).collect()
    }
    assert a == b  # partitioning-independent assignment
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    assert 0.7 * n < train < 0.9 * n  # ±hash noise around 80%
    with pytest.raises(ValueError):
        sampling.hash_split(documents, {"train": 50})


def test_decontaminate_flags_planted_overlap(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely unrelated text with different words entirely here"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_overlapping"] for r in dedup.decontaminate(corpus, bench, n=5).collect()}
    assert 1 in got and got[1] >= 1
    assert 2 not in got


def test_kmeans_refinement_improves_ivf_recall(spark, embeddings):
    """Lloyd refinement of the naive seed centroids must not hurt (and on
    random clusters typically improves) IVF recall at equal probe cost."""
    queries = (
        embeddings.filter("vec_id >= 200 and vec_id < 210")
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.brute_force_topk(embeddings, queries, k=5).collect()
    }

    def recall(cents):
        approx = {
            (r["query_id"], r["vec_id"])
            for r in similarity.ivf_topk(
                embeddings, queries, cents, k=5, n_probe=3
            ).collect()
        }
        return len(exact & approx) / len(exact)

    naive = recall(similarity.take_centroids(embeddings, n=8))
    refined_cents = similarity.kmeans_centroids(embeddings, n=8, iters=3)
    assert refined_cents.count() == 8
    refined = recall(refined_cents)
    assert refined >= naive - 0.1  # never materially worse
    assert refined >= 0.3


def test_asof_join_null_values_match_duckdb(spark):
    """The struct-carry as-of join must agree with DuckDB's native ASOF
    JOIN even when the matched right row holds NULL value columns — the
    per-column fill-down formulation would blend columns from different
    right rows here."""
    from pdf_extractors_spark.operators import joins

    left_rows = [(i, "u1", i * 10) for i in range(1, 7)]
    right_rows = [
        ("u1", 10, 100.0, None),   # ask null
        ("u1", 25, None, 250.0),   # bid null — must NOT inherit bid=100
        ("u1", 45, 400.0, 450.0),
    ]
    left = spark.createDataFrame(left_rows, "event_id long, user_id string, ts long")
    right = spark.createDataFrame(
        right_rows, "user_id string, ts long, bid double, ask double"
    )
    out = joins.asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["bid", "ask"],
    )
    got = {
        r["event_id"]: (r["asof_bid"], r["asof_ask"]) for r in out.collect()
    }
    duck = {
        eid: (b, a)
        for eid, b, a in duckdb.sql(
            """
            with l as (select * from (values (1,'u1',10),(2,'u1',20),(3,'u1',30),
                                             (4,'u1',40),(5,'u1',50),(6,'u1',60))
                       t(event_id, user_id, ts)),
            r as (select * from (values ('u1',10,100.0,NULL),
                                        ('u1',25,NULL,250.0),
                                        ('u1',45,400.0,450.0))
                  t(user_id, ts, bid, ask))
            select l.event_id, r.bid, r.ask
            from l asof left join r on l.user_id = r.user_id and l.ts >= r.ts
            """
        ).fetchall()
    }
    assert got == duck
    # the ts=30/40 events sit on the bid-null row: bid must be None
    assert got[3] == (None, 250.0) and got[4] == (None, 250.0)


# -------------------------------------------------------------- multimodal


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media(spark, n=30)
    feats = multimodal.extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
    # frame-sample plan fan-out
    frames = multimodal.frame_sample_plan(media, every_ms=5000)
    assert frames.count() > 0
    assert frames.filter("frame_ts_ms % 5000 != 0").count() == 0


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"bytes", "image", fake=False)


def test_connected_components_matches_union_find(spark):
    """Min-label propagation equals a sequential union-find on graphs
    that need several rounds: chains, a star, two merged clusters, a
    singleton pair — and the result is the component's min id."""
    pairs = [
        (2, 1), (3, 2), (4, 3), (5, 4),      # chain 1-5 (diameter 4)
        (10, 11), (10, 12), (10, 13),        # star at 10
        (20, 21), (22, 23), (21, 22),        # two clusters merged
        (30, 31),                            # singleton pair
    ]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    expected = {}
    roots: dict[int, int] = {}
    for n in parent:
        r = find(n)
        roots[r] = min(roots.get(r, n), n)
    for n in parent:
        expected[n] = roots[find(n)]

    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["node"]: r["comp"]
        for r in dedup.connected_components(df).collect()
    }
    assert got == expected
    # the star-contraction path computes the identical fixpoint
    got_star = {
        r["node"]: r["comp"]
        for r in dedup.connected_components(df, algorithm="star").collect()
    }
    assert got_star == expected


def test_connected_components_raises_on_max_iter(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(df, max_iter=1, on_stall="raise")


def test_connected_components_star_fallback_on_stall(spark):
    """Default on_stall: a chain whose diameter exceeds max_iter falls
    back to large-star/small-star and still returns the exact clusters
    (this is the high-diameter pathology the propagate docstring names)."""
    n = 40  # diameter 39 ≫ max_iter
    chain = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    got = {
        r["node"]: r["comp"]
        for r in dedup.connected_components(df, max_iter=3).collect()
    }
    assert got == {i: 0 for i in range(n + 1)}


def test_connected_components_star_direct_shapes(spark):
    """algorithm='star' on mixed shapes: chain + star + merged pair +
    self-loop-only singleton, string ids (lexicographic min)."""
    pairs = [
        ("c", "b"), ("d", "c"), ("e", "d"),   # chain b-e
        ("k", "j"), ("k", "l"),               # star at k
        ("p", "q"), ("q", "r"),               # merged pair
        ("z", "z"),                           # self-loop singleton
    ]
    df = spark.createDataFrame(pairs, "id_a string, id_b string")
    got = {
        r["node"]: r["comp"]
        for r in dedup.connected_components(df, algorithm="star").collect()
    }
    assert got == {
        "b": "b", "c": "b", "d": "b", "e": "b",
        "j": "j", "k": "j", "l": "j",
        "p": "p", "q": "p", "r": "p",
        "z": "z",
    }


def test_unigram_lm_score_surprisal_orders_common_vs_rare(spark):
    """Rare-token documents carry higher mean floor-bit surprisal than
    corpus-common ones; exact integer values on a hand-computable
    corpus, and zero-token documents are preserved with zeros."""
    rows = [
        (1, "a a a a"),        # 'a' tf=4 of 6 tokens
        (2, "b zz"),           # hapax tokens
        (3, ""),               # no tokens at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["total_bits"], r["mean_bits_bp"])
           for r in text_stats.unigram_lm_score(df).collect()}
    # corpus: tf(a)=4, tf(b)=tf(zz)=1; N=6, V=3, N+V=9
    # 'a': floor(log2(9/5)) = 0; 'b'/'zz': floor(log2(9/2)) = 2
    assert got[1] == (4, 0, 0)
    assert got[2] == (2, 4, 20000)
    assert got[3] == (0, 0, 0)
    assert got[2][2] > got[1][2]


def test_bigram_lm_score_hand_computed_and_zero_preserving(spark):
    """Exact integer values on a hand-computable corpus, plus the
    preserve-with-zeros contract for <2-token / empty / null docs.

    Corpus bigrams: 'a b'x1, 'b a'x2; ctx(a)=1, ctx(b)=2; V=3 (a,b,x).
    bits('a b') = bit_length((1+3) div 2) - 1 = 1
    bits('b a') = bit_length((2+3) div 3) - 1 = 0
    """
    rows = [
        (1, "a b a"),   # bigrams: 'a b', 'b a' -> 1 + 0 bits
        (2, "b a"),     # bigram:  'b a'        -> 0 bits
        (3, "x"),       # single token: zeros
        (4, ""),        # empty: zeros
        (5, None),      # null: zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["total_bits"], r["mean_bits_bp"])
           for r in text_stats.bigram_lm_score(df).collect()}
    assert got[1] == (2, 1, 5000)  # mean 0.5 bits -> 5000 bp (half-up)
    assert got[2] == (1, 0, 0)
    assert got[3] == (0, 0, 0)
    assert got[4] == (0, 0, 0)
    assert got[5] == (0, 0, 0)
    assert len(got) == 5


def test_bigram_lm_score_detects_word_salad_unigram_cannot(spark):
    """Shuffling word order leaves the unigram score identical but
    raises the bigram score — the pair separates word-salad spam."""
    natural = "the cat sat on the mat " * 4
    salad = "the the cat on mat sat the on cat sat mat the " * 2
    rows = [(1, natural.strip()), (2, salad.strip())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uni = {r["doc_id"]: r["mean_bits_bp"]
           for r in text_stats.unigram_lm_score(df).collect()}
    bi = {r["doc_id"]: r["mean_bits_bp"]
          for r in text_stats.bigram_lm_score(df).collect()}
    assert uni[1] == uni[2]       # same bag of words
    assert bi[2] > bi[1]          # order scrambled -> higher surprisal


def test_char_entropy_hand_computed_and_zero_preserving(spark):
    """Exact integer floor-bit values on hand-computable strings, and
    the preserve-with-zeros contract for empty/null text.

    'aab': N=3; bits(a)=bl(3 div 2)-1=0, bits(b)=bl(3)-1=1 -> total 1
    'abcd': N=4; every char bl(4)-1=2 -> total 8, mean 2 bits
    """
    rows = [
        (1, "aab"),
        (2, "aaaa"),   # single char class: zero entropy
        (3, "abcd"),   # uniform alphabet: 2 floor-bits/char
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chars"], r["distinct_chars"],
                      r["total_bits"], r["mean_bits_bp"])
        for r in text_stats.char_entropy(df).collect()
    }
    assert got[1] == (3, 2, 1, 3333)   # 1/3 bit -> 3333 bp (half-up)
    assert got[2] == (4, 1, 0, 0)
    assert got[3] == (4, 4, 8, 20000)
    assert got[4] == (0, 0, 0, 0)
    assert got[5] == (0, 0, 0, 0)
    assert len(got) == 5


def test_char_entropy_separates_blob_from_natural_text(spark):
    """A base64-ish uniform-alphabet blob scores far above repeated
    natural English of the same length — the gibberish detector that,
    unlike compression_ratio, is pure columns and SQL-oracled."""
    import string

    blob = (string.ascii_letters + string.digits + "+/") * 4
    natural = ("the cat sat on the mat and the dog sat too " * 6)[: len(blob)]
    rows = [(1, blob), (2, natural)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["mean_bits_bp"]
           for r in text_stats.char_entropy(df).collect()}
    assert got[1] >= 50000          # uniform 64-char alphabet: 5 floor-bits
    assert got[2] <= 30000          # natural text sits far lower
    assert got[1] > got[2]


def test_dates_extract_all_formats_and_validity(spark):
    """Every supported written form normalizes to the same ISO string;
    a bounds-invalid mention keeps its row with iso null; match order
    follows document position across mixed formats."""
    rows = [
        (1, "Invoice Date: 25.03.2022 Due Date: 08.04.2022"),
        (2, "updated 2024-07-01 and filed 3/14/2015"),
        (3, "signed March 5, 1999 then Dec 31, 2024"),
        (4, "broken 45.13.2022 tail"),
        (5, "no dates here"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["match_idx"]): (r["raw"], r["fmt"], r["valid"], r["iso"])
        for r in text_stats.dates_extract(df).collect()
    }
    assert got[(1, 0)] == ("25.03.2022", "dmy_dot", True, "2022-03-25")
    assert got[(1, 1)] == ("08.04.2022", "dmy_dot", True, "2022-04-08")
    assert got[(2, 0)] == ("2024-07-01", "iso", True, "2024-07-01")
    assert got[(2, 1)] == ("3/14/2015", "mdy_slash", True, "2015-03-14")
    assert got[(3, 0)] == ("March 5, 1999", "month_name", True, "1999-03-05")
    assert got[(3, 1)] == ("Dec 31, 2024", "month_name", True, "2024-12-31")
    assert got[(4, 0)] == ("45.13.2022", "dmy_dot", False, None)
    assert len(got) == 7          # docs 5 and 6 emit no rows


def test_html_tables_structure_headers_and_tag_strip(spark):
    """Header flags, multi-table indexing, whitespace collapse, nested
    inline-tag strip, uppercase tags, and the malformed-markup contract
    (unclosed cell emits nothing)."""
    rows = [
        (1, "<table><tr><th>h1</th><th>h2</th></tr>"
            "<tr><td>a</td><td>b</td></tr></table>"),
        (2, '<table class="x"><tr><td> spaced  text </td></tr></table>'
            " then <table><tr><td>2nd</td></tr></table>"),
        (3, "<TABLE><TR><TD>UPPER<b>bold</b></TD></TR></TABLE>"),
        (4, "<table><tr><td>never closed"),
        (5, "no markup"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["table_idx"], r["row_idx"], r["col_idx"]):
            (r["is_header"], r["cell"])
        for r in text_stats.html_tables(df).collect()
    }
    assert got[(1, 0, 0, 0)] == (True, "h1")
    assert got[(1, 0, 0, 1)] == (True, "h2")
    assert got[(1, 0, 1, 0)] == (False, "a")
    assert got[(1, 0, 1, 1)] == (False, "b")
    assert got[(2, 0, 0, 0)] == (False, "spaced text")
    assert got[(2, 1, 0, 0)] == (False, "2nd")
    assert got[(3, 0, 0, 0)] == (False, "UPPERbold")
    assert len(got) == 7          # docs 4-6 emit nothing


def test_tokenizer_fertility_hand_computed(spark):
    """Exact per-language rollup: 'don't stop' is 2 words / 4 BPE-ish
    tokens (don, ', t, stop) = fertility 2.0; empty and null text count
    zero tokens and zero bytes but still count as documents."""
    rows = [
        (1, "en", "don't stop"),   # ws 2, bpe 4, bytes 10
        (2, "en", ""),             # ws 0, bpe 0, bytes 0
        (3, "de", "ab cd"),        # ws 2, bpe 2, bytes 5
        (4, "de", None),           # ws 0, bpe 0, bytes 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["lang"]: (r["n_docs"], r["ws_tokens"], r["bpe_tokens"],
                    r["n_bytes"], r["fertility_bp"], r["bytes_per_token_bp"])
        for r in text_stats.tokenizer_fertility(df).collect()
    }
    assert got["en"] == (2, 2, 4, 10, 20000, 25000)
    assert got["de"] == (2, 2, 2, 5, 10000, 25000)


def test_stratified_sample_deterministic_and_proportional(spark, documents):
    bp = {"en": 10000, "de": 0}
    s1 = sampling.stratified_sample(documents, bp).select("doc_id").collect()
    s2 = sampling.stratified_sample(documents, bp).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in s1) == sorted(r["doc_id"] for r in s2)
    langs = {
        r["lang"]
        for r in sampling.stratified_sample(documents, bp).select("lang").distinct().collect()
    }
    assert langs <= {"en"}  # de and unmapped strata dropped entirely
    n_en = documents.filter("lang = 'en'").count()
    assert len(s1) == n_en  # 10000 bp keeps every row of the stratum


def test_connected_components_random_graphs_match_union_find(spark):
    """Random graphs (hypothesis) vs sequential union-find. One Spark
    session, several drawn graphs per run — Spark startup dominates, so
    examples are batched into a single test body."""
    import random

    rng = random.Random(99)
    for _ in range(6):
        n_nodes = rng.randint(2, 24)
        n_edges = rng.randint(1, 30)
        pairs = [
            (rng.randint(0, n_nodes - 1), rng.randint(0, n_nodes - 1))
            for _ in range(n_edges)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        roots: dict[int, int] = {}
        for node in parent:
            r = find(node)
            roots[r] = min(roots.get(r, node), node)
        expected = {node: roots[find(node)] for node in parent}

        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        got = {
            r["node"]: r["comp"]
            for r in dedup.connected_components(df).collect()
        }
        assert got == expected, (pairs, got, expected)
        got_star = {
            r["node"]: r["comp"]
            for r in dedup.connected_components(df, algorithm="star").collect()
        }
        assert got_star == expected, (pairs, got_star, expected)


def test_gopher_flags_adversarial_docs(spark):
    """Each rule fires on a purpose-built document and stays quiet on a
    clean one (exact integer thresholds, no float division)."""
    clean = "the quick brown fox jumps over the lazy dog and runs for cover in the field"
    rows = [
        (1, clean),                                      # passes everything
        (2, "short text"),                               # < 10 words
        (3, " ".join(["pneumonoultramicroscopic"] * 20)),  # mean word len > 12, no stopwords
        (4, clean + " " + "#" * 30),                     # symbol ratio
        (5, "\n".join(["- item " + str(i) for i in range(10)])),  # all bullet lines
        (6, "\n".join([clean, "truncated line...", "another one...", "and more..."])),
        (7, " ".join(["zz"] * 60)),                      # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in text_stats.gopher_quality_flags(df).collect()}
    assert got[1]["gopher_pass"] is True
    assert got[2]["flag_word_count"] and not got[2]["gopher_pass"]
    assert got[3]["flag_mean_word_len"]
    assert got[4]["flag_symbol_ratio"]
    assert got[5]["flag_bullet_lines"]
    assert got[6]["flag_ellipsis_lines"]
    assert got[7]["flag_stopword_frac"] and not got[7]["gopher_pass"]


def test_dedup_paragraphs_removes_repeats_keeps_order(spark):
    rows = [
        (1, "alpha\nbeta\nalpha\ngamma\nbeta"),   # two repeats dropped
        (2, "one\ntwo\nthree"),                   # nothing to drop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["dedup_text"], r["n_removed"])
           for r in dedup.dedup_paragraphs(df).collect()}
    assert got[1] == ("alpha\nbeta\ngamma", 2)
    assert got[2] == ("one\ntwo\nthree", 0)


def test_dedup_paragraphs_preserves_null_text_rows(spark):
    """unigram_lm_score's preserve-with-zeros contract: null-text docs
    stay in the output as (null, 0) instead of vanishing in the explode."""
    rows = [(1, "a\nb\na"), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["dedup_text"], r["n_removed"])
           for r in dedup.dedup_paragraphs(df).collect()}
    assert got[1] == ("a\nb", 1)
    assert got[2] == (None, 0)
    assert got[3] == ("", 0)


def test_dedup_paragraphs_metachar_and_quote_end_separators(spark):
    r"""The separator is escaped per-char, so regex metachars and the
    \Q..\E terminator itself are safe as literal separators."""
    sep = r"\E|."  # would terminate a \Q..\E quote AND inject metachars
    rows = [(1, sep.join(["a", "b", "a", "c"]))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.dedup_paragraphs(df, sep=sep).collect()[0]
    assert got["dedup_text"] == sep.join(["a", "b", "c"])
    assert got["n_removed"] == 1


def test_mix_epochs_whole_and_fractional_copies(spark):
    """Weight 20000 bp -> exactly 2 copies of every doc; 0 -> none;
    absent stratum -> default 1; fractional weights produce the exact
    hash-thresholded count (replayed in python on the portable hash) and
    the result is repartition-invariant."""
    from pdf_extractors_spark.operators import sampling
    from pdf_extractors_spark.operators.hashing import md5_bigint_py

    rows = [(i, "a" if i < 10 else "b" if i < 20 else "c")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"a": 20000, "b": 0}   # c absent -> default 10000
    out = sampling.mix_epochs(df, weights).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["copy"])
    for i in range(10):
        assert sorted(by_doc[i]) == [1, 2]
    for i in range(10, 20):
        assert i not in by_doc
    for i in range(20, 30):
        assert by_doc[i] == [1]
    # fractional: 12500 bp -> 1 copy always, 2nd iff hash bucket < 2500
    frac = sampling.mix_epochs(df, {"a": 12500, "b": 12500, "c": 12500})
    got = {r["doc_id"]: r["copy"] for r in
           frac.groupBy("doc_id").agg(F.max("copy").alias("copy")).collect()}
    for i in range(30):
        expect = 1 + (md5_bigint_py(f"mix:{i}") % 10000 < 2500)
        assert got[i] == expect, i
    # determinism under repartitioning
    a = sorted((r["doc_id"], r["copy"]) for r in frac.collect())
    b = sorted(
        (r["doc_id"], r["copy"])
        for r in sampling.mix_epochs(
            df.repartition(7), {"a": 12500, "b": 12500, "c": 12500}
        ).collect()
    )
    assert a == b


def test_bm25_topk_ranking_and_partition_invariance(spark):
    """BM25 ranks the doc with more query-term mass first; a term in
    EVERY doc gets qidf 0 and contributes nothing; the two-phase local
    top-k gives identical results at 1 and 8 input partitions (exactness
    of the per-partition prune)."""
    from pdf_extractors_spark.operators import retrieval

    docs = [
        (1, "spark spark spark join other words here now"),
        (2, "spark join filler filler filler filler filler filler"),
        (3, "unrelated content entirely about nothing relevant"),
        (4, "common common common common common common common common"),
    ]
    # 'common' also planted in every doc -> df = N -> qidf 0
    docs = [(i, t + " common") for i, t in docs]
    qs = [("qa", "spark join common")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(qs, "query_id string, qtext string")
    got = retrieval.bm25_topk(ddf, qdf, k=10).orderBy("rank").collect()
    # 'common' is in all 4 docs -> df=N -> qidf 0 -> contributes nothing,
    # but still makes docs 3 and 4 zero-score candidates; tie -> id asc
    assert [r["doc_id"] for r in got] == [1, 2, 3, 4]
    assert all(r["query_id"] == "qa" for r in got)
    by_doc = {r["doc_id"]: r["score_bp"] for r in got}
    assert by_doc[1] > by_doc[2] > 0
    assert by_doc[3] == by_doc[4] == 0
    # partition invariance (k=3 also exercises the prune boundary)
    a = retrieval.bm25_topk(ddf.repartition(1), qdf, k=3).orderBy("rank").collect()
    b = retrieval.bm25_topk(ddf.repartition(8), qdf, k=3).orderBy("rank").collect()
    assert [(r["doc_id"], r["score_bp"], r["rank"]) for r in a] == [
        (r["doc_id"], r["score_bp"], r["rank"]) for r in b
    ]


def test_bm25_topk_tf_saturation(spark):
    """k1 saturation: tripling an already-frequent term must gain less
    than the first occurrence is worth (the 22S·tf/(10S·tf+...) curve
    flattens), and longer docs are length-penalized."""
    from pdf_extractors_spark.operators import retrieval

    docs = [
        (1, "term filler filler filler"),
        (2, "term term term term filler filler filler filler"),
        # two term-free docs so df=2 < N=4 -> qidf = floor(log2(4/2)) = 1
        (3, "filler filler filler filler"),
        (4, "filler filler filler filler"),
    ]
    qdf = spark.createDataFrame(
        [("q", "term")], "query_id string, qtext string"
    )
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["score_bp"]
           for r in retrieval.bm25_topk(ddf, qdf, k=10).collect()}
    assert got[2] > got[1]              # more occurrences still score higher
    assert got[2] < 4 * got[1]          # but sub-linearly (saturation)


def test_top_ngram_char_frac_counts_and_tiebreak(spark):
    """Most frequent 2-gram wins; equal counts break to the smallest
    gram; coverage = count x gram chars in half-up basis points; null
    and sub-n docs preserve with zeros."""
    from pdf_extractors_spark.operators import text_stats

    rows = [
        (1, "a b a b a b"),      # grams: 'a b'x3, 'b a'x2 -> top 'a b'
        (2, "x y z"),            # all counts 1 -> tie -> 'x y' (smallest)
        (3, "solo"),             # < 2 tokens -> no grams
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["top_gram"], r["top_count"], r["top_char_bp"])
           for r in text_stats.top_ngram_char_frac(df).collect()}
    # doc 1: norm 'a b a b a b' = 11 chars; 3*3=9 chars -> 8182 bp half-up
    assert got[1] == ("a b", 3, round(10000 * 9 / 11))
    assert got[2] == ("x y", 1, round(10000 * 3 / 5))
    assert got[3] == (None, 0, 0)
    assert got[4] == (None, 0, 0)
    # cap: overlapping occurrences can cover more than the text
    cap = {r["doc_id"]: r["top_char_bp"]
           for r in text_stats.top_ngram_char_frac(
               spark.createDataFrame([(1, "a a a a a a a a")],
                                     "doc_id long, text string")).collect()}
    assert cap[1] == 10000


def test_global_line_dedup_keeps_first_occurrence_across_docs(spark):
    """CCNet cross-corpus line dedup: a line repeated in ANOTHER document
    survives only at its globally-first (doc_id, pos); short pass-through
    blocks (len < min_chars) never dedup; a doc whose every line is cut
    still emits a row with empty text."""
    rows = [
        (1, "shared line\nunique one"),
        (2, "unique two\nshared line"),     # 'shared line' cut here
        (3, "shared line"),                 # fully cut -> '' row survives
        (4, "a\n\nb\n"),                    # empty lines pass through
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["dedup_text"], r["n_removed"])
           for r in dedup.global_line_dedup(df).collect()}
    assert got[1] == ("shared line\nunique one", 0)
    assert got[2] == ("unique two", 1)
    assert got[3] == ("", 1)
    assert got[4] == ("a\n\nb\n", 0)
    assert got[5] == (None, 0)
    # min_chars raises the pass-through bar: 1-char lines now always kept
    got2 = {r["doc_id"]: (r["dedup_text"], r["n_removed"])
            for r in dedup.global_line_dedup(
                spark.createDataFrame([(1, "a\nxx"), (2, "a\nxx")],
                                      "doc_id long, text string"),
                min_chars=2).collect()}
    assert got2[1] == ("a\nxx", 0)
    assert got2[2] == ("a", 1)


def test_segment_paragraphs_offsets_are_exact(spark):
    """text[seg_start:seg_end] == segment for every row; null text is
    preserved as one null segment."""
    rows = [(1, "alpha\nbeta gamma\n\ndelta"), (2, ""), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_stats.segment_paragraphs(df).collect()
    texts = dict(rows)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    segs1 = sorted(by_doc[1], key=lambda r: r["seg_idx"])
    assert [r["segment"] for r in segs1] == ["alpha", "beta gamma", "", "delta"]
    for r in segs1:
        assert texts[1][r["seg_start"]:r["seg_end"]] == r["segment"]
    assert [(r["segment"], r["seg_start"], r["seg_end"]) for r in by_doc[2]] == [
        ("", 0, 0)
    ]
    assert [(r["segment"], r["seg_start"], r["seg_end"]) for r in by_doc[3]] == [
        (None, None, None)
    ]


def test_dup_ngram_char_frac_counts_duplicated_gram_chars(spark):
    # doc 1: "a b c a b c a b c" → all 7 3-grams duplicated; every gram
    # is 5 chars → dup_chars 35; norm len 17 → bp min(10000, half-up)
    rows = [
        (1, "a b c a b c a b c"),
        (2, "one two three four five"),  # no repeats
        (3, "x y"),                      # too short: zero grams
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["dup_chars"], r["dup_char_bp"])
           for r in text_stats.dup_ngram_char_frac(df).collect()}
    assert got[1] == (35, 10000)
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)
    assert got[4] == (0, 0)


def test_dedup_against_keeps_unseen_first_occurrences(spark):
    corpus = spark.createDataFrame(
        [(1, "seen text"), (2, "other corpus doc")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "seen text"),        # already in corpus → dropped
            (11, "brand new"),        # kept
            (12, "brand new"),        # dup within batch → dropped
            (13, "Seen   TEXT"),      # normalizes to corpus doc → dropped
            (14, None),               # null class, unseen → kept
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in dedup.dedup_against(corpus, new).collect()
    )
    assert kept == [11, 14]


def test_conv_pairs_bounded_context_in_order(spark):
    from pdf_extractors_spark import pipeline

    rows = [
        ("c1", 0, "user", "u0"),
        ("c1", 1, "assistant", "a1"),
        ("c1", 2, "tool", None),        # null turn → '' in context
        ("c1", 3, "user", "u3"),
        ("c1", 4, "assistant", "a4"),
        ("c1", 5, "user", "u5"),
        ("c1", 6, "assistant", "a6"),   # context capped at 4 turns
        ("c2", 0, "assistant", "solo"), # no preceding turns → ''
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = {(r["conv_id"], r["turn_idx"]): (r["context"], r["response"])
           for r in pipeline.conv_pairs(df, context_turns=4).collect()}
    assert got[("c1", 1)] == ("u0", "a1")
    assert got[("c1", 4)] == ("u0\na1\n\nu3", "a4")      # null → ''
    assert got[("c1", 6)] == ("\nu3\na4\nu5", "a6")      # only last 4
    assert got[("c2", 0)] == ("", "solo")
    assert len(got) == 4  # only assistant turns emit pairs


def test_temperature_sample_flattens_toward_sqrt(spark):
    from pdf_extractors_spark.operators import sampling

    # 3200 'en', 800 'de', 200 'fr': sqrt flattening keeps all of the
    # smallest stratum and ~sqrt(n_min/n) of the others
    rows = [(i, "en") for i in range(3200)] + \
           [(10000 + i, "de") for i in range(800)] + \
           [(20000 + i, "fr") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out1 = sampling.temperature_sample(df).groupBy("lang").count().collect()
    out2 = sampling.temperature_sample(df).groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in out1}
    assert counts == {r["lang"]: r["count"] for r in out2}  # deterministic
    assert counts["fr"] == 200                 # smallest stratum: keep all
    # expected keeps: en 3200*sqrt(200/3200)=800, de 800*sqrt(200/800)=400
    assert abs(counts["en"] - 800) < 120       # hash noise ~±3σ
    assert abs(counts["de"] - 400) < 90
    """Budget-aligned sharding guarantee: within a pack, everything
    except the largest/last member fits the budget, so no pack exceeds
    budget + max member; assignment is deterministic."""
    rows = [(i, 1000) for i in range(40)] + [(100, 9999)]  # one over-budget doc
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out1 = sampling.pack_units(df, budget=2500, n_buckets=4).collect()
    out2 = sampling.pack_units(df, budget=2500, n_buckets=4).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # deterministic
    from collections import defaultdict
    sizes = {d: t for d, t in rows}
    packs = defaultdict(list)
    for r in out1:
        packs[(r["bucket"], r["pack_id"])].append(sizes[r["doc_id"]])
    assert len(packs) > 1
    for members in packs.values():
        assert sum(members) <= 2500 + max(members)


def test_compression_ratio_matches_zlib_and_orders(spark):
    import zlib

    rows = [
        (1, "abc " * 200),            # highly repetitive → low ratio
        (2, "The quick brown fox jumps over the lazy dog near the river bank."),
        (3, ""),                      # empty → 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["compress_bp"] for r in text_stats.compression_ratio(df).collect()}

    def bp(t):
        raw = t.encode()
        if not raw:
            return 0
        c = len(zlib.compress(raw, 6))
        return (2 * 10000 * c + len(raw)) // (2 * len(raw))

    assert got == {d: bp(t) for d, t in rows}
    assert got[1] < got[2]


def test_conv_validate_flags_each_defect(spark):
    from pdf_extractors_spark import pipeline

    rows = [
        # c_ok: perfect 3-turn conversation
        ("c_ok", 0, "user", "hi"),
        ("c_ok", 1, "assistant", "hello"),
        ("c_ok", 2, "tool", "result"),
        # c_dup: duplicated turn_idx 0 with a user,user repeat
        ("c_dup", 0, "user", "a"),
        ("c_dup", 0, "user", "a"),
        ("c_dup", 1, "assistant", "b"),
        # c_gap: starts at 1 and skips index 2
        ("c_gap", 1, "user", "a"),
        ("c_gap", 3, "assistant", "b"),
        # c_blank: assistant turn with whitespace-only text
        ("c_blank", 0, "user", "a"),
        ("c_blank", 1, "assistant", "   "),
        # c_tool: tool result first (no preceding assistant call)
        ("c_tool", 0, "tool", "orphan"),
        ("c_tool", 1, "user", "a"),
        # c_solo: single turn (lag frame is empty, sums must not be null)
        ("c_solo", 0, "user", "only"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {r["conv_id"]: r.asDict() for r in pipeline.conv_validate(df).collect()}

    assert got["c_ok"]["conv_ok"] and got["c_solo"]["conv_ok"]
    assert got["c_dup"]["n_dup_idx"] == 1
    assert got["c_dup"]["n_role_repeats"] == 1
    assert got["c_gap"]["n_gap_idx"] == 1 and got["c_gap"]["min_idx"] == 1
    assert got["c_blank"]["n_empty_assistant"] == 1
    assert got["c_tool"]["n_orphan_tool"] == 1
    for c in ("c_dup", "c_gap", "c_blank", "c_tool"):
        assert not got[c]["conv_ok"], c
    # no counter is ever NULL (single-turn lag edge)
    assert all(
        v is not None for r in got.values() for v in r.values()
    )


def test_c4_line_filter_rules(spark):
    from pdf_extractors_spark.operators import text_stats

    good = "This line has plenty of words and punctuation."
    rows = [
        # doc 1: 3 good lines → kept
        (1, "\n".join([good, "Is this not a fine question with words?", 'He said "quoted words are fine enough here."'])),
        # doc 2: only 2 surviving lines → dropped (min_kept_lines)
        (2, "\n".join([good, good, "no terminal punctuation here at all"])),
        # doc 3: line-level drops: short, javascript, no punctuation
        (3, "\n".join([good, "Tiny line.", "Enable javascript to continue browsing today.", good, good])),
        # doc 4: lorem ipsum page drop despite good lines
        (4, "\n".join([good, good, good, "Call Lorem Ipsum dolor sit amet today."])),
        # doc 5: brace page drop
        (5, "\n".join([good, good, good, "function f() { return 1; }"])),
        # doc 6: null text → empty page
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in text_stats.c4_line_filter(df).collect()}

    assert got[1]["c4_keep"] and got[1]["n_kept"] == 3
    assert not got[2]["c4_keep"] and got[2]["n_kept"] == 2
    assert got[3]["n_kept"] == 3 and got[3]["c4_keep"]
    assert got[3]["clean_text"] == "\n".join([good, good, good])
    assert got[4]["has_lorem"] and not got[4]["c4_keep"]
    assert got[5]["has_brace"] and not got[5]["c4_keep"]
    assert got[6]["n_kept"] == 0 and not got[6]["c4_keep"]
    assert got[6]["n_lines"] == 1  # '' page is one empty line


def test_chunk_windows_offsets_and_tail(spark):
    from pdf_extractors_spark.operators import sampling

    t10 = " ".join(f"w{i}" for i in range(10))
    rows = [
        (1, t10),            # n=10, W=8, S=4 → starts 0,4; start 8 contained
        (2, "a b c"),        # n=3 < W → one chunk
        (3, ""),             # empty → no rows
        (4, None),           # null → no rows
        (5, "  x   y  "),    # whitespace-normalized tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sampling.chunk_windows(df, window=8, stride=4)
    got = {(r["doc_id"], r["chunk_idx"]): r.asDict() for r in out.collect()}

    assert set(got) == {(1, 0), (1, 1), (2, 0), (5, 0)}
    assert (got[(1, 0)]["tok_start"], got[(1, 0)]["tok_end"]) == (0, 8)
    assert (got[(1, 1)]["tok_start"], got[(1, 1)]["tok_end"]) == (4, 10)
    assert got[(1, 1)]["chunk_text"] == " ".join(f"w{i}" for i in range(4, 10))
    assert got[(2, 0)]["chunk_text"] == "a b c" and got[(2, 0)]["tok_end"] == 3
    assert got[(5, 0)]["chunk_text"] == "x y"
    # every chunk's token span re-slices the source exactly
    toks = t10.split()
    for (d, _), r in got.items():
        if d == 1:
            assert r["chunk_text"] == " ".join(toks[r["tok_start"]:r["tok_end"]])


def test_tfidf_terms_quantized_idf_ranking(spark):
    from pdf_extractors_spark.operators import text_stats

    # 4 docs; 'common' in all (qidf=floor(log2(4/4))=0), 'pair' in two
    # (floor(log2(2))=1), 'solo*' unique (floor(log2(4))=2)
    rows = [
        (1, "common pair solo1 solo1 solo1"),
        (2, "common pair"),
        (3, "common solo3"),
        (4, "common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_stats.tfidf_terms(df, k=2).collect()
    got = {(r["doc_id"], r["rank"]): r.asDict() for r in out}

    top1 = got[(1, 1)]
    assert top1["term"] == "solo1" and top1["tf"] == 3
    assert top1["qidf"] == 2 and top1["score"] == 6
    assert got[(1, 2)]["term"] == "pair" and got[(1, 2)]["score"] == 1
    assert got[(3, 1)]["term"] == "solo3" and got[(3, 1)]["score"] == 2
    # doc 4: only 'common', score 0, still emitted with rank 1
    assert got[(4, 1)]["term"] == "common" and got[(4, 1)]["score"] == 0
    # ties (score 0) break alphabetically: doc 2 rank order pair>common?
    # 'pair' qidf=1 score=1 beats 'common' score 0
    assert got[(2, 1)]["term"] == "pair" and got[(2, 2)]["term"] == "common"


def test_duplicate_spans_islands(spark):
    from pdf_extractors_spark.operators import dedup

    shared = "one two three four five six seven"  # 7 tokens → 3 grams at n=5
    rows = [
        (1, f"{shared} unique tail alpha beta gamma delta"),
        (2, f"prefix words here also {shared}"),
        # doc 3: within-doc repetition only (gram repeated twice)
        (3, "r1 r2 r3 r4 r5 filler filler2 filler3 r1 r2 r3 r4 r5"),
        (4, "totally distinct text with no repeats whatsoever at all"),
        (5, "short"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.duplicate_spans(df, n=5).collect()
    spans = {}
    for r in out:
        spans.setdefault(r["doc_id"], []).append(
            (r["span_idx"], r["tok_start"], r["tok_end"], r["n_tokens"])
        )

    # docs 1/2 share the 7-token run: grams at 3 consecutive positions
    # merge into ONE island of exactly the shared region
    assert spans[1] == [(1, 0, 7, 7)]
    assert spans[2] == [(1, 4, 11, 7)]
    # doc 3: both occurrences of the repeated 5-gram are spans
    assert spans[3] == [(1, 0, 5, 5), (2, 8, 13, 5)]
    assert 4 not in spans and 5 not in spans and 6 not in spans


def test_cut_spans_applies_and_preserves(spark):
    from pdf_extractors_spark.operators import dedup

    shared = "one two three four five six seven"
    rows = [
        (1, f"{shared} unique tail alpha beta gamma delta"),
        (2, f"prefix words here also {shared}"),
        (3, "no duplicates in this document at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = dedup.duplicate_spans(df, n=5)
    got = {r["doc_id"]: r.asDict() for r in dedup.cut_spans(df, spans).collect()}

    assert got[1]["clean_text"] == "unique tail alpha beta gamma delta"
    assert got[1]["n_tokens_cut"] == 7 and got[1]["n_spans"] == 1
    assert got[2]["clean_text"] == "prefix words here also"
    assert got[3]["clean_text"] == "no duplicates in this document at all"
    assert got[3]["n_tokens_cut"] == 0 and got[3]["n_spans"] == 0
    assert got[4]["clean_text"] is None and got[4]["n_tokens_cut"] == 0


def test_canonical_url_rules(spark):
    from pdf_extractors_spark.operators import urls

    cases = [
        (1, "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
            "https://example.com/a/b?a=1&b=2"),
        (2, "http://Example.com:80/", "http://example.com"),
        (3, "http://example.com:8080/x", "http://example.com:8080/x"),
        (4, "https://example.com/path?fbclid=123&gclid=9&z=1",
            "https://example.com/path?z=1"),
        (5, "  not a url  ", "not a url"),
        (6, "https://example.com", "https://example.com"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "doc_id long, url string"
    )
    got = {
        r["doc_id"]: r["canonical_url"]
        for r in df.select("doc_id", urls.canonical_url("url").alias("canonical_url")).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_url_dedup_keeper_is_min_id(spark):
    from pdf_extractors_spark.operators import urls

    df = spark.createDataFrame(
        [
            (5, "https://example.com/a"),
            (2, "HTTPS://WWW.example.com:443/a/"),
            (9, "https://example.com/b"),
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r.asDict() for r in urls.url_dedup(df).collect()}
    assert got[2]["is_keeper"] and not got[5]["is_keeper"]
    assert got[2]["canonical_url"] == got[5]["canonical_url"]
    assert got[9]["is_keeper"]


def test_quality_tiers_deterministic_ntile(spark):
    from pdf_extractors_spark.operators import sampling

    # 8 'en' docs scores 80..10, 2 'fr' docs
    rows = [(i, "en", (8 - i) * 10) for i in range(8)] + [
        (100, "fr", 50), (101, "fr", 50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, quality_bp long")
    got = {r["doc_id"]: r["tier"] for r in sampling.quality_tiers(df).collect()}
    # en: 2 docs per tier, best scores first
    assert [got[i] for i in range(8)] == [1, 1, 2, 2, 3, 3, 4, 4]
    # fr ties break by doc_id: 100 → tier 1, 101 → tier 2 (ntile spreads)
    assert got[100] == 1 and got[101] == 2


def test_blocklist_filter_threshold(spark):
    from pdf_extractors_spark.operators import text_stats

    clean100 = " ".join(f"w{i}" for i in range(99))
    rows = [
        (1, clean100 + " casino"),       # 1/100 tokens = 100bp → keep (<=)
        (2, "casino " + " ".join(f"w{i}" for i in range(49))),  # 1/50 = 200bp → drop
        (3, "perfectly clean text here"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in text_stats.blocklist_filter(df).collect()}
    assert got[1]["blocked_hits"] == 1 and got[1]["blocked_bp"] == 100
    assert got[1]["blocklist_keep"]
    assert got[2]["blocked_bp"] == 200 and not got[2]["blocklist_keep"]
    assert got[3]["blocked_hits"] == 0 and got[3]["blocklist_keep"]
    assert got[4]["blocked_bp"] == 0 and got[4]["blocklist_keep"]
    assert got[5]["blocklist_keep"]


def test_semdedup_drops_higher_id_near_dups(spark):
    """Flipped copies (cos ≈ 0.98 to their source) co-cluster with the
    originals and are dropped (higher id); unrelated vectors survive.
    Verdict table covers every input row once and is repartition-
    invariant."""
    from pdf_extractors_spark.operators import similarity

    import numpy as np

    rng = np.random.RandomState(7)
    # 64-dim like the embeddings table: flipping the last component
    # gives cos ≈ 1 - 2/64 ≈ 0.97 to the source — above the 0.9
    # threshold (at 16 dims the expected cos is ~0.875 and the test
    # would flake on the planted pairs themselves)
    base = [
        (i, [float(x) for x in rng.standard_normal(64)]) for i in range(12)
    ]
    df = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    planted = similarity.with_flipped_copies(df, id_offset=100)
    cents = similarity.take_centroids(planted, n=4)
    out = similarity.semdedup(planted, cents, threshold=0.9).collect()
    verdicts = {r["vec_id"]: r["keep"] for r in out}
    assert len(verdicts) == 24  # every planted row exactly once
    # independent numpy replica of the exact algorithm (assign by
    # round-6 cosine with centroid-id tiebreak, drop on round-4
    # within-cell cosine >= threshold against a lower id)
    # truncate to float32 first: the Spark column is array<float>, and
    # the engine casts those float32 values to double inside cosine
    vecs = {
        i: np.array(v, dtype=np.float32).astype(np.float64) for i, v in base
    }
    for i, v in base:
        f = vecs[i].copy()
        f[-1] = -f[-1]
        vecs[100 + i] = f

    def cos(a, b):
        return float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b)))

    cent_ids = sorted(vecs)[:4]
    assign = {
        vid: max(cent_ids, key=lambda c: (round(cos(v, vecs[c]), 6), -c))
        for vid, v in vecs.items()
    }
    expect = {
        vid: not any(
            assign[o] == assign[vid] and o < vid
            and round(cos(vecs[o], vecs[vid]), 4) >= 0.9
            for o in vecs
        )
        for vid in vecs
    }
    assert verdicts == expect
    # the planting produced real work in both directions
    assert sum(not k for k in expect.values()) >= 8
    assert all(expect[i] for i in range(12))  # originals always kept
    rep = {
        r["vec_id"]: r["keep"]
        for r in similarity.semdedup(
            planted.repartition(5), cents, threshold=0.9
        ).collect()
    }
    assert rep == verdicts


def test_conv_repair_drops_merges_and_reindexes(spark):
    """A dirty conversation: blank assistant turn dropped, tool result
    after the (dropped) assistant becomes an orphan and is dropped,
    consecutive same-role user turns merge in order, indices renumber
    from 0. A clean conversation passes through untouched."""
    from pdf_extractors_spark import pipeline

    rows = [
        # dirty conversation
        ("c1", 0, "user", "hello"),
        ("c1", 0, "user", "hello"),                   # exact dup -> collapsed
        ("c1", 1, "user", "are you there?"),          # merges with turn 0
        ("c1", 2, "assistant", "   "),                # blank -> dropped
        ("c1", 3, "tool", "result A"),                # orphaned -> dropped
        ("c1", 4, "assistant", "hi"),
        ("c1", 5, "tool", "result B"),                # valid: follows assistant
        ("c1", 6, "tool", "result C"),                # valid: chained tool
        # clean conversation
        ("c2", 0, "user", "q"),
        ("c2", 1, "assistant", "a"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["n_merged"])
        for r in pipeline.conv_repair(df).collect()
    }
    # the exact duplicate collapses (counted in n_merged, text once)
    assert got[("c1", 0)] == ("user", "hello\nare you there?", 3)
    assert got[("c1", 1)] == ("assistant", "hi", 1)
    assert got[("c1", 2)] == ("tool", "result B\nresult C", 2)
    assert ("c1", 3) not in got
    assert got[("c2", 0)] == ("user", "q", 1)
    assert got[("c2", 1)] == ("assistant", "a", 1)
    # repartition invariance
    rep = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["n_merged"])
        for r in pipeline.conv_repair(df.repartition(4)).collect()
    }
    assert rep == got


def test_neardup_against_flags_cross_corpus_pairs(spark):
    """A reference doc that near-duplicates a corpus doc is flagged with
    the exact Jaccard; unrelated reference docs produce nothing; the
    corpus is never self-joined (internal corpus duplicates yield no
    pairs)."""
    from pdf_extractors_spark.operators import dedup

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different text about spark window functions here"),
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog tonight"),
            (101, "nothing remotely similar lives in this reference document"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["ref_id"]): (r["common"], r["jaccard"])
        for r in dedup.neardup_against(corpus, ref, threshold=0.5).collect()
    }
    # both exact copies match ref 100 at jaccard 1.0; doc 3 and ref 101
    # match nothing; (1,2) is NOT emitted (no corpus self-join)
    assert got == {(1, 100): (8, 1.0), (2, 100): (8, 1.0)}


def test_ngram_counts_exact_and_min_count(spark):
    """Bigram totals count occurrences (not set membership), doc_freq
    counts documents, and min_count prunes the tail."""
    from pdf_extractors_spark.operators import text_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b"),       # 'a b' x2, 'b a' x1
            (2, "a b c"),         # 'a b' x1, 'b c' x1
            (3, "zz"),            # < n tokens -> no grams
        ],
        "doc_id long, text string",
    )
    got = {
        r["ngram"]: (r["total_count"], r["doc_freq"])
        for r in text_stats.ngram_counts(df, n=2, min_count=2).collect()
    }
    assert got == {"a b": (3, 2)}
    all_grams = {
        r["ngram"]: (r["total_count"], r["doc_freq"])
        for r in text_stats.ngram_counts(df, n=2, min_count=1).collect()
    }
    assert all_grams == {"a b": (3, 2), "b a": (1, 1), "b c": (1, 1)}


def test_perplexity_buckets_terciles_per_language(spark):
    """Terciles split each language 1/3-1/3-1/3 by ascending surprisal;
    the most predictable third is 'head'; assignment is deterministic
    under repartitioning."""
    from pdf_extractors_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, "en" if i < 9 else "fr") for i in range(12)],
        "doc_id long, lang string",
    )
    scores = spark.createDataFrame(
        [(i, (i * 37) % 100) for i in range(12)],
        "doc_id long, mean_bits_bp long",
    )
    out = sampling.perplexity_buckets(docs, scores).collect()
    by_lang_bucket = {}
    for r in out:
        by_lang_bucket.setdefault((r["lang"], r["bucket"]), []).append(
            (r["mean_bits_bp"], r["doc_id"])
        )
    assert {len(v) for k, v in by_lang_bucket.items() if k[0] == "en"} == {3}
    # every head score <= every middle score <= every tail score (en)
    h = max(by_lang_bucket[("en", "head")])
    m_lo, m_hi = min(by_lang_bucket[("en", "middle")]), max(by_lang_bucket[("en", "middle")])
    t = min(by_lang_bucket[("en", "tail")])
    assert h <= m_lo and m_hi <= t
    rep = sorted(
        (r["doc_id"], r["bucket"])
        for r in sampling.perplexity_buckets(
            docs.repartition(5), scores.repartition(3)
        ).collect()
    )
    assert rep == sorted((r["doc_id"], r["bucket"]) for r in out)


def test_conv_repair_matches_python_reference_on_random_dirty_convs(spark):
    """Randomized (seeded) dirty conversations — duplicate indices,
    same-idx different-role/text collisions, blank/null texts, orphan
    and chained tool turns — repaired identically by Spark and an
    independent pure-Python reference of the five-step contract."""
    import random

    from pdf_extractors_spark import pipeline

    rng = random.Random(42)
    roles = ["user", "assistant", "tool", "system"]
    texts = ["a", "b", "cc", "", "  ", None, "x y", "z"]
    rows = []
    for c in range(40):
        for _ in range(rng.randint(1, 25)):
            rows.append(
                (
                    f"c{c}",
                    rng.randint(0, 8),
                    rng.choice(roles),
                    rng.choice(texts),
                )
            )

    def reference(conv_rows):
        alive = {}
        for _, idx, role, text in conv_rows:
            if text is None or text.strip(" ") == "":
                continue
            alive[(idx, role, text)] = alive.get((idx, role, text), 0) + 1
        ordered = sorted(alive.items())
        kept, prev_nt = [], None
        for (idx, role, text), m in ordered:
            if role == "tool" and prev_nt != "assistant":
                continue
            kept.append((idx, role, text, m))
            if role != "tool":
                prev_nt = role
        out, island = [], -1
        for i, (idx, role, text, m) in enumerate(kept):
            if i == 0 or role != kept[i - 1][1]:
                island += 1
                out.append([role, [text], m])
            else:
                out[island][1].append(text)
                out[island][2] += m
        return [
            (t, role, "\n".join(parts), m)
            for t, (role, parts, m) in enumerate(out)
        ]

    # CAUTION on the reference: prev_nt must be the last non-tool among
    # SURVIVING rows — kept order equals ordered order, and non-tool
    # rows always survive, so tracking it inside the single pass is
    # exact.
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {}
    for r in pipeline.conv_repair(df).collect():
        got.setdefault(r["conv_id"], []).append(
            (r["turn_idx"], r["role"], r["text"], r["n_merged"])
        )
    by_conv = {}
    for row in rows:
        by_conv.setdefault(row[0], []).append(row)
    for c, conv_rows in by_conv.items():
        expect = reference(conv_rows)
        assert sorted(got.get(c, [])) == expect, c
