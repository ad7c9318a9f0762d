"""merge_upsert (Iceberg-MERGE semantics), parity_report (per-turn
equality audit), and random_projection (seeded ±1 integer matmul)."""

from __future__ import annotations

from pdf_extractors_spark.operators import joins, similarity


# ------------------------------------------------------------ merge_upsert


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def test_merge_upsert_actions_and_values(spark):
    base = _docs(spark, [(1, "a", "en"), (2, "b", "fr"), (3, "c", "en")])
    updates = _docs(spark, [(2, "B2", "de"), (9, "new", "es")])
    out = {
        r["doc_id"]: r.asDict()
        for r in joins.merge_upsert(base, updates, "doc_id", ["text"]).collect()
    }
    assert set(out) == {1, 2, 3, 9}
    assert out[1]["action"] == "keep" and out[1]["text"] == "a"
    # matched: update_cols take the update, other cols keep the base
    assert out[2]["action"] == "update"
    assert out[2]["text"] == "B2" and out[2]["lang"] == "fr"
    assert out[3]["action"] == "keep"
    # unmatched update: inserted whole
    assert out[9]["action"] == "insert"
    assert out[9]["text"] == "new" and out[9]["lang"] == "es"


def test_merge_upsert_null_update_value_falls_back_to_base(spark):
    base = _docs(spark, [(1, "a", "en")])
    updates = _docs(spark, [(1, None, "en")])
    row = joins.merge_upsert(base, updates, "doc_id", ["text"]).collect()[0]
    # a null in the update column is "no new value", not an erase
    assert row["action"] == "update" and row["text"] == "a"


def test_merge_upsert_idempotent_on_empty_updates(spark):
    base = _docs(spark, [(1, "a", "en"), (2, "b", "fr")])
    updates = _docs(spark, []).limit(0)
    out = joins.merge_upsert(base, updates, "doc_id", ["text"]).collect()
    assert sorted((r["doc_id"], r["text"], r["action"]) for r in out) == [
        (1, "a", "keep"),
        (2, "b", "keep"),
    ]


# ---------------------------------------------------------- parity_report


def test_parity_report_all_four_verdicts(spark):
    a = spark.createDataFrame(
        [(1, 0, "x"), (1, 1, "y"), (2, 0, "z")],
        "conv_id long, turn_idx long, text string",
    )
    b = spark.createDataFrame(
        [(1, 0, "x"), (1, 1, "Y!"), (3, 0, "w")],
        "conv_id long, turn_idx long, text string",
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r["verdict"]
        for r in joins.parity_report(
            a, b, ["conv_id", "turn_idx"], "text"
        ).collect()
    }
    assert got == {
        (1, 0): "equal",
        (1, 1): "mismatch",
        (2, 0): "only_a",
        (3, 0): "only_b",
    }


def test_parity_report_null_values_compare_equal(spark):
    a = spark.createDataFrame([(1, None), (2, "v")], "k long, text string")
    b = spark.createDataFrame([(1, None), (2, None)], "k long, text string")
    got = {
        r["k"]: r["verdict"]
        for r in joins.parity_report(a, b, ["k"], "text").collect()
    }
    assert got == {1: "equal", 2: "mismatch"}


# ------------------------------------------------------ random_projection


def _sign(i: int, j: int, seed: int = 7919) -> int:
    return 1 if ((i * 1299721 + j * 104729 + seed) % 7919) % 2 == 0 else -1


def test_random_projection_matches_integer_recompute(spark):
    import math

    vecs = [
        (0, [0.5, -0.25, 0.125]),
        (1, [1.0, 2.0, -3.0]),
        (2, [0.0015, -0.0015, 0.9999]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: [r[f"proj_{j}"] for j in range(4)]
        for r in similarity.random_projection(df, k=4).collect()
    }
    for vid, emb in vecs:
        # recompute with the float32 widening Spark applies (cast to
        # double is exact for float32 values)
        import struct

        q = [
            math.floor(struct.unpack("f", struct.pack("f", x))[0] * 1000)
            for x in emb
        ]
        expected = [
            sum(qi * _sign(i, j) for i, qi in enumerate(q)) for j in range(4)
        ]
        assert out[vid] == expected


def test_random_projection_partitioning_invariant(spark):
    rows = [(i, [((i * 31 + d) % 17) / 7.0 for d in range(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, similarity.random_projection(df, k=3).collect()))
    b = sorted(
        map(tuple, similarity.random_projection(df.repartition(7), k=3).collect())
    )
    assert a == b


def test_merge_upsert_idempotent_reapply(spark):
    """Applying the same update batch twice equals applying it once
    (MERGE idempotence) — the property a checkpoint-resumed snapshot
    commit relies on."""
    base = _docs(spark, [(1, "a", "en"), (2, "b", "fr")])
    updates = _docs(spark, [(2, "B2", "fr"), (9, "new", "es")])
    once = joins.merge_upsert(base, updates, "doc_id", ["text"])
    twice = joins.merge_upsert(
        once.drop("action"), updates, "doc_id", ["text"]
    )
    a = sorted(
        (r["doc_id"], r["text"], r["lang"]) for r in once.collect()
    )
    b = sorted(
        (r["doc_id"], r["text"], r["lang"]) for r in twice.collect()
    )
    assert a == b


def test_parity_report_identical_runs_all_equal(spark):
    a = spark.createDataFrame(
        [(i, f"t{i}") for i in range(20)], "k long, text string"
    )
    out = joins.parity_report(a, a, ["k"], "text").collect()
    assert len(out) == 20 and all(r["verdict"] == "equal" for r in out)
