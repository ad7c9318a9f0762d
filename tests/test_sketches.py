"""KMV distinct-count sketch: exact path, estimator accuracy,
partition-invariance of the candidate merge, null handling, DuckDB
bit-parity, and the bounded-shuffle plan shape."""

from __future__ import annotations

import duckdb
import pandas as pd

from pyspark.sql import functions as F

from pdf_extractors_spark.operators.sketches import (
    kmv_distinct,
    kmv_distinct_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "g string, v string")


def test_kmv_exact_below_k(spark):
    # 3 distinct values in group a (with repeats), 1 in b — both < k,
    # so the sketch IS the exact count
    rows = [("a", "x"), ("a", "y"), ("a", "y"), ("a", "z"), ("b", "q")]
    out = {
        r["g"]: r["est_distinct"]
        for r in kmv_distinct(_docs(spark, rows), "v", ["g"], k=16).collect()
    }
    assert out == {"a": 3, "b": 1}


def test_kmv_nulls_ignored(spark):
    rows = [("a", "x"), ("a", None), ("b", None)]
    out = {
        r["g"]: r["est_distinct"]
        for r in kmv_distinct(_docs(spark, rows), "v", ["g"], k=8).collect()
    }
    # null values never count; the all-null group emits no row
    # (COUNT(DISTINCT ...) semantics)
    assert out == {"a": 1}


def test_kmv_estimator_accuracy(spark):
    # 2000 distinct values, k=64: KMV standard error is ~1/sqrt(k-2)
    # ≈ 12.7%; the fixed md5 hash makes the estimate deterministic, so
    # a 3-sigma bound is a stable assertion, not a flaky one
    rows = [("a", f"tok{i}") for i in range(2000)]
    (est,) = kmv_distinct(_docs(spark, rows), "v", ["g"], k=64).collect()
    assert abs(est["est_distinct"] - 2000) / 2000 < 0.38, est


def test_kmv_partition_invariant(spark):
    # the candidate merge (union of per-partition k-minima → global
    # k smallest) must give the identical estimate at any parallelism
    rows = [("a", f"tok{i % 300}") for i in range(3000)] + [
        ("b", f"w{i}") for i in range(40)
    ]
    df = _docs(spark, rows)
    one = sorted(
        kmv_distinct(df.coalesce(1), "v", ["g"], k=64).collect()
    )
    many = sorted(
        kmv_distinct(df.repartition(16), "v", ["g"], k=64).collect()
    )
    assert one == many
    by_g = {r["g"]: r["est_distinct"] for r in one}
    assert by_g["b"] == 40  # exact path
    assert abs(by_g["a"] - 300) / 300 < 0.38  # estimator path


def test_kmv_duckdb_bit_parity(spark, tmp_path):
    # the estimator is defined in portable bigint arithmetic: DuckDB
    # must reproduce every estimate EXACTLY, not within error bounds
    rows = [("a", f"tok{i}") for i in range(500)] + [
        ("b", f"b{i}" if i % 3 else None) for i in range(90)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    path = str(tmp_path / "t.parquet")
    pdf.to_parquet(path)
    spark_out = {
        r["g"]: r["est_distinct"]
        for r in kmv_distinct(
            spark.read.parquet(path).repartition(8), "v", ["g"], k=32
        ).collect()
    }
    sql = kmv_distinct_sql(f"'{path}'", "v", ["g"], k=32)
    duck_out = dict(duckdb.sql(sql).fetchall())
    assert spark_out == duck_out


def test_kmv_plan_single_exchange(spark, tmp_path):
    # the scale contract: a zero-exchange bounded-state map side
    # (mapInPandas on the scan) and ONE exchange carrying only the
    # per-(group, partition) k-minima
    pd.DataFrame(
        [("a", f"t{i}") for i in range(100)], columns=["g", "v"]
    ).to_parquet(str(tmp_path / "t.parquet"))
    df = kmv_distinct(
        spark.read.parquet(str(tmp_path / "t.parquet")), "v", ["g"], k=16
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # count tree nodes, not the per-node detail sections that repeat
    # each operator name below the tree
    assert plan.count("- Exchange") == 1, plan
    # the map side runs BEFORE the exchange: MapInPandas must appear
    # after (deeper than) Exchange in the formatted tree listing
    assert "MapInPandas" in plan, plan
    assert plan.index("Exchange") < plan.index("MapInPandas"), plan


# ----------------------------------------------------------- kmv_overlap


def _vals(spark, names):
    from pdf_extractors_spark.operators.sketches import kmv_overlap  # noqa

    return spark.createDataFrame([(n,) for n in names], "v string")


def test_kmv_overlap_exact_path(spark):
    from pdf_extractors_spark.operators.sketches import kmv_overlap

    # 30 + 30 values sharing exactly 10: below k everything is exact —
    # union 50, intersection 10, jaccard 10/50 = 200000 ppm
    a = _vals(spark, [f"a{i}" for i in range(20)] + [f"s{i}" for i in range(10)])
    b = _vals(spark, [f"b{i}" for i in range(20)] + [f"s{i}" for i in range(10)])
    (r,) = kmv_overlap(a, b, "v", k=256).collect()
    assert (
        r["est_distinct_a"],
        r["est_distinct_b"],
        r["est_union"],
        r["est_intersection"],
        r["jaccard_ppm"],
    ) == (30, 30, 50, 10, 200000)


def test_kmv_overlap_disjoint_and_empty(spark):
    from pdf_extractors_spark.operators.sketches import kmv_overlap

    a = _vals(spark, [f"a{i}" for i in range(15)])
    b = _vals(spark, [f"b{i}" for i in range(5)])
    (r,) = kmv_overlap(a, b, "v", k=64).collect()
    assert r["est_intersection"] == 0 and r["jaccard_ppm"] == 0
    assert r["est_union"] == 20
    empty = _vals(spark, []).filter("v is not null")
    (r2,) = kmv_overlap(a, empty, "v", k=64).collect()
    assert r2["est_distinct_b"] == 0 and r2["est_union"] == 15


def test_kmv_overlap_estimator_accuracy(spark):
    from pdf_extractors_spark.operators.sketches import kmv_overlap

    # 2000 ∪ 2000 with 1000 shared (true union 3000, jaccard 1/3);
    # deterministic hash → stable assertion at ~3 sigma
    a = _vals(spark, [f"x{i}" for i in range(2000)])
    b = _vals(spark, [f"x{i}" for i in range(1000, 3000)])
    (r,) = kmv_overlap(a.repartition(8), b.repartition(4), "v", k=64).collect()
    assert abs(r["est_union"] - 3000) / 3000 < 0.38, r
    assert abs(r["est_intersection"] - 1000) / 1000 < 0.55, r


def test_kmv_overlap_duckdb_bit_parity(spark, tmp_path):
    import duckdb as _dd

    from pdf_extractors_spark.operators.sketches import (
        kmv_overlap,
        kmv_overlap_sql,
    )

    pa_ = str(tmp_path / "a.parquet")
    pb_ = str(tmp_path / "b.parquet")
    pd.DataFrame({"v": [f"x{i}" for i in range(400)]}).to_parquet(pa_)
    pd.DataFrame({"v": [f"x{i}" for i in range(300, 600)]}).to_parquet(pb_)
    spark_row = kmv_overlap(
        spark.read.parquet(pa_).repartition(8),
        spark.read.parquet(pb_),
        "v",
        k=32,
    ).collect()[0]
    duck_row = _dd.sql(kmv_overlap_sql(f"'{pa_}'", f"'{pb_}'", "v", k=32)).fetchone()
    assert tuple(spark_row) == duck_row


# ---------------------------------------------------------------- CMS

from pdf_extractors_spark.operators.sketches import (  # noqa: E402
    cms_heavy_hitters,
    cms_heavy_hitters_sql,
)


def _corpus(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], "text string")


def test_cms_exact_counts_and_overestimate(spark):
    # 'hot' appears 12x, 'warm' 5x, everything else < 3
    texts = ["hot warm cold"] * 5 + ["hot mild"] * 7 + ["breeze"]
    out = {
        r["token"]: (r["cnt"], r["cms_est"])
        for r in cms_heavy_hitters(
            _corpus(spark, texts), "text", min_count=5, depth=4, width=64
        ).collect()
    }
    assert set(out) == {"hot", "warm", "cold", "mild"}
    assert out["hot"][0] == 12 and out["warm"][0] == 5
    assert out["cold"][0] == 5 and out["mild"][0] == 7
    # CMS never underestimates
    assert all(est >= cnt for cnt, est in out.values())


def test_cms_partition_invariant(spark):
    texts = [f"alpha beta w{i % 37}" for i in range(400)]
    df = _corpus(spark, texts)
    one = sorted(
        map(
            tuple,
            cms_heavy_hitters(
                df.coalesce(1), "text", min_count=100, depth=4, width=128
            ).collect(),
        )
    )
    many = sorted(
        map(
            tuple,
            cms_heavy_hitters(
                df.repartition(13), "text", min_count=100, depth=4, width=128
            ).collect(),
        )
    )
    assert one == many and len(one) == 2  # alpha, beta


def test_cms_null_and_case(spark):
    texts = ["HOT hot HoT", None, "  hot  "]
    out = cms_heavy_hitters(
        _corpus(spark, texts), "text", min_count=4, depth=2, width=32
    ).collect()
    assert len(out) == 1 and out[0]["token"] == "hot" and out[0]["cnt"] == 4


def test_cms_duckdb_bit_parity(spark):
    texts = [f"x{i % 7} common filler{i % 151}" for i in range(900)]
    df = _corpus(spark, texts)
    got = sorted(
        map(
            tuple,
            cms_heavy_hitters(
                df, "text", min_count=100, depth=3, width=256
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame({"text": texts}))
    sql = cms_heavy_hitters_sql("docs", "text", min_count=100, depth=3, width=256)
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


# ----------------------------------------------------------- hyperloglog


def _hll_mod():
    from pdf_extractors_spark.operators import sketches

    return sketches


def test_hll_small_range_linear_counting(spark):
    # 40 distinct << 5m/2: the linear-counting branch fires and is
    # near-exact at this occupancy (40 of 256 registers)
    sk = _hll_mod()
    rows = [("a", f"tok{i}") for i in range(40) for _ in (0, 1)]
    (est,) = sk.hll_distinct(_docs(spark, rows), "v", ["g"], p=8).collect()
    assert est["v_zero"] > 0
    assert abs(est["est_distinct"] - 40) / 40 < 0.15, est


def test_hll_estimator_accuracy(spark):
    # 5000 distinct at p=8: standard error 1.04/sqrt(256) ≈ 6.5%; the
    # fixed md5 hash makes the estimate deterministic so a 3-sigma
    # bound is stable
    sk = _hll_mod()
    rows = [("a", f"tok{i}") for i in range(5000)]
    (est,) = sk.hll_distinct(_docs(spark, rows), "v", ["g"], p=8).collect()
    assert abs(est["est_distinct"] - 5000) / 5000 < 0.2, est


def test_hll_nulls_ignored(spark):
    sk = _hll_mod()
    rows = [("a", "x"), ("a", None), ("b", None)]
    out = {
        r["g"]: r["est_distinct"]
        for r in sk.hll_distinct(_docs(spark, rows), "v", ["g"], p=8).collect()
    }
    assert out == {"a": 1}


def test_hll_partition_invariant(spark):
    # register max is order- and partitioning-independent
    sk = _hll_mod()
    rows = [("a", f"tok{i % 700}") for i in range(3000)] + [
        ("b", f"w{i}") for i in range(30)
    ]
    df = _docs(spark, rows)
    one = sorted(sk.hll_distinct(df.coalesce(1), "v", ["g"], p=8).collect())
    many = sorted(
        sk.hll_distinct(df.repartition(16), "v", ["g"], p=8).collect()
    )
    assert one == many


def test_hll_merge_is_exact_union(spark):
    # THE mergeability contract: max-merging two corpora's register
    # tables gives exactly the union's sketch — equality, not tolerance
    sk = _hll_mod()
    df_a = _docs(spark, [("g", f"a{i}") for i in range(300)])
    df_b = _docs(
        spark, [("g", f"a{i}") for i in range(100, 400)]  # overlaps a
    )
    direct = sorted(
        sk.hll_distinct(df_a.unionByName(df_b), "v", ["g"], p=8).collect()
    )
    merged_regs = (
        sk.hll_registers(df_a, "v", ["g"], p=8)
        .unionByName(sk.hll_registers(df_b, "v", ["g"], p=8))
        .groupBy("g", "register")
        .agg(F.max("m_rank").alias("m_rank"))
    )
    merged = sorted(sk.hll_estimate(merged_regs, ["g"], p=8).collect())
    assert direct == merged


def test_hll_duckdb_bit_parity(spark, tmp_path):
    sk = _hll_mod()
    rows = [("a", f"tok{i}") for i in range(2000)] + [
        ("b", f"b{i}" if i % 3 else None) for i in range(90)
    ]
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    path = str(tmp_path / "h.parquet")
    pdf.to_parquet(path)
    spark_out = {
        (r["g"]): (r["v_zero"], r["est_distinct"])
        for r in sk.hll_distinct(
            spark.read.parquet(path).repartition(8), "v", ["g"], p=8
        ).collect()
    }
    duck_out = {
        g: (v, e)
        for g, v, e in duckdb.sql(
            sk.hll_distinct_sql(f"'{path}'", "v", ["g"], p=8)
        ).fetchall()
    }
    assert spark_out == duck_out


def test_hll_plan_two_bounded_exchanges_no_python(spark, tmp_path):
    # pure column math (vs KMV's Arrow map side): two map-side-combined
    # groupBys — (group, register) then (group) — and nothing else
    sk = _hll_mod()
    pd.DataFrame(
        [("a", f"t{i}") for i in range(100)], columns=["g", "v"]
    ).to_parquet(str(tmp_path / "h.parquet"))
    df = sk.hll_distinct(
        spark.read.parquet(str(tmp_path / "h.parquet")), "v", ["g"], p=8
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("- Exchange") == 2, plan
    assert "partial_max" in plan, plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, plan


def test_hll_p_bounds():
    import pytest as _pytest

    sk = _hll_mod()
    with _pytest.raises(ValueError):
        sk.hll_constants(3)
    with _pytest.raises(ValueError):
        sk.hll_constants(10)
