"""ts_audit (pipeline.py): timestamp-integrity counters on hand-built
conversations — inversions, null stamps, duplicated instants, span,
the <2-non-null span null, and the single-exchange plan budget."""

from datetime import datetime

from pdf_extractors_spark import pipeline, plans

_SCHEMA = "conv_id string, turn_idx int, ts timestamp"


def _ts(s):
    return datetime.fromisoformat(s)


def _t(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _by_conv(df):
    return {
        r["conv_id"]: (
            r["n_turns"],
            r["n_ts_null"],
            r["n_inversions"],
            r["n_dup_ts"],
            r["span_seconds"],
            r["ts_ok"],
        )
        for r in df.collect()
    }


def test_counters_and_ok_flag(spark):
    rows = [
        # A: clean, strictly increasing
        ("A", 0, _ts("2026-01-01T10:00:00")),
        ("A", 1, _ts("2026-01-01T10:00:30")),
        ("A", 2, _ts("2026-01-01T10:02:00")),
        # B: one inversion (turn 1 earlier than turn 0), span from
        # min to max regardless of order
        ("B", 0, _ts("2026-01-01T12:00:00")),
        ("B", 1, _ts("2026-01-01T11:00:00")),
        ("B", 2, _ts("2026-01-01T12:00:10")),
        # C: null stamp between two valid ones — adjacent pair with a
        # null is NOT an inversion; nulls counted separately
        ("C", 0, _ts("2026-01-01T09:00:00")),
        ("C", 1, None),
        ("C", 2, _ts("2026-01-01T09:01:00")),
        # D: batch-stamped (all three identical)
        ("D", 0, _ts("2026-01-01T08:00:00")),
        ("D", 1, _ts("2026-01-01T08:00:00")),
        ("D", 2, _ts("2026-01-01T08:00:00")),
    ]
    got = _by_conv(pipeline.ts_audit(_t(spark, rows)))
    assert got["A"] == (3, 0, 0, 0, 120, True)
    assert got["B"] == (3, 0, 1, 0, 3610, False)
    assert got["C"] == (3, 1, 0, 0, 60, False)
    assert got["D"] == (3, 0, 0, 2, 0, True)


def test_span_sentinel_below_two_stamps(spark):
    rows = [
        ("E", 0, None),
        ("E", 1, _ts("2026-01-01T10:00:00")),
        ("F", 0, None),
    ]
    got = _by_conv(pipeline.ts_audit(_t(spark, rows)))
    # -1 sentinel, not null: keeps the column non-nullable int64
    assert got["E"] == (2, 1, 0, 0, -1, False)
    assert got["F"] == (1, 1, 0, 0, -1, False)


def test_ts_audit_plan_budget(spark):
    df = pipeline.ts_audit(
        _t(spark, [("A", 0, _ts("2026-01-01T00:00:00"))])
    )
    a = plans.assert_plan(
        df,
        no_single_partition=True,
        no_python=True,
        shuffle_keys={"conv_id"},
    )
    # the lag window and the groupBy share one conv_id partitioning
    assert a.n_exchanges <= 1, a.plan
