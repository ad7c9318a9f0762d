"""Streaming extraction: availableNow run over a parquet directory must
produce exactly the batch pipeline's rows (stream/batch parity), and the
stream checkpoint must make re-runs incremental (no duplicates)."""

import time

from pdf_extractors_spark import pipeline
from pdf_extractors_spark.streaming import extract_stream as es


def _rows(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["extracted_text"], r["records"])
        for r in df.collect()
    )


def test_stream_matches_batch(spark, small_transcripts, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    small_transcripts.write.parquet(src)

    q = es.start_extraction(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(300)

    got = _rows(spark.read.parquet(out))
    want = _rows(pipeline.extract_transcripts(spark.read.parquet(src)))
    assert got == want


def test_stream_checkpoint_no_duplicates(spark, small_transcripts, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    small_transcripts.write.parquet(src)

    q = es.start_extraction(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(300)
    first = spark.read.parquet(out).count()

    # re-run with same checkpoint: nothing new to process
    q2 = es.start_extraction(spark, src, out, ckpt, available_now=True)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == first


def test_stateful_conversation_snapshots_cross_batch(spark, tmp_path):
    """applyInPandasWithState carries per-conversation state ACROSS
    micro-batches: two single-file triggers over the same conv must yield
    a cumulative snapshot, not two independent ones."""
    import uuid

    src = str(tmp_path / "in")
    rows1 = [("A", 0, "user", "aaaa", "html_page", None),
             ("A", 1, "assistant", "bb", "html_page", None)]
    rows2 = [("A", 2, "user", "cccccc", "html_page", None),
             ("B", 0, "user", "dd", "html_page", None)]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = es.read_transcript_stream(spark, src, max_files_per_trigger=1)
    snaps = es.conversation_state_stream(stream, idle_timeout_ms=60_000)
    table = f"snaps_{uuid.uuid4().hex[:8]}"
    # one state-store instance per shuffle partition per micro-batch —
    # keep the test's state fan-out small
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            snaps.writeStream.format("memory")
            .queryName(table)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        # registered processing-time timeouts keep the query alive past
        # the data batches — poll the sink for the expected snapshots
        # (A twice, B once) instead of waiting for self-termination
        deadline = time.time() + 240
        while time.time() < deadline:
            if spark.sql(f"select count(*) from {table}").first()[0] >= 3:
                break
            time.sleep(2)
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = spark.sql(f"select * from {table}").collect()
    best = {}
    for r in got:
        cur = best.get(r["conv_id"])
        if cur is None or r["turns"] > cur[0]:
            best[r["conv_id"]] = (r["turns"], r["chars"])
    # conv A: 2 turns in batch 1 + 1 in batch 2 → cumulative 3 / 12 chars
    assert best["A"] == (3, 12)
    assert best["B"] == (1, 2)


def test_dedup_stream_across_micro_batches(spark, tmp_path):
    """Rows whose text already appeared in an EARLIER micro-batch are
    dropped by the stateful dropDuplicates — one survivor per distinct
    normalized text across the whole stream."""
    src = str(tmp_path / "docs")
    rows1 = [(1, "alpha beta gamma"), (2, "unique one")]
    rows2 = [(3, "ALPHA  beta   gamma"), (4, "unique two")]  # 3 ≡ 1 normalized
    schema = "doc_id long, text string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src + "/f2")

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        es.dedup_stream(sdf)
        .writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("dedup_stream_t").collect()
    texts = sorted(r["text_hash"] for r in got)
    assert len(got) == 3                    # 4 rows in, 1 cross-batch dup out
    assert len(set(texts)) == 3             # one survivor per distinct text


def test_session_rollup_lifts_to_streaming(spark, tmp_path):
    """The documented claim on session_rollup: the SAME session_window
    aggregation runs under readStream + watermark and, in one
    availableNow pass in complete mode, emits exactly the batch rollup."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    base = datetime(2026, 1, 1)
    rows = []
    for u in range(3):
        ts = base
        for i in range(10):
            ts += timedelta(minutes=(i * 13 + u * 5) % 50)
            rows.append((u, ts))
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(src)

    batch = pipeline.session_rollup(spark.read.parquet(src))

    stream_in = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(src)
        .withWatermark("ts", "1 minute")
    )
    # the identical operator call — this IS the lift
    q = (
        pipeline.session_rollup(stream_in)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    key = lambda df: sorted(
        (r["user_id"], r["s_start"], r["s_end"], r["n_events"])
        for r in df.collect()
    )
    assert key(spark.table("sess_stream")) == key(batch)


def test_stream_stream_response_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream join parity: the same response_join
    over readStream (availableNow, file source split into micro-batches)
    emits exactly the batch join's rows."""
    from datetime import datetime, timedelta

    src = str(tmp_path / "turns")
    base = datetime(2026, 1, 1)
    rows = []
    for c in range(6):
        for i in range(8):
            role = ["user", "assistant", "tool"][i % 3]
            rows.append(
                (f"c{c}", i, role, f"t{i}", "html_page",
                 base + timedelta(seconds=7 * i + c))
            )
    # one answered pair pushed past the 60s latency cap: no join row
    rows.append(("late", 0, "user", "u", "html_page", base))
    rows.append(("late", 1, "assistant", "a", "html_page",
                 base + timedelta(seconds=120)))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    df.repartition(4).write.parquet(src)

    batch = es.response_join_stream(spark.read.parquet(src))

    sdf = es.read_transcript_stream(spark, src, max_files_per_trigger=1)
    q = (
        es.response_join_stream(sdf)
        .writeStream.format("memory")
        .queryName("resp_join_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    key = lambda d: sorted(
        (r["conv_id"], r["user_idx"], r["asst_idx"], r["latency_secs"])
        for r in d.collect()
    )
    got, want = key(spark.table("resp_join_stream")), key(batch)
    assert got == want
    assert want  # the join actually produced pairs
    assert all(r[0] != "late" for r in want)  # the 120s pair was capped
