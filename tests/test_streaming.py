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
