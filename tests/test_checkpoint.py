"""Resume-from-checkpoint equivalence (SURVEY.md §5.3 property tests):
kill after K buckets → resume → identical output, committed buckets not
reprocessed."""

import json

import pytest

from pdf_extractors_spark import checkpoint, pipeline


def _rows(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["extracted_text"], r["records"])
        for r in df.collect()
    )


def test_resume_skips_committed_and_matches_oneshot(spark, small_transcripts, tmp_path):
    out_resume = str(tmp_path / "resume")
    out_oneshot = str(tmp_path / "oneshot")

    # one-shot reference run
    checkpoint.run_with_checkpoint(spark, small_transcripts, out_oneshot, n_buckets=6)

    # killed run: fails after 2 bucket commits
    with pytest.raises(RuntimeError, match="injected failure"):
        checkpoint.run_with_checkpoint(
            spark, small_transcripts, out_resume, n_buckets=6, fail_after=2
        )
    assert len(checkpoint.committed_buckets(out_resume)) == 2

    # resume: must not reprocess the 2 committed buckets
    result = checkpoint.run_with_checkpoint(
        spark, small_transcripts, out_resume, n_buckets=6
    )
    assert len(result["skipped"]) == 2
    assert len(result["processed"]) == 4
    assert set(result["skipped"]).isdisjoint(result["processed"])

    # identical extracted content
    assert _rows(checkpoint.read_extracted(spark, out_resume)) == _rows(
        checkpoint.read_extracted(spark, out_oneshot)
    )


def test_manifest_lineage_metrics(spark, small_transcripts, tmp_path):
    out = str(tmp_path / "m")
    checkpoint.run_with_checkpoint(
        spark, small_transcripts, out, n_buckets=4, input_snapshot_id="snap-1"
    )
    ms = checkpoint.committed_buckets(out)
    assert set(ms) == {0, 1, 2, 3}
    for m in ms.values():
        assert m["status"] == "committed"
        assert m["bytes"] > 0
        assert m["input_snapshot_id"] == "snap-1"
        assert m["committed_at"] >= m["started_at"]
    agg = checkpoint.metrics(out)
    assert agg["rows"] == small_transcripts.count()
    assert agg["parse_errors"] == 0


def test_interrupted_bucket_leaves_no_manifest(spark, small_transcripts, tmp_path):
    # write-then-manifest: a manifest implies its data is complete
    out = str(tmp_path / "wtm")
    with pytest.raises(RuntimeError):
        checkpoint.run_with_checkpoint(
            spark, small_transcripts, out, n_buckets=6, fail_after=1
        )
    ms = checkpoint.committed_buckets(out)
    assert len(ms) == 1
    k, m = next(iter(ms.items()))
    got = spark.read.parquet(str(tmp_path / "wtm" / f"bucket={k}")).count()
    assert got == m["rows"]
