#!/usr/bin/env python3
"""spark-submit entrypoint for the full training-data refinery: the
composed pipeline a training team actually runs over the transcripts
table, as ONE resumable job.

    spark-submit --py-files engine.zip jobs/refinery.py \
        --input  /data/transcripts_parquet \
        --output /data/refined \
        --n-buckets 64 --budget 2048 --min-tokens 5

Stages (each writes ``<output>/<stage>/`` and commits it atomically —
parquet lands in a tmp dir that is renamed into place, then a
``_stage.json`` lineage manifest with row counts and wall time is
written; a re-submitted job skips every committed stage, and the
extraction stage additionally resumes at BUCKET granularity through
checkpoint.py even when it was killed mid-stage):

  extracted/  Arrow-batched per-turn extraction (per-bucket manifests)
  docs/       conversation assembly: applyInArrow stitch of extracted
              turn text into one document per conversation
  repaired/   text repair BEFORE any hashing: mojibake round-trip fix +
              Unicode NFC — composed vs decomposed (or encoding-damaged)
              bytes silently defeat every hash-keyed stage downstream
  dedup/      exact dedup of repaired documents (min-conv_id keeper)
  kept/       quality gate: whitespace token count >= --min-tokens
  packed/     budget-aligned training units (pack_units sharding)

Prints ONE JSON line: per-stage row counts in/out + skipped flags +
extraction parse errors. The driver config (master, executors, memory)
belongs to spark-submit flags; ``--gen-convs N`` generates a
deterministic synthetic input first for self-contained smoke runs."""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def _ensure_importable() -> None:
    try:
        import pdf_extractors_spark  # noqa: F401
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_dir(out: str, name: str) -> str:
    return os.path.join(out, name)


def _committed(out: str, name: str) -> dict | None:
    p = os.path.join(_stage_dir(out, name), "_stage.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def _commit_stage(out: str, name: str, df, extra: dict | None = None) -> dict:
    """Write df as parquet into a tmp dir, rename into place, then write
    the stage manifest INSIDE the committed dir (manifest-last: a crash
    between rename and manifest write re-runs the stage, never trusts a
    half-written one)."""
    final = _stage_dir(out, name)
    tmp = final + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    if os.path.isdir(final):
        shutil.rmtree(final)
    t0 = time.time()
    df.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, final)
    manifest = {
        "stage": name,
        "rows": int(df.sparkSession.read.parquet(final).count()),
        "secs": round(time.time() - t0, 3),
        **(extra or {}),
    }
    with open(os.path.join(final, "_stage.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="transcripts parquet path")
    ap.add_argument("--output", required=True, help="refinery output root")
    ap.add_argument("--n-buckets", type=int, default=8)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--snapshot-id", default=None)
    ap.add_argument(
        "--gen-convs", type=int, default=None,
        help="generate a synthetic input of N conversations at --input first",
    )
    args = ap.parse_args(argv)
    if not args.input:
        ap.error("--input is required")

    _ensure_importable()
    from pyspark.sql import SparkSession, functions as F

    from pdf_extractors_spark import checkpoint, pipeline
    from pdf_extractors_spark.operators import dedup, sampling, text_stats

    spark = SparkSession.builder.appName("transcript-refinery").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try:
        from pdf_extractors_spark.session import _package_zip

        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass

    if args.gen_convs:
        from pdf_extractors_spark.fixtures import gen

        gen.materialize(spark, args.input, n_convs=args.gen_convs, max_turns=100)

    os.makedirs(args.output, exist_ok=True)
    report: dict = {"stages": {}}

    def _maybe_kill(stage: str) -> None:
        """Fault-injection hook for the kill-resume equivalence check
        (scripts/refinery_resume_check.py): when the env var names this
        stage, die HARD right after its commit — no spark.stop(), no
        atexit, exit 137 like an OOM-killed or preempted driver. The
        resumed submission must then skip every committed stage and
        produce byte-identical downstream output."""
        if os.environ.get("SPARK_GRAFT_KILL_AFTER_STAGE") == stage:
            print(json.dumps({"killed_after": stage}), flush=True)
            os._exit(137)

    # -- stage 1: extraction (bucket-resumable inside the stage) --------
    ext_dir = _stage_dir(args.output, "extracted")
    transcripts = spark.read.parquet(args.input)
    res = checkpoint.run_with_checkpoint(
        spark, transcripts, ext_dir,
        n_buckets=args.n_buckets, input_snapshot_id=args.snapshot_id,
    )
    ext_metrics = checkpoint.metrics(ext_dir)
    report["stages"]["extracted"] = {
        "rows": ext_metrics["rows"],
        "parse_errors": ext_metrics["parse_errors"],
        "processed_buckets": len(res["processed"]),
        "skipped_buckets": len(res["skipped"]),
    }
    _maybe_kill("extracted")
    # plain-directory read: partition discovery adds the bucket column and
    # skips the underscore-prefixed _manifests dir (no glob-probe WARN)
    extracted = spark.read.parquet(ext_dir)

    # -- stage 2: conversation assembly (applyInArrow) -------------------
    if (m := _committed(args.output, "docs")) is not None:
        report["stages"]["docs"] = {**m, "skipped": True}
    else:
        docs = pipeline.conv_stitch_arrow(
            extracted.select(
                "conv_id", "turn_idx",
                F.col("extracted_text").alias("text"),
            )
        )
        report["stages"]["docs"] = _commit_stage(args.output, "docs", docs)
    _maybe_kill("docs")
    docs = spark.read.parquet(_stage_dir(args.output, "docs"))

    # -- stage 3: text repair BEFORE any hash-keyed stage -----------------
    # mojibake round-trip fix, then Unicode NFC: encoding-damaged or
    # decomposed bytes are different md5 keys for the same text, so
    # un-repaired input silently defeats the dedup stage that follows.
    if (m := _committed(args.output, "repaired")) is not None:
        report["stages"]["repaired"] = {**m, "skipped": True}
    else:
        fixed = text_stats.mojibake_repair(
            docs, text_col="stitched_text", id_col="conv_id",
            keep_cols=("n_turns",),
        ).select(
            "conv_id", "n_turns",
            F.col("text_fixed").alias("stitched_text"),
            F.col("changed").alias("moji_changed"),
        )
        nfc = text_stats.unicode_normalize(
            fixed, text_col="stitched_text", id_col="conv_id",
            keep_cols=("n_turns", "moji_changed"),
        ).select(
            "conv_id", "n_turns",
            F.col("text_nfc").alias("stitched_text"),
            "moji_changed",
            F.col("changed").alias("nfc_changed"),
        )
        report["stages"]["repaired"] = _commit_stage(
            args.output, "repaired", nfc
        )
    _maybe_kill("repaired")
    repaired = spark.read.parquet(_stage_dir(args.output, "repaired"))

    # -- stage 4: exact dedup of repaired documents -----------------------
    if (m := _committed(args.output, "dedup")) is not None:
        report["stages"]["dedup"] = {**m, "skipped": True}
    else:
        deduped = dedup.dedup_documents(
            repaired, text_col="stitched_text", id_col="conv_id"
        )
        report["stages"]["dedup"] = _commit_stage(args.output, "dedup", deduped)
    _maybe_kill("dedup")
    deduped = spark.read.parquet(_stage_dir(args.output, "dedup"))

    # -- stage 5: quality gate -------------------------------------------
    if (m := _committed(args.output, "kept")) is not None:
        report["stages"]["kept"] = {**m, "skipped": True}
    else:
        toks = F.size(
            F.split(F.trim(F.lower(F.col("stitched_text"))), r"\s+")
        )
        kept = deduped.withColumn("n_tokens", toks.cast("long")).filter(
            F.col("n_tokens") >= args.min_tokens
        )
        report["stages"]["kept"] = _commit_stage(args.output, "kept", kept)
    _maybe_kill("kept")
    kept = spark.read.parquet(_stage_dir(args.output, "kept"))

    # -- stage 6: budget-aligned packing ----------------------------------
    if (m := _committed(args.output, "packed")) is not None:
        report["stages"]["packed"] = {**m, "skipped": True}
    else:
        packed = sampling.pack_units(
            kept, token_col="n_tokens", id_col="conv_id",
            budget=args.budget, n_buckets=args.n_buckets,
        )
        report["stages"]["packed"] = _commit_stage(
            args.output, "packed", packed, {"budget": args.budget}
        )

    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
