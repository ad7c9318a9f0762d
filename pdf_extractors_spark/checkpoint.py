"""Per-partition checkpoint manifests: resumable batch extraction.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics ... a killed job resumes without reprocessing committed
partitions". The reference has nothing like this (its only error handling
is a fail-stop try/except, persons.py:806-808).

Design (FIXTURES.md §4):

* the input keyspace is split into ``n_buckets`` stable hash buckets of
  ``conv_id`` (``pmod(xxhash64(conv_id), n)``) — the unit of commit.
  On Iceberg this unit would be the table partition + snapshot id; the
  bucket scheme is the same idea expressed over plain parquet.
* each bucket is extracted and written as one atomic unit:
  data → ``{out}/bucket=<k>/`` then manifest → ``{out}/_manifests/<k>.json``
  (manifest written only after the data write succeeds — write-then-manifest,
  so a crash mid-bucket leaves no manifest and the bucket is redone).
* a resume run lists manifests, anti-joins committed buckets, and only
  processes the rest.
* manifests carry lineage + metrics: rows, bytes, parse_errors,
  input fingerprint, timestamps.

Scale notes: buckets are processed as independent Spark jobs over a
*pruned* scan (bucket predicate is evaluated at the scan, so each job
reads ~1/n of the input). On a 1000-executor cluster you would raise
``n_buckets`` to a few thousand so each commit unit is minutes of work —
the driver-side loop is trivially cheap relative to the job it launches,
and sequential commits bound the blast radius of any failure to one
bucket. Within a bucket, parallelism is full (all executors share the
bucket's splits).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import pipeline

MANIFEST_DIR = "_manifests"


def bucket_of(conv_id_col, n_buckets: int):
    return F.pmod(F.xxhash64(conv_id_col), F.lit(n_buckets)).cast("int")


def committed_buckets(out_path: str) -> dict[int, dict]:
    mdir = os.path.join(out_path, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return {}
    out: dict[int, dict] = {}
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        if m.get("status") == "committed":
            out[int(m["partition_id"])] = m
    return out


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            total += os.path.getsize(os.path.join(root, name))
    return total


def run_with_checkpoint(
    spark: SparkSession,
    transcripts: DataFrame,
    out_path: str,
    n_buckets: int = 8,
    fail_after: int | None = None,
    input_snapshot_id: str | None = None,
) -> dict:
    """Extract ``transcripts`` into ``out_path`` bucket by bucket, skipping
    buckets already committed by a previous run.

    ``fail_after``: test hook — raise after K bucket commits (simulates a
    killed job).
    Returns {"processed": [...], "skipped": [...]}.
    """
    os.makedirs(os.path.join(out_path, MANIFEST_DIR), exist_ok=True)
    done = committed_buckets(out_path)
    snapshot = input_snapshot_id or "unknown"
    src = transcripts.withColumn("_bucket", bucket_of(F.col("conv_id"), n_buckets))

    processed: list[int] = []
    skipped: list[int] = sorted(done)
    run_id = uuid.uuid4().hex[:12]
    for k in range(n_buckets):
        if k in done:
            continue
        started = time.time()
        # bucket predicate prunes the scan: only this bucket's rows are read
        part = src.filter(F.col("_bucket") == k).drop("_bucket")
        extracted = pipeline.extract_transcripts(part)
        bucket_dir = os.path.join(out_path, f"bucket={k}")
        (
            extracted.sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite")
            .parquet(bucket_dir)
        )
        stats = spark.read.parquet(bucket_dir).agg(
            F.count("*").alias("rows"), F.sum("parse_errors").alias("errs")
        ).collect()[0]
        manifest = {
            "partition_id": k,
            "status": "committed",
            "rows": int(stats["rows"]),
            "bytes": _dir_bytes(bucket_dir),
            "parse_errors": int(stats["errs"] or 0),
            "input_snapshot_id": snapshot,
            "run_id": run_id,
            "started_at": started,
            "committed_at": time.time(),
        }
        # write-then-manifest: rename makes the commit atomic on a local FS
        # (on object stores you'd use a conditional PUT / Iceberg commit)
        mpath = os.path.join(out_path, MANIFEST_DIR, f"{k}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        processed.append(k)
        if fail_after is not None and len(processed) >= fail_after:
            raise RuntimeError(f"injected failure after {fail_after} buckets")
    return {"processed": processed, "skipped": skipped}


def read_extracted(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_path, "bucket=*"))


def metrics(out_path: str) -> dict:
    """Aggregate lineage metrics across committed manifests."""
    ms = committed_buckets(out_path)
    return {
        "buckets": len(ms),
        "rows": sum(m["rows"] for m in ms.values()),
        "bytes": sum(m["bytes"] for m in ms.values()),
        "parse_errors": sum(m["parse_errors"] for m in ms.values()),
    }
