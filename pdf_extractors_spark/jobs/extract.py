#!/usr/bin/env python3
"""spark-submit entry point for the extraction job.

Cluster usage (the north rule's submission shape)::

    zip -r engine.zip pdf_extractors_spark/
    spark-submit --py-files engine.zip pdf_extractors_spark/jobs/extract.py \
        --input  <transcripts parquet/Iceberg path> \
        --output <extracted output path> \
        --buckets 64 --resume

Local usage (no spark-submit needed — the session factory ships the
package to workers itself)::

    python3 -m pdf_extractors_spark.jobs.extract --input ... --output ...

The job is resumable: each conv_id hash bucket commits atomically with a
lineage manifest (rows / bytes / parse errors / snapshot id); a re-run
with --resume skips committed buckets (checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="transcripts parquet path")
    p.add_argument("--output", required=True, help="extracted output path")
    p.add_argument("--buckets", type=int, default=64, help="checkpoint buckets")
    p.add_argument("--resume", action="store_true", default=True,
                   help="skip buckets with committed manifests (default on)")
    p.add_argument("--no-resume", dest="resume", action="store_false")
    p.add_argument("--snapshot-id", default=None, help="input snapshot/lineage id")
    p.add_argument("--master", default=None, help="override master URL")
    args = p.parse_args(argv)

    # import inside main so spark-submit can ship the zip before imports
    from pdf_extractors_spark import checkpoint
    from pdf_extractors_spark.session import get_spark

    spark = get_spark(app_name="extract-transcripts", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    transcripts = spark.read.parquet(args.input)

    if not args.resume:
        import shutil, os

        if os.path.isdir(args.output):
            shutil.rmtree(args.output)

    result = checkpoint.run_with_checkpoint(
        spark,
        transcripts,
        args.output,
        n_buckets=args.buckets,
        input_snapshot_id=args.snapshot_id,
    )
    stats = checkpoint.metrics(args.output)
    print(json.dumps({"result": result, "metrics": stats}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
