#!/usr/bin/env python3
"""Regenerate docs/PLANS.md: formatted physical plans for the headline
queries with the properties that matter at 100 TB called out. Run after
any operator change; tests/test_plans.py pins the load-bearing claims.

Usage: python3 scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
import warnings
from contextlib import redirect_stdout
from datetime import datetime, timezone

warnings.filterwarnings("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLAN_QUERIES = {
    "boilerplate_filter": (
        "F1 stop-list predicate. Expect: `PushedFilters` on the parquet scan "
        "and a `ReadSchema` holding only the projected columns — the filter "
        "and pruning reach storage, payload bytes for dropped rows are never "
        "decoded further than the row group."
    ),
    "pricing_summary": (
        "Grouped aggregation. Expect: `HashAggregate` twice (partial map-side "
        "combine, then final after one Exchange) inside `WholeStageCodegen` "
        "spans — shuffle carries partial aggregates, not rows."
    ),
    "broadcast_join": (
        "Fact-to-dim join. Expect: `BroadcastHashJoin` with the customer side "
        "under `BroadcastExchange` — the orders side never shuffles."
    ),
    "exact_dedup": (
        "Exact dedup. Expect: the md5 hash computed in the scan-side project, "
        "so the Exchange carries (hash, id) — 16-byte keys, never payloads."
    ),
    "embedding_neardup": (
        "Near-dup LSH. Expect: an equi-join (SortMerge or BroadcastHash) on "
        "(band, key) — no CartesianProduct / BroadcastNestedLoopJoin anywhere; "
        "vectors are re-joined only for surviving candidates."
    ),
    "asof_join": (
        "As-of join. Expect: Window over (user_id sorted by ts) and NO join "
        "operator — the union + fill-down formulation costs one exchange, "
        "where a theta-join would build per-key cross products."
    ),
    "decontaminate": (
        "Contamination check. Expect: the benchmark shingle set under "
        "`BroadcastExchange` — the corpus side streams through one pass."
    ),
    "dsir_weights": (
        "DSIR importance weights. Expect: the bucket-score table under "
        "`BroadcastExchange` feeding a `BroadcastHashJoin` against the "
        "exploded corpus features — both count tables are bounded by "
        "n_buckets, so the corpus never shuffles for scoring; the only "
        "exchanges are the two bucket groupBys, the per-doc aggregation "
        "and the id-set join."
    ),
    "kmv_distinct": (
        "KMV cardinality sketch. Expect: `MapInPandas` directly on the "
        "scan-side project (the bounded-state k-minima fold, zero exchange) "
        "and exactly ONE Exchange carrying ≤ k 8-byte hashes per (group, "
        "partition) into the `collect_set` merge — an exact COUNT(DISTINCT) "
        "would shuffle every distinct (group, token) pair instead."
    ),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from pdf_extractors_spark import pipeline
    from pdf_extractors_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        f"Generated {datetime.now(timezone.utc).isoformat(timespec='seconds')} by",
        "`scripts/dump_plans.py` (sf0.01 input; plans are scale-independent",
        "modulo AQE runtime re-optimization). The properties called out here",
        "are pinned as assertions in `tests/test_plans.py` /",
        "`tests/test_bucketing.py`.",
        "",
        "## extraction stage (`pipeline.extract_transcripts`)",
        "",
        "One narrow `MapInArrow` over the scan — **no Exchange anywhere**:",
        "parallelism comes from input split planning; there is no key to",
        "shuffle on because every turn is self-contained.",
        "",
        "```",
    ]
    tdf = entrymod._transcripts(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        pipeline.extract_transcripts(tdf).explain("formatted")
    out.append(buf.getvalue().strip())
    out.append("```")

    for name, note in PLAN_QUERIES.items():
        out += ["", f"## {name}", "", note, "", "```"]
        buf = io.StringIO()
        with redirect_stdout(buf):
            queries[name](spark, sf_dir).explain("formatted")
        plan = buf.getvalue().strip()
        # keep the operator tree + scan details, drop the long column lists
        out.append(plan)
        out.append("```")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "docs", "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path} ({len(out)} lines)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
