"""JSON-Lines ingestion with corrupt-line quarantine.

Raw crawl dumps, API export logs, and inter-pipeline handoffs arrive as
JSONL — one JSON object per line, a tail of them truncated, blank, or
not objects at all. The reference reads its inputs whole-file and
fail-stops on the first bad record; at crawl scale a reader must
instead parse what parses, carry the rest VERBATIM into a quarantine
column, and never abort a 10^12-line job for one truncated shard (the
same quarantine-not-fail-stop stance as ``checkpoint.py``).

Built on ``from_json`` with ``columnNameOfCorruptRecord`` (JVM-side
Jackson parse, whole-stage codegen projection, zero Python). The
operator is a stateless per-row projection, so it is identically valid
under Structured Streaming (``readStream.text`` → ``parse_jsonl`` →
sink) — any micro-batch split yields the same rows.

PERMISSIVE semantics, pinned by tests:

* valid object → typed fields, ``_corrupt`` null
* valid object, missing keys → those fields null, ``_corrupt`` null
* type-mismatch field → that field null, OTHER fields still parsed,
  ``_corrupt`` carries the raw line (partial parse + flag)
* malformed / non-object line → all fields null, raw line in
  ``_corrupt``
* blank or null line → all fields null, ``_corrupt`` '' (its own
  class: a blank line is corrupt input, not a valid empty object)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def parse_jsonl(
    lines: DataFrame,
    schema: str,
    line_col: str = "value",
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """Parse a raw-line column into typed columns plus a quarantine.

    ``schema`` is a DDL field list (e.g. ``"id bigint, text string"``)
    naming the object fields to extract; every OTHER input column
    passes through unchanged (provenance keys survive), ``line_col`` is
    replaced by the parsed fields, and ``corrupt_col`` (string) is
    appended — null for clean parses, the raw line verbatim for
    anything flagged, '' for blank/null lines.

    Scale shape: a pure projection fused into the scan — no exchange,
    no Python, output row-for-row with input. Quarantine volume is
    bounded by the corrupt lines themselves; split the stream with two
    filters downstream (``_corrupt is null`` / ``is not null``) rather
    than re-parsing."""
    names = [f.strip().split()[0] for f in schema.split(",")]
    if corrupt_col in names:
        raise ValueError(
            f"corrupt_col {corrupt_col!r} collides with a schema field"
        )
    parsed = F.from_json(
        F.col(line_col),
        f"{schema}, {corrupt_col} string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
    )
    passthrough = [c for c in lines.columns if c != line_col]
    return lines.select(
        *passthrough,
        *[parsed[n].alias(n) for n in names],
        # from_json yields a NULL struct (not a flagged one) for
        # blank/whitespace/null lines — fold those into the quarantine
        # as '' so "parsed clean" is exactly `_corrupt is null`
        F.when(parsed.isNull(), F.lit(""))
        .otherwise(parsed[corrupt_col])
        .alias(corrupt_col),
    )


def jsonl_stats(
    parsed: DataFrame, corrupt_col: str = "_corrupt"
) -> DataFrame:
    """One-row ingest health summary: ``(n_lines, n_clean, n_corrupt,
    corrupt_ppm)`` — the number a crawl-ingest dashboard alarms on
    (corrupt_ppm jumping is the first sign an upstream writer changed
    format). Integer parts-per-million, engine-portable. Map-side
    combined single aggregate; payloads never shuffle."""
    corrupt = F.col(corrupt_col).isNotNull()
    return parsed.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.coalesce(F.sum(F.when(~corrupt, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_clean"),
        F.coalesce(F.sum(F.when(corrupt, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_corrupt"),
        F.expr(
            f"cast(coalesce((1000000 * sum(case when {corrupt_col} "
            f"is not null then 1 else 0 end)) div count(*), 0) "
            f"as bigint)"
        ).alias("corrupt_ppm"),
    )
