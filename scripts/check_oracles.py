#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` entry exists, the SQL on DuckDB over the same parquet
tables; compare row count, column names, and an order-insensitive value
hash (columns sorted by name, every value stringified).

Usage: python3 scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_PANDAS_SAFE = {
    "VARCHAR", "BIGINT", "DOUBLE", "INTEGER", "TIMESTAMP",
    "BOOLEAN", "FLOAT", "DATE", "SMALLINT", "TINYINT",
}
_INT_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT"}


def _norm_value(v) -> str:
    # distinct sentinel for null/NaN: collapsing them with "" would hide
    # genuine null-vs-empty-string drift between Spark and DuckDB
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NULL"
        return f"{v:.6g}"
    return str(v)


def value_hash(rows: list[tuple], columns: list[str]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(_norm_value(row[i]) for i in order) for row in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from pdf_extractors_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="check-oracles", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"create view {t} as select * from '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # Gate-window lint: the driver records only the first _GATE_WINDOW
    # registry entries, so every one of them must carry a value oracle —
    # a rows-only query inside the window burns a gate slot (round 2's
    # regression was exactly this, in the other direction).
    window = list(queries)[: entrymod._GATE_WINDOW]
    unoracled = [n for n in window if n not in oracles]
    if unoracled:
        print(
            f"GATE-WINDOW LINT FAIL: first {entrymod._GATE_WINDOW} entries "
            f"without oracles: {unoracled}",
            file=sys.stderr,
        )
        return 2
    if only:
        unknown = set(only) - set(queries)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
            return 2
    failures = []
    checked = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        checked.append(name)
        t0 = time.time()
        df = fn(spark, sf_dir)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        spark_secs = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows={len(rows):6d}  (rows-only) {spark_secs:5.1f}s")
            if len(rows) == 0:
                failures.append((name, "zero rows"))
            continue
        # Type lint: the driver's comparator converts DuckDB results via
        # pandas, where HUGEINT (sum of int32) and nullable-int columns
        # become float64 and stringify as "123.0" while Spark prints
        # "123". Round 1's only red row (group_count) was exactly this.
        # Fail loudly here so the trap never reaches the driver again.
        rel = con.sql(f"select * from ({oracles[name]}) limit 0")
        duck_types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
        bad_types = [
            (c, t) for c, t in duck_types.items() if t not in _PANDAS_SAFE
        ]
        if bad_types:
            failures.append((name, f"pandas-hostile oracle types: {bad_types}"))
            print(f"  {name:28s} TYPE-LINT FAIL {bad_types}")
            continue
        # Nullable-int coercion lint: an integer column CONTAINING nulls
        # passes the static check above but still becomes float64 in the
        # driver's pandas conversion ("123.0" vs Spark's "123"). Detect
        # the coercion on the materialized frame directly.
        pdf = con.execute(oracles[name]).df()
        coerced = [
            c
            for c in pdf.columns
            if duck_types.get(c, "") in _INT_TYPES
            and str(pdf[c].dtype) == "float64"
        ]
        if coerced:
            failures.append((name, f"nullable-int pandas coercion: {coerced}"))
            print(f"  {name:28s} TYPE-LINT FAIL nullable-int→float64 {coerced}")
            continue
        res = con.execute(oracles[name])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        ok_cols = sorted(cols) == sorted(duck_cols)
        ok_count = len(rows) == len(duck_rows)
        ok_hash = value_hash(rows, cols) == value_hash(duck_rows, duck_cols)
        status = "OK " if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(
            f"  {name:28s} rows={len(rows):6d} cols={'OK' if ok_cols else sorted(cols)!r:}"
            f" count={'OK' if ok_count else len(duck_rows)} hash={'OK' if ok_hash else 'MISMATCH'}"
            f"  [{status}] {spark_secs:5.1f}s"
        )
        if status != "OK ":
            failures.append((name, f"cols={ok_cols} count={ok_count} hash={ok_hash}"))
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all oracle checks passed")
    # durable evidence for queries outside the driver gate window: a
    # dated record of which names passed the local replica of the
    # driver's comparator (docs/COVERAGE.md points here)
    import datetime

    with open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "REPLAY.jsonl",
    ), "a") as f:
        f.write(json.dumps({
            "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
                timespec="seconds"
            ),
            "sf_dir": sf_dir,
            "passed": sorted(checked),
        }) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
