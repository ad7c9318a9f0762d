#!/usr/bin/env python3
"""Kill-resume output-equivalence evidence for the refinery job
(round-3 verdict item 5: exercise the resume path at sf0.1 scale in a
RECORDED artifact, not just pytest).

Protocol — three real ``spark-submit --py-files`` submissions over the
same sf0.1-tier synthetic transcripts input (1500 conversations, the
oracle tier's sf0.1 sizing):

  A. uninterrupted run → ``<work>/refined_a``
  B. run with ``SPARK_GRAFT_KILL_AFTER_STAGE=<stage>`` → the driver
     ``os._exit(137)``s immediately after that stage commits
     (no spark.stop, no atexit — a faithful OOM-kill/preemption)
  C. plain re-submission of B's command → must skip every committed
     stage and run only the stages after the kill point

The kill stage is selectable (``--kill-after``, default ``dedup``;
round-4 verdict item 7 asks for a second recorded artifact with a
DIFFERENT kill point, e.g. ``kept``, so resume correctness isn't
single-point evidence).

Then the check: ``packed/`` from A and from B+C are compared with the
driver-gate comparator semantics — row count, sorted column names, and
an order-insensitive value hash over every cell (columns sorted by
name, rows sorted) — and the verdict is appended to
``docs/REPLAY.jsonl`` as a ``kind=refinery_resume`` row.

Usage: python3 scripts/refinery_resume_check.py [workdir] [--kill-after STAGE]
(workdir defaults to a fresh /tmp directory; pass one to inspect the
intermediate stages afterwards).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONVS = 1500  # the sf0.1 oracle-tier sizing (__spark_entry__._TRANSCRIPT_CONVS)


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _run(args: list[str], cwd: str, extra_env: dict | None = None,
         expect_rc: int = 0) -> tuple[int, str]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # --py-files must carry the package
    env["PYSPARK_PYTHON"] = sys.executable
    env.update(extra_env or {})
    out = subprocess.run(
        [_spark_submit(), "--master", "local[8]", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != expect_rc:
        sys.stderr.write(out.stderr[-4000:] + "\n")
        raise SystemExit(
            f"spark-submit rc={out.returncode}, expected {expect_rc}"
        )
    return out.returncode, out.stdout


def _last_json(stdout: str) -> dict:
    lines = [l for l in stdout.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1]) if lines else {}


def _packed_digest(path: str) -> tuple[int, list[str], str]:
    """(rows, sorted column names, order-insensitive value hash) of a
    packed/ directory — the same comparator semantics as the driver
    gate (scripts/check_oracles.py value_hash)."""
    import duckdb

    con = duckdb.connect()
    con.execute("set threads=4")
    rel = con.execute(
        f"select * from read_parquet('{path}/*.parquet')"
    )
    cols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v) -> str:
        return "\x00NULL" if v is None else str(v)

    lines = sorted(
        "\x1f".join(norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(rows), sorted(cols), h


# ordered post-extraction stages of jobs/refinery.py; extraction itself
# resumes at bucket granularity and is asserted separately
_STAGES = ["docs", "repaired", "dedup", "kept", "packed"]


def main() -> int:
    argv = list(sys.argv[1:])
    kill_after = "dedup"
    if "--kill-after" in argv:
        i = argv.index("--kill-after")
        kill_after = argv[i + 1]
        del argv[i:i + 2]
    assert kill_after in _STAGES[:-1], kill_after
    committed = _STAGES[: _STAGES.index(kill_after) + 1]
    remaining = _STAGES[_STAGES.index(kill_after) + 1 :]
    work = argv[0] if argv else tempfile.mkdtemp(
        prefix="refinery_resume_"
    )
    os.makedirs(work, exist_ok=True)
    from pdf_extractors_spark.session import _package_zip

    zip_path = _package_zip()
    job = os.path.join(REPO, "jobs", "refinery.py")
    inp = os.path.join(work, "transcripts")
    base = [
        "--py-files", zip_path, job, "--input", inp,
        "--n-buckets", "8", "--min-tokens", "5", "--budget", "2048",
        "--snapshot-id", "resume-check",
    ]
    t0 = time.time()

    # A: uninterrupted reference run (generates the input on first use)
    _, out_a = _run(
        [*base, "--output", os.path.join(work, "refined_a"),
         "--gen-convs", str(N_CONVS)], cwd=work,
    )
    rep_a = _last_json(out_a)["stages"]

    # B: killed hard right after the selected stage commits (rc 137)
    rc_b, out_b = _run(
        [*base, "--output", os.path.join(work, "refined_b")], cwd=work,
        extra_env={"SPARK_GRAFT_KILL_AFTER_STAGE": kill_after},
        expect_rc=137,
    )
    assert _last_json(out_b).get("killed_after") == kill_after, out_b[-500:]
    # the kill must land AFTER the stage committed and BEFORE the next ran
    for st in committed:
        assert os.path.exists(
            os.path.join(work, "refined_b", st, "_stage.json")
        ), f"stage {st} not committed before kill"
    assert not os.path.exists(
        os.path.join(work, "refined_b", remaining[0])
    ), f"{remaining[0]} ran before the kill — the injection point moved"

    # C: plain re-submission resumes — committed stages must be skipped
    _, out_c = _run(
        [*base, "--output", os.path.join(work, "refined_b")], cwd=work,
    )
    rep_c = _last_json(out_c)["stages"]
    assert rep_c["extracted"]["processed_buckets"] == 0
    assert rep_c["extracted"]["skipped_buckets"] == 8
    resumed_skipped = [
        st for st in committed if rep_c[st].get("skipped") is True
    ]
    assert resumed_skipped == committed, rep_c
    for st in remaining:  # everything after the kill genuinely ran
        assert rep_c[st].get("skipped") is None, (st, rep_c)

    # the value check: packed/ equality, uninterrupted vs kill+resume
    rows_a, cols_a, hash_a = _packed_digest(
        os.path.join(work, "refined_a", "packed")
    )
    rows_b, cols_b, hash_b = _packed_digest(
        os.path.join(work, "refined_b", "packed")
    )
    equal = rows_a == rows_b and cols_a == cols_b and hash_a == hash_b
    row = {
        "ts": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "kind": "refinery_resume",
        "sf_tier": "sf0.1",
        "n_convs": N_CONVS,
        "killed_after": kill_after,
        "kill_rc": rc_b,
        "resume_skipped": resumed_skipped,
        "resume_skipped_buckets": rep_c["extracted"]["skipped_buckets"],
        "packed_rows": {"uninterrupted": rows_a, "resumed": rows_b},
        "packed_hash": {"uninterrupted": hash_a, "resumed": hash_b},
        "packed_equal": equal,
        "uninterrupted_stage_rows": {
            k: v.get("rows") for k, v in rep_a.items()
        },
        "secs": round(time.time() - t0, 1),
        "workdir": work,
    }
    with open(os.path.join(REPO, "docs", "REPLAY.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    if work.startswith(tempfile.gettempdir()):
        shutil.rmtree(work, ignore_errors=True)
    return 0 if equal else 1


if __name__ == "__main__":
    sys.exit(main())
