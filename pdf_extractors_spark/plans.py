"""Physical-plan audit: the scale linter.

Every "would this survive 100 TB" property this engine cares about —
shuffle count, driver funnels, Python-worker stages, scan pushdown,
broadcast vs shuffled joins — is readable off ``df.explain("formatted")``.
The test suite pins those properties per operator; this module is the
same check as a first-class API, so a pipeline author can assert a plan
budget in CI (or at submit time) instead of discovering a stray
SinglePartition sort from a straggler stage at scale.

Usage::

    from pdf_extractors_spark.plans import plan_audit, assert_plan

    audit = plan_audit(df)            # -> PlanAudit (dataclass of facts)
    assert_plan(df, max_exchanges=2,  # raises with the offending plan
                no_single_partition=True, no_python=True)

The parser is intentionally conservative: it only reads the stable
tokens Spark has printed for years (``Exchange``, ``hashpartitioning``,
``SinglePartition``, ``PushedFilters``, ``BroadcastHashJoin``,
``CartesianProduct``, the Python evaluation operators). Anything it
cannot classify is left out of the counts rather than guessed at.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_PYTHON_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInArrow",
    "FlatMapGroupsInPandasWithState",
)


def plan_text(df: DataFrame) -> str:
    """``df.explain("formatted")`` as a string (explain prints)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@dataclass
class PlanAudit:
    n_exchanges: int
    hash_partitionings: list[str]
    range_partitionings: list[str]
    has_single_partition: bool
    python_stages: list[str]
    broadcast_joins: int
    sort_merge_joins: int
    has_cartesian: bool
    pushed_filters: list[str]
    plan: str = field(repr=False)

    @property
    def shuffles_only_on(self) -> set[str]:
        """Union of column names appearing in hash partitionings —
        ``audit.shuffles_only_on <= {"conv_id"}`` asserts every shuffle
        is keyed on conv_id."""
        cols: set[str] = set()
        for h in self.hash_partitionings:
            for tok in h.split(","):
                tok = tok.strip()
                m = re.match(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", tok)
                if m:
                    cols.add(m.group(1))
        return cols


def plan_audit(df: DataFrame) -> PlanAudit:
    p = plan_text(df)
    return PlanAudit(
        n_exchanges=len(re.findall(r"\(\d+\) Exchange", p)),
        hash_partitionings=re.findall(r"hashpartitioning\(([^)]*)\)", p),
        range_partitionings=re.findall(r"rangepartitioning\(([^)]*)\)", p),
        has_single_partition="SinglePartition" in p,
        python_stages=[m for m in _PYTHON_MARKERS if m in p],
        broadcast_joins=len(re.findall(r"\(\d+\) BroadcastHashJoin", p)),
        sort_merge_joins=len(re.findall(r"\(\d+\) SortMergeJoin", p)),
        has_cartesian="CartesianProduct" in p,
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", p),
        plan=p,
    )


def assert_plan(
    df: DataFrame,
    max_exchanges: int | None = None,
    no_single_partition: bool = False,
    no_python: bool = False,
    no_cartesian: bool = True,
    shuffle_keys: set[str] | None = None,
) -> PlanAudit:
    """Raise ``AssertionError`` (with the formatted plan attached) when
    the physical plan violates the stated budget; return the audit
    otherwise. ``no_python`` permits the Arrow extraction stage to be
    asserted absent from pure-column pipelines; ``shuffle_keys`` bounds
    what every hash exchange may be keyed on."""
    a = plan_audit(df)
    problems = []
    if max_exchanges is not None and a.n_exchanges > max_exchanges:
        problems.append(
            f"{a.n_exchanges} exchanges > budget {max_exchanges}"
        )
    if no_single_partition and a.has_single_partition:
        problems.append("SinglePartition funnel in plan")
    if no_python and a.python_stages:
        problems.append(f"Python stages present: {a.python_stages}")
    if no_cartesian and a.has_cartesian:
        problems.append("CartesianProduct in plan")
    if shuffle_keys is not None and not a.shuffles_only_on <= shuffle_keys:
        problems.append(
            f"shuffle keys {a.shuffles_only_on - shuffle_keys} "
            f"outside budget {shuffle_keys}"
        )
    if problems:
        raise AssertionError(
            "; ".join(problems) + "\n\n" + a.plan
        )
    return a
