"""Physical-plan audit: the ".explain until it's the plan you want"
discipline as a programmatic check.

Every operator in this engine was iterated against ``df.explain`` for
shuffle count, broadcast placement and pushdown reach; this module turns
that manual read into a summary dict so tests pin plan shapes
(``tests/test_scale_plans.py``) and users audit their own compositions
before running them at 100 TB — a shuffle you can count on a laptop is a
shuffle you pay for a thousand executors.

Codegen spans are deliberately NOT reported: under AQE (on in this
engine's session factory) the pre-execution plan is an
``AdaptiveSparkPlan`` that carries no ``WholeStageCodegen`` annotation —
counting it would always read 0 and mislead. Inspect
``df.explain("codegen")`` after disabling AQE when codegen width matters.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` captured as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_summary(df: DataFrame) -> dict:
    """Count the plan features that matter at scale.

    Nodes are counted from the formatted mode's numbered detail headers
    (``(N) NodeName``) so each physical node counts exactly once — the
    tree rendering above them repeats every name.

    Keys: ``exchanges`` (shuffles + broadcasts' build-side transfers —
    each shuffle is a full materialization of the stream at scale),
    ``shuffle_exchanges`` (hash/range repartitions only),
    ``broadcast_joins`` / ``sortmerge_joins`` / ``cartesian`` (join
    strategy mix — an SMJ between a fact and a dimension usually means a
    missing broadcast; cartesian is almost always a bug), ``scans``,
    ``scans_with_pushed_filters`` (a scan whose predicate did NOT reach
    the reader re-reads the whole table), ``python_workers``
    (Arrow/Python boundaries: ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas — each is a serialization fence).
    """
    plan = explain_text(df)
    nodes = re.findall(r"^\(\d+\) ([A-Za-z][A-Za-z0-9]*)", plan, re.M)

    def n(*names: str) -> int:
        return sum(1 for x in nodes if x in names)

    pushed = [
        m
        for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        if any(
            tok.strip() and not tok.strip().startswith("IsNotNull")
            for tok in m.split(",")
        )
    ]
    return {
        "exchanges": n("Exchange", "BroadcastExchange"),
        "shuffle_exchanges": n("Exchange"),
        "broadcast_joins": n("BroadcastHashJoin", "BroadcastNestedLoopJoin"),
        "sortmerge_joins": n("SortMergeJoin"),
        "cartesian": n("CartesianProduct"),
        "scans": n("Scan"),
        "scans_with_pushed_filters": len(pushed),
        "python_workers": n(
            "ArrowEvalPython",
            "MapInPandas",
            "FlatMapGroupsInPandas",
            "BatchEvalPython",
        ),
    }
