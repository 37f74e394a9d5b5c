"""Read-only SQL gate — the reference's F7 done right.

The reference gates custom SQL with a string-prefix check
(``Frontend/app.py:274-281``: ``query.strip().lower().startswith("select")``)
— trivially bypassed ("WITH x AS (...) DELETE ...", comments, etc.). The
engine parses the statement and inspects the *logical plan*: only plans that
parse to pure queries (no Command/DML node) execute.

Parsing happens WITHOUT execution: ``sessionState().sqlParser().parsePlan``
builds the unresolved plan only. Commands in Spark execute eagerly on
``spark.sql``, so the check must precede it — this is the whole point.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# Plan node names that indicate writes/DDL/session mutation. Matched against
# the parsed (unresolved) logical-plan class names.
_FORBIDDEN = re.compile(
    r"Command|Insert|Delete|Update|Merge|Create|Drop|Alter|Truncate|"
    r"SetCatalog|AddJar|RefreshResource|Cache|Uncache",
    re.IGNORECASE,
)


class ReadOnlyViolation(ValueError):
    pass


def parse_plan_class(spark: SparkSession, sql: str) -> str:
    """Parse (not execute) and return the root plan class name."""
    parser = spark._jsparkSession.sessionState().sqlParser()
    plan = parser.parsePlan(sql)
    return plan.getClass().getSimpleName()


def is_read_only(spark: SparkSession, sql: str) -> bool:
    """True iff the statement parses to a pure query. Unparseable input
    (including multi-statement strings) is NOT read-only — it can't be
    admitted, so the gate answers False rather than raising."""
    try:
        cls = parse_plan_class(spark, sql)
    except Exception:
        return False
    return not _FORBIDDEN.search(cls)


def run_read_only(spark: SparkSession, sql: str) -> DataFrame:
    """Execute arbitrary user SQL iff its parsed plan is a pure query."""
    try:
        cls = parse_plan_class(spark, sql)
    except Exception as exc:
        raise ValueError(f"SQL does not parse: {exc}") from None
    if _FORBIDDEN.search(cls):
        raise ReadOnlyViolation(f"statement is not read-only (plan: {cls})")
    return spark.sql(sql)
