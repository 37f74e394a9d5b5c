"""Skew mitigation: salted joins and salted holistic aggregation.

The session factory enables AQE skew-join splitting (session.py), which
handles sort-merge-join skew at runtime; these helpers cover the cases AQE
does not: broadcast-infeasible hot-key equi-joins you must pre-shape, and
holistic aggregations (collect/distinct states) whose partial aggregation
cannot combine map-side. Plain algebraic aggs (count/sum/min/max) do NOT
need salting — Catalyst's partial aggregation already combines per
partition before the shuffle.

Salt values must distribute the rows OF ONE KEY across reducers, so they
derive from row identity (monotonically_increasing_id), never from the key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_salt(n: int):
    return F.pmod(F.monotonically_increasing_id(), F.lit(n)).cast("int")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed large side to a small-but-not-broadcastable side.

    Each skewed row gets one of ``n_salts`` salt values; the small side
    replicates n_salts× (explode of a literal range — rows, not bytes on the
    wire until the shuffle). The join key becomes (on..., _salt), so a hot
    key's rows spread over n_salts reducers instead of one straggler.
    Result is identical to the unsalted join — every (row, match) pair still
    meets exactly once, on the salt value the skewed row drew.

    Only left-preserving joins are salt-safe: an unmatched SMALL-side row
    exists n_salts times after replication, so right/full outer would emit
    it n_salts times; those types are rejected rather than silently
    wrong."""
    salt_safe = {"inner", "left", "left_outer", "leftouter", "left_semi",
                 "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in salt_safe:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-safe (the replicated "
            f"small side would duplicate unmatched rows); use one of "
            f"{sorted(salt_safe)}"
        )
    on = list(on)
    left = skewed.withColumn("_salt", _row_salt(n_salts))
    right = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return left.join(right, on=on + ["_salt"], how=how).drop("_salt")


def salted_collect_set(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "values",
) -> DataFrame:
    """Two-phase collect_set for holistic-agg skew: partial sets per
    (key, salt) shrink the hot key's shuffle payload to n_salts partial
    states; the final phase unions them (flatten + array_distinct).
    Output sets are sorted for determinism."""
    key_cols = list(key_cols)
    partial = df.groupBy(*key_cols, _row_salt(n_salts).alias("_salt")).agg(
        F.collect_set(value_col).alias("_part")
    )
    return partial.groupBy(*key_cols).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("_part")))
        ).alias(out_col)
    )
