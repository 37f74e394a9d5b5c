"""Market-basket analysis: frequent item pairs (exact, oracle-able) and
general frequent itemsets via MLlib FP-Growth.

Two-tier design, same philosophy as the dedup ladder's exact-baseline /
approximate-scale-path split:

* :func:`frequent_pairs` — the size-2 case solved exactly with the
  engine's own operators: distinct (group, item) projection, per-group
  ``collect_set`` + ordered pair explode (one shuffle, bounded fan-out —
  see ``graph.cooccurrence_edges``), support threshold pushed into the
  aggregate's output filter. Fully SQL-expressible, so it carries a full
  DuckDB value oracle AND serves as the correctness anchor for the
  general path below (their size-2 outputs must agree — tested).
* :func:`fpgrowth_itemsets` — MLlib's distributed FP-Growth for itemsets
  of any size. The FP-tree build is a library internal (not externally
  oracle-able, same class as the KMeans/BRP fits), but its size-2 slice
  is pinned to :func:`frequent_pairs` in tests.

Scale notes: basket width is the fan-out bound, and it is ENFORCED:
``max_items`` (default 10 000) drops baskets wider than the cap — the
same explicit-modeling-decision contract as
``linkage.blocked_fuzzy_pairs``'s ``max_block`` and
``graph.cooccurrence_edges``; audit the dropped set with
``graph.oversized_groups``. The group count used for support fractions
is a one-row aggregate broadcast back in-plan, not a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def baskets_of(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_items: "int | None" = 10_000,
) -> DataFrame:
    """(group, items array) baskets with per-group distinct items — the
    shared input shape for both tiers. Baskets wider than ``max_items``
    distinct items are DROPPED (a celebrity basket quadratically explodes
    the downstream pair fan-out in a single task); pass ``None`` to
    disable for inputs with a structurally bounded width."""
    sets = (
        df.select(group_col, item_col)
        .groupBy(group_col)
        .agg(F.collect_set(item_col).alias("items"))
    )
    if max_items is not None:
        sets = sets.where(F.size("items") <= int(max_items))
    return sets


def frequent_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 2,
    max_items: "int | None" = 10_000,
) -> DataFrame:
    """Exact frequent pairs: ``(item_a, item_b, n, support)`` for every
    unordered item pair co-appearing in ≥ ``min_count`` distinct groups;
    ``support`` = n / total groups (over the baskets surviving the
    ``max_items`` width cap). One shuffle for the baskets, a map-side
    ordered-pair explode, one counting aggregate."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    sets = baskets_of(df, group_col, item_col, max_items=max_items)
    n_groups = sets.agg(F.count("*").cast("double").alias("_ng"))
    pairs = (
        sets.select(F.explode("items").alias("item_a"), F.col("items"))
        .select("item_a", F.explode("items").alias("item_b"))
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("bigint").alias("n"))
        .where(F.col("n") >= int(min_count))
    )
    return pairs.crossJoin(F.broadcast(n_groups)).select(
        "item_a",
        "item_b",
        "n",
        (
            F.round(F.col("n").cast("double") / F.col("_ng") * 1_000_000)
            / 1_000_000
        ).alias("support"),
    )


def fpgrowth_itemsets(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: float = 0.001,
    max_items: "int | None" = 10_000,
) -> DataFrame:
    """Frequent itemsets of ANY size via MLlib FP-Growth (distributed
    FP-tree; the parallel PFP formulation shards the tree by item).
    Returns ``(items array, freq)``. The size-2 slice must equal
    :func:`frequent_pairs` at the matching threshold — that equivalence
    is this operator's correctness pin (tests/test_baskets.py)."""
    from pyspark.ml.fpm import FPGrowth

    baskets = baskets_of(df, group_col, item_col, max_items=max_items)
    model = FPGrowth(
        itemsCol="items", minSupport=float(min_support), minConfidence=0.1
    ).fit(baskets)
    return model.freqItemsets
