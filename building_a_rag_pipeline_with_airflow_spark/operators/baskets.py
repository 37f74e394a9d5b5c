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

Scale notes: basket width is the fan-out bound — cap items-per-group
upstream for heavy-tailed baskets (the same guard discussed at
``cooccurrence_edges`` and ``linkage.blocked_fuzzy_pairs``). The group
count used for support fractions is a one-row aggregate broadcast back
in-plan, not a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def baskets_of(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """(group, items array) baskets with per-group distinct items — the
    shared input shape for both tiers."""
    return (
        df.select(group_col, item_col)
        .groupBy(group_col)
        .agg(F.collect_set(item_col).alias("items"))
    )


def frequent_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 2,
) -> DataFrame:
    """Exact frequent pairs: ``(item_a, item_b, n, support)`` for every
    unordered item pair co-appearing in ≥ ``min_count`` distinct groups;
    ``support`` = n / total groups. One shuffle for the baskets, a
    map-side ordered-pair explode, one counting aggregate."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    sets = baskets_of(df, group_col, item_col)
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
) -> DataFrame:
    """Frequent itemsets of ANY size via MLlib FP-Growth (distributed
    FP-tree; the parallel PFP formulation shards the tree by item).
    Returns ``(items array, freq)``. The size-2 slice must equal
    :func:`frequent_pairs` at the matching threshold — that equivalence
    is this operator's correctness pin (tests/test_baskets.py)."""
    from pyspark.ml.fpm import FPGrowth

    baskets = baskets_of(df, group_col, item_col)
    model = FPGrowth(
        itemsCol="items", minSupport=float(min_support), minConfidence=0.1
    ).fit(baskets)
    return model.freqItemsets
