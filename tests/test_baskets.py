"""Market-basket tests: exact frequent_pairs semantics and the
FP-Growth size-2 equivalence pin. Value parity vs DuckDB is covered by
tests/test_oracle_parity.py (frequent_part_pairs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark import schemas
from building_a_rag_pipeline_with_airflow_spark.operators import baskets


def test_frequent_pairs_counts_distinct_groups(spark):
    df = spark.createDataFrame(
        [
            ("o1", "a"), ("o1", "b"), ("o1", "b"),  # duplicate item in basket
            ("o2", "a"), ("o2", "b"),
            ("o3", "a"), ("o3", "c"),
        ],
        "g string, i string",
    )
    out = {
        (r.item_a, r.item_b): (r.n, r.support)
        for r in baskets.frequent_pairs(df, "g", "i", min_count=2).collect()
    }
    # (a,b) in o1+o2 = 2 groups (o1's duplicate b doesn't inflate); 3 baskets
    assert out == {("a", "b"): (2, pytest.approx(2 / 3, abs=1e-6))}


def test_frequent_pairs_rejects_bad_threshold(spark):
    df = spark.createDataFrame([("g", "i")], "g string, i string")
    with pytest.raises(ValueError):
        baskets.frequent_pairs(df, "g", "i", min_count=0)


def test_fpgrowth_size2_equals_frequent_pairs(spark, sf_dir):
    """The MLlib FP-Growth path and the exact pair operator must agree on
    every size-2 itemset at the same support threshold — this is the
    general path's correctness pin against the oracled exact tier."""
    li = schemas.load_table(spark, sf_dir, "lineitem")
    n_orders = li.select("l_orderkey").distinct().count()
    min_count = 2
    exact = {
        (r.item_a, r.item_b): r.n
        for r in baskets.frequent_pairs(
            li, "l_orderkey", "l_partkey", min_count=min_count
        ).collect()
    }
    fp = baskets.fpgrowth_itemsets(
        li, "l_orderkey", "l_partkey",
        # strictly-greater-safe: FPGrowth keeps itemsets with freq >=
        # ceil(minSupport * n); pick the fraction that lands exactly on
        # min_count
        min_support=(min_count - 0.5) / n_orders,
    )
    got = {
        tuple(sorted(r["items"])): r["freq"]
        for r in fp.where(F.size("items") == 2).collect()
    }
    assert got == exact
    assert len(exact) > 0


def test_baskets_max_items_drops_wide_basket(spark):
    """The enforced fan-out cap: a basket wider than max_items is DROPPED
    (the linkage.max_block contract), and the survivors' pairs/support
    are computed over the remaining baskets only."""
    rows = [("wide", f"i{k}") for k in range(6)]
    rows += [("o1", "a"), ("o1", "b"), ("o2", "a"), ("o2", "b")]
    df = spark.createDataFrame(rows, "g string, i string")
    out = {
        (r.item_a, r.item_b): (r.n, r.support)
        for r in baskets.frequent_pairs(
            df, "g", "i", min_count=2, max_items=5
        ).collect()
    }
    # the 6-item basket is gone; support denominator = 2 surviving baskets
    assert out == {("a", "b"): (2, pytest.approx(1.0, abs=1e-6))}
    # uncapped, the wide basket contributes pairs and the denominator is 3
    full = baskets.frequent_pairs(df, "g", "i", min_count=2, max_items=None)
    assert {(r.item_a, r.item_b) for r in full.collect()} == {("a", "b")}
    assert full.first().support == pytest.approx(2 / 3, abs=1e-6)


def test_baskets_default_cap_leaves_bounded_input_unchanged(spark):
    df = spark.createDataFrame(
        [("o1", "a"), ("o1", "b"), ("o2", "a"), ("o2", "b")], "g string, i string"
    )
    capped = baskets.frequent_pairs(df, "g", "i", min_count=2).collect()
    uncapped = baskets.frequent_pairs(
        df, "g", "i", min_count=2, max_items=None
    ).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))
