"""Recommender tests: deterministic co-occurrence top-k semantics, and
the ALS behavioral pin (held-in positives must out-score random
negatives — the factorization itself is a seeded library internal).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark import schemas
from building_a_rag_pipeline_with_airflow_spark.operators import recommend


def test_cooccurrence_recommend_topk_and_ties(spark):
    rows = []
    # a co-occurs with b in 3 baskets, with c in 2, with d in 1
    for i, other in enumerate(["b", "b", "b", "c", "c", "d"]):
        rows += [(f"o{i}", "a"), (f"o{i}", other)]
    df = spark.createDataFrame(rows, "g string, i string")
    recs = {
        (r.item, r.rank): (r.rec, r.n)
        for r in recommend.cooccurrence_recommend(
            df, "g", "i", k=2, min_count=1
        ).collect()
    }
    assert recs[("a", 1)] == ("b", 3)
    assert recs[("a", 2)] == ("c", 2)
    assert ("a", 3) not in recs  # k=2 cap


def test_interactions_preaggregate(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.0), (1, "x", 3.0), (2, "x", 1.0)], "u int, i string, q double"
    )
    out = {
        (r.user, r.item): r.strength
        for r in recommend.interactions_of(df, "u", "i", "q").collect()
    }
    assert out == {(1, "x"): 5.0, (2, "x"): 1.0}


def test_als_positives_outscore_negatives(spark, sf_dir):
    li = schemas.load_table(spark, sf_dir, "lineitem")
    orders = schemas.load_table(spark, sf_dir, "orders")
    inter = recommend.interactions_of(
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")),
        "o_custkey",
        "l_partkey",
    )
    from pyspark.ml.recommendation import ALS

    als = ALS(
        userCol="user", itemCol="item", ratingCol="strength",
        implicitPrefs=True, rank=8, maxIter=5, seed=7,
        coldStartStrategy="drop",
    )
    model = als.fit(
        inter.select(F.col("user").cast("int"), F.col("item").cast("int"), "strength")
    )
    pos = inter.select(
        F.col("user").cast("int"), F.col("item").cast("int")
    ).limit(200)
    # negatives: shift each user's item by a large offset mod the item
    # space — overwhelmingly non-interacted pairs
    neg = pos.select(
        "user", ((F.col("item") + 97) % 200).cast("int").alias("item")
    ).join(inter.select(F.col("user").cast("int"), F.col("item").cast("int")),
           ["user", "item"], "left_anti")
    p = model.transform(pos).agg(F.avg("prediction")).first()[0]
    n = model.transform(neg).agg(F.avg("prediction")).first()[0]
    assert p is not None and n is not None
    assert p > n  # held-in positives must out-score non-interactions
    recs = recommend.als_recommend(inter, k=3, rank=8, max_iter=5)
    by_user = recs.groupBy("user").count().agg(F.max("count")).first()[0]
    assert by_user == 3
