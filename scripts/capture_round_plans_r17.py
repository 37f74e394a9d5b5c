"""Capture the PER-ROUND physical plans of the iterative operators the
r17 optimization round touched (connected_components, pagerank).

The registry rows for these operators return an eagerly-materialized
checkpoint, so `plans/r17/<row>_{before,after}.txt` show only a
`Scan ExistingRDD` — the plan evidence for the round-loop changes lives
here instead: one file per (operator, variant) with the executed round
construction, built through the SAME helpers the operators call (the
`tests/test_scale_plans.py::test_pagerank_round_broadcasts_rank_vector`
pattern — a hand-rederived copy would keep passing if the operator
regressed). The `*_round_before.txt` files reproduce the pre-r17 round
shape verbatim from git history for the diff.

Usage: python scripts/capture_round_plans_r17.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    from pyspark.sql import functions as F

    from building_a_rag_pipeline_with_airflow_spark import get_spark
    from building_a_rag_pipeline_with_airflow_spark.operators import (
        checkpoint_nostats,
        dedup,
        graph,
    )
    from building_a_rag_pipeline_with_airflow_spark.queries import _t

    spark = get_spark(app_name="capture-round-plans-r17")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)

    def dump(name: str, plan: str) -> None:
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}")

    # ---- connected_components round ------------------------------------
    emb = _t(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_near_dups(
        emb, vec_col="embedding", id_col="vec_id",
        threshold=0.4, n_planes=8, n_bands=2, dim=64, seed=42,
    )
    # the operator's own und/labels construction (r17 form)
    und = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .repartition("src")
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = checkpoint_nostats(
        und.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
    )

    # AFTER: one round of the r17 broadcast loop (_cc_rounds_broadcast body)
    b = F.broadcast(labels)
    nm = (
        und.join(b, und["dst"] == labels["node"])
        .groupBy(F.col("src").alias("node"))
        .agg(F.min("component").alias("_c1"))
    )
    own = nm.join(
        b.select(F.col("node").alias("_on"), F.col("component").alias("_own")),
        nm["node"] == F.col("_on"),
    ).select("node", "_own", F.least("_c1", "_own").alias("_c"))
    jumped = own.join(
        b.select(F.col("node").alias("_jn"), F.col("component").alias("_jc")),
        own["_c"] == F.col("_jn"),
        "left",
    ).select(
        "node",
        F.least("_c", F.coalesce("_jc", "_c")).alias("component"),
        (F.least("_c", F.coalesce("_jc", "_c")) < F.col("_own")).alias("_changed"),
    )
    dump("cc_round_after", _explain(jumped))

    # BEFORE: the pre-r17 shuffle round (verbatim shape from git history:
    # neighbor-min join, left join, pointer jump through the NEW frame)
    neighbor_min = (
        und.join(labels, und["dst"] == labels["node"])
        .groupBy(F.col("src").alias("node"))
        .agg(F.min("component").alias("_nbr_min"))
    )
    cand = labels.join(neighbor_min, "node", "left").select(
        "node",
        F.least(
            F.col("component"), F.coalesce("_nbr_min", F.col("component"))
        ).alias("component"),
    )
    old_round = cand.join(
        cand.select(
            F.col("node").alias("component"), F.col("component").alias("_cc")
        ),
        "component",
        "left",
    ).select(
        "node",
        F.least(F.col("component"), F.coalesce("_cc", F.col("component"))).alias(
            "component"
        ),
    )
    dump("cc_round_before", _explain(old_round))

    # ---- pagerank round --------------------------------------------------
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = graph.cooccurrence_edges(li, "l_orderkey", "l_suppkey")
    e = edges.select(
        F.col("src"), F.col("dst"), F.col("w").cast("double").alias("w")
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("wt"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr"))

    # AFTER: the operator's own construction (dst-partitioned norm)
    norm_after = graph._normalized_edges(e, out_w, True)
    contrib = graph._round_contrib(norm_after, ranks, True)
    new_ranks = nodes.join(contrib, "node", "left").select(
        "node",
        (F.lit(0.15 / n) + F.lit(0.85) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("pr"),
    )
    dump("pagerank_round_after", _explain(new_ranks))

    # BEFORE: pre-r17 shape — broadcast branch with UN-partitioned norm
    norm_before = e.join(F.broadcast(out_w), "src").select(
        "src", "dst", (F.col("w") / F.col("wt")).alias("p")
    )
    contrib_b = graph._round_contrib(norm_before, ranks, True)
    new_ranks_b = nodes.join(contrib_b, "node", "left").select(
        "node",
        (F.lit(0.15 / n) + F.lit(0.85) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("pr"),
    )
    dump("pagerank_round_before", _explain(new_ranks_b))


if __name__ == "__main__":
    main()
