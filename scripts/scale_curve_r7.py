"""Scale-curve spot check for the r7 query family (one-off, like
scripts/scale_curve.py whose organic-replication rules it reuses).

Covers the five oracle queries added in r7 — data-contract expectations,
snapshot table diff, DSIR importance weights, the NB domain classifier,
and embedding drift — at sf0.1 vs a 5x organic replication:

* documents: token-suffixed replicas (scale_curve's `sfx` rule) — for
  DSIR/NB this is organic VOCABULARY growth (suffixed tokens hash to
  fresh md5 buckets), with per-replica lang/label structure preserved;
  replica id offsets are ≡ 0 mod 5 so the NB labeled-slice fraction is
  unchanged.
* embeddings: md5-derived pseudo-random replicas (scale_curve's rule);
  offsets are even so the drift query's %2 snapshot split keeps its
  shape.
* orders: key-offset replicas — five disjoint copies of the order book;
  the %5/%7/%11 slices land in different residue classes per replica,
  which is organic workload growth, not degenerate duplication.

All five plans are single-agg / broadcast-model / one-key-join shapes,
so the expectation is ratios well under 5 (fixed session overhead
dominates at this size); a superlinear row would flag a hidden
all-pairs/window. Results recorded in bench.py's docstring tail.

Usage: python scripts/scale_curve_r7.py (scratch under .scale_check/,
removed afterwards).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_check"
)
N_REP = 5

QUERIES = [
    "expectations_orders",
    "table_diff_orders_snapshots",
    "dsir_weights_documents",
    "nb_lang_classify_documents",
    "embedding_drift_snapshots",
]


def build_scaled(spark) -> str:
    out = f"{ROOT}/r7"
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")

    def union_replicas(make):
        frames = [make(r) for r in range(N_REP)]
        u = frames[0]
        for d in frames[1:]:
            u = u.unionByName(d)
        return u

    def mk_docs(r):
        if r == 0:
            return docs
        t = F.regexp_replace("text", r"(\S+)", f"$1_r{r}")
        return docs.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
            t.alias("text"),
            "lang",
            "source",
            F.length(t).alias("n_chars"),
        )

    union_replicas(mk_docs).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    def mk_emb(r):
        if r == 0:
            return emb
        rnd = F.expr(
            "transform(sequence(1, 64), i -> cast("
            f"  (conv(substring(md5(concat(cast(vec_id as string), '_{r}_', cast(i as string))), 1, 8), 16, 10) % 100000) / 50000.0 - 1.0"
            " as float))"
        )
        return emb.select(
            (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
            rnd.alias("embedding"),
            "label",
        )

    union_replicas(mk_emb).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )

    def mk_orders(r):
        return orders.select(
            (F.col("o_orderkey") + r * 10_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + r * 10_000_000).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )

    union_replicas(mk_orders).write.mode("overwrite").parquet(
        f"{out}/orders.parquet"
    )
    return out


def main() -> None:
    from building_a_rag_pipeline_with_airflow_spark import get_spark
    from building_a_rag_pipeline_with_airflow_spark.queries import REGISTRY

    spark = get_spark(
        app_name="scale-curve-r7",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    if os.path.isdir(ROOT):
        shutil.rmtree(ROOT)
    print("building 5x data...", flush=True)
    scaled = build_scaled(spark)

    def run(name, sf_dir, repeats=2):
        fn, _ = REGISTRY[name]
        best = None
        for _ in range(repeats):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    print(f"{'query':34s} {'sf0.1':>8s} {'5x':>8s} {'ratio':>6s}")
    for name in QUERIES:
        run(name, SRC, repeats=1)       # untimed warmup at each scale
        run(name, scaled, repeats=1)    # (scale_curve's JIT-fairness rule)
        t1 = run(name, SRC)
        t5 = run(name, scaled)
        print(f"{name:34s} {t1:8.2f} {t5:8.2f} {t5 / t1:6.2f}", flush=True)
    shutil.rmtree(ROOT)
    spark.stop()


if __name__ == "__main__":
    main()
