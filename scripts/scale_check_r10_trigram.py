"""r10 one-off scale point for the durable trigram index: in-plan vs
from-index query cost at 1x and 5x corpus.

`trigram_topk` re-gram-explodes its corpus and recounts gram document
frequencies per QUERY WORKLOAD; `trigram_topk_from_index` reads stored
postings with the stop-gram guard pushed as a parquet predicate. At
sf0.1 the two tie (~1.1 s each, bench r10 notes) because the corpus
gram-explode is small; this script measures where the index starts
paying. The sf0.1 part table collapses to only 64 DISTINCT names
(TPC-H names are 5-color-word draws), so the replication factors here
are 1000x and 5000x — 64k / 320k distinct names, realistic lookup-
corpus sizes (distinct name_ids, a per-replica name suffix so gram
sets stay name-like but replicas aren't byte dups), same 20-query
workload, warm best-of-2 after a per-variant warmup, one session. Build time is reported separately: it is paid
once, the query cost per workload is the service-path number.

Usage: python scripts/scale_check_r10_trigram.py  (scratch under
.scale_check_r10_trigram/, removed afterwards). Results recorded in
bench.py's r10 notes.
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
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_check_r10_trigram",
)


def build_corpus(spark, n_rep: int):
    part = spark.read.parquet(f"{SRC}/part.parquet")
    base = (
        part.groupBy("p_name")
        .agg(F.min("p_partkey").alias("name_id"))
        .select("name_id", F.col("p_name").alias("name"))
    )
    if n_rep == 1:
        return base
    reps = spark.range(n_rep).select(F.col("id").alias("_r"))
    offset = 10_000_000
    return base.crossJoin(reps).select(
        (F.col("name_id") + F.col("_r") * offset).alias("name_id"),
        F.when(F.col("_r") == 0, F.col("name")).otherwise(
            F.concat(F.col("name"), F.lit(" rev "), F.col("_r").cast("string"))
        ).alias("name"),
    )


def queries_df(spark):
    part = spark.read.parquet(f"{SRC}/part.parquet")
    return part.where(F.col("p_partkey") <= 20).select(
        F.col("p_partkey").alias("q_id"),
        F.expr("substring(p_name, 3)").alias("q_text"),
    )


def timed(fn, reps: int = 2) -> float:
    fn()  # warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    from building_a_rag_pipeline_with_airflow_spark import get_spark
    from building_a_rag_pipeline_with_airflow_spark.operators import linkage

    spark = get_spark(
        app_name="scale-check-r10-trigram",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    os.makedirs(ROOT, exist_ok=True)
    q = queries_df(spark).localCheckpoint(eager=True)
    try:
        for n_rep in (1000, 5000):
            corpus_path = f"{ROOT}/corpus_{n_rep}x"
            build_corpus(spark, n_rep).write.mode("overwrite").parquet(
                corpus_path
            )
            corpus = spark.read.parquet(corpus_path)
            n = corpus.count()

            t_inplan = timed(
                lambda: linkage.trigram_topk(q, corpus, k=5).collect()
            )

            idx = f"{ROOT}/idx_{n_rep}x"
            t0 = time.time()
            linkage.build_trigram_index(corpus, idx)
            t_build = time.time() - t0
            t_index = timed(
                lambda: linkage.trigram_topk_from_index(
                    spark, idx, q, k=5
                ).collect()
            )
            print(
                f"{n_rep}x: corpus={n} in-plan={t_inplan:.2f}s "
                f"from-index={t_index:.2f}s (build once: {t_build:.1f}s)"
            )
    finally:
        shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
