"""r13 scale spot-check: the streaming threshold-curve gate and the
classifier-gated curation capstone.

Claims under test (both from the operators' own scale contracts):

1. **Threshold gate fold is O(grid), not O(data or batches)** — the
   state is ≤ 10^decimals + 1 partial rows per batch, so
   `read_threshold_curve` over N accumulated batches folds
   grid × N metadata rows: the fold should stay flat as the SAME
   scored corpus arrives split into 2/4/8/16 micro-batches, and the
   compacted fold should match it (file hygiene, not read-cost, is
   the payoff at metadata scale). Fold ≡ batch `threshold_curve`
   asserted at every checkpoint.

2. **Capstone cost is the NB scan, not the gate** — the calibration
   fit/apply and threshold pick are metadata-scale (≤ n_bins mapping
   rows, ≤ grid+1 curve rows, 1-row pick) regardless of corpus size,
   so `classifier_gate` end-to-end over a corpus replicated 5×/25×
   (disjoint doc_ids, localCheckpoint-pinned scored frame — the same
   isolation the registry row uses) should grow ~linearly with the
   scan, with the gate stages contributing a flat constant. Reported
   split: scored-frame materialization vs gate-only time.

Usage: python scripts/scale_check_r13.py [sf_dir]
(default /root/testdata/sf0.1). Best-of-3 warm timings, own session.
Results recorded in bench.py's r13 notes.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _best3(fn) -> float:
    fn()  # warm
    times = []
    for _ in range(3):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


def main() -> None:
    from pyspark.sql import functions as F

    from building_a_rag_pipeline_with_airflow_spark import get_spark
    from building_a_rag_pipeline_with_airflow_spark.operators import (
        curation,
        evaluation,
    )
    from building_a_rag_pipeline_with_airflow_spark.streaming import ingest

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="scale-check-r13",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # ---- 1. threshold-gate fold vs accumulated batch count ----------
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    mx = orders.agg(F.max("o_totalprice").alias("_m"))
    scored = orders.crossJoin(F.broadcast(mx)).select(
        "o_orderkey",
        (F.col("o_totalprice") / F.col("_m")).alias("p"),
        F.when(
            F.substring("o_orderpriority", 1, 1).isin("1", "2"), 1
        ).otherwise(0).alias("y"),
    )
    expected = [
        tuple(r)
        for r in evaluation.threshold_curve(
            scored.drop("o_orderkey"), "p", "y", decimals=2
        ).collect()
    ]
    for n_batches in (2, 4, 8, 16):
        root = tempfile.mkdtemp(prefix="r13_thr_curve_")
        state, ck = f"{root}/state", f"{root}/ck"
        for i in range(n_batches):
            scored.where(F.col("o_orderkey") % n_batches == i).drop(
                "o_orderkey"
            ).coalesce(1).write.parquet(f"{root}/land/d{i}")
            raw = spark.readStream.schema("p double, y int").parquet(
                f"{root}/land/*"
            )
            ingest.streaming_threshold_curve(
                raw, state, ck, decimals=2
            ).awaitTermination(300)
        got = [
            tuple(r) for r in ingest.read_threshold_curve(spark, state).collect()
        ]
        assert got == expected, f"fold != batch at {n_batches} batches"
        t_fold = _best3(
            lambda: ingest.read_threshold_curve(spark, state).collect()
        )
        compacted = f"{root}/state_c"
        t0 = time.time()
        ingest.compact_threshold_state(spark, state, compacted)
        t_compact = time.time() - t0
        assert [
            tuple(r)
            for r in ingest.read_threshold_curve(spark, compacted).collect()
        ] == expected
        t_cfold = _best3(
            lambda: ingest.read_threshold_curve(spark, compacted).collect()
        )
        print(
            f"thr_gate batches={n_batches:2d} fold={t_fold:.2f}s "
            f"compacted_fold={t_cfold:.2f}s compact_once={t_compact:.2f}s"
        )

    # ---- 2. capstone at 1x / 5x / 25x corpus ------------------------
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n0 = docs0.count()
    for mult in (1, 5, 25):
        reps = [
            docs0.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text",
                "lang",
            )
            for i in range(mult)
        ]
        docs = reps[0]
        for r in reps[1:]:
            docs = docs.unionByName(r)
        lab = docs.withColumn(
            "y",
            F.arrays_overlap(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                F.array(F.lit("dup")),
            ).cast("int"),
        )
        train = lab.where(F.col("doc_id") % 5 <= 2).select(
            "doc_id",
            "text",
            F.when(F.col("y") == 1, "pos").otherwise("neg").alias("_cls"),
        )
        rest = lab.where(F.col("doc_id") % 5 >= 3)

        def run_all():
            nb = curation.nb_domain_classify(
                train, rest, label_col="_cls", alpha=0.05
            )
            sc = (
                curation.margin_to_probability(nb, positive="pos")
                .join(rest.select("doc_id", "lang", "y"), "doc_id")
                .localCheckpoint(eager=False)
            )
            fit = sc.where(F.col("doc_id") % 5 == 3)
            prod = sc.where(F.col("doc_id") % 5 == 4)
            t_sc0 = time.time()
            fit.count()  # materializes the checkpointed scored frame
            t_score = time.time() - t_sc0
            t_g0 = time.time()
            gated, _thr = curation.classifier_gate(
                prod, fit, "p", "y",
                min_precision=0.9, n_bins=10, decimals=2,
            )
            gated.groupBy("lang").count().collect()
            t_gate = time.time() - t_g0
            return t_score, t_gate

        run_all()  # warm
        t_score, t_gate = min(
            (run_all() for _ in range(3)), key=lambda p: p[0] + p[1]
        )
        print(
            f"capstone mult={mult:2d} rows={n0 * mult:6d} "
            f"score_stage={t_score:.2f}s gate_stages={t_gate:.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
