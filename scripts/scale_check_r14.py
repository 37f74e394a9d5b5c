"""r14 scale spot-check: the classifier-gated capstone at the REAL
deployment shape (r13 judge directive #4).

The r13 check replicated the whole corpus, so the labeled holdout grew
25× alongside production — flattering to the fit/threshold stages,
whose cost is label-budget-scale by design. A real deployment labels a
FIXED holdout once and gates an ever-growing production corpus, with
the positive class at its natural rate (the synthetic corpus's 'dup'
marker sits at ~5%, and replication preserves that skew — positives are
not rebalanced). This script pins that shape:

* **fit** — the 1× corpus's doc_id-mod-5 = 3 slice, scored once; the
  label budget NEVER grows with the multiplier.
* **prod** — the mod-5 = 4 slice replicated 1×/5×/25× with disjoint
  doc_ids, scored through the same NB + algebraic-sigmoid chain (the
  data-scale part).
* **claim** — `classifier_gate`'s fit + threshold-pick stages are flat
  (they only ever see the fixed holdout: ≤ n_bins mapping rows + a
  1-row pick), the production stamp is one broadcast bin-lookup join
  whose cost tracks the scored scan, and the 0.9 precision floor stays
  reachable at skew (no unreachable-floor raise, no empty-fit raise —
  holdout bins missing from production fall back to identity, the
  documented path).

Usage: python scripts/scale_check_r14.py [sf_dir]
(default /root/testdata/sf0.1). Best-of-3 warm timings, own session.
Results recorded in bench.py's r14 notes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from building_a_rag_pipeline_with_airflow_spark import get_spark
    from building_a_rag_pipeline_with_airflow_spark.operators import curation

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="scale-check-r14",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    lab0 = docs0.withColumn(
        "y",
        F.arrays_overlap(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            F.array(F.lit("dup")),
        ).cast("int"),
    )
    train = lab0.where(F.col("doc_id") % 5 <= 2).select(
        "doc_id",
        "text",
        F.when(F.col("y") == 1, "pos").otherwise("neg").alias("_cls"),
    )
    holdout = lab0.where(F.col("doc_id") % 5 == 3)
    prod0 = lab0.where(F.col("doc_id") % 5 == 4)
    n_hold = holdout.count()
    pos_rate = holdout.agg(F.avg("y")).collect()[0][0]
    print(
        f"fixed holdout: {n_hold} docs, positive rate {pos_rate:.4f} "
        "(the natural skew — never rebalanced)"
    )

    # score the FIXED holdout once; this frame never changes with mult
    fit = (
        curation.margin_to_probability(
            curation.nb_domain_classify(
                train, holdout, label_col="_cls", alpha=0.05
            ),
            positive="pos",
        )
        .join(holdout.select("doc_id", "y"), "doc_id")
        .select("p", "y")
        .localCheckpoint(eager=True)
    )

    for mult in (1, 5, 25):
        reps = [
            prod0.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text",
                "lang",
            )
            for i in range(mult)
        ]
        prod = reps[0]
        for r in reps[1:]:
            prod = prod.unionByName(r)
        n_prod = prod.count()

        def run_all():
            nb = curation.nb_domain_classify(
                train, prod, label_col="_cls", alpha=0.05
            )
            scored = (
                curation.margin_to_probability(nb, positive="pos")
                .select("doc_id", "p")
                .localCheckpoint(eager=False)
            )
            t0 = time.time()
            scored.count()  # the data-scale NB score pass
            t_score = time.time() - t0
            t0 = time.time()
            gated, thr = curation.classifier_gate(
                scored, fit, "p", "y",
                min_precision=0.9, n_bins=10, decimals=2,
            )
            t_fitpick = time.time() - t0  # fit mapping + threshold pick
            t0 = time.time()
            n_flagged = gated.where("keep").count()
            t_stamp = time.time() - t0  # broadcast bin-lookup + stamp
            return t_score, t_fitpick, t_stamp, thr, n_flagged

        run_all()  # warm
        t_score, t_fitpick, t_stamp, thr, n_flagged = min(
            (run_all() for _ in range(3)), key=lambda p: p[0] + p[1] + p[2]
        )
        print(
            f"capstone-skew mult={mult:2d} prod_rows={n_prod:7d} "
            f"score_stage={t_score:.2f}s fit+pick={t_fitpick:.2f}s "
            f"stamp={t_stamp:.2f}s thr={thr} flagged={n_flagged}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
