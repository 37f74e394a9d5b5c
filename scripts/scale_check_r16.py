"""r16 scale spot-check: stamp-state compaction (`compact_stamp_state`).

The r15 round left the streamed classifier stamp with one declared decay
path (VERDICT r15 "What's missing" #3): one ``_batch_id`` partition (one
file, ``coalesce(1)``) per non-empty micro-batch, forever — so the read
side degrades on FILE COUNT alone, long before verdict-row volume
matters. ``compact_stamp_state`` (new r16) closes it with a
concatenation fold. The claims this script measures (bench.py r16
notes):

* **uncompacted read cost grows with batch count at fixed rows** — the
  listing + many-small-files tax, the decay compaction exists to stop;
* **compacted read cost is batch-count independent** — one base
  partition, sized from source bytes, regardless of how many batches
  were folded;
* **compaction cost tracks verdict rows, not batch count** — the fold
  is a verbatim rewrite (no shuffle beyond the file re-layout), so
  folding 64 batches of N total rows costs ~the same as 16 batches of
  N total rows, and 25× the rows costs ~linearly more;
* **post-compaction the stamp keeps working** — a new batch under the
  original checkpoint lands beside the base (replay-idempotence is
  pinned in tests; here we confirm the count and the report).

Inputs are deterministic (hash-derived scores over the sf documents
table, replicated with disjoint ids — no NB train needed: compaction
mechanics are independent of how scores were produced). Batches are
produced in ONE drain via ``maxFilesPerTrigger=1`` over pre-split
landing files, so the per-restart frozen-state constant (measured in
scale_check_r15) doesn't swamp the batch-count axis.

Usage: python scripts/scale_check_r16.py [sf_dir]
(default /root/testdata/sf0.1). Results recorded in bench.py's r16
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
    from building_a_rag_pipeline_with_airflow_spark.streaming import (
        ingest as ing,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="scale-check-r16",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # deterministic scores spread over the 10 bins: a Knuth-hash
    # fraction of doc_id; labels make a 0.9 precision floor reachable
    # (every bin >= 0.6 is all-positive)
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .withColumn(
            "p",
            ((F.col("doc_id") * F.lit(2654435761)) % 1000) / F.lit(1000.0),
        )
    )
    fit = base.select(
        "p",
        F.when(F.col("p") >= 0.6, 1)
        .otherwise((F.col("doc_id") % 17 == 0).cast("int"))
        .alias("y"),
    )
    n_base = base.count()

    def replicated(mult):
        reps = [
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "p",
            )
            for i in range(mult)
        ]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        return out

    def stamp_in_batches(prod, k):
        """Land prod as k files, drain as k micro-batches in ONE query
        (maxFilesPerTrigger=1), return (root, state, ck, drain_s)."""
        root = tempfile.mkdtemp(prefix="stamp_c16_")
        state, ck = f"{root}/state", f"{root}/ck"
        prod.repartition(k).write.parquet(f"{root}/land/d0")
        schema = spark.read.parquet(f"{root}/land/d0").schema
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{root}/land/*")
        )
        t0 = time.time()
        q = ing.streaming_classifier_stamp(
            raw, fit, state, ck, min_precision=0.9, n_bins=10, decimals=2,
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("drain exceeded 600 s")
        return root, state, ck, round(time.time() - t0, 2)

    def timed_read(state):
        times = []
        for _ in range(3):
            t0 = time.time()
            n = ing.read_stamped_assignments(spark, state).count()
            times.append(time.time() - t0)
        return round(sorted(times)[1], 2), n

    # ---- batch-count axis at fixed rows (mult=25): read decay + cure
    mult = 25
    prod = replicated(mult)
    n_rows = n_base * mult
    for k in (16, 64):
        root, state, ck, drain_s = stamp_in_batches(prod, k)
        rep = {
            r["subdir"]: r
            for r in ing.gate_state_report(spark, state).collect()
        }
        read_u, n_u = timed_read(state)
        comp = f"{root}/state_c"
        t0 = time.time()
        ing.compact_stamp_state(spark, state, comp)
        comp_s = round(time.time() - t0, 2)
        rep_c = {
            r["subdir"]: r
            for r in ing.gate_state_report(spark, comp).collect()
        }
        read_c, n_c = timed_read(comp)
        assert n_u == n_c == n_rows, (n_u, n_c, n_rows)
        # one more batch under the ORIGINAL checkpoint lands beside
        # the base and the read sees it
        extra = base.select(
            (F.col("doc_id") + F.lit(mult * 10_000_000)).alias("doc_id"),
            "p",
        )
        extra.coalesce(1).write.parquet(f"{root}/land/d1")
        schema = spark.read.parquet(f"{root}/land/d0").schema
        raw = spark.readStream.schema(schema).parquet(f"{root}/land/*")
        q = ing.streaming_classifier_stamp(
            raw, fit, comp, ck, min_precision=0.9, n_bins=10, decimals=2,
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("post-compaction drain exceeded 600 s")
        n_after = ing.read_stamped_assignments(spark, comp).count()
        assert n_after == n_rows + n_base, (n_after, n_rows, n_base)
        print(
            f"batch-count k={k:2d} rows={n_rows}: drain={drain_s}s "
            f"files_uncompacted={rep['batches']['n_files']} "
            f"read_uncompacted={read_u}s compact={comp_s}s "
            f"files_compacted={rep_c['batches']['n_files']} "
            f"read_compacted={read_c}s "
            f"(new batch post-compaction: +{n_base} verdicts ok)"
        )
        shutil.rmtree(root, ignore_errors=True)

    # ---- row axis at fixed batch count (k=16): compaction cost ~ rows
    for mult in (1, 5, 25):
        prod = replicated(mult)
        root, state, ck, drain_s = stamp_in_batches(prod, 16)
        comp = f"{root}/state_c"
        t0 = time.time()
        ing.compact_stamp_state(spark, state, comp)
        comp_s = round(time.time() - t0, 2)
        read_c, n_c = timed_read(comp)
        assert n_c == n_base * mult
        print(
            f"row-scale mult={mult:2d} rows={n_base * mult}: "
            f"compact={comp_s}s read_compacted={read_c}s"
        )
        shutil.rmtree(root, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
