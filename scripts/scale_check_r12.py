"""r12 gate-state compaction payoff measurement.

The compaction op's claim is O(batches): a gate's read-side fold rescans
every `_batch_id` partition ever written, so read cost grows with
accumulated batch count while the compacted base pays one partition at
the deduplicated row count. The 2-batch measurement in bench.py's r12
notes is necessarily flat — this script makes the curve visible by
streaming the sf0.1 documents table into the duplication gate as MANY
micro-batches (one per doc_id residue class), then timing the fold at
increasing accumulated batch counts, against the compacted fold and
the batch operator over the same accumulated rows.

Usage: python scripts/scale_check_r12.py [sf_dir] [n_batches]
(defaults: /root/testdata/sf0.1, 12). Prints one line per checkpoint.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, reps: int = 3) -> float:
    fn()  # warm
    best = min(_run_once(fn) for _ in range(reps))
    return best


def _run_once(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from building_a_rag_pipeline_with_airflow_spark import get_spark
    from building_a_rag_pipeline_with_airflow_spark.streaming import ingest

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark(
        app_name="scale-check-r12",
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
    root = tempfile.mkdtemp(prefix="r12_compact_curve_")
    state, ck = f"{root}/state", f"{root}/ck"
    schema = docs.schema

    def drain():
        raw = spark.readStream.schema(schema).parquet(f"{root}/land/*")
        ingest.streaming_duplication_profile(
            raw, state, ck, k=8, bands=(2, 3, 10)
        ).awaitTermination(600)

    for i in range(n_batches):
        docs.where(F.col("doc_id") % n_batches == i).write.parquet(
            f"{root}/land/d{i}"
        )
        drain()
        accumulated = i + 1
        if accumulated in (2, 4, 8, n_batches):
            t_fold = _timed(
                lambda: ingest.read_duplication_profile(spark, state).collect()
            )
            cpath = f"{root}/c{accumulated}/state"
            t0 = time.time()
            ingest.compact_duplication_state(spark, state, cpath)
            t_compact = time.time() - t0
            t_cfold = _timed(
                lambda: ingest.read_duplication_profile(spark, cpath).collect()
            )
            # equality is the compaction-leg contract; assert it here too
            a = sorted(
                tuple(r)
                for r in ingest.read_duplication_profile(spark, state).collect()
            )
            b = sorted(
                tuple(r)
                for r in ingest.read_duplication_profile(spark, cpath).collect()
            )
            assert a == b, f"compacted fold diverged at {accumulated} batches"
            print(
                f"batches={accumulated:3d}  fold_uncompacted={t_fold:6.2f}s  "
                f"compact_once={t_compact:5.2f}s  fold_compacted={t_cfold:5.2f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
