"""r11 one-off measurement: the training-order operators at 1x/5x/25x.

epoch_shard_plan and mixture_interleave both claim bounded-task scale
shapes (per-shard window sized by the n_shards knob; grouped
prefix-count over 16^bucket_chars md5-prefix ranges). The sf0.1
documents table (5k rows) is session-overhead-bound (1x and 5x both
read <1 s), so the curve runs on ORDERS (150k rows) replicated 5x/25x
with re-keyed ids (distinct keys → distinct hashes, new content rather
than copies of one hash set), warm best-of-2 in one session.

Measured (local[32], sf0.1 base, this round):

  scale   rows       epoch_shard_plan(32)   mixture_interleave(chars=2)
  1x      150,000    0.77 s                 0.90 s
  5x      750,000    0.62 s                 1.07 s
  25x     3,750,000  1.38 s                 1.84 s

25x data at ~1.8-2.0x wall — fixed per-task overheads amortize and the
md5/shuffle/window cost is linear in rows; no hidden corpus-scale sort
(a per-domain row_number window would have gone super-linear here: the
2-priority weight map concentrates ~40% of rows in one domain).
Knob invariance also checked: bucket_chars 1 vs 3 and n_shards changes
leave the (domain_rank, vtime) assignment byte-identical
(content-addressed), while bounding per-task rows.

Usage: python scripts/scale_check_r11_order.py  (results recorded above
and in bench.py's r11 notes).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"


def timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def replicate(df, times: int):
    """times-fold union with RE-KEYED ids, pinned narrow (2 columns) so
    the measurement sees the operator, not the union re-derivation."""
    out = df
    for i in range(1, times):
        out = out.unionAll(
            df.select(
                (F.col("o_orderkey") + F.lit(i * 100_000_000)).alias(
                    "o_orderkey"
                ),
                "o_orderpriority",
            )
        )
    return out.localCheckpoint(eager=True)


def main() -> None:
    from building_a_rag_pipeline_with_airflow_spark import get_spark
    from building_a_rag_pipeline_with_airflow_spark.operators import sampling

    spark = get_spark(
        app_name="scale_check_r11_order",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from building_a_rag_pipeline_with_airflow_spark.operators import (
        release_checkpoint,
    )

    orders = spark.read.parquet(f"{SRC}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    weights = {"1-URGENT": 3.0, "2-HIGH": 1.5}
    for label, times in (("1x", 1), ("5x", 5), ("25x", 25)):
        frame = replicate(orders, times)
        try:
            n = frame.count()
            t_shard = timed(
                lambda f=frame: sampling.epoch_shard_plan(
                    f, "o_orderkey", 32, seed="e1"
                ).groupBy("shard").agg(F.max("pos")).collect()
            )
            t_mix = timed(
                lambda f=frame: sampling.mixture_interleave(
                    f, "o_orderpriority", weights, "o_orderkey",
                    seed="e1", bucket_chars=2,
                ).agg(F.max("domain_rank"), F.sum("vtime")).collect()
            )
            print(
                f"{label}: rows={n} epoch_shard_plan(32)={t_shard:.2f}s "
                f"mixture_interleave(chars=2)={t_mix:.2f}s"
            )
        finally:
            # Dataset.unpersist() is a no-op on localCheckpoint'd frames;
            # without the release the 25x run times under the 1x and 5x
            # frames' still-pinned blocks — skewing the curve it records
            release_checkpoint(frame)
    # knob invariance: bucket_chars must not change the assignment
    docs = spark.read.parquet(f"{SRC}/documents.parquet").select(
        "doc_id", "lang"
    )
    dw = {"en": 3.0, "de": 1.5, "zh": 0.5}
    a = sampling.mixture_interleave(
        docs, "lang", dw, "doc_id", seed="e1", bucket_chars=1
    )
    b = sampling.mixture_interleave(
        docs, "lang", dw, "doc_id", seed="e1", bucket_chars=3
    )
    da = {r.doc_id: (r.domain_rank, r.vtime) for r in a.collect()}
    db = {r.doc_id: (r.domain_rank, r.vtime) for r in b.collect()}
    print("bucket_chars invariance:", da == db)
    spark.stop()


if __name__ == "__main__":
    main()
