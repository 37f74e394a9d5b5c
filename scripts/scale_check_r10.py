"""r10 one-off hash-tier comparison: ExactSubstr md5 vs rolling at k=50.

The r9 verdict's remaining design-level cost on the substring rung was
the md5 tier's O(n·k) window-text materialization (concat+digest of k
tokens per window — at the paper's k=50 that is ~50x the hash-stage
compute of a per-token scheme; the r9 25x scale check ran at k=8 where
the constant hides). r10 adds the 62-bit Rabin-Karp rolling tier
(`duplicate_substring_spans(hash="rolling")`: per-token xxhash64 once +
one per-doc window-sum pass + exact verify on candidates only); this
script measures the hash-stage win AT k=50 head-to-head.

The sf0.1 synthetic documents run 10-99 tokens, so k=50 windows barely
exist there; a k=50 comparison needs LONG documents. The corpus here
glues consecutive sf0.1 documents into ~1000-token docs (deterministic
grouping by doc_id, text concat in id order — content volume identical
to sf0.1, duplicated-run structure preserved because the planted
near-dup pairs land in nearby groups), then measures spans-only
(the hash stage + count + join + islands; scrub excluded so the rebuild
cost doesn't mask the hash-stage delta) for both tiers at k=50 and k=8,
warm best-of-2 after a per-tier warmup, one session.

Usage: python scripts/scale_check_r10.py   (scratch under
.scale_check_r10/, removed afterwards). Results are recorded in
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
    ".scale_check_r10",
)
DOCS_PER_GROUP = 20  # ~50-token mean docs -> ~1000-token glued docs


def build_long_docs(spark, n_rep: int) -> str:
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    glued = (
        docs.select(
            (F.col("doc_id") / DOCS_PER_GROUP).cast("bigint").alias("gid"),
            "doc_id",
            "text",
        )
        .groupBy("gid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "text"))
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text")
        )
        .select(F.col("gid").alias("doc_id"), "text")
    )
    # organic replicas (the r9 scale_check convention): every replica
    # token gets a _r{r} suffix, so intra-replica duplicated-window
    # structure is preserved while cross-replica windows share nothing —
    # dup mass grows linearly, and the hash-stage volume with it.
    out = None
    for r in range(n_rep):
        if r == 0:
            d = glued
        else:
            d = glued.select(
                (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1_r{r}").alias("text"),
            )
        out = d if out is None else out.unionByName(d)
    out.write.mode("overwrite").parquet(f"{ROOT}/documents.parquet")
    return ROOT


def time_spans(spark, path: str, k: int, hash: str) -> "tuple[float, int]":
    from building_a_rag_pipeline_with_airflow_spark.operators import dedup

    docs = spark.read.parquet(f"{path}/documents.parquet")
    t0 = time.time()
    n = dedup.duplicate_substring_spans(
        docs, k=k, min_count=2, hash=hash
    ).count()
    return time.time() - t0, n


def main() -> None:
    from building_a_rag_pipeline_with_airflow_spark import get_spark

    spark = get_spark(
        app_name="scale-check-r10",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    n_rep = int(os.environ.get("SCALE_CHECK_R10_REPS", "20"))
    try:
        path = build_long_docs(spark, n_rep)
        stats = (
            spark.read.parquet(f"{path}/documents.parquet")
            .select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
            .agg(F.count("*"), F.avg("n"), F.max("n"))
            .first()
        )
        print(f"glued corpus: {stats[0]} docs, avg {stats[1]:.0f} tokens, "
              f"max {stats[2]}")
        for k in (50, 8):
            for hash in ("md5", "rolling"):
                time_spans(spark, path, k, hash)  # warmup
                runs = [time_spans(spark, path, k, hash) for _ in range(2)]
                best, n = min(runs)[0], runs[-1][1]
                print(f"k={k:3d} hash={hash:8s} spans={n:6d} "
                      f"best-of-2 warm: {best:6.2f} s")
    finally:
        spark.stop()
        shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
