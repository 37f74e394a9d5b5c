"""r9 one-off scale spot-check: the exact duplicated-substring rung.

Measures substring_dedup_documents at sf0.1 vs 5x organically-replicated
documents (the scale_curve.py `sfx` mode: every replica token gets a
``_r{r}`` suffix, so intra-replica duplicated-window structure is
preserved exactly while cross-replica windows share nothing — dup mass
grows linearly with the corpus, which IS the organic scaling for an
exact-substring scrub). Expected: ~linear (the plan is windows → one
count agg → equi-join → per-doc islands; nothing quadratic anywhere).

Per the round-workflow rule, a superlinear headline here must be
stage-split before recording; the script prints the per-stage split
(spans-only vs full scrub) alongside the headline for that purpose.

Usage: python scripts/scale_check_r9.py  (scratch under .scale_check_r9/,
removed afterwards; best-of-2 after per-scale warmup, one session).
Results are recorded in bench.py's docstring tail.
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
    ".scale_check_r9",
)
N_REP = 5


def build_scaled(spark) -> str:
    docs = spark.read.parquet(f"{SRC}/documents.parquet")

    def mk(r):
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

    out = None
    for r in range(N_REP):
        d = mk(r)
        out = d if out is None else out.unionByName(d)
    out.write.mode("overwrite").parquet(f"{ROOT}/documents.parquet")
    return ROOT


def best_of_2(fn):
    runs = []
    for _ in range(2):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return min(runs)


def main() -> None:
    from building_a_rag_pipeline_with_airflow_spark import get_spark
    from building_a_rag_pipeline_with_airflow_spark.operators import dedup
    from building_a_rag_pipeline_with_airflow_spark.queries import REGISTRY

    spark = get_spark(
        app_name="scale-check-r9",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    if os.path.isdir(ROOT):
        shutil.rmtree(ROOT)
    print("building 5x documents...", flush=True)
    build_scaled(spark)

    fn = REGISTRY["substring_dedup_documents"][0]
    rows = []
    for label, sf_dir in (("sf0.1", SRC), ("5x", ROOT)):
        fn(spark, sf_dir).collect()  # warmup
        full = best_of_2(lambda: fn(spark, sf_dir).collect())
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        spans_only = best_of_2(
            lambda: dedup.duplicate_substring_spans(docs, k=8).collect()
        )
        rows.append((label, full, spans_only))
        print(
            f"{label:6s} full={full:7.2f}s spans_only={spans_only:7.2f}s",
            flush=True,
        )
    base, five = rows[0], rows[1]
    print(
        f"ratio: full {five[1] / base[1]:.2f}x  "
        f"spans {five[2] / base[2]:.2f}x  (5x data)"
    )
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
