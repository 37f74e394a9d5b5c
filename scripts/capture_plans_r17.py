"""Capture `.explain('formatted')` for headline queries into plans/r17/.

Optimization-round tooling (r17): writes `plans/r17/<name>_<tag>.txt` for
each named query (default: every HEADLINE row) so plan diffs (Exchange
count, join strategy, PushedFilters, Python-eval nodes) can be asserted
before/after each change without re-running the bench.

Usage: python scripts/capture_plans_r17.py <tag> [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from building_a_rag_pipeline_with_airflow_spark import get_spark
    from building_a_rag_pipeline_with_airflow_spark.queries import REGISTRY

    spark = get_spark(app_name="capture-plans-r17")
    out_dir = os.path.join(REPO, "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn, _ = REGISTRY[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture what we can, note the rest
            plan = f"<explain failed: {exc}>"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
