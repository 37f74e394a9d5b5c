"""Quiet-host SOLO anchor table for the headline bench roster (r12
judge directive #3): the bench's interleaved medians drift with session
neighborhood and host load (the documented 140.6 -> 153.9 s headline
creep over four rounds while per-row solos stayed flat), so every
round-over-round adjudication has leaned on scattered per-row ledger
notes. This script publishes ONE fixed reference: each headline row's
best-of-3 WARM SOLO — one untimed warm pass, then three timed
back-to-back runs, keep the minimum (host noise only ever inflates a
run, so the min is the honest floor) — in one quiet session on the
current code.

Output: ``SOLO_ANCHOR_r{N}.json`` at the repo root (beside
``BENCH_r{N}.json``), keyed by query name, plus session metadata. A
future round classifies a >0.5 s interleaved-median mover in one
lookup: if its solo anchor is flat on unchanged code, the move is
session noise; re-anchor only when the plan actually changes.

Run solo on a quiet host: ``python scripts/solo_anchor.py [round_no]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402  (the one roster, never a copy)


def main() -> None:
    round_no = sys.argv[1] if len(sys.argv) > 1 else "13"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from building_a_rag_pipeline_with_airflow_spark import get_spark
    from building_a_rag_pipeline_with_airflow_spark.queries import REGISTRY

    spark = get_spark(
        app_name="building_a_rag_pipeline_with_airflow_spark-solo-anchor",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    # the bench's own JVM + index warmup, so solos measure reads
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()
    for _warm in (
        "jaccard_index_pairs",
        "substring_index_spans",
        "bm25_batch_topk_documents",
        "trigram_search_parts_from_index",
    ):
        try:
            REGISTRY[_warm][0](spark, sf_dir).limit(1).collect()
        except Exception as exc:
            print(f"solo_anchor: warmup {_warm} failed: {exc}", file=sys.stderr)

    anchors: dict[str, dict] = {}
    t_session = time.time()
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        try:
            fn(spark, sf_dir).collect()  # untimed warm pass (plan/JIT)
            runs = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).collect()
                runs.append(round(time.time() - t0, 3))
            anchors[name] = {"solo_best3": min(runs), "runs": runs}
        except Exception as exc:
            anchors[name] = {"solo_best3": -1.0, "error": str(exc)[:200]}
            print(f"solo_anchor: {name} failed: {exc}", file=sys.stderr)

    out = {
        "round": round_no,
        "sf_dir": sf_dir,
        "methodology": (
            "per query: 1 untimed warm pass + 3 timed back-to-back runs "
            "in ONE quiet session, anchor = min of the 3 (noise only "
            "inflates); rows run consecutively in HEADLINE order"
        ),
        "session_wall_s": round(time.time() - t_session, 1),
        "anchor_total_s": round(
            sum(a["solo_best3"] for a in anchors.values() if a["solo_best3"] >= 0),
            1,
        ),
        "queries": anchors,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SOLO_ANCHOR_r{round_no}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"solo_anchor_total_s": out["anchor_total_s"],
                      "wall_s": out["session_wall_s"], "path": path}))
    spark.stop()


if __name__ == "__main__":
    main()
