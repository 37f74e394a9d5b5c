"""Third scale-curve pass (r7 judge directive #6): measure the 25x point
for the two MITIGATED chance-collision cliffs, one decade beyond the 5x
evidence, where chance-collision effects compound:

* ``phash c=2``: the band-PAIR keying fix (16 effective bits) held at 5x
  (+10%); 25x probes whether C(n,2)·28·2^-16 chance collisions stay
  inside the budget at n another 5x up.
* ``lsh planes=12``: the 5x re-tune. The r8 plane-budget guard
  (``similarity.check_plane_budget``) predicts this config MELTS at 25x
  (n≈50k > 256·2^6 = 16384) and that planes=16 holds (256·2^8 = 65536)
  — this pass measures BOTH, so the guard's threshold carries a direct
  25x data point: one config just under the budget line, one just over.

Replication rules are exactly ``scripts/scale_curve.py``'s organic 25x
(token-suffixed documents, md5-derived fresh embedding mass) — only the
two tables these rows read are built. Single timed run per row after one
session warmup (at 10-100s+ magnitudes, session noise is immaterial; the
5x pass's best-of-2 protocol matters only near session overhead).

Usage: python scripts/scale_curve_25x.py (builds scratch under
``.scale_check/``, prints rows, removes scratch). Results are recorded
in bench.py's docstring next to the 5x table.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.scale_curve import ROOT, SRC  # noqa: E402

N_REP = 25


def build_scaled_25x(spark) -> str:
    """25x documents (token-suffixed) + embeddings (md5 fresh mass) only."""
    sfx_dir = f"{ROOT}/sfx25"
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")

    def union_replicas(make):
        out = None
        for r in range(N_REP):
            d = make(r)
            out = d if out is None else out.unionByName(d)
        return out

    def mk_docs_sfx(r):
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

    union_replicas(mk_docs_sfx).write.mode("overwrite").parquet(
        f"{sfx_dir}/documents.parquet"
    )

    def mk_emb(r):
        if r == 0:
            return emb
        rnd = F.expr(
            "transform(sequence(1, 64), i -> cast("
            f"  (conv(substring(md5(concat(cast(vec_id as string), '_{r}_', cast(i as string))), 1, 8), 16, 10) % 100000) / 50000.0 - 1.0"
            " as float))"
        )
        return emb.select(
            (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
            rnd.alias("embedding"),
            "label",
        )

    union_replicas(mk_emb).write.mode("overwrite").parquet(
        f"{sfx_dir}/embeddings.parquet"
    )
    return sfx_dir


def main() -> None:
    from building_a_rag_pipeline_with_airflow_spark import get_spark, schemas
    from building_a_rag_pipeline_with_airflow_spark.operators import dedup, multimodal

    spark = get_spark(
        app_name="scale-curve-25x",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    if os.path.isdir(ROOT):
        shutil.rmtree(ROOT)
    print("building 25x data...", flush=True)
    sfx = build_scaled_25x(spark)

    def phash_c2(spark_, sf_dir_):
        # the registry query itself (corpus construction, c=2 banding,
        # and the narrow hash checkpoint that keeps the DCT single-run
        # across the matcher's three input references) — mirror by
        # construction, not by copy
        from building_a_rag_pipeline_with_airflow_spark.queries import REGISTRY

        fn, _ = REGISTRY["media_phash_near_dups"]
        return fn(spark_, sf_dir_)

    def lsh_form(n_planes):
        def fn(spark_, sf_dir_):
            emb = schemas.load_table(spark_, sf_dir_, "embeddings")
            pairs = dedup.embedding_near_dups(
                emb, vec_col="embedding", id_col="vec_id",
                threshold=0.4, n_planes=n_planes, n_bands=2, dim=64, seed=42,
                # the 12-plane row deliberately runs the config the r8
                # guard rejects at this n — that prediction is what this
                # pass tests; 16 planes is guard-compliant
                enforce_plane_budget=False,
            )
            # chance cross-replica edges percolate CC depth at this
            # scale (the 5x lesson) — scale-row-only cap raise
            return dedup.connected_components(
                pairs, "id_a", "id_b", max_iter=256
            )

        return fn

    ROWS = [
        ("phash c=2 @25x (mitigated)", phash_c2, sfx),
        ("lsh planes=16 @25x (guard-ok)", lsh_form(16), sfx),
        ("lsh planes=12 @25x (guard-rejected)", lsh_form(12), sfx),
    ]

    print(f"{'row':38s} {'sec':>8s}")
    for label, fn, d in ROWS:
        t0 = time.time()
        fn(spark, d).collect()
        print(f"{label:38s} {time.time() - t0:8.2f}", flush=True)
    shutil.rmtree(ROOT)
    spark.stop()


if __name__ == "__main__":
    main()
