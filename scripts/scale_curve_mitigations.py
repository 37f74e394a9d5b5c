"""Second pass of the r7 scale-curve spot check: measure the MITIGATIONS
for the two superlinear rows the first pass found (see
``scripts/scale_curve.py`` and the table in ``bench.py``'s docstring).

First-pass findings on 5x-replicated sf0.1 data:

* ``media_phash_near_dups`` ran ~6x slower on 5x data — single-band
  (8-bit) candidates grow as ~C(n,2)·n_bands·2^-8: chance collisions,
  quadratic in corpus size. Mitigation implemented in
  ``multimodal.phash_near_dups(min_shared_bands=2)``: candidates must
  share a band PAIR (16 effective bits over C(8,2)=28 combos), ~73x
  fewer chance collisions, exact pair set unchanged (pigeonhole still
  guarantees 2 clean bands at hamming <= 6; equality pinned by test).
* ``embedding_dup_clusters_lsh`` ran ~72x slower — at threshold 0.4
  with 8-plane sign-LSH bands, random pairs collide at ~2·2^-8: fresh
  corpus mass makes candidates O(n²·2^-planes) and the (interpreted
  higher-order-function) cosine verify becomes the bottleneck, then the
  percolated candidate graph deepens connected components. Mitigation
  is PARAMETRIC, not structural: planes-per-band must scale as
  ~2·log2(n) to hold the chance-collision budget. This pass measures
  the same operator composition with n_planes=12 at 5x (collision rate
  16x lower) vs n_planes=8 at sf0.1 — the production re-tune, exactly
  how an IVF index re-clusters as the corpus grows.

Usage: python scripts/scale_curve_mitigations.py (rebuilds the 5x
scratch under .scale_check/, prints rows, removes scratch). Results are
recorded next to the first-pass table in bench.py's docstring.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.scale_curve import ROOT, SRC, build_scaled  # noqa: E402


def main() -> None:
    from building_a_rag_pipeline_with_airflow_spark import get_spark, schemas
    from building_a_rag_pipeline_with_airflow_spark.operators import dedup, multimodal
    from building_a_rag_pipeline_with_airflow_spark.queries import REGISTRY

    spark = get_spark(
        app_name="scale-curve-mitigations",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    if os.path.isdir(ROOT):
        shutil.rmtree(ROOT)
    print("building 5x data...", flush=True)
    dirs = build_scaled(spark)

    def phash_form(min_shared_bands):
        # mirrors the registry query's corpus construction exactly
        def fn(spark_, sf_dir_):
            docs = schemas.load_table(spark_, sf_dir_, "documents")
            base = docs.where((F.col("doc_id") < 20) & (F.length("text") > 20))
            media = multimodal.media_from_documents(docs)
            copies = multimodal.media_from_documents(
                base.select(
                    (F.col("doc_id") + 1_000_000).alias("doc_id"),
                    "text", "lang", "source", "n_chars",
                )
            )
            edited = multimodal.media_from_documents(
                base.select(
                    (F.col("doc_id") + 2_000_000).alias("doc_id"),
                    F.concat(
                        F.substring("text", 1, 10),
                        F.lit("#"),
                        F.expr("substring(text, 12)"),
                    ).alias("text"),
                    "lang", "source", "n_chars",
                )
            )
            corpus = media.unionByName(copies).unionByName(edited)
            hashed = multimodal.perceptual_hash(corpus)
            return multimodal.phash_near_dups(
                hashed, max_hamming=6, min_shared_bands=min_shared_bands
            ).orderBy("id_a", "id_b")

        return fn

    def lsh_form(n_planes):
        def fn(spark_, sf_dir_):
            emb = schemas.load_table(spark_, sf_dir_, "embeddings")
            pairs = dedup.embedding_near_dups(
                emb, vec_col="embedding", id_col="vec_id",
                threshold=0.4, n_planes=n_planes, n_bands=2, dim=64, seed=42,
                # deliberately measuring under-provisioned configurations:
                # the in-operator plane-budget guard (added r8) would
                # correctly raise on them — downgrade to its warning
                enforce_plane_budget=False,
            )
            return dedup.connected_components(pairs, "id_a", "id_b", max_iter=64)

        return fn

    ROWS = [
        # (label, callable, sf_dir): each row is a single measured point
        ("phash c=1 @sf0.1 (control)", phash_form(1), SRC),
        ("phash c=1 @5x (pass-1 repro)", phash_form(1), dirs["sfx"]),
        ("phash c=2 @sf0.1 (registry now)", phash_form(2), SRC),
        ("phash c=2 @5x (mitigated)", phash_form(2), dirs["sfx"]),
        ("lsh planes=8 @sf0.1 (control)", lsh_form(8), SRC),
        ("lsh planes=12 @5x (re-tuned)", lsh_form(12), dirs["sfx"]),
    ]

    print(f"{'row':36s} {'sec':>8s}")
    for label, fn, d in ROWS:
        fn(spark, d).collect()  # warm
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, d).collect()
            best = min(best or 1e9, time.time() - t0)
        print(f"{label:36s} {best:8.2f}", flush=True)
    shutil.rmtree(ROOT)
    spark.stop()


if __name__ == "__main__":
    main()
