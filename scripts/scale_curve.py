"""One-off scale-curve spot check (r6 judge directive #6).

Replicates the sf0.1 tables 5x with replica-disjoint keys/content and
times the ~8 most expensive headline queries at sf0.1 vs the 5x data —
one measured point off sf0.1 to evidence that the salting/banding/
prefix-sum designs actually produce sub-quadratic curves (5x data ->
~5x time for the linear-ish plans; a quadratic plan would show ~25x).

Replication is *organic*, not verbatim: naive duplication would plant
5 exact copies of every document/vector, which inflates the DEDUP
workloads quadratically (every dup group of c copies yields c*(c-1)/2
pairs) and measures the wrong thing. Instead each replica r > 0:

* documents: every token gets a ``_r{r}`` suffix — intra-replica
  near-dup structure is preserved exactly, cross-replica texts share no
  3-gram shingles / lines / phash bytes;
* embeddings: replicas are md5-derived pseudo-random vectors — fresh
  corpus mass whose banded-candidate/verify cost grows with size while
  the near-dup pair structure stays replica-0's (a cyclic dimension
  shift was tried first and produced highly correlated copies: the
  synthetic vectors are smooth, so shifted replicas chained the
  connected-components diameter past its bound — a real data-shape
  lesson, recorded here);
* lineitem: supplier/part keys offset per replica — 5 disjoint copies
  of the co-supply graph;
* part: names get a ``ZZ{r}Q`` suffix — distinct corpus strings with
  preserved gram structure (replica-0 queries see a 5x corpus of
  still-similar names: organic search-corpus growth).
* EXCEPTION — BM25 batch: the text suffix would make the fixed query
  workload match only replica 0, so its 5x corpus is verbatim
  duplication (shifted doc ids): duplicated docs grow the workload
  terms' posting lists 5x, which IS the organic scaling for lexical
  retrieval.

Usage: python scripts/scale_curve.py  (writes scratch data under
.scale_check/, prints the table, removes the scratch dir). Results are
recorded in bench.py's docstring tail.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_check")
N_REP = 5

QUERIES = [
    ("ngram_jaccard_pairs", "sfx"),
    ("dedup_clusters_documents", "sfx"),
    ("line_dedup_documents", "sfx"),
    ("media_phash_near_dups", "sfx"),
    ("bm25_batch_topk_documents", "dup"),
    ("embedding_dup_clusters_lsh", "sfx"),
    ("pagerank_supplier_cosupply", "sfx"),
    ("trigram_search_parts", "sfx"),
]


def build_scaled(spark) -> dict:
    sfx_dir = f"{ROOT}/sfx"
    dup_dir = f"{ROOT}/dup"
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    part = spark.read.parquet(f"{SRC}/part.parquet")

    def union_replicas(make):
        out = None
        for r in range(N_REP):
            d = make(r)
            out = d if out is None else out.unionByName(d)
        return out

    # documents, token-suffixed (dedup family)
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

    # documents, verbatim duplication (lexical retrieval)
    def mk_docs_dup(r):
        return docs.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )

    union_replicas(mk_docs_dup).write.mode("overwrite").parquet(
        f"{dup_dir}/documents.parquet"
    )

    # embeddings: replicas are md5-derived pseudo-random vectors (see
    # module docstring — shifted copies of the smooth synthetic vectors
    # cross-correlate and chain the CC diameter)
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

    # lineitem: disjoint co-supply graph replicas
    def mk_li(r):
        return li.select(
            (F.col("l_orderkey") + r * 100_000_000).alias("l_orderkey"),
            (F.col("l_partkey") + r * 10_000_000).alias("l_partkey"),
            (F.col("l_suppkey") + r * 10_000_000).alias("l_suppkey"),
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )

    union_replicas(mk_li).write.mode("overwrite").parquet(
        f"{sfx_dir}/lineitem.parquet"
    )

    # part: distinct-but-similar names per replica
    def mk_part(r):
        if r == 0:
            return part
        return part.select(
            (F.col("p_partkey") + r * 10_000_000).alias("p_partkey"),
            F.concat("p_name", F.lit(f" ZZ{r}Q")).alias("p_name"),
            "p_brand",
            "p_type",
            "p_size",
            "p_retailprice",
        )

    union_replicas(mk_part).write.mode("overwrite").parquet(
        f"{sfx_dir}/part.parquet"
    )
    return {"sfx": sfx_dir, "dup": dup_dir}


def main() -> None:
    from building_a_rag_pipeline_with_airflow_spark import get_spark
    from building_a_rag_pipeline_with_airflow_spark.queries import REGISTRY

    spark = get_spark(
        app_name="scale-curve",
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
    # dup dir needs the other tables too? No: bm25_batch reads documents only.

    def _lsh_clusters_relaxed(spark_, sf_dir_):
        # Same composition as the registry's embedding_dup_clusters_lsh,
        # with ONLY the CC round cap raised: at 5x the fresh random
        # replica mass percolates the 0.4-threshold graph (thousands of
        # chance cross-replica edges above threshold inside shared LSH
        # bands) into components whose diameter exceeds the production
        # cap of 20, so the registry query raises — correctly, per its
        # contract. Convergence ROUNDS are a data-shape property, not a
        # scale property; the stage whose scaling this script measures
        # (banded candidate generation + exact verify) is unchanged.
        from building_a_rag_pipeline_with_airflow_spark.operators import dedup
        from building_a_rag_pipeline_with_airflow_spark import schemas

        emb = schemas.load_table(spark_, sf_dir_, "embeddings")
        pairs = dedup.embedding_near_dups(
            emb, vec_col="embedding", id_col="vec_id",
            threshold=0.4, n_planes=8, n_bands=2, dim=64, seed=42,
            # the r8 plane-budget guard correctly flags 8 planes at 5x
            # corpus mass — this row IS the deliberate repro of that melt
            enforce_plane_budget=False,
        )
        return dedup.connected_components(pairs, "id_a", "id_b", max_iter=64)

    def run(name, sf_dir, repeats=2):
        if name == "embedding_dup_clusters_lsh":
            fn = _lsh_clusters_relaxed
        else:
            fn, _ = REGISTRY[name]
        best = None
        for _ in range(repeats):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    print(f"{'query':34s} {'sf0.1':>8s} {'5x':>8s} {'ratio':>6s}")
    for name, variant in QUERIES:
        # one untimed warmup at EACH scale first: timing SRC-then-scaled
        # without it systematically flatters the scaled side (JIT/worker
        # reuse from the SRC runs) — observed ratios < 1 on first cut
        run(name, SRC, repeats=1)
        run(name, dirs[variant], repeats=1)
        t1 = run(name, SRC)
        t5 = run(name, dirs[variant])
        print(
            f"{name:34s} {t1:8.2f} {t5:8.2f} {t5 / t1:6.2f}",
            flush=True,
        )
    shutil.rmtree(ROOT)
    spark.stop()


if __name__ == "__main__":
    main()
