"""Similarity search: exact cosine top-k, k-NN join, and LSH-bucketed ANN.

Reference behavior: ChromaDB ``collection.query`` = cosine top-k of a query
vector against the stored collection (``Chunking_Strats/chromadb_rag.py:
127-140``, TOP_K=5 at :18), with metadata-filtered "hybrid" search (README
:35-36) realized as a pre-filter.

Scale design:
* ``topk_cosine`` — single query vector: one columnar scan + TakeOrdered
  (no shuffle of the corpus; the top-k heap merges per partition). Fine at
  any corpus size that one pass can scan.
* ``knn_join`` — small query set: broadcast the queries, score per corpus
  partition, per-query top-k via window. Corpus never shuffles; only the
  (tiny) scored candidate set does.
* ``lsh_knn_join`` — large×large: random-hyperplane signatures bucket both
  sides; candidates only join within a band bucket (the classic
  sign-LSH / banding trick). Trades recall for a bounded shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

TOP_K = 5  # reference default, chromadb_rag.py:18


def topk_cosine(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = TOP_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    prefilter=None,
) -> DataFrame:
    """Exact cosine top-k for one query vector (V2). ``prefilter`` is an
    optional Column predicate applied *before* scoring (V3 hybrid search —
    partition-prunable at scale)."""
    df = corpus if prefilter is None else corpus.where(prefilter)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 4).alias("score"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition heaps,
    # no full sort, no corpus shuffle.
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = TOP_K,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Top-k neighbors in ``corpus`` for every row of ``queries`` (J3).

    Queries are broadcast (they are the small side by contract); the corpus
    is scanned once per partition with no shuffle; the only shuffle is the
    per-query window over scored candidates.

    Norms are projected once per row before the join so the per-pair work
    inside the nested loop is a single dot product.
    """
    qn = queries.withColumn("_qn", l2_norm(q_vec))
    cn = corpus.withColumn("_cn", l2_norm(c_vec))
    scored = cn.join(F.broadcast(qn)).select(
        F.col(q_id),
        F.col(c_id),
        F.round(
            dot_product(F.col(c_vec), F.col(q_vec)) / (F.col("_cn") * F.col("_qn")),
            4,
        ).alias("score"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id, c_id, "score", F.col("rank").cast("int").alias("rank"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42):
    """Deterministic random hyperplanes (driver-side numpy, broadcast as
    literals — tiny)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(float)


def lsh_signature(vec_col, planes) -> "F.Column":
    """Sign-LSH bit signature as a string key: 1 bit per hyperplane."""
    bits = [
        F.when(dot_product(vec_col, F.array(*[F.lit(float(v)) for v in p])) >= 0,
               F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = TOP_K,
    n_planes: int = 8,
    n_bands: int = 2,
    dim: int = 64,
    seed: int = 42,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate k-NN join for large×large inputs: both sides get sign-LSH
    signatures split into bands; candidate pairs share at least one band
    bucket (equi-join per band — a co-partitioned shuffle join, never a cross
    join); exact cosine re-ranks candidates."""
    planes = _hyperplanes(dim, n_planes, seed)
    band_size = n_planes // n_bands

    def with_bands(df, vec, out_prefix):
        sig = lsh_signature(F.col(vec), planes)
        df = df.withColumn("_sig", sig)
        bands = F.array(
            *[
                F.concat(F.lit(f"{b}:"), F.substring("_sig", b * band_size + 1, band_size))
                for b in range(n_bands)
            ]
        )
        return df.withColumn(f"{out_prefix}band", F.explode(bands)).drop("_sig")

    qb = with_bands(queries, q_vec, "")
    cb = with_bands(corpus, c_vec, "")
    cand = (
        qb.join(cb, "band")
        .select(q_id, c_id, q_vec, c_vec)
        .dropDuplicates([q_id, c_id])
    )
    scored = cand.select(
        q_id,
        c_id,
        F.round(
            dot_product(F.col(c_vec), F.col(q_vec))
            / (l2_norm(F.col(c_vec)) * l2_norm(F.col(q_vec))),
            4,
        ).alias("score"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id, c_id, "score", F.col("rank").cast("int").alias("rank"))
    )
