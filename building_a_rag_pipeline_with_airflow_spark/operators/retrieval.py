"""Retrieval + context assembly (the reference's query-time RAG path).

Reference: retrieve top-k chunks (``chromadb_rag.py:127-140``), format
``Source [i] (src): chunk`` joined with blank lines (``:148-166``), then one
LLM call on the assembled context (``:168-181`` — external service, out of
the distributed plan; the engine returns the context DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark.functions.embed import embed_text
from building_a_rag_pipeline_with_airflow_spark.operators.similarity import TOP_K, topk_cosine


def retrieve_chunks(
    index: DataFrame,
    query_text: str,
    k: int = TOP_K,
    dim: int = 64,
    vec_col: str = "embedding",
    prefilter=None,
) -> DataFrame:
    """Embed the query (driver-side, same embedder as the index) and return
    the top-k chunk rows with scores. ``prefilter`` = hybrid search (V3)."""
    qvec = embed_text(query_text, dim)
    topk = topk_cosine(
        index, qvec, k=k, vec_col=vec_col, id_col="chunk_id", prefilter=prefilter
    )
    # k rows at this point — the global window is trivially cheap.
    w = Window.orderBy(F.desc("score"), F.asc("chunk_id"))
    return (
        topk.join(index.drop(vec_col), "chunk_id")
        .withColumn("rank", F.row_number().over(w))
    )


def mmr_rerank(
    index: DataFrame,
    query_text: str,
    k: int = TOP_K,
    fetch_k: int = 4 * TOP_K,
    lambda_mult: float = 0.5,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "chunk_id",
) -> DataFrame:
    """Maximal-marginal-relevance retrieval: fetch ``fetch_k`` candidates
    by cosine, then greedily select ``k`` balancing query relevance against
    redundancy with what's already selected
    (``lambda * rel - (1 - lambda) * max_sim_to_selected`` — the standard
    MMR objective, the diversity knob the reference's plain top-k lacks).

    Scale shape: the distributed part is the candidate scan (identical to
    :func:`retrieve_chunks`'s top-k — TakeOrderedAndProject, corpus never
    shuffles). The greedy selection is inherently sequential in k, so it
    runs driver-side with numpy over the ``fetch_k`` collected candidate
    vectors — fetch_k·dim floats, the same metadata class as the IVF
    probe's centroid collect, NOT a data-path collect. Payload columns
    stay distributed: only (id, score, vector) rows come down, and the
    chosen ids join back against the index for the full rows."""
    import numpy as np

    qvec = embed_text(query_text, dim)
    cands = topk_cosine(
        index, qvec, k=fetch_k, vec_col=vec_col, id_col=id_col
    ).join(index.select(id_col, vec_col), id_col)
    rows = cands.collect()  # fetch_k rows of (id, score, vector) — metadata-scale
    if not rows:
        return retrieve_chunks(index, query_text, k=0, dim=dim, vec_col=vec_col)
    ids = [r[id_col] for r in rows]
    rel = np.array([float(r["score"]) for r in rows])
    V = np.array([list(map(float, r[vec_col])) for r in rows])
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0] = 1.0
    Vn = V / norms[:, None]
    sim = Vn @ Vn.T  # candidate-candidate cosine, fetch_k², driver-side
    lam = float(lambda_mult)
    selected: list[int] = []
    remaining = list(range(len(ids)))
    while remaining and len(selected) < k:
        if not selected:
            best = max(remaining, key=lambda i: rel[i])
        else:
            best = max(
                remaining,
                key=lambda i: lam * rel[i]
                - (1.0 - lam) * max(sim[i][j] for j in selected),
            )
        selected.append(best)
        remaining.remove(best)
    spark = index.sparkSession
    order = spark.createDataFrame(
        [(ids[i], rank + 1) for rank, i in enumerate(selected)],
        f"{id_col} string, rank int",
    )
    return index.drop(vec_col).join(F.broadcast(order), id_col).orderBy("rank")


def assemble_context(retrieved: DataFrame, source_col: str = "doc_id") -> DataFrame:
    """Collapse ranked chunks into one prompt-context row (reference T14
    format, chromadb_rag.py:148-166): 'Source [i] (src): text' + '\\n\\n'."""
    formatted = retrieved.select(
        F.format_string(
            "Source [%d] (%s): %s",
            F.col("rank"),
            F.col(source_col).cast("string"),
            F.col("text"),
        ).alias("piece"),
        "rank",
    )
    return formatted.agg(
        F.array_join(
            F.array_sort(F.collect_list(F.struct("rank", "piece"))).getField("piece"),
            "\n\n",
        ).alias("context"),
        F.count("*").cast("int").alias("n_sources"),
    )
