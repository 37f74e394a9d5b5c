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
