"""End-to-end RAG pipeline (reference E1: ``rag_pipeline``,
``Chunking_Strats/chromadb_rag.py:184-212``) as one Catalyst plan:

documents → chunk (strategy dispatch T4) → embed (V1) → [optional hybrid
prefilter V3] → cosine top-k (V2) → assembled context (T14).

Where the reference round-trips through a vector store per call, the engine
builds/persists the chunk index once (``build_index``) and serves queries
from it — replace-on-write parquet gives the reference's ``replace=True``
idempotence (K1, dags:372).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark.functions.embed import (
    DEFAULT_DIM,
    embed_documents,
    hashed_embedder_udf,
)
from building_a_rag_pipeline_with_airflow_spark.operators import chunking
from building_a_rag_pipeline_with_airflow_spark.operators.retrieval import (
    assemble_context,
    retrieve_chunks,
)

STRATEGIES = ("fixed", "recursive", "semantic")


def chunk_documents(docs: DataFrame, strategy: str = "fixed", **kw) -> DataFrame:
    """Strategy dispatch (reference T4, chromadb_rag.py:191-200)."""
    if strategy == "fixed":
        return chunking.chunk_fixed(docs, **kw)
    if strategy == "recursive":
        return chunking.chunk_recursive(docs, **kw)
    if strategy == "semantic":
        embed_fn = kw.pop("embed_fn", None) or hashed_embedder_udf(DEFAULT_DIM)
        return chunking.chunk_semantic(docs, embed_fn, **kw)
    raise ValueError(f"unknown strategy {strategy!r}; pick from {STRATEGIES}")


def build_index(
    docs: DataFrame,
    strategy: str = "fixed",
    dim: int = DEFAULT_DIM,
    embed_fn=None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """documents → chunks → embeddings index DataFrame.

    Keeps doc metadata columns named in ``keep_cols`` (hybrid-search
    predicates); at scale, persist with
    ``index.write.partitionBy(*keep_cols).parquet(path)`` so V3 prefilters
    prune partitions."""
    chunks = chunk_documents(docs, strategy)
    if keep_cols:
        meta = docs.select("doc_id", *keep_cols)
        chunks = chunks.join(F.broadcast(meta), "doc_id")
    return embed_documents(chunks, text_col="text", dim=dim, embed_fn=embed_fn)


def rag_query(
    index: DataFrame,
    query_text: str,
    k: int = 5,
    dim: int = DEFAULT_DIM,
    prefilter=None,
    diversity: "str | None" = None,
) -> DataFrame:
    """Query-time path: top-k retrieve + context assembly; returns one row
    (context, n_sources). ``diversity="mmr"`` swaps plain relevance top-k
    for maximal-marginal-relevance re-ranking (retrieval.mmr_rerank) —
    same distributed candidate scan, diversified final k."""
    if diversity == "mmr":
        from building_a_rag_pipeline_with_airflow_spark.operators.retrieval import mmr_rerank

        retrieved = mmr_rerank(index, query_text, k=k, dim=dim)
    elif diversity is not None:
        raise ValueError(f"unknown diversity mode: {diversity!r}")
    else:
        retrieved = retrieve_chunks(
            index, query_text, k=k, dim=dim, prefilter=prefilter
        )
    return assemble_context(retrieved)


def rag_pipeline(
    spark: SparkSession,
    sf_dir: str,
    query_text: str,
    strategy: str = "fixed",
    k: int = 5,
) -> DataFrame:
    """Full E1 flagship: load documents, index, retrieve. Returns the ranked
    top-k chunk DataFrame (rank, chunk_id, doc_id, score, text...)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index = build_index(docs, strategy=strategy)
    return retrieve_chunks(index, query_text, k=k)
