"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship RAG query (documents → fixed chunks →
hashed embeddings → cosine top-k → ranked chunks) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the engine's operator inventory
(SURVEY.md §2) with DuckDB oracles where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from building_a_rag_pipeline_with_airflow_spark.pipeline import rag_pipeline
from building_a_rag_pipeline_with_airflow_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return rag_pipeline(
        spark,
        "/root/testdata/sf0.001",
        "spark join merge table scan",
        strategy="fixed",
        k=5,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return all_oracles()
