"""Column-level scalar functions (all JVM-side built-ins unless noted)."""

from building_a_rag_pipeline_with_airflow_spark.functions.text import (
    bpe_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from building_a_rag_pipeline_with_airflow_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
)

__all__ = [
    "token_count",
    "bpe_token_count",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "cosine_similarity",
]
