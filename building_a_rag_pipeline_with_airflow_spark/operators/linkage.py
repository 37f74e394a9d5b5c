"""Record linkage: blocked fuzzy matching over string keys.

The scalable form of entity resolution — never all-pairs. Same shape as
the dedup ladder's candidate generation (``operators/dedup.py``: shingle
inverted index, MinHash bands): a cheap deterministic BLOCKING key
bounds the candidate space to within-block pairs, then an exact
edit-distance verify runs on candidates only. At 100 TB the block join
is one shuffle on the block key; the quadratic blow-up is bounded by the
largest block, which the ``max_block`` guard caps explicitly rather than
letting one degenerate key (empty string, "unknown") turn the join into
a cross product.

``levenshtein`` is JVM-side (codegen'd DP over the candidate pairs
only); blocking keys are projections (``soundex``, token slices) — the
whole operator is two shuffles and zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def last_token_block(col: str | Column) -> Column:
    """Blocking key: the last whitespace token (for "modifier noun"
    naming schemes, the noun carries the entity type)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, r"\s+"), -1)


def soundex_block(col: str | Column) -> Column:
    """Blocking key: Soundex phonetic code — the classic surname blocker
    (same engine builtin American Soundex in Spark and most SQL engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.soundex(c)


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column,
    max_distance: int = 3,
    max_block: int = 10_000,
) -> DataFrame:
    """Within-block candidate pairs with Levenshtein distance ≤
    ``max_distance``; emits each unordered pair once (``id_a < id_b``).

    Plan: project (block, id, name) distinct → self equi-join on the
    block key (bounded fan-out = block size) → codegen'd edit-distance
    filter on candidates only. ``max_block`` drops blocks larger than
    the cap — a degenerate blocking key must be an explicit modeling
    decision, not an accidental cross join; dropped blocks surface in
    the returned plan as a missing key, and callers needing them should
    refine the blocking function instead of raising the cap."""
    base = df.select(
        block.alias("_blk"), F.col(id_col).alias("id_a"), F.col(name_col).alias("name_a")
    ).distinct()
    sizes = base.groupBy("_blk").agg(F.count("*").alias("_n"))
    # No explicit broadcast of the block-size table: its cardinality is
    # the number of DISTINCT blocking keys, which for soundex_block is
    # ≤ ~7k codes but for last_token_block is vocabulary-scale (millions
    # of rows at 100 TB). A semi-join lets AQE pick broadcast when the
    # filtered key set is actually small and shuffle otherwise.
    bounded = base.join(
        sizes.where(F.col("_n") <= int(max_block)).select("_blk"),
        "_blk",
        "left_semi",
    )
    other = bounded.select(
        "_blk", F.col("id_a").alias("id_b"), F.col("name_a").alias("name_b")
    )
    return (
        bounded.join(other, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .where(F.col("distance") <= int(max_distance))
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )


def trigram_set(col: "str | Column") -> Column:
    """Distinct character 3-grams of a lowercased string as an array —
    pure Catalyst (`transform` over a `sequence` of positions +
    `array_distinct`), reproducible in any engine via
    ``generate_series`` + ``substr`` + ``DISTINCT``. Strings shorter
    than 3 chars contribute their whole text as one gram."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    n = F.greatest(F.length(c) - 2, F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(3))
        )
    )


def trigram_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    q_text: str = "q_text",
    c_id: str = "name_id",
    c_text: str = "name",
    max_posting: int = 100_000,
) -> DataFrame:
    """Fuzzy string SEARCH: for every query string, the top-k most
    similar corpus strings by trigram-set Jaccard — the search-shaped
    sibling of :func:`blocked_fuzzy_pairs` (which enumerates within-block
    PAIRS). The standard engine trick (PostgreSQL pg_trgm, n-gram FTS):

    * both sides project to DISTINCT trigram sets (map-side, no UDF);
    * an inverted-index equi-join on the trigram yields candidates — a
      corpus string is considered only if it SHARES a gram with the
      query, never all-pairs; ``max_posting`` drops stop-grams (grams in
      more corpus strings than the cap — the shingle-index stop-shingle
      guard) whose candidates would be the whole corpus;
    * shared-gram counts aggregate per (query, candidate); Jaccard
      derives from the two stored set sizes; the per-query cut is the
      salted two-phase top-k (`similarity._per_query_topk` pattern).

    Deterministic: scores round to 6 decimals with id tiebreaks, so the
    whole operator carries a full SQL oracle."""
    from building_a_rag_pipeline_with_airflow_spark.operators.similarity import (
        _per_query_topk,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qg = queries.select(
        F.col(q_id).alias("q_id"), trigram_set(q_text).alias("_g")
    ).withColumn("_qn", F.size("_g"))
    cg = corpus.select(
        F.col(c_id).alias("name_id"),
        F.col(c_text).alias("name"),
        trigram_set(c_text).alias("_g"),
    ).withColumn("_cn", F.size("_g"))
    cpost = cg.select(
        "name_id", "_cn", F.explode("_g").alias("gram")
    )
    if max_posting is not None:
        sizes = cpost.groupBy("gram").agg(F.count("*").alias("_n"))
        cpost = cpost.join(
            sizes.where(F.col("_n") <= int(max_posting)).select("gram"),
            "gram",
            "left_semi",
        )
    qpost = qg.select("q_id", "_qn", F.explode("_g").alias("gram"))
    shared = (
        qpost.join(cpost, "gram")
        .groupBy("q_id", "name_id")
        .agg(
            F.count("*").cast("double").alias("_shared"),
            F.first("_qn").alias("_qn"),
            F.first("_cn").alias("_cn"),
        )
    )
    scored = shared.select(
        "q_id",
        "name_id",
        (
            F.round(
                F.col("_shared")
                / (F.col("_qn") + F.col("_cn") - F.col("_shared"))
                * 1_000_000
            )
            / 1_000_000
        ).alias("score"),
    )
    out = _per_query_topk(scored, "q_id", "name_id", int(k))
    return out.join(
        cg.select("name_id", "name"), "name_id"
    ).select("q_id", "name_id", "name", "score", "rank")
