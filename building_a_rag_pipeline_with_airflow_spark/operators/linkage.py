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
