"""Iterative graph analytics on DataFrames: weighted PageRank.

The reference has no graph surface, but the dedup ladder already ends in
one graph algorithm (connected components, ``operators/dedup.py:425``) —
PageRank is the second standard one a corpus pipeline needs: rank
documents by link/citation structure, rank entities by co-occurrence,
weight crawl frontiers. Same execution shape as the CC loop:

* **state is one row per node** (the rank vector), edges are the big
  side. Each iteration joins ranks into edges on ``src``, aggregates
  contributions by ``dst`` — two shuffles per round, both on node keys.
* **edges are normalized ONCE** (out-weight division) and persisted;
  every iteration joins against the same cached, same-partitioned edge
  frame, so AQE/exchange-reuse keeps the per-round cost at "shuffle the
  rank vector", not "reshuffle the graph".
* **lineage is truncated per round** with ``localCheckpoint`` — without
  it the plan doubles per iteration and the job dies of planning time
  long before it dies of data (the same trap documented at
  ``dedup.connected_components``).
* **dangling mass**: nodes with no out-edges leak rank. The standard fix
  (redistribute the dangling sum uniformly) costs one extra tiny
  aggregate per round; on symmetric graphs (co-occurrence — every edge
  exists both ways) there are no dangling nodes and the term is zero, so
  it is computed only when ``handle_dangling=True``.

Convergence: fixed ``iterations`` rather than an epsilon probe — rank
deltas shrink geometrically by the damping factor, so iteration count is
a function of tolerance, not data size; fixed counts also make the
result reproducible by any engine (the DuckDB oracle chains one CTE per
iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: "str | None" = None,
    iterations: int = 6,
    damping: float = 0.85,
    handle_dangling: bool = False,
) -> DataFrame:
    """Weighted PageRank over an edge list; returns ``(node, pr)``.

    ``weight=None`` treats every edge as weight 1. Nodes are the union of
    ``src`` and ``dst`` values; a node with no out-edges contributes
    nothing (or its mass is redistributed uniformly when
    ``handle_dangling=True``). The node count N is a one-scalar driver
    aggregate — metadata, same class as ``mixture_reweight``'s plan
    counts, not a data-path collect.

    Update rule (the classic one): ``r'(v) = (1-d)/N + d * Σ_u r(u) *
    w(u,v)/W(u) [+ d * dangling_mass/N]``.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    out_w = e.groupBy("src").agg(F.sum("w").alias("wt"))
    # Edge transition probabilities, computed once, partitioned by the
    # join key of every subsequent iteration and cached: each round's
    # ranks⋈norm join reuses this partitioning instead of reshuffling
    # the (big) edge side.
    norm = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("wt")).alias("p"))
        .repartition("src")
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # one scalar; also materializes the persists
    d = float(damping)
    base = (1.0 - d) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    dangling = (
        nodes.join(out_w.withColumnRenamed("src", "node"), "node", "left_anti")
        if handle_dangling
        else None
    )
    for i in range(int(iterations)):
        contrib = (
            norm.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("p")).alias("inflow"))
        )
        extra = 0.0
        if dangling is not None:
            # Tiny aggregate: sum of rank sitting on out-degree-0 nodes.
            row = (
                ranks.join(dangling, "node", "left_semi")
                .agg(F.sum("pr"))
                .first()
            )
            extra = d * float(row[0] or 0.0) / n
        new_ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base + extra)
                    + F.lit(d) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        if i > 0:
            # new_ranks is materialized; the superseded round's checkpoint
            # blocks have no readers left — release them (same discipline
            # as dedup.connected_components) or every round stays pinned.
            ranks.unpersist()
        ranks = new_ranks
    norm.unpersist()
    nodes.unpersist()
    return ranks


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Symmetric co-occurrence edge list: ``(src, dst, w)`` where ``w`` is
    the number of DISTINCT groups in which the two items co-appear.

    Self-join on the group key — fan-out per group is (items-per-group)²,
    which is safe exactly when group membership is bounded (lineitems per
    order, authors per paper); for heavy-tailed groups, cap membership
    upstream before calling. The per-group DISTINCT collapses repeated
    items before counting, so multiplicity inside one group never
    inflates the weight."""
    a = df.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("src")
    ).distinct()
    b = a.select(F.col("_g"), F.col("src").alias("dst"))
    return (
        a.join(b, "_g")
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )
