"""Unit tests for operators/timeseries.py (resample → gap fill →
interpolation → z-score) and operators/graph.py (weighted PageRank,
co-occurrence edge construction). The full-pipeline value checks live in
tests/test_oracle_parity.py (resample_interpolate_purchases,
anomaly_zscore_events_daily, pagerank_supplier_cosupply); these cover
edge semantics the oracles can't isolate.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark.operators import graph, timeseries


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, period bigint, value double")


def test_fill_gaps_densifies_per_key_span(spark):
    sparse = _series(
        spark,
        [("a", 10, 1.0), ("a", 14, 5.0), ("b", 100, 7.0)],
    )
    dense = timeseries.fill_gaps(sparse, by=("k",)).orderBy("k", "period")
    rows = dense.collect()
    assert [(r.k, r.period, r.value) for r in rows] == [
        ("a", 10, 1.0),
        ("a", 11, None),
        ("a", 12, None),
        ("a", 13, None),
        ("a", 14, 5.0),
        ("b", 100, 7.0),  # single-point series: spine is just that point
    ]


def test_interpolate_linear_values_and_edges(spark):
    # Gap of 3 between observed 1.0@10 and 5.0@14 -> 2.0, 3.0, 4.0.
    # Leading/trailing gaps (no neighbor on one side) must stay NULL.
    dense = _series(
        spark,
        [
            ("a", 9, None),   # leading: no prev observation
            ("a", 10, 1.0),
            ("a", 11, None),
            ("a", 12, None),
            ("a", 13, None),
            ("a", 14, 5.0),
            ("a", 15, None),  # trailing: no next observation
        ],
    )
    out = {
        r.period: r.value_interp
        for r in timeseries.interpolate_linear(dense, by=("k",)).collect()
    }
    assert out[9] is None and out[15] is None
    assert out[10] == 1.0 and out[14] == 5.0
    assert out[11] == pytest.approx(2.0)
    assert out[12] == pytest.approx(3.0)
    assert out[13] == pytest.approx(4.0)


def test_zscore_first_row_null_std_not_anomalous(spark):
    df = _series(
        spark, [("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 1000.0)]
    )
    rows = {
        r.period: r
        for r in timeseries.zscore_anomalies(
            df, by=("k",), window_periods=7, threshold=2.0
        ).collect()
    }
    assert rows[1].rolling_std is None  # stddev_samp of one row
    assert rows[1].zscore is None
    assert rows[1].is_anomaly is False  # false by construction, not null
    assert rows[2].zscore is None  # identical values -> sd == 0 -> null z
    assert rows[3].is_anomaly is False or rows[3].zscore is not None


def test_resample_rejects_unknown_agg(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError):
        timeseries.resample(df, "x", "x", agg="median")


def test_cooccurrence_edges_distinct_group_weight(spark):
    df = spark.createDataFrame(
        # group g1 contains x twice — multiplicity must not inflate w
        [("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "x"), ("g2", "y"), ("g3", "x")],
        "g string, item string",
    )
    edges = {
        (r.src, r.dst): r.w
        for r in graph.cooccurrence_edges(df, "g", "item").collect()
    }
    assert edges == {("x", "y"): 2.0, ("y", "x"): 2.0}


def test_pagerank_uniform_on_regular_graph(spark):
    # Unweighted triangle: perfectly regular -> rank 1/3 each.
    e = spark.createDataFrame(
        [(a, b) for a in "abc" for b in "abc" if a != b], "src string, dst string"
    )
    pr = {r.node: r.pr for r in graph.pagerank(e, iterations=4).collect()}
    assert all(v == pytest.approx(1 / 3) for v in pr.values())
    assert sum(pr.values()) == pytest.approx(1.0)


def test_pagerank_mass_conserved_symmetric_weighted(spark):
    e = spark.createDataFrame(
        [("a", "b", 3.0), ("b", "a", 3.0), ("b", "c", 1.0), ("c", "b", 1.0)],
        "src string, dst string, w double",
    )
    pr = {r.node: r.pr for r in graph.pagerank(e, weight="w", iterations=8).collect()}
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)
    # b sits between a and c and holds the heavier edge: highest rank
    assert pr["b"] > pr["a"] > 0 and pr["b"] > pr["c"] > 0


def test_pagerank_dangling_redistribution(spark):
    # c has no out-edges: without handling, its mass leaks each round.
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    leaky = {r.node: r.pr for r in graph.pagerank(e, iterations=5).collect()}
    kept = {
        r.node: r.pr
        for r in graph.pagerank(e, iterations=5, handle_dangling=True).collect()
    }
    assert sum(leaky.values()) < 1.0 - 1e-6
    assert sum(kept.values()) == pytest.approx(1.0, abs=1e-9)
    assert kept["c"] == max(kept.values())  # both a and b feed c


def test_pagerank_rejects_zero_iterations(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        graph.pagerank(e, iterations=0)


def test_triangle_count_known_graph(spark):
    # K4 minus one edge: triangles = 2 (abc, abd share edge ab; acd/bcd
    # broken by the missing cd edge -> graph a-b,a-c,a-d,b-c,b-d has
    # triangles abc and abd)
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")],
        "src string, dst string",
    )
    row = graph.triangle_count(e).first()
    assert (row.n_edges, row.n_triangles) == (5, 2)
    # duplicate/reversed edges and self-loops must not change the count
    noisy = e.unionByName(
        spark.createDataFrame(
            [("b", "a"), ("c", "a"), ("d", "d")], "src string, dst string"
        )
    )
    row2 = graph.triangle_count(noisy).first()
    assert (row2.n_edges, row2.n_triangles) == (5, 2)


def test_cooccurrence_edges_max_items_guard(spark):
    """Celebrity-group guard: a group with more distinct items than
    max_items is dropped from the edge build (its quadratic fan-out would
    land in one task); oversized_groups surfaces exactly that set."""
    rows = [("big", f"i{k}") for k in range(4)] + [
        ("g1", "x"), ("g1", "y"), ("g2", "x"), ("g2", "y")
    ]
    df = spark.createDataFrame(rows, "g string, item string")
    capped = {
        (r.src, r.dst): r.w
        for r in graph.cooccurrence_edges(df, "g", "item", max_items=3).collect()
    }
    assert capped == {("x", "y"): 2.0, ("y", "x"): 2.0}
    dropped = graph.oversized_groups(df, "g", "item", max_items=3).collect()
    assert [(r.group, r.n_items) for r in dropped] == [("big", 4)]
    # disabling the cap restores the big group's pairs
    full = graph.cooccurrence_edges(df, "g", "item", max_items=None)
    assert full.where(F.col("src") == "i0").count() == 3


def test_k_core_triangle_with_tail(spark):
    # triangle a-b-c plus tail c-d-e: 2-core = the triangle only
    # (e degree 1 -> removed; then d degree 1 -> removed)
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    core = graph.k_core(e, k=2)
    nodes = {r.src for r in core.select("src").distinct().collect()}
    assert nodes == {"a", "b", "c"}
    assert core.count() == 6  # 3 undirected edges x 2 directions
    # k=3: the triangle has degree 2 everywhere -> empty
    assert graph.k_core(e, k=3).isEmpty()


def test_k_core_releases_checkpoints(spark):
    sc = spark.sparkContext
    before = sc._jsc.sc().getPersistentRDDs().size()
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], "src string, dst string"
    )
    core = graph.k_core(e, k=2)
    core.count()
    after = sc._jsc.sc().getPersistentRDDs().size()
    assert after - before <= 1  # only the returned core's checkpoint


def test_k_core_rejects_bad_k(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        graph.k_core(e, k=0)
