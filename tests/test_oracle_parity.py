"""Differential tests: every oracle-bearing query in the registry runs on
Spark AND on DuckDB (same parquet) and must match on row count, column
names, and order-insensitive values — a local replica of the driver's
CORRECTNESS gate, run at sf0.001 so regressions surface before the round
boundary.
"""

from __future__ import annotations

import math

import pytest

from building_a_rag_pipeline_with_airflow_spark.queries import REGISTRY

ORACLE_QUERIES = sorted(n for n, (_, sql) in REGISTRY.items() if sql is not None)
ROWS_ONLY_QUERIES = sorted(n for n, (_, sql) in REGISTRY.items() if sql is None)


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # queries round explicitly; this guards only representation noise
        return round(v, 9)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _rows(seq_of_tuples, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm_cell(row[i]) for i in order) for row in seq_of_tuples
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, sf_dir, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={spark_cols} duckdb={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    a = _rows(spark_rows, spark_cols)
    b = _rows(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 5
    assert "rank" in df.columns and "score" in df.columns
    # oracle keys must be a subset of query keys
    assert set(e.oracle_sql()) <= set(e.queries())


def test_driver_window_invariants():
    """The rotation window the driver actually checks (the FIRST 50
    all_queries() entries) must be exactly the enumerated round window:
    50 unique registered names, every one oracle-bearing (a rows-only
    entry in the window would burn a correctness slot on a weaker
    check). Guards the rotation mechanism itself — a typo'd window name
    or a rows-only slip would otherwise surface one round late in
    CORRECTNESS_r{N}.json."""
    from building_a_rag_pipeline_with_airflow_spark.queries import (
        _NEW_R16,
        _R16_WINDOW,
        all_queries,
    )

    window = _R16_WINDOW
    assert len(window) == 50
    assert len(set(window)) == 50
    missing = [n for n in window if n not in REGISTRY]
    assert not missing, f"window names not in registry: {missing}"
    rows_only = [n for n in window if REGISTRY[n][1] is None]
    assert not rows_only, f"rows-only entries in the window: {rows_only}"
    first50 = list(all_queries())[:50]
    assert set(first50) == set(window)
    # the post-freeze queue only ever holds oracle-bearing names
    assert all(n in REGISTRY and REGISTRY[n][1] is not None for n in _NEW_R16)
