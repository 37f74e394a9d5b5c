"""operators/sketch.py — deterministic bottom-k quantile sketch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark.operators import sketch


def test_bottomk_is_deterministic_uniform_subset(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s1 = sorted(map(tuple, sketch.bottomk_sample(ev, "value", "event_id", 64).collect()))
    s2 = sorted(map(tuple, sketch.bottomk_sample(ev, "value", "event_id", 64).collect()))
    assert s1 == s2 and len(s1) == 64
    # the sample is exactly the 64 smallest priorities over the table
    all_prio = sorted(
        (r["_p"], r["event_id"])
        for r in ev.select(
            sketch.hash_priority("event_id").alias("_p"), "event_id"
        ).collect()
    )
    assert sorted((p, i) for (i, _v, p) in s1) == all_prio[:64]


def test_bottomk_merge_is_exact(spark, sf_dir):
    """The defining property: bottom-k of the union of per-part
    bottom-ks == bottom-k of everything (what makes the streamed fold
    set-equal to the batch sketch)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    parts = [ev.where(F.col("event_id") % 3 == i) for i in range(3)]
    merged = None
    for p in parts:
        s = sketch.bottomk_sample(p, "value", "event_id", 50)
        merged = s if merged is None else merged.unionByName(s)
    refold = sketch.bottomk_sample(merged, "value", "event_id", 50)
    # note: re-sampling the merged partials re-hashes the same ids — same order
    direct = sketch.bottomk_sample(ev, "value", "event_id", 50)
    assert sorted(map(tuple, refold.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_sample_quantiles_and_error_bound(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sample = sketch.bottomk_sample(ev, "value", "event_id", 512)
    sq = {r["prob"]: r["q"] for r in sketch.sample_quantiles(sample, "value").collect()}
    eq = {r["prob"]: r["q"] for r in sketch.sample_quantiles(ev, "value").collect()}
    assert set(sq) == {0.1, 0.25, 0.5, 0.75, 0.9}
    # uniform-sample quantiles land near the exact ones (loose sanity
    # band — the registry oracle value-pins the exact arithmetic)
    lo, hi = min(eq.values()), max(eq.values())
    spread = max(hi - lo, 1e-9)
    for p in sq:
        assert abs(sq[p] - eq[p]) <= 0.35 * spread


def test_bottomk_null_ids_never_displace_hashed_rows(spark):
    df = spark.createDataFrame(
        [(None, 0.0)] + [(i, float(i)) for i in range(1, 10)],
        "id bigint, v double",
    )
    got = sketch.bottomk_sample(df, "v", "id", 5).collect()
    assert len(got) == 5 and all(r["id"] is not None for r in got)
    with pytest.raises(ValueError, match="k must be"):
        sketch.bottomk_sample(df, "v", "id", 0)


def test_sketch_psi_composes_psi_profile(spark, sf_dir):
    from building_a_rag_pipeline_with_airflow_spark.operators import drift

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = sketch.bottomk_sample(ev.where("event_type = 'view'"), "value", "event_id", 128)
    b = sketch.bottomk_sample(ev.where("event_type = 'click'"), "value", "event_id", 128)
    got = sorted(map(tuple, sketch.sketch_psi(a, b, "value", n_bins=5).collect()))
    exp = sorted(map(tuple, drift.psi_profile(a, b, "value", n_bins=5).collect()))
    assert got == exp
    # arbitrary read-time grain: a different n_bins just works
    assert sketch.sketch_psi(a, b, "value", n_bins=7).count() >= 5


def test_bottomk_plan_is_takeordered(spark, sf_dir):
    """Scale pin: the sample must compile to TakeOrderedAndProject
    (per-partition heaps), never a global sort exchange."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        sketch.bottomk_sample(ev, "value", "event_id", 256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
