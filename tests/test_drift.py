"""Drift-screen operator tests: hand-computed statistics, the
distributed prefix-sum's equality with the naive global window, and the
scale-shape assertion that the data-sized running sums are partitioned.
Value parity vs DuckDB rides tests/test_oracle_parity.py
(psi/ks/chi2/jsd/mad/km queries)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark.operators import analytics, drift, timeseries


def test_prefix_sum_equals_global_window(spark):
    df = spark.createDataFrame(
        [(float(k), float(k % 7), float(k % 3)) for k in range(500)],
        "v double, x double, y double",
    )
    got = {
        r.v: (r.x_cum, r.y_cum)
        for r in analytics.prefix_sum(df, "v", ["x", "y"], n_partitions=8).collect()
    }
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    expect = {
        r.v: (r.xc, r.yc)
        for r in df.select(
            "v", F.sum("x").over(w).alias("xc"), F.sum("y").over(w).alias("yc")
        ).collect()
    }
    assert got == expect


def test_prefix_sum_data_window_is_partitioned(spark):
    """The data-sized running-sum window must be partitioned by _pid;
    only the partition-count-sized offset frame may be global."""
    df = spark.createDataFrame([(float(k), 1.0) for k in range(100)], "v double, x double")
    out = analytics.prefix_sum(df, "v", ["x"], n_partitions=8)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln.lower()]
    assert win_lines
    data_wins = [ln for ln in win_lines if "_run_" in ln or "_pid" in ln]
    # every window over the data carries the _pid partition key
    assert any("_pid" in ln for ln in data_wins)


def test_ks_statistic_hand_computed(spark):
    # A = {1,2,3,4}, B = {3,4,5,6}: D = |F_a - F_b| peaks at x=2 (0.5 - 0)
    a = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "v double")
    b = spark.createDataFrame([(3.0,), (4.0,), (5.0,), (6.0,)], "v double")
    row = drift.ks_statistic(a, b, "v").first()
    assert (row.n_a, row.n_b) == (4, 4)
    assert row.d_stat == pytest.approx(0.5, abs=1e-9)
    # identical samples: D = 0
    same = drift.ks_statistic(a, a, "v").first()
    assert same.d_stat == 0.0


def test_psi_identical_is_zero_and_shift_detected(spark):
    base = spark.createDataFrame([(float(k),) for k in range(1000)], "v double")
    same = drift.psi_profile(base, base, "v", n_bins=10)
    assert abs(sum(r.psi_contrib for r in same.collect())) < 1e-9
    shifted = spark.createDataFrame(
        [(float(k) + 500.0,) for k in range(1000)], "v double"
    )
    psi = sum(r.psi_contrib for r in drift.psi_profile(base, shifted, "v").collect())
    assert psi > 0.25  # the standard "major shift" threshold


def test_psi_rejects_bad_bins(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        drift.psi_profile(df, df, "v", n_bins=1)


def test_chi2_hand_computed(spark):
    # 2x2 table: a = {x:30, y:10}, b = {x:10, y:30} -> chi2 = 20·80/... :
    # expected each cell 20; chi2 = 4 * (10^2/20) = 20.0
    a = spark.createDataFrame([("x",)] * 30 + [("y",)] * 10, "c string")
    b = spark.createDataFrame([("x",)] * 10 + [("y",)] * 30, "c string")
    row = drift.chi2_drift(a, b, "c").first()
    assert (row.n_categories, row.dof) == (2, 1)
    assert row.chi2 == pytest.approx(20.0, abs=1e-6)


def test_jsd_bounds(spark):
    a = spark.createDataFrame([(1, "aa bb cc")], "id int, text string")
    b = spark.createDataFrame([(1, "dd ee ff")], "id int, text string")
    # disjoint vocabularies -> exactly ln 2
    assert drift.js_divergence(a, b).first().jsd == pytest.approx(
        math.log(2), abs=1e-6
    )
    # identical -> 0
    assert drift.js_divergence(a, a).first().jsd == 0.0


def test_mad_outliers_hand_computed(spark):
    # group g: values 1..9 plus one wild outlier; median 5 of 1..9+1000 ->
    # sorted [1..9,1000], median = (5+6)/2 = 5.5; ad median likewise robust
    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    r = analytics.mad_outliers(df, "v", by=("k",), k=3.0).first()
    assert r.n == 10
    assert r.median == pytest.approx(5.5)
    # deviations |v-5.5|: [4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5]
    # sorted -> median = (2.5+2.5)/2 = 2.5
    assert r.mad == pytest.approx(2.5)
    # bound = 3*1.4826*2.5 = 11.1195 -> only the 1000 is beyond
    assert r.n_outliers == 1


def test_km_survival_textbook(spark):
    # classic: events at t=1 (1 of 5), t=3 (2 of 3), censored at t=2 (1)
    rows = [(1, True), (2, False), (3, True), (3, True), (4, False)]
    df = spark.createDataFrame(rows, "dur int, obs boolean")
    out = {r.duration: r for r in timeseries.km_survival(df, "dur", "obs").collect()}
    assert out[1].n_risk == 5 and out[1].n_events == 1
    assert out[1].survival == pytest.approx(0.8, abs=1e-6)
    assert out[2].n_risk == 4 and out[2].n_censored == 1
    assert out[2].survival == pytest.approx(0.8, abs=1e-6)  # censoring: no drop
    assert out[3].n_risk == 3 and out[3].n_events == 2
    assert out[3].survival == pytest.approx(0.8 * (1 - 2 / 3), abs=1e-6)
    assert out[4].n_risk == 1 and out[4].n_censored == 1


def test_km_survival_exhausted_risk_set_is_zero(spark):
    rows = [(1, True), (2, True)]
    df = spark.createDataFrame(rows, "dur int, obs boolean")
    out = {r.duration: r.survival for r in timeseries.km_survival(df, "dur", "obs").collect()}
    assert out[1] == pytest.approx(0.5)
    assert out[2] == 0.0


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_drift_invariants_random_frames(spark, seed):
    """Mathematical invariants over randomized inputs (seeded — the
    cheap-frame analogue of the chunker's hypothesis suite): every PSI
    contribution is non-negative ((pa−pb) and ln(pa/pb) always share a
    sign), KS ∈ [0,1], JSD ∈ [0, ln 2], chi2 ≥ 0 with dof = k−1."""
    import random

    rng = random.Random(seed)
    a = spark.createDataFrame(
        [(rng.gauss(100.0, 15.0),) for _ in range(400)], "v double"
    )
    b = spark.createDataFrame(
        [(rng.gauss(110.0, 25.0),) for _ in range(300)], "v double"
    )
    psi_rows = drift.psi_profile(a, b, "v").collect()
    assert all(r.psi_contrib >= 0 for r in psi_rows)
    assert sum(r.n_base for r in psi_rows) == 400
    assert sum(r.n_new for r in psi_rows) == 300

    ks = drift.ks_statistic(a, b, "v").first()
    assert 0.0 <= ks.d_stat <= 1.0
    assert (ks.n_a, ks.n_b) == (400, 300)

    cats_a = spark.createDataFrame(
        [(rng.choice("xyz"),) for _ in range(200)], "c string"
    )
    cats_b = spark.createDataFrame(
        [(rng.choice("xyzw"),) for _ in range(200)], "c string"
    )
    chi = drift.chi2_drift(cats_a, cats_b, "c").first()
    assert chi.chi2 >= 0.0
    assert chi.dof == chi.n_categories - 1

    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    ta = spark.createDataFrame(
        [(i, " ".join(rng.choices(words, k=20))) for i in range(20)],
        "id int, text string",
    )
    tb = spark.createDataFrame(
        [(i, " ".join(rng.choices(words[2:] + ["zeta"], k=20))) for i in range(20)],
        "id int, text string",
    )
    jsd = drift.js_divergence(ta, tb).first().jsd
    assert 0.0 <= jsd <= math.log(2) + 1e-9


def test_drift_empty_side_raises_loudly(spark):
    """An empty comparison side must raise a clear ValueError up front,
    not a mid-job ANSI DIVIDE_BY_ZERO from the proportion math (the
    failure this guards was a raw SparkArithmeticException)."""
    a = spark.createDataFrame([(1.0,)], "v double")
    empty = spark.createDataFrame([], "v double")
    for fn in (drift.psi_profile, drift.ks_statistic):
        with pytest.raises(ValueError, match="empty"):
            fn(a, empty, "v")
        with pytest.raises(ValueError, match="empty"):
            fn(empty, a, "v")
    ec = spark.createDataFrame([], "c string")
    with pytest.raises(ValueError, match="empty"):
        drift.chi2_drift(spark.createDataFrame([("x",)], "c string"), ec, "c")
    et = spark.createDataFrame([], "id int, text string")
    with pytest.raises(ValueError, match="empty"):
        drift.js_divergence(spark.createDataFrame([(1, "a b")], "id int, text string"), et)


def test_mad_outliers_global_path(spark):
    df = spark.createDataFrame(
        [("x", float(v)) for v in range(1, 11)], "k string, v double"
    )
    r = analytics.mad_outliers(df, "v").first()  # no group keys: one row
    assert (r.median, r.mad, r.n, r.n_outliers) == (5.5, 2.5, 10, 0)


def test_embedding_drift_identity_shift_and_guards(spark):
    from building_a_rag_pipeline_with_airflow_spark.operators import drift

    base = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0]) for i in range(20)],
        "vec_id bigint, embedding array<double>",
    )
    # identical snapshots: no drift at all
    r = drift.embedding_drift(base, base).first()
    assert r["centroid_cos"] == 1.0 and r["centroid_l2_dist"] == 0.0
    assert r["n_base"] == 20 and r["n_cur"] == 20
    assert r["mean_norm_base"] == r["mean_norm_cur"] == 1.0

    # orthogonally shifted corpus: full directional drift, norms equal
    shifted = spark.createDataFrame(
        [(i, [0.0, 1.0, 0.0]) for i in range(10)],
        "vec_id bigint, embedding array<double>",
    )
    r2 = drift.embedding_drift(base, shifted).first()
    assert r2["centroid_cos"] == 0.0
    assert abs(r2["centroid_l2_dist"] - 2 ** 0.5) < 1e-6
    # scale drift: same direction, doubled norms — cosine blind, norm not
    scaled = base.select(
        "vec_id",
        F.transform("embedding", lambda x: x * 2).alias("embedding"),
    )
    r3 = drift.embedding_drift(base, scaled).first()
    assert r3["centroid_cos"] == 1.0 and r3["mean_norm_cur"] == 2.0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="dims differ"):
        drift.embedding_drift(
            base,
            spark.createDataFrame(
                [(1, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
            ),
        )
    with _pytest.raises(ValueError):
        drift.embedding_drift(base, base.where(F.col("vec_id") < 0))


def test_embedding_drift_zero_centroid_nan_sentinel(spark):
    """A snapshot whose centroid is the zero vector has no direction:
    centroid_cos must be the explicit NaN sentinel, never a silent NULL
    (the loud-verdict discipline of the drift family)."""
    import math

    from building_a_rag_pipeline_with_airflow_spark.operators import drift

    base = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    cancelling = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, [-1.0, -1.0])],
        "vec_id bigint, embedding array<double>",
    )
    r = drift.embedding_drift(base, cancelling).first()
    assert r["centroid_cos"] is not None and math.isnan(r["centroid_cos"])
    # the other metrics stay readable: centroid [1,0] vs [0,0]
    assert r["centroid_l2_dist"] == 1.0
    assert r["n_base"] == 1 and r["n_cur"] == 2
