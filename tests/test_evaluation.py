"""Hand-computed pins for the ranking-quality evaluation operator
(NDCG@k / MRR@k / AP@k) — the rank-side completion of the recall@k
story."""

import math

import pytest
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark.operators import evaluation


def _fixed(x: float) -> float:
    return round(x * 1_000_000) / 1_000_000


def test_rank_quality_hand_computed(spark):
    """Three queries covering the whole matrix: A = partial hits with an
    unretrieved high-grade doc (NDCG < 1, MRR from rank 2), B = nothing
    judged (all zeros), C = judged but nothing relevant retrieved."""
    results = spark.createDataFrame(
        [
            ("A", "d1", 1), ("A", "d2", 2), ("A", "d3", 3),
            ("B", "d1", 1),
            ("C", "d7", 1),
        ],
        "q_id string, doc_id string, rank int",
    )
    relevance = spark.createDataFrame(
        [
            ("A", "d2", 2.0), ("A", "d3", 1.0), ("A", "d9", 3.0),
            ("C", "d8", 1.0),
        ],
        "q_id string, doc_id string, rel double",
    )
    got = {
        r["q_id"]: r
        for r in evaluation.rank_quality(results, relevance, k=3).collect()
    }
    # A: DCG = 0/log2(2) + 2/log2(3) + 1/log2(4);
    #    IDCG over (d9=3, d2=2, d3=1) = 3/log2(2) + 2/log2(3) + 1/log2(4)
    dcg = 2.0 / math.log2(3) + 1.0 / math.log2(4)
    idcg = 3.0 + 2.0 / math.log2(3) + 1.0 / math.log2(4)
    assert got["A"]["dcg_at_k"] == _fixed(dcg)
    assert got["A"]["ndcg_at_k"] == _fixed(dcg / idcg)
    assert got["A"]["mrr_at_k"] == 0.5  # first relevant at rank 2
    # AP@3: hits at ranks 2 and 3 -> (1/2 + 2/3) / min(n_rel=3, k=3)
    assert got["A"]["ap_at_k"] == _fixed((0.5 + 2.0 / 3.0) / 3.0)
    assert got["A"]["n_rel_retrieved"] == 2 and got["A"]["n_rel"] == 3
    # B: unjudged query scores zero everywhere
    assert (
        got["B"]["ndcg_at_k"] == 0.0
        and got["B"]["mrr_at_k"] == 0.0
        and got["B"]["ap_at_k"] == 0.0
        and got["B"]["n_rel"] == 0
    )
    # C: judged, but the system retrieved none of it
    assert got["C"]["ndcg_at_k"] == 0.0 and got["C"]["mrr_at_k"] == 0.0
    assert got["C"]["ap_at_k"] == 0.0
    assert got["C"]["n_rel_retrieved"] == 0 and got["C"]["n_rel"] == 1


def test_rank_quality_k_cut_and_duplicate_labels(spark):
    """Rank k+1 hits are invisible; duplicate (q, doc) labels collapse
    to their max; a perfect ordering scores NDCG exactly 1."""
    results = spark.createDataFrame(
        [("A", "d1", 1), ("A", "d2", 2), ("A", "d3", 3)],
        "q_id string, doc_id string, rank int",
    )
    relevance = spark.createDataFrame(
        [
            ("A", "d1", 2.0), ("A", "d1", 1.0),  # dup label -> max 2.0
            ("A", "d2", 1.0),
            ("A", "d3", 3.0),  # outside k=2: drops from DCG and IDCG@2
        ],
        "q_id string, doc_id string, rel double",
    )
    row = evaluation.rank_quality(results, relevance, k=2).collect()[0]
    # top-2 retrieved = (d1=2, d2=1); ideal top-2 = (d3=3, d1=2)
    dcg = 2.0 + 1.0 / math.log2(3)
    idcg = 3.0 + 2.0 / math.log2(3)
    assert row["dcg_at_k"] == _fixed(dcg)
    assert row["ndcg_at_k"] == _fixed(dcg / idcg)
    assert row["mrr_at_k"] == 1.0
    # AP@2: hits at ranks 1 and 2 -> (1/1 + 2/2) / min(n_rel=3, k=2) = 1
    # — min(n_rel, k) (not plain n_rel) is what lets a fully-relevant
    # prefix score 1.0 when more positives exist than k slots
    assert row["ap_at_k"] == 1.0
    # perfect ordering at k covering all labels -> exactly 1.0
    perfect = spark.createDataFrame(
        [("A", "d3", 1), ("A", "d1", 2), ("A", "d2", 3)],
        "q_id string, doc_id string, rank int",
    )
    full = evaluation.rank_quality(perfect, relevance, k=3).collect()[0]
    assert full["ndcg_at_k"] == 1.0 and full["mrr_at_k"] == 1.0
    assert full["ap_at_k"] == 1.0


def test_calibration_report_hand_computed(spark):
    """Hand-computed bins incl. the p = 1.0 top-bin clamp, zero-filled
    empty bins with a stable all-bins schema, and 4dp fixed means."""
    df = spark.createDataFrame(
        [
            (0.05, 0), (0.05, 1),            # bin 0: mp .05, fp .5
            (0.25, 1),                        # bin 2: perfect? mp .25 fp 1
            (1.0, 1),                         # p=1.0 clamps into bin 9
        ],
        "p double, y int",
    )
    rows = {
        r["bin"]: r
        for r in evaluation.calibration_report(df, "p", "y", n_bins=10).collect()
    }
    assert sorted(rows) == list(range(10))  # stable all-bins schema
    b0 = rows[0]
    assert b0["n"] == 2 and b0["mean_pred"] == 0.05 and b0["frac_pos"] == 0.5
    assert b0["abs_gap"] == 0.45 and b0["p_lo"] == 0.0 and b0["p_hi"] == 0.1
    assert rows[2]["n"] == 1 and rows[2]["abs_gap"] == 0.75
    assert rows[9]["n"] == 1 and rows[9]["mean_pred"] == 1.0  # clamp
    empty = rows[5]
    assert empty["n"] == 0 and empty["mean_pred"] == 0.0 and empty["abs_gap"] == 0.0


def test_calibration_report_guards(spark):
    """Out-of-range probabilities and non-binary labels fail loudly —
    a silently dropped/clamped row biases the rates the report audits."""
    bad_p = spark.createDataFrame([(1.5, 1)], "p double, y int")
    with pytest.raises(Exception, match="probability"):
        evaluation.calibration_report(bad_p, "p", "y").collect()
    bad_y = spark.createDataFrame([(0.5, 2)], "p double, y int")
    with pytest.raises(Exception, match="0/1"):
        evaluation.calibration_report(bad_y, "p", "y").collect()
    null_p = spark.createDataFrame([(None, 1)], "p double, y int")
    with pytest.raises(Exception, match="probability"):
        evaluation.calibration_report(null_p, "p", "y").collect()
    with pytest.raises(ValueError, match="n_bins"):
        evaluation.calibration_report(bad_p, "p", "y", n_bins=0)


def test_rank_quality_rejects_bad_k(spark):
    df = spark.createDataFrame(
        [("A", "d1", 1)], "q_id string, doc_id string, rank int"
    )
    with pytest.raises(ValueError, match="k must be >= 1"):
        evaluation.rank_quality(df, df.withColumnRenamed("rank", "rel"), k=0)


def test_rank_quality_query_past_k_scores_zero_not_dropped(spark):
    """A query present in results ONLY past rank k must still appear,
    scoring zeros (review finding: dropping it silently inflates any
    mean over the output) — with its judged n_rel intact."""
    results = spark.createDataFrame(
        [("A", "d1", 1), ("B", "d2", 6)],
        "q_id string, doc_id string, rank int",
    )
    relevance = spark.createDataFrame(
        [("B", "d2", 1.0)], "q_id string, doc_id string, rel double"
    )
    got = {
        r["q_id"]: r
        for r in evaluation.rank_quality(results, relevance, k=5).collect()
    }
    assert set(got) == {"A", "B"}
    b = got["B"]
    assert (
        b["dcg_at_k"] == 0.0
        and b["ndcg_at_k"] == 0.0
        and b["mrr_at_k"] == 0.0
        and b["ap_at_k"] == 0.0
    )
    assert b["n_rel_retrieved"] == 0 and b["n_rel"] == 1


def _ece(report_rows) -> float:
    """Guo et al. 2017 ECE: n-weighted mean of the per-bin abs gaps."""
    tot = sum(r["n"] for r in report_rows)
    return sum(r["n"] * r["abs_gap"] for r in report_rows) / tot


def _overconfident(spark, seed_shift: int = 0):
    """Deterministic overconfident classifier: in bin i the scores say
    p_i = (i+0.5)/10 but the true positive rate is p_i^2 — monotone
    (isotonic's precondition) and badly miscalibrated at mid range.
    20 rows per bin; positives are the FIRST round(20*p_i^2) rows, so
    the set is exact, no RNG. ``seed_shift`` permutes nothing material —
    it exists so fit and eval sets are distinct DataFrames with the
    identical distribution (the honest holdout shape)."""
    rows = []
    for i in range(10):
        p = (i + 0.5) / 10
        k = round(20 * p * p)
        for j in range(20):
            rows.append((p, 1 if (j + seed_shift) % 20 < k else 0))
    return spark.createDataFrame(rows, "p double, y int")


def test_calibrate_binned_reduces_ece(spark):
    """The r11-directive pin: post-calibration ECE strictly below
    pre-calibration on a skewed synthetic, via the binned fit."""
    fit = _overconfident(spark)
    ev = _overconfident(spark, seed_shift=3)
    pre = _ece(evaluation.calibration_report(ev, "p", "y", n_bins=10).collect())
    applied = evaluation.calibrate_probabilities(
        ev, fit, "p", "y", method="binned", n_bins=10
    )
    post = _ece(
        evaluation.calibration_report(
            applied.select(F.col("p_cal").alias("p"), "y"), "p", "y", n_bins=10
        ).collect()
    )
    # identical fit/eval distributions: binned mapping is exact, so the
    # re-audit reads (near-)zero gaps — strictly below, and tiny
    assert post < pre
    assert post <= 1e-3 and pre > 0.05


def test_calibrate_isotonic_reduces_ece_and_preserves_order(spark):
    """Isotonic fit: ECE improves AND score order is preserved exactly
    (the monotone contract binned calibration cannot make)."""
    fit = _overconfident(spark)
    ev = _overconfident(spark, seed_shift=7)
    pre = _ece(evaluation.calibration_report(ev, "p", "y", n_bins=10).collect())
    applied = evaluation.calibrate_probabilities(
        ev, fit, "p", "y", method="isotonic"
    )
    post = _ece(
        evaluation.calibration_report(
            applied.select(F.col("p_cal").alias("p"), "y"), "p", "y", n_bins=10
        ).collect()
    )
    assert post < pre
    got = applied.select("p", "p_cal").distinct().orderBy("p").collect()
    cals = [r["p_cal"] for r in got]
    assert cals == sorted(cals)  # monotone: rank consumers unaffected
    assert all(0.0 <= c <= 1.0 for c in cals)


def test_calibrate_binned_mapping_and_identity_fallback(spark):
    """The fitted mapping is the per-bin empirical rate at 6dp; a probe
    row whose bin was EMPTY on the fit set keeps its raw score."""
    fit = spark.createDataFrame(
        [(0.05, 0), (0.05, 1), (0.05, 1), (0.95, 1), (0.95, 0)],
        "p double, y int",
    )
    mapping = {
        r["bin"]: r
        for r in evaluation.fit_binned_calibration(fit, "p", "y", 10).collect()
    }
    assert set(mapping) == {0, 9}
    assert mapping[0]["n_fit"] == 3
    assert mapping[0]["p_cal"] == round(2 / 3, 6)
    assert mapping[9]["p_cal"] == 0.5
    probe = spark.createDataFrame(
        [(0.02, 1), (0.99, 0), (0.55, 1)], "p double, y int"
    )
    got = {
        r["p"]: r["p_cal"]
        for r in evaluation.calibrate_probabilities(
            probe, fit, "p", "y", method="binned", n_bins=10
        ).collect()
    }
    assert got[0.02] == round(2 / 3, 6)  # bin 0 -> fitted rate
    assert got[0.99] == 0.5              # bin 9 -> fitted rate
    assert got[0.55] == 0.55             # bin 5 empty on fit: identity


def test_calibrate_probabilities_guards(spark):
    """Probe-side scores are re-guarded per row (an out-of-range probe
    would silently land in no bin), and unknown methods fail fast."""
    fit = spark.createDataFrame([(0.5, 1), (0.5, 0)], "p double, y int")
    bad_probe = spark.createDataFrame([(1.5, 0)], "p double, y int")
    with pytest.raises(Exception, match="probability"):
        evaluation.calibrate_probabilities(
            bad_probe, fit, "p", "y", method="binned"
        ).collect()
    ok_probe = spark.createDataFrame([(0.5, 0)], "p double, y int")
    with pytest.raises(ValueError, match="unknown method"):
        evaluation.calibrate_probabilities(ok_probe, fit, "p", "y", method="platt")


def test_calibrate_probabilities_empty_fit_raises(spark):
    """An empty fit set must fail loudly for BOTH methods: under the
    binned identity fallback it would silently return the raw scores
    relabeled as calibrated; an isotonic fit over zero points is
    undefined."""
    fit = spark.createDataFrame([], "p double, y int")
    probe = spark.createDataFrame([(0.5, 0)], "p double, y int")
    for m in ("binned", "isotonic"):
        with pytest.raises(ValueError, match="fit set is empty"):
            evaluation.calibrate_probabilities(probe, fit, "p", "y", method=m)


def test_calibrate_composes_with_nb_classifier(spark, sf_dir):
    """The r11 directive's stated composition: `nb_domain_classify`
    margins mapped through a sigmoid become the keep/drop gate's
    probability, the label is prediction-correctness against held-out
    truth, and the fitted calibration strictly improves the
    reliability audit on a DISJOINT eval half — the full audit → fit →
    re-audit loop over the engine's own classifier, not a synthetic.
    (Measured at sf0.001: the sigmoid-margin scores are badly
    overconfident, pre-ECE ≈ 0.56; binned ≈ 0.03, isotonic ≈ 0.08.)"""
    from building_a_rag_pipeline_with_airflow_spark import schemas
    from building_a_rag_pipeline_with_airflow_spark.operators import curation

    docs = schemas.load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    train = docs.where(F.col("doc_id") % 3 == 0)
    held = docs.where(F.col("doc_id") % 3 != 0)
    scored = curation.nb_domain_classify(
        train, held.drop("lang"), n_buckets=256
    )
    j = scored.join(held.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias("p"),
        F.when(F.col("pred") == F.col("lang"), 1).otherwise(0).alias("y"),
    )
    fit = j.where(F.col("doc_id") % 2 == 0)
    ev = j.where(F.col("doc_id") % 2 == 1)
    pre = _ece(evaluation.calibration_report(ev, "p", "y", n_bins=5).collect())
    assert pre > 0.2  # the raw gate probability is badly overconfident
    for method, bound in (("binned", 0.2), ("isotonic", 0.3)):
        applied = evaluation.calibrate_probabilities(
            ev, fit, "p", "y", method=method, n_bins=5
        )
        post = _ece(
            evaluation.calibration_report(
                applied.select(F.col("p_cal").alias("p"), "y"),
                "p", "y", n_bins=5,
            ).collect()
        )
        assert post < pre and post < bound


def test_threshold_curve_hand_computed(spark):
    """Curve over a 4-row grid: descending-threshold cumulative counts,
    fixed-point ratios, and the operating-point picks — lowest
    qualifying threshold wins, unreachable floors return None."""
    df = spark.createDataFrame(
        [(0.9, 1), (0.9, 0), (0.7, 1), (0.5, 0)], "p double, y int"
    )
    rows = {
        r["threshold"]: r
        for r in evaluation.threshold_curve(df, "p", "y").collect()
    }
    assert sorted(rows) == [0.5, 0.7, 0.9]
    assert rows[0.9]["n_kept"] == 2 and rows[0.9]["precision"] == 0.5
    assert rows[0.9]["recall"] == 0.5 and rows[0.9]["frac_kept"] == 0.5
    assert rows[0.7]["n_kept"] == 3
    assert rows[0.7]["precision"] == round(2 / 3, 6)
    assert rows[0.7]["recall"] == 1.0
    assert rows[0.5]["n_kept"] == 4 and rows[0.5]["precision"] == 0.5
    # lowest threshold meeting the floor keeps the most data
    assert evaluation.select_threshold(df, "p", "y", min_precision=0.6) == 0.7
    assert evaluation.select_threshold(df, "p", "y", min_precision=0.5) == 0.5
    # no grid cut reaches 0.7 precision -> None, never a fake top-cut
    assert evaluation.select_threshold(df, "p", "y", min_precision=0.7) is None


def test_select_threshold_floor_uses_unrounded_precision(spark):
    """The precision floor compares against the EXACT kept-positive
    ratio, not the curve's published 6dp fixed point: a cut whose true
    precision is 2/3 (= 0.6666…) must NOT qualify for a 0.666667 floor
    even though the 6dp-rounded curve column reads exactly 0.666667."""
    df = spark.createDataFrame(
        [(0.9, 1), (0.9, 1), (0.9, 0), (0.1, 0)], "p double, y int"
    )
    curve = {
        r["threshold"]: r
        for r in evaluation.threshold_curve(df, "p", "y").collect()
    }
    # the published column DOES round up to the floor value…
    assert curve[0.9]["precision"] == 0.666667
    # …but the selection must see the raw 2/3 < 0.666667 and refuse
    assert (
        evaluation.select_threshold(df, "p", "y", min_precision=0.666667)
        is None
    )
    # a floor the exact ratio genuinely meets still selects as before
    assert (
        evaluation.select_threshold(df, "p", "y", min_precision=0.6) == 0.9
    )


def test_threshold_curve_zero_positives_and_guards(spark):
    """All-negative input: recall pins to 0.0 (no 0/0 crash under ANSI);
    the calibration family's guards and the grid bound apply."""
    neg = spark.createDataFrame([(0.9, 0), (0.1, 0)], "p double, y int")
    rows = evaluation.threshold_curve(neg, "p", "y").collect()
    assert all(r["recall"] == 0.0 and r["precision"] == 0.0 for r in rows)
    bad = spark.createDataFrame([(1.5, 0)], "p double, y int")
    with pytest.raises(Exception, match="probability"):
        evaluation.threshold_curve(bad, "p", "y").collect()
    with pytest.raises(ValueError, match="decimals"):
        evaluation.threshold_curve(neg, "p", "y", decimals=9)
    with pytest.raises(ValueError, match="min_precision"):
        evaluation.select_threshold(neg, "p", "y", min_precision=0.0)


def test_calibrate_out_col_replacement_consistent_across_methods(spark):
    """Both methods REPLACE a pre-existing out_col (binned via
    withColumn, isotonic by dropping it before MLlib's transform, which
    refuses duplicate prediction columns) — re-calibrating an
    already-calibrated frame must not be method-dependent."""
    fit = spark.createDataFrame(
        [(0.2, 0), (0.2, 1), (0.8, 1), (0.8, 1)], "p double, y int"
    )
    probe = spark.createDataFrame(
        [(0.25, 1, 99.0)], "p double, y int, p_cal double"
    )
    for method in ("binned", "isotonic"):
        got = evaluation.calibrate_probabilities(
            probe, fit, "p", "y", method=method
        ).collect()[0]
        assert got["p_cal"] != 99.0 and 0.0 <= got["p_cal"] <= 1.0


def test_fit_side_guard_errors_name_the_fit_not_the_report(spark):
    """A bad FIT row must blame the operator the caller INVOKED, never
    'calibration_report' (a function they never called) — the
    who-attribution the guards exist to provide. Since r14 the binned
    path threads the public entry point's name through the shared
    fit/apply helpers (so classifier_gate failures read
    'classifier_gate', pinned in test_curation.py), which means BOTH
    methods here blame 'calibrate_probabilities'; a direct
    fit_binned_calibration call keeps its own name."""
    bad_fit = spark.createDataFrame([(1.5, 1)], "p double, y int")
    probe = spark.createDataFrame([(0.5, 0)], "p double, y int")
    for method in ("binned", "isotonic"):
        with pytest.raises(Exception, match="calibrate_probabilities"):
            evaluation.calibrate_probabilities(
                probe, bad_fit, "p", "y", method=method
            )
    with pytest.raises(Exception, match="fit_binned_calibration"):
        evaluation.fit_binned_calibration(bad_fit, "p", "y").collect()


def test_calibrate_in_place_out_col_equals_prob_col(spark):
    """out_col == prob_col (calibrate in place) must work for BOTH
    methods: the isotonic path derives the guarded feature before
    dropping the column it replaces."""
    fit = spark.createDataFrame(
        [(0.2, 0), (0.2, 1), (0.8, 1), (0.8, 1)], "p double, y int"
    )
    probe = spark.createDataFrame([(0.25, 1)], "p double, y int")
    for method in ("binned", "isotonic"):
        got = evaluation.calibrate_probabilities(
            probe, fit, "p", "y", method=method, out_col="p"
        ).collect()[0]
        assert 0.0 <= got["p"] <= 1.0 and got["p"] != 0.25


# ---------------------------------------------------------------------
# Randomized differential check of the threshold family against a pure-
# Python reference (seeded — deterministic across runs): the hand-
# computed cases above pin small exact curves; this cross-validates the
# grid rounding, cumulative counts, and fixed-point ratios over wider,
# messier inputs (boundary scores 0/1, grid-half-boundary values, heavy
# ties, all-positive / all-negative extremes) than fixtures enumerate.
# The reference replicates Spark's F.round semantics exactly:
# BigDecimal.valueOf(double) == Decimal(repr(double)), HALF_UP.


def _round_half_up_int(x: float) -> int:
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(float(x))).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def _fix6(x: float) -> float:
    return _round_half_up_int(x * 1_000_000) / 1_000_000


def _reference_curve(rows, decimals):
    scale = 10 ** decimals
    grid = {}
    for p, y in rows:
        t = _round_half_up_int(p * scale) / scale
        n, pos = grid.get(t, (0, 0))
        grid[t] = (n + 1, pos + y)
    tot_n = sum(n for n, _ in grid.values())
    tot_pos = sum(pos for _, pos in grid.values())
    out, n_kept, kept_pos = [], 0, 0
    for t in sorted(grid, reverse=True):
        n, pos = grid[t]
        n_kept += n
        kept_pos += pos
        out.append(
            (
                t,
                n_kept,
                _fix6(n_kept / tot_n),
                _fix6(kept_pos / n_kept),
                _fix6(kept_pos / tot_pos) if tot_pos > 0 else 0.0,
            )
        )
    return out


def _random_scored(rng, n):
    """Messy (p, y) rows: uniforms, exact grid-half boundaries (x.xx5 —
    the HALF_UP stress), hard 0.0/1.0 edges, and heavy ties."""
    rows = []
    for _ in range(n):
        kind = rng.random()
        if kind < 0.5:
            p = rng.random()
        elif kind < 0.7:
            p = (rng.randrange(0, 100) + 0.5) / 100  # 2dp half-boundary
        elif kind < 0.85:
            p = rng.choice([0.0, 1.0, 0.25, 0.25, 0.75])  # edges + ties
        else:
            p = rng.randrange(0, 1001) / 1000
        rows.append((float(p), rng.randrange(0, 2)))
    return rows


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_threshold_curve_matches_python_reference(spark, seed):
    import random

    rng = random.Random(seed)
    rows = _random_scored(rng, 300)
    if seed == 7:  # degenerate label extremes on one seed
        rows = [(p, 0) for p, _ in rows[:150]] + rows[150:]
    df = spark.createDataFrame(rows, "p double, y int")
    got = [
        (r["threshold"], r["n_kept"], r["frac_kept"], r["precision"], r["recall"])
        for r in evaluation.threshold_curve(df, "p", "y", decimals=2)
        .orderBy(F.desc("threshold"))
        .collect()
    ]
    assert got == _reference_curve(rows, 2)


@pytest.mark.parametrize("seed", [3, 11])
def test_select_threshold_floor_property(spark, seed):
    """For random data and a sweep of floors: a returned cut's EXACT
    kept-positive ratio meets the floor, no lower grid threshold also
    meets it (lowest-qualifying rule), and None is returned iff no grid
    cut qualifies."""
    import random

    rng = random.Random(seed)
    rows = _random_scored(rng, 200)
    df = spark.createDataFrame(rows, "p double, y int")
    ref = _reference_curve(rows, 2)
    exact = []  # (threshold, exact kept ratio) via integer counts
    n_kept, kept_pos = 0, 0
    scale = 100
    grid = {}
    for p, y in rows:
        t = _round_half_up_int(p * scale) / scale
        n, pos = grid.get(t, (0, 0))
        grid[t] = (n + 1, pos + y)
    for t in sorted(grid, reverse=True):
        n, pos = grid[t]
        n_kept += n
        kept_pos += pos
        exact.append((t, kept_pos / n_kept))
    for floor in (0.3, 0.5, 0.62, 0.8, 0.95, 1.0):
        got = evaluation.select_threshold(
            df, "p", "y", min_precision=floor, decimals=2
        )
        qualifying = [t for t, r in exact if r >= floor]
        if not qualifying:
            assert got is None, (floor, got)
        else:
            assert got == min(qualifying), (floor, got, min(qualifying))
