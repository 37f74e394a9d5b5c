"""Time-series regularization: resample → dense spine → gap fill →
linear interpolation → rolling z-score anomaly flags.

The reference has no time-series surface (its closest shape is the
quarter-finder flow — ``Frontend/app.py:449-465`` posting a date to the
``Backend/api.py:22-26`` quarter mapping) — but any analytics engine
fed by event streams needs the
"make the series regular, then reason about it" ladder, and every rung
here is shaped for 100 TB:

* **resample** — one hash aggregate on ``(key, period)``; the period is
  epoch-aligned integer division so bucketing is reproducible by any
  engine (same convention as :func:`analytics.cohort_retention`).
* **dense spine** — ``sequence()`` per key from the key's own min/max
  period, then ``explode``. The explode fans one row per key out to
  per-period rows; the expensive raw scan happened in the resample, the
  spine costs O(periods) per key, not O(events).
* **gap fill / interpolation** — per-key ordered windows carrying the
  previous/next OBSERVED value (``last(..., ignorenulls)`` forward and
  its mirror backward). Windows are partitioned by the series key, so
  partitions hold one series' periods — thousands of rows, never the
  whole table. A single series so hot its period count alone breaks a
  partition gets the same treatment as the hot-key as-of join
  (:func:`temporal.asof_join` bucketed variant): chunk periods into
  coarse blocks and carry block boundaries across, not implemented here
  because periods-per-key is bounded by calendar time, not data volume.
* **z-score anomalies** — trailing RANGE window mean/stddev per key over
  the REGULAR series; |z| > threshold flags the row. Same partitioning
  argument as above.

Edge semantics (both the Spark side and any SQL oracle must agree):
interpolation is defined only strictly between two observed periods;
leading/trailing gaps stay NULL (no extrapolation). ``stddev_samp`` of a
one-row window is NULL, so the z-score of a series' first period is NULL,
not 0.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    by: Sequence[str] = (),
    period_seconds: int = 86400,
    agg: str = "avg",
    out_col: str = "value",
) -> DataFrame:
    """Aggregate ``value_col`` into epoch-aligned periods of
    ``period_seconds`` per ``by`` key. One hash aggregate; the period
    expression is ``floor(epoch / period)`` so any engine reproduces the
    buckets bit-for-bit. ``agg`` ∈ {avg, sum, min, max, count}."""
    if agg not in {"avg", "sum", "min", "max", "count"}:
        raise ValueError(f"unsupported agg: {agg!r}")
    per = (
        F.floor(F.col(ts_col).cast("timestamp").cast("double") / int(period_seconds))
        .cast("bigint")
        .alias("period")
    )
    fn = getattr(F, agg if agg != "count" else "count")
    return (
        df.groupBy(*by, per)
        .agg(fn(value_col).alias(out_col))
    )


def fill_gaps(
    period_df: DataFrame,
    by: Sequence[str],
    period_col: str = "period",
    value_cols: Sequence[str] = ("value",),
) -> DataFrame:
    """Densify a resampled frame: for each ``by`` key, emit EVERY period
    between that key's min and max, left-joining the observed values (so
    missing periods appear with NULLs).

    Plan: one small aggregate per key (min/max), ``sequence`` + explode
    to build the spine, then a join back on ``(by…, period)`` — all
    shuffles on the same composite key. Spine size is periods-per-key,
    bounded by calendar span, not event count."""
    keys = [*by, period_col]
    spine = (
        period_df.groupBy(*by)
        .agg(F.min(period_col).alias("_lo"), F.max(period_col).alias("_hi"))
        .select(
            *by,
            F.explode(F.sequence("_lo", "_hi")).alias(period_col),
        )
    )
    return spine.join(period_df.select(*keys, *value_cols), keys, "left")


def interpolate_linear(
    dense_df: DataFrame,
    by: Sequence[str],
    period_col: str = "period",
    value_col: str = "value",
    out_col: str = "value_interp",
) -> DataFrame:
    """Linear interpolation over a DENSE per-key series (run
    :func:`fill_gaps` first): NULL periods take
    ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)`` from the
    nearest observed neighbors; leading/trailing NULLs (no neighbor on
    one side) stay NULL.

    Two per-key ordered windows (forward carry of the last observed
    value+period, backward carry of the next) — each partition holds one
    series, no global sort anywhere."""
    fwd = (
        Window.partitionBy(*by)
        .orderBy(period_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy(*by)
        .orderBy(period_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    obs_p = F.when(v.isNotNull(), F.col(period_col))
    prev_v = F.last(v, ignorenulls=True).over(fwd)
    prev_p = F.last(obs_p, ignorenulls=True).over(fwd)
    next_v = F.first(v, ignorenulls=True).over(bwd)
    next_p = F.first(obs_p, ignorenulls=True).over(bwd)
    frac = (F.col(period_col) - prev_p).cast("double") / (
        (next_p - prev_p).cast("double")
    )
    interp = F.when(v.isNotNull(), v.cast("double")).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v.cast("double") + (next_v.cast("double") - prev_v.cast("double")) * frac,
        )
    )
    return dense_df.withColumn(out_col, interp)


def ohlc(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    by: Sequence[str] = (),
    period_seconds: int = 86400,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Open/high/low/close candles per key and epoch-aligned period — the
    finance-style resample. One aggregate: ``min_by``/``max_by`` on a
    ``(ts, tiebreak…)`` struct pick the first/last observation, min/max
    give the extremes — no window, ONE shuffle, with map-side partial
    aggregation (physically a SortAggregate: min_by's (value, ordering)
    buffer isn't hash-mutable in Spark, so each partition sorts on the
    group key first — still partial+final, never a global sort).
    ``tiebreak`` columns make first/last total when timestamps can
    collide (required for engine-reproducible output; pass the event
    id)."""
    per = (
        F.floor(F.col(ts_col).cast("timestamp").cast("double") / int(period_seconds))
        .cast("bigint")
        .alias("period")
    )
    ordk = F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak])
    v = F.col(value_col)
    return df.groupBy(*by, per).agg(
        F.min_by(v, ordk).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, ordk).alias("close"),
        F.count("*").alias("n"),
    )


def decayed_sum(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    half_life_seconds: float,
    ref_ts=None,
    out_col: str = "decayed_value",
) -> DataFrame:
    """Exponential time-decay aggregate per entity:
    ``Σ value · 0.5^((t_ref − ts) / half_life)`` — the standard recency
    weighting for activity scores and feature stores.

    Map-only weight expression + one hash aggregate on the entity key.
    ``ref_ts=None`` anchors at the table's max timestamp via a one-row
    aggregate broadcast back (in-plan, no driver collect) — pass an
    explicit anchor for incremental/production runs so scores are
    comparable across runs."""
    v = F.col(value_col).cast("double")
    t = F.col(ts_col).cast("timestamp").cast("double")
    if ref_ts is None:
        anchor = df.agg(
            F.max(F.col(ts_col).cast("timestamp").cast("double")).alias("_ref")
        )
        base = df.crossJoin(F.broadcast(anchor))
        ref = F.col("_ref")
    else:
        base = df
        ref = F.lit(ref_ts).cast("timestamp").cast("double")
    w = F.pow(F.lit(0.5), (ref - t) / F.lit(float(half_life_seconds)))
    return base.groupBy(entity_col).agg(F.sum(v * w).alias(out_col))


def zscore_anomalies(
    period_df: DataFrame,
    by: Sequence[str],
    period_col: str = "period",
    value_col: str = "value",
    window_periods: int = 7,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key rolling z-score over a regular series: trailing RANGE
    window of ``window_periods`` periods (inclusive of the current row)
    supplies mean and sample stddev; ``is_anomaly`` flags |z| >
    ``threshold``. First row of a series has NULL stddev → NULL z →
    ``is_anomaly`` false, by construction rather than convention."""
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(period_col).cast("long"))
        .rangeBetween(-(int(window_periods) - 1), 0)
    )
    v = F.col(value_col).cast("double")
    mean = F.avg(v).over(w)
    sd = F.stddev_samp(v).over(w)
    z = F.when(sd > 0, (v - mean) / sd)
    return period_df.select(
        "*",
        F.round(mean, 4).alias("rolling_mean"),
        F.round(sd, 4).alias("rolling_std"),
        F.round(z, 4).alias("zscore"),
        F.coalesce(F.abs(z) > float(threshold), F.lit(False)).alias("is_anomaly"),
    )


def km_survival(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Kaplan–Meier survival curve over ``(duration, observed)`` rows —
    the time-to-event estimator (how long until a user converts / a doc
    is near-duplicated / a job fails), censoring-aware: ``observed=false``
    rows (still alive at study end) leave the risk set without counting
    as events.

    Per-duration event/censor counts (ONE hash agg — the only stage that
    touches the data), then the classic product-limit over the distinct
    durations: ``n_risk(t) = N − Σ_{s<t}(d_s + c_s)`` and
    ``S(t) = Π_{s≤t} (1 − d_s/n_s)``, computed as cumulative windows over
    the one-row-per-duration frame — durations are calendar-bounded, the
    same tiny-frame contract as :func:`resample`'s downstream windows
    (for unbounded duration grids use :func:`analytics.prefix_sum`).
    The product rides ``exp(Σ ln(·))``; output is rounded to 6 decimals
    so any engine reproduces it. Returns one row per distinct duration:
    ``(duration, n_risk, n_events, n_censored, survival)``."""
    per_t = (
        df.select(
            F.col(duration_col).cast("bigint").alias("t"),
            F.col(observed_col).cast("boolean").alias("obs"),
        )
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("obs"), 1).otherwise(0))
            .cast("double")
            .alias("d"),
            F.sum(F.when(F.col("obs"), 0).otherwise(1))
            .cast("double")
            .alias("c"),
        )
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    total = per_t.agg(F.sum(F.col("d") + F.col("c")).alias("_n"))
    risk = per_t.crossJoin(F.broadcast(total)).withColumn(
        "n_risk",
        F.col("_n") - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0.0)),
    )
    # The last duration can exhaust the risk set (d == n_risk): its factor
    # is exactly 0 and ln is undefined — Spark's log(0) yields NULL,
    # DuckDB raises. Sum only the positive factors and pin survival to 0
    # once any exhausting duration has passed (identical CASE in oracles).
    ln_term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(1.0 - F.col("d") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    exhausted = F.max(
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ).over(w_cum)
    surv = risk.withColumn(
        "survival",
        F.when(exhausted == 1, F.lit(0.0)).otherwise(
            F.round(F.exp(F.sum(ln_term).over(w_cum)) * 1_000_000) / 1_000_000
        ),
    )
    return surv.select(
        F.col("t").alias("duration"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.col("c").cast("bigint").alias("n_censored"),
        "survival",
    )
