"""Distribution analytics: exact/approximate percentiles, mergeable
distinct-count sketches, and time-rolling aggregates.

The reference's stats surface is pandas ``describe``-style one-liners over
collected frames (``Chunking_Strats/kamredt_chunking.py:52-105``,
``Frontend/app.py`` widget aggs); none of it survives 100 TB. These
operators are the distributed replacements:

* **exact percentiles** — ``percentile()`` (linear interpolation, the same
  type-7 definition DuckDB's ``quantile_cont`` uses, so results oracle
  bit-for-bit). Exact percentile is a full sort per group — fine for
  grouped slices, wrong for whole-table scans at scale; that's what the
  approx variant is for.
* **approx percentiles** — ``percentile_approx`` (Greenwald-Khanna):
  single pass, bounded memory, mergeable partials — the 100 TB default.
* **distinct-count sketches** — ``approx_count_distinct`` (HyperLogLog++)
  for one-shot estimates, and Apache DataSketches HLL via
  ``hll_sketch_agg`` for the *mergeable* form: per-partition/per-day
  sketch columns that union later WITHOUT rescanning raw data — the only
  sane way to track "distinct users per day/week/all-time" over 100 TB.
* **rolling aggregates** — event-time RANGE windows over pre-aggregated
  frames. The window is global-ordered but runs over one-row-per-period
  input (the upstream groupBy did the heavy reduction), so the
  single-partition window holds thousands of rows, not billions — that
  invariant is the operator's contract, asserted in its docstring rather
  than discovered in production.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def percentile_profile(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    ps: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Percentiles of ``value_col``, optionally per group.

    ``exact=True`` → ``percentile()`` (full sort within each group — use on
    grouped/filtered slices); ``exact=False`` → ``percentile_approx``
    (single-pass GK sketch with ``accuracy``; error ≤ 1/accuracy of rank,
    constant memory, the whole-table default at scale). Output: one row per
    group with ``p_<pct>`` columns.
    """
    arr = "array({})".format(
        ", ".join(f"CAST({p} AS DOUBLE)" for p in ps)
    )
    fn = "percentile" if exact else "percentile_approx"
    extra = "" if exact else f", {int(accuracy)}"
    agg = F.expr(f"{fn}({value_col}, {arr}{extra})").alias("_ps")
    out = df.groupBy(*by).agg(agg) if by else df.agg(agg)
    return out.select(
        *by,
        *[
            F.col("_ps").getItem(i).alias(f"p_{str(p).replace('.', '_')}")
            for i, p in enumerate(ps)
        ],
    )


def distinct_count_estimate(
    df: DataFrame, cols: Sequence[str], rsd: float = 0.02
) -> DataFrame:
    """One-pass HyperLogLog++ distinct-count estimates for several columns
    at once (relative std dev ``rsd``). One row out; no shuffle beyond the
    final partial-merge — this is the scan you run instead of N separate
    ``COUNT(DISTINCT ...)`` sorts."""
    return df.agg(
        *[
            F.approx_count_distinct(c, rsd).alias(f"{c}_approx_distinct")
            for c in cols
        ]
    )


def hll_partials(
    df: DataFrame, by: Sequence[str], col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group Apache DataSketches HLL sketches (binary column) — the
    MERGEABLE form of distinct counting. Persist these per day/partition;
    :func:`hll_rollup` unions them into coarser grains without touching raw
    rows again. ``lg_k=12`` → ~2.5% error at ~4 KB per sketch."""
    return df.groupBy(*by).agg(
        F.hll_sketch_agg(F.col(col).cast("string"), F.lit(lg_k)).alias("hll")
    )


def hll_rollup(
    partials: DataFrame, by: Sequence[str] = (), sketch_col: str = "hll"
) -> DataFrame:
    """Union per-group HLL sketches up to a coarser grouping (possibly
    global) and estimate. Input rows = sketches, not data — this is the
    re-aggregation path that costs KB per group instead of a raw rescan."""
    merged = (
        partials.groupBy(*by).agg(F.hll_union_agg(sketch_col).alias("hll"))
        if by
        else partials.agg(F.hll_union_agg(sketch_col).alias("hll"))
    )
    return merged.select(
        *by, F.hll_sketch_estimate("hll").alias("distinct_estimate")
    )


def rolling_agg(
    period_df: DataFrame,
    ts_col: str,
    value_col: str,
    window_periods: int,
    period_seconds: int = 86400,
    out_col: str = "rolling_sum",
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Trailing-window sum over a PRE-AGGREGATED frame (one row per
    ``period_seconds`` per partition key): RANGE window of
    ``window_periods`` periods ending at the current row.

    Contract: ``period_df`` must already be reduced to per-period rows
    (e.g. daily revenue). The window then spans thousands of rows per
    partition — when ``partition_by`` is empty that's a deliberate
    single-partition sort over the tiny aggregate, not a scale bug; pass
    keys to parallelize per-entity rollups."""
    span = (window_periods - 1) * period_seconds
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col(ts_col).cast("timestamp").cast("long"))
        .rangeBetween(-span, 0)
    )
    return period_df.select(
        "*", F.sum(value_col).over(w).alias(out_col)
    )


def quantile_segment(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 4,
    by: Sequence[str] = (),
    descending: bool = True,
    exact: bool = False,
    accuracy: int = 10_000,
    out_col: str = "bucket",
) -> DataFrame:
    """Scale-safe NTILE replacement: quantile-boundary segmentation.

    ``NTILE(n) OVER (ORDER BY ...)`` moves EVERY row to one partition
    (``WindowExec: No Partition Defined``) — the one plan shape that cannot
    survive 100 TB. This operator gets the same segmentation in two
    scan-shaped steps instead:

    1. **boundaries** — one aggregate computes the ``n-1`` interior
       quantiles of ``value_col`` (``percentile_approx``/GK by default:
       single pass, mergeable partials, constant memory; ``exact=True``
       switches to ``percentile`` for oracle-reproducible boundaries).
       Output is one tiny row (or one per ``by`` group).
    2. **assign** — the boundary row is broadcast back onto the data and
       each row's bucket is computed map-side: ``1 +`` the number of
       boundaries the value is on the wrong side of. A 3-element HOF per
       row, no shuffle, no window, no sort.

    Semantics vs NTILE: rows with EQUAL values always land in the same
    bucket here (ties go to the upper bucket when ``descending``), whereas
    NTILE splits ties across buckets to force exactly-equal bucket counts.
    Bucket populations are therefore equal only up to tie mass — the
    correct trade at scale, where a total tie-breaking order is exactly
    what you can't afford. Keep the window form (``ntile_customer_value``)
    only where exact equal-count semantics are required on small inputs.

    With ``by``, boundaries are computed per group and joined back on the
    group keys (broadcast when the group count is small — the usual case).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    ps = [k / n_buckets for k in range(1, n_buckets)]
    if descending:
        ps = [1.0 - p for p in ps]  # [0.75, 0.5, 0.25] for quartiles
    arr = "array({})".format(", ".join(f"CAST({p} AS DOUBLE)" for p in ps))
    fn = "percentile" if exact else "percentile_approx"
    extra = "" if exact else f", {int(accuracy)}"
    bound_agg = F.expr(f"{fn}({value_col}, {arr}{extra})").alias("_bounds")
    if by:
        bounds = df.groupBy(*by).agg(bound_agg)
        joined = df.join(F.broadcast(bounds), list(by), "left")
    else:
        bounds = df.agg(bound_agg)
        joined = df.crossJoin(F.broadcast(bounds))
    cmp = (
        (lambda acc, b: acc + F.when(F.col(value_col) < b, 1).otherwise(0))
        if descending
        else (lambda acc, b: acc + F.when(F.col(value_col) > b, 1).otherwise(0))
    )
    return joined.withColumn(
        out_col, F.lit(1) + F.aggregate("_bounds", F.lit(0), cmp)
    ).drop("_bounds")


def entropy_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Shannon entropy (nats) + distinct count per column — the data-
    profiling signal for key quality, skew detection, and feature
    selection. One value-count aggregate per column, reduced with the
    one-pass identity ``H = ln(N) − Σ n·ln(n) / N`` (no second pass to
    compute probabilities, no join back for the total); per-column
    results union into one tiny frame. NULLs count as a regular value —
    a column that is 99% NULL should show its near-zero entropy, not
    have it masked."""
    if not cols:
        raise ValueError("entropy_profile needs at least one column")
    parts = []
    for c in cols:
        counts = df.groupBy(F.col(c).alias("_v")).agg(
            F.count("*").cast("double").alias("_n")
        )
        parts.append(
            counts.agg(
                F.lit(c).alias("column_name"),
                F.count("*").cast("bigint").alias("n_distinct"),
                (
                    F.round(
                        (
                            F.log(F.sum("_n"))
                            - F.sum(F.col("_n") * F.log("_n")) / F.sum("_n")
                        )
                        * 1_000_000
                    )
                    / 1_000_000
                ).alias("entropy"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cumulative_distinct(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    period_seconds: int = 86400,
) -> DataFrame:
    """Cumulative distinct entities per period ("total users ever, by
    day") computed EXACTLY at scale via first-touch: a per-entity min
    (one groupBy on the entity key), a per-period count of first-touches,
    and a running sum over the one-row-per-period frame.

    The naive form — ``count(DISTINCT user) OVER (ORDER BY day)`` — keeps
    the full entity set in window state and cannot be expressed as a
    mergeable aggregate; first-touch turns it into two ordinary hash
    aggregates. The running-sum window is global-ordered but runs over
    periods (calendar-bounded), the same tiny-frame contract as
    :func:`rolling_agg`."""
    per = (
        F.floor(F.col(ts_col).cast("timestamp").cast("double") / int(period_seconds))
        .cast("bigint")
    )
    firsts = df.groupBy(entity_col).agg(F.min(per).alias("period"))
    news = firsts.groupBy("period").agg(
        F.count("*").cast("bigint").alias("new_entities")
    )
    w = Window.orderBy("period").rowsBetween(Window.unboundedPreceding, 0)
    return news.select(
        "period",
        "new_entities",
        F.sum("new_entities").over(w).cast("bigint").alias("cumulative_entities"),
    )


def transition_matrix(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: ``(prev_state, state, n, p)`` where ``p`` is the
    probability of ``state`` given ``prev_state`` — the standard
    next-event / user-journey model.

    Plan: one per-entity ordered window (``lag``) to form consecutive
    pairs — partitions hold one entity's events, never the table — then
    a hash aggregate on the (prev, cur) pair and a broadcast join
    against the per-prev totals (states are a small vocabulary; the
    matrix is states², tiny). ``tiebreak`` columns make the ordering
    total when timestamps can collide, which any cross-engine
    reproduction requires."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, *tiebreak)
    seq = events.select(
        F.col(entity_col),
        F.lag(state_col).over(w).alias("prev_state"),
        F.col(state_col),
    ).where(F.col("prev_state").isNotNull())
    counts = seq.groupBy("prev_state", state_col).agg(
        F.count("*").alias("n")
    )
    totals = counts.groupBy("prev_state").agg(F.sum("n").alias("_total"))
    return (
        counts.join(F.broadcast(totals), "prev_state")
        .select(
            "prev_state",
            state_col,
            "n",
            # scaled rounding: identical IEEE ops in any engine, immune to
            # the round()-at-exact-halves divergence (ratios of small
            # integers produce exact decimal halves structurally)
            (
                F.round(F.col("n").cast("double") / F.col("_total").cast("double") * 1_000_000)
                / 1_000_000
            ).alias("p"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    period (the cohort), counted per period-offset of later activity —
    the standard "of users who arrived in week W, how many were active in
    week W+k" analysis.

    Two aggregates, both on scale-safe keys: first-activity per user (one
    groupBy on the user key), then distinct users per (cohort, offset)
    after a broadcast-friendly join back. No window, no global sort; the
    retention matrix itself is tiny (periods²). Period boundaries are
    epoch-aligned (``floor(epoch / period)``) so the bucketing is
    reproducible by any engine."""
    width = int(period_seconds)
    per = (
        F.floor(F.col(ts_col).cast("timestamp").cast("double") / width)
        .cast("bigint")
    )
    firsts = (
        events.groupBy(user_col)
        .agg(F.min(per).alias("cohort_period"))
    )
    activity = events.select(user_col, per.alias("_p")).distinct()
    return (
        activity.join(firsts, user_col)
        .groupBy(
            "cohort_period",
            (F.col("_p") - F.col("cohort_period")).cast("int").alias("period_offset"),
        )
        .agg(F.count_distinct(user_col).cast("bigint").alias("n_active"))
    )


def funnel(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: "int | None" = None,
) -> DataFrame:
    """Ordered-funnel analysis: per user, the earliest time each stage was
    reached STRICTLY AFTER the previous stage (view → click → purchase
    …), the standard product-analytics conversion operator.

    Plan: one chained per-user aggregate per stage — stage k is
    ``min(ts) WHERE type = stages[k] AND ts > stage_{k-1}_ts`` — computed
    as successive groupBy(user) aggregations joined back on the user key.
    Every shuffle is on the SAME key, so at scale the exchanges line up
    (AQE reuses the partitioning) and nothing is ever quadratic; no
    window, no per-user event array in memory. A user with billions of
    events costs one partial min per stage, not a sort.

    ``within_seconds`` bounds the WHOLE funnel: stage k counts only if
    within the bound of stage 1's timestamp (the common "converted within
    N hours" cut). Output: one row per user reaching stage 1, with
    ``stage_1_ts .. stage_n_ts`` (nulls once the chain breaks).
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least two stages")
    cur = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("stage_1_ts"))
    )
    for i, stage in enumerate(stages[1:], start=2):
        nxt = (
            events.where(F.col(type_col) == stage)
            .select(user_col, F.col(ts_col).alias("_t"))
            .join(cur, user_col)
            .where(F.col("_t") > F.col(f"stage_{i - 1}_ts"))
        )
        if within_seconds is not None:
            nxt = nxt.where(
                F.col("_t").cast("double")
                <= F.col("stage_1_ts").cast("double") + float(within_seconds)
            )
        nxt = nxt.groupBy(user_col).agg(F.min("_t").alias(f"stage_{i}_ts"))
        cur = cur.join(nxt, user_col, "left")
    return cur


def prefix_sum(
    df: DataFrame,
    order_col: str,
    sum_cols: Sequence[str],
    n_partitions: "int | None" = None,
    keep_pid: bool = False,
) -> DataFrame:
    """Exact running totals of ``sum_cols`` in ``order_col`` order WITHOUT
    a single-partition window — the distributed prefix-sum:

    1. range-repartition on the key (each partition owns a contiguous key
       range),
    2. within-partition running sums via a window partitioned by
       ``spark_partition_id()`` (bounded partitions, never global),
    3. per-partition totals (one tiny agg: one row per partition) turned
       into EXCLUSIVE offsets by a cumulative window over that
       partition-count-sized frame — the tiny-frame contract from
       :func:`rolling_agg`; #partitions rows, not data rows —
    4. broadcast-joined back and added.

    The naive ``sum() OVER (ORDER BY k)`` plans a single-partition
    WindowExec holding the whole table; this shape is what CDFs, exact
    ECDF comparisons (:func:`drift.ks_statistic`) and global running
    totals over unbounded-cardinality keys must use instead.

    ``order_col`` values should be unique (pre-aggregate per key first);
    with duplicate keys the intra-key running order is partition-file
    order, i.e. nondeterministic. Adds ``<col>_cum`` per sum column.
    """
    spark = df.sparkSession
    n = int(n_partitions or spark.sparkContext.defaultParallelism)
    d = df.repartitionByRange(n, order_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in sum_cols:
        d = d.withColumn(f"_run_{c}", F.sum(c).over(w_in))
    tot = d.groupBy("_pid").agg(
        *[F.sum(c).alias(f"_t_{c}") for c in sum_cols]
    )
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = tot.select(
        "_pid",
        *[
            F.coalesce(F.sum(f"_t_{c}").over(w_off), F.lit(0).cast("double"))
            .alias(f"_off_{c}")
            for c in sum_cols
        ],
    )
    out = d.join(F.broadcast(off), "_pid")
    for c in sum_cols:
        out = out.withColumn(
            f"{c}_cum", F.col(f"_run_{c}") + F.col(f"_off_{c}")
        ).drop(f"_run_{c}", f"_off_{c}")
    return out if keep_pid else out.drop("_pid")


def mad_outliers(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    k: float = 3.0,
) -> DataFrame:
    """Robust (median/MAD) outlier summary per group: median, the median
    absolute deviation, and how many rows sit beyond
    ``k * 1.4826 * MAD`` of the median (1.4826 scales MAD to sigma under
    normality — the standard robust z-score). The mean/stddev z-score
    (:func:`timeseries.zscore_anomalies`) is itself dragged by the
    outliers it hunts; the MAD form is what data-quality screens on
    heavy-tailed columns (prices, latencies, token counts) should use.

    Two grouped exact-percentile aggregates (median, then MAD over the
    joined absolute deviations) + one flag count — three shuffles on the
    group key, map-side everything else. At whole-table scale swap the
    exact percentile for ``percentile_approx`` (the
    :func:`percentile_profile` toggle)."""
    v = F.col(value_col).cast("double")
    keys = list(by)
    med = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    dev = df.join(F.broadcast(med) if not keys else med, keys or None, "inner" if keys else "cross").select(
        *keys, v.alias("_v"), F.col("_med"), F.abs(v - F.col("_med")).alias("_ad")
    )
    mad = dev.groupBy(*keys).agg(
        F.first("_med").alias("_med2"),
        F.expr("percentile(_ad, 0.5)").alias("_mad"),
    )
    flagged = dev.drop("_med").join(F.broadcast(mad) if not keys else mad, keys or None, "inner" if keys else "cross")
    bound = F.lit(float(k)) * 1.4826 * F.col("_mad")
    return (
        flagged.groupBy(*keys)
        .agg(
            F.round(F.first("_med2"), 4).alias("median"),
            F.round(F.first("_mad"), 4).alias("mad"),
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(F.abs(F.col("_v") - F.col("_med2")) > bound, 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )


def kll_quantile_partials(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    k: int = 200,
) -> DataFrame:
    """Per-group Apache DataSketches KLL quantile sketches (binary
    column) — the MERGEABLE quantile form, exactly parallel to
    :func:`hll_partials` for distinct counts: store per-day/per-partition
    sketch rows once, answer any later quantile question by merging
    partials WITHOUT rescanning raw data. ``k=200`` ≈ 1.65% rank error
    at a few KB per sketch. GK (`percentile_approx`) is single-use by
    comparison — its partials aren't a storable column."""
    return df.groupBy(*by).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(int(k))).alias(
            "kll"
        )
    )


def kll_merge_quantiles(
    partials: DataFrame,
    quantiles: Sequence[float],
    by: Sequence[str] = (),
    sketch_col: str = "kll",
) -> DataFrame:
    """Merge per-group KLL sketches up to a coarser grouping and read the
    requested quantiles out — one agg over sketch rows (groups, not
    data), then a map-side quantile probe per requested rank."""
    merged = partials.groupBy(*by).agg(
        F.kll_merge_agg_double(sketch_col).alias("_m")
    )
    cols = [
        F.kll_sketch_get_quantile_double("_m", F.lit(float(q))).alias(
            _quantile_label(q)
        )
        for q in quantiles
    ]
    n = F.kll_sketch_get_n_double("_m").alias("n")
    return merged.select(*by, n, *cols)


def _quantile_label(q: float) -> str:
    """Deterministic, collision-free column label for a quantile in
    (0, 1): per-mille resolution — ``0.5 -> q50``, ``0.05 -> q05``,
    ``0.999 -> q999``, ``0.925 -> q925``. Two-digit labels only arise
    from multiples of 0.01 and three-digit ones always end in a nonzero
    digit, so the two ranges cannot collide (q25 vs q025). String-munged
    labels (str(q).replace...) produced invalid identifiers at the
    edges (q=1.0 -> 'q1.0')."""
    if not (0.0 < q < 1.0):
        raise ValueError(f"quantile must be in (0, 1), got {q!r}")
    milli = int(round(float(q) * 1000))
    if not (0 < milli < 1000):
        raise ValueError(f"quantile must be in [0.001, 0.999], got {q!r}")
    return f"q{milli // 10:02d}" if milli % 10 == 0 else f"q{milli:03d}"


def theta_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Distinct-set overlap between two slices estimated with Theta
    sketches — one row ``(n_a, n_b, n_intersection, n_union, jaccard)``.

    THE scale tool for "how many users/docs do these two 100 TB slices
    share": exact requires shuffling both key sets; sketches reduce each
    side to KBs in one pass and the set algebra (union, intersection)
    happens on the sketches. ~2-3% standard error at ``lg_k=12``;
    estimates round to whole entities. Empty inputs raise loudly (the
    drift-family contract) instead of yielding a 0/0 NaN jaccard."""
    from building_a_rag_pipeline_with_airflow_spark.operators import require_nonempty

    require_nonempty(df_a, "theta overlap slice A")
    require_nonempty(df_b, "theta overlap slice B")
    sa = df_a.agg(
        F.theta_sketch_agg(F.col(key_col).cast("string"), F.lit(int(lg_k))).alias("s")
    )
    sb = df_b.agg(
        F.theta_sketch_agg(F.col(key_col).cast("string"), F.lit(int(lg_k))).alias("s")
    )
    both = sa.select(F.col("s").alias("_sa")).crossJoin(
        F.broadcast(sb.select(F.col("s").alias("_sb")))
    )
    return both.select(
        F.round(F.theta_sketch_estimate("_sa")).cast("bigint").alias("n_a"),
        F.round(F.theta_sketch_estimate("_sb")).cast("bigint").alias("n_b"),
        F.round(
            F.theta_sketch_estimate(F.theta_intersection("_sa", "_sb"))
        ).cast("bigint").alias("n_intersection"),
        F.round(
            F.theta_sketch_estimate(F.theta_union("_sa", "_sb"))
        ).cast("bigint").alias("n_union"),
        F.round(
            F.theta_sketch_estimate(F.theta_intersection("_sa", "_sb"))
            / F.theta_sketch_estimate(F.theta_union("_sa", "_sb")),
            4,
        ).alias("jaccard"),
    )


def attribute_conversions(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    conversion: str = "purchase",
    model: str = "last",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Marketing-style conversion attribution: credit each conversion's
    value to the entity's FIRST or LAST preceding non-conversion
    touchpoint (``model`` ∈ {first, last}); conversions with no prior
    touch credit ``'direct'``. Returns one row per channel:
    ``(channel, n_conversions, attributed_value)``.

    One per-entity ordered window carrying the touch channel
    (``first/last(..., ignorenulls=True)`` over the strictly-before
    frame — partitions hold one entity's events), then a hash agg on the
    channel. The same windows-then-agg shape as
    :func:`transition_matrix`; pass ``tiebreak`` (e.g. an event id) to
    make simultaneous-timestamp orderings total."""
    if model not in {"first", "last"}:
        raise ValueError(f"model must be 'first' or 'last', got {model!r}")
    w = (
        Window.partitionBy(entity_col)
        .orderBy(ts_col, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_val = F.when(F.col(type_col) != conversion, F.col(type_col))
    carry = (
        F.first(touch_val, ignorenulls=True)
        if model == "first"
        else F.last(touch_val, ignorenulls=True)
    )
    attributed = events.withColumn("_touch", carry.over(w)).where(
        F.col(type_col) == conversion
    )
    return (
        attributed.groupBy(
            F.coalesce("_touch", F.lit("direct")).alias("channel")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_conversions"),
            # Exact-cents sum (same device as anomaly_zscore/trend): summing
            # raw doubles then rounding leaves the result at the mercy of
            # partial-sum order when a total lands on a half-cent boundary;
            # pre-scaling to integer cents makes the sum exact and
            # order-free, descaled once at the end.
            (
                F.sum(
                    F.round(F.col(value_col).cast("double") * 100).cast("bigint")
                ).cast("double")
                / F.lit(100.0)
            ).alias("attributed_value"),
        )
    )
