"""Windowed / watermarked event-stream operators.

The reference has only scheduler-level incrementality (@daily DAG,
``dags:66-72``; poll loops ``dags:78-90``); at 100 TB the ingestion path is a
stream. These helpers are written against the *batch-or-stream* DataFrame
API: the same function works on a static events DataFrame (tests, backfill)
and a ``readStream`` source (production), which is exactly how Structured
Streaming is meant to be used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])


def parse_props(df: DataFrame, col: str = "props") -> DataFrame:
    """JSON-string props → typed struct (T10 serde)."""
    return df.withColumn("props_parsed", F.from_json(F.col(col), PROPS_SCHEMA))


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str | None = "10 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts + value sums. With a watermark, late rows past
    the bound are dropped and window state is evicted — bounded state at any
    scale."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration).alias("win"), *group_cols)
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def tumbling_ohlc(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    duration: str = "1 day",
    watermark: str | None = "10 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
    tiebreak: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Streaming OHLC candles: the windowed form of
    ``operators.timeseries.ohlc`` — min_by/max_by on a (ts, tiebreak)
    struct inside a tumbling event-time window. Identical aggregate
    expressions batch and stream, so stream output == batch output on
    the same data (the parity contract every operator here keeps); with
    a watermark, candle state finalizes and evicts once the window
    passes the bound."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    ordk = F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak])
    v = F.col(value_col)
    return (
        df.groupBy(F.window(ts_col, duration).alias("win"), *group_cols)
        .agg(
            F.min_by(v, ordk).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, ordk).alias("close"),
            F.count("*").cast("bigint").alias("n"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("win"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
        )
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    user_col: str = "user_id",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Session windows (gap-based) per user — the reference's poll-loop
    'sessions' concept done natively."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), F.col(user_col))
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            user_col,
            "n_events",
        )
    )


def stream_from_directory(spark, path: str, schema) -> DataFrame:
    """File-source stream over a landing directory (the Spark version of the
    reference's scrape-then-poll ingestion, dags:78-90)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def read_events_stream(spark, path: str) -> DataFrame:
    """Stream the events table from a directory — mirror of
    ``schemas.load_table`` for the batch side.

    The synthetic events parquet has shipped with ``ts`` as both
    TIMESTAMP(MICROS) (reads natively as TimestampType) and TIMESTAMP(NANOS)
    (reads as a ns long under ``nanosAsLong``). Streaming sources need the
    schema up front, so probe the directory's footer once with a batch read
    (metadata-only, no data scan) and build the matching stream schema —
    converting ns → µs only when the file actually stores nanos.
    """
    ts_is_long = isinstance(
        spark.read.parquet(path).schema["ts"].dataType, T.LongType
    )
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField(
                "ts", T.LongType() if ts_is_long else T.TimestampType()
            ),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    out = stream_from_directory(spark, path, raw_schema)
    if ts_is_long:
        out = out.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return out


def stream_stream_follow_join(
    anchors: DataFrame,
    follows: DataFrame,
    on: "list[str]",
    anchor_ts: str,
    follow_ts: str,
    within_seconds: int = 3600,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: each anchor row matched to follow rows of
    the same keys with ``anchor_ts <= follow_ts < anchor_ts + within``
    — the streaming twin of ``operators.temporal.interval_join`` (and of
    the batch ``interval_join_purchase_follow`` query, which is its parity
    oracle).

    Both sides get event-time watermarks and the join carries an explicit
    time-range constraint; together these BOUND THE STATE STORE: Spark
    keeps only rows younger than (watermark + within) per side and evicts
    the rest, so state is O(arrival rate × horizon), not O(stream length)
    — the property that makes a stream-stream join survivable at 100 TB/
    day. Without the range condition the state grows forever; this
    function makes it impossible to omit.

    Anchor columns come back prefixed ``anchor_`` (keys unprefixed), so
    self-joins of one source stream against itself work without the
    caller renaming anything."""
    on = list(on)
    width = int(within_seconds)
    a = anchors.select(
        *[F.col(c).alias(c if c in on else f"anchor_{c}") for c in anchors.columns]
    ).withWatermark(f"anchor_{anchor_ts}", watermark_delay)
    f = follows.withWatermark(follow_ts, watermark_delay)
    cond = (
        (F.col(follow_ts) >= F.col(f"anchor_{anchor_ts}"))
        & (
            F.col(follow_ts)
            < F.col(f"anchor_{anchor_ts}") + F.expr(f"INTERVAL {width} SECONDS")
        )
    )
    for k in on:
        cond = cond & (a[k] == f[k])
    joined = f.join(a, cond, "inner")
    # drop the duplicated key columns from the anchor side
    return joined.drop(*[a[k] for k in on])


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: "list[str] | str",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against the
    static dimension, broadcast so no stream-side shuffle or state is
    involved (stream-static joins are stateless by definition — the dim is
    re-resolved per batch, picking up storage-level updates between
    batches). Works identically on a batch DataFrame, which is how the
    parity test pins it. Stream must be the left/preserved side: Spark
    rejects right/full joins that would need to emit dim rows for data the
    stream hasn't seen."""
    return stream.join(
        F.broadcast(dim), on=[on] if isinstance(on, str) else list(on), how=how
    )


def bloom_gated_enrich(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: "str | None" = None,
    m_bits: int = 1 << 19,
    k_hashes: int = 4,
) -> DataFrame:
    """Stream-static INNER enrichment gated by a bloom bitmap of the
    dimension's join keys — the 100 TB CDC shape that
    :func:`enrich_with_dim` can't cover: when the dim is too big to
    broadcast, a stream-static inner join shuffles every micro-batch row
    toward dim partitions, and at high event volume against a SELECTIVE
    dim (most events match nothing) almost all of that exchange is
    wasted motion.

    Composition of the repo's explicit bloom prefilter
    (`plans.bloom`, same bitmap/probe mechanics and key-type widening as
    the batch `bloom_prefilter_join`) with the stream-static join:

    1. the dim's keys fold into a ONE-ROW bitmap at plan time
       (batch-side action over the static dim — metadata-scale, ~64 KB);
    2. each micro-batch probes the broadcast bitmap MAP-SIDE and drops
       events whose key cannot be in the dim (zero stream-side state,
       zero shuffle for the gate — verified against Spark's
       stream-static support by the parity test);
    3. only survivors reach the exact inner join, which drops the bloom
       false positives — so the result is IDENTICAL to the plain
       stream-static inner join (stream ≡ batch parity is the oracle,
       `tests/test_streaming.py::test_bloom_gated_enrich_parity`).

    The dim snapshot is frozen where the bitmap is built: unlike a plain
    stream-static join (dim re-resolved per batch), a dim row added
    AFTER the bitmap was built may be gated out. Rebuild the gate (new
    query) when the dim changes — the same freeze-or-rebaseline contract
    as ``streaming_psi``'s frozen bounds."""
    from building_a_rag_pipeline_with_airflow_spark.plans.bloom import (
        _common_key_type,
        bloom_bitmap,
        bloom_semi_prefilter,
    )

    dk = dim_key or stream_key
    s_t = stream.select(F.col(stream_key).alias("_k")).schema[0].dataType.simpleString()
    d_t = dim.select(F.col(dk).alias("_k")).schema[0].dataType.simpleString()
    ct = _common_key_type(s_t, d_t)
    bitmap = bloom_bitmap(dim, F.col(dk).cast(ct), m_bits=m_bits, k_hashes=k_hashes)
    meta = bitmap.first()  # fetched once; shared with the probe
    if int(meta["n_set_bits"]) == 0:
        # Empty (or all-null-keyed) dim: the inner enrichment is empty by
        # definition — a normal state for a selective CDC dimension, so
        # gate everything out instead of raising (the batch sibling
        # bloom_prefilter_join's empty-small-side rule; limit(0) is not
        # stream-safe, a FALSE filter is)
        empty = stream.where(F.lit(False))
        if dk == stream_key:
            return empty.join(dim, on=stream_key, how="inner")
        return empty.join(dim, empty[stream_key] == dim[dk], how="inner")
    gated = bloom_semi_prefilter(
        stream, F.col(stream_key).cast(ct), bitmap, meta=meta
    )
    if dk == stream_key:
        return gated.join(dim, on=stream_key, how="inner")
    return gated.join(dim, gated[stream_key] == dim[dk], how="inner")
