"""Unit tests for OHLC candles and exponential decay
(operators/timeseries.py) and cumulative-distinct via first-touch
(operators/analytics.py). Engine parity is covered by
tests/test_oracle_parity.py (ohlc_events_daily,
cumulative_new_users_daily, decayed_user_value).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark.operators import analytics, timeseries


def _ts(day, sec):
    return dt.datetime(2024, 1, day, 0, 0, sec)


def test_ohlc_picks_first_last_by_tiebreak(spark):
    rows = [
        # same day, strictly ordered by (ts, id)
        ("x", _ts(1, 10), 1, 5.0),
        ("x", _ts(1, 20), 2, 9.0),
        ("x", _ts(1, 30), 3, 2.0),
        ("x", _ts(1, 30), 4, 7.0),  # ts collision: id breaks the tie
        ("x", _ts(2, 0), 5, 4.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id int, v double")
    out = {
        r.period: r
        for r in timeseries.ohlc(
            df, "ts", "v", by=("k",), tiebreak=("id",)
        ).collect()
    }
    d1 = out[min(out)]
    assert (d1.open, d1.high, d1.low, d1.close, d1.n) == (5.0, 9.0, 2.0, 7.0, 4)
    d2 = out[max(out)]
    assert (d2.open, d2.close, d2.n) == (4.0, 4.0, 1)


def test_decayed_sum_halves_per_half_life(spark):
    rows = [
        (1, _ts(8, 0), 100.0),   # anchor (max ts)
        (1, _ts(1, 0), 100.0),   # exactly one 7-day half-life earlier
        (2, _ts(8, 0), 40.0),
    ]
    df = spark.createDataFrame(rows, "u int, ts timestamp, v double")
    out = {
        r.u: r.decayed_value
        for r in timeseries.decayed_sum(
            df, "u", "ts", "v", half_life_seconds=7 * 86400.0
        ).collect()
    }
    assert out[1] == pytest.approx(150.0)  # 100 + 100 * 0.5
    assert out[2] == pytest.approx(40.0)   # at the anchor: weight 1


def test_decayed_sum_explicit_anchor(spark):
    df = spark.createDataFrame([(1, _ts(1, 0), 100.0)], "u int, ts timestamp, v double")
    out = timeseries.decayed_sum(
        df, "u", "ts", "v", half_life_seconds=7 * 86400.0, ref_ts=_ts(8, 0)
    ).first()
    assert out.decayed_value == pytest.approx(50.0)


def test_cumulative_distinct_first_touch(spark):
    rows = [
        (1, _ts(1, 0)), (1, _ts(2, 0)), (1, _ts(3, 0)),  # u1 first on d1
        (2, _ts(2, 0)), (2, _ts(3, 0)),                  # u2 first on d2
        (3, _ts(3, 0)),                                  # u3 first on d3
    ]
    df = spark.createDataFrame(rows, "u int, ts timestamp")
    out = sorted(
        (r.period, r.new_entities, r.cumulative_entities)
        for r in analytics.cumulative_distinct(df, "u", "ts").collect()
    )
    news = [n for _, n, _ in out]
    cums = [c for _, _, c in out]
    assert news == [1, 1, 1]
    assert cums == [1, 2, 3]
