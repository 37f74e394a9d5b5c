"""plans/bloom.py: explicit bloom-filter semi-join prefilter.

Contract under test (module docstring): the prefilter is a SUPERSET of
the exact left-semi join (false positives allowed, false negatives
NEVER), the composed prefilter-join is value-identical to the plain
join, the saturation/emptiness/type-mismatch guards raise loudly, and
the big side is filtered map-side (no big-side exchange before the
probe).
"""

import pytest
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark.plans.bloom import (
    _common_key_type,
    bloom_bitmap,
    bloom_prefilter_join,
    bloom_semi_prefilter,
)


@pytest.fixture(scope="module")
def big_small(spark):
    big = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    small = spark.range(0, 5000, 100).select(
        F.col("id").alias("k"), F.lit("s").alias("tag")
    )
    return big, small


def test_superset_of_exact_semi_join(spark, big_small):
    big, small = big_small
    bitmap = bloom_bitmap(small, "k")
    survivors = bloom_semi_prefilter(big, "k", bitmap)
    surv_keys = {r["k"] for r in survivors.select("k").collect()}
    exact_keys = {
        r["k"]
        for r in big.join(small, on="k", how="left_semi").select("k").collect()
    }
    assert exact_keys <= surv_keys  # no false negatives, ever
    # and the filter actually filters (50 true keys of 5000; even with
    # false positives the survivor set must be far from everything)
    assert len(surv_keys) < 2500


def test_prefilter_join_equals_plain_join(spark, big_small):
    big, small = big_small
    got = bloom_prefilter_join(big, small, "k").select("k", "v", "tag")
    want = big.join(small, on="k", how="inner").select("k", "v", "tag")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_type_mismatch_keys_still_join(spark):
    """ADVICE r6 (high): int-keyed small vs bigint-keyed big hashed to
    different xxhash64 values and the prefilter silently dropped every
    matching row. bloom_prefilter_join must widen both sides and return
    the exact plain-join result."""
    big = spark.range(0, 100).select(F.col("id").alias("k"))  # bigint
    small = spark.createDataFrame(
        [(5,), (17,), (42,)], "k2 int"
    )  # int on purpose
    got = bloom_prefilter_join(big, small, "k", "k2")
    assert sorted(r["k"] for r in got.collect()) == [5, 17, 42]


def test_fractional_integral_widening(spark):
    big = spark.range(0, 50).select(F.col("id").cast("double").alias("k"))
    small = spark.createDataFrame([(7,), (9,)], "k2 int")
    got = bloom_prefilter_join(big, small, "k", "k2")
    assert sorted(r["k"] for r in got.collect()) == [7.0, 9.0]


def test_common_key_type_rules():
    assert _common_key_type("bigint", "bigint") == "bigint"
    assert _common_key_type("int", "bigint") == "bigint"
    assert _common_key_type("smallint", "tinyint") == "smallint"
    assert _common_key_type("bigint", "double") == "double"
    assert _common_key_type("float", "int") == "double"
    assert _common_key_type("string", "string") == "string"
    with pytest.raises(ValueError, match="non-widenable"):
        _common_key_type("string", "bigint")
    with pytest.raises(ValueError, match="non-widenable"):
        _common_key_type("date", "timestamp")


def test_probe_type_guard_direct_use(spark):
    """Direct bloom_semi_prefilter callers get the loud guard: a probe
    column whose resolved type differs from the recorded build type
    raises instead of silently returning an empty (false-negative)
    result."""
    small = spark.createDataFrame([(5,), (6,)], "k int")
    big = spark.range(0, 10).select(F.col("id").alias("k"))  # bigint
    bitmap = bloom_bitmap(small, "k")
    with pytest.raises(ValueError, match="build key type"):
        bloom_semi_prefilter(big, "k", bitmap)


def test_saturation_guard(spark):
    # 256-bit bitmap over 1000 distinct keys: fill far beyond 50% — the
    # probe must refuse rather than pass ~everything.
    small = spark.range(0, 1000).select(F.col("id").alias("k"))
    big = spark.range(0, 10).select(F.col("id").alias("k"))
    bitmap = bloom_bitmap(small, "k", m_bits=256, k_hashes=4)
    with pytest.raises(ValueError, match="saturated"):
        bloom_semi_prefilter(big, "k", bitmap)


def test_empty_small_side_guard(spark):
    small = spark.range(0, 10).where("id < 0").select(F.col("id").alias("k"))
    big = spark.range(0, 10).select(F.col("id").alias("k"))
    bitmap = bloom_bitmap(small, "k")
    with pytest.raises(ValueError, match="empty"):
        bloom_semi_prefilter(big, "k", bitmap)


def test_null_keys_ignored(spark):
    small = spark.createDataFrame([(1,), (None,), (3,)], "k int")
    big = spark.createDataFrame([(1,), (2,), (None,)], "k int")
    got = bloom_prefilter_join(big, small, "k")
    assert sorted(r["k"] for r in got.collect()) == [1]


def test_validation_params(spark):
    small = spark.range(0, 4).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="m_bits"):
        bloom_bitmap(small, "k", m_bits=100)
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_bitmap(small, "k", k_hashes=0)


def test_probe_is_map_side(spark, big_small):
    """The big side must reach the probe WITHOUT an exchange: the only
    join in the prefilter is the one-row bitmap broadcast. Any
    big-side Exchange before the filter means the prefilter shuffled
    the relation it exists to protect."""
    big, small = big_small
    bitmap = bloom_bitmap(small, "k")
    survivors = bloom_semi_prefilter(big, "k", bitmap)
    plan = survivors._sc._jvm.PythonSQLUtils.explainString(
        survivors._jdf.queryExecution(), "formatted"
    )
    # the probe plan's only join is a BroadcastNestedLoopJoin of the
    # one-row bitmap; no shuffle exchange anywhere in the probe subtree
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan
