"""operators/validation.py — data-contract expectations + snapshot diff."""

import pytest
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark.operators import validation


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            (1, "alice", 30, "US"),
            (2, "bob", 200, "FR"),      # age out of range
            (2, "carol", 25, "DE"),     # duplicate id
            (None, "dave", 40, "XX"),   # null id, country not in set
            (5, None, None, "US"),      # null name (regex), null age (range)
        ],
        "id bigint, name string, age int, country string",
    )


def _report(people, expectations):
    rows = validation.expectations_report(people, expectations).collect()
    return {r["expectation"]: r for r in rows}


def test_expectations_all_kinds_and_null_semantics(people):
    got = _report(
        people,
        [
            {"name": "id_not_null", "kind": "not_null", "col": "id"},
            {"name": "id_unique", "kind": "unique", "col": "id"},
            {"name": "age_range", "kind": "in_range", "col": "age", "lo": 0, "hi": 120},
            {"name": "country_set", "kind": "in_set", "col": "country",
             "values": ["US", "FR", "DE"]},
            {"name": "name_re", "kind": "matches", "col": "name", "pattern": "^[a-z]+$"},
        ],
    )
    assert got["id_not_null"]["n_violations"] == 1          # the None id
    assert got["id_unique"]["n_violations"] == 1            # one surplus 2
    # 200 out of range + NULL age fails the value contract
    assert got["age_range"]["n_violations"] == 2
    assert got["country_set"]["n_violations"] == 1          # XX
    assert got["name_re"]["n_violations"] == 1              # NULL name
    assert all(r["n_rows"] == 5 for r in got.values())
    assert not any(r["passed"] for r in got.values())
    # a passing expectation reports passed=True
    ok = _report(
        people, [{"name": "c", "kind": "matches", "col": "country", "pattern": "^[A-Z]{2}$"}]
    )
    assert ok["c"]["passed"] and ok["c"]["n_violations"] == 0


def test_expectations_rejects_bad_input(people):
    with pytest.raises(ValueError):
        validation.expectations_report(
            people, [{"name": "x", "kind": "median_of", "col": "age"}]
        )
    with pytest.raises(ValueError):
        validation.expectations_report(
            people,
            [
                {"name": "dup", "kind": "not_null", "col": "id"},
                {"name": "dup", "kind": "unique", "col": "id"},
            ],
        )


def test_expectations_single_pass_plan(people):
    """The whole contract must stay ONE aggregation over ONE scan — no
    per-expectation jobs (at 100 TB each extra pass is a full re-read)."""
    df = validation.expectations_report(
        people,
        [
            {"name": "a", "kind": "not_null", "col": "id"},
            {"name": "b", "kind": "in_range", "col": "age", "lo": 0, "hi": 120},
            {"name": "c", "kind": "matches", "col": "name", "pattern": "."},
        ],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") <= 1


def test_table_diff_statuses_and_changed_cols(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k bigint, s string, v double",
    )
    right = spark.createDataFrame(
        [(1, "a", 10.0),            # unchanged -> dropped
         (2, "B", 21.0),            # both columns changed
         (3, "c", 30.0),            # null -> value is a change (null-safe)
         (5, "e", 50.0)],           # added
        "k bigint, s string, v double",
    )
    got = {r["k"]: r for r in validation.table_diff(left, right, ["k"]).collect()}
    assert set(got) == {2, 3, 4, 5}
    assert got[2]["status"] == "changed" and got[2]["changed_cols"] == "s,v"
    assert got[3]["status"] == "changed" and got[3]["changed_cols"] == "v"
    assert got[4]["status"] == "removed" and got[4]["changed_cols"] == ""
    assert got[5]["status"] == "added" and got[5]["changed_cols"] == ""


def test_table_diff_composite_key_and_explicit_cols(spark):
    left = spark.createDataFrame(
        [(1, "x", 1.0, "ignore_l")], "k1 bigint, k2 string, v double, noise string"
    )
    right = spark.createDataFrame(
        [(1, "x", 2.0, "ignore_r")], "k1 bigint, k2 string, v double, noise string"
    )
    got = validation.table_diff(
        left, right, ["k1", "k2"], compare_cols=["v"]
    ).collect()
    assert len(got) == 1
    assert got[0]["status"] == "changed" and got[0]["changed_cols"] == "v"
    # identical when the differing column is excluded from the contract
    assert (
        validation.table_diff(left, right, ["k1", "k2"], compare_cols=[]).count()
        == 0
    )


def test_table_diff_null_keys_match_null_safely(spark):
    """A NULL primary-key value present in BOTH snapshots is ONE matched
    row (unchanged/changed), never a phantom removed+added pair — the
    join is null-safe (`<=>`) on the keys."""
    left = spark.createDataFrame(
        [(None, "a", 1.0), (1, "b", 2.0)], "k bigint, s string, v double"
    )
    right = spark.createDataFrame(
        [(None, "a", 9.0), (1, "b", 2.0)], "k bigint, s string, v double"
    )
    rows = validation.table_diff(left, right, ["k"]).collect()
    assert len(rows) == 1
    assert rows[0]["k"] is None
    assert rows[0]["status"] == "changed" and rows[0]["changed_cols"] == "v"
    # a NULL-keyed row on one side only still reports added/removed
    only_left = validation.table_diff(
        left, right.where(F.col("k").isNotNull()), ["k"]
    ).collect()
    assert {(r["k"], r["status"]) for r in only_left} == {(None, "removed")}


def test_expectations_empty_table_trivially_passes(spark):
    """ANSI edge probe (the verify-loop rule): an EMPTY table must yield
    0 violations / passed=true per expectation, not NULL verdicts from
    null conditional sums."""
    empty = spark.createDataFrame([], "id bigint, name string")
    rows = validation.expectations_report(
        empty,
        [
            {"name": "id_nn", "kind": "not_null", "col": "id"},
            {"name": "id_uq", "kind": "unique", "col": "id"},
            {"name": "name_re", "kind": "matches", "col": "name", "pattern": "."},
        ],
    ).collect()
    assert len(rows) == 3
    assert all(r["n_violations"] == 0 and r["passed"] and r["n_rows"] == 0 for r in rows)


def test_expectations_min_rows_kind(spark, people):
    """min_rows is the table-level guard: the one kind an empty or
    truncated table fails while every value contract trivially passes."""
    ok = _report(people, [{"name": "vol", "kind": "min_rows", "n": 5}])
    assert ok["vol"]["passed"] and ok["vol"]["col_name"] == "*"
    short = _report(people, [{"name": "vol", "kind": "min_rows", "n": 6}])
    assert not short["vol"]["passed"] and short["vol"]["n_violations"] == 1
    empty = spark.createDataFrame([], "id bigint")
    r = validation.expectations_report(
        empty, [{"name": "vol", "kind": "min_rows", "n": 1}]
    ).first()
    assert not r["passed"] and r["n_rows"] == 0


def test_expectations_report_by_groups_independently(spark, people):
    got = validation.expectations_report_by(
        people,
        "country",
        [
            {"name": "id_nn", "kind": "not_null", "col": "id"},
            {"name": "age_band", "kind": "in_range", "col": "age", "lo": 0, "hi": 120},
        ],
    ).collect()
    by = {(r["country"], r["expectation"]): r for r in got}
    # FR's only row has age 200 -> its band fails while US/DE pass
    assert not by[("FR", "age_band")]["passed"]
    assert by[("DE", "age_band")]["passed"]
    # the null-id row groups under XX and fails not_null there only
    assert by[("XX", "id_nn")]["n_violations"] == 1
    assert by[("US", "id_nn")]["passed"]
    # per-group n_rows, not global
    assert by[("US", "id_nn")]["n_rows"] == 2


def test_table_diff_rejects_duplicate_keys(spark):
    """Duplicated key tuples — including duplicated NULL keys, which the
    null-safe join would match many-to-many — violate the primary-key
    contract and must raise, not silently mis-count the delta."""
    import pytest
    from building_a_rag_pipeline_with_airflow_spark.operators import validation

    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    )
    dup_null = spark.createDataFrame(
        [(None, "x"), (None, "y"), (1, "a")], "k int, v string"
    )
    with pytest.raises(ValueError, match="primary-key"):
        validation.table_diff(dup_null, base, keys=["k"])
    with pytest.raises(ValueError, match="right"):
        validation.table_diff(base, dup_null, keys=["k"])
    # a SINGLE null-keyed row per side still matches itself (the r8
    # eqNullSafe fix), and the escape hatch skips the check passes
    one_null_l = spark.createDataFrame([(None, "x"), (1, "a")], "k int, v string")
    one_null_r = spark.createDataFrame([(None, "y"), (1, "a")], "k int, v string")
    out = {r.k: r.status for r in validation.table_diff(
        one_null_l, one_null_r, keys=["k"]).collect()}
    assert out == {None: "changed"}
    assert validation.table_diff(
        dup_null, dup_null, keys=["k"], assume_unique_keys=True
    ).count() >= 0  # hatch: no raise


def test_table_diff_key_named_count(spark):
    """The duplicate-key guard's aggregate is aliased (_td_cnt): a key
    column literally named ``count`` must neither trip an
    AMBIGUOUS_REFERENCE in the guard nor confuse the diff itself."""
    import pytest
    from building_a_rag_pipeline_with_airflow_spark.operators import validation

    l = spark.createDataFrame([(1, "a"), (2, "b")], "count int, v string")
    r = spark.createDataFrame([(1, "a"), (2, "c")], "count int, v string")
    out = {row["count"]: row.status for row in validation.table_diff(
        l, r, keys=["count"]).collect()}
    assert out == {2: "changed"}
    # and the guard still fires on a duplicated 'count' key
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "count int, v string")
    with pytest.raises(ValueError, match="primary-key"):
        validation.table_diff(dup, r, keys=["count"])


def test_in_set_rejects_bare_string_values(spark):
    """in_set with values='GOOD' would silently contract on the CHARACTER
    set {'G','O','D'} (strings iterate); the kind must demand an explicit
    collection instead — the bm25 query_terms rule."""
    df = spark.createDataFrame([(1, "GOOD")], "id int, status string")
    with pytest.raises(TypeError, match="iterates as characters"):
        validation.expectations_report(
            df,
            [{"name": "s", "kind": "in_set", "col": "status",
              "values": "GOOD"}],
        ).collect()
    ok = validation.expectations_report(
        df,
        [{"name": "s", "kind": "in_set", "col": "status",
          "values": ["GOOD"]}],
    ).collect()
    assert ok[0].n_violations == 0
