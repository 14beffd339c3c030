"""As-of join semantics (operators/asof.py): backward inclusive match,
left-outer nulls before the first right row, per-key isolation, and the
column-collision guard. The contract query additionally cross-validates
against DuckDB's native ASOF LEFT JOIN."""

import datetime as dt

import pytest

from ccnet_spark_spark.operators.asof import asof_join

T = lambda m: dt.datetime(2026, 1, 1, 10, m)  # noqa: E731


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 1, T(0), 9.0), (2, 1, T(5), 9.0), (3, 1, T(4), 9.0), (4, 2, T(5), 9.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(1, T(1), 10.0), (1, T(4), 20.0), (1, T(5), 30.0), (3, T(0), 99.0)],
        "user_id long, ts timestamp, cv double",
    )
    got = {
        r["event_id"]: r["cv"]
        for r in asof_join(left, right, on="user_id", ts_col="ts").collect()
    }
    assert got[1] is None  # no click at-or-before 10:00
    assert got[3] == 20.0  # equal-ts inclusive (10:04 click counts at 10:04)
    assert got[2] == 30.0  # latest at-or-before 10:05
    assert got[4] is None  # user 2 never clicked; user 3's rows don't leak


def test_asof_null_values_come_from_matched_row(spark):
    """A matched right row whose value is NULL must deliver that NULL (not an
    older non-null value), and multi-column values must all come from the SAME
    matched row — the struct carry-forward contract (ADVICE r2)."""
    left = spark.createDataFrame(
        [(1, 1, T(5), 0.0)], "event_id long, user_id long, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        [(1, T(1), 10.0, "old"), (1, T(4), None, "new")],
        "user_id long, ts timestamp, cv double, tag string",
    )
    row = asof_join(left, right, on="user_id", ts_col="ts").collect()[0]
    # the 10:04 row is the as-of match: its NULL cv is preserved, and tag
    # comes from the same row (per-column carry would have mixed 10.0/"new")
    assert row["cv"] is None
    assert row["tag"] == "new"


def test_asof_collision_guard(spark):
    left = spark.createDataFrame([(1, T(0), 1.0)], "user_id long, ts timestamp, cv double")
    right = spark.createDataFrame([(1, T(0), 2.0)], "user_id long, ts timestamp, cv double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="user_id", ts_col="ts")


def test_asof_plan_has_no_join(spark):
    """The scale property: one shuffle + window, never a range/cross join."""
    left = spark.createDataFrame([(1, T(0), 1.0)], "user_id long, ts timestamp, v double")
    right = spark.createDataFrame([(1, T(0), 2.0)], "user_id long, ts timestamp, cv double")
    plan = (
        asof_join(left, right, on="user_id", ts_col="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # union + window only
    assert plan.count("Exchange") <= 2  # the key shuffle (+AQE artifacts)
