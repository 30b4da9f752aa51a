"""Metrics rollups A11–A15: daily aggregation, consistency, composite
quality score, trend, platform summary."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_contract_engine_spark.metrics import rollup


def _err(et):
    return {"field": "f", "error_type": et, "message": "m", "value": None,
            "expected": None}


@pytest.fixture(scope="module")
def results(spark):
    rows = []
    # contract A: 3 days, pass rate 100, 50, 100
    d0 = dt.datetime(2025, 3, 1, 12, 0, 0)
    for day, rate in [(0, (4, 0)), (1, (2, 2)), (2, (4, 0))]:
        ts = d0 + dt.timedelta(days=day)
        for _ in range(rate[0]):
            rows.append(("A", True, [], ts))
        for _ in range(rate[1]):
            rows.append(("A", False, [_err("TYPE_MISMATCH"), _err("ENUM_MISMATCH")], ts))
    # contract B: one day, all failed
    rows.append(("B", False, [_err("REQUIRED_FIELD_MISSING")], d0))
    schema = (
        "contract_id string, passed boolean, "
        "errors array<struct<field:string,error_type:string,message:string,"
        "value:string,expected:string>>, validated_at timestamp"
    )
    return spark.createDataFrame(rows, schema)


def test_daily_rollup(spark, results):
    m = rollup.daily_rollup(results)
    rows = {(r["contract_id"], str(r["day"])): r for r in m.collect()}
    a1 = rows[("A", "2025-03-02")]
    assert a1["total_validations"] == 4
    assert a1["passed_count"] == 2 and a1["failed_count"] == 2
    assert a1["pass_rate"] == 50.0
    assert a1["top_error_types"] == {"TYPE_MISMATCH": 2, "ENUM_MISMATCH": 2}
    a0 = rows[("A", "2025-03-01")]
    assert a0["pass_rate"] == 100.0 and a0["top_error_types"] is None
    assert rows[("B", "2025-03-01")]["pass_rate"] == 0.0


def test_consistency_and_quality_score(spark, results):
    m = rollup.with_quality_score(rollup.with_consistency(rollup.daily_rollup(results)))
    rows = {(r["contract_id"], str(r["day"])): r for r in m.collect()}
    # day 1 for A: single point → consistency 100
    assert rows[("A", "2025-03-01")]["consistency_score"] == 100.0
    # day 2: var_pop([100, 50]) = 625 → max(0, 100-625) = 0
    assert rows[("A", "2025-03-02")]["consistency_score"] == 0.0
    # day 3: var_pop([100,50,100]) = 555.55.. → 0
    assert rows[("A", "2025-03-03")]["consistency_score"] == 0.0
    # quality score day1: 100*0.7 + 100*0.2 + min(4/1000,1)*10 = 90.04
    assert rows[("A", "2025-03-01")]["quality_score"] == pytest.approx(90.04)
    # day2: 50*0.7 + 0*0.2 + 0.04 = 35.04
    assert rows[("A", "2025-03-02")]["quality_score"] == pytest.approx(35.04)


def test_trend(spark):
    rows = [
        ("UP", dt.date(2025, 3, 1) + dt.timedelta(days=i), float(50 + 10 * i))
        for i in range(5)
    ] + [
        ("DOWN", dt.date(2025, 3, 1) + dt.timedelta(days=i), float(90 - 10 * i))
        for i in range(5)
    ] + [
        ("FLAT", dt.date(2025, 3, 1) + dt.timedelta(days=i), 75.0)
        for i in range(5)
    ] + [("ONE", dt.date(2025, 3, 1), 50.0)]
    m = spark.createDataFrame(rows, "contract_id string, day date, pass_rate double")
    t = {r["contract_id"]: r["trend"] for r in rollup.trend(m).collect()}
    assert t == {"UP": "INCREASING", "DOWN": "DECREASING",
                 "FLAT": "STABLE", "ONE": "STABLE"}


def test_platform_summary(spark, results):
    m = rollup.with_quality_score(rollup.with_consistency(rollup.daily_rollup(results)))
    s = rollup.platform_summary(m, top_n=1)
    assert s["n_contracts"] == 2
    assert s["total_validations"] == 13
    assert s["top_contracts"][0][0] == "A"
    assert s["bottom_contracts"][0][0] == "B"
