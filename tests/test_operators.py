"""Uniqueness / referential / drift operator tests."""

import math

from pyspark.sql import functions as F

from data_contract_engine_spark.operators import referential as ref_op
from data_contract_engine_spark.operators import uniqueness as uniq_op
from data_contract_engine_spark.operators.drift import (
    histogram,
    psi_kl,
    psi_kl_exact,
    quantile_edges,
)


def test_salted_equals_unsalted(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    a = {
        (r["k"],): r["dup_count"]
        for r in uniq_op.duplicate_counts(df, "k", salted=True).collect()
    }
    b = {
        (r["k"],): r["dup_count"]
        for r in uniq_op.duplicate_counts(df, "k", salted=False).collect()
    }
    assert a == b and len(a) == 7


def test_composite_duplicates(spark):
    df = spark.createDataFrame(
        [("c1", 0), ("c1", 0), ("c1", 1), ("c2", 0)], "conv_id string, turn_idx int"
    )
    dups = uniq_op.duplicate_counts(df, ["conv_id", "turn_idx"]).collect()
    assert len(dups) == 1
    assert (dups[0]["conv_id"], dups[0]["turn_idx"], dups[0]["dup_count"]) == \
        ("c1", 0, 2)


def test_duplicate_report_ordering(spark):
    df = spark.createDataFrame(
        [("a",)] * 2 + [("b",)] * 5 + [("c",)] * 3 + [("d",)],
        "k string",
    )
    n, top = uniq_op.duplicate_report(df, "k", top_n=2)
    assert n == 3
    assert top == ["'b' (5x)", "'c' (3x)"]  # count desc, deterministic


def test_referential_anti_join_broadcast(spark):
    df = spark.createDataFrame(
        [("r1", "search"), ("r2", "fax"), ("r3", None), ("r4", "sql")],
        "id string, tool string",
    )
    vocab = ref_op.vocab_df(spark, ["search", "browser", "python", "sql"], "tool")
    bad = ref_op.invalid_references(df, "tool", vocab)
    rows = bad.collect()
    assert [r["id"] for r in rows] == ["r2"]  # null is not a violation
    plan = bad._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_drift_zero_for_identical(spark):
    df = spark.range(5000).select((F.col("id") % 100).cast("double").alias("x"))
    score = psi_kl(df, df, "x", bins=10)
    assert abs(score.psi) < 1e-9
    assert abs(score.kl) < 1e-9


def test_drift_detects_shift(spark):
    base = spark.range(5000).select((F.col("id") % 100).cast("double").alias("x"))
    cur = spark.range(5000).select(
        ((F.col("id") % 100) + 80).cast("double").alias("x")
    )
    score = psi_kl(cur, base, "x", bins=10)
    assert score.psi > 0.2


def test_psi_matches_exact_arithmetic(spark):
    base = spark.range(2000).select((F.col("id") % 50).cast("double").alias("x"))
    cur = spark.range(2000).select(((F.col("id") * 7) % 90).cast("double").alias("x"))
    edges = quantile_edges(base, "x", 10)
    ch = {r["bin"]: r["cnt"] for r in histogram(cur, "x", edges).collect()}
    bh = {r["bin"]: r["cnt"] for r in histogram(base, "x", edges).collect()}
    bins = sorted(set(ch) | set(bh))
    exp_psi, exp_kl = psi_kl_exact(
        [ch.get(b, 0) for b in bins], [bh.get(b, 0) for b in bins]
    )
    score = psi_kl(cur, base, "x", bins=10)
    assert math.isclose(score.psi, exp_psi, rel_tol=1e-9)
    assert math.isclose(score.kl, exp_kl, rel_tol=1e-9)
