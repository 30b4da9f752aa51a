"""Uniqueness / referential / drift operator tests."""

import math

import pytest

from pyspark.sql import functions as F

from data_contract_engine_spark.operators import referential as ref_op
from data_contract_engine_spark.operators import uniqueness as uniq_op
import pytest

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


def test_baseline_snapshot_matches_dataframe_path(spark):
    from data_contract_engine_spark.operators.drift import (
        baseline_snapshot,
        psi_kl,
        score_histograms_pandas,
    )

    base = spark.range(0, 2000).selectExpr("cast(id % 50 as double) as x")
    cur = spark.range(0, 2000).selectExpr("cast(id % 80 as double) as x")
    snap = baseline_snapshot(base, {"x": "x"}, bins=10)
    assert "x" in snap and len(snap["x"]["counts"]) == len(snap["x"]["edges"]) + 1
    # score via the snapshot path equals the DataFrame path
    from data_contract_engine_spark.operators.drift import (
        bin_expr,
        decode_histogram_row,
        multi_histogram_exprs,
    )

    row = cur.agg(*multi_histogram_exprs({"x": snap["x"]["edges"]}, {"x": "x"})) \
        .collect()[0].asDict()
    cur_counts = decode_histogram_row(row, "x", len(snap["x"]["edges"]) + 1)
    scores = score_histograms_pandas(
        spark, {"x": (cur_counts, snap["x"]["counts"])}
    )
    df_score = psi_kl(cur, base, "x", bins=10)
    assert scores["x"].psi == pytest.approx(df_score.psi, rel=1e-9)
    assert scores["x"].kl == pytest.approx(df_score.kl, rel=1e-9)


def test_engine_uses_snapshot_without_baseline_scans(spark):
    from data_contract_engine_spark import ContractEngine, parse_contract_yaml
    from data_contract_engine_spark.operators.drift import baseline_snapshot

    yaml_text = """
contract_version: "1.0"
schema:
  v: {type: float, required: true}
quality_rules:
  drift:
    v: {metric: psi, threshold: 0.1, bins: 5}
"""
    contract = parse_contract_yaml(yaml_text, name="snap")
    base = spark.range(0, 1000).selectExpr("cast(id % 10 as double) as v")
    cur = spark.range(0, 1000).selectExpr("cast(id % 3 as double) as v")
    snap = baseline_snapshot(base, {"v": "v"}, bins=5)
    eng = ContractEngine(spark, drift_baseline_snapshot=snap)
    rep = eng.validate(cur, contract, key_columns=["v"]).report()
    assert rep.quality is not None
    drift_errors = [e for e in rep.quality.errors if e.rule_type == "DRIFT"]
    assert drift_errors and drift_errors[0].details["psi"] > 0.1


def test_categorical_drift_psi(spark):
    """Categorical PSI: matches the exact driver-side arithmetic; a
    brand-new category in current rolls into __other__ (the baseline
    fixes the bucket space) and registers as drift."""
    from data_contract_engine_spark.operators import drift

    base = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20, "cat string"
    )
    cur_same = spark.createDataFrame(
        [("a",)] * 25 + [("b",)] * 15 + [("c",)] * 10, "cat string"
    )
    s = drift.psi_kl_categorical(cur_same, base, "cat")
    assert s.bins == 3 and abs(s.psi) < 1e-6  # identical proportions

    cur_new = spark.createDataFrame(
        [("a",)] * 10 + [("zzz",)] * 40, "cat string"
    )
    s2 = drift.psi_kl_categorical(cur_new, base, "cat")
    # exact arithmetic twin: __other__ absorbs the unseen category
    expected_psi, expected_kl = drift.psi_kl_exact(
        # joined buckets sorted by name: __other__, a, b, c
        [40, 10, 0, 0], [0, 50, 30, 20]
    )
    assert s2.psi == pytest.approx(expected_psi, rel=1e-9)
    assert s2.kl == pytest.approx(expected_kl, rel=1e-9)
    assert s2.psi > 1.0  # large shift


def test_categorical_other_collision_raises(spark):
    """'__other__' as a REAL category value collides with the rollup
    bucket → hard error instead of silently skewed histograms."""
    from data_contract_engine_spark.operators import drift

    df = spark.createDataFrame(
        [("__other__",), ("en",), ("en",)], ["lang"]
    )
    with pytest.raises(ValueError, match="__other__"):
        drift.categorical_histogram(df, "lang")
    with pytest.raises(ValueError, match="__other__"):
        drift.baseline_snapshot(df, {"lang": "lang"}, bins=5,
                                categorical=["lang"])
    # current-side literal also raises (baseline clean)
    base = spark.createDataFrame([("en",), ("fr",)], ["lang"])
    cur = spark.createDataFrame([("en",), ("__other__",)], ["lang"])
    with pytest.raises(ValueError, match="__other__"):
        drift.psi_kl_categorical(cur, base, "lang")
    # collision BELOW the top-k is caught by the ride-along flag
    crowd = [(c,) for c in "abcdef" for _ in range(5)] + [("__other__",)]
    rare = spark.createDataFrame(crowd, ["lang"])
    with pytest.raises(ValueError, match="__other__"):
        drift.psi_kl_categorical(base, rare, "lang", top_k=2)


def test_duplicate_clusters_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir → reliable checkpoint() per round; labels identical
    to the localCheckpoint default (the executor-loss durability knob
    must not change results)."""
    from data_contract_engine_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "id_a string, id_b string",
    )
    expected = {
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
        ("x", "x"), ("y", "x"),
    }
    local = {
        (r["id"], r["cluster_id"])
        for r in duplicate_clusters(pairs).collect()
    }
    reliable = {
        (r["id"], r["cluster_id"])
        for r in duplicate_clusters(
            pairs, checkpoint_dir=str(tmp_path / "cc_ckpt")
        ).collect()
    }
    assert local == reliable == expected
    # the reliable run actually materialized checkpoint files
    import os

    assert any(os.scandir(str(tmp_path / "cc_ckpt")))
