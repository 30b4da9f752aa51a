"""Metrics rollups: daily aggregation, consistency, trend, platform summary.

Parity targets (SURVEY.md §2.3 A11–A15):
  * daily rollup per (contract, day): total/passed/failed/pass_rate/
    avg_exec_ms/top-10 error types — `app/core/metrics_aggregator.py:17-88`,
    upsert ≙ Iceberg ``MERGE INTO`` (idempotent re-aggregation here:
    recompute-and-overwrite by day, which the reference's upsert emulates);
  * composite quality score: ``pass_rate*0.7 + consistency*0.2 +
    min(total/1000, 1)*10``, ×0.95 if >5 distinct error types —
    `metrics_aggregator.py:90-106`;
  * consistency: ``100 − var_pop(pass_rate)`` over the trailing 7 days,
    100.0 with <2 data points — `metrics_aggregator.py:108-136`
    (population variance, clamped ≥ 0);
  * trend: OLS slope of pass_rate over day index; >0.5 INCREASING,
    <−0.5 DECREASING, else STABLE — `metrics_aggregator.py:176-198`,
    via native ``regr_slope`` (no driver math).

All operators are single groupBy/window passes over the (tiny relative to
input) results table; everything stays a DataFrame until the final
driver-side summary row.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

# results relation columns expected: contract_id string, passed boolean,
# errors array<struct<...,error_type,...>>, validated_at timestamp,
# execution_time_ms double (optional)


def daily_rollup(results: DataFrame, top_errors: int = 10) -> DataFrame:
    """Per (contract_id, day): counters + pass_rate + avg exec ms +
    top-N error types (ranked count DESC, type ASC for determinism)."""
    has_exec = "execution_time_ms" in results.columns
    day = F.to_date("validated_at").alias("day")
    base = results.groupBy(F.col("contract_id"), day).agg(
        F.count(F.lit(1)).alias("total_validations"),
        F.sum(F.col("passed").cast("long")).alias("passed_count"),
        F.sum((~F.col("passed")).cast("long")).alias("failed_count"),
        F.round(F.avg(F.col("passed").cast("double")) * 100.0, 4).alias(
            "pass_rate"
        ),
        (
            F.round(F.avg("execution_time_ms"), 4)
            if has_exec
            else F.lit(None).cast("double")
        ).alias("avg_execution_time_ms"),
    )
    # top error types per (contract, day) from the exploded violations
    errs = (
        results.filter(F.size("errors") > 0)
        .select(
            "contract_id",
            F.to_date("validated_at").alias("day"),
            F.explode("errors").alias("e"),
        )
        .groupBy("contract_id", "day", F.col("e.error_type").alias("error_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("contract_id", "day").orderBy(
        F.desc("cnt"), F.asc("error_type")
    )
    top = (
        errs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_errors)
        .groupBy("contract_id", "day")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("error_type", "cnt"))
            ).alias("top_error_types")
        )
    )
    return base.join(top, ["contract_id", "day"], "left")


def with_consistency(metrics: DataFrame) -> DataFrame:
    """consistency_score = 100 − var_pop(pass_rate) over the trailing
    7 rows (days) per contract; 100.0 when fewer than 2 points; floored
    at 0."""
    w = Window.partitionBy("contract_id").orderBy("day").rowsBetween(-6, 0)
    var = F.var_pop("pass_rate").over(w)
    n = F.count(F.lit(1)).over(w)
    score = F.when(n < 2, F.lit(100.0)).otherwise(
        F.greatest(F.lit(0.0), F.round(100.0 - var, 4))
    )
    return metrics.withColumn("consistency_score", score)


def with_quality_score(metrics: DataFrame) -> DataFrame:
    """Composite quality score (A12): needs consistency_score column."""
    volume = F.least(F.col("total_validations") / 1000.0, F.lit(1.0)) * 10.0
    score = (
        F.col("pass_rate") * 0.7
        + F.col("consistency_score") * 0.2
        + volume
    )
    n_types = F.size(F.map_keys(F.coalesce(
        F.col("top_error_types"),
        F.expr("map()").cast("map<string,bigint>"),
    )))
    score = F.when(n_types > 5, score * 0.95).otherwise(score)
    return metrics.withColumn(
        "quality_score", F.round(F.least(score, F.lit(100.0)), 4)
    )


def trend(metrics: DataFrame) -> DataFrame:
    """Per contract: OLS slope of pass_rate over day index via native
    regr_slope; classify ±0.5 (A14)."""
    x = F.datediff(F.col("day"), F.lit("1970-01-01")).cast("double")
    per = metrics.groupBy("contract_id").agg(
        F.regr_slope(F.col("pass_rate"), x).alias("slope"),
        F.count(F.lit(1)).alias("n_days"),
    )
    cls = (
        F.when(F.col("slope").isNull() | (F.col("n_days") < 2), "STABLE")
        .when(F.col("slope") > 0.5, "INCREASING")
        .when(F.col("slope") < -0.5, "DECREASING")
        .otherwise("STABLE")
    )
    return per.select(
        "contract_id", F.round("slope", 6).alias("slope"), cls.alias("trend")
    )


def platform_summary(metrics: DataFrame, top_n: int = 5) -> dict:
    """Driver-side summary (A15): totals, average pass rate, top/bottom
    contracts by mean quality score. All heavy lifting is one agg + one
    small sort."""
    totals = metrics.agg(
        F.countDistinct("contract_id").alias("n_contracts"),
        F.sum("total_validations").alias("total_validations"),
        F.round(F.avg("pass_rate"), 4).alias("avg_pass_rate"),
    ).collect()[0]
    by_contract = (
        metrics.groupBy("contract_id")
        .agg(F.round(F.avg("quality_score"), 4).alias("avg_quality"))
    )
    top = by_contract.orderBy(F.desc("avg_quality"), "contract_id").limit(top_n)
    bottom = by_contract.orderBy(F.asc("avg_quality"), "contract_id").limit(top_n)
    return {
        "n_contracts": totals["n_contracts"],
        "total_validations": totals["total_validations"],
        "avg_pass_rate": totals["avg_pass_rate"],
        "top_contracts": [(r["contract_id"], r["avg_quality"]) for r in top.collect()],
        "bottom_contracts": [
            (r["contract_id"], r["avg_quality"]) for r in bottom.collect()
        ],
    }


def results_relation(run, contract_id: str, validated_at=None) -> DataFrame:
    """Adapt a ValidationRun's validated frame into the results relation
    consumed by the rollups (per-record rows; the 10^12-scale deployment
    would persist per-partition verdicts instead and roll those up)."""
    v = run.validated
    if "errors" not in v.columns:
        # lean-predicate mode: attach error structs, computed only for
        # failing rows (the when-guard keeps passing rows at the empty
        # array without evaluating the big expression)
        from ..compiler.expressions import ERROR_ARRAY_DDL

        v = v.withColumn(
            "errors",
            F.when(
                F.col("passed"), F.array().cast(ERROR_ARRAY_DDL)
            ).otherwise(run.compiled.errors_col),
        )
    ts = F.col("ts") if "ts" in v.columns else F.current_timestamp()
    if validated_at is not None:
        ts = F.lit(validated_at)
    return v.select(
        F.lit(contract_id).alias("contract_id"),
        F.col("passed"),
        F.col("errors"),
        ts.cast("timestamp").alias("validated_at"),
    )
