"""Physical data layout for the 10^12-turn deployment.

The north rule's Iceberg table would be partitioned by ``days(ts)`` and
bucketed by ``bucket(N, conv_id)``; this module provides the equivalents
available without Iceberg jars and the helpers that exploit them:

* **date partitioning** → partition pruning: a validation run over one day
  reads one directory (and the checkpoint planner's pending-partition
  filter becomes a pure metadata operation);
* **bucketing by conv_id** → co-located joins and aggregations: two tables
  bucketed the same way join with ZERO Exchange nodes, and a
  groupBy(conv_id...) over a bucketed table skips its shuffle. This is the
  structural fix for shuffle volume at 100 TB — pay one shuffle at write
  time, reuse it every read;
* **skew accounting**: hot conversations are bounded by bucket count —
  a bucket holds many conversations but one conversation never spans
  buckets, so AQE skew handling + in-bucket salting compose.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    extra_partition_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Parquet layout partitioned by event date (≙ Iceberg ``days(ts)``).
    Dynamic overwrite keeps re-runs idempotent per partition."""
    (
        df.withColumn("__day", F.to_date(F.col(ts_col)))
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__day", *extra_partition_cols)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 32,
    sort_col: Optional[str] = "turn_idx",
    mode: str = "overwrite",
) -> None:
    """Bucketed (and in-bucket sorted) managed table (≙ Iceberg
    ``bucket(N, conv_id)``). Joins/groupBys on the bucket column across
    tables with the same bucketing need no Exchange; the in-bucket sort on
    turn_idx gives the stable (conv_id, turn_idx) ordering the north rule
    requires for per-turn text equality without a sort at read time."""
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        w = w.sortBy(bucket_col, sort_col)
    w.saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> bool:
    """True iff joining the two bucketed tables on the bucket column plans
    without any Exchange (co-located sort-merge join)."""
    joined = spark.table(left_table).join(spark.table(right_table), on)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
