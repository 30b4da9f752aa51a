"""Referential-integrity checks as broadcast anti-joins.

Generalizes the reference's enum-membership check
(`app/core/schema_validator.py:146-155`, SURVEY.md §2.4 J2) to
vocabularies too large to inline as literals: role/tool vocabularies,
dimension-table keys. The vocabulary side is always broadcast — it is the
small dimension — so the fact table never shuffles.

NULL values are treated as "no reference to check" (the reference only
runs enum checks on present values); nullability is the completeness /
required-field rule's job.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


def vocab_df(spark: SparkSession, values: Iterable, column: str) -> DataFrame:
    return spark.createDataFrame([(v,) for v in values], [column])


def invalid_references(
    df: DataFrame,
    column: str,
    vocab: DataFrame,
    vocab_column: Optional[str] = None,
) -> DataFrame:
    """Rows of ``df`` whose non-null ``column`` is absent from the vocab.

    Plan shape: ``df ⟕anti broadcast(vocab)`` — one scan of the fact
    table, zero shuffle of it.
    """
    vc = vocab_column or column
    vocab_keys = vocab.select(F.col(vc).alias("__vocab_key")).distinct()
    return df.filter(F.col(column).isNotNull()).join(
        F.broadcast(vocab_keys),
        on=F.col(column) == F.col("__vocab_key"),
        how="left_anti",
    )


def referential_violations(
    df: DataFrame,
    column: str,
    vocab: DataFrame,
    key_columns: Iterable[str],
    contract_id: str = "contract",
    vocab_column: Optional[str] = None,
) -> DataFrame:
    """Violation rows (contract_id, rule, field, value, key columns...)."""
    bad = invalid_references(df, column, vocab, vocab_column)
    return bad.select(
        F.lit(contract_id).alias("contract_id"),
        F.lit("REFERENTIAL").alias("rule"),
        F.lit(column).alias("field"),
        F.col(column).cast("string").alias("value"),
        *[F.col(k) for k in key_columns],
    )
