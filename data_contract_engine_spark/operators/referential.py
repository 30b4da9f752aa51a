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


def fused_vocab_miss_agg(
    df: DataFrame,
    vocabs: "dict[str, tuple[DataFrame, Optional[str]]]",
    n_examples: int = 5,
) -> DataFrame:
    """ONE-row aggregate covering EVERY table-backed vocab column in a
    single query: the fact table chains through one broadcast LEFT join
    per column (marking membership via the surviving key column), then a
    single global aggregate counts misses and collects ≤``n_examples``
    sorted example values per column.

    ``vocabs``: {fact_column: (vocab_df, vocab_column_or_None)}.
    Output columns: ``__refn__{col}`` (miss count, long) and
    ``__refex__{col}`` (array<string> examples).

    Plan shape: one scan of the fact table, zero fact shuffles (all
    joins broadcast, the aggregate is global with map-side partial
    combine), one job regardless of k — the round-2 verdict fix for the
    one-collect-per-column anti-join loop.
    """
    joined = df
    for column, (vocab, vocab_col) in vocabs.items():
        vc = vocab_col or column
        marker = f"__refvocab__{column}"
        joined = joined.join(
            F.broadcast(vocab.select(F.col(vc).alias(marker)).distinct()),
            on=F.col(column) == F.col(marker),
            how="left",
        )
    aggs = []
    for column in vocabs:
        bad = F.col(column).isNotNull() & F.col(
            f"__refvocab__{column}"
        ).isNull()
        aggs.append(F.sum(bad.cast("long")).alias(f"__refn__{column}"))
        aggs.append(
            F.slice(
                F.sort_array(
                    F.collect_set(F.when(bad, F.col(column).cast("string")))
                ),
                1, n_examples,
            ).alias(f"__refex__{column}")
        )
    return joined.agg(*aggs)


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
