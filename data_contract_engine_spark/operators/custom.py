"""Contract-supplied custom validators (Arrow-batched).

The reference lists "custom Python validators" as an unimplemented
roadmap item (`README.md:249`); here they are first-class but constrained
to the fast lane: a validator is a **vectorized** function over a pandas
DataFrame batch returning a boolean Series (True = row passes). It runs
via ``mapInPandas`` — Arrow batches, never per-row Python — and emits
standard violation rows that union with the compiled-rule violations.

Scale contract for authors: the function must be pure and row-local
(no cross-batch state), so it parallelizes per partition and composes
with checkpoint/resume. Cross-row logic belongs in quality rules or the
stateful streaming operators instead.
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Sequence

import pandas as pd

from pyspark.sql import DataFrame


def apply_custom_validator(
    df: DataFrame,
    name: str,
    fn: Callable[[pd.DataFrame], "pd.Series"],
    key_columns: Sequence[str],
    message: str = "custom validator failed",
    contract_id: str = "contract",
) -> DataFrame:
    """Violation rows (contract_id, key columns..., field, error_type,
    message) for rows where ``fn(batch)`` is False.

    One Arrow-batched pass; only failing rows' keys leave the executor.
    """
    keys = list(key_columns)
    key_schema = ", ".join(
        f"{k} {t}" for k, t in df.select(*keys).dtypes
    )
    out_schema = (
        f"contract_id string, {key_schema}, field string, "
        "error_type string, message string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok = fn(pdf)
            bad = pdf.loc[~ok.astype(bool), keys]
            if bad.empty:
                continue
            out = bad.copy()
            out.insert(0, "contract_id", contract_id)
            out["field"] = name
            out["error_type"] = "CUSTOM_VALIDATOR_FAILED"
            out["message"] = message
            yield out

    return df.mapInPandas(run, schema=out_schema)


def run_custom_validators(
    df: DataFrame,
    validators: dict,
    key_columns: Sequence[str],
    contract_id: str = "contract",
) -> DataFrame:
    """Union of violation rows from {name: fn} validators (each its own
    Arrow pass; fuse manually into one fn when the scan dominates)."""
    frames: List[DataFrame] = [
        apply_custom_validator(
            df, name, fn, key_columns, contract_id=contract_id
        )
        for name, fn in validators.items()
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
