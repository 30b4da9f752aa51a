"""Contract IR: frozen dataclasses for the YAML Contract Definition Language.

Capability parity with the reference data-contract-engine
(`app/models/schemas.py:9-96` — FieldDefinition / ContractSchema pydantic
models), re-expressed as plain dataclasses so a compiled contract can ship
to executors cheaply and hash deterministically.

The error taxonomy mirrors `docs/contract-spec.md:614-630` in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Dict, List, Optional

# ---------------------------------------------------------------------------
# Error taxonomy (reference: docs/contract-spec.md:614-630)
# ---------------------------------------------------------------------------

SCHEMA_ERROR_TYPES = (
    "REQUIRED_FIELD_MISSING",
    "TYPE_MISMATCH",
    "PATTERN_MISMATCH",
    "FORMAT_MISMATCH",
    "LENGTH_TOO_SHORT",
    "LENGTH_TOO_LONG",
    "ENUM_MISMATCH",
    "VALUE_TOO_SMALL",
    "VALUE_TOO_LARGE",
    "INVALID_TIMESTAMP",
    "TIMESTAMP_TOO_OLD",
    "TIMESTAMP_TOO_RECENT",
    "ARRAY_TOO_SHORT",
    "ARRAY_TOO_LONG",
)

QUALITY_RULE_TYPES = (
    "FRESHNESS",
    "COMPLETENESS",
    "UNIQUENESS",
    "STATISTICS",
    "REFERENTIAL",   # extension: vocab membership via broadcast anti-join
    "DRIFT",         # extension: KL/PSI distribution drift vs baseline
)

ALLOWED_FIELD_TYPES = (
    "string",
    "integer",
    "float",
    "boolean",
    "timestamp",
    "date",
    "array",
    "object",
)

ALLOWED_FORMATS = ("email", "url", "uuid", "ipv4")

# Format regexes are part of the observable contract surface
# (reference: app/core/schema_validator.py:355-368); matched case-insensitively.
FORMAT_REGEXES: Dict[str, str] = {
    "email": r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$",
    "url": r"^https?://[^\s/$.?#].[^\s]*$",
    "uuid": r"^[0-9a-f]{8}-([0-9a-f]{4}-){3}[0-9a-f]{12}$",
    "ipv4": (
        r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
        r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"
    ),
}

# Severity model (reference: app/core/quality_validator.py:78,210-233):
# STATISTICS violations are WARNING (do not fail the verdict); everything
# else is ERROR. Quality score = 100 - 10*#ERROR - 3*#WARNING, floored at 0.
SEVERITY_ERROR = "ERROR"
SEVERITY_WARNING = "WARNING"

ERROR_PENALTY = 10.0
WARNING_PENALTY = 3.0


class ContractError(Exception):
    """Base for contract parsing/validation problems."""


@dataclass(frozen=True)
class FieldDef:
    """One declared field of a contract schema.

    Mirrors the reference FieldDefinition (`app/models/schemas.py:9-21`):
    type, required, pattern, format, min, max, min_length, max_length,
    enum, items (array element spec), properties (object prop specs).
    """

    type: str
    required: bool = True
    pattern: Optional[str] = None
    format: Optional[str] = None
    min: Optional[Any] = None            # numeric or ISO timestamp string
    max: Optional[Any] = None
    min_length: Optional[int] = None
    max_length: Optional[int] = None
    enum: Optional[tuple] = None
    items: Optional["FieldDef"] = None
    properties: Optional[tuple] = None   # tuple[(name, FieldDef), ...] — ordered
    description: Optional[str] = None

    def properties_dict(self) -> Dict[str, "FieldDef"]:
        return dict(self.properties or ())


@dataclass(frozen=True)
class QualityRules:
    """Dataset-level quality rules.

    freshness: {"max_latency_hours": float, optional "fields": [..]}
    completeness: {"min_row_count": int, "max_null_percentage": float}
    uniqueness: {"fields": [str | list[str]]} — a list entry is a composite key
        (extension; the reference only supports independent single fields,
        `app/core/quality_validator.py:157-182`).
    statistics: {field: {"mean": {"min","max"}, "std_dev": {"max"},
        "distinct_count": {"min","max"},
        "percentiles": {p∈(0,1): {"min","max"}},
        "exact_percentiles": bool (default False = mergeable approx
        sketch; exact buffers per-value counts — see aggregates.py)}}
        — cardinality/percentile bounds are an
        extension (approx_count_distinct sketch in the fused agg).
    referential: {field: {"values": [...]} | {"table": name, "column": c}}
        (extension of enum-as-membership, SURVEY.md §2.4 J2).
    drift: {field: {"metric": "psi"|"kl", "threshold": float, "bins": int,
        "type": "categorical" for enum-ish fields (buckets = baseline's
        top-k categories + __other__ instead of numeric quantile edges)}}
        (extension, SURVEY.md §2.3 A16).
    """

    freshness: Optional[Dict[str, Any]] = None
    completeness: Optional[Dict[str, Any]] = None
    uniqueness: Optional[Dict[str, Any]] = None
    statistics: Optional[Dict[str, Any]] = None
    referential: Optional[Dict[str, Any]] = None
    drift: Optional[Dict[str, Any]] = None

    def any(self) -> bool:
        return any(
            v is not None
            for v in (
                self.freshness,
                self.completeness,
                self.uniqueness,
                self.statistics,
                self.referential,
                self.drift,
            )
        )


@dataclass(frozen=True)
class Contract:
    """A parsed contract: versioned schema + quality rules.

    Mirrors reference ContractSchema (`app/models/schemas.py:77-96`):
    contract_version must look like 'X.Y', schema must be non-empty.
    """

    contract_version: str
    fields: tuple                          # tuple[(name, FieldDef), ...] — ordered
    domain: str = "default"
    description: Optional[str] = None
    quality: QualityRules = dc_field(default_factory=QualityRules)
    name: str = "contract"

    def fields_dict(self) -> Dict[str, FieldDef]:
        return dict(self.fields)

    def field_names(self) -> List[str]:
        return [n for n, _ in self.fields]
