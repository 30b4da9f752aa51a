"""Contract change detection + semantic-version bumping (driver-side).

Behavior parity with the reference (`app/core/change_detector.py:69-383`,
`app/core/version_controller.py:73-91,150-219`), re-expressed over our
frozen-dataclass IR:

  * breaking: FIELD_REMOVED, REQUIRED_FIELD_ADDED, TYPE_CHANGED,
    FIELD_MADE_REQUIRED, PATTERN_STRICTER (heuristic: adding a pattern, or
    a longer pattern, is stricter), CONSTRAINT_TIGHTENED (min raised or
    max lowered, incl. None→bound), FORMAT_CHANGED (any difference),
    ENUM_VALUES_REMOVED (new ⊂ old);
  * non-breaking: OPTIONAL_FIELD_ADDED, FIELD_MADE_OPTIONAL,
    PATTERN_RELAXED, CONSTRAINT_RELAXED (min lowered / max raised incl.
    bound→None), ENUM_VALUES_ADDED (new ⊃ old);
  * enum changes that are neither subset nor superset are silent (parity
    with the reference's if/elif);
  * risk = min(100, 15·breaking + 3·non_breaking); level ≤20 LOW /
    ≤50 MEDIUM / ≤80 HIGH / else CRITICAL;
  * semver: breaking → major+1.0.0; any non-breaking → minor+1.0;
    else patch+1. Rollback restores old content under a forced major
    bump.

Contract metadata is tiny, so this never touches Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Dict, List, Optional, Tuple

from ..contracts.model import Contract, FieldDef

RISK_BREAKING = 15
RISK_NON_BREAKING = 3


@dataclass(frozen=True)
class Change:
    change_type: str
    field: str
    description: str
    old_value: Any = None
    new_value: Any = None

    def to_dict(self) -> Dict[str, Any]:
        return {
            "type": self.change_type,
            "field": self.field,
            "description": self.description,
            "old_value": None if self.old_value is None else str(self.old_value),
            "new_value": None if self.new_value is None else str(self.new_value),
        }


@dataclass(frozen=True)
class ChangeReport:
    breaking: Tuple[Change, ...]
    non_breaking: Tuple[Change, ...]

    @property
    def has_breaking(self) -> bool:
        return bool(self.breaking)

    @property
    def total(self) -> int:
        return len(self.breaking) + len(self.non_breaking)

    @property
    def risk_score(self) -> int:
        return min(
            100,
            RISK_BREAKING * len(self.breaking)
            + RISK_NON_BREAKING * len(self.non_breaking),
        )

    @property
    def risk_level(self) -> str:
        s = self.risk_score
        if s <= 20:
            return "LOW"
        if s <= 50:
            return "MEDIUM"
        if s <= 80:
            return "HIGH"
        return "CRITICAL"

    @property
    def summary(self) -> str:
        if not self.total:
            return "No changes detected"
        bits = []
        if self.breaking:
            bits.append(f"{len(self.breaking)} breaking change(s)")
        if self.non_breaking:
            bits.append(f"{len(self.non_breaking)} non-breaking change(s)")
        msg = f"Detected {', '.join(bits)}. Risk level: {self.risk_level}."
        if self.breaking:
            msg += " This update requires a major version bump."
        elif self.non_breaking:
            msg += " This update requires a minor version bump."
        return msg

    def to_dict(self) -> Dict[str, Any]:
        return {
            "breaking_changes": [c.to_dict() for c in self.breaking],
            "non_breaking_changes": [c.to_dict() for c in self.non_breaking],
            "risk_score": self.risk_score,
            "risk_level": self.risk_level,
            "total_changes": self.total,
            "summary": self.summary,
        }


def _pattern_is_stricter(old: Optional[str], new: Optional[str]) -> bool:
    if old is None:
        return new is not None
    if new is None:
        return False
    # heuristic carried over from the reference: longer pattern = stricter
    return len(new) > len(old)


def _range_tightened(old: FieldDef, new: FieldDef) -> bool:
    lo = new.min is not None and (old.min is None or new.min > old.min)
    hi = new.max is not None and (old.max is None or new.max < old.max)
    return lo or hi


def _range_relaxed(old: FieldDef, new: FieldDef) -> bool:
    lo = old.min is not None and (new.min is None or new.min < old.min)
    hi = old.max is not None and (new.max is None or new.max > old.max)
    return lo or hi


def _diff_field(name: str, old: FieldDef, new: FieldDef):
    breaking: List[Change] = []
    soft: List[Change] = []

    if old.type != new.type:
        breaking.append(
            Change(
                "TYPE_CHANGED",
                name,
                f"Type changed from {old.type} to {new.type}",
                old.type,
                new.type,
            )
        )
    if new.required and not old.required:
        breaking.append(
            Change(
                "FIELD_MADE_REQUIRED",
                name,
                f"Field '{name}' made required",
                False,
                True,
            )
        )
    elif old.required and not new.required:
        soft.append(
            Change(
                "FIELD_MADE_OPTIONAL",
                name,
                f"Field '{name}' made optional",
                True,
                False,
            )
        )
    if old.pattern != new.pattern:
        if _pattern_is_stricter(old.pattern, new.pattern):
            breaking.append(
                Change(
                    "PATTERN_STRICTER",
                    name,
                    "Pattern made stricter",
                    old.pattern,
                    new.pattern,
                )
            )
        else:
            soft.append(
                Change(
                    "PATTERN_RELAXED",
                    name,
                    "Pattern made more permissive",
                    old.pattern,
                    new.pattern,
                )
            )
    if _range_tightened(old, new):
        breaking.append(
            Change(
                "CONSTRAINT_TIGHTENED",
                name,
                "Numeric constraints tightened",
                {"min": old.min, "max": old.max},
                {"min": new.min, "max": new.max},
            )
        )
    elif _range_relaxed(old, new):
        soft.append(
            Change(
                "CONSTRAINT_RELAXED",
                name,
                "Numeric constraints relaxed",
                {"min": old.min, "max": old.max},
                {"min": new.min, "max": new.max},
            )
        )
    if old.format != new.format:
        breaking.append(
            Change(
                "FORMAT_CHANGED",
                name,
                f"Format changed from {old.format} to {new.format}",
                old.format,
                new.format,
            )
        )
    if old.enum != new.enum and new.enum is not None:
        old_set = set(old.enum or ())
        new_set = set(new.enum)
        if new_set < old_set:
            breaking.append(
                Change(
                    "ENUM_VALUES_REMOVED",
                    name,
                    "Enum values restricted",
                    list(old.enum or ()),
                    list(new.enum),
                )
            )
        elif new_set > old_set:
            soft.append(
                Change(
                    "ENUM_VALUES_ADDED",
                    name,
                    "Enum values expanded",
                    list(old.enum or ()),
                    list(new.enum),
                )
            )
    return breaking, soft


def detect_changes(old: Contract, new: Contract) -> ChangeReport:
    breaking: List[Change] = []
    soft: List[Change] = []
    old_fields = old.fields_dict()
    new_fields = new.fields_dict()

    for name in sorted(set(old_fields) - set(new_fields)):
        breaking.append(
            Change(
                "FIELD_REMOVED",
                name,
                f"Field '{name}' was removed",
                old_fields[name].type,
                None,
            )
        )
    for name in sorted(set(new_fields) - set(old_fields)):
        if new_fields[name].required:
            breaking.append(
                Change(
                    "REQUIRED_FIELD_ADDED",
                    name,
                    f"Required field '{name}' was added",
                    None,
                    new_fields[name].type,
                )
            )
        else:
            soft.append(
                Change(
                    "OPTIONAL_FIELD_ADDED",
                    name,
                    f"Optional field '{name}' was added",
                    None,
                    new_fields[name].type,
                )
            )
    for name in sorted(set(old_fields) & set(new_fields)):
        b, s = _diff_field(name, old_fields[name], new_fields[name])
        breaking.extend(b)
        soft.extend(s)
    return ChangeReport(breaking=tuple(breaking), non_breaking=tuple(soft))


def next_version(current: str, report: ChangeReport) -> str:
    parts = current.split(".")
    major = int(parts[0])
    minor = int(parts[1]) if len(parts) > 1 else 0
    patch = int(parts[2]) if len(parts) > 2 else 0
    if report.has_breaking:
        return f"{major + 1}.0.0"
    if report.non_breaking:
        return f"{major}.{minor + 1}.0"
    return f"{major}.{minor}.{patch + 1}"


def change_type(report: ChangeReport) -> str:
    if report.has_breaking:
        return "BREAKING"
    if report.non_breaking:
        return "NON_BREAKING"
    return "PATCH"
