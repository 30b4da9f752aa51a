"""YAML Contract Definition Language parser.

Structural rules have parity with the reference parser
(`app/core/yaml_parser.py:31-269`):
  * top-level must be a mapping with `contract_version` and a non-empty
    `schema`;
  * every field spec must carry a valid `type`;
  * `pattern` must compile as a regex;
  * `format` ∈ {email, url, uuid, ipv4};
  * `min <= max`, `min_length <= max_length`;
  * `array` fields must declare `items`; `object` fields must declare
    `properties`;
  * quality rules: freshness requires positive `max_latency_hours`;
    completeness `min_row_count >= 0` and `0 <= max_null_percentage <= 100`;
    uniqueness requires a non-empty `fields` list; statistics entries must
    be per-field mappings.
Invalid quality rules are dropped with a warning rather than failing the
contract (reference behavior, `yaml_parser.py:54-59`).
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional

import yaml

from .model import (
    ALLOWED_FIELD_TYPES,
    ALLOWED_FORMATS,
    Contract,
    ContractError,
    FieldDef,
    QualityRules,
)

log = logging.getLogger(__name__)

_VERSION_RE = re.compile(r"^\d+\.\d+$")


def parse_contract_yaml(text: str, name: str = "contract") -> Contract:
    try:
        raw = yaml.safe_load(text)
    except yaml.YAMLError as exc:
        raise ContractError(f"invalid YAML syntax: {exc}") from exc
    if not isinstance(raw, dict):
        raise ContractError("contract YAML must be a mapping")
    return contract_from_dict(raw, name=name)


def contract_from_dict(raw: Dict[str, Any], name: str = "contract") -> Contract:
    for key in ("contract_version", "schema"):
        if key not in raw:
            raise ContractError(
                f"missing required key '{key}' (need contract_version and schema)"
            )

    version = str(raw["contract_version"])
    if not _VERSION_RE.match(version):
        raise ContractError(f"contract_version must look like 'X.Y', got {version!r}")

    schema = raw["schema"]
    if not isinstance(schema, dict) or not schema:
        raise ContractError("schema must be a non-empty mapping of field specs")

    fields = []
    for fname, spec in schema.items():
        if not isinstance(spec, dict):
            raise ContractError(f"field '{fname}' spec must be a mapping")
        fields.append((fname, _parse_field(fname, spec)))

    quality = QualityRules()
    if raw.get("quality_rules") is not None:
        try:
            quality = _parse_quality(raw["quality_rules"])
        except ContractError as exc:
            # parity: bad quality rules degrade to none, not a hard failure
            log.warning("dropping invalid quality_rules: %s", exc)
            quality = QualityRules()

    return Contract(
        contract_version=version,
        domain=raw.get("domain", "default"),
        description=raw.get("description"),
        fields=tuple(fields),
        quality=quality,
        name=name,
    )


def _parse_field(path: str, spec: Dict[str, Any]) -> FieldDef:
    if "type" not in spec:
        raise ContractError(f"field '{path}' must declare a type")
    ftype = spec["type"]
    if ftype not in ALLOWED_FIELD_TYPES:
        raise ContractError(
            f"field '{path}': type {ftype!r} not in {list(ALLOWED_FIELD_TYPES)}"
        )

    pattern = spec.get("pattern")
    if pattern is not None:
        try:
            re.compile(pattern)
        except re.error as exc:
            raise ContractError(f"field '{path}': bad regex pattern: {exc}") from exc

    fmt = spec.get("format")
    if fmt is not None and fmt not in ALLOWED_FORMATS:
        raise ContractError(
            f"field '{path}': format {fmt!r} not in {list(ALLOWED_FORMATS)}"
        )

    lo, hi = spec.get("min"), spec.get("max")
    if lo is not None and hi is not None:
        try:
            if lo > hi:
                raise ContractError(f"field '{path}': min ({lo}) must be <= max ({hi})")
        except TypeError:
            pass  # mixed types (e.g. timestamp strings vs numbers) — leave to compile
    lmin, lmax = spec.get("min_length"), spec.get("max_length")
    if lmin is not None and lmax is not None and lmin > lmax:
        raise ContractError(f"field '{path}': min_length must be <= max_length")

    items: Optional[FieldDef] = None
    if ftype == "array":
        if "items" not in spec:
            raise ContractError(f"array field '{path}' must declare 'items'")
        items = _parse_field(f"{path}[]", spec["items"])

    props = None
    if ftype == "object":
        if "properties" not in spec:
            raise ContractError(f"object field '{path}' must declare 'properties'")
        props = tuple(
            (pname, _parse_field(f"{path}.{pname}", pspec))
            for pname, pspec in spec["properties"].items()
        )

    enum = spec.get("enum")
    return FieldDef(
        type=ftype,
        required=spec.get("required", True),
        pattern=pattern,
        format=fmt,
        min=lo,
        max=hi,
        min_length=lmin,
        max_length=lmax,
        enum=tuple(enum) if enum else None,
        items=items,
        properties=props,
        description=spec.get("description"),
    )


def serialize_contract_yaml(contract: Contract) -> str:
    """Contract IR → YAML text (parity with the reference's
    ``serialize_to_yaml``, `app/core/yaml_parser.py:271-335`): declaration
    order preserved, optional keys emitted only when set, ``type`` +
    ``required`` always present on every field.

    Round-trip invariant (property-tested):
    ``parse_contract_yaml(serialize_contract_yaml(c), name=c.name) == c``
    — so programmatically constructed IR can be persisted in the
    versioning registry (which stores YAML text) and rolled back safely.
    """
    data: Dict[str, Any] = {
        "contract_version": contract.contract_version,
        "domain": contract.domain,
    }
    if contract.description:
        data["description"] = contract.description
    data["schema"] = {name: _field_to_dict(fd) for name, fd in contract.fields}
    quality = _quality_to_dict(contract.quality)
    if quality:
        data["quality_rules"] = quality
    return yaml.dump(
        data,
        default_flow_style=False,
        sort_keys=False,
        indent=2,
        allow_unicode=True,
    )


def _field_to_dict(fd: FieldDef) -> Dict[str, Any]:
    out: Dict[str, Any] = {"type": fd.type, "required": fd.required}
    if fd.pattern is not None:
        out["pattern"] = fd.pattern
    if fd.format is not None:
        out["format"] = fd.format
    if fd.min is not None:
        out["min"] = fd.min
    if fd.max is not None:
        out["max"] = fd.max
    if fd.min_length is not None:
        out["min_length"] = fd.min_length
    if fd.max_length is not None:
        out["max_length"] = fd.max_length
    if fd.description:
        out["description"] = fd.description
    if fd.enum:
        out["enum"] = list(fd.enum)
    if fd.items is not None:
        out["items"] = _field_to_dict(fd.items)
    if fd.properties is not None:
        out["properties"] = {
            name: _field_to_dict(p) for name, p in fd.properties
        }
    return out


def _quality_to_dict(q: QualityRules) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in (
        "freshness",
        "completeness",
        "uniqueness",
        "statistics",
        "referential",
        "drift",
    ):
        value = getattr(q, key)
        if value is not None:
            out[key] = value
    return out


def _parse_quality(raw: Any) -> QualityRules:
    if not isinstance(raw, dict):
        raise ContractError("quality_rules must be a mapping")

    out: Dict[str, Any] = {}

    if "freshness" in raw:
        fr = raw["freshness"]
        if not isinstance(fr, dict) or "max_latency_hours" not in fr:
            raise ContractError(
                "Freshness rule must specify 'max_latency_hours'"
            )
        hours = fr["max_latency_hours"]
        if not isinstance(hours, (int, float)) or isinstance(hours, bool) or hours <= 0:
            raise ContractError("max_latency_hours must be a positive number")
        out["freshness"] = dict(fr)

    if "completeness" in raw:
        comp = raw["completeness"]
        if not isinstance(comp, dict):
            raise ContractError("completeness must be a mapping")
        if "min_row_count" in comp:
            mrc = comp["min_row_count"]
            if not isinstance(mrc, int) or isinstance(mrc, bool) or mrc < 0:
                raise ContractError("min_row_count must be a non-negative integer")
        if "max_null_percentage" in comp:
            mnp = comp["max_null_percentage"]
            if not isinstance(mnp, (int, float)) or not (0 <= mnp <= 100):
                raise ContractError(
                    "max_null_percentage must be between 0 and 100"
                )
        out["completeness"] = dict(comp)

    if "uniqueness" in raw:
        uniq = raw["uniqueness"]
        if not isinstance(uniq, dict) or not isinstance(uniq.get("fields"), list) \
                or not uniq["fields"]:
            raise ContractError("uniqueness needs a non-empty 'fields' list")
        out["uniqueness"] = dict(uniq)

    if "statistics" in raw:
        stats = raw["statistics"]
        if not isinstance(stats, dict):
            raise ContractError("statistics must be a mapping")
        for fname, constraints in stats.items():
            if not isinstance(constraints, dict):
                raise ContractError(f"statistics for '{fname}' must be a mapping")
            pcts = constraints.get("percentiles")
            if pcts is not None:
                if not isinstance(pcts, dict) or not pcts:
                    raise ContractError(
                        f"statistics['{fname}'].percentiles must be a "
                        "non-empty mapping of percentile -> bounds"
                    )
                for pk, bounds in pcts.items():
                    try:
                        p = float(pk)
                    except (TypeError, ValueError):
                        raise ContractError(
                            f"statistics['{fname}'].percentiles key {pk!r} "
                            "must be a number"
                        )
                    if not 0 < p < 1:
                        raise ContractError(
                            f"statistics['{fname}'].percentiles key {pk!r} "
                            "must be strictly between 0 and 1"
                        )
                    if not isinstance(bounds, dict) or not (
                        {"min", "max"} & set(bounds)
                    ):
                        raise ContractError(
                            f"statistics['{fname}'].percentiles[{pk!r}] "
                            "needs 'min' and/or 'max'"
                        )
                    for bk in ("min", "max"):
                        if bk in bounds and not isinstance(
                            bounds[bk], (int, float)
                        ):
                            raise ContractError(
                                f"statistics['{fname}'].percentiles"
                                f"[{pk!r}].{bk} must be a number"
                            )
        out["statistics"] = dict(stats)

    if "referential" in raw:
        ref = raw["referential"]
        if not isinstance(ref, dict):
            raise ContractError("referential must be a mapping of field -> spec")
        for fname, spec in ref.items():
            if not isinstance(spec, dict) or not (
                "values" in spec or ("table" in spec and "column" in spec)
            ):
                raise ContractError(
                    f"referential['{fname}'] needs 'values' or 'table'+'column'"
                )
        out["referential"] = dict(ref)

    if "drift" in raw:
        drift = raw["drift"]
        if not isinstance(drift, dict):
            raise ContractError("drift must be a mapping of field -> spec")
        out["drift"] = dict(drift)

    return QualityRules(**out)
