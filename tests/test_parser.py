"""Contract CDL parser tests — parity with reference tests/test_yaml_parser.py."""

import pytest

from data_contract_engine_spark.contracts.model import ContractError
from data_contract_engine_spark.contracts.parser import (
    contract_from_dict,
    parse_contract_yaml,
)


def test_valid_contract_parses(user_contract_yaml):
    c = parse_contract_yaml(user_contract_yaml, name="users")
    assert c.contract_version == "1.0"
    assert c.domain == "users"
    assert [n for n, _ in c.fields] == ["user_id", "email", "age", "timestamp"]
    fd = c.fields_dict()
    assert fd["user_id"].pattern == r"^usr_\d+$"
    assert fd["age"].required is False
    assert fd["age"].min == 0 and fd["age"].max == 120
    assert c.quality.freshness == {"max_latency_hours": 24}


def test_missing_required_keys():
    with pytest.raises(ContractError, match="contract_version"):
        contract_from_dict({"schema": {"a": {"type": "string"}}})
    with pytest.raises(ContractError, match="schema"):
        contract_from_dict({"contract_version": "1.0"})


def test_bad_version_format():
    with pytest.raises(ContractError, match="X.Y"):
        contract_from_dict({"contract_version": "v1", "schema": {"a": {"type": "string"}}})


def test_empty_schema_rejected():
    with pytest.raises(ContractError):
        contract_from_dict({"contract_version": "1.0", "schema": {}})


def test_invalid_type_rejected():
    with pytest.raises(ContractError, match="type"):
        contract_from_dict(
            {"contract_version": "1.0", "schema": {"a": {"type": "decimal"}}}
        )


def test_bad_regex_rejected():
    with pytest.raises(ContractError, match="regex|pattern"):
        contract_from_dict(
            {"contract_version": "1.0",
             "schema": {"a": {"type": "string", "pattern": "[unclosed"}}}
        )


def test_bad_format_rejected():
    with pytest.raises(ContractError, match="format"):
        contract_from_dict(
            {"contract_version": "1.0",
             "schema": {"a": {"type": "string", "format": "phone"}}}
        )


def test_min_max_ordering():
    with pytest.raises(ContractError, match="min"):
        contract_from_dict(
            {"contract_version": "1.0",
             "schema": {"a": {"type": "integer", "min": 10, "max": 1}}}
        )
    with pytest.raises(ContractError, match="min_length"):
        contract_from_dict(
            {"contract_version": "1.0",
             "schema": {"a": {"type": "string", "min_length": 9, "max_length": 2}}}
        )


def test_array_requires_items_object_requires_properties():
    with pytest.raises(ContractError, match="items"):
        contract_from_dict(
            {"contract_version": "1.0", "schema": {"a": {"type": "array"}}}
        )
    with pytest.raises(ContractError, match="properties"):
        contract_from_dict(
            {"contract_version": "1.0", "schema": {"a": {"type": "object"}}}
        )


def test_invalid_quality_rules_dropped_not_fatal():
    # parity: reference logs a warning and keeps the contract
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {"a": {"type": "string"}},
            "quality_rules": {"freshness": {"max_latency_hours": -5}},
        }
    )
    assert c.quality.freshness is None


def test_quality_rule_bounds():
    with_rules = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {"a": {"type": "string"}},
            "quality_rules": {
                "completeness": {"min_row_count": 10, "max_null_percentage": 5},
                "uniqueness": {"fields": ["a"]},
                "statistics": {"a": {"mean": {"min": 0}}},
            },
        }
    )
    assert with_rules.quality.completeness["min_row_count"] == 10
    assert with_rules.quality.uniqueness["fields"] == ["a"]
