"""Schema-rule compiler tests.

Mirrors the reference unit suite (tests/test_schema_validator.py:32-175)
at DataFrame level: same error types, same dotted/indexed paths, same
caps and boundary semantics.
"""

import datetime as dt

from pyspark.sql import functions as F

from data_contract_engine_spark import ContractEngine, contract_from_dict
from data_contract_engine_spark.compiler.expressions import (
    CompileOptions,
    compile_contract,
)


def _errors_for(spark, contract, rows, ddl, opts=None):
    df = spark.createDataFrame(rows, ddl)
    compiled = compile_contract(contract, df.schema, opts)
    out = df.select(
        compiled.errors_col.alias("errors"), compiled.passed_col.alias("passed")
    ).collect()
    return out


def _etypes(row):
    return [e["error_type"] for e in row["errors"]]


def test_valid_record_passes(spark):
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {
                "user_id": {"type": "string", "pattern": r"^usr_\d+$"},
                "email": {"type": "string", "format": "email"},
                "age": {"type": "integer", "min": 0, "max": 120, "required": False},
            },
        }
    )
    [row] = _errors_for(
        spark, c, [("usr_1", "a@b.co", 30)], "user_id string, email string, age int"
    )
    assert row["passed"] and row["errors"] == []


def test_required_field_missing_null(spark):
    c = contract_from_dict(
        {"contract_version": "1.0", "schema": {"user_id": {"type": "string"}}}
    )
    [row] = _errors_for(spark, c, [(None,)], "user_id string")
    assert _etypes(row) == ["REQUIRED_FIELD_MISSING"]
    e = row["errors"][0]
    assert e["message"] == "Required field 'user_id' is missing"
    assert e["expected"] == "required field"


def test_required_field_missing_absent_column(spark):
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {
                "present": {"type": "string"},
                "gone": {"type": "string", "required": True},
                "gone_opt": {"type": "string", "required": False},
            },
        }
    )
    [row] = _errors_for(spark, c, [("x",)], "present string")
    assert _etypes(row) == ["REQUIRED_FIELD_MISSING"]
    assert row["errors"][0]["field"] == "gone"


def test_null_policy_type_mismatch_mode(spark):
    c = contract_from_dict(
        {"contract_version": "1.0", "schema": {"a": {"type": "string"}}}
    )
    [row] = _errors_for(
        spark, c, [(None,)], "a string",
        CompileOptions(null_error_type="TYPE_MISMATCH"),
    )
    assert _etypes(row) == ["TYPE_MISMATCH"]
    assert row["errors"][0]["message"] == "Expected string, got NoneType"


def test_type_mismatch_static_incompatible(spark):
    c = contract_from_dict(
        {"contract_version": "1.0", "schema": {"age": {"type": "integer"}}}
    )
    [row] = _errors_for(spark, c, [(True,)], "age boolean")
    assert _etypes(row) == ["TYPE_MISMATCH"]
    assert row["errors"][0]["message"] == "Expected integer, got bool"


def test_type_mismatch_stringly_source(spark):
    c = contract_from_dict(
        {"contract_version": "1.0", "schema": {"age": {"type": "integer", "min": 18}}}
    )
    rows = _errors_for(spark, c, [("30",), ("abc",), ("12.5",), ("7",)], "age string")
    assert rows[0]["passed"]
    assert _etypes(rows[1]) == ["TYPE_MISMATCH"]
    assert rows[1]["errors"][0]["message"] == "Expected integer, got str"
    assert _etypes(rows[2]) == ["TYPE_MISMATCH"]  # fractional not an int
    assert _etypes(rows[3]) == ["VALUE_TOO_SMALL"]  # cast ok, range fails


def test_pattern_mismatch_anchoring(spark):
    # re.match anchors at start: 'usr_1' must match, 'xusr_1' must not,
    # and a pattern without ^ is still start-anchored
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {"user_id": {"type": "string", "pattern": r"usr_\d+"}},
        }
    )
    rows = _errors_for(spark, c, [("usr_1",), ("xusr_1",)], "user_id string")
    assert rows[0]["passed"]
    assert _etypes(rows[1]) == ["PATTERN_MISMATCH"]
    assert rows[1]["errors"][0]["message"] == r"Value does not match pattern: usr_\d+"


def test_format_email_and_case_insensitive_uuid(spark):
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {
                "email": {"type": "string", "format": "email"},
                "rid": {"type": "string", "format": "uuid"},
                "ip": {"type": "string", "format": "ipv4"},
            },
        }
    )
    ddl = "email string, rid string, ip string"
    good = _errors_for(
        spark, c,
        [("a@b.com", "123E4567-E89B-42D3-A456-426614174000", "10.0.0.1")],
        ddl,
    )
    assert good[0]["passed"]  # uppercase UUID passes (IGNORECASE)
    bad = _errors_for(
        spark, c, [("not-an-email", "123", "999.1.1.1")], ddl
    )
    assert _etypes(bad[0]) == ["FORMAT_MISMATCH"] * 3
    assert bad[0]["errors"][0]["message"] == "Value does not match format: email"


def test_length_bounds(spark):
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {"cc": {"type": "string", "min_length": 2, "max_length": 2}},
        }
    )
    rows = _errors_for(spark, c, [("DE",), ("D",), ("DEU",)], "cc string")
    assert rows[0]["passed"]
    assert _etypes(rows[1]) == ["LENGTH_TOO_SHORT"]
    assert rows[1]["errors"][0]["message"] == "Length 1 is less than minimum 2"
    assert _etypes(rows[2]) == ["LENGTH_TOO_LONG"]
    assert rows[2]["errors"][0]["message"] == "Length 3 exceeds maximum 2"


def test_enum_mismatch(spark):
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {
                "sensor": {"type": "string",
                           "enum": ["temperature", "humidity", "pressure"]}
            },
        }
    )
    rows = _errors_for(spark, c, [("humidity",), ("co2",)], "sensor string")
    assert rows[0]["passed"]
    assert _etypes(rows[1]) == ["ENUM_MISMATCH"]
    assert (
        rows[1]["errors"][0]["message"]
        == "Value not in allowed list: ['temperature', 'humidity', 'pressure']"
    )


def test_numeric_boundaries_inclusive(spark):
    # reference system test: age 18 and 120 PASS at bounds 18..120
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {"age": {"type": "integer", "min": 18, "max": 120}},
        }
    )
    rows = _errors_for(spark, c, [(18,), (120,), (15,), (150,)], "age int")
    assert rows[0]["passed"] and rows[1]["passed"]
    assert _etypes(rows[2]) == ["VALUE_TOO_SMALL"]
    assert rows[2]["errors"][0]["message"] == "Value 15 is less than minimum 18"
    assert _etypes(rows[3]) == ["VALUE_TOO_LARGE"]
    assert rows[3]["errors"][0]["message"] == "Value 150 exceeds maximum 120"


def test_timestamp_bounds_and_invalid(spark):
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {
                "ts": {"type": "timestamp", "min": "2020-01-01", "max": "2030-01-01"}
            },
        }
    )
    rows = _errors_for(
        spark, c,
        [("2024-06-01T10:00:00Z",), ("2019-01-01T00:00:00",),
         ("2031-01-01T00:00:00",), ("not a time",)],
        "ts string",
    )
    assert rows[0]["passed"]
    assert _etypes(rows[1]) == ["TIMESTAMP_TOO_OLD"]
    assert rows[1]["errors"][0]["message"] == "Timestamp before minimum: 2020-01-01"
    assert _etypes(rows[2]) == ["TIMESTAMP_TOO_RECENT"]
    assert _etypes(rows[3]) == ["INVALID_TIMESTAMP"]


def test_timestamp_epoch_numeric_source(spark):
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {"ts": {"type": "timestamp", "min": "2020-01-01"}},
        }
    )
    rows = _errors_for(
        spark, c, [(1717243200,), (1000000,)], "ts long"
    )  # 2024-06-01 vs 1970
    assert rows[0]["passed"]
    assert _etypes(rows[1]) == ["TIMESTAMP_TOO_OLD"]


def test_nested_object_dotted_path(spark):
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {
                "user": {
                    "type": "object",
                    "properties": {
                        "email": {"type": "string", "format": "email"},
                        "name": {"type": "string", "required": False},
                    },
                }
            },
        }
    )
    ddl = "user struct<email:string, name:string>"
    rows = _errors_for(
        spark, c, [(("bad-email", "x"),), ((None, "y"),)], ddl
    )
    assert _etypes(rows[0]) == ["FORMAT_MISMATCH"]
    assert rows[0]["errors"][0]["field"] == "user.email"
    assert _etypes(rows[1]) == ["REQUIRED_FIELD_MISSING"]
    assert rows[1]["errors"][0]["message"] == "Required property 'email' is missing"


def test_array_items_indexed_path_and_first10_cap(spark):
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {
                "items": {
                    "type": "array",
                    "min": 1,
                    "items": {
                        "type": "object",
                        "properties": {
                            "product_id": {"type": "string"},
                            "quantity": {"type": "integer", "min": 1,
                                         "required": False},
                        },
                    },
                }
            },
        }
    )
    ddl = "items array<struct<product_id:string, quantity:int>>"
    # violation at index 1: missing product_id
    rows = _errors_for(spark, c, [([("p1", 2), (None, 0)],)], ddl)
    fields = [e["field"] for e in rows[0]["errors"]]
    assert "items[1].product_id" in fields
    assert "items[1].quantity" in fields
    # violation only at index >= 10 must NOT be flagged (first-10 rule)
    ok_then_bad = [("p", 1)] * 10 + [(None, 0)]
    rows = _errors_for(spark, c, [(ok_then_bad,)], ddl)
    assert rows[0]["passed"]


def test_array_size_bounds(spark):
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {
                "tags": {"type": "array", "min": 2, "max": 3,
                         "items": {"type": "string"}}
            },
        }
    )
    rows = _errors_for(
        spark, c, [(["a"],), (["a", "b", "c", "d"],)], "tags array<string>"
    )
    assert _etypes(rows[0]) == ["ARRAY_TOO_SHORT"]
    assert rows[0]["errors"][0]["message"] == "Array length 1 less than minimum 2"
    assert rows[0]["errors"][0]["value"] == "[1 items]"
    assert _etypes(rows[1]) == ["ARRAY_TOO_LONG"]


def test_error_cap_10(spark):
    schema = {
        f"f{i}": {"type": "string", "pattern": r"^ok$"} for i in range(15)
    }
    c = contract_from_dict({"contract_version": "1.0", "schema": schema})
    ddl = ", ".join(f"f{i} string" for i in range(15))
    rows = _errors_for(spark, c, [tuple(["bad"] * 15)], ddl)
    assert len(rows[0]["errors"]) == 10
    # declaration order preserved
    assert [e["field"] for e in rows[0]["errors"]] == [f"f{i}" for i in range(10)]


def test_value_truncated_to_100_chars(spark):
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {"t": {"type": "string", "max_length": 5}},
        }
    )
    rows = _errors_for(spark, c, [("x" * 300,)], "t string")
    assert len(rows[0]["errors"][0]["value"]) == 100


def test_extra_columns_ignored(spark):
    # parity: undeclared record fields are silently ignored
    c = contract_from_dict(
        {"contract_version": "1.0", "schema": {"a": {"type": "string"}}}
    )
    rows = _errors_for(spark, c, [("ok", 123, "extra")], "a string, b int, c string")
    assert rows[0]["passed"]


def test_date_type_checked_only(spark):
    # reference never parses/range-checks dates (schema_validator.py:79)
    c = contract_from_dict(
        {"contract_version": "1.0", "schema": {"d": {"type": "date"}}}
    )
    rows = _errors_for(spark, c, [("definitely not a date",)], "d string")
    assert rows[0]["passed"]


def test_whole_plan_is_single_projection(spark):
    """The fused pass must compile to one Project over the scan — no
    shuffle, no Python in the row path."""
    c = contract_from_dict(
        {
            "contract_version": "1.0",
            "schema": {
                "a": {"type": "string", "pattern": "^x"},
                "b": {"type": "integer", "min": 0},
            },
        }
    )
    df = spark.createDataFrame([("x", 1)], "a string, b int")
    compiled = compile_contract(c, df.schema)
    out = df.select(compiled.errors_col.alias("e"), compiled.passed_col.alias("p"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
