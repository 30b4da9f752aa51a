"""Contract → vectorized Column-expression compiler (the engine core).

Compiles a :class:`~data_contract_engine_spark.contracts.model.Contract`
into ONE fused projection: every schema rule (required / type / pattern /
format / length / enum / numeric range / timestamp bounds / array size /
array items / nested object properties) becomes a ``when(...)``-guarded
error-struct Column; all of them are assembled into an ordered array,
null-filtered, and capped at ``max_errors`` per record — a single pass per
partition with no per-row Python, fully inside WholeStageCodegen.

Semantics ported from the reference interpreter
(`app/core/schema_validator.py:25-368`):
  * evaluation order = schema declaration order; per-field rule order =
    type → (pattern, format, min_length, max_length, enum) for strings,
    (min, max, enum) for numbers, (parse, min, max) for timestamps,
    (size-min, size-max, items[:10]) for arrays, properties for objects;
  * per-record error cap of 10 (`schema_validator.py:65-66`);
  * `re.match` anchoring: patterns are anchored at the start (we prepend
    `^` when absent because Spark's `rlike` is a search, not a match);
  * formats (email/url/uuid/ipv4) matched case-insensitively with the
    reference's exact regexes (`schema_validator.py:355-368`);
  * offending values stringified and truncated to 100 chars;
  * `date` fields are only type-checked (the reference never parses them,
    `schema_validator.py:79`);
  * nested fields get type + string/number/object checks only — no nested
    timestamp/array rules (`schema_validator.py:336-353`);
  * only the first 10 array elements are validated
    (`schema_validator.py:294`).

Null-semantics note (SURVEY.md §1.2): in a typed DataFrame "absent" and
NULL collapse. A required field that is NULL maps to one canonical error
type, configurable via ``CompileOptions.null_error_type``:
``"REQUIRED_FIELD_MISSING"`` (default) or ``"TYPE_MISMATCH"`` (the
reference's behavior for present-but-None, `schema_validator.py:49-51`).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from datetime import datetime
from typing import List, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..contracts.model import Contract, FieldDef, FORMAT_REGEXES

# The violation payload: one struct per rule hit.
ERROR_STRUCT_DDL = (
    "struct<field:string,error_type:string,message:string,"
    "value:string,expected:string>"
)
ERROR_ARRAY_DDL = f"array<{ERROR_STRUCT_DDL}>"

ERROR_STRUCT_TYPE = T.StructType(
    [
        T.StructField("field", T.StringType()),
        T.StructField("error_type", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("expected", T.StringType()),
    ]
)

# Spark type families each contract type accepts without a TYPE_MISMATCH
# (mirrors the isinstance table at schema_validator.py:73-82; bool is NOT
# an integer/float there because Python bool subclasses int).
_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType, T.DecimalType)


@dataclass(frozen=True)
class CompileOptions:
    max_errors: int = 10
    null_error_type: str = "REQUIRED_FIELD_MISSING"  # or "TYPE_MISMATCH"
    errors_column: str = "errors"
    passed_column: str = "passed"


@dataclass
class CompiledContract:
    contract: Contract
    errors_col: Column
    passed_col: Column
    declared_columns: List[str]
    options: CompileOptions = dc_field(default_factory=CompileOptions)
    # Lean twin of the error array: [(field, error_type, bool Column)].
    # The full error-struct tree is ~50x bigger (messages, format_string,
    # truncation) and its higher-order functions don't codegen; counting /
    # verdict jobs use these cheap predicates instead, and only the
    # violations-artifact job pays for the full structs. None when the
    # contract has nested array/object rules (counts then need the array).
    predicates: Optional[List] = None


def _mkerr(field, error_type: str, message, value, expected) -> Column:
    """Build one error struct. `field`/`message`/`value` may be Columns."""
    fc = field if isinstance(field, Column) else F.lit(field)
    mc = message if isinstance(message, Column) else F.lit(message)
    if value is None:
        vc = F.lit(None).cast("string")
    elif isinstance(value, Column):
        vc = value.cast("string")
    else:
        vc = F.lit(str(value))
    ec = expected if isinstance(expected, Column) else F.lit(expected)
    return F.struct(
        fc.cast("string").alias("field"),
        F.lit(error_type).alias("error_type"),
        mc.cast("string").alias("message"),
        vc.alias("value"),
        ec.cast("string").alias("expected"),
    )


def _empty_errors() -> Column:
    return F.array().cast(ERROR_ARRAY_DDL)


def _pack(checks: List[Column]) -> Column:
    """Ordered array of nullable error structs → null-filtered error array."""
    if not checks:
        return _empty_errors()
    return F.filter(F.array(*checks), lambda e: e.isNotNull())


def _anchor(pattern: str) -> str:
    """`re.match` anchors at the start; `rlike` searches anywhere."""
    if pattern.startswith("^") or pattern.startswith(r"\A"):
        return pattern
    return "^" + pattern


def _trunc(value: Column) -> Column:
    """Reference truncates offending values to 100 chars in messages."""
    return F.substring(value.cast("string"), 1, 100)


def _py_type_name(dtype: T.DataType) -> str:
    """Spark type → the Python type name the reference reports in
    TYPE_MISMATCH messages ('Expected integer, got str')."""
    if isinstance(dtype, T.StringType):
        return "str"
    if isinstance(dtype, T.BooleanType):
        return "bool"
    if isinstance(dtype, _INTEGRAL):
        return "int"
    if isinstance(dtype, _FRACTIONAL):
        return "float"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "datetime"
    if isinstance(dtype, T.ArrayType):
        return "list"
    if isinstance(dtype, (T.StructType, T.MapType)):
        return "dict"
    return dtype.simpleString()


def _type_conforms(contract_type: str, dtype: T.DataType) -> bool:
    if contract_type == "string":
        return isinstance(dtype, T.StringType)
    if contract_type == "integer":
        return isinstance(dtype, _INTEGRAL)
    if contract_type == "float":
        # int accepted as float (schema_validator.py:76)
        return isinstance(dtype, _INTEGRAL + _FRACTIONAL)
    if contract_type == "boolean":
        return isinstance(dtype, T.BooleanType)
    if contract_type == "timestamp":
        # str / int / float / datetime all accepted (schema_validator.py:78)
        return isinstance(
            dtype,
            (T.TimestampType, T.TimestampNTZType, T.StringType) + _INTEGRAL + _FRACTIONAL,
        )
    if contract_type == "date":
        # reference accepts str only; DateType is the typed-world equivalent
        return isinstance(dtype, (T.StringType, T.DateType))
    if contract_type == "array":
        return isinstance(dtype, T.ArrayType)
    if contract_type == "object":
        return isinstance(dtype, (T.StructType, T.MapType))
    return False


def _parse_bound_ts(bound) -> datetime:
    return datetime.fromisoformat(str(bound).replace("Z", "+00:00"))


# ---------------------------------------------------------------------------
# per-type rule emitters — each returns [nullable error-struct Column, ...]
# Every check is guarded so it only fires on non-null, type-valid values.
# ---------------------------------------------------------------------------


def _string_checks(path, value: Column, fd: FieldDef, ok: Column) -> List[Column]:
    out: List[Column] = []
    if fd.pattern:
        out.append(
            F.when(
                ok & ~value.rlike(_anchor(fd.pattern)),
                _mkerr(
                    path,
                    "PATTERN_MISMATCH",
                    f"Value does not match pattern: {fd.pattern}",
                    _trunc(value),
                    fd.pattern,
                ),
            )
        )
    if fd.format:
        regex = "(?i)" + FORMAT_REGEXES[fd.format]
        out.append(
            F.when(
                ok & ~value.rlike(regex),
                _mkerr(
                    path,
                    "FORMAT_MISMATCH",
                    f"Value does not match format: {fd.format}",
                    _trunc(value),
                    fd.format,
                ),
            )
        )
    if fd.min_length is not None:
        out.append(
            F.when(
                ok & (F.length(value) < F.lit(fd.min_length)),
                _mkerr(
                    path,
                    "LENGTH_TOO_SHORT",
                    F.format_string(
                        f"Length %d is less than minimum {fd.min_length}",
                        F.length(value),
                    ),
                    _trunc(value),
                    f"min_length: {fd.min_length}",
                ),
            )
        )
    if fd.max_length is not None:
        out.append(
            F.when(
                ok & (F.length(value) > F.lit(fd.max_length)),
                _mkerr(
                    path,
                    "LENGTH_TOO_LONG",
                    F.format_string(
                        f"Length %d exceeds maximum {fd.max_length}",
                        F.length(value),
                    ),
                    _trunc(value),
                    f"max_length: {fd.max_length}",
                ),
            )
        )
    if fd.enum:
        out.append(
            F.when(
                ok & ~value.isin(*fd.enum),
                _mkerr(
                    path,
                    "ENUM_MISMATCH",
                    f"Value not in allowed list: {list(fd.enum)}",
                    _trunc(value),
                    str(list(fd.enum)),
                ),
            )
        )
    return out


def _number_checks(path, value: Column, fd: FieldDef, ok: Column) -> List[Column]:
    out: List[Column] = []
    if fd.min is not None:
        out.append(
            F.when(
                ok & (value < F.lit(fd.min)),
                _mkerr(
                    path,
                    "VALUE_TOO_SMALL",
                    F.concat(
                        F.lit("Value "),
                        value.cast("string"),
                        F.lit(f" is less than minimum {fd.min}"),
                    ),
                    value,
                    f"min: {fd.min}",
                ),
            )
        )
    if fd.max is not None:
        out.append(
            F.when(
                ok & (value > F.lit(fd.max)),
                _mkerr(
                    path,
                    "VALUE_TOO_LARGE",
                    F.concat(
                        F.lit("Value "),
                        value.cast("string"),
                        F.lit(f" exceeds maximum {fd.max}"),
                    ),
                    value,
                    f"max: {fd.max}",
                ),
            )
        )
    if fd.enum:
        out.append(
            F.when(
                ok & ~value.isin(*fd.enum),
                _mkerr(
                    path,
                    "ENUM_MISMATCH",
                    f"Value not in allowed list: {list(fd.enum)}",
                    value,
                    str(list(fd.enum)),
                ),
            )
        )
    return out


def _timestamp_checks(
    path, raw: Column, dtype: T.DataType, fd: FieldDef, ok: Column
) -> List[Column]:
    out: List[Column] = []
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        parsed = raw
        parse_fail = F.lit(False)
    elif isinstance(dtype, T.StringType):
        # ISO-8601 only for string inputs; numeric strings are NOT epoch
        # (the reference's epoch branch only fires for numeric Python types)
        parsed = raw.try_cast("timestamp")
        parse_fail = ok & parsed.isNull()
    else:  # numeric epoch seconds (schema_validator.py:208)
        parsed = F.timestamp_seconds(raw.cast("double"))
        parse_fail = F.lit(False)

    if isinstance(dtype, T.StringType):
        out.append(
            F.when(
                parse_fail,
                _mkerr(
                    path,
                    "INVALID_TIMESTAMP",
                    "Cannot parse timestamp",
                    _trunc(raw),
                    "ISO 8601 or Unix timestamp",
                ),
            )
        )

    bound_ok = ok & parsed.isNotNull()
    if fd.min:
        lo = _parse_bound_ts(fd.min)
        out.append(
            F.when(
                bound_ok & (parsed < F.lit(lo)),
                _mkerr(
                    path,
                    "TIMESTAMP_TOO_OLD",
                    f"Timestamp before minimum: {fd.min}",
                    _trunc(raw),
                    f"min: {fd.min}",
                ),
            )
        )
    if fd.max:
        hi = _parse_bound_ts(fd.max)
        out.append(
            F.when(
                bound_ok & (parsed > F.lit(hi)),
                _mkerr(
                    path,
                    "TIMESTAMP_TOO_RECENT",
                    f"Timestamp after maximum: {fd.max}",
                    _trunc(raw),
                    f"max: {fd.max}",
                ),
            )
        )
    return out


def _nested_value_checks(
    path_col: Column, value: Column, dtype: T.DataType, fd: FieldDef
) -> Column:
    """Checks for one nested value (array element / object property).

    Parity with `_validate_nested_field` (schema_validator.py:336-353):
    type check, then string / number / object rules only. Returns an
    array<error-struct> Column (possibly empty).
    """
    checks: List[Column] = []
    nn = value.isNotNull()

    if not _type_conforms(fd.type, dtype):
        got = _py_type_name(dtype)
        checks.append(
            F.when(
                nn,
                _mkerr(
                    path_col,
                    "TYPE_MISMATCH",
                    f"Expected {fd.type}, got {got}",
                    _trunc(value),
                    fd.type,
                ),
            )
        )
        return _pack(checks)

    ok = nn
    if fd.type == "string":
        checks.extend(_string_checks(path_col, value, fd, ok))
    elif fd.type in ("integer", "float"):
        checks.extend(_number_checks(path_col, value, fd, ok))
    elif fd.type == "object":
        return _object_checks(path_col, value, dtype, fd)
    return _pack(checks)


def _object_checks(
    path_col: Column, value: Column, dtype: T.DataType, fd: FieldDef
) -> Column:
    """Validate declared properties of a struct value; dotted error paths
    (`schema_validator.py:304-334`). Returns array<error-struct>."""
    if not isinstance(dtype, T.StructType) or not fd.properties:
        return _empty_errors()
    by_name = {f.name: f.dataType for f in dtype.fields}
    parts: List[Column] = []
    for pname, pdef in fd.properties:
        ppath = F.concat(path_col, F.lit(f".{pname}"))
        if pname not in by_name:
            if pdef.required:
                parts.append(
                    F.array(
                        _mkerr(
                            ppath,
                            "REQUIRED_FIELD_MISSING",
                            f"Required property '{pname}' is missing",
                            None,
                            "required property",
                        )
                    )
                )
            continue
        pval = value.getField(pname)
        pdtype = by_name[pname]
        missing = F.when(
            pval.isNull() & F.lit(pdef.required),
            F.array(
                _mkerr(
                    ppath,
                    "REQUIRED_FIELD_MISSING",
                    f"Required property '{pname}' is missing",
                    None,
                    "required property",
                )
            ),
        ).otherwise(_empty_errors())
        nested = _nested_value_checks(ppath, pval, pdtype, pdef)
        parts.append(F.concat(missing, nested))
    if not parts:
        return _empty_errors()
    combined = F.concat(*parts) if len(parts) > 1 else parts[0]
    # null struct value → no property errors
    return F.when(value.isNotNull(), combined).otherwise(_empty_errors())


def _array_item_errors(
    path: str, value: Column, dtype: T.ArrayType, fd: FieldDef
) -> Column:
    """Validate the first 10 array elements (`schema_validator.py:293-301`),
    labelling errors `field[idx]`. Returns array<error-struct>."""
    if fd.items is None:
        return _empty_errors()
    elem_type = dtype.elementType
    items_def = fd.items

    def per_elem(x: Column, i: Column) -> Column:
        p = F.concat(F.lit(path + "["), i.cast("string"), F.lit("]"))
        miss = F.when(
            x.isNull() & F.lit(items_def.required),
            F.array(
                _mkerr(
                    p,
                    "TYPE_MISMATCH",
                    f"Expected {items_def.type}, got NoneType",
                    None,
                    items_def.type,
                )
            ),
        ).otherwise(_empty_errors())
        return F.concat(miss, _nested_value_checks(p, x, elem_type, items_def))

    nested = F.flatten(F.transform(F.slice(value, 1, 10), per_elem))
    return F.when(value.isNotNull(), nested).otherwise(_empty_errors())


def _field_errors(
    name: str, fd: FieldDef, dtype: Optional[T.DataType], opts: CompileOptions
) -> Column:
    """All error structs for one top-level declared field, in rule order.
    Returns array<error-struct> (never null)."""
    # column absent from the DataFrame entirely
    if dtype is None:
        if fd.required:
            return F.array(
                _mkerr(
                    name,
                    "REQUIRED_FIELD_MISSING",
                    f"Required field '{name}' is missing",
                    None,
                    "required field",
                )
            )
        return _empty_errors()

    v = F.col(name)
    checks: List[Column] = []

    # required + NULL → canonical error (see module docstring)
    if fd.required:
        if opts.null_error_type == "TYPE_MISMATCH":
            null_err = _mkerr(
                name,
                "TYPE_MISMATCH",
                f"Expected {fd.type}, got NoneType",
                None,
                fd.type,
            )
        else:
            null_err = _mkerr(
                name,
                "REQUIRED_FIELD_MISSING",
                f"Required field '{name}' is missing",
                None,
                "required field",
            )
        checks.append(F.when(v.isNull(), null_err))

    stringly = isinstance(dtype, T.StringType) and fd.type not in (
        "string",
        "timestamp",
        "date",
    )
    if not _type_conforms(fd.type, dtype) and not stringly:
        # statically incompatible column: every non-null value mismatches
        got = _py_type_name(dtype)
        checks.append(
            F.when(
                v.isNotNull(),
                _mkerr(
                    name,
                    "TYPE_MISMATCH",
                    f"Expected {fd.type}, got {got}",
                    _trunc(v),
                    fd.type,
                ),
            )
        )
        return _pack(checks)

    if stringly:
        # string-typed source (CSV et al.): runtime cast failure ≡ the
        # reference's isinstance failure → TYPE_MISMATCH, got str
        target = {
            "integer": "long",
            "float": "double",
            "boolean": "boolean",
        }.get(fd.type)
        if target is None:
            # array/object declared over a string column: unconditional mismatch
            checks.append(
                F.when(
                    v.isNotNull(),
                    _mkerr(
                        name,
                        "TYPE_MISMATCH",
                        f"Expected {fd.type}, got str",
                        _trunc(v),
                        fd.type,
                    ),
                )
            )
            return _pack(checks)
        typed = v.try_cast(target)
        if fd.type == "integer":
            # reject floats-with-fraction the way isinstance(int) does
            typed = F.when(
                v.try_cast("double").isNotNull()
                & (v.try_cast("double") == v.try_cast("double").cast("long").cast("double")),
                v.try_cast("double").cast("long"),
            )
        cast_fail = v.isNotNull() & typed.isNull()
        checks.append(
            F.when(
                cast_fail,
                _mkerr(
                    name,
                    "TYPE_MISMATCH",
                    f"Expected {fd.type}, got str",
                    _trunc(v),
                    fd.type,
                ),
            )
        )
        ok = v.isNotNull() & typed.isNotNull()
        if fd.type in ("integer", "float"):
            checks.extend(_number_checks(name, typed, fd, ok))
        return _pack(checks)

    ok = v.isNotNull()
    if fd.type == "string":
        checks.extend(_string_checks(name, v, fd, ok))
        return _pack(checks)
    if fd.type in ("integer", "float"):
        val = v
        if isinstance(dtype, T.BooleanType):  # unreachable (bool not conforming)
            val = v.cast("int")
        checks.extend(_number_checks(name, val, fd, ok))
        return _pack(checks)
    if fd.type == "timestamp":
        checks.extend(_timestamp_checks(name, v, dtype, fd, ok))
        return _pack(checks)
    if fd.type == "array":
        if fd.min is not None:
            checks.append(
                F.when(
                    ok & (F.size(v) < F.lit(int(fd.min))),
                    _mkerr(
                        name,
                        "ARRAY_TOO_SHORT",
                        F.format_string(
                            f"Array length %d less than minimum {fd.min}", F.size(v)
                        ),
                        F.format_string("[%d items]", F.size(v)),
                        f"min: {fd.min}",
                    ),
                )
            )
        if fd.max is not None:
            checks.append(
                F.when(
                    ok & (F.size(v) > F.lit(int(fd.max))),
                    _mkerr(
                        name,
                        "ARRAY_TOO_LONG",
                        F.format_string(
                            f"Array length %d exceeds maximum {fd.max}", F.size(v)
                        ),
                        F.format_string("[%d items]", F.size(v)),
                        f"max: {fd.max}",
                    ),
                )
            )
        scalar = _pack(checks)
        items = _array_item_errors(name, v, dtype, fd)
        return F.concat(scalar, items)
    if fd.type == "object":
        scalar = _pack(checks)
        return F.concat(scalar, _object_checks(F.lit(name), v, dtype, fd))
    # boolean / date: type check only
    return _pack(checks)


def _field_predicates(
    name: str, fd: FieldDef, dtype: Optional[T.DataType], opts: CompileOptions
) -> Optional[List]:
    """[(field, error_type, condition)] for one top-level field — the lean
    counting path. Must fire exactly when the corresponding error struct in
    :func:`_field_errors` is non-null (pinned by the differential test).
    Returns None when the field needs nested evaluation (array items /
    object properties) — callers then fall back to the array path."""
    if fd.type == "array" and fd.items is not None:
        return None
    if fd.type == "object" and fd.properties:
        return None

    out: List = []
    if dtype is None:
        if fd.required:
            out.append((name, "REQUIRED_FIELD_MISSING", F.lit(True)))
        return out

    v = F.col(name)
    if fd.required:
        out.append((name, opts.null_error_type, v.isNull()))

    stringly = isinstance(dtype, T.StringType) and fd.type not in (
        "string",
        "timestamp",
        "date",
    )
    if not _type_conforms(fd.type, dtype) and not stringly:
        out.append((name, "TYPE_MISMATCH", v.isNotNull()))
        return out

    if stringly:
        target = {
            "integer": "long",
            "float": "double",
            "boolean": "boolean",
        }.get(fd.type)
        if target is None:
            out.append((name, "TYPE_MISMATCH", v.isNotNull()))
            return out
        typed = v.try_cast(target)
        if fd.type == "integer":
            typed = F.when(
                v.try_cast("double").isNotNull()
                & (
                    v.try_cast("double")
                    == v.try_cast("double").cast("long").cast("double")
                ),
                v.try_cast("double").cast("long"),
            )
        out.append((name, "TYPE_MISMATCH", v.isNotNull() & typed.isNull()))
        ok = v.isNotNull() & typed.isNotNull()
        if fd.type in ("integer", "float"):
            if fd.min is not None:
                out.append((name, "VALUE_TOO_SMALL", ok & (typed < F.lit(fd.min))))
            if fd.max is not None:
                out.append((name, "VALUE_TOO_LARGE", ok & (typed > F.lit(fd.max))))
            if fd.enum:
                out.append((name, "ENUM_MISMATCH", ok & ~typed.isin(*fd.enum)))
        return out

    ok = v.isNotNull()
    if fd.type == "string":
        if fd.pattern:
            out.append((name, "PATTERN_MISMATCH", ok & ~v.rlike(_anchor(fd.pattern))))
        if fd.format:
            out.append(
                (
                    name,
                    "FORMAT_MISMATCH",
                    ok & ~v.rlike("(?i)" + FORMAT_REGEXES[fd.format]),
                )
            )
        if fd.min_length is not None:
            out.append(
                (name, "LENGTH_TOO_SHORT", ok & (F.length(v) < F.lit(fd.min_length)))
            )
        if fd.max_length is not None:
            out.append(
                (name, "LENGTH_TOO_LONG", ok & (F.length(v) > F.lit(fd.max_length)))
            )
        if fd.enum:
            out.append((name, "ENUM_MISMATCH", ok & ~v.isin(*fd.enum)))
    elif fd.type in ("integer", "float"):
        if fd.min is not None:
            out.append((name, "VALUE_TOO_SMALL", ok & (v < F.lit(fd.min))))
        if fd.max is not None:
            out.append((name, "VALUE_TOO_LARGE", ok & (v > F.lit(fd.max))))
        if fd.enum:
            out.append((name, "ENUM_MISMATCH", ok & ~v.isin(*fd.enum)))
    elif fd.type == "timestamp":
        if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
            parsed = v
        elif isinstance(dtype, T.StringType):
            parsed = v.try_cast("timestamp")
            out.append((name, "INVALID_TIMESTAMP", ok & parsed.isNull()))
        else:
            parsed = F.timestamp_seconds(v.cast("double"))
        bok = ok & parsed.isNotNull()
        if fd.min:
            out.append(
                (
                    name,
                    "TIMESTAMP_TOO_OLD",
                    bok & (parsed < F.lit(_parse_bound_ts(fd.min))),
                )
            )
        if fd.max:
            out.append(
                (
                    name,
                    "TIMESTAMP_TOO_RECENT",
                    bok & (parsed > F.lit(_parse_bound_ts(fd.max))),
                )
            )
    elif fd.type == "array":
        if fd.min is not None:
            out.append((name, "ARRAY_TOO_SHORT", ok & (F.size(v) < F.lit(int(fd.min)))))
        if fd.max is not None:
            out.append((name, "ARRAY_TOO_LONG", ok & (F.size(v) > F.lit(int(fd.max)))))
    # boolean / date: type check only (handled above)
    return out


def compile_contract(
    contract: Contract,
    df_schema: T.StructType,
    options: Optional[CompileOptions] = None,
) -> CompiledContract:
    """Compile all P1–P14 rules (SURVEY.md §2.2) into one errors Column.

    The result is meant to be used as::

        out = df.select(*keys,
                        compiled.errors_col.alias("errors"),
                        compiled.passed_col.alias("passed"))

    which Catalyst fuses into a single WholeStageCodegen pass.
    """
    opts = options or CompileOptions()
    by_name = {f.name: f.dataType for f in df_schema.fields}

    per_field = [
        _field_errors(name, fd, by_name.get(name), opts)
        for name, fd in contract.fields
    ]
    if not per_field:
        errors = _empty_errors()
    elif len(per_field) == 1:
        errors = per_field[0]
    else:
        errors = F.concat(*per_field)
    errors = F.slice(errors, 1, opts.max_errors)
    passed = F.size(errors) == 0

    # lean predicate twin (None disables it if any field needs nesting)
    predicates: Optional[List] = []
    for name, fd in contract.fields:
        ps = _field_predicates(name, fd, by_name.get(name), opts)
        if ps is None:
            predicates = None
            break
        predicates.extend(ps)

    declared = [n for n, _ in contract.fields if n in by_name]
    return CompiledContract(
        contract=contract,
        errors_col=errors,
        passed_col=passed,
        declared_columns=declared,
        options=opts,
        predicates=predicates,
    )
