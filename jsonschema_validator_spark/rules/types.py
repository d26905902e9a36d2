"""`type` keyword.

Reference: /root/reference/rules/type.go:21-123. Seven JSON types with union
support; ``integer`` accepts whole-valued floats (type.go:92-108:
``v == float64(int(v))``). Messages:
- single type (type.go:63): ``"value is of type %T, expected %s"``
- union (type.go:43): ``"value type does not match any of the expected
  types: a, b"``

In the engine the table schema is static, so most type checks resolve at
compile time; the runtime residue is (a) ``integer`` fractional-part checks
on float columns, (b) ``null`` checks, (c) statically-impossible types that
must still FAIL per-row with the reference's message for parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from jsonschema_validator_spark.rules.base import (
    Check,
    CompileContext,
    SpecError,
    builtin,
    null_passes,
)

_INT_DTYPES = ("tinyint", "smallint", "int", "bigint")
_FLOAT_DTYPES = ("float", "double")


def _json_type_of_dtype(dtype: str) -> str:
    """Map a Spark dtype simpleString to the JSON type a json.Unmarshal of
    the same value would produce in Go."""
    if dtype.startswith("string") or dtype.startswith("varchar") or dtype.startswith("char"):
        return "string"
    if dtype.startswith(_INT_DTYPES) or dtype.startswith(_FLOAT_DTYPES) or dtype.startswith(
        "decimal"
    ):
        return "number"
    if dtype.startswith("boolean"):
        return "boolean"
    if dtype.startswith("struct") or dtype.startswith("map"):
        return "object"
    if dtype.startswith("array"):
        return "array"
    if dtype.startswith("timestamp") or dtype.startswith("date"):
        # JSON has no temporal type; these serialize as strings
        return "string"
    if dtype.startswith("void") or dtype.startswith("null"):
        return "null"
    return "unknown"


def _go_type_name(dtype: str) -> str:
    """The Go `%T` name json.Unmarshal would have produced for this dtype
    (all JSON numbers decode to float64)."""
    jt = _json_type_of_dtype(dtype)
    return {
        "string": "string",
        "number": "float64",
        "boolean": "bool",
        "object": "map[string]interface {}",
        "array": "[]interface {}",
        "null": "<nil>",
    }.get(jt, "interface {}")


def _matches(col: Column, dtype: str, want: str) -> Column:
    """Runtime predicate for 'this column value is JSON type `want`'."""
    have = _json_type_of_dtype(dtype)
    if want == "null":
        return col.isNull()
    if want == "integer":
        if dtype.startswith(_INT_DTYPES):
            return F.lit(True)
        if dtype.startswith(_FLOAT_DTYPES) or dtype.startswith("decimal"):
            d = col.cast("double")
            return d == F.floor(d)  # type.go:100 whole-float acceptance
        return F.lit(False)
    if want == "number":
        return F.lit(have == "number")
    return F.lit(have == want)


@builtin("type")
def compile_type(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    if isinstance(spec_value, str):
        types = [spec_value]
        union = False
    elif isinstance(spec_value, (list, tuple)) and all(isinstance(t, str) for t in spec_value):
        types = list(spec_value)
        union = True
    else:
        raise SpecError("schema type must be a string or an array of strings")  # type.go:54

    valid_names = {"string", "number", "integer", "boolean", "object", "array", "null"}
    for t in types:
        if t not in valid_names:
            raise SpecError(f"invalid type: {t}")

    dtype = ctx.dtype or "string"
    raw = None
    for t in types:
        m = _matches(col, dtype, t)
        raw = m if raw is None else (raw | m)
    pred = raw if types == ["null"] else null_passes(col, raw)

    if union:
        msg = "value type does not match any of the expected types: " + ", ".join(types)
    else:
        msg = f"value is of type {_go_type_name(dtype)}, expected {types[0]}"
    return [
        Check(
            rule_id=f"type:{path}",
            tag="type",
            path=path,
            predicate=pred,
            message=msg,
            value=col.cast("string"),
            param=",".join(types),
        )
    ]
