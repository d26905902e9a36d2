"""Numeric keywords: minimum / maximum / exclusiveMinimum / exclusiveMaximum /
multipleOf.

Reference semantics and message templates:
- minimum   — Validator binding is rule.go:109-141 (first registration wins,
  SURVEY.md §2 ⚠): message ``"value %v is less than minimum %v"``, Param
  unset, Value set.
- maximum   — rules/number.go:37-50: ``"greater than maximum %v"``, Param=max.
- exclusiveMinimum — number.go:53-66: ``"less than or equal to exclusive
  minimum %v"``, Param=min.
- exclusiveMaximum — number.go:69-82: ``"greater than or equal to exclusive
  maximum %v"``, Param=max.
- multipleOf — number.go:85-121: epsilon comparison
  ``abs(v/d - round(v/d)) > 1e-10`` (NOT pmod — float parity), message
  ``"value %v is not a multiple of %v"``, Param=divisor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from jsonschema_validator_spark.errors import go_num_col, go_num_lit
from jsonschema_validator_spark.rules.base import (
    Check,
    CompileContext,
    SpecError,
    builtin,
    null_passes,
)

_NUMERIC_DTYPES = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")


def _require_number(spec_value, keyword: str):
    if isinstance(spec_value, bool) or not isinstance(spec_value, (int, float)):
        # compile-time type check, mirrors schema.go:95-103
        raise SpecError(f"{keyword} must be a number")
    return float(spec_value)


def _numeric_col(col: Column, ctx: CompileContext) -> Column:
    """Permissive numeric coercion analogous to toFloat64
    (rules/utils.go:19-61): numeric strings are accepted."""
    if ctx.dtype and ctx.dtype.startswith("string"):
        return col.cast("double")
    return col


@builtin("minimum")
def compile_minimum(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    bound = _require_number(spec_value, "minimum")
    v = _numeric_col(col, ctx)
    pred = null_passes(col, v >= F.lit(bound))
    # rule.go:135 — %v of the coerced float64 value, %v of the schema number
    msg = F.format_string(
        "value %s is less than minimum " + go_num_lit(spec_value), go_num_col(v)
    )
    return [
        Check(
            rule_id=f"minimum:{path}",
            tag="minimum",
            path=path,
            predicate=pred,
            message=msg,
            value=col.cast("string"),
            param="",  # Validator binding (rule.go:109-141) sets no Param
        )
    ]


@builtin("maximum")
def compile_maximum(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    bound = _require_number(spec_value, "maximum")
    v = _numeric_col(col, ctx)
    pred = null_passes(col, v <= F.lit(bound))
    msg = F.lit("greater than maximum " + go_num_lit(spec_value))  # number.go:47
    return [
        Check(
            rule_id=f"maximum:{path}",
            tag="maximum",
            path=path,
            predicate=pred,
            message=msg,
            value=col.cast("string"),
            param=go_num_lit(spec_value),
        )
    ]


@builtin("exclusiveMinimum")
def compile_exclusive_minimum(
    col: Column, spec_value, path: str, ctx: CompileContext
) -> list[Check]:
    bound = _require_number(spec_value, "exclusiveMinimum")
    v = _numeric_col(col, ctx)
    pred = null_passes(col, v > F.lit(bound))
    msg = F.lit("less than or equal to exclusive minimum " + go_num_lit(spec_value))
    return [
        Check(
            rule_id=f"exclusiveMinimum:{path}",
            tag="exclusiveMinimum",
            path=path,
            predicate=pred,
            message=msg,
            value=col.cast("string"),
            param=go_num_lit(spec_value),
        )
    ]


@builtin("exclusiveMaximum")
def compile_exclusive_maximum(
    col: Column, spec_value, path: str, ctx: CompileContext
) -> list[Check]:
    bound = _require_number(spec_value, "exclusiveMaximum")
    v = _numeric_col(col, ctx)
    pred = null_passes(col, v < F.lit(bound))
    msg = F.lit("greater than or equal to exclusive maximum " + go_num_lit(spec_value))
    return [
        Check(
            rule_id=f"exclusiveMaximum:{path}",
            tag="exclusiveMaximum",
            path=path,
            predicate=pred,
            message=msg,
            value=col.cast("string"),
            param=go_num_lit(spec_value),
        )
    ]


@builtin("multipleOf")
def compile_multiple_of(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    divisor = _require_number(spec_value, "multipleOf")
    if divisor <= 0:
        raise SpecError("multipleOf must be a positive number")  # number.go:88-95
    v = _numeric_col(col, ctx).cast("double")
    ratio = v / F.lit(divisor)
    # number.go:109-110 — same epsilon, same round-to-nearest
    pred = null_passes(col, F.abs(ratio - F.round(ratio, 0)) <= F.lit(1e-10))
    msg = F.format_string(
        "value %s is not a multiple of " + go_num_lit(spec_value), go_num_col(col)
    )
    return [
        Check(
            rule_id=f"multipleOf:{path}",
            tag="multipleOf",
            path=path,
            predicate=pred,
            message=msg,
            value=col.cast("string"),
            param=go_num_lit(spec_value),
        )
    ]
