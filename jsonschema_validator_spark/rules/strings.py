"""String keywords: minLength / maxLength / pattern.

Reference: /root/reference/rules/string.go.
- length is Go ``len()`` = BYTES, not characters (string.go:29,45) — so the
  engine uses ``octet_length`` for parity on non-ASCII data.
- pattern is RE2 (string.go:61); Spark rlike is Java regex. Specs must stay
  in the RE2∩Java common subset; the spec compiler rejects patterns that
  Python's `re` (a superset-compatible proxy) cannot compile, mirroring the
  compile-time regex check at schema/schema.go:159.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from jsonschema_validator_spark.rules.base import (
    Check,
    CompileContext,
    SpecError,
    builtin,
    null_passes,
)


def _require_nonneg_int(spec_value, keyword: str) -> int:
    if isinstance(spec_value, bool) or not isinstance(spec_value, int):
        if isinstance(spec_value, float) and spec_value == int(spec_value):
            spec_value = int(spec_value)  # toInt lossless-float acceptance, utils.go:88-94
        else:
            raise SpecError(f"{keyword} must be a non-negative integer")
    if spec_value < 0:
        raise SpecError(f"{keyword} must be a non-negative integer")
    return spec_value


@builtin("minLength")
def compile_min_length(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    n = _require_nonneg_int(spec_value, "minLength")
    pred = null_passes(col, F.octet_length(col) >= F.lit(n))
    return [
        Check(
            rule_id=f"minLength:{path}",
            tag="minLength",
            path=path,
            predicate=pred,
            message=F.lit(f"length less than minimum {n}"),  # string.go:30
            value=col.cast("string"),
            param=str(n),
        )
    ]


@builtin("maxLength")
def compile_max_length(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    n = _require_nonneg_int(spec_value, "maxLength")
    pred = null_passes(col, F.octet_length(col) <= F.lit(n))
    return [
        Check(
            rule_id=f"maxLength:{path}",
            tag="maxLength",
            path=path,
            predicate=pred,
            message=F.lit(f"length greater than maximum {n}"),  # string.go:46
            value=col.cast("string"),
            param=str(n),
        )
    ]


@builtin("pattern")
def compile_pattern(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    if not isinstance(spec_value, str):
        raise SpecError("pattern must be a string")
    try:
        re.compile(spec_value)  # compile-time regex validation (schema.go:159)
    except re.error as exc:
        raise SpecError(f"invalid pattern: {exc}") from exc
    pred = null_passes(col, col.rlike(spec_value))
    return [
        Check(
            rule_id=f"pattern:{path}",
            tag="pattern",
            path=path,
            predicate=pred,
            message=F.lit(f"does not match pattern {spec_value}"),  # string.go:66
            value=col.cast("string"),
            param=spec_value,
        )
    ]
