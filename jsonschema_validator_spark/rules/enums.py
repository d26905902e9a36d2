"""enum keyword.

Validator binding is rule.go:144-167 (first registration wins, SURVEY.md §2 ⚠):
- schema value MUST be a list of strings — the reference errors out on any
  other element type (``enum must be an array of strings``); replicated as a
  compile-time SpecError (do NOT loosen — SURVEY.md §7 risk 4).
- instance value must be a string; non-strings fail with
  ``"value must be a string"``.
- failure message: ``"value must be one of: a, b, c"`` (rule.go:164).
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


@builtin("enum")
def compile_enum(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    if not isinstance(spec_value, (list, tuple)) or not all(
        isinstance(v, str) for v in spec_value
    ):
        raise SpecError("enum must be an array of strings")
    values = list(spec_value)
    is_string = ctx.dtype is None or ctx.dtype.startswith("string")
    if is_string:
        pred = null_passes(col, col.isin(*values))
        msg = F.lit("value must be one of: " + ", ".join(values))
    else:
        # non-string column: every non-null value fails with the type message
        # (rule.go:150-156)
        pred = null_passes(col, F.lit(False))
        msg = F.lit("value must be a string")
    return [
        Check(
            rule_id=f"enum:{path}",
            tag="enum",
            path=path,
            predicate=pred,
            message=msg,
            value=col.cast("string"),
            param="",
        )
    ]
