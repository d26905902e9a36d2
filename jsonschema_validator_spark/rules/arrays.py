"""Array keywords: items (object + tuple form) / minItems / maxItems /
uniqueItems.

Reference: /root/reference/rules/array.go.
- items object form (array.go:43-75): every element validated against one
  sub-schema; first failing element reported with path ``path[i]``, message
  ``"array item validation failed for keyword '%s'"`` (array.go:69), Tag set
  to the failing keyword, Value = the item.
- items tuple form (array.go:77-120): element i validated against schema i;
  extra elements ignored, missing elements skipped (break at array.go:80-83).
- minItems/maxItems (array.go:135-164): ``"fewer items than minimum %d"`` /
  ``"more items than maximum %d"``, Param set.
- uniqueItems (array.go:167-187): ``"contains duplicate items"``.

Spark mapping: higher-order functions (transform/array_position/element_at/
size/array_distinct) — all JVM-side, no shuffle, codegen-friendly.
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


def _elem_dtype(dtype: str | None) -> str | None:
    if dtype and dtype.startswith("array<") and dtype.endswith(">"):
        return dtype[6:-1]
    return None


def _is_array(dtype: str | None) -> bool:
    return dtype is None or dtype.startswith("array")


def _fail_all(col: Column, rule_id: str, tag: str, path: str, message: str) -> Check:
    """A check every non-null row fails (static type mismatch, kept at
    runtime for reference error-shape parity)."""
    return Check(
        rule_id=rule_id,
        tag=tag,
        path=path,
        predicate=null_passes(col, F.lit(False)),
        message=message,
        value=col.cast("string"),
    )


def _require_nonneg_int(spec_value, keyword: str) -> int:
    if isinstance(spec_value, bool) or not isinstance(spec_value, int):
        if isinstance(spec_value, float) and spec_value == int(spec_value):
            return int(spec_value)
        raise SpecError(f"{keyword} must be a non-negative integer")
    if spec_value < 0:
        raise SpecError(f"{keyword} must be a non-negative integer")
    return spec_value


@builtin("items")
def compile_items(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    from jsonschema_validator_spark.rules.subschema import (
        ANNOTATION_KEYWORDS,
        compile_subschema,
    )
    from jsonschema_validator_spark.rules import base as _base

    if not _is_array(ctx.dtype):
        return [
            _fail_all(
                col, f"items:{path}", "items", path, "items can only be applied to arrays"
            )
        ]
    elem_dt = _elem_dtype(ctx.dtype)
    checks: list[Check] = []

    if isinstance(spec_value, dict):
        # object form: one Check per sub-schema keyword; the predicate scans
        # all elements via transform + array_position (single pass, no
        # explode, stays in codegen).
        for keyword, kw_value in spec_value.items():
            if keyword in ANNOTATION_KEYWORDS:
                continue
            compiler = _base.REGISTRY.get(keyword)
            if compiler is None:
                continue  # unknown keyword skipped (array.go:56-59)
            sub_ctx = CompileContext(mode=ctx.mode, dtype=elem_dt)

            # closure factory: HOF lambdas MUST be unary (a 2+-arg lambda is
            # bound as (element, index) by PySpark)
            def _make_elem_pred(_c, _v, _ctx):
                def elem_pred(x: Column) -> Column:
                    sub = _c(x, _v, "", _ctx)
                    p = None
                    for ch in sub:
                        p = ch.predicate if p is None else (p & ch.predicate)
                    return p if p is not None else F.lit(True)

                return elem_pred

            oks = F.transform(col, _make_elem_pred(compiler, kw_value, sub_ctx))
            first_bad = F.array_position(oks, F.lit(False))  # 1-based, 0 = none
            pred = null_passes(col, first_bad == 0)
            idx = (first_bad - 1).cast("string")
            path_col = F.concat(F.lit(path + "["), idx, F.lit("]"))
            checks.append(
                Check(
                    rule_id=f"items.{keyword}:{path}",
                    tag=keyword,
                    path=path_col,
                    predicate=pred,
                    message=f"array item validation failed for keyword '{keyword}'",
                    value=F.element_at(col, first_bad.cast("int")).cast("string"),
                )
            )
    elif isinstance(spec_value, (list, tuple)):
        # tuple form: per (index, keyword)
        for i, item_schema in enumerate(spec_value):
            if not isinstance(item_schema, dict):
                continue  # array.go:88-91
            elem = F.element_at(col, i + 1)
            in_range = F.size(col) > i  # missing elements skipped (array.go:80-83)
            sub = compile_subschema(elem, item_schema, f"{path}[{i}]", ctx, dtype=elem_dt)
            for ch in sub:
                checks.append(
                    Check(
                        rule_id=f"items[{i}].{ch.tag}:{path}",
                        tag=ch.tag,
                        path=f"{path}[{i}]",
                        predicate=null_passes(
                            col, F.when(in_range, ch.predicate).otherwise(F.lit(True))
                        ),
                        message=f"array item validation failed for keyword '{ch.tag}'",
                        value=elem.cast("string"),
                    )
                )
    else:
        raise SpecError("items must be an object or array")  # array.go:122-128
    return checks


@builtin("minItems")
def compile_min_items(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    n = _require_nonneg_int(spec_value, "minItems")
    if not _is_array(ctx.dtype):
        return [_fail_all(col, f"minItems:{path}", "minItems", path, "must be an array")]
    return [
        Check(
            rule_id=f"minItems:{path}",
            tag="minItems",
            path=path,
            predicate=null_passes(col, F.size(col) >= n),
            message=f"fewer items than minimum {n}",
            value=col.cast("string"),
            param=str(n),
        )
    ]


@builtin("maxItems")
def compile_max_items(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    n = _require_nonneg_int(spec_value, "maxItems")
    if not _is_array(ctx.dtype):
        return [_fail_all(col, f"maxItems:{path}", "maxItems", path, "must be an array")]
    return [
        Check(
            rule_id=f"maxItems:{path}",
            tag="maxItems",
            path=path,
            predicate=null_passes(col, F.size(col) <= n),
            message=f"more items than maximum {n}",
            value=col.cast("string"),
            param=str(n),
        )
    ]


@builtin("uniqueItems")
def compile_unique_items(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    if not isinstance(spec_value, bool):
        raise SpecError("uniqueItems must be a boolean")
    if not spec_value:
        return []
    if not _is_array(ctx.dtype):
        return [_fail_all(col, f"uniqueItems:{path}", "uniqueItems", path, "must be an array")]
    return [
        Check(
            rule_id=f"uniqueItems:{path}",
            tag="uniqueItems",
            path=path,
            predicate=null_passes(col, F.size(col) == F.size(F.array_distinct(col))),
            message="contains duplicate items",  # array.go:182
            value=col.cast("string"),
        )
    ]
