"""Sub-schema compilation shared by composite keywords.

Analogue of the reference's generic sub-schema evaluator
``validateWithSchema`` (/root/reference/rules/object_patterns.go:240-278)
used by items / allOf / anyOf / oneOf / not / conditional / dependencies:
iterate the sub-schema's keywords, look each up in the registry, skip
annotation keywords and unknown keywords (array.go:51-59), and compile each
into Checks against the given Column.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column

from jsonschema_validator_spark.rules import base

ANNOTATION_KEYWORDS = {"title", "description", "default", "examples"}


def compile_subschema(
    col: Column,
    subspec: dict,
    path: str,
    ctx: base.CompileContext,
    dtype: Optional[str] = None,
) -> list[base.Check]:
    """Compile every recognized keyword of ``subspec`` against ``col``.

    Returns the per-keyword Checks in the sub-spec's (insertion) order —
    Python dicts are ordered, which makes "first failing keyword" reporting
    deterministic where Go map iteration was not.
    """
    if not isinstance(subspec, dict):
        raise base.SpecError("schema must be an object")
    sub_ctx = base.CompileContext(
        mode=ctx.mode,
        dtype=dtype if dtype is not None else ctx.dtype,
        # keep the resolved DataType object: struct/map object keywords in the
        # sub-spec need it for static field introspection
        datatype=ctx.datatype,
        # additionalProperties must see its sibling properties /
        # patternProperties (the reference threads them via context values,
        # object_patterns.go:71-72) — at ANY nesting level
        sibling_properties=subspec.get("properties"),
        sibling_pattern_properties=subspec.get("patternProperties"),
    )
    checks: list[base.Check] = []
    for keyword, value in subspec.items():
        if keyword in ANNOTATION_KEYWORDS:
            continue
        compiler = base.REGISTRY.get(keyword)
        if compiler is None:
            # unknown keywords inside sub-schemas are skipped (array.go:56-59)
            continue
        checks.extend(compiler(col, value, path, sub_ctx))
    return checks
