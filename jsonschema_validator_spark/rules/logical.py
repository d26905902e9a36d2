"""Logical composition keywords: allOf / anyOf / oneOf / not, the composite
``conditional`` {if,then,else}, and the standalone if/then/else no-ops.

Reference: /root/reference/rules/logical_rules.go and
/root/reference/rules/conditional_rules.go.

Semantics reproduced exactly:
- allOf (logical_rules.go:19-98): every sub-schema must pass; empty list is a
  compile error ("allOf cannot be empty"); failure reports the FIRST failing
  (index, keyword): ``"failed to validate against schema at allOf[%d] for
  keyword '%s'"`` with Tag "allOf".
- anyOf (:101-171): at least one sub-schema fully passes; failure message
  ``"value does not match any schema in anyOf"``.
- oneOf (:174-255): EXACTLY one passes; ``"value matches more than one schema
  in oneOf"`` on >1, ``"value does not match any schema in oneOf"`` on 0.
- not (:258-304): sub-schema must FAIL; ``"value must not validate against
  the schema in not"``; empty schema is a compile error.
- conditional (conditional_rules.go:134-245): the WORKING if/then/else —
  evaluate `if`, then validate the active branch; failure:
  ``"validation failed against then schema for keyword '%s'"`` (:206) /
  ``"...else schema..."`` (:236), Tag "conditional".
- standalone if/then/else (conditional_rules.go:28-132) are effectively
  NO-OPS in the reference (the `if` result is stored in a discarded context —
  :52-53 — so then/else always pass). Reproduced as no-ops; do NOT give them
  semantics the reference lacks (SURVEY.md §7 risk 3).

Vectorization: each sub-schema compiles to an AND of its keyword predicates;
the composite is pure boolean Column algebra — one pass, codegen-friendly.
Failure attribution (first failing index/keyword) is a nested CASE WHEN, so
exactly ONE violation row is emitted per failing row, like the reference's
short-circuiting interpreter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from jsonschema_validator_spark.rules.base import (
    Check,
    CompileContext,
    SpecError,
    builtin,
)


def _sub_checks(col: Column, subspec: dict, ctx: CompileContext):
    from jsonschema_validator_spark.rules.subschema import compile_subschema

    if not isinstance(subspec, dict):
        raise SpecError("schema must be an object")
    return compile_subschema(col, subspec, "", ctx)


def _and_all(preds: list[Column]) -> Column:
    out = None
    for p in preds:
        out = p if out is None else (out & p)
    return out if out is not None else F.lit(True)


@builtin("allOf")
def compile_all_of(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    if not isinstance(spec_value, (list, tuple)):
        raise SpecError("allOf must be an array")
    if len(spec_value) == 0:
        raise SpecError("allOf cannot be empty")
    pred = F.lit(True)
    msg = F.lit(None).cast("string")
    for i, sub in enumerate(spec_value):
        for ch in _sub_checks(col, sub, ctx):
            msg = F.when(
                msg.isNull() & ~ch.predicate,
                F.lit(
                    f"failed to validate against schema at allOf[{i}] "
                    f"for keyword '{ch.tag}'"
                ),
            ).otherwise(msg)
            pred = pred & ch.predicate
    return [
        Check(
            rule_id=f"allOf:{path}",
            tag="allOf",
            path=path,
            predicate=pred,
            message=msg,
            value=col.cast("string"),
        )
    ]


@builtin("anyOf")
def compile_any_of(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    if not isinstance(spec_value, (list, tuple)):
        raise SpecError("anyOf must be an array")
    if len(spec_value) == 0:
        raise SpecError("anyOf cannot be empty")
    pred = F.lit(False)
    for sub in spec_value:
        sub_pred = _and_all([ch.predicate for ch in _sub_checks(col, sub, ctx)])
        pred = pred | sub_pred
    return [
        Check(
            rule_id=f"anyOf:{path}",
            tag="anyOf",
            path=path,
            predicate=pred,
            message="value does not match any schema in anyOf",  # :167
            value=col.cast("string"),
        )
    ]


@builtin("oneOf")
def compile_one_of(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    if not isinstance(spec_value, (list, tuple)):
        raise SpecError("oneOf must be an array")
    if len(spec_value) == 0:
        raise SpecError("oneOf cannot be empty")
    count = F.lit(0)
    for sub in spec_value:
        sub_pred = _and_all([ch.predicate for ch in _sub_checks(col, sub, ctx)])
        count = count + sub_pred.cast("int")
    pred = count == 1
    msg = F.when(
        count > 1, F.lit("value matches more than one schema in oneOf")  # :234
    ).otherwise(F.lit("value does not match any schema in oneOf"))  # :250
    return [
        Check(
            rule_id=f"oneOf:{path}",
            tag="oneOf",
            path=path,
            predicate=pred,
            message=msg,
            value=col.cast("string"),
        )
    ]


@builtin("not")
def compile_not(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    if not isinstance(spec_value, dict):
        raise SpecError("not must be an object")
    if len(spec_value) == 0:
        raise SpecError("not schema cannot be empty")
    sub_pred = _and_all([ch.predicate for ch in _sub_checks(col, spec_value, ctx)])
    return [
        Check(
            rule_id=f"not:{path}",
            tag="not",
            path=path,
            predicate=~sub_pred,
            message="value must not validate against the schema in not",  # :297
            value=col.cast("string"),
        )
    ]


@builtin("conditional")
def compile_conditional(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    if not isinstance(spec_value, dict):
        raise SpecError("conditional must be an object")
    if_spec = spec_value.get("if")
    if if_spec is None or not isinstance(if_spec, dict):
        raise SpecError("if must be an object")  # conditional_rules.go:157
    if_pred = _and_all([ch.predicate for ch in _sub_checks(col, if_spec, ctx)])

    def branch(name: str):
        spec = spec_value.get(name)
        if spec is None:
            return F.lit(True), F.lit(None).cast("string")
        if not isinstance(spec, dict):
            raise SpecError(f"{name} must be an object")
        pred = F.lit(True)
        msg = F.lit(None).cast("string")
        for ch in _sub_checks(col, spec, ctx):
            msg = F.when(
                msg.isNull() & ~ch.predicate,
                F.lit(f"validation failed against {name} schema for keyword '{ch.tag}'"),
            ).otherwise(msg)
            pred = pred & ch.predicate
        return pred, msg

    then_pred, then_msg = branch("then")
    else_pred, else_msg = branch("else")
    pred = F.when(if_pred, then_pred).otherwise(else_pred)
    msg = F.when(if_pred, then_msg).otherwise(else_msg)
    return [
        Check(
            rule_id=f"conditional:{path}",
            tag="conditional",
            path=path,
            predicate=pred,
            message=msg,
            value=col.cast("string"),
        )
    ]


def _noop(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    """Standalone if/then/else are no-ops in the reference
    (conditional_rules.go:52-53 discards the context carrying the if result,
    so then/else never see it and always pass — :64-67, :103-106)."""
    return []


builtin("if")(_noop)
builtin("then")(_noop)
builtin("else")(_noop)
