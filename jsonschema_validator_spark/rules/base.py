"""Rule-compiler plumbing: Check dataclass + registry.

Analogue of RuleFunc / ValidatorRegistry in the reference
(/root/reference/rules/rule.go:12, /root/reference/rules/registry.go:20-93),
inverted for columnar execution: instead of ``func(value) (bool, error)``
called per value, a rule compiles ONCE into a ``pyspark.sql.Column`` boolean
predicate evaluated over every row by whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F


class SpecError(ValueError):
    """Raised at compile time for an invalid spec.

    Mirrors the reference's compile-time schema validation
    (/root/reference/schema/schema.go:95-293): bad keyword value types,
    invalid regexes, unknown keywords in strict mode.
    """


@dataclass
class CompileContext:
    """Carried through keyword compilation (analogue of the ctx that carries
    validator + mode, /root/reference/validator/validator.go:323-324)."""

    mode: str = "strict"  # strict | loose | warn
    # dtype of the column being validated (Spark simpleString), when known.
    dtype: Optional[str] = None
    # the actual Spark DataType object, when known (needed by struct/map
    # object keywords for static field introspection)
    datatype: object = None
    # sibling keyword values, mirroring the ctx values the reference threads
    # to additionalProperties (object_patterns.go:71-72)
    sibling_properties: Optional[dict] = None
    sibling_pattern_properties: Optional[dict] = None


@dataclass
class Check:
    """One compiled (column, keyword) validation check.

    ``predicate`` is True where the row PASSES. NULL input passes every
    keyword except ``required`` — in the reference a missing object key is
    only an error under ``required``; other keywords never see the value
    (validator.go:391-434 skips absent properties).
    """

    rule_id: str
    tag: str
    path: object  # str (static) or Column (dynamic, e.g. "$.arr[i]")
    predicate: Column
    message: object  # str or Column — message for failing rows
    value: Column  # stringified offending value
    param: str = ""
    # metadata for planning
    column_name: Optional[str] = None

    def as_struct(self) -> Column:
        """Pack into the struct consumed by the one-pass projection.

        message/value are only materialized for FAILING rows (they're
        NULL-ed under a when(ok) guard) so the passing hot path stays pure
        comparison work inside codegen.
        """
        path_col = F.lit(self.path) if isinstance(self.path, str) else self.path
        msg_col = F.lit(self.message) if isinstance(self.message, str) else self.message
        return F.struct(
            self.predicate.alias("ok"),
            path_col.alias("path"),
            F.when(self.predicate, F.lit(None).cast("string"))
            .otherwise(msg_col)
            .alias("message"),
            F.when(self.predicate, F.lit(None).cast("string"))
            .otherwise(self.value)
            .alias("value"),
            F.lit(self.tag).alias("tag"),
            F.lit(self.param).alias("param"),
            F.lit(self.rule_id).alias("rule_id"),
        )


# A rule compiler: (col, spec_value, path, ctx) -> list[Check]
RuleCompiler = Callable[[Column, object, str, CompileContext], list]

REGISTRY: dict[str, RuleCompiler] = {}


def register_rule(name: str, fn: RuleCompiler, overwrite: bool = False) -> None:
    """Register a keyword compiler.

    Like Validator.RegisterValidator (validator.go:60-81) the default is to
    REJECT duplicates — this is what makes the first registration win for
    ``required``/``minimum``/``enum`` in the reference; we register the
    winning binding directly and keep the no-overwrite behavior for user
    extensions.
    """
    if not name:
        raise SpecError("rule name cannot be empty")
    if fn is None:
        raise SpecError("rule function cannot be nil")
    if name in REGISTRY and not overwrite:
        raise SpecError(f"validator with name '{name}' already exists")
    REGISTRY[name] = fn


def get_rule(name: str) -> Optional[RuleCompiler]:
    return REGISTRY.get(name)


def builtin(name: str):
    """Decorator for built-in keyword compilers (idempotent re-import)."""

    def deco(fn: RuleCompiler) -> RuleCompiler:
        REGISTRY[name] = fn
        return fn

    return deco


def null_passes(col: Column, raw_pred: Column) -> Column:
    """NULL input is vacuously valid for non-required keywords."""
    return F.when(col.isNull(), F.lit(True)).otherwise(raw_pred)
