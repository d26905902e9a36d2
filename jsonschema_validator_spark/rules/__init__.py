"""Keyword rule registry.

Mirrors the reference's registry extension model
(/root/reference/rules/registry.go:85-109 ``RegisterValidator`` /
``RegisterBuiltInRules``): each keyword maps to a *compiler* that takes
``(column, spec_value, path, ctx)`` and returns a :class:`Check` — a
vectorized Column predicate plus the exact violation-row fields the
reference would emit for that keyword.

Effective-binding quirk reproduced (SURVEY.md §2 ⚠): on the reference's
``Validator`` the FIRST registration wins for duplicated keywords, so
``minimum`` binds to rule.go:109-141 (message
``"value %v is less than minimum %v"``), ``required`` to rule.go:80-106,
``enum`` to rule.go:144-167.
"""

from __future__ import annotations

from jsonschema_validator_spark.rules.base import Check, CompileContext, RuleCompiler
from jsonschema_validator_spark.rules import (  # noqa: F401  (registration side effects)
    numeric,
    strings,
    enums,
    formats,
    arrays,
    objects,
    logical,
    types as type_rules,
)
from jsonschema_validator_spark.rules.base import (
    REGISTRY,
    get_rule,
    register_rule,
)

__all__ = [
    "Check",
    "CompileContext",
    "RuleCompiler",
    "REGISTRY",
    "get_rule",
    "register_rule",
]
