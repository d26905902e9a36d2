"""Declarative validation spec: parse + compile.

Analogue of ``schema.Parse`` + ``Schema.Compile``
(/root/reference/schema/schema.go:36-297): the spec is validated ONCE at
compile time (keyword value types, regex compilation, ``$ref`` rejection,
unknown-keyword rejection in strict mode), producing a tree of vectorized
Column predicates instead of a CompiledSchema interpreter tree.

Spec shape — the root describes the ROW OBJECT, exactly like a JSON-Schema
``object`` schema where properties are table columns::

    Spec({
        "type": "object",
        "required": ["image_id", "w"],
        "properties": {
            "w": {"type": "integer", "minimum": 1, "maximum": 16384},
            "fmt": {"enum": ["png", "jpeg", "webp"]},
            "caption": {"type": "string", "minLength": 1, "maxLength": 200},
        },
    }, mode="strict")

``columns`` is accepted as an alias for ``properties``.
"""

from __future__ import annotations

import json
from enum import Enum
from typing import Optional, Union

from pyspark.sql.types import StructType

from jsonschema_validator_spark.rules.base import Check, CompileContext, SpecError
from jsonschema_validator_spark.rules.objects import RootAccessor, compile_object_spec
from jsonschema_validator_spark.rules.subschema import ANNOTATION_KEYWORDS
from jsonschema_validator_spark.rules import base as rules_base


class ValidationMode(str, Enum):
    """schema/schema.go:10-16. ModeWarn is declared but has NO behavioral
    branch in the reference — every mode check is ``== ModeStrict``
    (validator.go:507, 806; schema.go:278, 286), so warn behaves exactly
    like loose: unknown keywords are skipped and violations still fail.
    Reproduced faithfully here (round-4 parity fix); "violations don't
    flip pass" is a separate engine-native option,
    ``Validator(non_fatal_verdicts=True)`` — a real feature the reference
    lacks, deliberately NOT tied to warn."""

    STRICT = "strict"
    LOOSE = "loose"
    WARN = "warn"


_OBJECT_KEYWORDS = {
    "required",
    "properties",
    "minProperties",
    "maxProperties",
    "patternProperties",
    "additionalProperties",
    "dependencies",
}


class Spec:
    """A parsed validation spec (analogue of schema.Schema)."""

    def __init__(
        self,
        raw: Union[dict, str],
        mode: Union[str, ValidationMode, None] = None,
    ):
        if isinstance(raw, str):
            raw = json.loads(raw)  # schema.Parse (schema.go:36-58)
        if not isinstance(raw, dict):
            raise SpecError("schema must be a JSON object")
        self.raw = dict(raw)
        if "columns" in self.raw:
            props = dict(self.raw.pop("columns"))
            props.update(self.raw.get("properties") or {})
            self.raw["properties"] = props
        # an embedded 'mode' key (engine-native convenience; the keyword
        # screen whitelists it) is HONORED, not silently ignored; an
        # explicit ctor mode that contradicts it is an authoring error
        embedded = self.raw.get("mode")
        if mode is not None and embedded is not None and str(embedded) != (
            mode.value if isinstance(mode, ValidationMode) else str(mode)
        ):
            raise SpecError(
                f"conflicting modes: spec embeds mode={embedded!r} but the "
                f"constructor got mode={mode!r}"
            )
        eff = mode if mode is not None else (embedded or "strict")
        try:
            self.mode = ValidationMode(eff)
        except ValueError as exc:
            raise SpecError(f"invalid mode: {eff!r}") from exc
        self._validate_keywords(self.raw)

    def _validate_keywords(self, spec: dict) -> None:
        """Compile-time keyword screening (schema.go:276-293)."""
        for key in spec:
            if key == "$ref":
                if self.mode == ValidationMode.STRICT:
                    raise SpecError("unsupported keyword '$ref' in strict mode")
                continue
            if key in ANNOTATION_KEYWORDS or key == "mode":
                continue
            if key in _OBJECT_KEYWORDS or key == "type":
                continue
            if rules_base.REGISTRY.get(key) is None and self.mode == ValidationMode.STRICT:
                raise SpecError(f"unknown keyword '{key}' in strict mode")
        # recurse into sub-schemas (Schema.Compile compiles them eagerly,
        # schema.go:136-261, so unknown keywords anywhere fail at compile)
        props = spec.get("properties")
        if isinstance(props, dict):
            for sub in props.values():
                if isinstance(sub, dict):
                    self._validate_subschema(sub)

    def _validate_subschema(self, sub: dict) -> None:
        for key, value in sub.items():
            if key == "$ref" and self.mode == ValidationMode.STRICT:
                raise SpecError("unsupported keyword '$ref' in strict mode")
            if key in ANNOTATION_KEYWORDS:
                continue
            if key in _OBJECT_KEYWORDS or key == "type":
                if key == "properties" and isinstance(value, dict):
                    for s in value.values():
                        if isinstance(s, dict):
                            self._validate_subschema(s)
                # the reference compiles these sub-schemas eagerly with the
                # parent's mode (schema.go:156-178 patternProperties,
                # :190-209 dependencies schema form, :244-256
                # additionalProperties), so a typo'd keyword inside them
                # fails strict compile too — recursion matching that
                # exactly. Logical-composition keywords (allOf/anyOf/
                # oneOf/not/conditional) are deliberately NOT screened:
                # the reference stores them as plain keyword values with
                # no sub-Compile (no strict screening), and giving them
                # semantics the reference lacks is a parity break.
                elif key == "patternProperties" and isinstance(value, dict):
                    for s in value.values():
                        if isinstance(s, dict):
                            self._validate_subschema(s)
                elif key == "dependencies" and isinstance(value, dict):
                    for s in value.values():
                        if isinstance(s, dict):  # schema form only
                            self._validate_subschema(s)
                elif key == "additionalProperties" and isinstance(value, dict):
                    self._validate_subschema(value)
                continue
            if key == "items":
                # schema.go:212-241: object form and tuple form both
                # sub-compile with the parent mode
                if isinstance(value, dict):
                    self._validate_subschema(value)
                elif isinstance(value, list):
                    for s in value:
                        if isinstance(s, dict):
                            self._validate_subschema(s)
                continue
            if rules_base.REGISTRY.get(key) is None and self.mode == ValidationMode.STRICT:
                raise SpecError(f"unknown keyword '{key}' in strict mode")

    def compile(self, schema: StructType) -> "CompiledSpec":
        """Compile against a static table schema → list of Checks.

        Mirrors Schema.Compile: all spec errors surface HERE, once, on the
        driver — never per-row on executors.
        """
        ctx = CompileContext(mode=self.mode.value)
        acc = RootAccessor(schema)
        object_part = {k: v for k, v in self.raw.items() if k in _OBJECT_KEYWORDS}
        checks = compile_object_spec(acc, object_part, "$", ctx)

        # non-object root keywords (rare but legal — e.g. root-level allOf)
        for key, value in self.raw.items():
            if key in _OBJECT_KEYWORDS or key in ANNOTATION_KEYWORDS:
                continue
            if key in ("type", "mode", "$ref"):
                continue
            compiler = rules_base.REGISTRY.get(key)
            if compiler is None:
                continue
            raise SpecError(
                f"root-level keyword '{key}' requires a column context; "
                "nest it under properties.<column>"
            )
        return CompiledSpec(self, checks)


def parse_tag(tag: str) -> dict:
    """Parse a struct-tag rule string into a column spec — the reference's
    third schema front-end (``validate:"required,minimum=18,enum=admin|user"``,
    parseTag at /root/reference/validator/validator.go:577-615).

    Semantics reproduced:
    - comma-separated directives; bare ``required`` → required flag (:585-588)
    - ``key=value`` pairs; ``enum=a|b|c`` splits on ``|`` into a string list
      (:606)
    - exactly the reference's six numeric keys — ``min``, ``max``,
      ``minLength``, ``maxLength``, ``minimum``, ``maximum`` — parse as int
      when the literal is integral, else float, else stay the raw string
      (:595-601); every OTHER key (``type``/``pattern``/``format``/unknown)
      keeps the raw string value (:602-608), so ``pattern=123`` stays the
      string ``"123"``
    """
    out: dict = {}
    for part in tag.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            if part == "required":
                out["required"] = True
            else:
                out[part] = True
            continue
        key, _, value = part.partition("=")
        key = key.strip()
        value = value.strip()
        if key == "enum":
            out[key] = value.split("|")
        elif key in ("min", "max", "minLength", "maxLength", "minimum", "maximum"):
            try:
                out[key] = int(value)
            except ValueError:
                try:
                    out[key] = float(value)
                except ValueError:
                    out[key] = value
        else:
            out[key] = value
    return out


def spec_from_tags(tags: dict[str, str], mode: Union[str, ValidationMode] = "strict") -> Spec:
    """Build a Spec from per-column tag strings (the Struct()/Var() path,
    validator.go:134-265): ``{"age": "required,minimum=18"}`` becomes a
    root object spec where tag-``required`` lifts into the root required
    list (non-zero-value check ≙ NOT NULL on a column)."""
    required: list[str] = []
    props: dict = {}
    for column, tag in tags.items():
        parsed = parse_tag(tag)
        if parsed.pop("required", False):
            required.append(column)
        if parsed:
            props[column] = parsed
    raw: dict = {}
    if required:
        raw["required"] = required
    if props:
        raw["properties"] = props
    return Spec(raw, mode=mode)


def spec_from_schema(
    schema: StructType,
    tag_name: str = "validate",
    tag_name_func=None,
    mode: Union[str, ValidationMode] = "strict",
) -> Spec:
    """Tag-SOURCE adapter — the SetTagNameFunc / WithTagName analogue
    (validator.go:124-127, :161-167; options.go:36-40).

    The Go path reads each struct field's tag via ``field.Tag.Get(TagName)``
    unless a ``tagNameFunc(field)`` override is set; empty tags skip the
    field. The Spark field-metadata equivalent: each StructField may carry
    its rule string in ``field.metadata[tag_name]`` (attach with
    ``df.withMetadata(col, {"validate": "required,minimum=18"})``), and
    ``tag_name_func(field) -> str`` overrides the lookup entirely::

        spec = spec_from_schema(df.schema)                  # default tag
        spec = spec_from_schema(df.schema, tag_name="rules")  # WithTagName
        spec = spec_from_schema(df.schema, tag_name_func=my_fn)  # SetTagNameFunc
    """
    tags: dict[str, str] = {}
    for field in schema.fields:
        if tag_name_func is not None:
            tag = tag_name_func(field)
        else:
            tag = (field.metadata or {}).get(tag_name, "")
        if not tag:
            continue  # validator.go:166-167
        tags[field.name] = tag
    return spec_from_tags(tags, mode=mode)


class CompiledSpec:
    """Analogue of CompiledSchema (schema.go:29-33) — the physical rule plan."""

    def __init__(self, spec: Spec, checks: list[Check]):
        self.spec = spec
        self.checks = checks

    @property
    def rule_ids(self) -> list[str]:
        return [c.rule_id for c in self.checks]

    def __len__(self) -> int:
        return len(self.checks)


__all__ = [
    "Spec",
    "CompiledSpec",
    "SpecError",
    "ValidationMode",
    "parse_tag",
    "spec_from_tags",
    "spec_from_schema",
]
