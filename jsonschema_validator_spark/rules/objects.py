"""Object keywords: required / properties / minProperties / maxProperties /
patternProperties / additionalProperties / dependencies.

Reference files: rules/rule.go:80-106 (required — Validator binding),
rules/object_properties.go, rules/object_constraints.go,
rules/object_patterns.go, rules/object_dependencies.go.

The engine validates three kinds of "object":
- the ROW itself (root spec — fields are table columns),
- a StructType column (closed key set, static),
- a MapType column (open key set, dynamic — patternProperties' natural home).

All three are abstracted behind :class:`ObjectAccessor`; "key exists" maps to
"field is non-null" for rows/structs (a missing JSON key and a NULL column are
the same thing after tabularization) and to ``map_contains_key`` for maps.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StructType

from jsonschema_validator_spark.rules.base import (
    Check,
    CompileContext,
    SpecError,
    builtin,
    null_passes,
)


class ObjectAccessor:
    """Uniform view over row / struct-column / map-column objects."""

    is_root = False

    def exists(self) -> Column:  # the object itself is present
        raise NotImplementedError

    def has(self, name: str) -> Column:
        raise NotImplementedError

    def get(self, name: str) -> Column:
        raise NotImplementedError

    def field_names(self) -> Optional[list[str]]:
        """Static field names, or None when the key set is dynamic (map)."""
        raise NotImplementedError

    def n_props(self) -> Column:
        raise NotImplementedError

    def dtype_of(self, name: str):
        """(simpleString, DataType) of a field, when statically known."""
        return None, None

    def guard(self, pred: Column) -> Column:
        """Vacuous pass when the object itself is absent."""
        return pred


class RootAccessor(ObjectAccessor):
    """The DataFrame row as the object (root spec)."""

    is_root = True

    def __init__(self, schema: StructType):
        self.schema = schema
        self._fields = {f.name: f for f in schema.fields}

    def exists(self) -> Column:
        return F.lit(True)

    def has(self, name: str) -> Column:
        if name not in self._fields:
            return F.lit(False)
        return F.col(name).isNotNull()

    def get(self, name: str) -> Column:
        return F.col(name)

    def field_names(self) -> Optional[list[str]]:
        return list(self._fields)

    def n_props(self) -> Column:
        cols = [F.col(n).isNotNull().cast("int") for n in self._fields]
        out = F.lit(0)
        for c in cols:
            out = out + c
        return out

    def dtype_of(self, name: str):
        f = self._fields.get(name)
        if f is None:
            return None, None
        return f.dataType.simpleString(), f.dataType


class StructAccessor(ObjectAccessor):
    def __init__(self, col: Column, datatype: StructType):
        if not isinstance(datatype, StructType):
            raise SpecError("object keywords on a column require a struct or map dtype")
        self.col = col
        self.schema = datatype
        self._fields = {f.name: f for f in datatype.fields}

    def exists(self) -> Column:
        return self.col.isNotNull()

    def has(self, name: str) -> Column:
        if name not in self._fields:
            return F.lit(False)
        return self.col.getField(name).isNotNull()

    def get(self, name: str) -> Column:
        return self.col.getField(name)

    def field_names(self) -> Optional[list[str]]:
        return list(self._fields)

    def n_props(self) -> Column:
        out = F.lit(0)
        for n in self._fields:
            out = out + self.col.getField(n).isNotNull().cast("int")
        return out

    def dtype_of(self, name: str):
        f = self._fields.get(name)
        if f is None:
            return None, None
        return f.dataType.simpleString(), f.dataType

    def guard(self, pred: Column) -> Column:
        return F.when(self.col.isNull(), F.lit(True)).otherwise(pred)


class MapAccessor(ObjectAccessor):
    def __init__(self, col: Column, datatype: MapType):
        self.col = col
        self.datatype = datatype
        self.value_dtype = datatype.valueType.simpleString() if datatype else None
        self.value_datatype = datatype.valueType if datatype else None

    def exists(self) -> Column:
        return self.col.isNotNull()

    def has(self, name: str) -> Column:
        return F.map_contains_key(self.col, F.lit(name))

    def get(self, name: str) -> Column:
        return F.element_at(self.col, F.lit(name))

    def field_names(self) -> Optional[list[str]]:
        return None

    def n_props(self) -> Column:
        return F.size(self.col)

    def dtype_of(self, name: str):
        return self.value_dtype, self.value_datatype

    def guard(self, pred: Column) -> Column:
        return F.when(self.col.isNull(), F.lit(True)).otherwise(pred)


def accessor_for(col: Column, ctx: CompileContext) -> ObjectAccessor:
    dt = ctx.datatype
    if isinstance(dt, StructType):
        return StructAccessor(col, dt)
    if isinstance(dt, MapType):
        return MapAccessor(col, dt)
    raise SpecError("object keywords require a struct or map column (or the root spec)")


# ---------------------------------------------------------------------------
# keyword logic over an accessor
# ---------------------------------------------------------------------------


def compile_required(acc: ObjectAccessor, spec_value, path: str, ctx: CompileContext) -> list[Check]:
    if not isinstance(spec_value, (list, tuple)) or not all(
        isinstance(v, str) for v in spec_value
    ):
        raise SpecError("required must be an array of strings")  # rule.go:86
    checks = []
    for fld in spec_value:
        checks.append(
            Check(
                rule_id=f"required:{path}.{fld}",
                tag="required",
                path=f"{path}.{fld}",
                predicate=acc.guard(acc.has(fld)),
                message=f"required property '{fld}' is missing",  # rule.go:100
                value=F.lit(None).cast("string"),
            )
        )
    return checks


def compile_properties(
    acc: ObjectAccessor, spec_value, path: str, ctx: CompileContext
) -> list[Check]:
    """Per-property sub-schema recursion — the compiled-schema path
    (validator.go:391-434) emits the inner keyword's own error with the
    nested path, which is what we reproduce."""
    from jsonschema_validator_spark.rules.subschema import compile_subschema

    if not isinstance(spec_value, dict):
        raise SpecError("properties must be an object")  # object_properties.go:58
    checks: list[Check] = []
    for name, subspec in spec_value.items():
        if not isinstance(subspec, dict):
            raise SpecError(f"property '{name}' schema must be an object")
        dtype_s, dtype_o = acc.dtype_of(name)
        sub_ctx = CompileContext(mode=ctx.mode, dtype=dtype_s, datatype=dtype_o)
        col = acc.get(name)
        sub = compile_subschema(col, subspec, f"{path}.{name}", sub_ctx, dtype=dtype_s)
        for ch in sub:
            # absent property ⇒ skipped (validator.go:398-401): the inner
            # null_passes already treats NULL as pass; additionally guard on
            # the parent object's presence.
            ch.predicate = acc.guard(ch.predicate)
            checks.append(ch)
    return checks


def compile_min_properties(
    acc: ObjectAccessor, spec_value, path: str, ctx: CompileContext
) -> list[Check]:
    if isinstance(spec_value, bool) or not isinstance(spec_value, int) or spec_value < 0:
        raise SpecError("minProperties must be a non-negative integer")
    n = acc.n_props()
    return [
        Check(
            rule_id=f"minProperties:{path}",
            tag="minProperties",
            path=path,
            predicate=acc.guard(n >= spec_value),
            message=F.format_string(
                "object has %d properties, which is less than minProperties "
                + str(spec_value),
                n,
            ),  # object_constraints.go:37
            value=F.lit(None).cast("string"),
            param=str(spec_value),
        )
    ]


def compile_max_properties(
    acc: ObjectAccessor, spec_value, path: str, ctx: CompileContext
) -> list[Check]:
    if isinstance(spec_value, bool) or not isinstance(spec_value, int) or spec_value < 0:
        raise SpecError("maxProperties must be a non-negative integer")
    n = acc.n_props()
    return [
        Check(
            rule_id=f"maxProperties:{path}",
            tag="maxProperties",
            path=path,
            predicate=acc.guard(n <= spec_value),
            message=F.format_string(
                "object has %d properties, which is more than maxProperties "
                + str(spec_value),
                n,
            ),  # object_constraints.go:74
            value=F.lit(None).cast("string"),
            param=str(spec_value),
        )
    ]


def compile_pattern_properties(
    acc: ObjectAccessor, spec_value, path: str, ctx: CompileContext
) -> list[Check]:
    """Props whose NAME matches the regex must satisfy the sub-schema
    (object_patterns.go:11-62)."""
    from jsonschema_validator_spark.rules.subschema import compile_subschema
    from jsonschema_validator_spark.rules import base as _base
    from jsonschema_validator_spark.rules.subschema import ANNOTATION_KEYWORDS

    if not isinstance(spec_value, dict):
        raise SpecError("patternProperties must be an object")
    checks: list[Check] = []
    for pattern, subspec in spec_value.items():
        try:
            cre = re.compile(pattern)
        except re.error as exc:
            raise SpecError(f"invalid pattern '{pattern}': {exc}") from exc
        if not isinstance(subspec, dict):
            raise SpecError("patternProperties sub-schema must be an object")
        names = acc.field_names()
        if names is not None:
            # static key set: resolve matches at compile time
            for name in names:
                if not cre.search(name):
                    continue
                dtype_s, dtype_o = acc.dtype_of(name)
                sub_ctx = CompileContext(mode=ctx.mode, dtype=dtype_s, datatype=dtype_o)
                sub = compile_subschema(
                    acc.get(name), subspec, f"{path}.{name}", sub_ctx, dtype=dtype_s
                )
                for ch in sub:
                    ch.predicate = acc.guard(ch.predicate)
                    ch.rule_id = f"patternProperties[{pattern}].{ch.tag}:{path}.{name}"
                    checks.append(ch)
        else:
            # MapType: dynamic keys — predicate over values of matching keys
            assert isinstance(acc, MapAccessor)
            col = acc.col
            for keyword, kw_value in subspec.items():
                if keyword in ANNOTATION_KEYWORDS:
                    continue
                compiler = _base.REGISTRY.get(keyword)
                if compiler is None:
                    continue
                sub_ctx = CompileContext(mode=ctx.mode, dtype=acc.value_dtype)

                def _make_val_pred(_c, _v, _ctx):
                    def val_pred(v: Column) -> Column:
                        sub = _c(v, _v, "", _ctx)
                        p = None
                        for ch in sub:
                            p = ch.predicate if p is None else (p & ch.predicate)
                        return p if p is not None else F.lit(True)

                    return val_pred

                _vp = _make_val_pred(compiler, kw_value, sub_ctx)

                def _make_key_match(_pat):
                    return lambda k, v: k.rlike(_pat)

                matching_vals = F.map_values(F.map_filter(col, _make_key_match(pattern)))
                bad = F.filter(matching_vals, lambda v: ~_vp(v))
                pred = acc.guard(F.size(bad) == 0)
                checks.append(
                    Check(
                        rule_id=f"patternProperties[{pattern}].{keyword}:{path}",
                        tag=keyword,
                        path=path,
                        predicate=pred,
                        message=f"property validation failed for keyword '{keyword}'",
                        value=F.element_at(bad, 1).cast("string"),
                    )
                )
    return checks


def compile_additional_properties(
    acc: ObjectAccessor, spec_value, path: str, ctx: CompileContext
) -> list[Check]:
    """object_patterns.go:64-180. Needs sibling properties/patternProperties
    (threaded via ctx, matching the reference's context values)."""
    declared = set((ctx.sibling_properties or {}).keys())
    patterns = []
    for p in (ctx.sibling_pattern_properties or {}).keys():
        try:
            patterns.append(re.compile(p))
        except re.error:
            continue  # invalid patterns ignored (object_patterns.go:78-81)

    def is_additional(name: str) -> bool:
        if name in declared:
            return False
        return not any(cre.search(name) for cre in patterns)

    names = acc.field_names()
    if isinstance(spec_value, bool):
        if spec_value:
            return []
        if names is not None:
            extra = [n for n in names if is_additional(n)]
            if not extra:
                return []
            any_extra = None
            for n in extra:
                h = acc.has(n)
                any_extra = h if any_extra is None else (any_extra | h)
            pred = acc.guard(~any_extra)
            value = F.to_json(F.struct(*[acc.get(n).alias(n) for n in extra]))
        else:
            assert isinstance(acc, MapAccessor)
            declared_list = sorted(declared)
            pattern_strs = [p.pattern for p in patterns]

            def _is_extra(k: Column) -> Column:
                cond = F.lit(True)
                if declared_list:
                    cond = cond & ~k.isin(*declared_list)
                if pattern_strs:
                    cond = cond & ~_any_rlike(k, pattern_strs)
                return cond

            extra_keys = F.filter(F.map_keys(acc.col), _is_extra)
            pred = acc.guard(F.size(extra_keys) == 0)
            value = F.to_json(extra_keys)
        return [
            Check(
                rule_id=f"additionalProperties:{path}",
                tag="additionalProperties",
                path=path,
                predicate=pred,
                message="additional properties are not allowed",  # :127
                value=value,
            )
        ]
    if isinstance(spec_value, dict):
        from jsonschema_validator_spark.rules.subschema import compile_subschema

        checks: list[Check] = []
        if names is None:
            raise SpecError(
                "additionalProperties schema form over map columns is not supported yet;"
                " use patternProperties"
            )
        for n in names:
            if not is_additional(n):
                continue
            dtype_s, dtype_o = acc.dtype_of(n)
            sub_ctx = CompileContext(mode=ctx.mode, dtype=dtype_s, datatype=dtype_o)
            sub = compile_subschema(acc.get(n), spec_value, f"{path}.{n}", sub_ctx, dtype=dtype_s)
            for ch in sub:
                checks.append(
                    Check(
                        rule_id=f"additionalProperties.{ch.tag}:{path}.{n}",
                        tag=ch.tag,
                        path=f"{path}.{n}",
                        predicate=acc.guard(ch.predicate),
                        # object_patterns.go:163
                        message=f"additional property validation failed for keyword '{ch.tag}'",
                        value=acc.get(n).cast("string"),
                    )
                )
        return checks
    raise SpecError("additionalProperties must be a boolean or an object")  # :175


def _any_rlike(k: Column, patterns: list[str]) -> Column:
    out = F.lit(False)
    for p in patterns:
        out = out | k.rlike(p)
    return out


def compile_dependencies(
    acc: ObjectAccessor, spec_value, path: str, ctx: CompileContext
) -> list[Check]:
    """object_dependencies.go:53-97 — array form (co-presence) and schema
    form (object revalidated when the trigger property is present)."""
    from jsonschema_validator_spark.rules.subschema import ANNOTATION_KEYWORDS
    from jsonschema_validator_spark.rules import base as _base

    if not isinstance(spec_value, dict):
        raise SpecError("dependencies must be an object")
    checks: list[Check] = []
    for prop, dep in spec_value.items():
        present = acc.has(prop)
        if isinstance(dep, (list, tuple)):
            # first missing dependency wins (returns immediately, :58-69)
            pred = F.lit(True)
            msg = F.lit(None).cast("string")
            for q in dep:
                if not isinstance(q, str):
                    raise SpecError(f"dependency for property '{prop}' must be strings")
                ok_q = acc.has(q)
                msg = F.when(
                    msg.isNull() & ~ok_q,
                    F.lit(f"property '{prop}' depends on '{q}', but it is missing"),
                ).otherwise(msg)
                pred = pred & ok_q
            checks.append(
                Check(
                    rule_id=f"dependencies[{prop}]:{path}",
                    tag="dependencies",
                    path=path,
                    predicate=acc.guard(F.when(present, pred).otherwise(F.lit(True))),
                    message=msg,
                    value=F.lit(None).cast("string"),
                    param=prop,
                )
            )
        elif isinstance(dep, dict):
            # schema form: validate the OBJECT against the schema when prop
            # is present; report the first failing keyword (:72-92)
            for keyword, kw_value in dep.items():
                if keyword in ANNOTATION_KEYWORDS:
                    continue
                sub_checks = _compile_object_keyword(acc, keyword, kw_value, path, ctx)
                if sub_checks is None:
                    continue
                for ch in sub_checks:
                    checks.append(
                        Check(
                            rule_id=f"dependencies[{prop}].{keyword}:{path}",
                            tag="dependencies",
                            path=path,
                            predicate=acc.guard(
                                F.when(present, ch.predicate).otherwise(F.lit(True))
                            ),
                            message=(
                                f"dependency validation failed for property '{prop}' "
                                f"with keyword '{keyword}'"
                            ),  # :87
                            value=F.lit(None).cast("string"),
                            param=prop,
                        )
                    )
        else:
            checks.append(
                Check(
                    rule_id=f"dependencies[{prop}]:{path}",
                    tag="dependencies",
                    path=path,
                    predicate=acc.guard(F.when(present, F.lit(False)).otherwise(F.lit(True))),
                    message=f"dependency for property '{prop}' must be an array or an object",
                    value=F.lit(None).cast("string"),
                    param=prop,
                )
            )
    return checks


_OBJECT_KEYWORDS = {
    "required": compile_required,
    "properties": compile_properties,
    "minProperties": compile_min_properties,
    "maxProperties": compile_max_properties,
    "patternProperties": compile_pattern_properties,
    "additionalProperties": compile_additional_properties,
    "dependencies": compile_dependencies,
}


def _compile_object_keyword(acc, keyword, value, path, ctx):
    fn = _OBJECT_KEYWORDS.get(keyword)
    if fn is None:
        return None
    return fn(acc, value, path, ctx)


def compile_object_spec(
    acc: ObjectAccessor, spec: dict, path: str, ctx: CompileContext
) -> list[Check]:
    """Compile all object keywords of a spec with sibling knowledge
    (properties/patternProperties are visible to additionalProperties,
    mirroring the reference's context threading)."""
    ctx = CompileContext(
        mode=ctx.mode,
        dtype=ctx.dtype,
        datatype=ctx.datatype,
        sibling_properties=spec.get("properties"),
        sibling_pattern_properties=spec.get("patternProperties"),
    )
    checks: list[Check] = []
    # `required` evaluated first, specially (validator.go:327-353)
    if "required" in spec:
        checks.extend(compile_required(acc, spec["required"], path, ctx))
    for keyword, value in spec.items():
        if keyword == "required":
            continue
        fn = _OBJECT_KEYWORDS.get(keyword)
        if fn is not None:
            checks.extend(fn(acc, value, path, ctx))
    return checks


# ---------------------------------------------------------------------------
# registry adapters (for object keywords appearing on struct/map COLUMNS
# inside sub-schemas)
# ---------------------------------------------------------------------------


def _adapter(keyword: str):
    def compile_kw(col: Column, spec_value, path: str, ctx: CompileContext) -> list[Check]:
        acc = accessor_for(col, ctx)
        return _OBJECT_KEYWORDS[keyword](acc, spec_value, path, ctx)

    return compile_kw


for _kw in _OBJECT_KEYWORDS:
    builtin(_kw)(_adapter(_kw))
