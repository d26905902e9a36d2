"""Extension surface parity — SURVEY.md §2.3/§2.4:
custom keyword (RegisterValidator), custom format (RegisterFormatValidator),
comparators (RegisterComparator + built-ins), with the reference's
registration edge-case semantics (duplicates, empty names)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_validator_spark import Spec, Validator
from jsonschema_validator_spark.rules import base as rules_base
from jsonschema_validator_spark.rules.base import Check
from jsonschema_validator_spark.rules.comparators import (
    ComparatorError,
    compare,
    get_comparator,
    register_comparator,
)
from jsonschema_validator_spark.rules.formats import register_format_validator


def test_custom_keyword_rule(spark):
    """RegisterValidator analogue (validator.go:60-81): a new keyword
    compiles to a Column predicate and emits its own violation row."""

    def compile_even(col, spec_value, path, ctx):
        if not spec_value:
            return []
        return [
            Check(
                rule_id=f"even:{path}",
                tag="even",
                path=path,
                predicate=F.when(col.isNull(), F.lit(True)).otherwise(col % 2 == 0),
                message="value must be even",
                value=col.cast("string"),
            )
        ]

    rules_base.register_rule("even", compile_even, overwrite=True)
    try:
        df = spark.createDataFrame([(2,), (3,), (None,)], "v int")
        res = Validator({"properties": {"v": {"even": True}}}).validate(df)
        rows = res.violations().collect()
        assert len(rows) == 1
        assert rows[0]["message"] == "value must be even"
        assert rows[0]["tag"] == "even"
    finally:
        rules_base.REGISTRY.pop("even", None)


def test_duplicate_rule_registration_rejected():
    # validator.go:69-71: duplicates are an error (first registration wins)
    def dummy(col, v, path, ctx):
        return []

    rules_base.register_rule("dup_kw_test", dummy)
    try:
        with pytest.raises(Exception, match="already exists"):
            rules_base.register_rule("dup_kw_test", dummy)
    finally:
        rules_base.REGISTRY.pop("dup_kw_test", None)


def test_custom_format(spark):
    """RegisterFormatValidator analogue (format.go:84-88)."""
    register_format_validator("shouty", lambda col: col == F.upper(col))
    df = spark.createDataFrame([("LOUD",), ("quiet",)], "v string")
    res = Validator({"properties": {"v": {"format": "shouty"}}}).validate(df)
    rows = res.violations().collect()
    assert len(rows) == 1 and rows[0]["value"] == "quiet"
    from jsonschema_validator_spark.rules.formats import FORMAT_VALIDATORS
    FORMAT_VALIDATORS.pop("shouty", None)


def test_unknown_format_strict_vs_loose(spark):
    df = spark.createDataFrame([("x",)], "v string")
    # strict: unknown format fails every row at runtime (format.go:53-60)
    res = Validator({"properties": {"v": {"format": "no-such"}}}).validate(df)
    rows = res.violations().collect()
    assert len(rows) == 1 and rows[0]["message"] == "unknown format: no-such"
    # loose: unknown format passes (format.go:62-67)
    res = Validator(
        Spec({"properties": {"v": {"format": "no-such"}}}, mode="loose")
    ).validate(df)
    assert res.violations().count() == 0


def test_builtin_comparators(spark):
    df = spark.createDataFrame([(1, 1), (1, 2), (None, None)], "a int, b int")
    out = df.select(
        compare("eq", F.col("a"), F.col("b")).alias("eq"),
        compare("ne", F.col("a"), F.col("b")).alias("ne"),
        compare("lt", F.col("a"), F.col("b")).alias("lt"),
        compare("ge", F.col("a"), F.col("b")).alias("ge"),
    ).collect()
    assert [r["eq"] for r in out] == [True, False, True]  # DeepEqual(nil,nil)
    assert [r["ne"] for r in out] == [False, True, False]
    assert out[1]["lt"] is True and out[0]["ge"] is True


def test_comparator_registration_edges():
    with pytest.raises(ComparatorError, match="empty"):
        register_comparator("", lambda a, b: a == b)
    with pytest.raises(ComparatorError, match="nil"):
        register_comparator("x", None)
    with pytest.raises(ComparatorError, match="already registered"):
        register_comparator("eq", lambda a, b: a == b)
    assert get_comparator("nope") is None
    with pytest.raises(ComparatorError, match="not found"):
        compare("nope", None, None)


# ---------------------------------------------------------------------------
# SetCustomValidateFunc / SetCustomTypeFunc / SetTagNameFunc / cache
# (validator.go:104-131, :181-204, :296-314, :848-853)
# ---------------------------------------------------------------------------


def test_custom_validate_func_port(spark):
    """Port of TestCustomValidation (validator_test.go:285-301): prefix hook
    over a required tag field; failure message is the reference's hardcoded
    quirk (validator.go:195)."""
    from jsonschema_validator_spark import Validator, spec_from_tags

    v = Validator(spec_from_tags({"role": "required"}))
    v.set_custom_validate_func(
        lambda col, path: F.upper(col).startswith("ADMIN_")
    )
    df = spark.createDataFrame([("admin_user",), ("user",), (None,)], "role string")
    rows = v.validate(df).violations(include=["role"]).collect()
    by_role = {r["role"]: r for r in rows}
    assert "admin_user" not in by_role
    bad = by_role["user"]
    assert bad["message"] == "value must start with 'ADMIN_'"
    assert bad["tag"] == "custom"
    assert bad["path"] == "$.role"
    # NULL value: Go fn receives nil -> returns false -> custom failure; the
    # custom `continue` then suppresses the required check for that field
    null_rows = [r for r in rows if r["role"] is None]
    assert [r["tag"] for r in null_rows] == ["custom"]


def test_custom_validate_func_skips_remaining_checks(spark):
    """On custom failure the Go loop `continue`s — the field's other keyword
    checks must NOT fire (validator.go:197-203)."""
    from jsonschema_validator_spark import Validator, spec_from_tags

    v = Validator(spec_from_tags({"name": "minLength=10"}), stop_on_first_error=True)
    v.set_custom_validate_func(lambda col, path: col.startswith("A"))
    df = spark.createDataFrame([("Ab",), ("zz",), ("Abcdefghijk",)], "name string")
    rows = v.validate(df).violations(include=["name"]).collect()
    tags = {r["name"]: r["tag"] for r in rows}
    assert tags["Ab"] == "minLength"  # custom passed, keyword ran
    assert tags["zz"] == "custom"     # custom failed, minLength suppressed
    assert "Abcdefghijk" not in tags


def test_custom_type_func_pre_projection(spark):
    """SetCustomTypeFunc ≙ value-extraction pre-projection: rules see the
    extracted value (validator.go:176-178), and the violation's value too."""
    from jsonschema_validator_spark import Validator

    df = spark.createDataFrame(
        [((25.0, True),), ((15.0, True),)],
        "age struct<v: double, valid: boolean>",
    )
    v = Validator({"properties": {"age": {"minimum": 18}}})
    v.set_custom_type_func(lambda col: col.getField("v"))
    rows = v.validate(df).violations().collect()
    assert len(rows) == 1
    assert rows[0]["message"] == "value 15 is less than minimum 18"
    assert rows[0]["value"] == "15.0"


def test_spec_from_schema_tag_adapter(spark):
    """SetTagNameFunc / WithTagName analogue: tags read from StructField
    metadata under a configurable key, or via a field->tag function."""
    from jsonschema_validator_spark import Validator, spec_from_schema

    df = (
        spark.createDataFrame([(25.0, "admin"), (15.0, "root")], "age double, role string")
        .withMetadata("age", {"validate": "required,minimum=18"})
        .withMetadata("role", {"rules": "enum=admin|user"})
    )
    # default tag name: only `age` carries a `validate` tag
    spec = spec_from_schema(df.schema)
    tags = sorted(r["tag"] for r in Validator(spec).validate(df).violations().collect())
    assert tags == ["minimum"]
    # WithTagName: read the `rules` key instead (options.go:36-40)
    spec2 = spec_from_schema(df.schema, tag_name="rules")
    tags2 = sorted(r["tag"] for r in Validator(spec2).validate(df).violations().collect())
    assert tags2 == ["enum"]
    # SetTagNameFunc: full override wins over metadata (validator.go:162-164)
    spec3 = spec_from_schema(
        df.schema,
        tag_name_func=lambda f: "maximum=20" if f.name == "age" else "",
    )
    tags3 = sorted(r["tag"] for r in Validator(spec3).validate(df).violations().collect())
    assert tags3 == ["maximum"]


def test_compile_cache_and_clear(spark):
    """WithCaching + ClearCache parity (validator_test.go:270-278): a cache
    hit returns the SAME compiled object; ClearCache forces a recompile."""
    from jsonschema_validator_spark import Validator

    df = spark.createDataFrame([(1.0,)], "a double")
    v = Validator({"properties": {"a": {"minimum": 0}}}, enable_caching=True)
    c1 = v.compile(df)
    c2 = v.compile(df)
    assert c1 is c2  # assert.Same
    v.clear_cache()
    c3 = v.compile(df)
    assert c3 is not c1
    # different schema -> different cache slot
    df2 = spark.createDataFrame([(1.0, "x")], "a double, b string")
    assert v.compile(df2) is not c3
    assert v.compile(df2) is v.compile(df2)
    # no caching by default
    v2 = Validator({"properties": {"a": {"minimum": 0}}})
    assert v2.compile(df) is not v2.compile(df)
