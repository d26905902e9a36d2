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
