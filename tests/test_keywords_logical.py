"""Logical-composition keyword parity — ports the table-driven cases of
/root/reference/rules/logical_rules_test.go and conditional_rules_test.go.

Semantics under test (SURVEY.md §2.1 #25-30):
- allOf: all sub-schemas pass; first failing (index, keyword) reported
  (logical_rules.go:80-89).
- anyOf: >=1 passes (:167); oneOf: exactly 1 (:234, :250).
- not: sub-schema must fail (:297).
- conditional {if,then,else}: the WORKING conditional (conditional_rules.go:
  134-245); standalone if/then/else are NO-OPS (:52-53, :64-67, :103-106).
"""

import pytest
from pyspark.sql.types import StructType

from jsonschema_validator_spark import Spec, SpecError
from tests.conftest import run_column_spec


def _compile(colspec):
    """Compile-time errors surface at Spec.compile, mirroring Schema.Compile
    (reference raises there, not at Parse — schema.go:61-297)."""
    schema = StructType.fromDDL("v double")
    return Spec({"properties": {"v": colspec}}).compile(schema)


def test_allof_pass_and_first_failure_attribution(spark):
    spec = {"allOf": [{"minimum": 0}, {"maximum": 10}]}
    out = run_column_spec(spark, "double", [5.0, -1.0, 11.0, None], spec)
    assert out[0] is None
    # first failing sub-schema is index 0 / keyword minimum
    assert out[1]["message"] == (
        "failed to validate against schema at allOf[0] for keyword 'minimum'"
    )
    assert out[1]["tag"] == "allOf"
    assert out[1]["path"] == "$.v"
    # value passes allOf[0], fails allOf[1] → index 1 / maximum
    assert out[2]["message"] == (
        "failed to validate against schema at allOf[1] for keyword 'maximum'"
    )
    assert out[3] is None  # absent value: keyword predicates skip nulls


def test_allof_empty_is_compile_error():
    with pytest.raises(SpecError, match="allOf cannot be empty"):
        _compile({"allOf": []})


def test_allof_non_array_is_compile_error():
    with pytest.raises(SpecError, match="allOf must be an array"):
        _compile({"allOf": {"minimum": 1}})


def test_anyof(spark):
    spec = {"anyOf": [{"maximum": 0}, {"minimum": 10}]}
    out = run_column_spec(spark, "double", [-5.0, 15.0, 5.0], spec)
    assert out[0] is None and out[1] is None
    assert out[2]["message"] == "value does not match any schema in anyOf"
    assert out[2]["tag"] == "anyOf"


def test_anyof_empty_is_compile_error():
    with pytest.raises(SpecError, match="anyOf cannot be empty"):
        _compile({"anyOf": []})


def test_oneof_exactly_one(spark):
    spec = {"oneOf": [{"maximum": 5}, {"minimum": 3}]}
    # 1.0 matches only maximum, 9.0 only minimum, 4.0 both, none matches neither
    out = run_column_spec(spark, "double", [1.0, 9.0, 4.0], spec)
    assert out[0] is None and out[1] is None
    assert out[2]["message"] == "value matches more than one schema in oneOf"
    assert out[2]["tag"] == "oneOf"


def test_oneof_zero_matches(spark):
    spec = {"oneOf": [{"minimum": 10}, {"minimum": 20}]}
    out = run_column_spec(spark, "double", [5.0], spec)
    assert out[0]["message"] == "value does not match any schema in oneOf"


def test_not(spark):
    spec = {"not": {"minimum": 10}}
    out = run_column_spec(spark, "double", [5.0, 15.0], spec)
    assert out[0] is None
    assert out[1]["message"] == "value must not validate against the schema in not"
    assert out[1]["tag"] == "not"


def test_not_empty_is_compile_error():
    with pytest.raises(SpecError, match="not schema cannot be empty"):
        _compile({"not": {}})


def test_conditional_then_else(spark):
    # if v >= 10 then v <= 20 else v >= 0
    spec = {
        "conditional": {
            "if": {"minimum": 10},
            "then": {"maximum": 20},
            "else": {"minimum": 0},
        }
    }
    out = run_column_spec(spark, "double", [15.0, 25.0, 5.0, -5.0], spec)
    assert out[0] is None
    assert out[1]["message"] == (
        "validation failed against then schema for keyword 'maximum'"
    )
    assert out[1]["tag"] == "conditional"
    assert out[2] is None
    assert out[3]["message"] == (
        "validation failed against else schema for keyword 'minimum'"
    )


def test_conditional_missing_branch_passes(spark):
    spec = {"conditional": {"if": {"minimum": 10}, "then": {"maximum": 20}}}
    # else branch absent → values failing `if` pass vacuously
    out = run_column_spec(spark, "double", [-99.0, 30.0], spec)
    assert out[0] is None
    assert out[1]["tag"] == "conditional"


def test_conditional_requires_if_object():
    with pytest.raises(SpecError, match="if must be an object"):
        _compile({"conditional": {"if": "nope"}})


def test_standalone_if_then_else_are_noops(spark):
    # conditional_rules.go:52-53: the if result is stored in a discarded
    # context, so standalone then/else always pass. Do NOT give these
    # semantics the reference lacks (SURVEY.md §7 risk 3).
    spec = {"if": {"minimum": 10}, "then": {"maximum": 5}, "else": {"maximum": 5}}
    out = run_column_spec(spark, "double", [50.0, 1.0], spec)
    assert out[0] is None and out[1] is None


def test_zero_check_spec_verdicts_and_violations_are_empty(spark):
    # a spec compiling to ZERO checks (annotation-only keywords) must yield
    # empty frames with stable schemas from BOTH views — verdicts()
    # previously raised on F.array() of no entries (array<null> extraction)
    from jsonschema_validator_spark import Validator

    df = spark.createDataFrame([(1.0,), (2.0,)], "a double")
    res = Validator({"properties": {"a": {"title": "x"}}}).validate(df)
    assert res.violations().count() == 0
    v = res.verdicts()
    assert v.count() == 0
    assert [f.name for f in v.schema] == [
        "rule_id", "tag", "n_checked", "n_failed", "pass",
    ]
    vp = res.verdicts(partition_by="a", use_spark_partition_id=True)
    assert vp.count() == 0
    assert [f.name for f in vp.schema] == [
        "a", "partition_id", "rule_id", "tag", "n_checked", "n_failed", "pass",
    ]


def test_nested_logical_composition(spark):
    # allOf of anyOf — composite predicates stay pure Column algebra
    spec = {
        "allOf": [
            {"anyOf": [{"maximum": 0}, {"minimum": 10}]},
            {"not": {"minimum": 100}},
        ]
    }
    out = run_column_spec(spark, "double", [-1.0, 50.0, 5.0, 150.0], spec)
    assert out[0] is None and out[1] is None
    assert out[2]["message"] == (
        "failed to validate against schema at allOf[0] for keyword 'anyOf'"
    )
    assert out[3]["message"] == (
        "failed to validate against schema at allOf[1] for keyword 'not'"
    )


class TestStrictSubschemaScreening:
    """Review fix: strict-mode unknown-keyword screening recursed only
    into `properties` — typos inside items / patternProperties /
    dependencies(schema) / additionalProperties sub-schemas compiled
    cleanly and the constraint silently never ran. The reference
    sub-compiles exactly those keywords with the parent's mode
    (schema.go:136-261); logical-composition keywords are deliberately
    NOT screened (the reference stores them without sub-Compile)."""

    def test_typo_inside_items_fails_strict(self):
        import pytest as _pytest

        from jsonschema_validator_spark.rules.base import SpecError
        from jsonschema_validator_spark.spec import Spec

        for sub in (
            {"items": {"minLenght": 3}},
            {"items": [{"type": "string"}, {"minLenght": 3}]},
            {"patternProperties": {"^x": {"minLenght": 3}}},
            {"dependencies": {"a": {"minLenght": 3}}},
            {"additionalProperties": {"minLenght": 3}},
        ):
            with _pytest.raises(SpecError, match="minLenght"):
                Spec({"properties": {"a": sub}})

    def test_loose_mode_still_tolerates(self):
        from jsonschema_validator_spark.spec import Spec

        Spec({"properties": {"a": {"items": {"minLenght": 3}}}}, mode="loose")

    def test_logical_subschemas_not_screened_reference_parity(self):
        from jsonschema_validator_spark.spec import Spec

        # the reference never sub-compiles allOf/anyOf/oneOf/not, so a
        # typo there is NOT a strict compile error (parity, not a bug)
        Spec({"properties": {"a": {"allOf": [{"minLenght": 3}]}}})


class TestModeHandling:
    def test_embedded_mode_honored_and_conflicts_raise(self):
        import pytest as _pytest

        from jsonschema_validator_spark.rules.base import SpecError
        from jsonschema_validator_spark.spec import Spec

        # embedded loose mode tolerates unknown keywords
        Spec({"mode": "loose", "properties": {"a": {"zzz": 1}}})
        with _pytest.raises(SpecError, match="conflicting"):
            Spec({"mode": "loose", "properties": {}}, mode="strict")
        with _pytest.raises(SpecError, match="invalid mode"):
            Spec({"properties": {}}, mode="sloppy")

    def test_validator_rejects_conflicting_mode_for_prebuilt_spec(self):
        import pytest as _pytest

        from jsonschema_validator_spark import Spec, Validator
        from jsonschema_validator_spark.rules.base import SpecError

        s = Spec({"properties": {"a": {"minimum": 1}}}, mode="strict")
        Validator(s)  # no mode: fine
        Validator(s, mode="strict")  # matching: fine
        with _pytest.raises(SpecError, match="conflicting"):
            Validator(s, mode="loose")
        # same error contract as the Spec path (ADVICE r4): an invalid
        # mode string is a SpecError, never a bare ValueError
        with _pytest.raises(SpecError, match="invalid mode"):
            Validator(s, mode="bogus")
