"""Object keyword parity — ports /root/reference/rules/object_*_test.go:
required, properties recursion, minProperties/maxProperties,
patternProperties, additionalProperties (bool + schema form), dependencies
(array + schema form), over nested struct AND map columns."""

import pytest
from pyspark.sql.types import StructType

from jsonschema_validator_spark import Spec, SpecError
from tests.conftest import run_column_spec

STRUCT_DT = "struct<name:string,age:double,email:string>"


def test_required_on_nested_struct(spark):
    spec = {"required": ["name", "age"]}
    cases = [
        {"name": "a", "age": 3.0, "email": None},
        {"name": None, "age": 3.0, "email": None},
        None,  # object itself absent → skipped
    ]
    out = run_column_spec(spark, STRUCT_DT, cases, spec)
    assert out[0] is None
    assert out[1]["message"] == "required property 'name' is missing"  # rule.go:100
    assert out[1]["tag"] == "required"
    assert out[1]["path"] == "$.v.name"
    assert out[2] is None


def test_properties_recursion_nested_path(spark):
    spec = {"properties": {"age": {"minimum": 18}, "name": {"minLength": 2}}}
    cases = [
        {"name": "ab", "age": 20.0, "email": None},
        {"name": "ab", "age": 17.0, "email": None},
        {"name": "x", "age": 20.0, "email": None},
        {"name": None, "age": None, "email": None},  # absent props skipped
    ]
    out = run_column_spec(spark, STRUCT_DT, cases, spec)
    assert out[0] is None
    assert out[1]["path"] == "$.v.age"
    assert out[1]["message"] == "value 17 is less than minimum 18"
    assert out[2]["path"] == "$.v.name"
    assert out[2]["tag"] == "minLength"
    assert out[3] is None


def test_min_max_properties_on_map(spark):
    spec = {"minProperties": 2, "maxProperties": 3}
    cases = [
        {"a": "1"},
        {"a": "1", "b": "2"},
        {"a": "1", "b": "2", "c": "3", "d": "4"},
    ]
    out = run_column_spec(spark, "map<string,string>", cases, spec)
    assert out[0]["message"] == (
        "object has 1 properties, which is less than minProperties 2"
    )  # object_constraints.go:37
    assert out[0]["param"] == "2"
    assert out[1] is None
    assert out[2]["message"] == (
        "object has 4 properties, which is more than maxProperties 3"
    )  # object_constraints.go:74


def test_min_properties_rejects_bad_value():
    with pytest.raises(SpecError, match="minProperties must be a non-negative integer"):
        Spec({"properties": {"v": {"minProperties": -1}}}).compile(
            StructType.fromDDL("v map<string,string>")
        )


def test_pattern_properties_on_struct(spark):
    # static keys: matches resolved at compile time
    spec = {"patternProperties": {"^(name|email)$": {"minLength": 3}}}
    cases = [
        {"name": "abc", "age": 1.0, "email": "abcd"},
        {"name": "ab", "age": 1.0, "email": "abcd"},
    ]
    out = run_column_spec(spark, STRUCT_DT, cases, spec)
    assert out[0] is None
    assert out[1]["tag"] == "minLength"
    assert out[1]["path"] == "$.v.name"


def test_pattern_properties_on_map(spark):
    spec = {"patternProperties": {"^x_": {"pattern": "^[0-9]+$"}}}
    cases = [
        {"x_a": "123", "other": "zzz"},
        {"x_a": "123", "x_b": "nope"},
    ]
    out = run_column_spec(spark, "map<string,string>", cases, spec)
    assert out[0] is None  # non-matching key 'other' not validated
    assert out[1]["message"] == "property validation failed for keyword 'pattern'"
    assert out[1]["value"] == "nope"


def test_pattern_properties_bad_regex_is_compile_error():
    with pytest.raises(SpecError, match="invalid pattern"):
        Spec({"properties": {"v": {"patternProperties": {"[": {"minLength": 1}}}}}).compile(
            StructType.fromDDL("v map<string,string>")
        )


def test_additional_properties_false_on_map(spark):
    spec = {
        "properties": {"a": {"minLength": 1}},
        "patternProperties": {"^x_": {"minLength": 1}},
        "additionalProperties": False,
    }
    cases = [
        {"a": "1", "x_q": "2"},
        {"a": "1", "rogue": "2"},
    ]
    out = run_column_spec(spark, "map<string,string>", cases, spec)
    assert out[0] is None
    assert out[1]["message"] == "additional properties are not allowed"
    assert out[1]["tag"] == "additionalProperties"
    assert "rogue" in out[1]["value"]


def test_additional_properties_schema_form_on_struct(spark):
    # undeclared struct fields must satisfy the additional schema
    spec = {
        "properties": {"name": {"minLength": 1}},
        "additionalProperties": {"type": "string"},
    }
    # age is double → fails {"type": "string"}; email is string → ok
    cases = [{"name": "a", "age": 1.0, "email": "e"}]
    out = run_column_spec(spark, STRUCT_DT, cases, spec)
    assert out[0]["message"] == (
        "additional property validation failed for keyword 'type'"
    )  # object_patterns.go:163
    assert out[0]["path"] == "$.v.age"


def test_dependencies_array_form(spark):
    spec = {"dependencies": {"credit_card": ["billing_address"]}}
    cases = [
        {"credit_card": "cc", "billing_address": "addr"},
        {"credit_card": "cc"},
        {"name": "no-trigger"},
    ]
    out = run_column_spec(spark, "map<string,string>", cases, spec)
    assert out[0] is None
    assert out[1]["message"] == (
        "property 'credit_card' depends on 'billing_address', but it is missing"
    )  # object_dependencies.go:64
    assert out[1]["tag"] == "dependencies"
    assert out[1]["param"] == "credit_card"
    assert out[2] is None  # trigger absent → dependency not checked


def test_dependencies_schema_form(spark):
    # when credit_card present, the OBJECT must also satisfy the schema
    spec = {"dependencies": {"credit_card": {"required": ["billing_address"]}}}
    cases = [
        {"credit_card": "cc", "billing_address": "addr"},
        {"credit_card": "cc"},
        {"name": "no-trigger"},
    ]
    out = run_column_spec(spark, "map<string,string>", cases, spec)
    assert out[0] is None
    assert out[1]["message"] == (
        "dependency validation failed for property 'credit_card' "
        "with keyword 'required'"
    )  # object_dependencies.go:87
    assert out[2] is None


def test_dependencies_invalid_form_fails_rows(spark):
    spec = {"dependencies": {"p": 42}}
    out = run_column_spec(spark, "map<string,string>", [{"p": "x"}, {"q": "y"}], spec)
    assert out[0]["message"] == (
        "dependency for property 'p' must be an array or an object"
    )  # object_dependencies.go:97
    assert out[1] is None


def test_root_level_object_keywords_on_table_columns(spark):
    """The root spec describes the ROW OBJECT: table columns are the
    properties (SURVEY.md §1.4 — one DataFrame row == one instance)."""
    from jsonschema_validator_spark import Validator

    df = spark.createDataFrame(
        [(1, "ok"), (2, None)], schema="id int, name string"
    )
    res = Validator({"required": ["name"], "properties": {"name": {"minLength": 1}}}).validate(df)
    rows = res.violations(include=["id"]).collect()
    assert len(rows) == 1
    assert rows[0]["id"] == 2
    assert rows[0]["message"] == "required property 'name' is missing"
    assert rows[0]["path"] == "$.name"
