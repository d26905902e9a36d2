"""Array keyword parity — ports /root/reference/rules/array_test.go table
cases (items object + tuple forms, minItems, maxItems, uniqueItems)."""

import pytest
from pyspark.sql.types import StructType

from jsonschema_validator_spark import Spec, SpecError
from tests.conftest import run_column_spec


def test_items_object_form_first_failing_element(spark):
    spec = {"items": {"minimum": 10}}
    out = run_column_spec(
        spark, "array<double>", [[10.0, 11.0], [10.0, 3.0, 2.0], None, []], spec
    )
    assert out[0] is None
    # first failing element is index 1 → path $.v[1], value "3.0"
    assert out[1]["message"] == "array item validation failed for keyword 'minimum'"
    assert out[1]["tag"] == "minimum"  # Tag is the failing keyword (array.go:70)
    assert out[1]["path"] == "$.v[1]"
    assert out[1]["value"] == "3.0"
    assert out[2] is None  # null array: skipped
    assert out[3] is None  # empty array: vacuously valid


def test_items_tuple_form(spark):
    # element 0 must be >= 10, element 1 <= 5; extra + missing elements ignored
    spec = {"items": [{"minimum": 10}, {"maximum": 5}]}
    cases = [
        [10.0, 5.0, 999.0],  # valid, extra element ignored (array.go:77-120)
        [9.0, 5.0],          # element 0 fails
        [10.0, 6.0],         # element 1 fails
        [10.0],              # missing element 1 skipped (array.go:80-83)
    ]
    out = run_column_spec(spark, "array<double>", cases, spec)
    assert out[0] is None
    assert out[1]["path"] == "$.v[0]"
    assert out[1]["message"] == "array item validation failed for keyword 'minimum'"
    assert out[2]["path"] == "$.v[1]"
    assert out[2]["tag"] == "maximum"
    assert out[3] is None


def test_min_max_items(spark):
    spec = {"minItems": 2, "maxItems": 3}
    out = run_column_spec(
        spark, "array<int>", [[1], [1, 2], [1, 2, 3], [1, 2, 3, 4]], spec
    )
    assert out[0]["message"] == "fewer items than minimum 2"  # array.go:145
    assert out[0]["param"] == "2"
    assert out[0]["tag"] == "minItems"
    assert out[1] is None and out[2] is None
    assert out[3]["message"] == "more items than maximum 3"  # array.go:161
    assert out[3]["param"] == "3"


def test_min_items_rejects_negative():
    with pytest.raises(SpecError, match="minItems must be a non-negative integer"):
        Spec({"properties": {"v": {"minItems": -1}}}).compile(
            StructType.fromDDL("v array<int>")
        )


def test_unique_items(spark):
    spec = {"uniqueItems": True}
    out = run_column_spec(
        spark, "array<string>", [["a", "b"], ["a", "b", "a"], []], spec
    )
    assert out[0] is None
    assert out[1]["message"] == "contains duplicate items"  # array.go:182
    assert out[1]["tag"] == "uniqueItems"
    assert out[2] is None


def test_unique_items_false_is_noop(spark):
    out = run_column_spec(spark, "array<string>", [["a", "a"]], {"uniqueItems": False})
    assert out[0] is None


def test_unique_items_non_bool_is_compile_error():
    with pytest.raises(SpecError, match="uniqueItems must be a boolean"):
        Spec({"properties": {"v": {"uniqueItems": "yes"}}}).compile(
            StructType.fromDDL("v array<int>")
        )


def test_items_on_non_array_column_fails_per_row(spark):
    # static type mismatch surfaces as the reference's runtime error shape
    # ("items can only be applied to arrays", array.go:25) on every row
    out = run_column_spec(spark, "string", ["x", None], {"items": {"minLength": 1}})
    assert out[0]["message"] == "items can only be applied to arrays"
    assert out[0]["tag"] == "items"
    assert out[1] is None


def test_items_nested_string_rules(spark):
    spec = {"items": {"minLength": 2, "pattern": "^[a-z]+$"}}
    out = run_column_spec(
        spark, "array<string>", [["ab", "cd"], ["ab", "x"], ["ab", "C9"]], spec
    )
    assert out[0] is None
    assert out[1]["tag"] == "minLength"
    assert out[1]["path"] == "$.v[1]"
    assert out[2]["tag"] == "pattern"
