"""Numeric keyword parity — ports the table-driven cases of
/root/reference/rules/number_test.go and the Validator-effective `minimum`
binding (rules/rule.go:109-141)."""

from tests.conftest import run_column_spec


def test_minimum_messages(spark):
    # Validator binding: rule.go:135 "value %v is less than minimum %v"
    out = run_column_spec(spark, "double", [18.0, 17.9, 18.1, None], {"minimum": 18})
    assert out[0] is None
    assert out[1]["message"] == "value 17.9 is less than minimum 18"
    assert out[1]["tag"] == "minimum"
    assert out[1]["path"] == "$.v"
    assert out[2] is None
    assert out[3] is None  # absent value: keyword skipped


def test_minimum_whole_float_message_renders_go_style(spark):
    out = run_column_spec(spark, "double", [5.0], {"minimum": 10.0})
    # Go %v prints float64(5) as "5" and float64(10) as "10"
    assert out[0]["message"] == "value 5 is less than minimum 10"


def test_maximum(spark):
    out = run_column_spec(spark, "double", [99.0, 100.0, 100.5], {"maximum": 100})
    assert out[0] is None and out[1] is None
    assert out[2]["message"] == "greater than maximum 100"  # number.go:47
    assert out[2]["param"] == "100"
    assert out[2]["tag"] == "maximum"


def test_exclusive_minimum(spark):
    out = run_column_spec(spark, "double", [5.0, 5.1], {"exclusiveMinimum": 5})
    assert out[0]["message"] == "less than or equal to exclusive minimum 5"
    assert out[0]["param"] == "5"
    assert out[1] is None


def test_exclusive_maximum(spark):
    out = run_column_spec(spark, "double", [5.0, 4.9], {"exclusiveMaximum": 5})
    assert out[0]["message"] == "greater than or equal to exclusive maximum 5"
    assert out[1] is None


def test_multiple_of_epsilon(spark):
    # number.go:109-110 — ratio tolerance 1e-10, exercised with float noise
    vals = [10.0, 10.0000000000001, 7.5, 0.3]
    out = run_column_spec(spark, "double", vals, {"multipleOf": 2.5})
    assert out[0] is None
    assert out[1] is None  # within 1e-10 ratio tolerance
    assert out[2] is None
    assert out[3] is not None
    assert out[3]["message"] == "value 0.3 is not a multiple of 2.5"
    assert out[3]["param"] == "2.5"


def test_multiple_of_integers(spark):
    out = run_column_spec(spark, "bigint", [9, 10], {"multipleOf": 3})
    assert out[0] is None
    assert out[1]["message"] == "value 10 is not a multiple of 3"


def test_numeric_string_coercion(spark):
    # toFloat64 accepts numeric strings (rules/utils.go:19-61)
    out = run_column_spec(spark, "string", ["17", "19"], {"minimum": 18})
    assert out[0] is not None and out[1] is None


def test_spec_errors(spark):
    import pytest

    from jsonschema_validator_spark import SpecError

    with pytest.raises(SpecError, match="minimum must be a number"):
        run_column_spec(spark, "double", [1.0], {"minimum": "x"})
    with pytest.raises(SpecError, match="multipleOf must be a positive number"):
        run_column_spec(spark, "double", [1.0], {"multipleOf": 0})
