"""String/enum keyword parity — rules/string_test.go, rule.go:144-167."""

import pytest

from tests.conftest import run_column_spec


def test_min_length(spark):
    out = run_column_spec(spark, "string", ["abc", "ab", ""], {"minLength": 3})
    assert out[0] is None
    assert out[1]["message"] == "length less than minimum 3"  # string.go:30
    assert out[1]["param"] == "3"
    assert out[2] is not None


def test_min_length_counts_bytes_not_chars(spark):
    # Go len() is bytes (string.go:29): "héllo" is 6 bytes, 5 chars
    out = run_column_spec(spark, "string", ["héllo"], {"minLength": 6})
    assert out[0] is None


def test_max_length(spark):
    out = run_column_spec(spark, "string", ["abc", "abcd"], {"maxLength": 3})
    assert out[0] is None
    assert out[1]["message"] == "length greater than maximum 3"  # string.go:46
    assert out[1]["param"] == "3"


def test_pattern(spark):
    out = run_column_spec(spark, "string", ["abc123", "123abc"], {"pattern": "^[a-z]+[0-9]+$"})
    assert out[0] is None
    assert out[1]["message"] == "does not match pattern ^[a-z]+[0-9]+$"  # string.go:66
    assert out[1]["param"] == "^[a-z]+[0-9]+$"


def test_invalid_pattern_rejected_at_compile(spark):
    from jsonschema_validator_spark import SpecError

    with pytest.raises(SpecError, match="invalid pattern"):
        run_column_spec(spark, "string", ["x"], {"pattern": "[unclosed"})


def test_enum(spark):
    out = run_column_spec(spark, "string", ["val1", "val3", None], {"enum": ["val1", "val2"]})
    assert out[0] is None
    # rule.go:164
    assert out[1]["message"] == "value must be one of: val1, val2"
    assert out[1]["tag"] == "enum"
    assert out[2] is None


def test_enum_non_string_schema_rejected(spark):
    from jsonschema_validator_spark import SpecError

    # reference: enum only accepts []string (rule.go:145-147); JSON-form
    # mixed enums error out — replicated as a compile error
    with pytest.raises(SpecError, match="enum must be an array of strings"):
        run_column_spec(spark, "string", ["x"], {"enum": [1, 2]})


def test_enum_non_string_value(spark):
    out = run_column_spec(spark, "bigint", [7], {"enum": ["a"]})
    assert out[0]["message"] == "value must be a string"  # rule.go:153
