"""Format predicate parity — rules/format_test.go:11-116 and
rules/utils_test.go:120-153 (TestFormatValidators table, ported verbatim)."""

import pytest

from tests.conftest import run_column_spec

# (format, input, expected_valid) — utils_test.go:120-147
FORMAT_TABLE = [
    ("email", "test@example.com", True),
    ("email", "invalid", False),
    ("date-time", "2023-10-05T14:30:00Z", True),
    ("date-time", "2023-13-01", False),
    ("date", "2023-10-05", True),
    ("date", "2023-10-32", False),
    ("time", "14:30:00", True),
    ("time", "25:00:00", False),
    ("uri", "https://example.com", True),
    ("uri", "://invalid", False),
    ("hostname", "example.com", True),
    ("hostname", "invalid..com", False),
    ("ipv4", "192.168.1.1", True),
    ("ipv4", "256.1.2.3", False),
    ("ipv6", "2001:db8::1", True),
    ("ipv6", "2001::db8::1", False),
    ("uuid", "123e4567-e89b-12d3-a456-426614174000", True),
    ("uuid", "invalid-uuid", False),
]


@pytest.mark.parametrize("fmt,value,valid", FORMAT_TABLE)
def test_format_table(spark, fmt, value, valid):
    out = run_column_spec(spark, "string", [value], {"format": fmt})
    if valid:
        assert out[0] is None, f"{fmt}({value!r}) should be valid, got {out[0]}"
    else:
        assert out[0] is not None, f"{fmt}({value!r}) should be invalid"
        assert out[0]["message"] == f"invalid {fmt} format"  # format.go:73
        assert out[0]["tag"] == "format"
        assert out[0]["param"] == fmt


def test_unknown_format_strict_vs_loose(spark):
    # format.go:54-66
    out = run_column_spec(spark, "string", ["test"], {"format": "unknown"}, mode="strict")
    assert out[0]["message"] == "unknown format: unknown"
    out = run_column_spec(spark, "string", ["test"], {"format": "unknown"}, mode="loose")
    assert out[0] is None


def test_format_on_non_string_value(spark):
    out = run_column_spec(spark, "bigint", [123], {"format": "email"})
    assert out[0]["message"] == "value must be a string"  # format.go:44-49


def test_custom_format_registration(spark):
    # RegisterFormatValidator analogue (format.go:84-88)
    from pyspark.sql import functions as F

    from jsonschema_validator_spark.rules.formats import register_format_validator

    register_format_validator("even-length", lambda c: F.octet_length(c) % 2 == 0)
    out = run_column_spec(spark, "string", ["ab", "abc"], {"format": "even-length"})
    assert out[0] is None
    assert out[1]["message"] == "invalid even-length format"


def test_more_edge_cases(spark):
    # extra pins on Go stdlib parity
    table = [
        ("ipv4", "01.2.3.4", False),  # Go≥1.17 rejects leading zeros
        ("ipv4", "0.0.0.0", True),
        ("uuid", "123E4567-E89B-12D3-A456-426614174000", True),  # lowercased first
        ("date-time", "2023-10-05T14:30:00+08:00", True),
        ("date-time", "2023-10-05 14:30:00Z", False),  # missing 'T'
        ("time", "23:59:59", True),
        ("hostname", "a" * 256, False),  # len > 255
        ("uri", "/rooted/path", True),  # url.ParseRequestURI accepts rooted paths
        ("uri", "no-scheme-no-slash", False),
    ]
    for fmt, value, valid in table:
        out = run_column_spec(spark, "string", [value], {"format": fmt})
        assert (out[0] is None) == valid, f"{fmt}({value!r}) expected valid={valid}"
