"""Error-formatting parity — ports /root/reference/errors/
error_messages_test.go:9-93 and errors_test.go (Simple/Detailed/JSON modes,
ValidationErrorMap grouping). Pure driver-side (no Spark session needed)."""

from jsonschema_validator_spark.errors import (
    DETAILED,
    JSON_MODE,
    SIMPLE,
    format_errors,
    format_errors_by_field,
)

BASIC = {
    "path": "user.name",
    "message": "must be at least 3 characters",
    "tag": "minLength",
    "value": "Jo",
    "param": "3",
}


def test_simple_format():
    assert format_errors([BASIC], SIMPLE) == "must be at least 3 characters"
    assert format_errors([], SIMPLE) == ""


def test_detailed_format():
    out = format_errors([BASIC], DETAILED)
    # errors.go:43 line inside the :50-63 wrapper
    assert "validation error: must be at least 3 characters (path: user.name)" in out
    assert out.startswith("validation failed with the following errors:\n[1] ")


def test_json_format_field_order_and_omitempty():
    out = format_errors([BASIC], JSON_MODE)
    assert out == (
        '[{"path":"user.name","message":"must be at least 3 characters",'
        '"value":"Jo","tag":"minLength","param":"3"}]'
    )
    # omitempty: empty value/param dropped (error_messages_test.go:51-53)
    out2 = format_errors(
        [{"path": "user.email", "message": "required property is missing",
          "tag": "required", "value": None, "param": ""}],
        JSON_MODE,
    )
    assert out2 == (
        '[{"path":"user.email","message":"required property is missing",'
        '"tag":"required"}]'
    )
    assert format_errors([], JSON_MODE) == "[]"


def test_multiple_errors_numbering():
    rows = [BASIC, {"path": "p2", "message": "m2", "tag": "t", "value": "", "param": ""}]
    out = format_errors(rows, DETAILED)
    assert "[1] validation error: must be at least 3 characters" in out
    assert "[2] validation error: m2 (path: p2)" in out


def test_error_map_grouping():
    rows = [
        {"path": "a", "message": "m1", "tag": "", "value": "", "param": ""},
        {"path": "a", "message": "m2", "tag": "", "value": "", "param": ""},
        {"path": "b", "message": "m3", "tag": "", "value": "", "param": ""},
    ]
    out = format_errors_by_field(rows)
    assert out.startswith("validation failed for the following fields:\n")
    assert "Field 'a':\n  [1] m1\n  [2] m2" in out
    assert "Field 'b':\n  [1] m3" in out


def test_unknown_mode_falls_back_to_detailed():
    assert format_errors([BASIC], "bogus") == format_errors([BASIC], DETAILED)
