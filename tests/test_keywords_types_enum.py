"""`type` and `enum` keyword parity — ports /root/reference/rules/type_test.go
and the Validator-effective enum binding (rules/rule.go:144-167).

Quirks reproduced (SURVEY.md §7 risks 3-4):
- integer accepts whole floats (`v == float64(int(v))`, type.go:92-108)
- union type lists supported (type.go:23-47)
- enum ONLY accepts []string schema + string values; a non-string column
  fails every non-null row with "value must be a string" (rule.go:153)
"""

import pytest
from pyspark.sql.types import StructType

from jsonschema_validator_spark import Spec, SpecError
from tests.conftest import run_column_spec


def test_type_match_and_mismatch(spark):
    out = run_column_spec(spark, "string", ["hi", None], {"type": "number"})
    # static dtype mismatch → every non-null row fails with the reference's
    # single-type message (type.go:63)
    assert out[0]["message"] == "value is of type string, expected number"
    assert out[0]["tag"] == "type"
    assert out[1] is None


def test_type_integer_accepts_whole_floats(spark):
    # type.go:92-108: float with zero fractional part IS an integer
    out = run_column_spec(spark, "double", [3.0, 3.5, -2.0, None], {"type": "integer"})
    assert out[0] is None
    assert out[1]["tag"] == "type"
    assert out[2] is None
    assert out[3] is None


def test_type_union_list(spark):
    out = run_column_spec(
        spark, "double", [3.0, 3.5], {"type": ["integer", "boolean"]}
    )
    assert out[0] is None  # whole float matches integer
    assert out[1]["message"] == (
        "value type does not match any of the expected types: integer, boolean"
    )  # type.go:43


def test_type_number_accepts_any_numeric(spark):
    for dt, v in [("double", 1.0), ("int", 1), ("bigint", 1), ("float", 1.0)]:
        out = run_column_spec(spark, dt, [v], {"type": "number"})
        assert out[0] is None, dt


def test_type_bad_schema_value_is_compile_error():
    with pytest.raises(SpecError, match="must be a string or an array of strings"):
        Spec({"properties": {"v": {"type": 42}}}).compile(
            StructType.fromDDL("v string")
        )


def test_enum_string_membership(spark):
    out = run_column_spec(
        spark, "string", ["admin", "user", "root", None], {"enum": ["admin", "user"]}
    )
    assert out[0] is None and out[1] is None
    assert out[2]["message"] == "value must be one of: admin, user"  # rule.go:164
    assert out[2]["tag"] == "enum"
    assert out[2]["value"] == "root"
    assert out[3] is None


def test_enum_non_string_column_fails_rows(spark):
    # rule.go:150-155: enum validates STRING values only; numbers fail with
    # "value must be a string" (the reference never coerces here)
    out = run_column_spec(spark, "int", [1, None], {"enum": ["1", "2"]})
    assert out[0]["message"] == "value must be a string"
    assert out[1] is None


def test_enum_non_string_list_is_compile_error():
    # the effective enumValidator only accepts []string schema values —
    # JSON-form (mixed) enums error out (SURVEY.md §2.1 #11)
    with pytest.raises(SpecError, match="enum"):
        Spec({"properties": {"v": {"enum": [1, 2]}}}).compile(
            StructType.fromDDL("v string")
        )


def test_warn_mode_equals_loose(spark):
    """ModeWarn is declared but NEVER branched on in the reference — every
    mode check is ``== ModeStrict`` (validator.go:507, 806; schema.go:278,
    286) — so warn behaves exactly like loose: unknown keywords are skipped
    AND violations still fail verdicts (round-4 parity fix; warn no longer
    flips pass=true)."""
    from jsonschema_validator_spark import Validator

    df = spark.createDataFrame([("z",)], schema="v string")
    spec = {"properties": {"v": {"enum": ["a"], "frobnicate": 1}}}
    warn_rows = Validator(Spec(spec, mode="warn")).validate(df).verdicts().collect()
    loose_rows = Validator(Spec(spec, mode="loose")).validate(df).verdicts().collect()
    key = lambda r: (r["rule_id"], r["tag"], r["n_checked"], r["n_failed"], r["pass"])
    assert sorted(map(key, warn_rows)) == sorted(map(key, loose_rows))
    # the unknown keyword was skipped (no 'frobnicate' rule), violations fail
    assert all(r["tag"] != "frobnicate" for r in warn_rows)
    assert any(r["n_failed"] > 0 and not r["pass"] for r in warn_rows)


def test_non_fatal_verdicts_option(spark):
    """The old warn-mode behavior (count failures but never flip pass) is an
    engine-native feature behind ``non_fatal_verdicts=True`` — deliberately
    NOT tied to a reference mode the reference never implemented."""
    from jsonschema_validator_spark import Validator

    df = spark.createDataFrame([("z",)], schema="v string")
    res = Validator(
        {"properties": {"v": {"enum": ["a"]}}}, non_fatal_verdicts=True
    ).validate(df)
    rows = res.verdicts().collect()
    assert all(r["pass"] for r in rows)
    assert any(r["n_failed"] > 0 for r in rows)  # failures still counted


def test_loose_mode_skips_unknown_keywords(spark):
    from jsonschema_validator_spark import Validator

    spec = {"properties": {"v": {"frobnicate": 1, "minLength": 2}}}
    with pytest.raises(SpecError, match="unknown keyword 'frobnicate'"):
        Spec(spec, mode="strict")
    df = spark.createDataFrame([("x",)], schema="v string")
    res = Validator(Spec(spec, mode="loose")).validate(df)
    rows = res.violations().collect()
    assert len(rows) == 1 and rows[0]["tag"] == "minLength"
