"""Struct-tag front-end parity — parseTag (validator.go:577-615) and the
Struct()/Var() path (validator.go:134-265)."""

from jsonschema_validator_spark import Validator, parse_tag, spec_from_tags


def test_parse_tag_table():
    # validator.go:585-606 semantics
    assert parse_tag("required") == {"required": True}
    assert parse_tag("required,minimum=18") == {"required": True, "minimum": 18}
    assert parse_tag("minimum=1.5,maxLength=10") == {"minimum": 1.5, "maxLength": 10}
    assert parse_tag("enum=admin|user|guest") == {"enum": ["admin", "user", "guest"]}
    assert parse_tag("pattern=^a.b$") == {"pattern": "^a.b$"}
    assert parse_tag("") == {}
    # numeric coercion applies ONLY to the six numeric keys (validator.go:
    # 595-601); type/pattern/format/unknown keep the raw string (:602-608)
    assert parse_tag("pattern=123") == {"pattern": "123"}
    assert parse_tag("format=42") == {"format": "42"}
    assert parse_tag("type=7") == {"type": "7"}
    assert parse_tag("custom=9") == {"custom": "9"}
    assert parse_tag("min=3,max=4.5,minLength=2,maxLength=8") == {
        "min": 3,
        "max": 4.5,
        "minLength": 2,
        "maxLength": 8,
    }
    # non-numeric literal for a numeric key stays the raw string (:600)
    assert parse_tag("minimum=abc") == {"minimum": "abc"}


def test_tag_spec_validates_dataframe(spark):
    spec = spec_from_tags(
        {
            "age": "required,minimum=18,maximum=120",
            "role": "enum=admin|user",
            "name": "minLength=2",
        }
    )
    df = spark.createDataFrame(
        [
            (25.0, "admin", "ok"),
            (15.0, "user", "ok"),     # minimum violation
            (30.0, "root", "ok"),     # enum violation
            (None, "admin", "x"),     # required + minLength violations
        ],
        "age double, role string, name string",
    )
    rows = Validator(spec).validate(df).violations().collect()
    tags = sorted(r["tag"] for r in rows)
    assert tags == ["enum", "minLength", "minimum", "required"]
    msgs = {r["tag"]: r["message"] for r in rows}
    assert msgs["minimum"] == "value 15 is less than minimum 18"
    assert msgs["required"] == "required property 'age' is missing"
    assert msgs["enum"] == "value must be one of: admin, user"
