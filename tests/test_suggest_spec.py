"""Spec bootstrap (suggest.suggest_spec): profile a corpus -> spec dict ->
the existing Validator compiles it and — by construction — passes on the
corpus it was profiled from. Emits ONLY reference-defined keywords."""

import pytest
from pyspark.sql import functions as F

import jsonschema_validator_spark as jsv
from jsonschema_validator_spark.suggest import (
    constraint_drift,
    spec_diff,
    spec_keyword_rows,
    suggest_spec,
)


class TestSuggestSpec:
    def test_roundtrip_lineitem(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        spec = suggest_spec(df)
        res = jsv.Validator(jsv.Spec(spec)).validate(df)
        assert res.summary()["valid"] is True
        # every no-null column pinned required; enums on the low-card flags
        assert "l_orderkey" in spec["required"]
        assert spec["properties"]["l_returnflag"]["enum"] == ["A", "N", "R"]
        assert spec["properties"]["l_linestatus"]["enum"] == ["F", "O"]
        assert spec["properties"]["l_quantity"]["minimum"] == 1.0
        assert spec["properties"]["l_quantity"]["maximum"] == 50.0
        # integral dtypes get the tighter claim
        assert spec["properties"]["l_orderkey"]["type"] == "integer"

    def test_roundtrip_documents_and_events(self, spark):
        for table in ("documents", "events"):
            df = spark.read.parquet(f"/root/testdata/sf0.001/{table}.parquet")
            spec = suggest_spec(df)
            res = jsv.Validator(jsv.Spec(spec)).validate(df)
            assert res.summary()["valid"] is True, table

    def test_nullable_not_required_and_all_null_type_only(self, spark):
        df = spark.createDataFrame(
            [(1, "a", None), (2, None, None), (3, "b", None)],
            "id int, s string, dead string",
        )
        spec = suggest_spec(df)
        assert spec["required"] == ["id"]
        # evidence exists for s (2 values) but not for the all-NULL column
        assert spec["properties"]["dead"] == {"type": "string"}
        assert spec["properties"]["s"]["minLength"] == 1
        # round-trip still passes (NULLs skip per-value keywords, as in the
        # reference: rules only check present values)
        res = jsv.Validator(jsv.Spec(spec)).validate(df)
        assert res.summary()["valid"] is True

    def test_enum_threshold_exact(self, spark):
        rows = [(i, f"v{i % 8}", f"w{i % 9}") for i in range(100)]
        df = spark.createDataFrame(rows, "id int, lo string, hi string")
        spec = suggest_spec(df, enum_max_distinct=8)
        assert spec["properties"]["lo"]["enum"] == sorted({f"v{i}" for i in range(8)})
        assert "enum" not in spec["properties"]["hi"]  # 9 > 8, exact decision

    def test_length_is_bytes(self, spark):
        df = spark.createDataFrame([("é",), ("ab",)], "s string")
        spec = suggest_spec(df, enum_max_distinct=0)
        # 'é' is 2 UTF-8 bytes — octet_length, the Go len(string) convention
        assert spec["properties"]["s"]["minLength"] == 2
        assert spec["properties"]["s"]["maxLength"] == 2

    def test_array_items_bounds(self, spark):
        df = spark.createDataFrame(
            [([1, 2],), ([1, 2, 3, 4],)], "a array<int>"
        )
        spec = suggest_spec(df)
        p = spec["properties"]["a"]
        assert p["type"] == "array"
        assert p["minItems"] == 2 and p["maxItems"] == 4

    def test_map_properties_bounds(self, spark):
        df = spark.createDataFrame(
            [({"a": 1},), ({"a": 1, "b": 2, "c": 3},)],
            "m map<string,int>",
        )
        spec = suggest_spec(df)
        p = spec["properties"]["m"]
        assert p["type"] == "object"
        assert p["minProperties"] == 1 and p["maxProperties"] == 3
        # round-trips through the engine's map accessors
        res = jsv.Validator(jsv.Spec(spec)).validate(df)
        assert res.summary()["valid"] is True

    def test_widen_numeric(self, spark):
        df = spark.createDataFrame([(0.0,), (10.0,)], "x double")
        p = suggest_spec(df, widen_numeric=0.1)["properties"]["x"]
        assert p["minimum"] == pytest.approx(-1.0)
        assert p["maximum"] == pytest.approx(11.0)

    def test_empty_dataframe_type_only(self, spark):
        """Zero rows = zero evidence: no required, no bounds, no enum —
        just the schema-derived types; the spec still compiles and passes
        trivially."""
        df = spark.createDataFrame([], "id int, s string, a array<int>")
        spec = suggest_spec(df)
        assert spec["required"] == []
        assert spec["properties"]["id"] == {"type": "integer"}
        assert spec["properties"]["s"] == {"type": "string"}
        assert spec["properties"]["a"] == {"type": "array"}
        res = jsv.Validator(jsv.Spec(spec)).validate(df)
        assert res.summary()["valid"] is True

    def test_nested_struct_subschema(self, spark):
        """Struct columns get a recursively suggested subschema; nested
        required follows parent-present semantics (NULL parent skips
        nested checks in the engine, so only null-under-present-parent
        blocks required); everything round-trips through the real
        compile+validate path."""
        rows = [
            ((("ab", 5.0), 1),),
            ((("cd", 9.0), None),),  # inner.extra nullable under present parent
            (None,),  # NULL parent — must not block nested required
        ]
        dt = (
            "v struct<inner: struct<name: string, score: double>, "
            "extra: int>"
        )
        df = spark.createDataFrame(rows, dt)
        spec = suggest_spec(df)
        p = spec["properties"]["v"]
        assert p["type"] == "object"
        # inner is never NULL when v is present -> required; extra is not
        assert p["required"] == ["inner"]
        inner = p["properties"]["inner"]
        assert inner["type"] == "object"
        assert sorted(inner["required"]) == ["name", "score"]
        assert inner["properties"]["name"]["minLength"] == 2
        assert inner["properties"]["name"]["maxLength"] == 2
        assert inner["properties"]["score"]["minimum"] == 5.0
        assert inner["properties"]["score"]["maximum"] == 9.0
        assert inner["properties"]["name"]["enum"] == ["ab", "cd"]
        res = jsv.Validator(jsv.Spec(spec)).validate(df)
        assert res.summary()["valid"] is True

    def test_nested_profile_is_still_one_pass(self, spark):
        """Nesting must not add scans: all levels ride the same single
        aggregate."""
        import contextlib, io, re

        df = spark.range(10).select(
            F.struct(
                F.col("id").cast("double").alias("x"),
                F.struct(F.lit("s").alias("s")).alias("deep"),
            ).alias("v")
        )
        # plan of the exact agg frame suggest_spec builds is internal; the
        # observable contract is ONE collect-triggering job per pass — use
        # the spec itself plus the scan count of an equivalent agg
        plan_df = df.agg(
            F.count(F.lit(1)).alias("_n"),
            F.count(F.col("v")).alias("nn__0"),
            F.min(F.col("v").getField("x")).cast("double").alias("min__1"),
            F.count(F.col("v").getField("deep").getField("s")).alias("nn__3"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan_df.explain("formatted")
        plan = buf.getvalue()
        assert len(re.findall(r"\(\d+\) Scan", plan)) <= 1
        spec = suggest_spec(df)
        assert spec["properties"]["v"]["properties"]["deep"]["properties"][
            "s"
        ]["enum"] == ["s"]

    def test_nested_max_depth_caps_recursion(self, spark):
        df = spark.range(3).select(
            F.struct(F.struct(F.lit(1).alias("b")).alias("a")).alias("v")
        )
        spec = suggest_spec(df, max_depth=1)
        assert spec["properties"]["v"] == {"type": "object"}
        spec2 = suggest_spec(df, max_depth=2)
        assert "properties" in spec2["properties"]["v"]
        assert spec2["properties"]["v"]["properties"]["a"] == {"type": "object"}

    def test_nested_diff_and_keyword_rows_use_dotted_paths(self, spark):
        old = _props(v={"type": "object", "required": ["x"],
                        "properties": {"x": {"type": "number",
                                             "maximum": 10.0}}})
        new = _props(v={"type": "object",
                        "properties": {"x": {"type": "number",
                                             "maximum": 8.0}}})
        got = {(r[0], r[1]): r[6] for r in spec_diff(old, new)}
        assert got[("v.x", "maximum")] == "tightened"
        assert got[("v.x", "required")] == "loosened"
        rows = spec_keyword_rows(old)
        assert ("v.x", "maximum", 10.0, None) in rows
        assert ("v.x", "required", None, "true") in rows

    def test_unknown_column_raises(self, spark):
        df = spark.createDataFrame([(1,)], "id int")
        with pytest.raises(ValueError, match="no such column"):
            suggest_spec(df, columns=["nope"])

    def test_profile_is_one_aggregate_pass(self, spark, tmp_path):
        """Pass 1 is ONE aggregate over one scan — the suggestion never
        scans per column."""
        import contextlib, io, re

        p = str(tmp_path / "t.parquet")
        spark.createDataFrame(
            [(i, float(i), "x" * (i % 3 + 1)) for i in range(50)],
            "id int, x double, s string",
        ).write.parquet(p)
        df = spark.read.parquet(p)
        # capture the plan of the same agg frame suggest_spec builds
        # (structure assertion only)
        plan_df = df.agg(
            F.count(F.lit(1)).alias("_n"),
            F.count("id").alias("nn__id"),
            F.min("x").cast("double").alias("min__x"),
            F.approx_count_distinct("s").alias("ad__s"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan_df.explain("formatted")
        plan = buf.getvalue()
        assert len(re.findall(r"\(\d+\) Scan parquet\b", plan)) == 1
        assert "partial" in plan.lower()  # map-side partial agg

    def test_keyword_rows_projection(self, spark):
        df = spark.createDataFrame([(1, "a")], "id int, s string")
        rows = spec_keyword_rows(suggest_spec(df))
        assert ("id", "type", None, "integer") in rows
        assert ("id", "required", None, "true") in rows
        assert ("id", "minimum", 1.0, None) in rows
        assert ("s", "enum", None, "a") in rows


def _props(**cols):
    return {"type": "object", "required": [], "properties": cols}


class TestSpecDiff:
    def test_identical_specs_diff_empty(self):
        s = _props(x={"type": "number", "minimum": 0.0, "maximum": 9.0})
        s["required"] = ["x"]
        assert spec_diff(s, s) == []

    def test_bound_directions(self):
        old = _props(x={"type": "number", "minimum": 0.0, "maximum": 10.0})
        new = _props(x={"type": "number", "minimum": 2.0, "maximum": 12.0})
        rows = {(r[1], r[6]) for r in spec_diff(old, new)}
        # lower bound rose -> tightened; upper bound rose -> loosened
        assert rows == {("minimum", "tightened"), ("maximum", "loosened")}

    def test_bound_appear_disappear(self):
        old = _props(x={"type": "number", "minimum": 0.0})
        new = _props(x={"type": "number", "maximum": 5.0})
        got = {r[1]: (r[2], r[3], r[6]) for r in spec_diff(old, new)}
        assert got["minimum"] == (0.0, None, "loosened")  # bound dropped
        assert got["maximum"] == (None, 5.0, "tightened")  # bound appeared

    def test_required_flip(self):
        old = _props(x={"type": "string"})
        new = _props(x={"type": "string"})
        new["required"] = ["x"]
        (r,) = spec_diff(old, new)
        assert r == ("x", "required", None, None, None, "true", "tightened")
        (r,) = spec_diff(new, old)
        assert r[6] == "loosened"

    def test_enum_subset_superset_changed(self):
        ab = _props(s={"type": "string", "enum": ["a", "b"]})
        abc = _props(s={"type": "string", "enum": ["a", "b", "c"]})
        bd = _props(s={"type": "string", "enum": ["b", "d"]})
        none = _props(s={"type": "string"})
        assert spec_diff(abc, ab)[0][6] == "tightened"
        assert spec_diff(ab, abc)[0][6] == "loosened"
        assert spec_diff(ab, bd)[0][6] == "changed"
        assert spec_diff(none, ab)[0][6] == "tightened"  # enum appeared
        assert spec_diff(ab, none)[0][6] == "loosened"  # enum dropped
        # values rendered as comma-joined sorted sets
        assert spec_diff(ab, bd)[0][4:6] == ("a,b", "b,d")

    def test_type_change_and_column_add(self):
        old = _props(x={"type": "number"})
        new = _props(
            x={"type": "string"}, y={"type": "integer", "minimum": 1.0}
        )
        got = {(r[0], r[1]): r[6] for r in spec_diff(old, new)}
        assert got[("x", "type")] == "changed"
        # new column: its type + bounds all appear as tightened additions
        assert got[("y", "type")] == "tightened"
        assert got[("y", "minimum")] == "tightened"

    def test_constraint_drift_end_to_end(self, spark):
        """The Spark operator: profile two snapshots, report the diff.
        Shrinking the value range + dropping an enum value tightens; the
        oracle-critical classification survives the real suggest path."""
        old_df = spark.createDataFrame(
            [(i, float(i % 50 + 1), ["A", "N", "R"][i % 3]) for i in range(300)],
            "id bigint, qty double, flag string",
        )
        new_df = old_df.filter((F.col("qty") <= 40) & (F.col("flag") != "R"))
        out = constraint_drift(old_df, new_df)
        assert out.columns == [
            "column", "keyword", "old_num", "new_num", "old_str", "new_str",
            "change",
        ]
        got = {(r["column"], r["keyword"]): r for r in out.collect()}
        qmax = got[("qty", "maximum")]
        assert (qmax["old_num"], qmax["new_num"], qmax["change"]) == (
            50.0, 40.0, "tightened",
        )
        fenum = got[("flag", "enum")]
        assert (fenum["old_str"], fenum["new_str"], fenum["change"]) == (
            "A,N,R", "A,N", "tightened",
        )
        # unchanged constraints emit nothing
        assert ("qty", "minimum") not in got
        assert ("id", "required") not in got

    def test_constraint_drift_no_drift_is_empty(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
        assert constraint_drift(df, df).count() == 0


# hypothesis strategies for arbitrary suggest-shaped specs
def _spec_strategy():
    from hypothesis import strategies as st

    bound = st.floats(-100, 100, allow_nan=False, allow_infinity=False)
    length = st.integers(0, 20)
    prop = st.fixed_dictionaries(
        {},
        optional={
            "type": st.sampled_from(["number", "integer", "string", "array"]),
            "minimum": bound,
            "maximum": bound,
            "minLength": length,
            "maxLength": length,
            "minItems": length,
            "maxItems": length,
            "enum": st.lists(
                st.sampled_from(list("abcdef")), max_size=4
            ).map(lambda xs: sorted(set(xs))),
        },
    )
    cols = st.sampled_from(["c1", "c2", "c3"])
    # one optional nesting level: an 'object' property carrying its own
    # required + properties subschema (the suggest_spec struct shape)
    nested = st.fixed_dictionaries(
        {
            "type": st.just("object"),
            "required": st.lists(cols, unique=True, max_size=2),
            "properties": st.dictionaries(cols, prop, max_size=2),
        }
    )
    return st.fixed_dictionaries(
        {
            "required": st.lists(cols, unique=True),
            "properties": st.dictionaries(cols, prop | nested, max_size=3),
        }
    )


class TestSpecDiffProperties:
    """Algebraic laws of spec_diff over arbitrary suggest-shaped specs."""

    def test_reflexive_diff_empty(self):
        from hypothesis import given, settings

        @settings(max_examples=200, deadline=None)
        @given(_spec_strategy())
        def run(s):
            assert spec_diff(s, s) == []

        run()

    def test_swap_involution(self):
        """diff(b, a) is exactly diff(a, b) with (old, new) swapped and
        tightened <-> loosened flipped ('changed' is its own mirror)."""
        from hypothesis import given, settings

        flip = {"tightened": "loosened", "loosened": "tightened",
                "changed": "changed"}

        @settings(max_examples=200, deadline=None)
        @given(_spec_strategy(), _spec_strategy())
        def run(a, b):
            fwd = spec_diff(a, b)
            mirrored = sorted(
                (c, k, nn, on, ns, os_, flip[ch])
                for (c, k, on, nn, os_, ns, ch) in fwd
            )
            assert sorted(spec_diff(b, a)) == mirrored

        run()


class TestReviewRegressions:
    """Fixes from the adversarial review: NaN bound poisoning, unmappable
    dtypes, empty column list, NaN drift classification."""

    def test_nan_does_not_poison_bounds(self, spark):
        df = spark.createDataFrame(
            [(1.0,), (2.0,), (float("nan"),)], "v double"
        )
        spec = suggest_spec(df)
        p = spec["properties"]["v"]
        assert p["minimum"] == 1.0 and p["maximum"] == 2.0  # NaN excluded
        # the spec compiles, and every FINITE row passes it
        res = jsv.Validator(jsv.Spec(spec)).validate(df.filter(~F.isnan("v")))
        assert res.summary()["valid"] is True
        # a NaN cell FAILS the suggested maximum by design (JSON has no
        # NaN — a NaN metric is exactly the defect a pinned spec catches)
        res_nan = jsv.Validator(jsv.Spec(spec)).validate(df)
        assert res_nan.summary()["valid"] is False

    def test_all_nan_column_gets_no_bounds(self, spark):
        df = spark.createDataFrame([(float("nan"),), (float("nan"),)], "v double")
        spec = suggest_spec(df)
        assert "minimum" not in spec["properties"]["v"]
        jsv.Spec(spec)  # still compiles

    def test_binary_column_compiles_without_type(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"\x89PNG")), (2, bytearray(b"\xff\xd8"))],
            "id int, bytes binary",
        )
        spec = suggest_spec(df)
        assert "type" not in spec["properties"]["bytes"]  # no JSON counterpart
        assert "bytes" in spec["required"]  # presence evidence still used
        res = jsv.Validator(jsv.Spec(spec)).validate(df)
        assert res.summary()["valid"] is True

    def test_empty_columns_list_means_none(self, spark):
        df = spark.createDataFrame([(1,)], "id int")
        spec = suggest_spec(df, columns=[])
        assert spec == {"type": "object", "required": [], "properties": {}}

    def test_nan_bound_is_not_phantom_drift(self):
        nan = float("nan")
        old = {"type": "object", "required": [],
               "properties": {"v": {"type": "number", "minimum": 0.0, "maximum": nan}}}
        # identical NaN bound on both sides: no drift rows at all
        assert spec_diff(old, old) == []
