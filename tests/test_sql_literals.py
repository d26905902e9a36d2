"""Bit-exactness contract for the SQL array-literal helpers.

``double_array_lit`` / ``double_matrix_lit`` (operators/similarity.py)
render constant double arrays as ONE SQL ``expr`` string instead of
element-by-element ``F.lit`` py4j conversion (PLANS.md §33: ~200x faster
plan construction). Every LSH plane, IVF centroid, and Cramér–Wold
direction flows through them, so a single value that Spark's SQL parser
rounds differently from ``F.lit`` would silently shift LSH buckets /
cell assignments. The contract is exact: ``repr(float)`` emits the
shortest round-trip decimal and Java's correctly-rounded ``Double``
parsing must return the IDENTICAL bits for every finite double.

These tests lock that claim with bit-pattern comparison (struct.pack,
not ==, so -0.0 vs 0.0 and NaN payloads can never false-pass) over
adversarial specials and a seeded battery across the full magnitude
range, all in one Spark collect per path.
"""

import math
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsonschema_validator_spark.operators.similarity import (
    double_array_lit,
    double_matrix_lit,
)

# bit-pattern specials: signed zero, smallest/largest denormals, the
# denormal/normal boundary, max double, classic non-terminating decimals,
# values whose shortest repr exercises 17 significant digits, and the
# 2^53 integer-precision edge
SPECIALS = [
    0.0,
    -0.0,
    5e-324,                      # min denormal
    -5e-324,
    2.2250738585072009e-308,     # max denormal
    2.2250738585072014e-308,     # min normal
    1.7976931348623157e308,      # max double
    -1.7976931348623157e308,
    0.1,
    1.0 / 3.0,
    2.0 / 3.0,
    math.pi,
    math.e,
    9007199254740992.0,          # 2^53
    9007199254740994.0,          # 2^53 + 2 (next representable)
    1e-300,
    1e300,
    1.0000000000000002,          # nextafter(1, 2)
    0.30000000000000004,         # 0.1 + 0.2
    -123456.789e-12,
]


def _bits(x: float) -> bytes:
    return struct.pack(">d", x)


def _seeded_battery() -> list:
    """2000 doubles spanning the magnitude range, deterministic."""
    rng = np.random.default_rng(1234)
    # uniform mantissas across decades [-320, 308], both signs
    exps = rng.uniform(-320, 308, size=1900)
    mants = rng.uniform(-10, 10, size=1900)
    vals = [m * (10.0 ** e) for m, e in zip(mants, exps)]
    # plus raw bit patterns (any finite double is fair game)
    raw = rng.integers(0, 2**64, size=200, dtype=np.uint64)
    for u in raw:
        (x,) = struct.unpack(">d", struct.pack(">Q", int(u)))
        if math.isfinite(x):
            vals.append(x)
    return [float(v) for v in vals if math.isfinite(v)]


def test_double_array_lit_bit_exact_vs_f_lit(spark):
    vals = SPECIALS + _seeded_battery()
    df = spark.range(1).select(
        double_array_lit(vals).alias("sql_lit"),
        F.array(*[F.lit(v) for v in vals]).alias("py4j_lit"),
    )
    row = df.collect()[0]
    assert len(row["sql_lit"]) == len(vals)
    for i, (a, b, v) in enumerate(zip(row["sql_lit"], row["py4j_lit"], vals)):
        assert _bits(a) == _bits(v), f"sql path bit-diff at {i}: {v!r} -> {a!r}"
        assert _bits(b) == _bits(v), f"py4j path bit-diff at {i}: {v!r} -> {b!r}"


def test_double_matrix_lit_bit_exact(spark):
    rows = [SPECIALS[i : i + 5] for i in range(0, 20, 5)]
    out = spark.range(1).select(double_matrix_lit(rows).alias("m")).collect()[0]["m"]
    assert [len(r) for r in out] == [len(r) for r in rows]
    for got, want in zip(out, rows):
        for a, v in zip(got, want):
            assert _bits(a) == _bits(v)


def test_double_array_lit_rejects_non_finite():
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError, match="non-finite"):
            double_array_lit([1.0, bad])
    with pytest.raises(ValueError, match="non-finite"):
        double_matrix_lit([[1.0], [float("nan")]])


def test_double_array_lit_is_one_expression(spark):
    # the whole point: ONE parsed expression, not n py4j literals — the
    # rendered SQL must be a single array(...) constructor of double
    # literals that Spark types as array<double>
    col = double_array_lit([1.5, -2.0, 3e10])
    df = spark.range(1).select(col.alias("a"))
    assert dict(df.dtypes)["a"] == "array<double>"
