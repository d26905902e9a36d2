"""The oracle-side pure-Python XXH64 (xxh64.py, implemented from the public
xxHash spec) must agree with Spark's ``xxhash64`` expression bit-for-bit —
this is what makes the minhash/simhash/ann golden oracles an independent
cross-check rather than a self-comparison."""

from pyspark.sql import functions as F

from jsonschema_validator_spark.xxh64 import spark_xxhash64

CASES = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",  # 4-byte tail
    "abcdefg",  # byte tail after nothing
    "abcdefgh",  # exact 8-byte word
    "hello world",
    "x" * 31,
    "x" * 32,  # stripe boundary
    "x" * 33,
    "the quick brown fox jumps over the lazy dog",  # > 32, mixed tail
    "naïve ünïcode ✓ ünïcode",  # multi-byte UTF-8
]


def test_string_hash_matches_spark(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "s string")
    rows = df.select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert spark_xxhash64(r["s"]) == r["h"], r["s"]


def test_chained_and_typed_hash_matches_spark(spark):
    df = spark.createDataFrame([(c,) for c in CASES[:6]], "s string")
    rows = df.select(
        "s",
        F.xxhash64("s", F.lit(7)).alias("h_int"),
        F.xxhash64("s", F.lit(3), F.lit(11)).alias("h_chain"),
    ).collect()
    for r in rows:
        assert spark_xxhash64(r["s"], 7) == r["h_int"]
        assert spark_xxhash64(r["s"], 3, 11) == r["h_chain"]

    longs = [0, 1, -1, 2**40, -(2**40), 2**62, -(2**62)]
    df2 = spark.createDataFrame([(v,) for v in longs], "v long")
    for r in df2.select("v", F.xxhash64("v").alias("h")).collect():
        assert spark_xxhash64((r["v"], "long")) == r["h"]
