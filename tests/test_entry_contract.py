"""Driver-contract conformance: every queries() entry runs, and every
oracle_sql() entry matches the Spark result EXACTLY (row count, column
names, and order-insensitive cell values) — the same gate the grading
driver applies at sf=0.01."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in idx) for r in rows)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["rule_id", "tag", "n_checked", "n_failed", "pass"]


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_against_oracle(spark, duck, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    spark_rows = sdf.collect()
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check
        return
    duck_res = duck.sql(oracles[name])
    duck_cols = [d[0] for d in duck_res.description]
    duck_rows = duck_res.fetchall()
    assert sorted(sdf.columns) == sorted(duck_cols), (
        f"{name}: column mismatch {sdf.columns} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s = _rowset(sdf.columns, [tuple(r) for r in spark_rows])
    d = _rowset(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"
