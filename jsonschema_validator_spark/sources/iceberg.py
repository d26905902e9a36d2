"""Config-switched real-Iceberg backend for the snapshot table layer.

The engine's checkpoint/resume semantics (append-only snapshots, read
as-of a snapshot, per-snapshot lineage) are programmed against the
:class:`~jsonschema_validator_spark.sources.tables.SnapshotTable`
interface. This sandbox has no Iceberg runtime JARs, so the default
backend is the Parquet+manifest fallback; on a cluster where
``spark.sql.catalog.<name>`` is configured with
``org.apache.iceberg.spark.SparkCatalog`` (public Iceberg-Spark runtime),
:func:`open_table` returns :class:`IcebergTable` instead — same methods,
real Iceberg snapshot isolation, no caller changes.

Semantic mapping (public Iceberg Spark docs):

====================  ====================================================
interface             Iceberg
====================  ====================================================
``append(df)``        ``df.writeTo(tbl).append()`` (create on first write)
``snapshots()``       ``SELECT snapshot_id FROM tbl.snapshots`` ordered by
                      ``committed_at`` (metadata table — no data scan)
``read_snapshot(id)`` ``spark.read.option("snapshot-id", id).table(tbl)``
``read(as_of=id)``    same — an Iceberg snapshot IS the full table state
                      at commit time (vs the fallback's dir-union)
====================  ====================================================

One deliberate difference: Iceberg assigns snapshot ids at commit; the
fallback lets callers name snapshots. ``append(snapshot_id=...)`` here
raises so resume bookkeeping never records an id the catalog doesn't
know.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def iceberg_catalogs(spark: SparkSession) -> list[str]:
    """Names of configured Iceberg catalogs (``spark.sql.catalog.<name>``
    pointing at an Iceberg SparkCatalog/SparkSessionCatalog class)."""
    out = []
    for k, v in spark.sparkContext.getConf().getAll():
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3:
            if "iceberg" in str(v).lower():
                out.append(k.rsplit(".", 1)[1])
    return sorted(out)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured AND its classes load
    (config without JARs fails at first use — detect that here, loudly
    at plan-build time rather than mid-job)."""
    if not iceberg_catalogs(spark):
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergTable:
    """The :class:`SnapshotTable` interface over a real Iceberg table
    (``catalog.namespace.table`` identifier)."""

    def __init__(self, spark: SparkSession, identifier: str):
        if not iceberg_available(spark):
            raise RuntimeError(
                "no usable Iceberg catalog in this session: configure "
                "spark.sql.catalog.<name> with the Iceberg runtime JARs on "
                "the classpath, or use sources.tables.SnapshotTable "
                "(Parquet+manifest fallback)"
            )
        self.spark = spark
        self.identifier = identifier

    # ---- manifest-equivalent ----------------------------------------------

    def snapshots(self) -> list[str]:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.identifier}.snapshots "
            "ORDER BY committed_at"
        ).collect()  # metadata table: O(#snapshots) rows, no data scan
        return [str(r["snapshot_id"]) for r in rows]

    # ---- write -------------------------------------------------------------

    def append(self, df: DataFrame, snapshot_id: Optional[str] = None) -> str:
        if snapshot_id is not None:
            raise ValueError(
                "Iceberg assigns snapshot ids at commit time; omit "
                "snapshot_id (the committed id is returned)"
            )
        before = set(self.snapshots()) if self._exists() else set()
        if self._exists():
            df.writeTo(self.identifier).append()
        else:
            df.writeTo(self.identifier).create()
        new = [s for s in self.snapshots() if s not in before]
        if len(new) != 1:
            raise RuntimeError(
                f"expected exactly one new snapshot after append, saw {new}"
            )
        return new[0]

    def _exists(self) -> bool:
        return self.spark.catalog.tableExists(self.identifier)

    def snapshot_n_rows(self, snapshot_id: str) -> Optional[int]:
        """Rows ADDED by this snapshot (what :meth:`read_snapshot`
        returns), from the snapshot summary — metadata only, no scan."""
        sid = int(snapshot_id)  # Iceberg ids are numeric; also sanitizes
        rows = self.spark.sql(
            f"SELECT summary['added-records'] AS n FROM "
            f"{self.identifier}.snapshots WHERE snapshot_id = {sid}"
        ).collect()
        if not rows or rows[0]["n"] is None:
            return None
        return int(rows[0]["n"])

    # ---- read --------------------------------------------------------------

    def read_snapshot(self, spark: SparkSession, snapshot_id: str) -> DataFrame:
        """Rows as of exactly this snapshot MINUS the previous one (the
        fallback's per-snapshot read): Iceberg's incremental read between
        adjacent snapshot ids."""
        ids = self.snapshots()
        if snapshot_id not in ids:
            raise KeyError(f"no snapshot '{snapshot_id}'")
        i = ids.index(snapshot_id)
        r = spark.read.format("iceberg")
        if i > 0:
            r = r.option("start-snapshot-id", ids[i - 1])
        r = r.option("end-snapshot-id", snapshot_id)
        return r.load(self.identifier)

    def read(self, spark: SparkSession, as_of: Optional[str] = None) -> DataFrame:
        r = spark.read
        if as_of is not None:
            if as_of not in self.snapshots():
                raise KeyError(f"no snapshot '{as_of}'")
            r = r.option("snapshot-id", as_of)
        return r.table(self.identifier)


def open_table(spark: SparkSession, location: str):
    """Backend switch: a ``catalog.namespace.table`` identifier whose
    catalog is a usable Iceberg catalog → :class:`IcebergTable`; anything
    else (a filesystem path — the sandbox case) → the Parquet+manifest
    :class:`SnapshotTable`. Callers program against the shared interface
    and never branch."""
    from jsonschema_validator_spark.sources.tables import SnapshotTable

    head = location.split(".", 1)[0]
    if (
        "/" not in location
        and "." in location
        and head in iceberg_catalogs(spark)
        and iceberg_available(spark)
    ):
        return IcebergTable(spark, location)
    return SnapshotTable(location)


__all__ = ["IcebergTable", "open_table", "iceberg_available", "iceberg_catalogs"]
