"""Snapshot-versioned table layer.

North rule: "resumable from Iceberg-snapshot checkpoints with per-partition
lineage + metrics rows persisted". The sandbox has no Iceberg runtime JARs
(SURVEY.md §7 risk 7), so the layer is an interface with the semantics that
matter — append-only snapshots, snapshot ids, reading a table as-of a
snapshot, listing files per snapshot — over a Parquet-dir + JSON-manifest
fallback. On a cluster with Iceberg the same interface maps to
``spark.read.format("iceberg")`` + snapshot metadata tables.

Layout::

    <root>/
      _manifest.json        {"snapshots": [{"id": "...", "dir": "snap-000",
                              "n_rows": N}, ...]}
      snap-000/*.parquet
      snap-001/*.parquet
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.json"


class SnapshotTable:
    """Append-only snapshot-versioned parquet table."""

    def __init__(self, root: str):
        # No mkdir here: opening a table for read (or probing a name that
        # turns out not to exist) must be side-effect free. The directory
        # is created at first append — the commit path.
        self.root = root

    # ---- manifest ---------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def _load_manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"snapshots": []}
        with open(p) as f:
            return json.load(f)

    def _save_manifest(self, m: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic swap = commit

    def snapshots(self) -> list[str]:
        return [s["id"] for s in self._load_manifest()["snapshots"]]

    # ---- write -------------------------------------------------------------

    def append(self, df: DataFrame, snapshot_id: Optional[str] = None) -> str:
        """Write df as a new snapshot; manifest swap is the commit point
        (crash before the swap leaves the table unchanged — snapshot
        isolation, like an Iceberg commit)."""
        m = self._load_manifest()
        if snapshot_id is None:
            snapshot_id = f"s{len(m['snapshots']):06d}"
        if snapshot_id in {s["id"] for s in m["snapshots"]}:
            raise ValueError(f"snapshot '{snapshot_id}' already exists")
        d = f"snap-{len(m['snapshots']):06d}"
        df.write.mode("errorifexists").parquet(os.path.join(self.root, d))
        n = df.sparkSession.read.parquet(os.path.join(self.root, d)).count()
        m["snapshots"].append({"id": snapshot_id, "dir": d, "n_rows": n})
        self._save_manifest(m)
        return snapshot_id

    # ---- read ---------------------------------------------------------------

    def read_snapshot(self, spark: SparkSession, snapshot_id: str) -> DataFrame:
        for s in self._load_manifest()["snapshots"]:
            if s["id"] == snapshot_id:
                return spark.read.parquet(os.path.join(self.root, s["dir"]))
        raise KeyError(f"no snapshot '{snapshot_id}'")

    def snapshot_n_rows(self, snapshot_id: str) -> Optional[int]:
        """The row count recorded in the manifest at append time, or None
        for a manifest written before counts were recorded. Free — no
        scan (the Iceberg analogue: snapshot summary record counts)."""
        for s in self._load_manifest()["snapshots"]:
            if s["id"] == snapshot_id:
                return s.get("n_rows")
        raise KeyError(f"no snapshot '{snapshot_id}'")

    def read(self, spark: SparkSession, as_of: Optional[str] = None) -> DataFrame:
        """Full table (or as-of a snapshot): union of snapshot dirs —
        a multi-path parquet scan, still one stage, still prunable."""
        dirs = []
        for s in self._load_manifest()["snapshots"]:
            dirs.append(os.path.join(self.root, s["dir"]))
            if as_of is not None and s["id"] == as_of:
                break
        if not dirs:
            raise ValueError("table has no snapshots")
        return spark.read.parquet(*dirs)
