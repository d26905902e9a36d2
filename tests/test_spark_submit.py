"""Submission-mode evidence (north rule: ``spark-submit --py-files``):
package the library as a zip, submit ``submit_job.py`` to a fresh Spark
via spark-submit, and verify the written verdict/violation tables and the
CI exit-code contract."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPEC = {
    "required": ["l_orderkey"],
    "properties": {
        "l_quantity": {"minimum": 1, "maximum": 49},
        "l_returnflag": {"enum": ["A", "N", "R"]},
    },
}


def test_spark_submit_py_files_end_to_end(tmp_path):
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"

    zip_path = str(tmp_path / "jsv_lib.zip")
    pkg = os.path.join(REPO, "jsonschema_validator_spark")
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    spec_path = str(tmp_path / "spec.json")
    with open(spec_path, "w") as fh:
        json.dump(SPEC, fh)
    out_dir = str(tmp_path / "out")

    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "submit_job.py"),
            "--input", "/root/testdata/sf0.001/lineitem.parquet",
            "--spec", spec_path,
            "--output", out_dir,
            "--partition-by", "l_returnflag",
            "--include", "l_orderkey",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),  # NOT the repo root: the zip must provide the lib
        env={**os.environ, "PYTHONPATH": ""},
    )
    # exit 1 = table has violations (the CI-gate contract)
    assert proc.returncode == 1, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["valid"] is False and summary["n_rows"] == 6000

    con = duckdb.connect()
    v = con.sql(
        f"SELECT sum(n_failed) FROM '{out_dir}/verdicts/*.parquet'"
    ).fetchone()[0]
    n_viol = con.sql(
        f"SELECT count(*) FROM '{out_dir}/violations/*.parquet'"
    ).fetchone()[0]
    assert v == n_viol == summary["n_invalid_rows"] + (v - summary["n_invalid_rows"])
    assert n_viol > 0
    # per-partition verdicts: one row per (flag, rule)
    flags = con.sql(
        f"SELECT count(DISTINCT l_returnflag) FROM '{out_dir}/verdicts/*.parquet'"
    ).fetchone()[0]
    assert flags == 3


def test_empty_table_summary_is_valid(spark):
    """F.sum over zero rows is NULL; summary() must coalesce so a vacuously
    valid empty table reports valid=True (exit-code-0 contract)."""
    from jsonschema_validator_spark import Validator

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").filter(
        "l_orderkey < 0"
    )
    s = Validator({"properties": {"l_quantity": {"minimum": 1}}}).validate(df).summary()
    assert s["valid"] is True
    assert s["n_rows"] == 0 and s["n_invalid_rows"] == 0
