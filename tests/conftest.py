import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("jsv-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


def run_column_spec(spark, dtype, values, colspec, mode="strict", extra_spec=None):
    """Validate a single typed column against a per-column spec.

    Returns {case_id: row_dict_or_None} — the first violation per case
    (reference interpreters short-circuit per keyword) keyed by case id.
    """
    from jsonschema_validator_spark import Spec, Validator

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, schema=f"id int, v {dtype}")
    raw = {"properties": {"v": colspec}}
    if extra_spec:
        raw.update(extra_spec)
    res = Validator(Spec(raw, mode=mode), stop_on_first_error=True).validate(df)
    out = {i: None for i, _ in rows}
    for r in res.violations(include=["id"]).collect():
        out[r["id"]] = r.asDict()
    return out
