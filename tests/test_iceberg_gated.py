"""Real-Iceberg integration — ENV-GATED (round 7, VERDICT item 6).

The engine's MERGE INTO emitter (cdc/apply.py:merge_into_sql) and the
Iceberg procedure passthroughs (maintenance.py:iceberg_*) are
parse-validated and DuckDB-equivalence-proven, but no Iceberg runtime
jar ships in this sandbox, so the ``CALL iceberg.system.*`` and real
``MERGE INTO`` paths have never executed against a live catalog.
These tests self-verify the day a jar appears: set

    SPARK_ICEBERG_JAR=/path/to/iceberg-spark-runtime-<ver>.jar

and they build a hadoop-catalog session, run the emitted MERGE through
a real Iceberg table (against the same change algebra apply_changes
computes), and exercise the three maintenance procedures.  Skipped
(not failed) without the env var — the same gate pattern as the
transformWithStateInPandas protobuf skip."""

import os

import pytest

_JAR = os.environ.get("SPARK_ICEBERG_JAR")

pytestmark = pytest.mark.skipif(
    not _JAR,
    reason="SPARK_ICEBERG_JAR not set — no Iceberg runtime in this env",
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    """A session with the Iceberg extension + a hadoop catalog rooted
    in a temp dir (no external services)."""
    from pyspark.sql import SparkSession

    warehouse = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-gated")
        .config("spark.jars", _JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions",
        )
        .config(
            "spark.sql.catalog.iceberg",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        .config("spark.sql.catalog.iceberg.type", "hadoop")
        .config("spark.sql.catalog.iceberg.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_merge_into_executes_and_matches_apply_changes(iceberg_spark):
    from lakehouse_cdc_spark.cdc.apply import (
        apply_changes,
        compact_changes,
        merge_into_sql,
    )

    spark = iceberg_spark
    spark.sql("CREATE NAMESPACE IF NOT EXISTS iceberg.db")
    spark.sql("DROP TABLE IF EXISTS iceberg.db.t")
    spark.sql(
        "CREATE TABLE iceberg.db.t (id INT, v STRING, seq INT) USING iceberg"
    )
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0)], "id int, v string, seq int"
    )
    base.writeTo("iceberg.db.t").append()

    changes = spark.createDataFrame(
        [
            (1, None, "d", 1),
            (2, "b2", "u", 1),
            (3, "c", "c", 1),
            (4, None, None, 1),  # NULL op: must be a no-op in every arm
        ],
        "id int, v string, operation string, seq int",
    )
    compact = compact_changes(changes, ["id"], ["seq"])
    compact.createOrReplaceTempView("changes_src")
    spark.sql(
        merge_into_sql("iceberg.db.t", "changes_src", ["id"], ["v", "seq"])
    )
    got = sorted(
        (r.id, r.v) for r in spark.table("iceberg.db.t").collect()
    )
    want = sorted(
        (r.id, r.v)
        for r in apply_changes(
            base, changes, keys=["id"], order_by=["seq"]
        ).collect()
    )
    assert got == want == [(2, "b2"), (3, "c")]


def test_iceberg_maintenance_procedures_execute(iceberg_spark):
    from lakehouse_cdc_spark.maintenance import (
        iceberg_expire_snapshots,
        iceberg_remove_orphan_files,
        iceberg_rewrite_data_files,
    )

    spark = iceberg_spark
    spark.sql("CREATE NAMESPACE IF NOT EXISTS iceberg.db")
    spark.sql("DROP TABLE IF EXISTS iceberg.db.m")
    spark.sql("CREATE TABLE iceberg.db.m (id INT) USING iceberg")
    for i in range(3):  # several small commits → snapshots + small files
        spark.range(i * 10, i * 10 + 10).selectExpr(
            "CAST(id AS INT) AS id"
        ).writeTo("iceberg.db.m").append()

    # each passthrough must parse AND execute against the live catalog
    iceberg_rewrite_data_files(spark, "db.m", min_input_files=2)
    iceberg_expire_snapshots(spark, "db.m", days=0, retain_last=1)
    iceberg_remove_orphan_files(spark, "db.m")
    # table still fully readable afterwards
    assert spark.table("iceberg.db.m").count() == 30
    snaps = spark.sql(
        "SELECT COUNT(*) AS n FROM iceberg.db.m.snapshots"
    ).collect()[0].n
    assert snaps >= 1
