"""Iceberg smoke path (VERDICT r3 next #8): keeps the "swap the parquet
snapshot protocol for Iceberg" claim (docs/ICEBERG.md) EXECUTABLE the day
runtime jars are present — one append commit + snapshot rollback, the two
primitives SnapshotStore emulates. Skips cleanly in this image (no
Iceberg jars, verified in BENCH/BASELINE.md r1 notes)."""

from __future__ import annotations

import pytest


def _iceberg_available(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_append_and_rollback(spark, tmp_path):
    if not _iceberg_available(spark):
        pytest.skip("no Iceberg runtime jars in this image (docs/ICEBERG.md)")
    spark.conf.set("spark.sql.catalog.smoke", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.smoke.type", "hadoop")
    spark.conf.set("spark.sql.catalog.smoke.warehouse", str(tmp_path / "wh"))
    tbl = "smoke.db.fetch_log"
    spark.sql(
        f"CREATE TABLE {tbl} (round INT, surt STRING) USING iceberg"
        " PARTITIONED BY (round)"
    )
    spark.createDataFrame([(0, "a")], "round int, surt string").writeTo(tbl).append()
    snap = spark.sql(
        f"SELECT snapshot_id FROM {tbl}.snapshots ORDER BY committed_at"
    ).collect()[0][0]
    spark.createDataFrame([(1, "b")], "round int, surt string").writeTo(tbl).append()
    assert spark.table(tbl).count() == 2
    # crash recovery: pin the table back to the round-0 commit
    spark.sql(f"CALL smoke.system.rollback_to_snapshot('db.fetch_log', {snap})")
    assert spark.table(tbl).count() == 1
    assert [r["round"] for r in spark.table(tbl).collect()] == [0]
