"""Delta-protocol table layer (sources/delta_py.py): log replay,
atomic overwrite, time travel, schema fidelity."""

import os
import shutil

from pyspark.sql import functions as F

from python_plugins_spark.sources.delta_py import (
    read_delta,
    table_version,
    write_delta,
)

SCRATCH = "/root/repo/.scratch"


def _fresh(name: str) -> str:
    path = os.path.join(SCRATCH, name)
    shutil.rmtree(path, ignore_errors=True)
    return path


def test_delta_append_overwrite_versions(spark):
    path = _fresh("delta_t1")
    df1 = spark.range(10).withColumn("tag", F.lit("a"))
    df2 = spark.range(10, 15).withColumn("tag", F.lit("b"))
    assert write_delta(df1, path, "overwrite") == 0
    assert write_delta(df2, path, "append") == 1
    assert table_version(path) == 1
    snap = read_delta(spark, path)
    assert snap.count() == 15
    # overwrite replaces EVERYTHING in one commit
    df3 = spark.range(100, 103).withColumn("tag", F.lit("c"))
    assert write_delta(df3, path, "overwrite") == 2
    rows = {r.id for r in read_delta(spark, path).collect()}
    assert rows == {100, 101, 102}


def test_delta_time_travel_snapshots(spark):
    path = _fresh("delta_t2")
    write_delta(spark.range(5), path, "overwrite")        # v0
    write_delta(spark.range(5, 8), path, "append")        # v1
    write_delta(spark.range(50, 52), path, "overwrite")   # v2
    assert read_delta(spark, path, version_as_of=0).count() == 5
    assert read_delta(spark, path, version_as_of=1).count() == 8
    assert {r.id for r in read_delta(spark, path, version_as_of=2).collect()} == {50, 51}


def test_delta_schema_fidelity_and_pruning(spark, sf_dir):
    """Schema (incl. timestamps) survives the log roundtrip, and the
    snapshot scan keeps parquet filter pushdown — the point of staying
    on the native reader."""
    from python_plugins_spark.plans import plan_str
    from python_plugins_spark.sources.io import load_table

    path = _fresh("delta_t3")
    ev = load_table(spark, "events", sf_dir).select("event_id", "ts", "value")
    write_delta(ev, path, "overwrite")
    back = read_delta(spark, path)
    assert back.schema == ev.schema
    plan = plan_str(back.filter(F.col("value") > 100))
    assert "PushedFilters" in plan and "GreaterThan(value,100" in plan.replace(".0", "")


def test_delta_invalid_version_raises(spark):
    import pytest

    path = _fresh("delta_t4")
    write_delta(spark.range(3), path, "overwrite")
    with pytest.raises(ValueError, match="version 7 not in log"):
        read_delta(spark, path, version_as_of=7)


def test_delta_vacuum_drops_unreferenced(spark):
    from python_plugins_spark.sources.delta_py import vacuum_delta

    path = _fresh("delta_t5")
    write_delta(spark.range(10), path, "overwrite")   # v0 files
    write_delta(spark.range(3), path, "overwrite")    # v1 replaces them
    before = {f for f in os.listdir(path) if f.endswith(".parquet")}
    deleted = vacuum_delta(path)
    assert deleted and set(deleted) < before
    # current snapshot unaffected; v0 time travel is now (by design) broken
    assert read_delta(spark, path).count() == 3
