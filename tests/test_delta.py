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


def test_delta_vacuum_retention_window(spark):
    """VACUUM honours the retention window: fresh tombstones survive
    the default/positive-retention pass (time travel within the window
    stays intact), retention_hours=0 reclaims immediately."""
    from python_plugins_spark.sources.delta_py import vacuum_delta

    path = _fresh("delta_t5")
    write_delta(spark.range(10), path, "overwrite")   # v0 files
    write_delta(spark.range(3), path, "overwrite")    # v1 replaces them
    before = {f for f in os.listdir(path) if f.endswith(".parquet")}
    # tombstones are seconds old -> a 1h retention deletes nothing,
    # and v0 time travel still works
    assert vacuum_delta(path, retention_hours=1.0) == []
    assert read_delta(spark, path, version_as_of=0).count() == 10
    # dry_run reports but does not delete
    would = vacuum_delta(path, retention_hours=0, dry_run=True)
    assert would and set(would) < before
    assert read_delta(spark, path, version_as_of=0).count() == 10
    deleted = vacuum_delta(path, retention_hours=0)
    assert deleted == would
    # current snapshot unaffected; v0 time travel is now (by design) broken
    assert read_delta(spark, path).count() == 3


def test_delta_checkpoint_write_and_replay(spark):
    """Every 10th commit writes a parquet checkpoint + _last_checkpoint;
    replay seeded from the checkpoint must equal the full JSON replay,
    and must survive the pre-checkpoint commits becoming unreadable
    (the point of checkpoints: O(interval) replay)."""
    from python_plugins_spark.sources.delta_py import (
        _replay_state,
        last_checkpoint_version,
    )

    path = _fresh("delta_cp")
    write_delta(spark.range(0, 5), path, "overwrite")          # v0
    for i in range(1, 13):                                      # v1..v12
        write_delta(spark.range(i * 100, i * 100 + 2), path, "append")
    assert table_version(path) == 12
    assert last_checkpoint_version(path) == 10

    full = _replay_state(path, use_checkpoint=False)
    seeded = _replay_state(path, use_checkpoint=True)
    assert seeded.active.keys() == full.active.keys()
    assert seeded.meta["schemaString"] == full.meta["schemaString"]

    # snapshot and time travel across the checkpoint boundary
    assert read_delta(spark, path).count() == 5 + 12 * 2
    assert read_delta(spark, path, version_as_of=9).count() == 5 + 9 * 2
    assert read_delta(spark, path, version_as_of=11).count() == 5 + 11 * 2

    # corrupt a pre-checkpoint commit: checkpointed replay is immune
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, f"{3:020d}.json"), "w") as fh:
        fh.write("")  # truncated
    assert read_delta(spark, path).count() == 5 + 12 * 2


def test_delta_concurrent_writers_no_lost_update(spark):
    """Two interleaved writers: the commit is put-if-absent, so a
    version collision is detected and retried instead of silently
    overwriting the other writer's commit. All appended rows must
    survive with distinct version numbers."""
    from concurrent.futures import ThreadPoolExecutor

    path = _fresh("delta_occ")
    write_delta(spark.range(0, 1), path, "overwrite")  # v0

    def appender(i):
        return write_delta(spark.range(1000 * i, 1000 * i + 5), path, "append")

    with ThreadPoolExecutor(max_workers=4) as ex:
        versions = list(ex.map(appender, range(1, 7)))
    assert sorted(versions) == [1, 2, 3, 4, 5, 6]  # no duplicates
    assert read_delta(spark, path).count() == 1 + 6 * 5


def test_delta_put_if_absent_primitive(tmp_path):
    """The commit primitive must refuse to overwrite an existing
    version file (the lost-update guard os.replace cannot give)."""
    from python_plugins_spark.sources.delta_py import _put_if_absent

    dst = str(tmp_path / "00000000000000000001.json")
    assert _put_if_absent("winner\n", dst)
    assert not _put_if_absent("loser\n", dst)
    with open(dst) as fh:
        assert fh.read() == "winner\n"
    # no tmp debris
    assert os.listdir(tmp_path) == [os.path.basename(dst)]


# ---------------------------------------------------------------- merge

def test_delta_merge_upsert_delete_insert(spark):
    """All three MERGE clauses in one pass: matched+delete-predicate
    rows vanish, remaining matched rows take the update expression
    (referencing both t and s), unmatched source rows insert."""
    import pytest
    from python_plugins_spark.sources.delta_py import merge_delta

    path = _fresh("delta_merge1")
    tgt = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.lit("old").alias("tag"),
    )
    write_delta(tgt, path, "overwrite")  # v0: k=0..9
    src = spark.range(5, 15).select(
        F.col("id").alias("k"),
        (F.col("id") * 100).alias("v"),
        F.lit("new").alias("tag"),
    )
    v = merge_delta(
        spark,
        src,
        path,
        on=["k"],
        when_matched_update={"v": "t.v + s.v", "tag": "s.tag"},
        when_matched_delete="s.k % 2 = 1",  # delete matched odd keys 5,7,9
        when_not_matched_insert=True,
    )
    assert v == 1
    rows = {r.k: (r.v, r.tag) for r in read_delta(spark, path).collect()}
    # untouched originals
    assert rows[0] == (0, "old") and rows[4] == (40, "old")
    # matched evens updated: v = 10k + 100k
    assert rows[6] == (660, "new") and rows[8] == (880, "new")
    # matched odds deleted
    assert 5 not in rows and 7 not in rows and 9 not in rows
    # inserts
    assert rows[10] == (1000, "new") and rows[14] == (1400, "new")
    assert len(rows) == 12  # 10 - 3 deleted + 5 inserted


def test_delta_merge_prunes_untouched_files(spark):
    """Only data files containing a matched key are rewritten: after a
    merge touching one of two files, the untouched file must still be
    in the active set (same physical part)."""
    from python_plugins_spark.sources.delta_py import _replay, merge_delta

    path = _fresh("delta_merge2")
    write_delta(spark.range(0, 100).selectExpr("id AS k", "id AS v"), path, "overwrite")
    write_delta(spark.range(100, 200).selectExpr("id AS k", "id AS v"), path, "append")
    _, active_before = _replay(path)
    touched_files = set()
    untouched_files = set()
    scan = spark.read.parquet(
        *[os.path.join(path, p) for p in active_before]
    ).withColumn("_f", F.input_file_name())
    per_file = {}
    for r in scan.select("k", "_f").collect():
        per_file.setdefault(os.path.basename(r._f), set()).add(r.k)
    for f, ks in per_file.items():
        (touched_files if any(k < 10 for k in ks) else untouched_files).add(f)
    assert touched_files and untouched_files
    src = spark.range(0, 10).selectExpr("id AS k", "id + 1000 AS v")
    merge_delta(spark, src, path, on=["k"], when_matched_update="all")
    _, active_after = _replay(path)
    # every file without a matched key survived as the same physical
    # part; every file containing one was rewritten (removed)
    assert untouched_files <= set(active_after)
    assert touched_files.isdisjoint(set(active_after))
    rows = {r.k: r.v for r in read_delta(spark, path).collect()}
    assert rows[5] == 1005 and rows[50] == 50 and rows[150] == 150
    assert len(rows) == 200


def test_delta_merge_duplicate_source_keys_rejected(spark):
    import pytest
    from python_plugins_spark.sources.delta_py import (
        DeltaMergeCardinalityError,
        merge_delta,
    )

    path = _fresh("delta_merge3")
    write_delta(spark.range(5).selectExpr("id AS k", "id AS v"), path, "overwrite")
    dup = spark.createDataFrame([(1, 7), (1, 8)], "k long, v long")
    with pytest.raises(DeltaMergeCardinalityError):
        merge_delta(spark, dup, path, on=["k"])


def test_delta_merge_concurrent_commit_retries(spark):
    """A commit landing between the merge's snapshot read and its
    put-if-absent must not be lost: the merge re-runs against the new
    snapshot (serializable isolation)."""
    import python_plugins_spark.sources.delta_py as dp

    path = _fresh("delta_merge4")
    write_delta(spark.range(10).selectExpr("id AS k", "id AS v"), path, "overwrite")

    real_put = dp._put_if_absent
    state = {"stolen": False}

    def racing_put(content, dst):
        if not state["stolen"]:
            state["stolen"] = True
            # concurrent writer appends k=100 and claims our version
            dp.write_delta(
                spark.range(100, 101).selectExpr("id AS k", "id AS v"), path, "append"
            )
        return real_put(content, dst)

    dp._put_if_absent = racing_put
    try:
        src = spark.range(0, 3).selectExpr("id AS k", "id + 50 AS v")
        v = dp.merge_delta(spark, src, path, on=["k"], when_matched_update="all")
    finally:
        dp._put_if_absent = real_put
    rows = {r.k: r.v for r in read_delta(spark, path).collect()}
    assert rows[100] == 100  # the concurrent append survived
    assert rows[0] == 50 and rows[2] == 52 and rows[5] == 5
    assert v == 2  # lost v1 to the racer, committed at v2


# ------------------------------------------------------------- optimize

def test_delta_add_actions_carry_file_stats(spark):
    from python_plugins_spark.sources.delta_py import _replay

    path = _fresh("delta_stats1")
    write_delta(
        spark.range(100).selectExpr("id AS k", "CAST(id * 2 AS DOUBLE) AS v"),
        path,
        "overwrite",
    )
    import json as _json

    _, active = _replay(path)
    assert active
    for add in active.values():
        st = _json.loads(add["stats"])
        assert st["numRecords"] > 0
        assert st["minValues"]["k"] >= 0 and st["maxValues"]["k"] <= 99


def test_delta_optimize_compacts_small_files(spark):
    """20 tiny appends -> one optimize -> few files, identical rows,
    dataChange=False, and history still time-travels."""
    from python_plugins_spark.sources.delta_py import _replay, optimize_delta

    path = _fresh("delta_opt1")
    for i in range(20):
        write_delta(
            spark.range(i * 10, (i + 1) * 10).selectExpr("id AS k").coalesce(1),
            path,
            "overwrite" if i == 0 else "append",
        )
    _, before = _replay(path)
    assert len(before) >= 20
    res = optimize_delta(spark, path)
    assert res["version"] == 20
    _, after = _replay(path)
    assert len(after) < len(before) / 4
    assert {r.k for r in read_delta(spark, path).collect()} == set(range(200))
    # history intact: v5 snapshot = first 6 slices
    assert read_delta(spark, path, version_as_of=5).count() == 60


def test_delta_zorder_enables_file_skipping(spark):
    """Uniform 2-D data, z-ordered into 16 files: a small (x, y) box
    must scan a minority of files via stats pruning and still return
    exactly the right rows."""
    from pyspark.sql import functions as F

    from python_plugins_spark.sources.delta_py import (
        _replay,
        optimize_delta,
        read_delta,
    )

    path = _fresh("delta_z1")
    n = 40_000
    df = spark.range(n).select(
        (F.col("id") % 200).alias("x"),
        ((F.col("id") * 7919) % 200).alias("y"),
        F.col("id").alias("payload"),
    )
    write_delta(df.repartition(8), path, "overwrite")
    res = optimize_delta(
        spark, path, target_file_size=24 * 1024, zorder_by=["x", "y"]
    )
    assert res["version"] == 1 and len(res["added"]) >= 6
    _, active = _replay(path)
    total = len(active)
    box = {"x": (20, 39), "y": (60, 79)}
    pruned = read_delta(spark, path, prune=box)
    scanned = pruned.inputFiles()
    assert len(scanned) < total / 2, (len(scanned), total)
    got = pruned.filter(
        (F.col("x").between(20, 39)) & (F.col("y").between(60, 79))
    )
    want = df.filter((F.col("x").between(20, 39)) & (F.col("y").between(60, 79)))
    assert got.count() == want.count()
    assert {r.payload for r in got.collect()} == {r.payload for r in want.collect()}


def test_delta_stats_survive_checkpoint(spark):
    """Replay seeded from a parquet checkpoint must still carry per-
    file stats, or pruning silently dies on long-lived tables."""
    import json as _json

    from python_plugins_spark.sources.delta_py import (
        _replay_state,
        last_checkpoint_version,
    )

    path = _fresh("delta_stats2")
    for i in range(11):  # v0..v10 -> checkpoint at v10
        write_delta(
            spark.range(i * 5, (i + 1) * 5).selectExpr("id AS k"),
            path,
            "overwrite" if i == 0 else "append",
        )
    assert last_checkpoint_version(path) == 10
    state = _replay_state(path)  # seeds from checkpoint
    assert state.active
    for add in state.active.values():
        st = _json.loads(add["stats"])
        assert "minValues" in st and st["numRecords"] > 0
