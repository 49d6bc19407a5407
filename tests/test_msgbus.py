"""Regression tests for the round-4 advisor findings on the message
bus (`sources/msgbus.py`) and the pipeline Delta streaming sink:

1. null keys must produce (value-hash partitioning), not crash on a
   NULL partition id;
2. a produce colliding on an existing segmentSeq with DIFFERENT
   content must be refused, never silently overwritten;
3. re-producing identical records must be byte-identical regardless of
   input order (ties on (ts, key) broken by value bytes) — the
   idempotent-retry path accepts it without rewriting;
4. streamingsink.delta commits each epoch with a SetTransaction key so
   an epoch re-run after a crash between the Delta commit and the
   streaming-checkpoint commit cannot double-append.
"""

import pytest

from python_plugins_spark.sources import msgbus


def _produce(spark, rows, root, topic, seq=0, partitions=2):
    df = spark.createDataFrame(rows, "key string, value string")
    msgbus.produce_dataframe(
        df, root, topic, key_col="key", value_col="value",
        partitions=partitions, segment_seq=seq,
    )


def _read(spark, root, topic):
    msgbus.register(spark)
    return (
        spark.read.format("msgbus")
        .option("path", root).option("topic", topic).load()
    )


def test_produce_null_keys(spark, tmp_path):
    root = str(tmp_path / "broker")
    rows = [(None, "a"), (None, "b"), ("k", "c"), (None, "d")]
    _produce(spark, rows, root, "t")
    got = _read(spark, root, "t").collect()
    assert len(got) == 4
    null_vals = sorted(
        bytes(r.value).decode() for r in got if r.key is None
    )
    assert null_vals == ["a", "b", "d"]
    # null-key rows spread by value hash, not all on one partition id
    parts = {r.partition for r in got}
    assert parts <= {0, 1}


def test_segment_seq_collision_refused(spark, tmp_path):
    root = str(tmp_path / "broker")
    _produce(spark, [("k1", "v1"), ("k2", "v2")], root, "t", seq=0)
    before = {
        (bytes(r.key), bytes(r.value)) for r in _read(spark, root, "t").collect()
    }
    # same seq, same per-partition record counts, DIFFERENT content
    with pytest.raises(Exception, match="already exists"):
        _produce(spark, [("k1", "x1"), ("k2", "x2")], root, "t", seq=0)
    # the committed records survived untouched
    after = {
        (bytes(r.key), bytes(r.value)) for r in _read(spark, root, "t").collect()
    }
    assert after == before
    # a bumped seq lands the second produce cleanly
    _produce(spark, [("k1", "x1"), ("k2", "x2")], root, "t", seq=1)
    assert _read(spark, root, "t").count() == 4


def test_retry_identical_content_is_idempotent(spark, tmp_path):
    """Same records, shuffled arrival order -> byte-identical segments.

    The second produce takes the keep-it path (no rewrite, no error);
    with a (ts, key)-only sort the tied same-key records would arrive
    in nondeterministic post-shuffle order and trip the collision
    guard."""
    root = str(tmp_path / "broker")
    rows = [("k", f"v{i:02d}") for i in range(40)]  # all tie on (ts=0, key)
    _produce(spark, rows, root, "t", seq=0, partitions=2)
    first = _read(spark, root, "t").collect()
    _produce(spark, list(reversed(rows)), root, "t", seq=0, partitions=2)
    second = _read(spark, root, "t").collect()
    assert [
        (bytes(r.value), r.offset, r.partition) for r in first
    ] == [(bytes(r.value), r.offset, r.partition) for r in second]


def test_pipeline_delta_sink_epoch_rerun_is_noop(spark, sf_dir, tmp_path):
    """streamingsink.delta records (pipeline:<stage>:<path>, epoch) as a
    Delta SetTransaction; re-delivering an already-committed epoch is
    skipped (returns -1), not double-appended."""
    from python_plugins_spark.pipeline import run_pipeline
    from python_plugins_spark.sources import delta_py as dp

    out = str(tmp_path / "delta_out")
    ckpt = str(tmp_path / "ckpt")
    run_pipeline(spark, {
        "stages": [
            {"name": "src", "type": "streamingsource.file",
             "config": {"path": f"{sf_dir}/nation.parquet"}},
            {"name": "sink", "type": "streamingsink.delta",
             "config": {"path": out, "checkpointLocation": ckpt}},
        ],
        "connections": [{"from": "src", "to": "sink"}],
    })
    n = dp.read_delta(spark, out).count()
    assert n > 0
    txns = dp._replay_state(out).txns
    app_id = f"pipeline:sink:{out}"
    assert app_id in txns, f"SetTransaction not recorded: {txns}"
    last_epoch = txns[app_id]
    # crash-window replay: the same epoch's batch arrives again
    replay = dp.read_delta(spark, out)
    assert dp.write_delta(
        replay, out, mode="append", txn=(app_id, last_epoch)
    ) == -1
    assert dp.read_delta(spark, out).count() == n
