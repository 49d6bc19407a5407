"""Streaming layer tests: windows, sessions, stateful ops, multi-port
split via foreachBatch."""

import uuid

import pytest
from pyspark.sql import functions as F

from python_plugins_spark.sources.io import fix_nanos_ts, load_table
from python_plugins_spark.streaming import (
    read_stream_parquet,
    run_to_memory_sink,
    session_window_agg,
    split_ports_foreach_batch,
    stateful_running_agg,
    streaming_python_transform,
    tumbling_window_agg,
)


@pytest.fixture()
def event_stream(spark, sf_dir):
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return fix_nanos_ts(read_stream_parquet(spark, f"{sf_dir}/events.parquet", raw.schema))


def test_tumbling_window_agg(spark, sf_dir, event_stream):
    agg = tumbling_window_agg(
        event_stream, "ts", "10 minutes", ["event_type"],
        {"n": F.count("*"), "total": F.round(F.sum("value"), 4)},
    )
    got = run_to_memory_sink(agg, f"tw_{uuid.uuid4().hex[:8]}", "complete")
    batch = load_table(spark, "events", sf_dir)
    batch_n = (
        batch.groupBy(F.window("ts", "10 minutes"), "event_type").count().count()
    )
    assert got.count() == batch_n
    assert got.columns[:2] == ["window_start", "window_end"]


def test_session_window_agg(spark, event_stream):
    agg = session_window_agg(
        event_stream, "ts", "30 minutes", ["user_id"], {"n": F.count("*")}
    )
    got = run_to_memory_sink(agg, f"sw_{uuid.uuid4().hex[:8]}", "complete")
    assert got.count() > 0
    assert got.columns == ["session_start", "session_end", "user_id", "n"]


def test_stateful_running_agg(spark, event_stream):
    out = stateful_running_agg(event_stream, ["event_type"], "value")
    got = run_to_memory_sink(out, f"st_{uuid.uuid4().hex[:8]}", "update")
    rows = {r.event_type: r.running_count for r in got.collect()}
    assert sum(rows.values()) > 0


def test_multiport_foreach_batch_split(spark, event_stream):
    script = """
def transform(record, emitter, context):
    if record['value'] > 100:
        emitter.emitError({'errorCode': 1, 'errorMsg': 'outlier', 'invalidRecord': record})
    else:
        emitter.emit({'event_id': record['event_id']})
"""
    res = streaming_python_transform(
        event_stream, script=script, output_schema="event_id bigint", emit_errors=True
    )
    sink = {"out": 0, "err": 0}

    def on_out(df, epoch):
        sink["out"] += df.count()

    def on_err(df, epoch):
        sink["err"] += df.count()

    q = split_ports_foreach_batch(res, on_out, on_err).start()
    q.processAllAvailable()
    q.stop()
    assert sink["out"] > 0 and sink["err"] > 0
