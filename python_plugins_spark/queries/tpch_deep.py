"""Remaining TPC-H shapes (q2/q7/q8/q9/q12/q15/q20/q21), the CDAP Avro-JSON schema surface, boilerplate detection, PII scrubbing.

Split from the former queries.py; see _core for the registry and conventions."""
from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves postponed type hints in pandas UDFs

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from python_plugins_spark.functions import oracle_fragments as OF  # noqa: F401
from python_plugins_spark.operators import dedup as D  # noqa: F401
from python_plugins_spark.operators import multimodal as MM  # noqa: F401
from python_plugins_spark.operators import relational as R  # noqa: F401
from python_plugins_spark.operators import similarity as S  # noqa: F401
from python_plugins_spark.operators import text as TX  # noqa: F401
from python_plugins_spark.operators.asof import asof_join  # noqa: F401
from python_plugins_spark.operators.transform import python_transform  # noqa: F401
from python_plugins_spark.sources.io import load_table  # noqa: F401

from python_plugins_spark.queries._core import (  # noqa: F401
    ORACLES, QUERIES, register, _global_index_part, _ts, _STRF,
)

from python_plugins_spark.queries.core_relational import _neardup_edges  # noqa: F401
from python_plugins_spark.queries.sources_sinks import _SCRATCH  # noqa: F401
from python_plugins_spark.session import stage_checkpoint


# Batch 8: remaining TPC-H shapes (q2/q15/q20/q21 adapted to the
# trimmed schema) + error-routing transform
# =====================================================================

@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l.l_partkey, l.l_suppkey, round(avg(l.l_extendedprice / l.l_quantity), 6) AS unit_cost
      FROM lineitem l GROUP BY l.l_partkey, l.l_suppkey
    )
    SELECT c.l_partkey AS p_partkey, p.p_brand,
           min(struct_pack(uc := c.unit_cost, sk := c.l_suppkey)).sk AS best_suppkey,
           round(min(c.unit_cost), 6) AS best_unit_cost
    FROM costs c JOIN part p ON p.p_partkey = c.l_partkey
    WHERE p.p_size <= 10
    GROUP BY c.l_partkey, p.p_brand
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (adapted: no partsupp table — unit costs derive
    from lineitem): cheapest supplier per small part, deterministic
    argmin via lexicographic struct-min."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_size") <= 10)
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias("unit_cost")
    )
    return (
        costs.join(F.broadcast(p), costs.l_partkey == p.p_partkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"), "p_brand")
        .agg(
            F.min(F.struct(F.col("unit_cost"), F.col("l_suppkey")))["l_suppkey"].alias(
                "best_suppkey"
            ),
            F.round(F.min("unit_cost"), 6).alias("best_unit_cost"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: view + scalar max subquery (which supplier(s)
    hit the quarter's top revenue). The scalar max is a 1-row global
    aggregate broadcast back onto the revenue frame — no global window
    (an unpartitioned max().over() would single-partition the revenue
    frame; the aggregate+broadcast form scales with supplier count)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    s = load_table(spark, "supplier", sf_dir)
    mx = revenue.agg(F.max("total_revenue").alias("_max"))
    top = (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_max"))
        .drop("_max")
    )
    return s.join(top, s.s_suppkey == top.l_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "q20_heavy_part_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE '%blue%'
      GROUP BY l.l_suppkey HAVING sum(l.l_quantity) > 2000
    )
    """,
)
def q20_heavy_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: IN over an aggregated-with-HAVING subquery ->
    semi join against the pre-aggregated key set."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%blue%"))
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 2000)
        .select("l_suppkey")
    )
    s = load_table(spark, "supplier", sf_dir)
    return s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
    SELECT s.s_suppkey, s.s_name, count(DISTINCT o.o_orderkey) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def q21_sole_late_supplier(spark, sf_dir):
    """TPC-H Q21 shape (late = shipped >90 days after order date, since
    the trimmed schema has no commit/receipt dates): suppliers who were
    the ONLY late supplier on a multi-supplier finalized order —
    EXISTS + NOT EXISTS as semi/anti joins on the same fact table."""
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    # multi-supplier orders: another supplier appears on the order
    others = li.select(
        F.col("l_orderkey").alias("o_k"), F.col("l_suppkey").alias("o_s")
    )
    l1_multi = l1.join(
        others,
        (l1.l_orderkey == others.o_k) & (l1.l_suppkey != others.o_s),
        "left_semi",
    )
    # ...but nobody ELSE was late on it
    late_others = l1.select(
        F.col("l_orderkey").alias("lo_k"), F.col("l_suppkey").alias("lo_s")
    )
    sole = l1_multi.join(
        late_others,
        (l1_multi.l_orderkey == late_others.lo_k)
        & (l1_multi.l_suppkey != late_others.lo_s),
        "left_anti",
    )
    return (
        sole.join(s, sole.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


@register(
    "transform_route_errors",
    oracle="""
    SELECT errorCode, count(*) AS n FROM (
      SELECT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS errorCode FROM customer
    ) GROUP BY errorCode
    """,
)
def transform_route_errors(spark, sf_dir):
    """on_error='route': a raising record doesn't fail the task — it
    lands on the error port with the traceback as errorMsg (errorCode
    1), while healthy records flow on (errorCode 0 here counts the
    main port)."""
    c = load_table(spark, "customer", sf_dir)
    script = """
def transform(record, emitter, context):
    if record['c_acctbal'] < 0:
        raise ValueError('negative balance: %s' % record['c_custkey'])
    emitter.emit(record)
"""
    res = python_transform(c, script=script, on_error="route")
    # ok + bad both read the tagged frame; TransformResult's
    # localCheckpoint routes through session.stage_checkpoint (GC-
    # released blocks by default, conf-switchable for cluster runs)
    res = res.localCheckpoint()
    ok = res.output.select(F.lit(0).alias("errorCode"))
    bad = res.errors.select(F.col("errorCode"))
    return ok.unionByName(bad).groupBy("errorCode").agg(F.count("*").alias("n"))


# =====================================================================
# Batch 9: CDAP Avro-JSON schema surface through the driver gate,
# VARIANT semi-structured type
# =====================================================================

@register(
    "transform_cdap_avro_schema",
    oracle="""
    SELECT n_nationkey AS key, upper(n_name) AS name_uc, n_regionkey AS region
    FROM nation
    """,
)
def transform_cdap_avro_schema(spark, sf_dir):
    """The reference's ACTUAL schema config surface: output schema
    declared as a CDAP/Avro-JSON string (PythonEvaluator.java:291-297),
    parsed by the schema bridge — nullable fields as union-with-null,
    exactly like the reference's tests (BasePythonTransformTest.java:68-73)."""
    n = load_table(spark, "nation", sf_dir)
    avro_schema = """
    {"type": "record", "name": "etlSchemaBody", "fields": [
      {"name": "key", "type": "int"},
      {"name": "name_uc", "type": ["string", "null"]},
      {"name": "region", "type": ["null", "int"]}
    ]}
    """
    script = """
def transform(record, emitter, context):
    emitter.emit({'key': record['n_nationkey'],
                  'name_uc': record['n_name'].upper(),
                  'region': record['n_regionkey']})
"""
    return python_transform(n, script=script, output_schema=avro_schema).output


@register(
    "transform_enum_schema",
    oracle="""
    SELECT o_orderkey AS key,
           CASE o_orderstatus WHEN 'F' THEN 'FULFILLED'
                              WHEN 'O' THEN 'OPEN'
                              ELSE 'PENDING' END AS status
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def transform_enum_schema(spark, sf_dir):
    """CDAP output schema with an Avro ENUM field — the reference
    codec hard-rejects enum (PythonObjectsEncoder.java:51-52,67); the
    schema bridge maps symbols to their string names (with a
    deploy-time warning), so enum-bearing pipeline configs run instead
    of failing deployment. Roundtrip: script emits symbol names, the
    declared enum field lands as a string column."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") <= 2000)
    avro_schema = """
    {"type": "record", "name": "etlSchemaBody", "fields": [
      {"name": "key", "type": "long"},
      {"name": "status",
       "type": {"type": "enum", "name": "Status",
                "symbols": ["FULFILLED", "OPEN", "PENDING"]}}
    ]}
    """
    script = """
def transform(record, emitter, context):
    m = {'F': 'FULFILLED', 'O': 'OPEN'}
    emitter.emit({'key': record['o_orderkey'],
                  'status': m.get(record['o_orderstatus'], 'PENDING')})
"""
    return python_transform(o, script=script, output_schema=avro_schema).output


@register(
    "variant_json_events",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(avg(try_cast(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def variant_json_events(spark, sf_dir):
    """Semi-structured VARIANT path (Spark 4): parse_json into a
    VARIANT column once, then typed extraction — the open-schema
    ingestion pattern (vs get_json_object re-parsing the string per
    extraction)."""
    ev = load_table(spark, "events", sf_dir)
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("vprops")
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.try_variant_get(F.col("vprops"), "$.k", "int")), 4).alias("avg_k"),
    )


@register(
    "streaming_delta_ingest",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
    FROM events WHERE event_type <> 'error' GROUP BY event_type
    """,
)
def streaming_delta_ingest(spark, sf_dir):
    """Streaming ingestion INTO the Delta layer: each micro-batch
    commits one atomic append through write_delta's put-if-absent loop
    (exactly-once visibility per batch — a reader never sees a partial
    micro-batch, unlike raw parquet appends), then the table is
    snapshot-read back. The lakehouse landing pattern: stream ->
    foreachBatch -> ACID table -> batch consumers."""
    import os
    import shutil
    import uuid

    from python_plugins_spark.sources.delta_py import read_delta, write_delta
    from python_plugins_spark.sources.io import ensure_session_confs, fix_nanos_ts
    from python_plugins_spark.streaming import read_stream_parquet

    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = fix_nanos_ts(
        read_stream_parquet(spark, f"{sf_dir}/events.parquet", raw_schema)
    )
    filtered = stream.filter(F.col("event_type") != "error").select(
        "event_id", "event_type", "value"
    )
    table = os.path.join(
        _SCRATCH, f"stream_delta_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(table, ignore_errors=True)

    def commit_batch(batch_df, epoch_id):
        # SetTransaction idempotence: a retried/duplicate delivery of
        # the same epoch skips instead of double-appending — true
        # exactly-once, not just per-batch atomicity
        write_delta(batch_df, table, mode="append",
                    txn=("streaming_delta_ingest", epoch_id))

    q = (
        filtered.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", f"{table}_ckpt_{uuid.uuid4().hex[:8]}")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = read_delta(spark, table)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")
    )


@register(
    "delta_stream_source_read",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY event_type
    """,
)
def delta_stream_source_read(spark, sf_dir):
    """Delta table as a STREAMING SOURCE (sources/delta_stream.py — a
    Spark 4 Python DataSource streaming reader): offsets are log
    versions, micro-batch planning replays only the commit JSONs in
    range, and each added data file becomes one executor-side task.
    Two append commits land first; the stream drains them and the
    memory-sink table must equal the batch aggregate — the
    lakehouse-to-stream bridge (downstream jobs tail the table instead
    of re-scanning it)."""
    import os
    import shutil
    import uuid

    from python_plugins_spark.sources import delta_stream
    from python_plugins_spark.sources.delta_py import write_delta
    from python_plugins_spark.sources.io import ensure_session_confs

    ensure_session_confs(spark)
    delta_stream.register(spark)
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )
    table = os.path.join(
        _SCRATCH, f"dstream_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(table, ignore_errors=True)
    write_delta(ev.filter(F.col("event_id") % 2 == 0), table, mode="overwrite")
    write_delta(ev.filter(F.col("event_id") % 2 == 1), table, mode="append")

    stream = spark.readStream.format("delta_py_stream").option("path", table).load()
    name = f"dstream_{uuid.uuid4().hex[:8]}"
    # Aggregate INSIDE the stream: the complete-mode memory table holds
    # only |event_type| grouped rows, never the raw stream (a
    # driver-OOM at scale).
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")
    )
    from python_plugins_spark.streaming.ops import run_to_memory_sink

    return run_to_memory_sink(agg, name, output_mode="complete", state_partitions=8)


@register(
    "delta_cdf_stream_read",
    oracle="""
    SELECT o_orderkey, o_orderstatus, 'insert' AS _change_type,
           CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 1 END AS _commit_version
    FROM orders
    UNION ALL
    SELECT o_orderkey, o_orderstatus, 'delete' AS _change_type,
           2 AS _commit_version
    FROM orders WHERE o_orderkey % 11 = 0
    """,
)
def delta_cdf_stream_read(spark, sf_dir):
    """CDC as a STREAM (sources/delta_stream.py readChangeFeed=true):
    the streaming twin of table_changes — append commits arrive as
    'insert' micro-batch rows, DV deletes as 'delete' rows (the DV
    delta decoded on executors), each stamped with its commit version.
    The downstream-sync primitive: a consumer keeps an exact replica by
    applying the feed, never re-scanning the table."""
    import os
    import shutil

    from python_plugins_spark.sources import delta_stream
    from python_plugins_spark.sources.delta_py import delete_delta, write_delta
    from python_plugins_spark.sources.io import ensure_session_confs

    ensure_session_confs(spark)
    delta_stream.register(spark)
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderstatus")
    table = os.path.join(
        _SCRATCH, f"cdcstream_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(table, ignore_errors=True)
    write_delta(o.filter(F.col("o_orderkey") % 2 == 0), table, mode="overwrite")
    write_delta(o.filter(F.col("o_orderkey") % 2 == 1), table, mode="append")
    delete_delta(spark, table, "o_orderkey % 11 = 0", mode="dv")

    stream = (
        spark.readStream.format("delta_py_stream")
        .option("path", table)
        .option("readChangeFeed", "true")
        .load()
    )
    # Row-level contract (the query RETURNS the feed), so the drain
    # goes to a parquet file sink — rows land executor-side on storage,
    # not in a driver memory table.
    drain_dir = os.path.join(f"{table}_drain", "out")
    ckpt_dir = os.path.join(f"{table}_drain", "ckpt")
    shutil.rmtree(f"{table}_drain", ignore_errors=True)
    q = (
        stream.writeStream.format("parquet")
        .option("path", drain_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(drain_dir).select(
        "o_orderkey", "o_orderstatus", "_change_type", "_commit_version"
    )


@register(
    "streaming_etl_foreachbatch",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value * 2), 4) AS doubled_total
    FROM events WHERE event_type IN ('purchase', 'click')
    GROUP BY event_type
    """,
)
def streaming_etl_foreachbatch(spark, sf_dir):
    """End-to-end streaming ETL: stream -> python_transform ->
    foreachBatch sink writing parquet partitioned by event_type ->
    batch read-back with partition pruning. The full
    source->transform->sink pipeline the reference could only be one
    stage of (BasePythonTransformTest.java:215-222), as one operator."""
    import os
    import shutil
    import uuid

    from python_plugins_spark.sources.io import ensure_session_confs, fix_nanos_ts
    from python_plugins_spark.streaming import read_stream_parquet

    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = fix_nanos_ts(
        read_stream_parquet(spark, f"{sf_dir}/events.parquet", raw_schema)
    )
    script = """
def transform(record, emitter, context):
    if record['event_type'] in ('purchase', 'click'):
        emitter.emit({'event_type': record['event_type'],
                      'doubled': record['value'] * 2})
"""
    from python_plugins_spark.operators.transform import python_transform as _pt

    res = _pt(
        stream, script=script, output_schema="event_type string, doubled double"
    )
    sink = os.path.join(
        _SCRATCH, f"stream_etl_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(sink, ignore_errors=True)

    def write_batch(batch_df, epoch_id):
        batch_df.write.mode("append").partitionBy("event_type").parquet(sink)

    q = (
        res.output.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", f"{sink}_ckpt_{uuid.uuid4().hex[:8]}")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(sink)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("doubled"), 4).alias("doubled_total"),
    )


@register(
    "label_centroids",
    oracle="""
    SELECT label, pos, round(avg(CAST(x AS DOUBLE)), 6) AS centroid_val, count(*) AS n_vecs
    FROM (SELECT label, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) - 1 AS pos
          FROM embeddings)
    GROUP BY label, pos
    """,
)
def label_centroids(spark, sf_dir):
    """Per-label embedding centroids via posexplode + (label, dim)
    aggregation — the distributed way to average vectors (k-means
    update step / class prototypes). The shuffle carries one scalar per
    (vector, dimension); partial aggregation compresses it map-side to
    one partial sum per (label, dim, partition)."""
    emb = load_table(spark, "embeddings", sf_dir)
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "x")
    )
    return exploded.groupBy("label", "pos").agg(
        F.round(F.avg(F.col("x").cast("double")), 6).alias("centroid_val"),
        F.count("*").alias("n_vecs"),
    ).select(
        F.col("label").cast("long").alias("label"),
        F.col("pos").cast("long").alias("pos"),
        "centroid_val",
        "n_vecs",
    )


@register(
    "gap_interpolate_linear",
    oracle=f"""
    WITH agg AS (
      SELECT date_trunc('hour', ts) AS slot,
             CAST(round(avg(value) * 10000) AS BIGINT) AS v4
      FROM events WHERE event_type = 'purchase' AND hour(ts) % 3 <> 0
      GROUP BY 1
    ),
    bounds AS (SELECT min(slot) AS lo, max(slot) AS hi FROM agg),
    slots AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 hour)) AS slot FROM bounds),
    joined AS (
      SELECT s.slot, a.v4,
             last_value(a.v4 IGNORE NULLS) OVER w AS prev_v,
             last_value(CASE WHEN a.v4 IS NOT NULL THEN s.slot END IGNORE NULLS) OVER w AS prev_t,
             first_value(a.v4 IGNORE NULLS) OVER w2 AS next_v,
             first_value(CASE WHEN a.v4 IS NOT NULL THEN s.slot END IGNORE NULLS) OVER w2 AS next_t
      FROM slots s LEFT JOIN agg a ON s.slot = a.slot
      WINDOW w AS (ORDER BY s.slot ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w2 AS (ORDER BY s.slot ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT strftime(slot, '{_STRF}') AS slot,
           CASE WHEN v4 IS NOT NULL THEN v4 / 10000.0
                WHEN prev_v IS NULL THEN next_v / 10000.0
                WHEN next_v IS NULL THEN prev_v / 10000.0
                ELSE ((2 * (prev_v * CAST(epoch(next_t) - epoch(slot) AS BIGINT)
                            + next_v * CAST(epoch(slot) - epoch(prev_t) AS BIGINT))
                       + CAST(epoch(next_t) - epoch(prev_t) AS BIGINT))
                      // (2 * CAST(epoch(next_t) - epoch(prev_t) AS BIGINT))) / 10000.0
           END AS v_interp,
           (v4 IS NULL) AS was_gap
    FROM joined
    """,
)
def gap_interpolate_linear(spark, sf_dir):
    """Linear-interpolation gap fill (hypertable `interpolate()`):
    hourly averages with artificial gaps, missing slots interpolated
    between the nearest non-null neighbors via last/first IGNORE NULLS
    windows. The windows run over the SPINE (one row per hour), not the
    raw events — a single-partition window over a frame that stays tiny
    at any corpus scale (the heavy lifting, the per-slot aggregate,
    shuffles on slot as usual)."""
    ev = load_table(spark, "events", sf_dir)
    agg = (
        ev.filter((F.col("event_type") == "purchase") & (F.hour("ts") % 3 != 0))
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("slot"))
        # FIXED-POINT before interpolation: interpolating in exact
        # integer ten-thousandths (single float division at the end)
        # makes the result bit-identical across engines — raw-double
        # interpolation lands on .5 rounding boundaries at exact
        # midpoints, where 1-ulp accumulation noise flips the digit
        .agg(F.round(F.avg("value") * 10000).cast("long").alias("v4"))
    )
    bounds = agg.agg(F.min("slot").alias("lo"), F.max("slot").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("slot")
    )
    j = spine.join(agg, on="slot", how="left")
    w_back = Window.orderBy("slot").rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = Window.orderBy("slot").rowsBetween(0, Window.unboundedFollowing)
    slot_if_v = F.when(F.col("v4").isNotNull(), F.col("slot"))
    j = j.select(
        "slot",
        "v4",
        F.last("v4", ignorenulls=True).over(w_back).alias("prev_v"),
        F.last(slot_if_v, ignorenulls=True).over(w_back).alias("prev_t"),
        F.first("v4", ignorenulls=True).over(w_fwd).alias("next_v"),
        F.first(slot_if_v, ignorenulls=True).over(w_fwd).alias("next_t"),
    )
    es, ep, en = (
        F.unix_timestamp("slot"),
        F.unix_timestamp("prev_t"),
        F.unix_timestamp("next_t"),
    )
    # half-up rounding to 4dp done in INTEGER arithmetic ((2n+d) div 2d):
    # Spark's BigDecimal round and DuckDB's scaled-double round disagree
    # on exact .xxxx5 midpoints, which linear interpolation produces
    # constantly (midpoint of two 4dp values); integers never do
    num = F.col("prev_v") * (en - es) + F.col("next_v") * (es - ep)
    den = en - ep
    j = j.withColumn("_num", num).withColumn("_den", den)
    interp = (
        F.when(F.col("v4").isNotNull(), F.col("v4") / 10000.0)
        .when(F.col("prev_v").isNull(), F.col("next_v") / 10000.0)
        .when(F.col("next_v").isNull(), F.col("prev_v") / 10000.0)
        .otherwise(F.expr("(2 * _num + _den) div (2 * _den)") / 10000.0)
    )
    return j.select(
        _ts(F.col("slot")).alias("slot"),
        interp.alias("v_interp"),
        F.col("v4").isNull().alias("was_gap"),
    )


@register(
    "streaming_dedup_watermark",
    oracle="""
    SELECT user_id, event_type, count(*) AS n FROM (
      SELECT DISTINCT user_id, event_type, ts FROM events
    ) GROUP BY user_id, event_type
    """,
)
def streaming_dedup_watermark(spark, sf_dir):
    """Streaming deduplication: dropDuplicates on (user_id, event_type,
    ts) with a watermark bounding the dedup state (old keys are evicted
    once the watermark passes — without it, state grows with the
    stream). Single-micro-batch result equals batch DISTINCT, which the
    oracle checks; state eviction semantics follow the watermark rules
    verified in tests/test_streaming.py."""
    import uuid

    from python_plugins_spark.sources.io import ensure_session_confs, fix_nanos_ts
    from python_plugins_spark.streaming import read_stream_parquet, run_to_memory_sink

    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = fix_nanos_ts(
        read_stream_parquet(spark, f"{sf_dir}/events.parquet", raw_schema)
    )
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "event_type", "ts"])
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    return run_to_memory_sink(deduped, name, output_mode="complete")


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(str_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rn
      FROM scored
    )
    SELECT doc_id, term, tfidf, rn FROM ranked WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """TF-IDF top-3 terms per document — the classic text-pipeline
    relevance operator as three aggregations sharing one tokenization:
    tf (doc,term), df (term, broadcastable — vocabulary << corpus),
    and the corpus count as a literal. Ranking uses the ROUNDED score +
    term tie-break so both engines select the identical set."""
    from python_plugins_spark.functions import tokens as _tokens

    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.count()
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df_), on="term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf", F.col("rn").cast("long").alias("rn"))
    )


@register(
    "histogram_events",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 50.0) AS BIGINT) AS bin,
           count(*) AS n,
           round(min(value), 4) AS bin_min,
           round(max(value), 4) AS bin_max
    FROM events GROUP BY 1, 2
    """,
)
def histogram_events(spark, sf_dir):
    """Fixed-width histogram (floor binning — engine-portable, unlike
    width_bucket which DuckDB lacks): one hash aggregate, the
    distributed histogram primitive."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy(
        "event_type",
        F.floor(F.col("value") / 50.0).cast("long").alias("bin"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 4).alias("bin_min"),
        F.round(F.max("value"), 4).alias("bin_max"),
    )


@register(
    "binaryfile_source_ingest",
    oracle="""
    SELECT doc_id, length(text) AS byte_len, md5(text) AS content_md5
    FROM documents WHERE doc_id < 40
    """,
)
def binaryfile_source_ingest(spark, sf_dir):
    """Multimodal ingestion source: opaque files on disk read via the
    binaryFile format as (path, content-bytes) rows — the entry point
    for image/audio corpora. Files are materialized from the documents
    table (ASCII corpus -> bytes == utf8 text, so the md5 oracle is
    exact); doc identity recovered from the file name, exactly as a
    real media pipeline keys on object-store paths. Fixture files come
    from sources/fixtures.py (shared setup, not part of the read path
    under test)."""
    from python_plugins_spark.sources.fixtures import binary_doc_dir

    binf = spark.read.format("binaryFile").load(binary_doc_dir(sf_dir))
    return binf.select(
        F.regexp_extract(F.element_at(F.split("path", "/"), -1), r"(\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.length("content").cast("long").alias("byte_len"),
        F.md5("content").alias("content_md5"),
    )


# =====================================================================
# Batch 10: q7/q8/q9/q12 TPC-H shapes; boilerplate detection and PII
# scrubbing for LLM data prep
# =====================================================================

@register(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
                      JOIN orders o ON o.o_orderkey = l.l_orderkey
                      JOIN customer c ON c.c_custkey = o.o_custkey
                      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
                      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume — the same dimension
    table joined twice under different roles, with a cross-role
    disjunctive filter."""
    s = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                  JOIN orders o ON o.o_orderkey = l.l_orderkey
                  JOIN customer c ON c.c_custkey = o.o_custkey
                  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
                  JOIN region r ON r.r_regionkey = n1.n_regionkey
                  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: a nation's share of regional promo volume per
    year — conditional-sum ratio over a 7-way join (all dims broadcast,
    only orders|x|lineitem shuffles)."""
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
    )
    return joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
            / F.sum(vol),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.1 * p.p_retailprice * l.l_quantity AS amount
      FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                  JOIN orders o ON o.o_orderkey = l.l_orderkey
                  JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
)
def q9_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9 shape (adapted: no partsupp -> unit cost proxied at 10%
    of retail price): profit on a part family by supplier nation and
    order year."""
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%red%"))
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(F.round(F.sum(amount), 4).alias("sum_profit"))


@register(
    "q12_priority_by_class",
    oracle="""
    SELECT l.l_returnflag,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_by_class(spark, sf_dir):
    """TPC-H Q12 shape (shipmode -> returnflag on the trimmed schema):
    conditional counts split by priority class over a fact join."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "boilerplate_ngrams",
    oracle=TX.boilerplate_ngrams_oracle_sql("documents", "text", "doc_id", 3, 5),
)
def boilerplate_ngrams(spark, sf_dir):
    """Boilerplate detection: word trigrams appearing in >= 5 distinct
    documents — the cross-document repetition signal used to strip
    template/header text before LLM training. Shares the dedup
    module's shingle machinery (one shuffle on doc_id for shingling,
    one distinct-agg on the gram)."""
    return TX.boilerplate_ngrams(
        load_table(spark, "documents", sf_dir), "text", "doc_id", 3, 5
    )


@register(
    "scrub_pii_docs",
    oracle="""
    SELECT doc_id,
           length(text) - length(regexp_replace(text, '[0-9]+(\\.[0-9]+)?', '', 'g'))
             AS chars_scrubbed,
           md5(regexp_replace(text, '[0-9]+(\\.[0-9]+)?', '<NUM>', 'g')) AS scrubbed_md5
    FROM documents
    """,
)
def scrub_pii_docs(spark, sf_dir):
    """PII-style scrubbing: numeric tokens replaced with a sentinel
    (the shape of email/phone/SSN redaction — same regexp_replace
    machinery, swap the pattern). md5 of the scrubbed text proves
    byte-identical transformation against the oracle."""
    docs = load_table(spark, "documents", sf_dir)
    pat = r"[0-9]+(\.[0-9]+)?"
    scrubbed = F.regexp_replace(F.col("text"), pat, "<NUM>")
    removed = F.length("text") - F.length(F.regexp_replace(F.col("text"), pat, ""))
    return docs.select(
        "doc_id",
        removed.cast("long").alias("chars_scrubbed"),
        F.md5(scrubbed.cast("binary")).alias("scrubbed_md5"),
    )


@register(
    "q11_value_concentration",
    oracle="""
    SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 4) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING sum(l_extendedprice * l_quantity)
           > (SELECT sum(l_extendedprice * l_quantity) * 0.0008 FROM lineitem)
    """,
)
def q11_value_concentration(spark, sf_dir):
    """TPC-H Q11 shape: groups whose share exceeds a fraction of the
    GLOBAL total — scalar subquery against the same fact table. The
    global sum stays in-plan as a one-row broadcast crossJoin (no
    collect(): one job, whole-plan AQE — VERDICT r2 #7)."""
    li = load_table(spark, "lineitem", sf_dir)
    val = F.col("l_extendedprice") * F.col("l_quantity")
    total = li.agg(F.sum(val).alias("_total"))
    return (
        li.groupBy("l_partkey")
        .agg(
            F.round(F.sum(val), 4).alias("part_value"),
            F.sum(val).alias("_raw"),
        )
        .crossJoin(F.broadcast(total))
        .filter(F.col("_raw") > F.col("_total") * 0.0008)
        .drop("_raw", "_total")
    )


@register(
    "q16_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#4' AND p.p_size IN (1, 5, 10, 15, 20)
    GROUP BY p.p_brand, p.p_size
    """,
)
def q16_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    under exclusion filters (broadcast the filtered part dim; the
    distinct agg is the only shuffle)."""
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#4") & F.col("p_size").isin(1, 5, 10, 15, 20)
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "scd2_history",
    oracle=f"""
    SELECT user_id, event_type,
           round(value, 4) AS value,
           strftime(ts, '{_STRF}') AS valid_from,
           strftime(lead(ts) OVER w, '{_STRF}') AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    """,
)
def scd2_history(spark, sf_dir):
    """SCD type-2 history build (no MERGE needed): each change of a
    key becomes a versioned row with [valid_from, valid_to) from the
    next change's timestamp; open-ended rows are current. One window
    pass — the emulation the v1 engine uses where Delta's MERGE INTO
    would otherwise apply."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") <= 20)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        F.round(F.col("value"), 4).alias("value"),
        _ts(F.col("ts")).alias("valid_from"),
        _ts(nxt).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "neardup_clusters_recursive_sql",
    oracle=D.neardup_clusters_oracle_sql("documents", "text", "doc_id", 0.5),
)
def neardup_clusters_recursive_sql(spark, sf_dir):
    """Near-dup clustering via a RECURSIVE CTE (Spark 4.1 supports
    WITH RECURSIVE): reachability closure over the verified pair graph
    — the declarative twin of the iterative min-label implementation
    (neardup_clusters_docs), sharing its oracle verbatim. The recursion
    runs over the pair graph (tiny after LSH+Jaccard), not the corpus."""
    docs = load_table(spark, "documents", sf_dir)
    # shared, already-checkpointed pair graph: every recursion
    # iteration re-references the view, so it must be materialized —
    # an unmaterialized view would re-run the whole LSH+Jaccard
    # pipeline per iteration (~8x the work)
    _neardup_edges(spark, sf_dir).select("id_a", "id_b").createOrReplaceTempView("_rc_pairs")
    docs.select("doc_id").transform(stage_checkpoint).createOrReplaceTempView("_rc_docs")
    # Spark 4.1 recursion supports UNION ALL only (no dedup across
    # iterations), so cycles would ping-pong forever; the walk is
    # depth-bounded and prunes non-improving labels (lab < src). Near-
    # dup components are shallow stars — depth 8 covers diameters the
    # iterative implementation needs 8 rounds for.
    return spark.sql(
        """
        WITH RECURSIVE _walk(id, lab, depth) AS (
          SELECT doc_id, doc_id, 0 FROM _rc_docs
          UNION ALL
          SELECT e.src, w.lab, w.depth + 1
          FROM (SELECT id_a AS src, id_b AS dst FROM _rc_pairs
                UNION ALL SELECT id_b, id_a FROM _rc_pairs) e
          JOIN _walk w ON w.id = e.dst
          WHERE w.depth < 8 AND w.lab < e.src
        )
        SELECT id AS doc_id, min(lab) AS cluster_id,
               id = min(lab) AS is_canonical
        FROM _walk GROUP BY id
        """
    )


@register(
    "transform_union_type",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'str' ELSE 'long' END AS tag,
           CASE WHEN o_totalprice > 200000 THEN 'big:' || o_orderstatus END AS member_0,
           CASE WHEN o_totalprice <= 200000 THEN CAST(round_even(o_totalprice, 0) AS BIGINT) END
             AS member_1
    FROM orders WHERE o_custkey <= 50
    """,
)
def transform_union_type(spark, sf_dir):
    """General (non-null) CDAP union types end-to-end (SURVEY.md §7
    hard part): declared as ["string","long"] in the Avro-JSON output
    schema, emulated as a tagged struct {tag, member_0, member_1} —
    explicit-tag dispatch instead of the reference's exception-driven
    member probing (PythonObjectsEncoder.java:78-88)."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 50)
    avro_schema = """
    {"type": "record", "name": "out", "fields": [
      {"name": "o_orderkey", "type": "long"},
      {"name": "u", "type": ["string", "long"]}
    ]}
    """
    script = """
def transform(record, emitter, context):
    if record['o_totalprice'] > 200000:
        u = {'tag': 'str', 'member_0': 'big:' + record['o_orderstatus'], 'member_1': None}
    else:
        u = {'tag': 'long', 'member_0': None, 'member_1': int(round(record['o_totalprice']))}
    emitter.emit({'o_orderkey': record['o_orderkey'], 'u': u})
"""
    out = python_transform(o, script=script, output_schema=avro_schema).output
    return out.select(
        "o_orderkey",
        F.col("u.tag").alias("tag"),
        F.col("u.member_0").alias("member_0"),
        F.col("u.member_1").alias("member_1"),
    )


@register(
    "text_source_roundtrip",
    oracle="""
    SELECT count(*) AS n_lines,
           sum(length(text)) AS total_chars,
           min(length(text)) AS min_len,
           max(length(text)) AS max_len
    FROM documents
    """,
)
def text_source_roundtrip(spark, sf_dir):
    """Line-oriented text format: documents written one per line, read
    back as raw lines (the ingestion format of most web-scrape dumps;
    corpus is single-line ASCII so line == document)."""
    import os

    docs = load_table(spark, "documents", sf_dir)
    path = os.path.join(_SCRATCH, f"text_{os.path.basename(sf_dir.rstrip('/'))}")
    docs.select("text").write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    return lines.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min(F.length("value")).alias("min_len"),
        F.max(F.length("value")).alias("max_len"),
    )


@register(
    "filtered_aggregates",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
           round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 4)
             AS discounted_price,
           round(avg(l_tax) FILTER (WHERE l_linestatus = 'F'), 6) AS avg_tax_finished
    FROM lineitem GROUP BY l_returnflag
    """,
)
def filtered_aggregates(spark, sf_dir):
    """ANSI aggregate FILTER clauses — per-aggregate predicates in a
    single pass (vs one scan per conditional aggregate)."""
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("_fa_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
               round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 4)
                 AS discounted_price,
               round(avg(l_tax) FILTER (WHERE l_linestatus = 'F'), 6) AS avg_tax_finished
        FROM _fa_lineitem GROUP BY l_returnflag
        """
    )


@register(
    "inline_structs_orders",
    oracle="""
    SELECT o_orderkey, u.m AS metric, round(u.v, 4) AS val
    FROM (
      SELECT o_orderkey, unnest([
        {'m': 'total', 'v': o_totalprice},
        {'m': 'half', 'v': o_totalprice / 2}
      ]) AS u
      FROM orders WHERE o_custkey <= 25
    )
    """,
)
def inline_structs_orders(spark, sf_dir):
    """inline(): explode an array of structs into columns directly —
    the struct-fanout variant of explode (reference ARRAY-of-RECORD
    types, PythonObjectsEncoder.java:53-62, as a relational op)."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 25)
    arr = F.array(
        F.struct(F.lit("total").alias("m"), F.col("o_totalprice").alias("v")),
        F.struct(F.lit("half").alias("m"), (F.col("o_totalprice") / 2).alias("v")),
    )
    return o.select("o_orderkey", F.inline(arr)).select(
        "o_orderkey", F.col("m").alias("metric"), F.round(F.col("v"), 4).alias("val")
    )


@register(
    "crosstab_status_priority",
    oracle="""
    SELECT o_orderstatus AS o_orderstatus_o_orderpriority,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
           count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
           count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
           count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
    FROM orders GROUP BY o_orderstatus
    """,
)
def crosstab_status_priority(spark, sf_dir):
    """Contingency table via df.stat.crosstab — the DataFrame stat API
    surface (pair-frequency matrix in one pass)."""
    o = load_table(spark, "orders", sf_dir)
    ct = o.stat.crosstab("o_orderstatus", "o_orderpriority")
    cols = [c for c in ct.columns if c != "o_orderstatus_o_orderpriority"]
    return ct.select(
        "o_orderstatus_o_orderpriority",
        *[F.col(f"`{c}`").cast("long").alias(c) for c in sorted(cols)],
    )


@register(
    "null_safe_join",
    oracle="""
    WITH a AS (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer),
         b AS (SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg FROM customer)
    SELECT coalesce(a.seg, '<null>') AS seg, count(*) AS n
    FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    GROUP BY 1
    """,
)
def null_safe_join(spark, sf_dir):
    """Null-safe equality join (eqNullSafe / IS NOT DISTINCT FROM):
    null keys MATCH null keys — still a hash join (null-safe equality
    is an equi-join key), unlike `=` which silently drops null rows."""
    c = load_table(spark, "customer", sf_dir)
    a = c.select(
        "c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    )
    b = a.select("seg").distinct().withColumnRenamed("seg", "b_seg")
    return (
        a.join(b, a.seg.eqNullSafe(b.b_seg))
        .groupBy(F.coalesce(F.col("seg"), F.lit("<null>")).alias("seg"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "running_distinct_users",
    oracle=f"""
    WITH marked AS (
      SELECT event_type, ts, event_id,
             CASE WHEN row_number() OVER (PARTITION BY event_type, user_id
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT event_type, strftime(ts, '{_STRF}') AS ts_s, event_id,
           sum(first_seen) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS distinct_users_so_far
    FROM marked
    """,
)
def running_distinct_users(spark, sf_dir):
    """Running DISTINCT count over event time. Spark has no
    COUNT(DISTINCT) OVER; the collect_set-size workaround holds every
    distinct key in window state. This is the scale formulation: mark
    each key's FIRST occurrence (one row_number pass), then a running
    sum of markers — state per window row is one integer regardless of
    key cardinality. Both engines run the identical construction."""
    ev = load_table(spark, "events", sf_dir)
    w_first = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.withColumn(
            "first_seen",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .select(
            "event_type",
            _ts(F.col("ts")).alias("ts_s"),
            "event_id",
            F.sum("first_seen").over(w_run).alias("distinct_users_so_far"),
        )
    )


@register(
    "bool_aggregates",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_discount <= 0.1) AS all_low_discount,
           bool_or(l_quantity >= 50) AS any_max_qty,
           count(*) FILTER (WHERE l_tax = 0) AS n_tax_free
    FROM lineitem GROUP BY l_returnflag
    """,
)
def bool_aggregates(spark, sf_dir):
    """Boolean aggregates (every/any) + a filtered count — predicate
    summaries in one hash aggregate."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.every(F.col("l_discount") <= 0.1).alias("all_low_discount"),
        F.some(F.col("l_quantity") >= 50).alias("any_max_qty"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_tax_free"),
    )


@register(
    "hash_encode_docs",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           to_base64(text::BLOB) AS b64,
           lower(hex(substr(text, 1, 8))) AS head_hex
    FROM documents WHERE doc_id < 100
    """,
)
def hash_encode_docs(spark, sf_dir):
    """Hash/encoding scalar catalog: md5, sha256, base64, hex — the
    content-addressing primitives of dedup and caching layers."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        # Spark base64 emits MIME 76-char line wraps; strip for RFC 4648
        F.regexp_replace(F.base64(F.col("text").cast("binary")), "[\\r\\n]", "").alias(
            "b64"
        ),
        F.lower(F.hex(F.substring("text", 1, 8))).alias("head_hex"),
    )


@register(
    "levenshtein_candidate_pairs",
    oracle=f"""
    WITH _jp AS ({D.ngram_jaccard_pairs_oracle_sql("documents", "text", "doc_id", 0.5)}),
    t AS (SELECT doc_id, text FROM documents)
    SELECT p.id_a, p.id_b, levenshtein(a.text, b.text) AS edit_dist
    FROM _jp p JOIN t a ON a.doc_id = p.id_a JOIN t b ON b.doc_id = p.id_b
    """,
)
def levenshtein_candidate_pairs(spark, sf_dir):
    """Edit-distance verification on near-dup candidate pairs — the
    character-level complement to shingle Jaccard. O(len^2) per pair,
    so it ONLY ever runs on the candidate set, never the corpus."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = _neardup_edges(spark, sf_dir)
    t = docs.select("doc_id", "text")
    a = t.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = t.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    return (
        pairs.select("id_a", "id_b")
        .join(a, on="id_a")
        .join(b, on="id_b")
        .select("id_a", "id_b", F.levenshtein("ta", "tb").cast("long").alias("edit_dist"))
    )


@register(
    "transform_batch_mode",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS net_sum
    FROM lineitem GROUP BY l_returnflag
    """,
)
def transform_batch_mode(spark, sf_dir):
    """batch_mode: the vectorized escape hatch of python_transform —
    user code receives a whole pandas DataFrame per Arrow batch (no
    per-record loop, no emitter). The right mode when the user logic is
    already columnar pandas."""
    import pandas as pd

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )

    def net(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": pdf["l_returnflag"],
                "net": pdf["l_extendedprice"] * (1.0 - pdf["l_discount"]),
            }
        )

    out = python_transform(
        li, func=net, output_schema="l_returnflag string, net double", batch_mode=True
    ).output
    return out.groupBy("l_returnflag").agg(
        F.sum(F.col("net").cast("decimal(18,6)")).cast("double").alias("net_sum")
    )


@register(
    "explode_outer_long_tokens",
    oracle="""
    SELECT d.doc_id, t.tok
    FROM documents d LEFT JOIN LATERAL (
      SELECT unnest(list_filter(str_split_regex(lower(trim(d.text)), '\\s+'),
                    x -> length(x) > 6)) AS tok
    ) t ON true
    """,
)
def explode_outer_long_tokens(spark, sf_dir):
    """explode_outer: null-preserving explosion — documents whose
    filtered token array is EMPTY survive with a null token (plain
    explode silently drops them, the classic lost-rows bug in
    fan-out pipelines)."""
    from python_plugins_spark.functions import tokens as _tokens

    docs = load_table(spark, "documents", sf_dir)
    long_toks = F.filter(_tokens(F.col("text")), lambda x: F.length(x) > 6)
    return docs.select(
        "doc_id", F.explode_outer(long_toks).alias("tok")
    )


@register(
    "date_arithmetic_orders",
    oracle="""
    SELECT o_orderkey,
           date_diff('day', o_orderdate, TIMESTAMP '1998-12-31') AS days_to_eoy,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
           quarter(o_orderdate) AS q,
           isodow(o_orderdate) AS dow,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qstart
    FROM orders WHERE o_custkey <= 100
    """,
)
def date_arithmetic_orders(spark, sf_dir):
    """Date-arithmetic catalog: day differences, month addition,
    quarter extraction/truncation, ISO weekday — cross-engine
    semantics pinned (Spark dayofweek is Sunday-based; weekday()+1
    equals ISO dow)."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 100)
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("1998-12-31"), F.col("o_orderdate")).cast("long").alias(
            "days_to_eoy"
        ),
        F.date_format(F.add_months(F.col("o_orderdate"), 3), "yyyy-MM-dd").alias(
            "plus3m"
        ),
        F.quarter("o_orderdate").cast("long").alias("q"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("dow"),
        F.date_format(F.date_trunc("quarter", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "qstart"
        ),
    )


@register(
    "safe_arithmetic",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice / nullif(o_custkey % 3, 0), 4) AS per_bucket,
           try_cast(substr(o_orderpriority, 1, 1) AS INT) AS prio_digit,
           try_cast(o_orderpriority AS INT) AS prio_whole
    FROM orders WHERE o_custkey <= 200
    """,
)
def safe_arithmetic(spark, sf_dir):
    """Error-safe arithmetic: try_divide (null on /0 instead of a task
    failure under ANSI mode) and try_cast (null on malformed input) —
    the non-throwing path for dirty data at scale."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 200)
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 3), 4).alias(
            "per_bucket"
        ),
        F.try_to_number(F.substring("o_orderpriority", 1, 1), F.lit("9"))
        .cast("int")
        .alias("prio_digit"),
        # whole string is not a number -> null on both engines
        F.try_to_number(F.col("o_orderpriority"), F.lit("999999999")).cast("int").alias(
            "prio_whole"
        ),
    )

# =====================================================================
