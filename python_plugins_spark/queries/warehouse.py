"""Warehouse lifecycle: compaction, dynamic partition overwrite, write-audit-publish, SCD2, Delta/Iceberg registry queries, distribution diagnostics, exact-distinct structures.

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

from python_plugins_spark.queries.sources_sinks import _SCRATCH  # noqa: F401
from python_plugins_spark.session import (
    stage_checkpoint,
    stage_checkpoint_iterative,
)


# Warehouse lifecycle: compaction, dynamic partition overwrite,
# schema evolution (§2c sinks category — the table-maintenance ops a
# 100 TB corpus store lives or dies by)
# =====================================================================

@register(
    "compact_small_files",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 4) AS qty
    FROM lineitem WHERE l_orderkey < 4000 GROUP BY l_returnflag
    """,
)
def compact_small_files(spark, sf_dir):
    """Small-file compaction: a fragmented dataset (32 shards — the
    classic too-many-tasks / NameNode-pressure pathology) rewritten
    through coalesce(2) into large files, then read back and verified
    byte-identical by aggregate. coalesce is the right primitive here:
    it MERGES partitions without a shuffle (repartition would pay one);
    at 100 TB you'd target file size via
    spark.sql.files.maxRecordsPerFile and AQE rebalance instead of a
    fixed count. The oracle pins that compaction is content-neutral."""
    import os

    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 4000)
    tag = os.path.basename(sf_dir.rstrip("/"))
    frag = os.path.join(_SCRATCH, f"frag_{tag}")
    compact = os.path.join(_SCRATCH, f"compact_{tag}")
    li.repartition(32).write.mode("overwrite").parquet(frag)
    frag_df = spark.read.parquet(frag)
    frag_df.coalesce(2).write.mode("overwrite").parquet(compact)
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    n_comp = len([f for f in os.listdir(compact) if f.endswith(".parquet")])
    assert n_comp < n_frag, (n_frag, n_comp)
    return (
        spark.read.parquet(compact)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("qty"))
    )


@register(
    "dynamic_partition_overwrite",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
                          ELSE o_totalprice END), 4) AS total
    FROM orders WHERE o_orderkey < 6000
    GROUP BY o_orderstatus
    """,
)
def dynamic_partition_overwrite(spark, sf_dir):
    """Dynamic partition overwrite (partitionOverwriteMode=dynamic):
    rewriting ONE partition of a partitioned table replaces only the
    partitions present in the incoming data — the incremental-restate
    primitive (fix yesterday's partition without touching the other
    9,999). Static mode would truncate the whole table first; the
    read-back proves untouched partitions survived and the restated
    one carries the new values (status-F prices doubled)."""
    import os

    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 6000)
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(_SCRATCH, f"dyn_part_{tag}")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    restated = (
        o.filter(F.col("o_orderstatus") == "F")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    (
        restated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    return (
        spark.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"))
    )


@register(
    "parquet_merge_schema_evolution",
    oracle="""
    SELECT
        count(*) AS n_rows,
        sum(CASE WHEN n_nation IS NULL THEN 1 ELSE 0 END) AS n_legacy,
        sum(n_nation) AS nation_sum
    FROM (
        SELECT s_suppkey, NULL::BIGINT AS n_nation FROM supplier WHERE s_suppkey % 2 = 0
        UNION ALL
        SELECT s_suppkey, s_nationkey AS n_nation FROM supplier WHERE s_suppkey % 2 = 1
    )
    """,
)
def parquet_merge_schema_evolution(spark, sf_dir):
    """Additive schema evolution on a parquet dataset: generation-1
    files lack a column that generation-2 files carry; mergeSchema=true
    reconciles the footers into the union schema, null-filling legacy
    rows — how a long-lived corpus store absorbs new metadata columns
    without rewriting history. (Footer merging scans all footers: at
    100 TB you pin the schema in a metastore instead; the read-side
    semantics are what's verified here.)"""
    import os

    sup = load_table(spark, "supplier", sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(_SCRATCH, f"evolve_{tag}")
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    (
        sup.filter(F.col("s_suppkey") % 2 == 0)
        .select("s_suppkey")
        .write.mode("append")
        .parquet(path)
    )
    (
        sup.filter(F.col("s_suppkey") % 2 == 1)
        .select("s_suppkey", F.col("s_nationkey").alias("n_nation"))
        .write.mode("append")
        .parquet(path)
    )
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("n_nation").isNull().cast("long")).alias("n_legacy"),
        F.sum("n_nation").alias("nation_sum"),
    )


@register(
    "jdbc_roundtrip_partitioned",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderkey < 5000
    GROUP BY o_orderstatus
    """,
)
def jdbc_roundtrip_partitioned(spark, sf_dir):
    """JDBC source/sink roundtrip against embedded Derby (the JDBC
    driver shipped with Spark's own jars): write a table out, read it
    back as a PARTITIONED scan (partitionColumn/lower/upper/
    numPartitions=4), so the read issues 4 range-predicate queries in
    parallel — the only way a JDBC ingest scales; an unpartitioned
    read funnels the whole table through one task. Aggregate-only
    pushdown caveat: Spark pushes the range predicates, not the
    groupBy, so at 100 TB you land JDBC data into parquet once and
    query that (this op IS that landing step)."""
    import os

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    url = f"jdbc:derby:{_SCRATCH}/derby_{tag};create=true"
    o = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") < 5000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    (
        o.write.mode("overwrite")
        .format("jdbc")
        .option("url", url)
        .option("dbtable", "orders_jdbc")
        .save()
    )
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "orders_jdbc")
        .option("partitionColumn", "o_orderkey")
        .option("lowerBound", "0")
        .option("upperBound", "5000")
        .option("numPartitions", "4")
        .load()
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "str_to_map_stack_unpivot",
    oracle="""
    SELECT o_orderkey, k, v FROM (
        SELECT o_orderkey, 'status' AS k, o_orderstatus AS v
        FROM orders WHERE o_orderkey < 300
        UNION ALL
        SELECT o_orderkey, 'prio', o_orderpriority
        FROM orders WHERE o_orderkey < 300
    )
    """,
)
def str_to_map_stack_unpivot(spark, sf_dir):
    """Key=value wire-format parsing (str_to_map) + stack() row
    generation: serialize attributes to 'k=v;k=v', parse back to a map,
    then unpivot map lookups into (key, value) rows with stack — the
    pattern for ingesting loosely-typed kv logs (the reference's
    record-as-dict worldview, PythonObjectsEncoder.java:38-213) into
    relational form. All codegen: str_to_map and stack are native
    expressions; stack is the fixed-arity UNPIVOT (see
    unpivot_lineitem_measures for the API form)."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 300)
    kv = F.concat(
        F.lit("status="), F.col("o_orderstatus"),
        F.lit(";prio="), F.col("o_orderpriority"),
    )
    m = F.expr("str_to_map(kv, ';', '=')")
    return (
        o.select("o_orderkey", kv.alias("kv"))
        .select("o_orderkey", m.alias("m"))
        .select(
            "o_orderkey",
            F.expr("stack(2, 'status', m['status'], 'prio', m['prio']) AS (k, v)"),
        )
    )


@register(
    "multimodal_audio_frame_energy",
    oracle="""
    WITH clips AS (
        SELECT doc_id FROM documents WHERE doc_id < 50
    ),
    wins AS (
        SELECT doc_id, s AS win_start
        FROM clips, LATERAL (SELECT unnest(generate_series(0, 120, 20)) AS s)
    )
    SELECT doc_id, win_start,
           round(sqrt(list_sum(list_transform(generate_series(win_start, win_start + 39),
                 i -> pow((((doc_id * 31 + i * 17) % 201 - 100) / 100.0), 2))) / 40.0),
                 6) AS rms
    FROM wins
    """,
)
def multimodal_audio_frame_energy(spark, sf_dir):
    """Audio feature extraction plumbing: framed RMS energy over a
    sliding window (40-sample frames, hop 20 — the standard STFT
    windowing shape). The waveform is a deterministic synthetic PCM
    recurrence (no audio libs in this container — the decode stub
    pattern of multimodal_fake_decode), but the windowing math, frame
    fan-out, and in-order energy fold are the real pipeline: per-clip
    arrays stay row-local (sequence -> transform -> slice -> fold, all
    codegen, zero shuffle), which is exactly how you'd frame 100 TB of
    decoded PCM without moving it."""
    clips = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 50).select("doc_id")
    samples = F.transform(
        F.sequence(F.lit(0), F.lit(159)),
        lambda i: ((F.col("doc_id") * 31 + i * 17) % 201 - 100) / 100.0,
    )
    wins = clips.select(
        "doc_id",
        samples.alias("pcm"),
        F.explode(F.sequence(F.lit(0), F.lit(120), F.lit(20))).alias("win_start"),
    )
    frame = F.slice("pcm", F.col("win_start") + 1, 40)
    energy = F.aggregate(frame, F.lit(0.0), lambda acc, x: acc + x * x)
    return wins.select(
        "doc_id",
        "win_start",
        F.round(F.sqrt(energy / 40.0), 6).alias("rms"),
    )


@register(
    "image_patch_grid",
    oracle="""
    WITH imgs AS (
        SELECT doc_id,
               (64 + (doc_id % 5) * 32)::INT AS w,
               (48 + (doc_id % 3) * 16)::INT AS h
        FROM documents WHERE doc_id < 40
    )
    SELECT doc_id, px, py,
           px * 16 AS x0, py * 16 AS y0,
           least(px * 16 + 16, w) AS x1, least(py * 16 + 16, h) AS y1
    FROM imgs,
         LATERAL (SELECT unnest(generate_series(0, (w + 15) // 16 - 1)) AS px),
         LATERAL (SELECT unnest(generate_series(0, (h + 15) // 16 - 1)) AS py)
    """,
)
def image_patch_grid(spark, sf_dir):
    """ViT-style image patch extraction plumbing: from per-image
    (width, height) metadata — here a deterministic synthetic shape, as
    the container has no image libs — derive the 16x16 patch grid with
    edge clamping, fanning each image out to its patch coordinate rows.
    This is the schema + fan-out half of vision preprocessing (the
    pixel gather happens inside the decode UDF at the produced
    offsets); double explode is narrow, so patching 100 TB of images
    is shuffle-free."""
    imgs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 40)
        .select(
            "doc_id",
            (64 + (F.col("doc_id") % 5) * 32).cast("int").alias("w"),
            (48 + (F.col("doc_id") % 3) * 16).cast("int").alias("h"),
        )
    )
    px = F.explode(F.sequence(F.lit(0), ((F.col("w") + 15) / 16).cast("int") - 1)).alias("px")
    out = imgs.select("doc_id", "w", "h", px)
    py = F.explode(F.sequence(F.lit(0), ((F.col("h") + 15) / 16).cast("int") - 1)).alias("py")
    out = out.select("doc_id", "w", "h", "px", py)
    return out.select(
        "doc_id",
        "px",
        "py",
        (F.col("px") * 16).alias("x0"),
        (F.col("py") * 16).alias("y0"),
        F.least(F.col("px") * 16 + 16, F.col("w")).alias("x1"),
        F.least(F.col("py") * 16 + 16, F.col("h")).alias("y1"),
    )


@register(
    "sentence_split_docs",
    oracle="""
    WITH marked AS (
        SELECT doc_id,
               regexp_replace(trim(text) || ' ', '((\\S+ ){8})', '\\1@@ ', 'g') AS mt
        FROM documents WHERE doc_id < 100 AND length(trim(text)) > 0
    ),
    sent AS (
        SELECT doc_id, trim(s) AS s, i
        FROM (SELECT doc_id, string_split(mt, '@@') AS parts FROM marked),
             LATERAL (SELECT unnest(parts) AS s,
                             unnest(generate_series(1, len(parts))) AS i)
        WHERE length(trim(s)) > 0
    )
    SELECT doc_id, i AS sent_idx, length(s) AS n_chars, md5(s) AS sent_md5
    FROM sent
    """,
)
def sentence_split_docs(spark, sf_dir):
    """Sentence segmentation with ordinal positions — the unit-of-text
    operator under chunkers, quality filters, and contamination checks.
    The synthetic corpus carries no terminal punctuation, so boundaries
    are first INJECTED deterministically (after every 8th token, via an
    engine-portable regexp_replace) and then segmented — exercising the
    real split/ordinal/fan-out path on genuinely multi-sentence rows.
    posexplode keeps the sentence index so downstream ops can
    reconstruct order; empty tail fragments are dropped symmetrically
    in both engines.
    Narrow 1->N fan-out over the corpus scan; sentence payloads leave
    as md5 so the gate stays light."""
    docs = (
        load_table(spark, "documents", sf_dir)
        .filter((F.col("doc_id") < 100) & (F.length(F.trim("text")) > 0))
    )
    marked = F.regexp_replace(
        F.concat(F.trim("text"), F.lit(" ")), r"((\S+ ){8})", "$1@@ "
    )
    parts = F.split(marked, "@@")
    sent = (
        docs.select("doc_id", F.posexplode(parts).alias("pos", "s"))
        .select("doc_id", (F.col("pos") + 1).alias("sent_idx"), F.trim("s").alias("s"))
        .filter(F.length("s") > 0)
    )
    return sent.select(
        "doc_id",
        "sent_idx",
        F.length("s").alias("n_chars"),
        F.md5("s").alias("sent_md5"),
    )


@register(
    "uuid5_deterministic_ids",
    oracle="""
    WITH h AS (
        SELECT doc_id, md5('pps:doc:' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-5' ||
           substr(hx, 14, 3) || '-' ||
           CASE substr(hx, 17, 1)
                WHEN '0' THEN '8' WHEN '1' THEN '9' WHEN '2' THEN 'a' WHEN '3' THEN 'b'
                WHEN '4' THEN '8' WHEN '5' THEN '9' WHEN '6' THEN 'a' WHEN '7' THEN 'b'
                WHEN '8' THEN '8' WHEN '9' THEN '9' WHEN 'a' THEN 'a' WHEN 'b' THEN 'b'
                WHEN 'c' THEN '8' WHEN 'd' THEN '9' WHEN 'e' THEN 'a' ELSE 'b' END ||
           substr(hx, 18, 3) || '-' || substr(hx, 21, 12) AS stable_uuid
    FROM h
    """,
)
def uuid5_deterministic_ids(spark, sf_dir):
    """Deterministic namespaced UUIDs (v5-style: name hash + fixed
    version/variant bits) — stable cross-system join keys minted from
    content identity, unlike uuid()'s per-run randomness which breaks
    retries and reconciliation. Pure string/bit surgery on md5(name):
    narrow map, no shuffle, reproducible everywhere. The variant
    nibble folds the top two bits to RFC-4122's 10xx pattern — spelled
    as an explicit hex CASE so both engines compute identical bytes."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    hx = F.md5(F.concat(F.lit("pps:doc:"), F.col("doc_id").cast("string")))
    variant_map = {
        **{c: "8" for c in "048c"}, **{c: "9" for c in "159d"},
        **{c: "a" for c in "26ae"}, **{c: "b" for c in "37bf"},
    }
    vcol = F.substring(hx, 17, 1)
    variant = F.lit("b")
    for k, v in list(variant_map.items())[:-1]:
        variant = F.when(vcol == k, v).otherwise(variant)
    uuid5 = F.concat_ws(
        "-",
        F.substring(hx, 1, 8),
        F.substring(hx, 9, 4),
        F.concat(F.lit("5"), F.substring(hx, 14, 3)),
        F.concat(variant, F.substring(hx, 18, 3)),
        F.substring(hx, 21, 12),
    )
    return docs.select("doc_id", uuid5.alias("stable_uuid"))


@register(
    "zscore_broadcast_stats",
    oracle="""
    WITH stats AS (
        SELECT avg(l_quantity) AS mq, stddev_samp(l_quantity) AS sq,
               avg(l_extendedprice) AS mp, stddev_samp(l_extendedprice) AS sp
        FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           round((l_quantity - mq) / sq, 4) AS z_qty,
           round((l_extendedprice - mp) / sp, 4) AS z_price
    FROM lineitem, stats
    WHERE l_orderkey < 1000
    """,
)
def zscore_broadcast_stats(spark, sf_dir):
    """Global standardization (z-score) via the two-pass broadcast
    pattern: ONE aggregate computes all moments in a single scan (a
    1-row stats relation), which then broadcast-joins back onto the
    fact — the distributed formulation of fit/transform. Contrast with
    applyinpandas_zscore (per-group, pandas): this one is whole-corpus,
    pure JVM, and the stats side is O(1) regardless of data size. At
    100 TB the two scans are the cost — observe() can piggyback pass 1
    onto an existing job."""
    li = load_table(spark, "lineitem", sf_dir)
    stats = li.agg(
        F.avg("l_quantity").alias("mq"),
        F.stddev_samp("l_quantity").alias("sq"),
        F.avg("l_extendedprice").alias("mp"),
        F.stddev_samp("l_extendedprice").alias("sp"),
    )
    return (
        li.filter(F.col("l_orderkey") < 1000)
        .crossJoin(F.broadcast(stats))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round((F.col("l_quantity") - F.col("mq")) / F.col("sq"), 4).alias("z_qty"),
            F.round((F.col("l_extendedprice") - F.col("mp")) / F.col("sp"), 4).alias("z_price"),
        )
    )


@register(
    "json_schema_inference",
    oracle="""
    SELECT n_chars // 100 AS len_bucket, count(*) AS n,
           sum(doc_id) AS id_sum
    FROM documents WHERE doc_id % 7 <> 0
    GROUP BY len_bucket
    """,
)
def json_schema_inference(spark, sf_dir):
    """Schema-on-read: the JSON source with NO declared schema — Spark
    samples the file, infers field names/types, and the inferred frame
    feeds a typed aggregate. The operational surface for landing
    unknown feeds; at 100 TB you cap the sampling cost
    (samplingRatio) or pin the schema after first contact (inference
    is an extra pass by design). Reuses the dropmalformed fixture's
    good lines (shared setup in sources/fixtures.py) so inference also
    proves tolerant-reader behavior."""
    from python_plugins_spark.sources.fixtures import inferable_jsonl

    inferred = spark.read.json(inferable_jsonl(sf_dir))  # no schema: inference pass
    assert set(inferred.columns) == {"doc_id", "n_chars"}, inferred.columns
    return (
        inferred.groupBy((F.col("n_chars") / 100).cast("long").alias("len_bucket"))
        .agg(F.count("*").alias("n"), F.sum("doc_id").alias("id_sum"))
    )


@register(
    "from_csv_line_parse",
    oracle="""
    SELECT o_orderkey,
           string_split(CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus || ',' ||
                        CAST(round(o_totalprice, 2) AS VARCHAR), ',')[2] AS status,
           round(CAST(string_split(CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus || ',' ||
                        CAST(round(o_totalprice, 2) AS VARCHAR), ',')[3] AS DOUBLE), 2) AS price
    FROM orders WHERE o_orderkey < 400
    """,
)
def from_csv_line_parse(spark, sf_dir):
    """Embedded-CSV column parsing (from_csv): delimited lines INSIDE a
    column — the log-ingestion shape where each record carries a CSV
    payload — parsed into a typed struct by the expression engine (no
    second scan, no UDF). The inverse (to_csv) serializes the line
    here, so the query is a full codec roundtrip; DuckDB replays it
    with split-and-cast."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 400)
    line = F.concat_ws(
        ",",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.round("o_totalprice", 2).cast("string"),
    )
    return o.select("o_orderkey", line.alias("line")).select(
        "o_orderkey",
        F.from_csv(F.col("line"), F.lit("k BIGINT, status STRING, price DOUBLE")).alias("p"),
    ).select(
        "o_orderkey",
        F.col("p.status").alias("status"),
        F.round("p.price", 2).alias("price"),
    )


@register(
    "degree_distribution_graph",
    oracle="""
    WITH dedges AS (
        SELECT DISTINCT user_id AS src,
               (json_extract_string(props, '$.k')::BIGINT * 7) % 150 AS dst
        FROM events
        WHERE user_id <> (json_extract_string(props, '$.k')::BIGINT * 7) % 150
    ),
    ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM dedges),
    deg AS (
        SELECT node, count(*) AS degree
        FROM (SELECT a AS node FROM ue UNION ALL SELECT b FROM ue)
        GROUP BY node
    )
    SELECT degree, count(*) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def degree_distribution_graph(spark, sf_dir):
    """Degree distribution of the undirected event graph — the first
    diagnostic for any graph workload (skew census: a power-law tail
    is exactly the key-skew that breaks joins, so this histogram IS
    the input to salting / degree-orientation decisions for
    pagerank_events_graph and triangle_count_graph). Two key-partitioned
    aggregates over the edge list; the second runs on the tiny
    (node, degree) relation."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    dst = (k * 7) % 150
    edges = (
        ev.select(F.col("user_id").alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    # explode, not union: a union would instantiate the deduped edge
    # subtree twice in the plan; the narrow 1->2 fan-out reads it once
    nodes = edges.select(F.explode(F.array("a", "b")).alias("node"))
    deg = nodes.groupBy("node").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    """Unrolled-CTE oracle for the fixed-round k-core peel (same
    discipline as the kmeans/pagerank oracles: replay the exact
    recurrence, don't re-derive it)."""
    ctes = [
        """_d AS (
        SELECT DISTINCT user_id AS src,
               (json_extract_string(props, '$.k')::BIGINT * 7) % 150 AS dst
        FROM events
        WHERE user_id <> (json_extract_string(props, '$.k')::BIGINT * 7) % 150
    )""",
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM _d)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""deg{i} AS MATERIALIZED (
            SELECT node, count(*) AS deg
            FROM (SELECT a AS node FROM e{p} UNION ALL SELECT b FROM e{p})
            GROUP BY node
        )"""
        )
        ctes.append(f"keep{i} AS MATERIALIZED (SELECT node FROM deg{i} WHERE deg >= {k})")
        ctes.append(
            f"""e{i} AS MATERIALIZED (
            SELECT a, b FROM e{p}
            WHERE a IN (SELECT node FROM keep{i}) AND b IN (SELECT node FROM keep{i})
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT node, count(*) AS degree
        FROM (SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
        GROUP BY node
        """
    )


@register("kcore_decomposition_graph", oracle=_kcore_oracle_sql(3, 4))
def kcore_decomposition_graph(spark, sf_dir):
    """k-core decomposition (k=3, fixed 4 peel rounds): iteratively
    drop nodes of degree < k and the edges touching them — the graph
    QA step that isolates the densely-connected core from tendrils
    (spam/link-farm detection on web corpora). Fixed-round semantics
    keep the recurrence engine-portable; each round is two
    key-partitioned hops (degree aggregate + two semi-joins against
    the tiny keep-set), lineage truncated per round exactly like
    connected_components. At 100 TB: persist edges partitioned on the
    endpoint, broadcast the shrinking keep-set."""
    ev = load_table(spark, "events", sf_dir)
    K, ROUNDS = 3, 4
    kk = F.get_json_object("props", "$.k").cast("long")
    dst = (kk * 7) % 150
    edges = (
        ev.select(F.col("user_id").alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .transform(stage_checkpoint)
    )
    for _ in range(ROUNDS):
        deg = (
            edges.select(F.explode(F.array("a", "b")).alias("node"))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        # checkpoint the (tiny) keep-set: both broadcast semi-joins
        # would otherwise independently recompute the degree aggregate
        keep = deg.filter(F.col("deg") >= K).select("node").transform(
            stage_checkpoint_iterative
        )
        edges = (
            edges.join(
                F.broadcast(keep.withColumnRenamed("node", "a")), "a", "left_semi"
            )
            .join(F.broadcast(keep.withColumnRenamed("node", "b")), "b", "left_semi")
            .transform(stage_checkpoint_iterative)
        )
    return (
        edges.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )


@register(
    "date_dim_generate",
    oracle="""
    SELECT strftime(d, '%Y-%m-%d') AS d,
           CAST(isodow(d) AS INT) AS iso_dow,
           CAST(isodow(d) IN (6, 7) AS BOOLEAN) AS is_weekend,
           CAST(month(d) AS INT) AS month,
           CAST(quarter(d) AS INT) AS quarter,
           strftime(d, '%Y-%m') AS year_month
    FROM generate_series(DATE '1995-01-01', DATE '1995-12-31', INTERVAL 1 DAY) t(d)
    """,
)
def date_dim_generate(spark, sf_dir):
    """Generated calendar dimension (one year of days with ISO weekday,
    weekend flag, month/quarter, year-month key) — the standard
    broadcast-side date spine for fiscal rollups and gap-free
    time-series joins. Born from sequence(), never read from disk; at
    any scale this relation is a few KB and always the broadcast side.
    ISO weekday (Mon=1..Sun=7) is computed portably from the known
    epoch anchor, pinning cross-engine weekday semantics (see
    date_arithmetic_orders for the extraction-function family)."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    # Spark dayofweek: Sun=1..Sat=7 -> ISO Mon=1..Sun=7
    iso_dow = ((F.dayofweek("d") + 5) % 7 + 1).cast("int")
    return days.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        iso_dow.alias("iso_dow"),
        iso_dow.isin(6, 7).alias("is_weekend"),
        F.month("d").cast("int").alias("month"),
        F.quarter("d").cast("int").alias("quarter"),
        F.date_format("d", "yyyy-MM").alias("year_month"),
    )


@register(
    "write_audit_publish",
    oracle="""
    SELECT c_nationkey, count(*) AS n, round(sum(c_acctbal), 4) AS bal
    FROM customer GROUP BY c_nationkey
    """,
)
def write_audit_publish(spark, sf_dir):
    """Write-Audit-Publish: land data in an invisible staging location,
    AUDIT it there (row-count reconciliation + a null-key expectation —
    the audit reads staging, never the source of truth), and only then
    atomically promote it to the published path (directory rename; on
    a real lakehouse this is the Iceberg/Delta branch-commit). Readers
    of the published path never observe a partial write — the
    correctness contract the pattern exists for. The gate reads the
    PUBLISHED copy."""
    import os
    import shutil

    c = load_table(spark, "customer", sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/"))
    staging = os.path.join(_SCRATCH, f"wap_staging_{tag}")
    published = os.path.join(_SCRATCH, f"wap_published_{tag}")
    c.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    # audit: volume + integrity expectations against STAGING
    n_src, n_stg = c.count(), staged.count()
    assert n_stg == n_src, (n_src, n_stg)
    assert staged.filter(F.col("c_custkey").isNull()).count() == 0
    # publish: atomic swap
    shutil.rmtree(published, ignore_errors=True)
    os.rename(staging, published)
    return (
        spark.read.parquet(published)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 4).alias("bal"))
    )


@register(
    "winsorize_doc_lengths",
    oracle="""
    WITH bounds AS (
        SELECT quantile_cont(n_chars, 0.05) AS lo, quantile_cont(n_chars, 0.95) AS hi
        FROM documents
    )
    SELECT source,
           count(*) AS n,
           round(avg(least(greatest(n_chars::DOUBLE, lo), hi)), 4) AS wins_mean,
           sum(CASE WHEN n_chars::DOUBLE < lo OR n_chars::DOUBLE > hi
                    THEN 1 ELSE 0 END) AS n_clamped
    FROM documents, bounds
    GROUP BY source
    """,
)
def winsorize_doc_lengths(spark, sf_dir):
    """Winsorization (clamp to [p05, p95]) of document lengths — the
    outlier-robust preprocessing gate before any mean-based corpus
    statistic (a handful of mega-documents otherwise dominate
    per-source averages and batch-size planning). Same two-pass
    broadcast shape as zscore_broadcast_stats: exact interpolated
    percentiles in one aggregate (Spark percentile == DuckDB
    quantile_cont), 1-row bounds relation broadcast back, clamp is
    codegen least/greatest. n_clamped reports the tail mass actually
    touched."""
    docs = load_table(spark, "documents", sf_dir)
    bounds = docs.agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    x = F.col("n_chars").cast("double")
    clamped = F.least(F.greatest(x, F.col("lo")), F.col("hi"))
    return (
        docs.crossJoin(F.broadcast(bounds))
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(clamped), 4).alias("wins_mean"),
            F.sum(((x < F.col("lo")) | (x > F.col("hi"))).cast("long")).alias("n_clamped"),
        )
    )


@register(
    "corpus_pipeline_end_to_end",
    oracle="""
    WITH clean AS (
        SELECT doc_id, source, trim(text) AS text
        FROM documents WHERE length(trim(text)) > 0
    ),
    dedup AS (
        SELECT min(doc_id) AS doc_id, min_by(source, doc_id) AS source, text
        FROM clean GROUP BY text
    ),
    tagged AS (
        SELECT *,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
                    ELSE 'test' END AS split,
               string_split_regex(text, '\\s+') AS toks
        FROM dedup
    ),
    chunks AS (
        SELECT split, source, len(toks[s + 1 : s + 64]) AS n_tokens
        FROM tagged,
             LATERAL (SELECT unnest(generate_series(0, len(toks) - 1, 48)) AS s)
    )
    SELECT split, source, count(*) AS n_chunks, sum(n_tokens) AS total_tokens
    FROM chunks GROUP BY split, source
    """,
)
def corpus_pipeline_end_to_end(spark, sf_dir):
    """The composed corpus pipeline in ONE dataflow — clean -> exact
    dedup (min-id survivor per content) -> leakage-safe md5 split ->
    64/48 sliding chunking -> per-(split,source) token audit — proving
    the engine's operators COMPOSE as lazy declarative stages: Catalyst
    sees the whole graph at once (the dedup groupBy is the single
    shuffle; tagging, chunking, and audit fold into the surrounding
    stages), which is the point of building on a planner instead of
    wiring stage-by-stage like the reference's host DAG
    (BasePythonTransformTest.java:215-222). Dedup keyed on full text
    here; at 100 TB key on md5(text) so the shuffle carries 16-byte
    keys, and the chunk audit becomes the corpus's training-readiness
    report."""
    docs = load_table(spark, "documents", sf_dir)
    clean = (
        docs.select("doc_id", "source", F.trim("text").alias("text"))
        .filter(F.length("text") > 0)
    )
    dedup = clean.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.min_by("source", "doc_id").alias("source")
    )
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    tagged = dedup.select(
        "doc_id",
        "source",
        F.when(h2 < "e6", "train").when(h2 < "f3", "val").otherwise("test").alias("split"),
        F.split("text", r"\s+").alias("toks"),
    )
    chunks = tagged.select(
        "split",
        "source",
        F.explode(F.sequence(F.lit(0), F.size("toks") - 1, F.lit(48))).alias("s"),
        "toks",
    ).select(
        "split", "source", F.size(F.slice("toks", F.col("s") + 1, 64)).alias("n_tokens")
    )
    return chunks.groupBy("split", "source").agg(
        F.count("*").alias("n_chunks"), F.sum("n_tokens").alias("total_tokens")
    )


@register(
    "vocab_overlap_sources",
    oracle="""
    WITH st AS (
        SELECT DISTINCT source, unnest(str_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ),
    sizes AS (SELECT source, count(*) AS nv FROM st GROUP BY 1),
    inter AS (
        SELECT a.source AS s1, b.source AS s2, count(*) AS n_common
        FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT s1, s2, n_common,
           round(n_common / (za.nv + zb.nv - n_common)::DOUBLE, 6) AS jaccard
    FROM inter
    JOIN sizes za ON za.source = s1
    JOIN sizes zb ON zb.source = s2
    """,
)
def vocab_overlap_sources(spark, sf_dir):
    """Pairwise vocabulary Jaccard between corpus sources — the
    domain-drift / near-duplicate-source detector run before choosing
    mixing weights (two sources sharing 95% vocabulary are one domain;
    one drifting over time flags contamination). Shape: distinct
    (source, term) projection — vocabulary-bounded, tiny vs the corpus
    — self-joined on term; per-term fan-out is #sources carrying the
    term (bounded by the source count, not corpus size). Marginal
    sizes broadcast back; the corpus itself is scanned once."""
    docs = load_table(spark, "documents", sf_dir)
    st = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select("source", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"))
        .distinct()
    )
    # vocab table feeds sizes + both join sides; localCheckpoint (not
    # persist) so the blocks release on GC instead of accumulating
    # across registry sweeps (persist-lifecycle convention)
    st = st.transform(stage_checkpoint)
    sizes = st.groupBy("source").agg(F.count("*").alias("nv"))
    a = st.alias("a")
    b = st.alias("b")
    inter = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("s1"), F.col("b.source").alias("s2"))
        .agg(F.count("*").alias("n_common"))
    )
    za = sizes.alias("za")
    zb = sizes.alias("zb")
    return (
        inter.join(F.broadcast(za), F.col("za.source") == F.col("s1"))
        .join(F.broadcast(zb), F.col("zb.source") == F.col("s2"))
        .select(
            "s1", "s2", "n_common",
            F.round(
                F.col("n_common")
                / (F.col("za.nv") + F.col("zb.nv") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "applyinarrow_group_profile",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS price_cents,
           round(min(l_discount), 4) AS min_disc,
           round(max(l_discount), 4) AS max_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def applyinarrow_group_profile(spark, sf_dir):
    """groupBy().applyInArrow (Spark 4): grouped-map where user code
    receives each group as a raw pyarrow Table — the zero-pandas
    sibling of applyInPandas (no DataFrame conversion cost, columnar
    end-to-end), the right surface for Arrow-native libraries
    (polars/datafusion-style kernels) over grouped data. One shuffle
    on the group key; the per-group profile runs in pyarrow.compute.
    Complements mapInArrow (partition-wise, mapinarrow_filtered_net)
    with keyed semantics."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def profile(t: pa.Table) -> pa.Table:
        # exact integer-cents sum: float summation order is shuffle-
        # dependent, so the auditable total is fixed-point
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        return pa.table(
            {
                "l_returnflag": [t["l_returnflag"][0].as_py()],
                "n": [t.num_rows],
                "price_cents": [pc.sum(cents).as_py() or 0],
                "min_disc": [round(pc.min(t["l_discount"]).as_py(), 4)],
                "max_disc": [round(pc.max(t["l_discount"]).as_py(), 4)],
            }
        )

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    return li.groupBy("l_returnflag").applyInArrow(
        profile,
        schema="l_returnflag string, n long, price_cents long, min_disc double, max_disc double",
    )


@register(
    "udtf_table_arg_sessions",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchases,
           round(max(value), 4) AS max_value
    FROM events
    WHERE user_id < 30
    GROUP BY user_id
    """,
)
def udtf_table_arg_sessions(spark, sf_dir):
    """Python UDTF over a TABLE argument with PARTITION BY (Spark 4):
    the table function consumes each user's rows as a keyed stream
    (eval per row, terminate per partition) — the SQL-native face of a
    custom per-key aggregator, same execution contract as the
    reference's whole-stream evaluator (PythonEvaluator.java:262-266)
    but with engine-managed keying: Spark shuffles on the PARTITION BY
    column and feeds each group to one UDTF instance. max is
    order-insensitive and counts are integers, so results are exact
    under any arrival order."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, n_purchases bigint, max_value double")
    class UserProfile:
        def __init__(self):
            self.uid = None
            self.n = 0
            self.np = 0
            self.vmax = None

        def eval(self, row):
            self.uid = row["user_id"]
            self.n += 1
            if row["event_type"] == "purchase":
                self.np += 1
            v = float(row["value"])
            self.vmax = v if self.vmax is None else max(self.vmax, v)

        def terminate(self):
            if self.uid is not None:
                yield (self.uid, self.n, self.np, round(self.vmax, 4))

    spark.udtf.register("user_profile_udtf", UserProfile)
    (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") < 30)
        .select("user_id", "event_type", "value")
        .createOrReplaceTempView("_udtf_tbl_events")
    )
    return spark.sql(
        "SELECT * FROM user_profile_udtf(TABLE(_udtf_tbl_events) PARTITION BY user_id)"
    )


@register(
    "udtf_ordered_sessions",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE user_id < 40
    )
    SELECT user_id,
           count(*) AS n_events,
           sum(CASE WHEN prev_ts IS NULL
                      OR date_diff('second', prev_ts, ts) > 3600
                    THEN 1 ELSE 0 END) AS n_sessions
    FROM seq GROUP BY user_id
    """,
)
def udtf_ordered_sessions(spark, sf_dir):
    """Python UDTF over TABLE(...) PARTITION BY ... ORDER BY (Spark 4):
    the engine delivers each user's events IN TIME ORDER to a stateful
    row-at-a-time function — order-sensitive keyed streaming over a
    batch table, here counting 1-hour-gap sessions with a one-variable
    state machine. This is the exact computational contract of the
    reference's per-record evaluator (initialize/transform/destroy,
    Py4jPythonExecutor.java:139-223) with Spark doing the shuffle AND
    the sort; the window-function oracle proves the imperative and
    declarative formulations agree."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, n_sessions bigint")
    class SessionCounter:
        def __init__(self):
            self.uid = None
            self.n = 0
            self.sessions = 0
            self.last_epoch = None

        def eval(self, row):
            self.uid = row["user_id"]
            self.n += 1
            e = row["ts"].timestamp()
            if self.last_epoch is None or e - self.last_epoch > 3600:
                self.sessions += 1
            self.last_epoch = e

        def terminate(self):
            if self.uid is not None:
                yield (self.uid, self.n, self.sessions)

    spark.udtf.register("session_counter_udtf", SessionCounter)
    (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") < 40)
        .select("user_id", "event_id", "ts")
        .createOrReplaceTempView("_udtf_sess_events")
    )
    return spark.sql(
        """
        SELECT * FROM session_counter_udtf(
            TABLE(_udtf_sess_events) PARTITION BY user_id ORDER BY (ts, event_id)
        )
        """
    )


@register(
    "pivot_multi_agg",
    oracle="""
    SELECT l_returnflag,
           count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F_n,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS F_qty,
           count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O_n,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS O_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_multi_agg(spark, sf_dir):
    """Pivot with MULTIPLE aggregates per pivot value (count + sum per
    line status): Spark expands to one hash aggregate with
    conditionally-filtered aggregation expressions — exactly the CASE
    matrix the oracle spells out, proving no extra pass per measure.
    Pivot values are enumerated explicitly ('F','O'), which at scale
    skips the distinct-value discovery job (an unenumerated pivot
    costs one extra scan)."""
    li = load_table(spark, "lineitem", sf_dir)
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("qty"))
    )
    return p.select(
        "l_returnflag",
        F.col("F_n"), F.col("F_qty"), F.col("O_n"), F.col("O_qty"),
    )


@register(
    "higher_moments_stats",
    oracle="""
    SELECT l_returnflag,
           round(skewness(l_quantity), 3) AS skew_qty,
           round(kurtosis(l_quantity), 3) AS kurt_qty,
           round(skewness(l_extendedprice), 3) AS skew_price,
           round(kurtosis(l_extendedprice), 3) AS kurt_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def higher_moments_stats(spark, sf_dir):
    """Third and fourth standardized moments (skewness / excess
    kurtosis) per group — the distribution-shape diagnostics behind
    outlier policy and partition-skew forecasting (a heavy right tail
    in the key-frequency distribution is tomorrow's hot partition).
    Single-pass moment aggregation (Spark and DuckDB both use the
    corrected one-pass formulas; 3-dp rounding absorbs the
    accumulation-order FP divergence that tiny per-group n exposes at
    smoke scale); one partial-agg shuffle, same shape as q1."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_quantity"), 3).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 3).alias("kurt_qty"),
        F.round(F.skewness("l_extendedprice"), 3).alias("skew_price"),
        F.round(F.kurtosis("l_extendedprice"), 3).alias("kurt_price"),
    )


# =====================================================================
# Distribution diagnostics & exact-distinct structures (SURVEY.md §2c
# "statistics/profiling" family, extended)
# =====================================================================

@register(
    "benford_first_digit",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders
    ),
    t AS (SELECT count(*) AS n FROM d)
    SELECT digit,
           count(*) AS n_orders,
           round(count(*) * 1.0 / (SELECT n FROM t), 6) AS observed_p,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_p,
           round(abs(count(*) * 1.0 / (SELECT n FROM t) - log10(1.0 + 1.0 / digit)), 6) AS abs_dev
    FROM d GROUP BY digit
    """,
)
def benford_first_digit(spark, sf_dir):
    """Benford's-law first-significant-digit audit over order totals —
    the classic anomaly screen for fabricated or truncated numeric
    columns in an ingestion pipeline. The digit is taken on the EXACT
    cent-integer rendered as a string (no float log10 at the digit
    boundary, where engines could disagree on floor(log10(x)) for
    values like 1000.00). One narrow scan + 9-group aggregate; at 100
    TB this is a map-side-combine dream — 9 groups means the shuffle
    carries 9 rows per task. Parity: reference-style DQ profiling
    (cf. reference wrangler column-statistics transforms)."""
    o = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    d = o.select(F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit"))
    total = d.count()
    return (
        d.groupBy("digit")
        .agg(F.count("*").alias("n_orders"))
        .select(
            "digit",
            "n_orders",
            F.round(F.col("n_orders") / F.lit(float(total)), 6).alias("observed_p"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_p"),
            F.round(
                F.abs(F.col("n_orders") / F.lit(float(total)) - F.log10(1.0 + 1.0 / F.col("digit"))), 6
            ).alias("abs_dev"),
        )
    )


@register(
    "ks_two_sample_events",
    oracle="""
    WITH s AS (
        SELECT CAST(floor(value / 0.25) AS BIGINT) AS b,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g2
        FROM events
        WHERE event_type IN ('click', 'view') AND value IS NOT NULL
    ),
    pb AS (SELECT b, sum(g1) AS d1, sum(g2) AS d2 FROM s GROUP BY b),
    t AS (SELECT sum(d1) AS n1, sum(d2) AS n2 FROM pb),
    c AS (
        SELECT sum(d1) OVER (ORDER BY b) AS c1,
               sum(d2) OVER (ORDER BY b) AS c2
        FROM pb
    )
    SELECT round(max(abs(c1 * 1.0 / (SELECT n1 FROM t) - c2 * 1.0 / (SELECT n2 FROM t))), 6) AS ks_d,
           (SELECT n1 FROM t) AS n1,
           (SELECT n2 FROM t) AS n2
    FROM c
    """,
)
def ks_two_sample_events(spark, sf_dir, exact: bool = False, bin_width: float = 0.25):
    """Two-sample Kolmogorov-Smirnov statistic between the `value`
    distributions of click vs view events — the drift detector a
    training pipeline runs between yesterday's and today's feature
    snapshots.

    DEFAULT = binned ECDF: values quantize onto a fixed grid
    (``floor(v / bin_width)``), per-bin counts aggregate map-side, and
    the running ECDFs come from the DISTRIBUTED prefix-sum shape —
    range-partition the bin table, per-partition running sums (a
    window PARTITIONED by pid), plus broadcast offsets of the
    preceding partitions' totals. No single-partition window anywhere:
    a 100 TB feature column's raw distinct-value grid is unbounded,
    and the old ``Window.orderBy(v)`` ECDF collapsed it onto one task.
    Error bound: binning moves each ECDF evaluation point by at most
    the largest bin's probability mass, so
    ``|ks_binned - ks_exact| <= max_b P(bin b)`` — with fine bins on a
    continuous feature this is far below any drift threshold anyone
    alerts on. ``exact=True`` opts back into the per-distinct-value
    grid (small/categorical columns), accepting the single-partition
    ECDF window."""
    ev = load_table(spark, "events", sf_dir)
    s = ev.filter(F.col("event_type").isin("click", "view") & F.col("value").isNotNull()).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g1"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("g2"),
    )
    if exact:
        pv = s.groupBy("v").agg(F.sum("g1").alias("d1"), F.sum("g2").alias("d2"))
        n1, n2 = pv.agg(F.sum("d1"), F.sum("d2")).first()
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        c = pv.select(
            (F.sum("d1").over(w) / F.lit(float(n1))).alias("f1"),
            (F.sum("d2").over(w) / F.lit(float(n2))).alias("f2"),
        )
        return c.agg(
            F.round(F.max(F.abs(F.col("f1") - F.col("f2"))), 6).alias("ks_d"),
            F.lit(int(n1)).alias("n1"),
            F.lit(int(n2)).alias("n2"),
        )
    pb = (
        s.groupBy(F.floor(F.col("v") / F.lit(bin_width)).alias("b"))
        .agg(F.sum("g1").alias("d1"), F.sum("g2").alias("d2"))
    )
    n1, n2 = pb.agg(F.sum("d1"), F.sum("d2")).first()
    # Distributed prefix sum over the bin grid: range-partition by bin
    # (eager checkpoint — the frame branches into totals + running sums,
    # see _global_index_part's AQE note), per-pid running sums, shift by
    # the broadcast totals of the strictly-preceding partitions.
    part = (
        pb.repartitionByRange(8, "b")
        .withColumn("pid", F.spark_partition_id())
        .transform(stage_checkpoint)
    )
    ptot = part.groupBy("pid").agg(F.sum("d1").alias("t1"), F.sum("d2").alias("t2"))
    prior = ptot.select(
        F.col("pid").alias("pid2"), F.col("t1").alias("o1"), F.col("t2").alias("o2")
    )
    offs = (
        ptot.join(F.broadcast(prior), F.col("pid2") < F.col("pid"), "left")
        .groupBy("pid")
        .agg(
            F.coalesce(F.sum("o1"), F.lit(0)).alias("off1"),
            F.coalesce(F.sum("o2"), F.lit(0)).alias("off2"),
        )
    )
    wloc = (
        Window.partitionBy("pid")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = part.join(F.broadcast(offs), "pid").select(
        ((F.sum("d1").over(wloc) + F.col("off1")) / F.lit(float(n1))).alias("f1"),
        ((F.sum("d2").over(wloc) + F.col("off2")) / F.lit(float(n2))).alias("f2"),
    )
    return c.agg(
        F.round(F.max(F.abs(F.col("f1") - F.col("f2"))), 6).alias("ks_d"),
        F.lit(int(n1)).alias("n1"),
        F.lit(int(n2)).alias("n2"),
    )


@register(
    "acf_daily_revenue",
    oracle="""
    WITH d AS (
        SELECT date_trunc('day', ts) AS day, round(sum(value), 4) AS rev
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    l AS (
        SELECT rev,
               lag(rev, 1) OVER (ORDER BY day) AS r1,
               lag(rev, 2) OVER (ORDER BY day) AS r2,
               lag(rev, 3) OVER (ORDER BY day) AS r3
        FROM d
    )
    SELECT round(corr(rev, r1), 4) AS acf1,
           round(corr(rev, r2), 4) AS acf2,
           round(corr(rev, r3), 4) AS acf3,
           count(*) AS n_days
    FROM l
    """,
)
def acf_daily_revenue(spark, sf_dir):
    """Lag-1..3 autocorrelation of the daily purchase-revenue series —
    seasonality screening before forecasting. The heavy part (daily
    rollup of the raw stream) is a fully-parallel hash aggregate; the
    window + corr run on the tiny day-grain series. The daily sums are
    rounded to 4 dp BEFORE the lag/corr so both engines correlate
    bit-identical inputs (corr's co-moment accumulation then matches at
    4 dp, as in regression_aggregates)."""
    ev = load_table(spark, "events", sf_dir)
    d = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("rev"))
    )
    w = Window.orderBy("day")
    lagged = d.select(
        "rev",
        F.lag("rev", 1).over(w).alias("r1"),
        F.lag("rev", 2).over(w).alias("r2"),
        F.lag("rev", 3).over(w).alias("r3"),
    )
    return lagged.agg(
        F.round(F.corr("rev", "r1"), 4).alias("acf1"),
        F.round(F.corr("rev", "r2"), 4).alias("acf2"),
        F.round(F.corr("rev", "r3"), 4).alias("acf3"),
        F.count("*").alias("n_days"),
    )


@register(
    "bitmap_distinct_users",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def bitmap_distinct_users(spark, sf_dir):
    """EXACT distinct-user counts via Spark's bitmap aggregate family
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg
    / bitmap_count) instead of count(DISTINCT ...). Why it matters at
    scale: count-distinct expands to a two-phase aggregate keyed on the
    raw value, shuffling every distinct (type, user) pair; the bitmap
    path shuffles ONE 4KB bitmap per (type, bucket) — mergeable like a
    sketch but exact, and the per-bucket bitmaps can be persisted as an
    incremental distinct-count index (rollup across days = bitmap_or).
    Oracle is the semantic ground truth count(DISTINCT)."""
    ev = load_table(spark, "events", sf_dir)
    per_bucket = ev.groupBy(
        "event_type", F.bitmap_bucket_number(F.col("user_id")).alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id"))).alias("bm"))
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum(F.bitmap_count(F.col("bm"))).alias("n_users"))
    )


# =====================================================================
