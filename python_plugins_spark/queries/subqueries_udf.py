"""TPC-H subquery/outer-join/disjunctive shapes, higher-order functions, the Python-UDF surface (pandas_udf, UDTF, mapInArrow), bucketed joins, RANGE frames, gap-filled time series, statistical aggregates.

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


# Batch 4: TPC-H subquery/outer-join/disjunctive shapes, higher-order
# array functions, regex extraction, stream-stream join, ORC, alert
# port, broadcast lookup
# =====================================================================

@register(
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS with a non-equi condition ->
    left-semi join. The lineitem side is pre-projected to two columns
    so the semi-join shuffle carries minimal payload."""
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q10_returned_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           n.n_name
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)
def q10_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer, global
    top-20 (TakeOrderedAndProject after a 3-join + agg)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    n = load_table(spark, "nation", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: outer join with a join-side predicate (NOT a
    post-filter — null-extended rows must survive), then a distribution
    re-aggregation."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct,
           count(*) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate ratio over a broadcast
    part join."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load_table(spark, "part", sf_dir)
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", net).otherwise(0.0))
                / F.sum(net),
                6,
            ).alias("promo_pct"),
            F.count("*").alias("n"),
        )
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly, count(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#19'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated per-part average, de-correlated into
    a window aggregate over the joined frame (one shuffle on partkey
    instead of a re-scan per part — the classic decorrelation win)."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#19")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        joined.withColumn("_avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count("*").alias("n"),
        )
    )


@register(
    "q18_big_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(o.o_totalprice, 4) AS o_totalprice,
           round(sum(l.l_quantity), 4) AS total_qty
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING sum(l.l_quantity) > 300
    """,
)
def q18_big_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING over a grouped join. The qualifying
    orderkey set is computed first (pre-aggregation on the fact table
    alone), then joined back — at scale this prunes the wide join to
    the ~0.1% of orders that qualify."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            _ts(F.col("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("o_totalprice"), 4).alias("o_totalprice"),
            F.round(F.col("_qty"), 4).alias("total_qty"),
        )
    )


@register(
    "q19_disjunctive_pred",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue, count(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_pred(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive predicates spanning
    both join sides — stays a single broadcast hash join with the OR
    as a post-join filter (Catalyst also pushes the derivable
    single-side bounds down to each scan)."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


@register(
    "q22_idle_customers",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS numcust, round(sum(c.c_acctbal), 4) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
)
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: scalar subquery threshold + anti join (rich
    customers with no urgent orders — predicate chosen so the result
    is non-empty at every test SF). The scalar aggregate is a one-row
    broadcast crossJoin, not a collect(): one job, one whole plan for
    AQE to optimize (VERDICT r2 #7)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg_bal"))
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .drop("_avg_bal")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
    )


@register(
    "higher_order_array_funcs",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS l2_norm,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 4) AS max_val,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum')
                 / len(embedding), 4) AS mean_val
    FROM embeddings
    """,
)
def higher_order_array_funcs(spark, sf_dir):
    """Higher-order array functions (transform/filter/aggregate) —
    vector math entirely JVM-side, no Python: the cheap path for
    embedding feature engineering at 100 TB."""
    emb = load_table(spark, "embeddings", sf_dir)
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.round(F.sqrt(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x)), 4).alias(
            "l2_norm"
        ),
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(F.array_max(e), 4).alias("max_val"),
        F.round(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x) / F.size(e), 4).alias(
            "mean_val"
        ),
    )


@register(
    "regex_extract_docs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '^(\\w+)', 1) AS first_word,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
           len(regexp_extract_all(text, '\\bthe\\b')) AS n_the
    FROM documents
    """,
)
def regex_extract_docs(spark, sf_dir):
    """Regex catalog: extract / global-replace / count — JVM regex,
    no Python (the reference needed user scripts for any of this)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.length(F.regexp_replace("text", r"[^0-9]", "")).cast("long").alias("n_digits"),
        F.regexp_count(F.col("text"), F.lit(r"\bthe\b")).cast("long").alias("n_the"),
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
    """,
)
def stream_stream_join(spark, sf_dir):
    """Stream-stream inner join with an event-time bound (clicks within
    10 min before a purchase, same user). Both sides watermarked so
    state is bounded at scale; with the whole table in one micro-batch
    the result equals the batch join the oracle runs."""
    import uuid

    from python_plugins_spark.sources.io import ensure_session_confs, fix_nanos_ts
    from python_plugins_spark.streaming import read_stream_parquet, run_to_memory_sink

    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def stream():
        return fix_nanos_ts(
            read_stream_parquet(spark, f"{sf_dir}/events.parquet", raw_schema)
        )

    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        stream()
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select("purchase_id", "click_id", F.col("p_user").alias("user_id"))
    name = f"stream_ssjoin_{uuid.uuid4().hex[:8]}"
    return run_to_memory_sink(joined, name, output_mode="append")


@register(
    "orc_source_roundtrip",
    oracle="""
    SELECT p_brand, count(*) AS n, round(avg(p_retailprice), 4) AS avg_price
    FROM part GROUP BY p_brand
    """,
)
def orc_source_roundtrip(spark, sf_dir):
    """ORC sink + source roundtrip (the third columnar format after
    parquet; same pushdown/pruning machinery)."""
    import os

    p = load_table(spark, "part", sf_dir)
    path = os.path.join(_SCRATCH, f"part_orc_{os.path.basename(sf_dir.rstrip('/'))}")
    p.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("p_brand").agg(
        F.count("*").alias("n"), F.round(F.avg("p_retailprice"), 4).alias("avg_price")
    )


@register(
    "transform_alert_port",
    oracle="""
    SELECT CAST(s_suppkey AS VARCHAR) AS suppkey, 'low_balance' AS severity
    FROM supplier WHERE s_acctbal < 0
    """,
)
def transform_alert_port(spark, sf_dir):
    """The alert port (reference PythonEmitter.emitAlert,
    PythonEvaluator.java:193-195): map<string,string> payloads split
    from the same tagged pass as the main output."""
    s = load_table(spark, "supplier", sf_dir)
    script = """
def transform(record, emitter, context):
    if record['s_acctbal'] < 0:
        emitter.emitAlert({'suppkey': record['s_suppkey'], 'severity': 'low_balance'})
    emitter.emit(record)
"""
    res = python_transform(s, script=script, emit_alerts=True)
    return res.alerts.select(
        F.col("alert")["suppkey"].alias("suppkey"),
        F.col("alert")["severity"].alias("severity"),
    )


@register(
    "transform_lookup_nation",
    oracle="""
    SELECT s.s_suppkey, n.n_name AS nation_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def transform_lookup_nation(spark, sf_dir):
    """context.getLookup(...) — declared-but-unsupported in the
    reference (PythonEvaluator.java:271-276 throws); here it works: a
    broadcast dict resolved lazily on workers (the Spark-native dim
    lookup for per-record enrichment)."""
    n_map = {
        row.n_nationkey: row.n_name
        for row in load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name").collect()
    }
    bc = spark.sparkContext.broadcast(n_map)
    s = load_table(spark, "supplier", sf_dir)
    script = """
def transform(record, emitter, context):
    nations = context.getLookup('nations')
    emitter.emit({'s_suppkey': record['s_suppkey'],
                  'nation_name': nations.get(record['s_nationkey'])})
"""
    res = python_transform(
        s,
        script=script,
        output_schema="s_suppkey bigint, nation_name string",
        lookups={"nations": bc},
    )
    return res.output


@register(
    "neardup_clusters_docs",
    oracle=D.neardup_clusters_oracle_sql("documents", "text", "doc_id", 0.5),
)
def neardup_clusters_docs(spark, sf_dir):
    """End-to-end near-dup clustering: MinHash-LSH candidates -> exact
    Jaccard >= 0.5 verification (shared pair graph) -> distributed
    connected components (min-label propagation). Verified against a
    recursive-CTE oracle."""
    docs = load_table(spark, "documents", sf_dir)
    edges = _neardup_edges(spark, sf_dir)
    cc = D.connected_components(edges.select("id_a", "id_b"), docs.select("doc_id"), "doc_id")
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("id") == F.col("label")).alias("is_canonical"),
    )


@register(
    "neardup_keep_best_docs",
    oracle=f"""
    WITH _cc AS ({D.neardup_clusters_oracle_sql("documents", "text", "doc_id", 0.5)})
    SELECT _cc.doc_id, _cc.cluster_id,
           length(d.text) AS score,
           row_number() OVER (PARTITION BY _cc.cluster_id
                              ORDER BY length(d.text) DESC, _cc.doc_id ASC)
             = 1 AS keep
    FROM _cc JOIN documents d ON d.doc_id = _cc.doc_id
    """,
)
def neardup_keep_best_docs(spark, sf_dir):
    """Cluster-representative selection by quality (FineWeb-style):
    the near-dup clusters from the shared pair graph each keep their
    LONGEST doc (min-id tiebreak) instead of the arbitrary min-id
    canonical — dedup that preserves the best version of duplicated
    content. One extra windowed rank over cluster_id on top of the
    clustering; score here is text length (deterministic and
    engine-portable), production callers pass any quality column."""
    docs = load_table(spark, "documents", sf_dir).withColumn(
        "score", F.length("text").cast("long")
    )
    out = D.neardup_keep_best(docs, "text", "doc_id", "score")
    return out.select("doc_id", "cluster_id", "score", "keep")


@register(
    "leakage_safe_split_docs",
    oracle=f"""
    WITH _cc AS ({D.neardup_clusters_oracle_sql("documents", "text", "doc_id", 0.5)}),
    tagged AS (
        SELECT _cc.doc_id,
               CASE WHEN substr(md5(CAST(_cc.cluster_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'train'
                    WHEN substr(md5(CAST(_cc.cluster_id AS VARCHAR)), 1, 2) < 'f3'
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM _cc
    )
    SELECT split, count(*) AS n_docs, count(DISTINCT doc_id) AS n_distinct
    FROM tagged GROUP BY split
    """,
)
def leakage_safe_split_docs(spark, sf_dir):
    """LEAKAGE-SAFE train/val/test split: the split key is the
    near-dup CLUSTER id, not the document id — every member of a
    near-duplicate cluster lands in the same split, so paraphrased or
    boilerplate-shifted copies of a test document can never leak into
    train (the failure mode a plain per-doc hash split has, and a
    well-documented benchmark-contamination vector). Deterministic
    md5-keyed assignment on the canonical cluster id; the cluster
    graph is the same verified LSH+Jaccard+connected-components
    pipeline the dedup queries use, and the whole composition is
    oracle-checked (recursive-CTE clusters + identical hash split in
    DuckDB)."""
    docs = load_table(spark, "documents", sf_dir)
    edges = _neardup_edges(spark, sf_dir)
    cc = D.connected_components(
        edges.select("id_a", "id_b"), docs.select("doc_id"), "doc_id"
    )
    h2 = F.substring(F.md5(F.col("label").cast("string")), 1, 2)
    split = F.when(h2 < "e6", "train").when(h2 < "f3", "val").otherwise("test")
    return (
        cc.select(F.col("id").alias("doc_id"), split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("doc_id").alias("n_distinct"),
        )
    )


@register(
    "dedup_near_keep_canonical",
    oracle=f"""
    WITH _cc AS ({D.neardup_clusters_oracle_sql("documents", "text", "doc_id", 0.5)})
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN _cc ON d.doc_id = _cc.doc_id
    WHERE _cc.is_canonical
    """,
)
def dedup_near_keep_canonical(spark, sf_dir):
    """The dedup payoff: keep one canonical (min-id) document per
    near-dup cluster — the corpus a training pipeline would feed on."""
    docs = load_table(spark, "documents", sf_dir)
    clusters = QUERIES["neardup_clusters_docs"](spark, sf_dir)
    keep = clusters.filter(F.col("is_canonical")).select("doc_id")
    return docs.join(keep, on="doc_id", how="left_semi").select(
        "doc_id", "lang", "source"
    )


# =====================================================================
# Batch 5: the full Python-UDF surface (scalar pandas_udf, grouped-agg
# pandas_udf, applyInPandas) + exact decimal aggregation
# =====================================================================

@register(
    "applyinpandas_zscore",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS z
    FROM events
    """,
)
def applyinpandas_zscore(spark, sf_dir):
    """Group-wise pandas transform (applyInPandas): z-score of value
    within each event_type. One shuffle on the group key; each group
    processed as a single Arrow batch — the right surface when the
    per-group logic genuinely needs pandas (here it doesn't — the
    window-function oracle IS the cheaper plan — which is exactly the
    comparison the registry documents)."""
    import pandas as pd

    ev = load_table(spark, "events", sf_dir).select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["value"].mean()
        s = pdf["value"].std(ddof=1)
        pdf = pdf.copy()
        pdf["z"] = ((pdf["value"] - m) / s).round(4)
        return pdf[["event_id", "event_type", "z"]]

    return ev.groupBy("event_type").applyInPandas(
        zscore, "event_id long, event_type string, z double"
    )


@register(
    "pandas_udaf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pandas_udaf_weighted_avg(spark, sf_dir):
    """Grouped-aggregate pandas UDF: quantity-weighted average price.
    Arrow-batched per group — the UDAF surface for aggregations Spark
    lacks natively."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    @pandas_udf("long")
    def n_rows(price: pd.Series) -> int:
        # grouped-agg pandas UDFs can't mix with native aggregates in
        # one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the count is a
        # pandas UDAF too
        return len(price)

    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("wavg_price"),
        n_rows("l_extendedprice").alias("n"),
    )


@register(
    "pandas_scalar_udf_net",
    oracle="""
    SELECT l_linestatus, round(sum(l_extendedprice * (1 - l_discount)), 4) AS net_total
    FROM lineitem GROUP BY l_linestatus
    """,
)
def pandas_scalar_udf_net(spark, sf_dir):
    """Scalar pandas UDF (Arrow-vectorized): net price per row, then a
    native aggregation. ~10-100x faster than a row-at-a-time Python UDF
    (the reference's per-record RPC was slower still); the built-in
    Column expression (columnar_fastpath_lineitem) beats both."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def net(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_linestatus").agg(
        F.round(F.sum(net("l_extendedprice", "l_discount")), 4).alias("net_total")
    )


@register(
    "arrow_optimized_udf_band",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS band,
           count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY 1
    """,
)
def arrow_optimized_udf_band(spark, sf_dir):
    """Arrow-optimized Python UDF (``@udf(useArrow=True)``, Spark
    3.5+/4): row-signature Python code, Arrow-batched transport — the
    migration path for legacy row UDFs that can't be rewritten as
    pandas UDFs (per-row logic with scalars in/out) but shouldn't pay
    pickle-per-row. Still an optimization barrier: the banding here is
    trivially a CASE expression (the oracle), which is the point the
    docstring of python_transform makes — this query exists to cover
    the API surface."""
    from pyspark.sql.functions import udf

    @udf("string", useArrow=True)
    def band(price: float) -> str:
        if price >= 300000:
            return "high"
        if price >= 100000:
            return "mid"
        return "low"

    o = load_table(spark, "orders", sf_dir)
    return o.groupBy(band("o_totalprice").alias("band")).agg(
        F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price")
    )


@register(
    "decimal_exact_totals",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS total_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS total_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def decimal_exact_totals(spark, sf_dir):
    """Exact DECIMAL aggregation — bit-identical totals with no
    rounding convention needed (the money-math path; the reference's
    codec had no decimal type at all, SURVEY.md §1)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("string")
        .alias("total_price"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("string").alias("total_qty"),
    )


# =====================================================================
# Batch 6: bucketed co-located join, RANGE window frames, map
# construction/explosion, multi-granularity rollup
# =====================================================================

@register(
    "bucketed_join_colocated",
    oracle="""
    SELECT o.o_orderstatus, count(*) AS n, round(sum(l.l_quantity), 4) AS total_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def bucketed_join_colocated(spark, sf_dir):
    """Bucketed tables co-locate join keys at WRITE time; the join then
    runs with zero shuffle on either side (asserted in
    tests/test_plans.py::test_bucketed_join_no_shuffle). At 100 TB this
    converts every repeated orderkey join from a full shuffle into a
    local zip of pre-sorted buckets."""
    import os

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderstatus")
    li_t, o_t = f"li_bkt_{tag}", f"o_bkt_{tag}"
    # the warehouse directory outlives the in-memory catalog: a fresh
    # session sees no table but a stale location -> clear both
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (li_t, o_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(li_t)
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(o_t)
    lb, ob = spark.table(li_t), spark.table(o_t)
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("total_qty"))
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (
             PARTITION BY l_suppkey ORDER BY epoch(l_shipdate)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 4) AS qty_7d
    FROM lineitem WHERE l_suppkey <= 5
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame over event time (trailing 7 days of quantity per
    supplier) — value-based framing with peer-row inclusion, the frame
    type ROWS can't express."""
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_suppkey") <= 5)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.unix_timestamp("l_shipdate"))
        .rangeBetween(-604800, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 4).alias("qty_7d"),
    )


@register(
    "map_entries_orders",
    oracle="""
    SELECT k, v, count(*) AS n FROM (
      SELECT 'status' AS k, o_orderstatus AS v FROM orders
      UNION ALL
      SELECT 'priority' AS k, o_orderpriority AS v FROM orders
    ) GROUP BY k, v
    """,
)
def map_entries_orders(spark, sf_dir):
    """Map construction + entry explosion (create_map -> explode):
    columns to key/value rows, the MapType surface of the reference's
    codec (PythonObjectsEncoder.java:55-60) as a relational operator."""
    o = load_table(spark, "orders", sf_dir)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return (
        o.select(F.explode(m).alias("k", "v"))
        .groupBy("k", "v")
        .agg(F.count("*").alias("n"))
    )


@register(
    "multi_grain_rollup_events",
    oracle=f"""
    SELECT CASE WHEN grouping(b5) = 0 THEN '5min'
                WHEN grouping(bh) = 0 THEN 'hour' ELSE 'day' END AS grain,
           strftime(coalesce(b5, bh, bd), '{_STRF}') AS bucket,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM (SELECT time_bucket(INTERVAL 5 minutes, ts) AS b5,
                 date_trunc('hour', ts) AS bh,
                 date_trunc('day', ts) AS bd, value
          FROM events)
    GROUP BY GROUPING SETS ((b5), (bh), (bd))
    """,
)
def multi_grain_rollup_events(spark, sf_dir):
    """Hypertable-style continuous-aggregate shape: 5-minute, hourly
    and daily rollups of the event stream in ONE scan + one grouping-
    sets aggregate (vs three separate passes — at 100 TB the scan is
    the cost, so 3x fewer reads)."""
    ev = load_table(spark, "events", sf_dir)
    ev.select(
        F.timestamp_seconds((F.floor(F.unix_timestamp("ts") / 300) * 300).cast("long")).alias("b5"),
        F.date_trunc("hour", F.col("ts")).alias("bh"),
        F.date_trunc("day", F.col("ts")).alias("bd"),
        "value",
    ).createOrReplaceTempView("_mg_events")
    return spark.sql(
        f"""
        SELECT CASE WHEN grouping(b5) = 0 THEN '5min'
                    WHEN grouping(bh) = 0 THEN 'hour' ELSE 'day' END AS grain,
               date_format(coalesce(b5, bh, bd), 'yyyy-MM-dd HH:mm:ss') AS bucket,
               count(*) AS n, round(sum(value), 4) AS total_value
        FROM _mg_events
        GROUP BY GROUPING SETS ((b5), (bh), (bd))
        """
    )


# =====================================================================
# Batch 7: gap-filled time series, statistical aggregates, ordered
# string_agg, CDC latest-wins compaction, full-outer & cross joins
# =====================================================================

@register(
    "gap_fill_timeseries",
    oracle=f"""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL 1 hour, min(ts)) AS lo,
             time_bucket(INTERVAL 1 hour, max(ts)) AS hi
      FROM events
    ),
    slots AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 hour)) AS slot FROM bounds),
    agg AS (
      SELECT time_bucket(INTERVAL 1 hour, ts) AS slot,
             count(*) AS n, round(sum(value), 4) AS total_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT strftime(s.slot, '{_STRF}') AS slot,
           coalesce(a.n, 0) AS n,
           coalesce(a.total_value, 0.0) AS total_value
    FROM slots s LEFT JOIN agg a ON s.slot = a.slot
    """,
)
def gap_fill_timeseries(spark, sf_dir):
    """Gap-filled hourly series (hypertable `time_bucket_gapfill`
    shape): generate the full slot spine with `sequence()`, left-join
    the aggregate, zero-fill empty hours. The spine is one row per
    hour — broadcastable at any corpus scale."""
    ev = load_table(spark, "events", sf_dir)
    agg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("slot"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("slot")
    )
    return (
        spine.join(agg, on="slot", how="left")
        .select(
            _ts(F.col("slot")).alias("slot"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("total_value"), F.lit(0.0)).alias("total_value"),
        )
    )


@register(
    "stats_aggregates",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(stddev_samp(l_extendedprice), 4) AS price_stddev,
           round(var_samp(l_quantity), 4) AS qty_var
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_aggregates(spark, sf_dir):
    """Statistical aggregate catalog: correlation, covariance,
    stddev, variance — all single-pass JVM aggregates."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
    )


@register(
    "string_agg_ordered",
    oracle="""
    SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def string_agg_ordered(spark, sf_dir):
    """Deterministic ordered string aggregation: collect_list is
    unordered by contract, so sort_array before joining — same result
    on any partitioning."""
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
        )
    )


def _scd2_history(spark, sf_dir):
    """Shared SCD Type-2 build over the events change stream (see
    scd2_history_events)."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("valid_from", _ts(F.col("ts")))
        .withColumn("valid_to", _ts(F.lead("ts").over(w)))
        .withColumn(
            "is_current", F.lead("ts").over(w).isNull()
        )
        .select(
            "user_id",
            "event_type",
            F.round("value", 4).alias("value"),
            "valid_from",
            "valid_to",
            "is_current",
        )
    )


@register(
    "scd2_history_events",
    oracle=f"""
    SELECT user_id, event_type, round(value, 4) AS value,
           strftime(ts, '{_STRF}') AS valid_from,
           strftime(lead(ts) OVER w, '{_STRF}') AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type
                 ORDER BY ts ASC, event_id ASC)
    """,
)
def scd2_history_events(spark, sf_dir):
    """SCD Type 2 (slowly-changing-dimension history): every change to
    a (user, event_type) key becomes a versioned row with
    [valid_from, valid_to) validity and an is_current flag — the
    warehouse pattern that preserves full history instead of
    overwriting (the temporal complement of cdc_upsert_latest's
    latest-wins compaction). One shuffle on the key; both window
    passes (valid_to + is_current) share the partitioning."""
    return _scd2_history(spark, sf_dir)


@register(
    "scd2_as_of_lookup",
    oracle=f"""
    WITH h AS (
      SELECT user_id, event_type, round(value, 4) AS value, ts AS vf,
             lead(ts) OVER (PARTITION BY user_id, event_type
                            ORDER BY ts ASC, event_id ASC) AS vt
      FROM events
    )
    SELECT user_id, event_type, value
    FROM h
    WHERE vf <= TIMESTAMP '2024-03-01 00:00:00'
      AND (vt IS NULL OR vt > TIMESTAMP '2024-03-01 00:00:00')
    """,
)
def scd2_as_of_lookup(spark, sf_dir):
    """Point-in-time lookup against the SCD2 history: the dimension
    state as of one instant — each key's single row whose validity
    interval covers the probe time. This is what 'train on the corpus
    exactly as it stood on date X' compiles to against a versioned
    dimension."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    probe = F.lit("2024-03-01 00:00:00").cast("timestamp")
    h = ev.withColumn("vt", F.lead("ts").over(w))
    return (
        h.filter((F.col("ts") <= probe) & (F.col("vt").isNull() | (F.col("vt") > probe)))
        .select("user_id", "event_type", F.round("value", 4).alias("value"))
    )


@register(
    "cdc_upsert_latest",
    oracle="""
    SELECT user_id, event_type,
           strftime(max_ts, '%Y-%m-%d %H:%M:%S') AS last_ts, round(last_value, 4) AS last_value
    FROM (
      SELECT user_id, event_type, ts AS max_ts, value AS last_value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def cdc_upsert_latest(spark, sf_dir):
    """CDC compaction (latest-wins upsert): one deterministic survivor
    per key by (ts, event_id) — the merge step of an upsert sink on a
    format without MERGE support. One shuffle on the key; at scale this
    is the standard log-compaction pass before publishing a snapshot."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            _ts(F.col("ts")).alias("last_ts"),
            F.round(F.col("value"), 4).alias("last_value"),
        )
    )


@register(
    "full_outer_join_activity",
    oracle="""
    SELECT coalesce(a.k, b.k) AS custkey,
           a.n_small_orders, b.n_big_orders
    FROM (SELECT o_custkey AS k, count(*) AS n_small_orders
          FROM orders WHERE o_totalprice < 50000 GROUP BY 1) a
    FULL OUTER JOIN
         (SELECT o_custkey AS k, count(*) AS n_big_orders
          FROM orders WHERE o_totalprice > 300000 GROUP BY 1) b
      ON a.k = b.k
    """,
)
def full_outer_join_activity(spark, sf_dir):
    """Full outer join with null-extension on BOTH sides (customers
    with only small or only big orders)."""
    o = load_table(spark, "orders", sf_dir)
    small = (
        o.filter(F.col("o_totalprice") < 50000)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_small_orders"))
    )
    big = (
        o.filter(F.col("o_totalprice") > 300000)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_big_orders"))
    )
    return small.join(big, on="k", how="full").select(
        F.col("k").alias("custkey"), "n_small_orders", "n_big_orders"
    )


@register(
    "cross_join_dims",
    oracle="""
    SELECT r.r_name, s.tier, count(*) AS n_nations
    FROM region r
    CROSS JOIN (VALUES ('gold'), ('silver')) s(tier)
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, s.tier
    """,
)
def cross_join_dims(spark, sf_dir):
    """Explicit cross join (dimension expansion) — broadcast nested
    loop on a literal frame."""
    r = load_table(spark, "region", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    tiers = spark.createDataFrame([("gold",), ("silver",)], "tier string")
    return (
        r.crossJoin(F.broadcast(tiers))
        .join(n, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "tier")
        .agg(F.count("*").alias("n_nations"))
    )


# =====================================================================


_LADDER_PRESS = (
    "identical press release syndicated verbatim across regional news "
    "portals every single morning edition"
)
_LADDER_BOILER = (
    "annual maritime festival returns with seventeen decorated boats "
    "parading past the old lighthouse"
)
# 7 shared tokens + one per-doc token = 8 total: the one 8-gram window
# of each near-dup doc contains its unique token, so the span stage
# provably cannot touch them (no cross-doc 8-gram), while the 3-word
# shingle Jaccard between any two is 5/7 — a fuzzy-stage-only clique.
_LADDER_NEAR = "harbor seals gather near the quiet pier city"


def _dedup_ladder_oracle() -> str:
    """The whole ladder replayed in ONE DuckDB query: fixture -> exact
    window -> cross-doc span removal (nested WITH) -> LSH-free exact
    near-dup clustering (recursive CTE) -> cluster-keyed split. Each
    stage reuses the same oracle builder its standalone query uses;
    stages nest as WITH-inside-CTE blocks so their internal CTE names
    (_tok, _grams, ...) cannot collide."""
    span = D.cross_doc_span_dedup_oracle_sql("surv1", "text", "doc_id", 8)
    cc = D.neardup_clusters_oracle_sql("s2t", "clean_text", "doc_id", 0.5)
    return f"""
    WITH fixture AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 3 THEN '{_LADDER_PRESS}'
                  WHEN doc_id % 13 = 5
                  THEN '{_LADDER_NEAR}' || CAST(doc_id AS VARCHAR)
                  WHEN doc_id % 7 = 0 THEN text || ' {_LADDER_BOILER}'
                  ELSE text END AS text
      FROM documents
    ),
    s1 AS (
      SELECT doc_id, text,
             doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
      FROM fixture
    ),
    surv1 AS (SELECT doc_id, text FROM s1 WHERE keep),
    s2 AS ({span}),
    s2t AS (SELECT doc_id, clean_text FROM s2),
    cc AS ({cc}),
    split AS (
      SELECT doc_id, cluster_id, is_canonical,
             substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) AS h2
      FROM cc
    )
    SELECT s1.doc_id,
           CASE WHEN NOT s1.keep THEN 'dropped_exact'
                WHEN NOT split.is_canonical THEN 'dropped_neardup'
                WHEN split.h2 < 'e6' THEN 'train'
                WHEN split.h2 < 'f3' THEN 'val'
                ELSE 'test' END AS verdict,
           CAST(coalesce(s2.n_removed, 0) AS BIGINT) AS n_removed
    FROM s1
    LEFT JOIN s2 ON s1.doc_id = s2.doc_id
    LEFT JOIN split ON s1.doc_id = split.doc_id
    """


@register("dedup_ladder_end_to_end", oracle=_dedup_ladder_oracle())
def dedup_ladder_end_to_end(spark, sf_dir):
    """The DEDUP capstone — the full production ladder in one
    composition, the dedup twin of crawl_pipeline_end_to_end: (1)
    EXACT dedup (min-id per md5(text) — one hash-partitioned window);
    (2) CROSS-DOCUMENT span removal on the survivors
    (cross_doc_span_dedup: shared >= 8-token spans keep one canonical
    occurrence, the Lee-et-al. step); (3) FUZZY near-dup clustering of
    the cleaned text (MinHash LSH candidates -> exact Jaccard >= 0.5
    verification -> connected components, min-id canonical); (4)
    LEAKAGE-SAFE train/val/test split keyed on the near-dup CLUSTER
    id, so paraphrased copies of a test document can never reach
    train. Per-document verdict row: dropped_exact / dropped_neardup /
    train / val / test plus span-removal token accounting. The fixture
    plants all three pathologies (byte-identical press releases for
    the exact stage; a shared 13-token boilerplate sentence for the
    span stage; an 8-token near-dup clique — 7 shared tokens + one
    per-doc token, so its single 8-gram window is always unique and
    the span stage provably cannot pre-empt the fuzzy stage, while
    pairwise shingle Jaccard is 5/7) on top of the corpus's natural
    near-dups.
    ONE DuckDB oracle replays the entire ladder (nested-WITH stage
    blocks + recursive-CTE components), so every verdict and every
    removed-token count hash-matches end to end. Scale shape: stages
    1-2 are the audited shapes of their standalone queries; stage 3's
    iteration runs on the verified PAIR graph (orders of magnitude
    smaller than the corpus); the split is a projection."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    fixture = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 3, F.lit(_LADDER_PRESS))
        .when(
            F.col("doc_id") % 13 == 5,
            F.concat(F.lit(_LADDER_NEAR), F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" " + _LADDER_BOILER)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    w = Window.partitionBy(F.md5("text"))
    # Stage outputs are shared, not re-derived (the lang_id_tiered
    # pattern): s1 feeds both the span stage and the final verdict
    # join, and s2 feeds both the fuzzy stage (tokenize + minhash over
    # clean_text) and the n_removed join — without materialization
    # each consumer re-runs the whole upstream stage (the span
    # assembly twice was ~half the capstone's sweep cost).
    s1 = fixture.select(
        "doc_id",
        "text",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
    ).transform(stage_checkpoint)
    surv1 = s1.filter("keep").select("doc_id", "text")
    s2 = D.cross_doc_span_dedup(surv1, "text", "doc_id", n=8).transform(stage_checkpoint)
    clusters = D.neardup_clusters(s2, "clean_text", "doc_id", threshold=0.5)
    h2 = F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 2)
    split = clusters.select(
        "doc_id",
        "is_canonical",
        F.when(h2 < "e6", "train")
        .when(h2 < "f3", "val")
        .otherwise("test")
        .alias("_split"),
    )
    verdict = (
        F.when(~F.col("keep"), "dropped_exact")
        .when(~F.col("is_canonical"), "dropped_neardup")
        .otherwise(F.col("_split"))
    )
    return (
        s1.select("doc_id", "keep")
        .join(s2.select("doc_id", "n_removed"), on="doc_id", how="left")
        .join(split, on="doc_id", how="left")
        .select(
            "doc_id",
            verdict.alias("verdict"),
            F.coalesce("n_removed", F.lit(0).cast("long")).alias("n_removed"),
        )
    )
