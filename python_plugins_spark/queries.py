"""The engine's query registry — the driver-facing contract.

Every implemented operator (SURVEY.md §2) appears here as a named query
``(spark, sf_dir) -> DataFrame`` together with the ANSI/DuckDB SQL that
computes the identical result on the same parquet tables. The driver
hash-compares the two at sf=0.01 (CORRECTNESS gate); ``bench.py`` times
the headline subset at sf=0.1.

Engine-portability conventions (so value hashes match):

- timestamps are emitted as formatted strings (Spark session TZ is
  pinned UTC; DuckDB is UTC-naive);
- floating aggregates are rounded (4 dp for sums/avgs — accumulated FP
  error across partition orders is ~1e-9 relative, far below rounding).
  EXCEPTION — whole-table-magnitude sums (e.g. sum(o_totalprice) over
  one status group ~1e10 at sf0.1): fixed-decimal-place rounding does
  not scale with magnitude, so those sums aggregate EXACTLY as
  DECIMAL(18,2) per-row casts (identical on both engines) and cast
  back to DOUBLE for comparison — scale-proof at any SF;
- every computed column is aliased identically on both sides;
- top-N queries order by (rounded measure, unique key) so the selected
  set is identical under either engine's sort.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd  # noqa: F401 — resolves postponed type hints in pandas UDFs

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_plugins_spark.functions import oracle_fragments as OF
from python_plugins_spark.operators import dedup as D
from python_plugins_spark.operators import multimodal as MM
from python_plugins_spark.operators import relational as R
from python_plugins_spark.operators import similarity as S
from python_plugins_spark.operators import text as TX
from python_plugins_spark.operators.asof import asof_join
from python_plugins_spark.operators.transform import python_transform
from python_plugins_spark.sources.io import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Headline queries timed by bench.py (a representative cross-section:
# scan+agg, multi-join, window, transform, dedup, similarity, text).
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "window_running_qty",
    "topk_per_group_price",
    "transform_revenue_agg",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "ann_topk_cosine",
    "text_stats_docs",
    "sessionize_events",
    "json_extract_events",
    "embedding_lsh_neardup",
    "dedup_exact_documents",
    "multimodal_fake_decode",
    "streaming_tumbling_counts",
    "q13_order_distribution",
    "q18_big_orders",
    "cdc_upsert_latest",
    "label_centroids",
    "higher_order_array_funcs",
    "applyinpandas_zscore",
]


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _global_index_part(df, *sort_cols, n_parts: int = 16):
    """Build the range-partitioned, locally-numbered frame behind the
    distributed global-index pattern (global_sequence_orders,
    quality_tier_binning): range-partition on the sort key(s), sort
    within partitions, and derive (pid, local_rn) from
    monotonically_increasing_id. The FACT DATA SHUFFLES ONCE — the
    range exchange; local numbering is a narrow op.

    Callers MUST materialize the result exactly once (eager
    localCheckpoint) before branching into counts/rank subtrees:
    under AQE the two branches can otherwise re-evaluate the exchange
    with different coalescing and disagree on pid/local_rn (observed
    at sf0.1 as off-by-a-few tier populations). The plan test asserts
    the single-range-shuffle property on THIS pre-checkpoint frame,
    since the checkpoint hides the exchange from the final plan."""
    return (
        df.repartitionByRange(n_parts, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("pid", F.spark_partition_id())
        .withColumn(
            "local_rn",
            F.monotonically_increasing_id()
            - (F.col("pid").cast("long") * F.lit(1 << 33)),
        )
    )


def _ts(col, fmt: str = "yyyy-MM-dd HH:mm:ss"):
    return F.date_format(col, fmt)


_STRF = "%Y-%m-%d %H:%M:%S"


# =====================================================================
# Relational core (SURVEY.md §2c — scan/filter/agg/join/window/setops)
# =====================================================================

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan -> pushed filter -> 8-agg hash aggregate.
    Whole plan is codegen; partial aggregation happens map-side so the
    shuffle carries one row per (flag, status) per partition."""
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_top_orders",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_top_orders(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> two joins -> agg ->
    global top-10. Customer side is broadcast (small after the segment
    filter); top-10 is TakeOrderedAndProject, not a full sort."""
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderdate") < "1998-06-01")
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > "1998-06-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            _ts(F.col("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join. region/nation/supplier broadcast;
    the only large shuffles are orders|x|lineitem on orderkey."""
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    n = load_table(spark, "nation", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@register(
    "filter_project_pushdown",
    oracle="""
    SELECT l_orderkey, l_partkey, round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    WHERE l_quantity >= 45 AND l_returnflag = 'A'
    """,
)
def filter_project_pushdown(spark, sf_dir):
    """Projection + selective filter; both reach the parquet scan
    (PushedFilters + pruned ReadSchema — asserted in tests)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter((F.col("l_quantity") >= 45) & (F.col("l_returnflag") == "A"))
        .select(
            "l_orderkey",
            "l_partkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        )
    )


@register(
    "join_broadcast_parts",
    oracle="""
    SELECT p.p_brand, count(*) AS n_items,
           round(sum(l.l_quantity), 4) AS total_qty,
           round(avg(p.p_retailprice), 4) AS avg_retail
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_broadcast_parts(spark, sf_dir):
    """Fact |x| small dim: explicit broadcast — zero shuffle of the
    lineitem side for the join; only the final small agg shuffles."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 4).alias("total_qty"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_retail"),
        )
    )


@register(
    "join_left_customer_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 4) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_customer_orders(spark, sf_dir):
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("total_spent"),
        )
    )


@register(
    "semi_join_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def semi_join_customers_with_orders(spark, sf_dir):
    """EXISTS as left-semi: the orders side reduces to a key set before
    the join — no row multiplication, broadcastable after the filter."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 400000)
    return R.exists_join(c, o, c.c_custkey == o.o_custkey).select("c_custkey", "c_mktsegment")


@register(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, round(c_acctbal, 4) AS c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1998-01-01')
    """,
)
def anti_join_customers_without_orders(spark, sf_dir):
    """Anti join; predicate is time-scoped (no 1998+ order) so the
    result is non-empty at every test SF — a zero-row result would
    make the oracle hash-match vacuous."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderdate") >= "1998-01-01")
    return R.not_exists_join(c, o, c.c_custkey == o.o_custkey).select(
        "c_custkey", F.round(F.col("c_acctbal"), 4).alias("c_acctbal")
    )


@register(
    "agg_distinct_suppliers",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_suppliers(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "rollup_qty",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_qty(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    return R.rollup(
        li,
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": F.round(F.sum("l_quantity"), 4), "n": F.count("*")},
    )


@register(
    "cube_qty",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_qty(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    return R.cube(
        li,
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": F.round(F.sum("l_quantity"), 4), "n": F.count("*")},
    )


@register(
    "window_rank_orders",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey, round(o_totalprice, 4) AS o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
             rank() OVER (PARTITION BY o_orderpriority
                          ORDER BY round(o_totalprice, 4) DESC) AS rnk
      FROM orders
    ) WHERE rn <= 5
    """,
)
def window_rank_orders(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    w_rank = Window.partitionBy("o_orderpriority").orderBy(
        F.round(F.col("o_totalprice"), 4).desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn("rnk", F.rank().over(w_rank))
        .filter(F.col("rn") <= 5)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round(F.col("o_totalprice"), 4).alias("o_totalprice"),
            F.col("rn").cast("long").alias("rn"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


@register(
    "window_running_qty",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty,
           round(avg(l_quantity) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS ma10_qty
    FROM lineitem WHERE l_suppkey <= 5
    """,
)
def window_running_qty(spark, sf_dir):
    """Running/moving aggregates with an explicit ROWS frame and a
    fully deterministic ordering (ties broken by key columns)."""
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_suppkey") <= 5)
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_qty"),
        F.round(F.avg("l_quantity").over(w.rowsBetween(-9, 0)), 4).alias("ma10_qty"),
    )


@register(
    "topk_per_group_price",
    oracle="""
    SELECT * FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber,
             round(l_extendedprice, 4) AS l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
      FROM lineitem
    ) WHERE rn <= 3
    """,
)
def topk_per_group_price(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    out = R.top_k_per_group(
        li,
        ["l_returnflag"],
        [F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        3,
    )
    return out.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice"), 4).alias("l_extendedprice"),
        F.col("rn").cast("long").alias("rn"),
    )


@register(
    "global_top100_orders",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
)
def global_top100_orders(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    return (
        R.sort_limit(o, [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 100)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice"), 4).alias("o_totalprice"),
            _ts(F.col("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate"),
        )
    )


@register(
    "set_union_intersect",
    oracle="""
    SELECT c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    )
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_union_intersect(spark, sf_dir):
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    unioned = R.union_all(building, rich).distinct()
    order_keys = o.select(F.col("o_custkey").alias("c_custkey"))
    return R.intersect(unioned, order_keys)


@register(
    "set_except_customers",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_customers(spark, sf_dir):
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    pos = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return R.except_rows(pos, fin)


@register(
    "pivot_status_qty",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS "O",
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS "F"
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status_qty(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    out = R.pivot(li, ["l_returnflag"], "l_linestatus", ["O", "F"], F.sum("l_quantity"))
    return out.select(
        "l_returnflag",
        F.round(F.col("O"), 4).alias("O"),
        F.round(F.col("F"), 4).alias("F"),
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT measure, round(sum(val), 4) AS total FROM (
      SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
    ) GROUP BY measure
    """,
)
def unpivot_lineitem_measures(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    long = R.unpivot(
        li,
        ["l_orderkey"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )
    return long.groupBy("measure").agg(F.round(F.sum("val"), 4).alias("total"))


@register(
    "scalar_string_date_math",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           upper(substr(o_orderpriority, 3, 20)) AS priority_name,
           length(o_orderpriority) AS prio_len,
           round(abs(o_totalprice - 100000.0), 4) AS dist_from_100k,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS size_class,
           concat(o_orderstatus, '-', CAST(year(o_orderdate) AS VARCHAR)) AS status_year
    FROM orders
    """,
)
def scalar_string_date_math(spark, sf_dir):
    """Scalar function catalog showcase: date parts, string ops, math,
    conditionals — all JVM built-ins (the reference needed user Python
    for every one of these; SURVEY.md §2b)."""
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.upper(F.substring("o_orderpriority", 3, 20)).alias("priority_name"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.round(F.abs(F.col("o_totalprice") - 100000.0), 4).alias("dist_from_100k"),
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.concat_ws("-", "o_orderstatus", F.year("o_orderdate").cast("string")).alias(
            "status_year"
        ),
    )


@register(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(avg(json_extract_string(props, '$.k')::INT), 4) AS avg_k,
           max(json_extract_string(props, '$.k')::INT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def json_extract_events(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "sessionize_events",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g
    )
    SELECT user_id, count(DISTINCT session_id) AS n_sessions, count(*) AS n_events
    FROM s GROUP BY user_id
    """,
)
def sessionize_events(spark, sf_dir):
    """Batch sessionization (30-min gap) then per-user session counts.
    One shuffle partitioning (user_id) serves both window passes."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    sess = (
        ev.withColumn(
            "_new", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
        )
        .withColumn(
            "session_id",
            F.sum("_new").over(
                Window.partitionBy("user_id")
                .orderBy("ts")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@register(
    "tumbling_batch_events",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL 5 minutes, ts), '{_STRF}') AS window_start,
           event_type, count(*) AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_batch_events(spark, sf_dir):
    """Tumbling 5-minute windows in batch (same aggregation the
    streaming layer runs incrementally — see streaming_tumbling_counts)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            _ts(F.col("win.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "asof_join_purchase",
    oracle=f"""
    SELECT event_id,
           strftime(ts, '{_STRF}') AS ts_s,
           event_type,
           round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value_asof
    FROM events
    """,
)
def asof_join_purchase(spark, sf_dir):
    """As-of join: every event picks the latest prior-or-simultaneous
    purchase value of the same user (union+window implementation — one
    shuffle, no per-group Python)."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = asof_join(
        ev.select("event_id", "user_id", "ts", "event_type"),
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
    )
    return joined.select(
        "event_id",
        _ts(F.col("ts")).alias("ts_s"),
        "event_type",
        F.round(F.col("value_asof"), 4).alias("value_asof"),
    )


@register(
    "range_join_value_tiers",
    oracle="""
    SELECT t.tier_name, count(*) AS n, round(sum(e.value), 4) AS total_value
    FROM events e JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0),
                               ('high', 200.0, 1000000.0)) t(tier_name, lo, hi)
      ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier_name
    """,
)
def range_join_value_tiers(spark, sf_dir):
    """Point-in-interval range join against a broadcast tier table
    (BroadcastNestedLoopJoin — correct plan for a 3-row dim)."""
    ev = load_table(spark, "events", sf_dir)
    tiers = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1000000.0)],
        "tier_name string, lo double, hi double",
    )
    joined = R.range_join(ev, tiers, F.col("value"), F.col("lo"), F.col("hi"))
    return joined.groupBy("tier_name").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value")
    )

# =====================================================================
# The transform operator family (SURVEY.md §2a/2b — the reference's
# actual surface, re-expressed)
# =====================================================================

@register(
    "transform_revenue_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100.0, 4)
               AS total_revenue,
           round(sum(floor(l_extendedprice * (1 - l_discount) * 0.07::DOUBLE * 100 + 0.5)) / 100.0, 4)
               AS total_tax,
           count(*) AS n
    FROM lineitem
    WHERE l_quantity < 49
    GROUP BY l_returnflag
    """,
)
def transform_revenue_agg(spark, sf_dir):
    """Flagship: the reference's tax example
    (docs/PythonEvaluator-transform.md:46-84) — per-record Python
    computing revenue + tax with a runtime-arg rate and an error route
    for out-of-range quantities, then a native aggregation on top."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_quantity", "l_extendedprice", "l_discount", "l_returnflag"
    )
    script = """
def transform(record, emitter, context):
    rate = float(context.getArguments().get('taxrate'))
    if record['l_quantity'] >= 49:
        emitter.emitError({'errorCode': 10, 'errorMsg': 'quantity out of range',
                           'invalidRecord': record})
        return
    revenue = record['l_extendedprice'] * (1 - record['l_discount'])
    emitter.emit({'l_returnflag': record['l_returnflag'],
                  'revenue': revenue, 'tax': revenue * rate})
"""
    res = python_transform(
        li,
        script=script,
        output_schema="l_returnflag string, revenue double, tax double",
        args={"taxrate": "0.07"},
        emit_errors=True,
    )
    # exact fixed-point totals: each row's revenue/tax is floored to
    # integer cents (floor(x*100+0.5) is half-up in BOTH engines — no
    # round-mode divergence), so the group sums are integers and the
    # result is independent of summation order at any scale
    return res.output.groupBy("l_returnflag").agg(
        F.round(F.sum(F.floor(F.col("revenue") * 100 + 0.5)) / 100.0, 4).alias("total_revenue"),
        F.round(F.sum(F.floor(F.col("tax") * 100 + 0.5)) / 100.0, 4).alias("total_tax"),
        F.count("*").alias("n"),
    )


@register(
    "transform_identity_region",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def transform_identity_region(spark, sf_dir):
    """Identity pass-through (reference BasePythonTransformTest.java:102-114):
    no output schema declared -> input schema passes through."""
    r = load_table(spark, "region", sf_dir)
    return python_transform(
        r, script="def transform(record, emitter, context):\n    emitter.emit(record)\n"
    ).output


@register(
    "transform_filter_nation",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey <> 2",
)
def transform_filter_nation(spark, sf_dir):
    """Record-level filter (reference BasePythonTransformTest.java:117-135)."""
    n = load_table(spark, "nation", sf_dir)
    script = """
def transform(record, emitter, context):
    if record['n_regionkey'] != 2:
        emitter.emit(record)
"""
    return python_transform(n, script=script).output


@register(
    "transform_python2_script",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal
    FROM customer WHERE c_custkey % 2 = 0
    """,
)
def transform_python2_script(spark, sf_dir):
    """A VERBATIM Python-2 CDAP script (print statement, ``has_key``,
    ``except E, e``, ``<>``, ``long()``) — the dialect the reference's
    Jython 2.5 Interpreted mode runs and its own tests use
    (``print "emitting..."``, PythonTransformNativeTest.java:60-62).
    The deploy-time compile detects the SyntaxError, applies the
    lib2to3 shim (operators/transform.py:_python2_rewrite), and the
    script runs unmodified — closing the last migration gap for users
    carrying Python-2 pipeline scripts."""
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    script = """
def transform(record, emitter, context):
    if record['c_custkey'] < 3:
        print "emitting records"
    try:
        x = long(record['c_custkey'])
    except Exception, e:
        x = 0
    if record.has_key('c_custkey') and record['c_nationkey'] <> 99 and x % 2 == 0:
        emitter.emit(record)
"""
    return python_transform(c, script=script).output


@register(
    "transform_fanout_region",
    oracle="""
    SELECT r_regionkey, r_name, 'orig' AS variant FROM region
    UNION ALL
    SELECT r_regionkey, lower(r_name), 'lower' FROM region
    """,
)
def transform_fanout_region(spark, sf_dir):
    """1->N fan-out (reference BasePythonTransformTest.java:138-163):
    each record emits twice with a variant tag."""
    r = load_table(spark, "region", sf_dir)
    script = """
def transform(record, emitter, context):
    emitter.emit({'r_regionkey': record['r_regionkey'], 'r_name': record['r_name'],
                  'variant': 'orig'})
    emitter.emit({'r_regionkey': record['r_regionkey'], 'r_name': record['r_name'].lower(),
                  'variant': 'lower'})
"""
    return python_transform(
        r, script=script, output_schema="r_regionkey int, r_name string, variant string"
    ).output


@register(
    "transform_project_supplier",
    oracle="""
    SELECT s_suppkey AS supp_id, upper(s_name) AS supp_name,
           round(s_acctbal, 4) AS balance
    FROM supplier
    """,
)
def transform_project_supplier(spark, sf_dir):
    """Projection + rename + drop via the declared output schema
    (reference PythonEvaluatorTest.java:278-295): emitted dict keys not
    in the schema are dropped, schema fields missing become null."""
    s = load_table(spark, "supplier", sf_dir)
    script = """
def transform(record, emitter, context):
    emitter.emit({'supp_id': record['s_suppkey'],
                  'supp_name': record['s_name'].upper(),
                  'balance': round(record['s_acctbal'], 4),
                  'ignored_extra_key': 'dropped by schema'})
"""
    return python_transform(
        s, script=script, output_schema="supp_id bigint, supp_name string, balance double"
    ).output


@register(
    "transform_error_port_customers",
    oracle="""
    SELECT 22 AS errorCode, 'negative balance' AS errorMsg, c_custkey
    FROM customer WHERE c_acctbal < 0
    """,
)
def transform_error_port_customers(spark, sf_dir):
    """The error port as a first-class dataset (reference
    PythonEvaluatorTest.java:261-275 / docs error-handling example)."""
    c = load_table(spark, "customer", sf_dir)
    script = """
def transform(record, emitter, context):
    if record['c_acctbal'] < 0:
        emitter.emitError({'errorCode': 22, 'errorMsg': 'negative balance',
                           'invalidRecord': record})
    else:
        emitter.emit(record)
"""
    res = python_transform(c, script=script, emit_errors=True)
    return res.errors.select(
        "errorCode", "errorMsg", F.col("invalidRecord.c_custkey").alias("c_custkey")
    )


@register(
    "columnar_fastpath_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price,
           CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'retail' END AS qty_class
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01'
    """,
)
def columnar_fastpath_lineitem(spark, sf_dir):
    """The columnar fast path (SURVEY.md §4 mitigation b): the same
    shape as a python_transform but expressed as Column exprs — stays
    in whole-stage codegen, ~2 orders faster per row."""
    from python_plugins_spark.operators.transform import columnar_transform

    li = load_table(spark, "lineitem", sf_dir)
    out = columnar_transform(
        li,
        exprs={
            "net_price": F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4),
            "qty_class": F.when(F.col("l_quantity") >= 25, "bulk").otherwise("retail"),
        },
        where=F.col("l_shipdate") >= "2000-01-01",
    )
    return out.select("l_orderkey", "l_linenumber", "net_price", "qty_class")


# =====================================================================
# LLM-pipeline operators (north star: dedup / similarity / text /
# multimodal)
# =====================================================================

@register(
    "dedup_exact_documents",
    oracle=D.dedup_exact_oracle_sql(
        "documents", ["text"], "doc_id", "doc_id, lang, source"
    ),
)
def dedup_exact_documents(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return D.dedup_exact(docs, ["text"], "doc_id").select("doc_id", "lang", "source")


@register(
    "doc_fingerprint_docs",
    oracle=TX.doc_fingerprint_oracle_sql("documents", "text", "doc_id"),
)
def doc_fingerprint_docs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return TX.doc_fingerprint(docs, "text", "doc_id")


@register(
    "minhash_signatures",
    oracle=D.minhash_signature_oracle_sql("documents", "text", "doc_id"),
)
def minhash_signatures(spark, sf_dir):
    """Flattened (doc_id, pos, minhash) so the full 32-permutation
    signature is hash-verified against the oracle."""
    docs = load_table(spark, "documents", sf_dir)
    sig = D.minhash_signature(docs, "text", "doc_id")
    return sig.select(
        "doc_id", F.posexplode("sig").alias("pos", "minhash")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "minhash")


@register(
    "minhash_lsh_candidates",
    oracle=D.minhash_lsh_pairs_oracle_sql("documents", "text", "doc_id"),
)
def minhash_lsh_candidates(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return D.minhash_lsh_pairs(docs, "text", "doc_id")


# The verified near-dup pair graph (LSH candidates -> exact Jaccard
# >= 0.5) is the shared upstream of four registry queries. Memoize the
# checkpointed result per (application, sf_dir): the driver's
# correctness gate runs queries back-to-back in one session, and
# recomputing a ~10 s pipeline four times is pure waste (the memo is
# also exactly what a production pipeline does — materialize the pair
# graph once, fan out consumers).
_NEARDUP_EDGES_MEMO: dict[tuple[str, str], DataFrame] = {}


def _neardup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, jaccard) verified pairs, eagerly checkpointed."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _NEARDUP_EDGES_MEMO.get(key)
    if hit is not None:
        return hit
    docs = load_table(spark, "documents", sf_dir)
    candidates = D.minhash_lsh_pairs(docs, "text", "doc_id")
    pairs = D.ngram_jaccard_pairs(
        docs, "text", "doc_id", 0.5, candidates=candidates
    ).localCheckpoint()
    _NEARDUP_EDGES_MEMO[key] = pairs
    return pairs


@register(
    "jaccard_similar_pairs",
    oracle=D.ngram_jaccard_pairs_oracle_sql("documents", "text", "doc_id", 0.5),
)
def jaccard_similar_pairs(spark, sf_dir):
    """Exact-verification stage: Jaccard >= 0.5 on LSH candidates (the
    oracle brute-forces all pairs — LSH recall at this threshold is
    guaranteed-in-practice by 8 bands x 4 rows, verified by the match)."""
    return _neardup_edges(spark, sf_dir)


@register(
    "simhash_signatures",
    oracle=D.simhash_oracle_sql("documents", "text", "doc_id"),
)
def simhash_signatures(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return D.simhash(docs, "text", "doc_id")


@register(
    "simhash_near_pairs",
    oracle=D.simhash_pairs_oracle_sql("documents", "text", "doc_id", 3),
)
def simhash_near_pairs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return D.simhash_pairs(docs, "text", "doc_id", max_hamming=3)


@register(
    "embedding_neardup_exact_baseline",
    oracle=S.cosine_pairs_oracle_sql("embeddings", "vec_id", "embedding", 0.4),
)
def embedding_neardup_exact_baseline(spark, sf_dir):
    """O(n^2) exact cosine pairs — kept ONLY as the oracle-checkable
    exactness baseline. The flagship near-dup path is
    ``embedding_lsh_neardup`` (LSH-bucketed candidates + exact
    verification, one equi-join)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return S.cosine_pairs(emb, "vec_id", "embedding", 0.4)


@register(
    "ann_topk_cosine",
    oracle=S.ann_topk_oracle_sql("embeddings", "vec_id", "embedding", 5),
)
def ann_topk_cosine(spark, sf_dir):
    """Exact top-k via the distributed block-matrix path: hash-packed
    query/corpus blocks, one BLAS matmul per block pair in
    ``mapInPandas``, partitioned-window global reduce. No table data
    transits the driver (the size-gated single-node broadcast variant
    is ``S.ann_topk_numpy``; the sub-quadratic approximate path is
    ``ann_topk_ivf``)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return S.ann_topk_blocked(emb, "vec_id", "embedding", 5)


@register("ann_topk_ivf")
def ann_topk_ivf(spark, sf_dir):
    """IVF approximate top-k (no SQL oracle — approximate by design;
    recall vs brute force is asserted in tests instead)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return S.ivf_ann_topk(emb, "vec_id", "embedding", k=5, n_centroids=16, nprobe=4)


@register(
    "text_stats_docs",
    oracle=TX.text_stats_oracle_sql("documents", "text", "doc_id"),
)
def text_stats_docs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return TX.text_stats(docs, "text", "doc_id")


@register(
    "quality_score_docs",
    oracle=TX.quality_score_oracle_sql("documents", "text", "doc_id"),
)
def quality_score_docs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return TX.quality_score(docs, "text", "doc_id")


@register(
    "lang_id_docs",
    oracle=TX.lang_id_oracle_sql("documents", "text", "doc_id"),
)
def lang_id_docs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return TX.lang_id(docs, "text", "doc_id")


@register(
    "token_count_docs",
    oracle=TX.token_count_oracle_sql("documents", "text", "doc_id"),
)
def token_count_docs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return TX.token_count(docs, "text", "doc_id")


@register(
    "multimodal_fake_decode",
    oracle=MM.decode_stub_features_oracle_sql("documents", "text", "doc_id"),
)
def multimodal_fake_decode(spark, sf_dir):
    """Binary payload pipeline: text -> UTF-8 payload + metadata ->
    Arrow-batched pseudo-decode (md5-derived features). The plumbing —
    schema, batching, UDF signature — is the real multimodal path; only
    the codec is faked (no image libs in this container)."""
    docs = load_table(spark, "documents", sf_dir)
    with_payload = MM.attach_payload(docs, "text")
    return MM.decode_stub_features(with_payload, "payload", "doc_id", fake=True)


# =====================================================================
# Streaming (same operators, incremental execution)
# =====================================================================

@register(
    "streaming_tumbling_counts",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL 5 minutes, ts), '{_STRF}') AS window_start,
           event_type, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def streaming_tumbling_counts(spark, sf_dir):
    """Tumbling-window counts executed as a real Structured Streaming
    query (file source -> complete-mode memory sink, drained
    synchronously), verified against the batch oracle — proving the
    batch/streaming duality the reference only declared (pom.xml:134-137)."""
    import uuid

    from python_plugins_spark.streaming import read_stream_parquet, run_to_memory_sink

    from python_plugins_spark.sources.io import fix_nanos_ts

    from python_plugins_spark.sources.io import ensure_session_confs

    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = fix_nanos_ts(
        read_stream_parquet(spark, f"{sf_dir}/events.parquet", raw_schema)
    )
    agg = (
        stream.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(_ts(F.col("win.start")).alias("window_start"), "event_type", "n")
    )
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    # bounded drain, small keyspace (window x event_type): 8 state
    # stores instead of 32 — see run_to_memory_sink(state_partitions=)
    return run_to_memory_sink(
        agg, name, output_mode="complete", state_partitions=8
    )


@register(
    "streaming_transform_filter",
    oracle="""
    SELECT event_id, user_id, round(value * 2, 4) AS doubled
    FROM events WHERE event_type = 'purchase'
    """,
)
def streaming_transform_filter(spark, sf_dir):
    """The reference's core promise — the identical python_transform
    running on a stream (append mode, stateless)."""
    import uuid

    from python_plugins_spark.streaming import (
        read_stream_parquet,
        run_to_memory_sink,
        streaming_python_transform,
    )

    from python_plugins_spark.sources.io import fix_nanos_ts

    from python_plugins_spark.sources.io import ensure_session_confs

    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = fix_nanos_ts(
        read_stream_parquet(spark, f"{sf_dir}/events.parquet", raw_schema)
    )
    script = """
def transform(record, emitter, context):
    if record['event_type'] == 'purchase':
        emitter.emit({'event_id': record['event_id'], 'user_id': record['user_id'],
                      'doubled': round(record['value'] * 2, 4)})
"""
    res = streaming_python_transform(
        stream, script=script, output_schema="event_id bigint, user_id bigint, doubled double"
    )
    name = f"stream_transform_{uuid.uuid4().hex[:8]}"
    return run_to_memory_sink(res.output, name, output_mode="append")


# ---------------------------------------------------------------------
# Driver contract accessors
# ---------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)


# =====================================================================
# Batch 2: grouping sets, extended windows, exact percentiles,
# correlated aggregates, vocab stats, LSH buckets, sliding windows,
# session-window streaming, stateful streaming, frame sampling,
# skew-resistant join, join-strategy hints, approx sketches
# =====================================================================

@register(
    "grouping_sets_qty",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_qty(spark, sf_dir):
    """Arbitrary GROUPING SETS (beyond rollup/cube) via Spark SQL."""
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "window_lag_lead_ntile",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(lag(o_totalprice) OVER w, 4) AS prev_price,
           round(lead(o_totalprice) OVER w, 4) AS next_price,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING), 4) AS min_price
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_lag_lead_ntile(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.lag("o_totalprice").over(w), 4).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 4).alias("next_price"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.first("o_totalprice").over(w_full), 4).alias("min_price"),
    )


@register(
    "percentiles_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentiles_exact(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont: both linear-interpolate on the sorted set)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


@register(
    "having_big_spenders",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_custkey
    HAVING sum(o_totalprice) > 1000000
    """,
)
def having_big_spenders(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
            F.sum("o_totalprice").alias("_raw_total"),
        )
        .filter(F.col("_raw_total") > 1000000)
        .drop("_raw_total")
    )


@register(
    "correlated_above_avg_orders",
    oracle="""
    SELECT o.o_orderkey, round(o.o_totalprice, 4) AS o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def correlated_above_avg_orders(spark, sf_dir):
    """Scalar-subquery predicate (Catalyst evaluates the subquery once
    and broadcasts the scalar)."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("_corr_orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, round(o.o_totalprice, 4) AS o_totalprice
        FROM _corr_orders o
        WHERE o.o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM _corr_orders)
        """
    )


@register(
    "vocab_per_source",
    oracle="""
    SELECT source, count(DISTINCT tk) AS vocab, count(*) AS total_tokens
    FROM (SELECT source, unnest(str_split_regex(lower(trim(text)), '\\s+')) AS tk
          FROM documents)
    GROUP BY source
    """,
)
def vocab_per_source(spark, sf_dir):
    """Distinct-token vocabulary per source: explode + distinct agg —
    at 100 TB this is the canonical two-phase (partial distinct)
    aggregation shape."""
    from python_plugins_spark.functions import tokens as _tokens

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("source", F.explode(_tokens(F.col("text"))).alias("tk"))
    return tok.groupBy("source").agg(
        F.countDistinct("tk").alias("vocab"), F.count("*").alias("total_tokens")
    )


@register(
    "lsh_buckets_embeddings",
    oracle=S.lsh_buckets_oracle_sql("embeddings", "vec_id", "embedding", 16, 64),
)
def lsh_buckets_embeddings(spark, sf_dir):
    """Random-hyperplane LSH bucket assignment (the ANN scale path's
    partitioning key), hash-verified against plane-literal SQL."""
    emb = load_table(spark, "embeddings", sf_dir)
    return S.lsh_buckets(emb, "vec_id", "embedding", n_planes=16, dim=64)


@register(
    "sliding_window_events",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL 5 minutes, ts) - (k * INTERVAL 5 minutes),
                    '{_STRF}') AS window_start,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events CROSS JOIN (VALUES (0), (1)) o(k)
    GROUP BY 1
    """,
)
def sliding_window_events(spark, sf_dir):
    """Sliding windows (10-min length, 5-min slide): every event lands
    in exactly two windows."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(_ts(F.col("win.start")).alias("window_start"), "n", "total_value")
    )


@register(
    "streaming_session_windows",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g
    )
    SELECT user_id,
           strftime(min(ts), '{_STRF}') AS session_start,
           strftime(max(ts) + INTERVAL 30 minutes, '{_STRF}') AS session_end,
           count(*) AS n
    FROM s GROUP BY user_id, sid
    """,
)
def streaming_session_windows(spark, sf_dir):
    """Native session_window on a real stream, verified against the
    batch gap-sessionization oracle (a session extends while the gap is
    < 30 min; window end = last event + gap)."""
    import uuid

    from python_plugins_spark.sources.io import fix_nanos_ts
    from python_plugins_spark.streaming import read_stream_parquet, run_to_memory_sink

    from python_plugins_spark.sources.io import ensure_session_confs

    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = fix_nanos_ts(
        read_stream_parquet(spark, f"{sf_dir}/events.parquet", raw_schema)
    )
    agg = (
        stream.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            _ts(F.col("win.start")).alias("session_start"),
            _ts(F.col("win.end")).alias("session_end"),
            "n",
        )
    )
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    return run_to_memory_sink(agg, name, output_mode="complete")


@register(
    "stateful_running_totals",
    oracle="""
    SELECT event_type, count(*) AS running_count, round(sum(value), 4) AS running_sum
    FROM events GROUP BY event_type
    """,
)
def stateful_running_totals(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-key running count+sum. With the whole table as one micro-batch
    the final state equals the batch aggregate — which is exactly what
    the oracle checks."""
    import uuid

    from python_plugins_spark.sources.io import fix_nanos_ts
    from python_plugins_spark.streaming import (
        read_stream_parquet,
        run_to_memory_sink,
        stateful_running_agg,
    )

    from python_plugins_spark.sources.io import ensure_session_confs

    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = fix_nanos_ts(
        read_stream_parquet(spark, f"{sf_dir}/events.parquet", raw_schema)
    )
    out = stateful_running_agg(stream, ["event_type"], "value")
    name = f"stream_state_{uuid.uuid4().hex[:8]}"
    got = run_to_memory_sink(out, name, output_mode="update")
    return got.select(
        "event_type",
        "running_count",
        F.round(F.col("running_sum"), 4).alias("running_sum"),
    )


@register(
    "streaming_stateful_topn",
    oracle="""
    SELECT event_type, rk::INT AS rk, round(value, 4) AS value FROM (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value DESC) AS rk
      FROM events
    ) WHERE rk <= 3
    """,
)
def streaming_stateful_topn(spark, sf_dir):
    """Per-key running top-3 via ``transformWithStateInPandas`` with
    typed ListState (list put/get bounded to n elements — state that
    cannot grow with the stream). Whole table in one micro-batch =>
    final state equals the batch per-key top-3 the oracle computes
    (value ties produce identical row multisets either way)."""
    import uuid

    from python_plugins_spark.sources.io import ensure_session_confs, fix_nanos_ts
    from python_plugins_spark.streaming import (
        read_stream_parquet,
        run_to_memory_sink,
        stateful_topn_tracker,
    )

    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = fix_nanos_ts(
        read_stream_parquet(spark, f"{sf_dir}/events.parquet", raw_schema)
    )
    out = stateful_topn_tracker(stream, "event_type", "value", n=3)
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    old_prov = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        name = f"stream_twstopn_{uuid.uuid4().hex[:8]}"
        got = run_to_memory_sink(out, name, output_mode="update")
    finally:
        if old_prov is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, old_prov)
    return got.select("event_type", "rk", F.round(F.col("value"), 4).alias("value"))


@register(
    "streaming_stateful_max",
    oracle="""
    SELECT event_type, round(max(value), 4) AS max_value
    FROM events GROUP BY event_type
    """,
)
def streaming_stateful_max(spark, sf_dir):
    """Per-key running max via ``transformWithStateInPandas`` — Spark
    4's modern stateful API (typed ValueState + explicit processor
    lifecycle), un-gated by the vendored protobuf shim
    (vendor/protobuf_shim.py). Whole table in one micro-batch => final
    state equals the batch MAX the oracle computes."""
    import uuid

    from python_plugins_spark.sources.io import ensure_session_confs, fix_nanos_ts
    from python_plugins_spark.streaming import (
        read_stream_parquet,
        run_to_memory_sink,
        stateful_max_tracker,
    )

    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = fix_nanos_ts(
        read_stream_parquet(spark, f"{sf_dir}/events.parquet", raw_schema)
    )
    out = stateful_max_tracker(stream, "event_type", "value")
    # transformWithState keeps each state variable in its own column
    # family — only the RocksDB provider supports that (the default
    # HDFS-backed store rejects it). Per-query conf, picked up at
    # stream start; restored after the drain.
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    old_prov = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        name = f"stream_twsmax_{uuid.uuid4().hex[:8]}"
        got = run_to_memory_sink(out, name, output_mode="update")
    finally:
        if old_prov is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, old_prov)
    return got.select(
        "event_type", F.round(F.col("max_value"), 4).alias("max_value")
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, k AS frame_no,
           substr(text, 1 + (k * length(text)) // 4, 16) AS frame_str
    FROM documents CROSS JOIN (VALUES (0), (1), (2), (3)) o(k)
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing: 4 evenly-spaced 16-byte slices per
    payload (the 1->N fan-out a video frame sampler has). Payload bytes
    are the UTF-8 text, so the string oracle is byte-exact (corpus is
    ASCII)."""
    docs = load_table(spark, "documents", sf_dir)
    with_payload = MM.attach_payload(docs, "text")
    frames = MM.sample_frames(with_payload, "payload", "doc_id", n_frames=4, frame_bytes=16)
    return frames.select(
        "doc_id",
        F.col("frame_no").cast("long").alias("frame_no"),
        F.col("frame_bytes").cast("string").alias("frame_str"),
    )


@register(
    "asof_join_pandas_purchase",
    oracle=f"""
    SELECT event_id,
           round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value_asof
    FROM events WHERE user_id <= 10
    """,
)
def asof_join_pandas_purchase(spark, sf_dir):
    """The applyInPandas/merge_asof implementation of the as-of join —
    same semantics as the union-window one, cross-checked by sharing
    its oracle shape."""
    from python_plugins_spark.operators.asof import asof_join_pandas

    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") <= 10)
    left = ev.select("event_id", "user_id", "ts", "event_type")
    right = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = asof_join_pandas(left, right, "user_id", "ts", "ts", ["value"])
    return joined.select(
        "event_id", F.round(F.col("value_asof"), 4).alias("value_asof")
    )


@register(
    "salted_join_orders",
    oracle="""
    SELECT o.o_orderstatus, count(*) AS n, round(sum(l.l_quantity), 4) AS total_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def salted_join_orders(spark, sf_dir):
    """Skew-resistant salted join (16-way key split) — result-identical
    to the plain equi-join the oracle runs."""
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("k"), "o_orderstatus"
    )
    joined = R.salted_join(li, o, "k", salt=16)
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("total_qty")
    )


@register(
    "join_merge_hint",
    oracle="""
    SELECT l.l_returnflag, count(*) AS n, round(avg(o.o_totalprice), 4) AS avg_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_returnflag
    """,
)
def join_merge_hint(spark, sf_dir):
    """Explicit sort-merge-join strategy hint (the right choice when
    both sides are huge and sorted output can be reused)."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
    )


@register("approx_sketches")
def approx_sketches(spark, sf_dir):
    """Approximate sketches (HLL distinct, quantile sketch) — no SQL
    oracle by design (DuckDB's approx algorithms differ); rows-only
    check + exactness-bounds asserted in tests."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_p50"),
    )


# =====================================================================
# Batch 3: sources & sinks (partitioned parquet, CSV, JSON) and the
# LSH-bucketed embedding near-dup scale path
# =====================================================================

_SCRATCH = "/root/repo/.scratch"


@register(
    "sink_partitioned_pruning",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE year(o_orderdate) = 1997
    GROUP BY o_orderstatus
    """,
)
def sink_partitioned_pruning(spark, sf_dir):
    """Partitioned parquet sink + partition-pruned scan: orders written
    partitioned by order year, read back with a partition filter — the
    filter prunes directories, not rows (at 100 TB, the difference
    between touching 1/7th of the data and all of it)."""
    import os

    o = load_table(spark, "orders", sf_dir)
    path = os.path.join(_SCRATCH, f"orders_by_year_{os.path.basename(sf_dir.rstrip('/'))}")
    (
        o.withColumn("order_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("order_year")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(F.col("order_year") == 1997)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "csv_source_roundtrip",
    oracle="""
    SELECT n.n_name, count(*) AS n_suppliers, round(sum(s.s_acctbal), 4) AS total_bal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def csv_source_roundtrip(spark, sf_dir):
    """CSV sink + schema-explicit CSV source (no inference pass), then
    a broadcast join — exercises the text-format connector path."""
    import os

    from python_plugins_spark.sources.io import read_csv

    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    path = os.path.join(_SCRATCH, f"supplier_csv_{os.path.basename(sf_dir.rstrip('/'))}")
    s.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, path, schema=s.schema)
    return (
        back.join(F.broadcast(n), back.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 4).alias("total_bal"),
        )
    )


@register(
    "json_source_roundtrip",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def json_source_roundtrip(spark, sf_dir):
    """JSON-lines sink + schema-explicit JSON source."""
    import os

    from python_plugins_spark.sources.io import read_json

    c = load_table(spark, "customer", sf_dir)
    path = os.path.join(_SCRATCH, f"customer_json_{os.path.basename(sf_dir.rstrip('/'))}")
    c.write.mode("overwrite").json(path)
    back = read_json(spark, path, schema=c.schema)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.round(F.avg("c_acctbal"), 4).alias("avg_bal")
    )


@register(
    "avro_source_roundtrip",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 4) AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def avro_source_roundtrip(spark, sf_dir):
    """Avro sink + source via the pure-Python object-container
    DataSource (sources/avro_py.py — no spark-avro jar in this env;
    the reference's schema contract is Avro-JSON, reference
    PythonEvaluator.java:291-297). Write customer as deflate-coded
    Avro through the Spark writer (one container per partition), read
    it back (one task per file, schema from the container header), and
    aggregate. tests/test_operators.py cross-validates the written
    files against the JVM org.apache.avro DataFileReader."""
    import os

    from python_plugins_spark.sources.avro_py import register as reg_avro

    reg_avro(spark)
    c = load_table(spark, "customer", sf_dir)
    path = os.path.join(_SCRATCH, f"customer_avro_{os.path.basename(sf_dir.rstrip('/'))}")
    c.write.format("avro_py").mode("overwrite").save(path)
    back = spark.read.format("avro_py").load(path)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 4).alias("total_bal")
    )


@register(
    "embedding_truncate_energy",
    oracle="""
    WITH _n AS (
      SELECT vec_id,
             sqrt(list_reduce(list_transform(embedding[1:16], x -> x::DOUBLE * x::DOUBLE),
                              (a, b) -> a + b)) AS norm16,
             sqrt(list_reduce(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE),
                              (a, b) -> a + b)) AS norm_full
      FROM embeddings
    )
    SELECT vec_id, round(norm16 / norm_full, 6) AS energy_ratio_16
    FROM _n WHERE norm_full > 0
    """,
)
def embedding_truncate_energy(spark, sf_dir):
    """Matryoshka-style truncation diagnostic: the fraction of each
    vector's L2 energy captured by its first 16 dimensions — the
    number that decides whether truncated (cheaper) embeddings are
    safe for coarse retrieval stages. Pure per-row array expressions;
    zero shuffles."""
    emb = load_table(spark, "embeddings", sf_dir)
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    norm16 = F.sqrt(sq(F.slice(F.col("embedding"), 1, 16)))
    norm_full = F.sqrt(sq(F.col("embedding")))
    return (
        emb.select("vec_id", norm16.alias("n16"), norm_full.alias("nf"))
        .filter(F.col("nf") > 0)
        .select("vec_id", F.round(F.col("n16") / F.col("nf"), 6).alias("energy_ratio_16"))
    )


@register(
    "quality_weighted_sample",
    oracle=f"""
    WITH q AS (
      SELECT doc_id,
             least(1.0, greatest(0.05,
               1.0
               - CASE WHEN length(text) < 100 THEN 0.4 ELSE 0.0 END
             )) AS w
      FROM documents
    )
    SELECT d.source, count(*) AS n_kept, sum(len({OF.sql_tokens("d.text")})) AS kept_tokens
    FROM documents d JOIN q ON d.doc_id = q.doc_id
    WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':qws'), 1, 8))::UBIGINT)::DOUBLE
          / 4294967296.0 < q.w
    GROUP BY d.source
    """,
)
def quality_weighted_sample(spark, sf_dir):
    """Deterministic quality-weighted sampling: keep each document
    with probability proportional to a quality weight (short docs
    down-weighted), decided by comparing an md5-derived uniform in
    [0,1) against the weight — reproducible across runs/engines, no
    RNG state, embarrassingly parallel (the standard corpus-mixing
    primitive: weights become expected token-mix proportions). Pure
    filter + one aggregate shuffle."""
    from python_plugins_spark.functions import tokens

    docs = load_table(spark, "documents", sf_dir)
    w = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.05),
            F.lit(1.0) - F.when(F.length("text") < 100, 0.4).otherwise(0.0),
        ),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":qws"))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    return (
        docs.withColumn("_w", w)
        .filter(u < F.col("_w"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum(F.size(tokens(F.col("text")))).alias("kept_tokens"),
        )
    )


@register(
    "sentence_global_dedup",
    oracle=f"""
    WITH _s AS (
      SELECT doc_id, i AS pos, s
      FROM (SELECT doc_id, string_split_regex(text, '\\.\\s+') AS parts FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i),
           LATERAL (SELECT trim(parts[i]) AS s)
      WHERE length(trim(parts[i])) > 0
    ),
    _first AS (
      SELECT doc_id, pos, s,
             row_number() OVER (PARTITION BY lower(s) ORDER BY doc_id, pos) AS rn
      FROM _s
    )
    SELECT doc_id,
           count(*) FILTER (WHERE rn = 1) AS kept_sentences,
           count(*) AS total_sentences,
           md5(coalesce(string_agg(s, '. ' ORDER BY pos) FILTER (WHERE rn = 1), ''))
             AS kept_md5
    FROM _first GROUP BY doc_id
    """,
)
def sentence_global_dedup(spark, sf_dir):
    """C4-style GLOBAL sentence-level dedup: a sentence is kept only
    at its first occurrence across the whole corpus ((doc_id, pos)
    order) — the classic boilerplate killer (nav text, disclaimers,
    licence blocks repeat verbatim across millions of pages; document-
    level dedup never sees them). One shuffle partitioned BY SENTENCE
    (the dedup key — skew on mega-duplicated sentences is exactly what
    AQE skew-split handles), then a per-doc reassembly aggregate.
    Output per doc: kept/total sentence counts and the md5 of the
    deduped rejoined text."""
    docs = load_table(spark, "documents", sf_dir)
    parts = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), r"\.\s+")).alias("pos0", "s_raw")
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), F.trim("s_raw").alias("s")
    ).filter(F.length("s") > 0)
    w = Window.partitionBy(F.lower("s")).orderBy("doc_id", "pos")
    flagged = parts.withColumn("rn", F.row_number().over(w))
    return flagged.groupBy("doc_id").agg(
        F.count(F.when(F.col("rn") == 1, 1)).alias("kept_sentences"),
        F.count("*").alias("total_sentences"),
        F.md5(
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("rn") == 1, F.struct("pos", "s")
                                )
                            )
                        ),
                        lambda x: x["s"],
                    ),
                    ". ",
                ),
                F.lit(""),
            )
        ).alias("kept_md5"),
    )


@register(
    "try_arithmetic_catalog",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL ELSE round(l_extendedprice / l_discount, 4) END
             AS price_per_disc,
           TRY_CAST(l_returnflag AS DOUBLE) AS flag_num,
           TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_num,
           CASE WHEN l_orderkey::HUGEINT * 100000000000000000 > 9223372036854775807
                THEN NULL
                ELSE CAST(l_orderkey * 100000000000000000 AS BIGINT) END AS big_prod
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def try_arithmetic_catalog(spark, sf_dir):
    """ANSI-safe `try_*` function family: try_divide (NULL on /0
    instead of error under ANSI mode), try_cast (NULL on malformed),
    try_multiply (NULL on overflow) — the error-tolerant arithmetic a
    dirty corpus needs so one bad row can't fail a 100 TB job. The
    oracle replays each guard as an explicit CASE."""
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_extendedprice", "l_discount"), 4).alias("price_per_disc"),
        F.col("l_returnflag").try_cast("double").alias("flag_num"),
        F.col("l_quantity").cast("string").try_cast("double").alias("qty_num"),
        # integral overflow -> NULL (float multiply saturates to inf
        # instead, which is why the probe uses bigints)
        F.try_multiply(F.col("l_orderkey"), F.lit(100_000_000_000_000_000)).alias(
            "big_prod"
        ),
    )


@register(
    "aes_roundtrip_customers",
    oracle="""
    SELECT c_custkey, c_name, length(c_name) AS name_len
    FROM customer WHERE c_custkey <= 200
    """,
)
def aes_roundtrip_customers(spark, sf_dir):
    """Column-level encryption: aes_encrypt (GCM, random IV) ->
    aes_decrypt must be the identity on the plaintext — the
    at-rest-PII pattern where a column is encrypted before landing and
    decrypted under key access. GCM output is nondeterministic
    (random IV), so the oracle checks the ROUNDTRIP (decrypted ==
    original), which is exactly the property that matters."""
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 key
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_custkey") <= 200)
    enc = c.select(
        "c_custkey", F.aes_encrypt(F.col("c_name"), key).alias("ct")
    )
    return enc.select(
        "c_custkey",
        F.aes_decrypt(F.col("ct"), key).cast("string").alias("c_name"),
    ).withColumn("name_len", F.length("c_name").cast("long"))


@register(
    "delta_roundtrip_orders",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def delta_roundtrip_orders(spark, sf_dir):
    """Delta-protocol table (pure-Python transaction log over native
    parquet scans — sources/delta_py.py; no delta jar in this env):
    overwrite-commit the even-key half, append-commit the odd-key
    half, snapshot-read the table and aggregate. The log replay is
    driver metadata (like a parquet footer); the scan is Spark's
    vectorized parquet reader over exactly the active file set."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import read_delta, write_delta

    o = load_table(spark, "orders", sf_dir)
    path = os.path.join(_SCRATCH, f"delta_orders_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(o.filter(F.col("o_orderkey") % 2 == 0), path, mode="overwrite")
    write_delta(o.filter(F.col("o_orderkey") % 2 == 1), path, mode="append")
    back = read_delta(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "delta_time_travel_orders",
    oracle="""
    SELECT o_orderstatus, count(*) AS n
    FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderstatus
    """,
)
def delta_time_travel_orders(spark, sf_dir):
    """Delta time travel: after overwrite(v0 evens) + append(v1 odds) +
    overwrite(v2 tiny slice), reading version_as_of=0 reconstructs the
    v0 snapshot exactly — the reproducibility primitive for training-
    data lineage ("which corpus version did this run train on")."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import read_delta, write_delta

    o = load_table(spark, "orders", sf_dir)
    path = os.path.join(_SCRATCH, f"delta_tt_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(o.filter(F.col("o_orderkey") % 2 == 0), path, mode="overwrite")
    write_delta(o.filter(F.col("o_orderkey") % 2 == 1), path, mode="append")
    write_delta(o.filter(F.col("o_orderkey") < 10), path, mode="overwrite")
    back = read_delta(spark, path, version_as_of=0)
    return back.groupBy("o_orderstatus").agg(F.count("*").alias("n"))


@register(
    "delta_checkpoint_read",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def delta_checkpoint_read(spark, sf_dir):
    """Delta checkpoint path (sources/delta_py.py): 12 commits force a
    parquet checkpoint at v10 + a ``_last_checkpoint`` pointer, so the
    snapshot read seeds from the checkpoint and replays only v11..v12
    JSON — O(interval) log replay instead of O(all commits), which is
    what keeps a long-lived 100 TB table's metadata path constant-time.
    v12 re-appends slice 0 (a deliberate duplicate); time travel to
    v11 must exclude it, proving checkpoint-seeded time travel, and the
    v11 snapshot (= the whole table, slices 0..11) is oracle-checked
    against the plain-parquet aggregate."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import (
        last_checkpoint_version,
        read_delta,
        write_delta,
    )

    o = load_table(spark, "orders", sf_dir)
    path = os.path.join(_SCRATCH, f"delta_cp_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    for i in range(13):  # v0..v12, one slice each — checkpoint lands at v10
        write_delta(
            o.filter(F.col("o_orderkey") % 12 == i % 12),
            path,
            mode="overwrite" if i == 0 else "append",
        )
    assert last_checkpoint_version(path) == 10
    back = read_delta(spark, path, version_as_of=11)  # slices 0..10 (v12 excluded)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "delta_merge_upsert",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(CASE WHEN o_orderkey % 4 = 1 THEN 2 * o_totalprice
                          ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey % 4 IN (0, 1, 2) AND o_orderkey % 8 <> 1
    GROUP BY o_orderstatus
    """,
)
def delta_merge_upsert(spark, sf_dir):
    """MERGE INTO on the Delta layer (sources/delta_py.py merge_delta),
    exercising all three clauses in one commit: target = orderkeys
    %4 in (0,1); source = orderkeys %4 in (1,2). Matched rows with
    key %8 == 1 are deleted, the remaining matched rows take
    ``t.o_totalprice + s.o_totalprice`` (doubling, since source rows
    are the same orders), and unmatched source rows (%4 == 2) insert.
    The rewrite is file-pruned: only parts containing a matched key
    are rewritten — merge cost is O(matched data), not O(table)."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import (
        merge_delta,
        read_delta,
        write_delta,
    )

    o = load_table(spark, "orders", sf_dir)
    path = os.path.join(_SCRATCH, f"delta_merge_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(o.filter(F.col("o_orderkey") % 4 < 2), path, mode="overwrite")
    src = o.filter((F.col("o_orderkey") % 4).isin(1, 2))
    merge_delta(
        spark,
        src,
        path,
        on=["o_orderkey"],
        when_matched_update={"o_totalprice": "t.o_totalprice + s.o_totalprice"},
        when_matched_delete="s.o_orderkey % 8 = 1",
        when_not_matched_insert=True,
    )
    back = read_delta(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "delta_optimize_zorder_read",
    oracle="""
    SELECT count(*) AS n, sum(o_orderkey) AS key_sum,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 200
      AND o_totalprice BETWEEN 50000 AND 150000
    """,
)
def delta_optimize_zorder_read(spark, sf_dir):
    """OPTIMIZE ZORDER BY + stats skipping on the Delta layer: orders
    is written as 8 unclustered parts, rewritten z-ordered on
    (o_custkey, o_totalprice) in one dataChange=False commit, then a
    selective 2-D box is read with ``prune`` (file-level min/max
    elimination) + the exact filter. The in-code assertion pins the
    layout benefit — the pruned scan must touch fewer files than the
    table holds — and the oracle pins exactness: skipping must never
    drop a qualifying row. This is the layout+skipping pair that turns
    'one tenant, one price band, 100 TB' into a few-file read."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import (
        optimize_delta,
        read_delta,
        write_delta,
    )

    o = load_table(spark, "orders", sf_dir)
    path = os.path.join(_SCRATCH, f"delta_z_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(o.repartition(8), path, mode="overwrite")
    res = optimize_delta(
        spark, path, target_file_size=256 * 1024, zorder_by=["o_custkey", "o_totalprice"]
    )
    box = {"o_custkey": (100, 200), "o_totalprice": (50000.0, 150000.0)}
    pruned = read_delta(spark, path, prune=box)
    if res["version"] is not None and len(res["added"]) >= 4:
        assert len(pruned.inputFiles()) < len(res["added"]), (
            "z-order + stats pruning failed to skip any file"
        )
    return pruned.filter(
        F.col("o_custkey").between(100, 200)
        & F.col("o_totalprice").between(50000, 150000)
    ).agg(
        F.count("*").alias("n"),
        F.sum("o_orderkey").alias("key_sum"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@register(
    "delta_deletion_vector_read",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE NOT (o_orderkey % 10 < 3) AND NOT (o_custkey % 7 = 0)
    GROUP BY o_orderstatus
    """,
)
def delta_deletion_vector_read(spark, sf_dir):
    """Deletion vectors (merge-on-read DELETE, sources/delta_dv.py):
    two successive DV deletes — the second unions into the first
    file-level bitmaps — then a snapshot read that anti-joins the
    executor-decoded (file, row_index) deleted set against
    ``_metadata.row_index``. No data file is rewritten by either
    delete (asserted below: the active file set is unchanged), which
    is the point of DVs at 100 TB — a delete costs O(deleted rows) in
    sidecar bytes, not O(touched files) in parquet rewrites. Bitmaps
    are protocol-shaped RoaringBitmapArray sidecars; the commit
    upgrades to readerVersion 3 / ``deletionVectors`` table feature."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import (
        _replay_state,
        delete_delta,
        read_delta,
        write_delta,
    )

    o = load_table(spark, "orders", sf_dir)
    path = os.path.join(_SCRATCH, f"delta_dv_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(o.repartition(6), path, mode="overwrite")
    before = set(_replay_state(path).active)
    delete_delta(spark, path, "o_orderkey % 10 < 3", mode="dv")
    delete_delta(spark, path, "o_custkey % 7 = 0", mode="dv")
    after = set(_replay_state(path).active)
    assert after == before, "DV delete must not rewrite/replace data files"
    back = read_delta(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "delta_delete_rewrite",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0)
    GROUP BY o_orderstatus
    """,
)
def delta_delete_rewrite(spark, sf_dir):
    """Copy-on-write DELETE (``mode="rewrite"``): only files containing
    at least one matched row are rewritten without those rows; readers
    need no table feature (reads stay pure parquet scans). The
    complement of the DV path — pick rewrite when deletes are rare and
    bulky, DVs when they are frequent and sparse."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import (
        delete_delta,
        read_delta,
        write_delta,
    )

    o = load_table(spark, "orders", sf_dir)
    path = os.path.join(_SCRATCH, f"delta_cow_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(o.repartition(6), path, mode="overwrite")
    delete_delta(
        spark, path, "o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0",
        mode="rewrite",
    )
    back = read_delta(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "delta_schema_evolution_read",
    oracle="""
    SELECT o_orderkey, o_orderstatus, CAST(NULL AS VARCHAR) AS channel
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_orderstatus, 'backfill' AS channel
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def delta_schema_evolution_read(spark, sf_dir):
    """Schema evolution on the Delta layer: v0 writes two columns, v1
    appends with merge_schema=True adding ``channel`` — committed as an
    updated metaData action atomically with the data, so pre-evolution
    files read the new column as NULL through the explicit table
    schema. Mismatched writes without merge_schema raise (enforcement,
    tested in tests/test_delta.py)."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import read_delta, write_delta

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderstatus")
    path = os.path.join(_SCRATCH, f"delta_evo_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(o.filter(F.col("o_orderkey") % 2 == 0), path, mode="overwrite")
    late = o.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "channel", F.lit("backfill")
    )
    write_delta(late, path, mode="append", merge_schema=True)
    return read_delta(spark, path)


@register(
    "delta_partitioned_pruned_read",
    oracle="""
    SELECT count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'F' AND NOT (o_orderkey % 5 = 0)
    GROUP BY o_orderstatus
    """,
)
def delta_partitioned_pruned_read(spark, sf_dir):
    """Hive-partitioned Delta table (partition_by= on write_delta):
    adds carry the protocol's partitionValues, data files omit the
    partition column, reads reconstruct it via basePath — and the
    prune hint eliminates whole partitions from the scan list before
    Spark sees a file (asserted: the pruned scan touches fewer files
    than the table holds). A DV delete stacks on the partitioned
    layout to prove the merge-on-read machinery composes with it."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import (
        _replay_state,
        delete_delta,
        read_delta,
        write_delta,
    )

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(_SCRATCH, f"delta_part_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(o, path, mode="overwrite", partition_by=["o_orderstatus"])
    delete_delta(spark, path, "o_orderkey % 5 = 0", mode="dv")
    n_active = len(_replay_state(path).active)
    pruned = read_delta(spark, path, prune={"o_orderstatus": ("F", "F")})
    assert len(pruned.inputFiles()) < n_active, "partition pruning failed"
    return (
        pruned.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select("n", "total")
    )


@register(
    "delta_update_read",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice * 2 ELSE o_totalprice END
                          AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def delta_update_read(spark, sf_dir):
    """Merge-on-read UPDATE (sources/delta_py.py update_delta): one
    atomic commit deletion-vectors the matched rows out of their files
    AND appends them with SET applied — O(matched rows), no touched-
    file rewrite. The in-code assertion pins that: the pre-update data
    files are all still active after the commit."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import (
        _replay_state,
        read_delta,
        update_delta,
        write_delta,
    )

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    path = os.path.join(_SCRATCH, f"delta_upd_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(o.repartition(5), path, mode="overwrite")
    before = set(_replay_state(path).active)
    update_delta(
        spark, path, "o_orderpriority = '1-URGENT'",
        {"o_totalprice": "o_totalprice * 2"},
    )
    after = set(_replay_state(path).active)
    assert before <= after, "UPDATE must keep every pre-update file active"
    back = read_delta(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "delta_restore_read",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def delta_restore_read(spark, sf_dir):
    """RESTORE TABLE (sources/delta_py.py restore_delta): after a DV
    delete damages the table, restoring to the pre-delete version
    commits the old active set back — history preserved (the restore
    is itself a commit), nothing rewritten."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import (
        delete_delta,
        read_delta,
        restore_delta,
        write_delta,
    )

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(_SCRATCH, f"delta_rst_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(o.repartition(4), path, mode="overwrite")   # v0
    delete_delta(spark, path, "o_orderkey % 3 = 0", mode="dv")  # v1 (oops)
    restore_delta(spark, path, 0)                            # v2 = v0 again
    back = read_delta(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "lakehouse_pipeline_end_to_end",
    oracle="""
    SELECT lang, count(*) AS n, sum(n_chars) AS chars,
           sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS curated
    FROM documents WHERE n_chars >= 200
    GROUP BY lang
    """,
)
def lakehouse_pipeline_end_to_end(spark, sf_dir):
    """One pipeline through the round's whole lakehouse surface, with
    the final snapshot oracle-checked against plain SQL: documents land
    as a lang-partitioned Delta table; a quality gate DV-deletes short
    docs (merge-on-read — no rewrite); an UPDATE re-labels one
    partition's source in a single DV+append commit; OPTIMIZE purges
    the DVs physically; VACUUM reclaims the dead files and sidecars;
    and the surviving snapshot aggregates per lang. Every maintenance
    step must be row-invisible except the two intended mutations."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import (
        delete_delta,
        optimize_delta,
        read_delta,
        update_delta,
        vacuum_delta,
        write_delta,
    )

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = os.path.join(_SCRATCH, f"lakehouse_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(docs, path, mode="overwrite", partition_by=["lang"])
    delete_delta(spark, path, "n_chars < 200", mode="dv")
    update_delta(spark, path, "lang = 'de'", {"source": "'curated'"})
    optimize_delta(spark, path)
    vacuum_delta(path, retention_hours=0)
    back = read_delta(spark, path)
    return back.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("chars"),
        F.sum(F.when(F.col("source") == "curated", 1).otherwise(0)).alias("curated"),
    )


@register(
    "delta_snapshot_diff",
    oracle="""
    SELECT o_orderkey, 'removed' AS _diff FROM orders
    WHERE o_orderkey % 2 = 0 AND o_orderkey % 7 = 0
    UNION ALL
    SELECT o_orderkey, 'changed' AS _diff FROM orders
    WHERE o_orderkey % 2 = 0 AND o_orderkey % 7 <> 0
          AND o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, 'added' AS _diff FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def delta_snapshot_diff(spark, sf_dir):
    """Semantic diff of two table versions (sources/delta_py.py
    snapshot_diff): compares STATES, not log actions, so it covers
    in-place rewrites the change feed refuses — one full outer join on
    the key with null-safe value comparison classifying each key as
    added / removed / changed. Here v0 holds the even orders; v3 has
    deleted the %7 keys, doubled the urgent totals (UPDATE), and
    appended the odds — the diff must recover exactly those three
    sets."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import (
        delete_delta,
        snapshot_diff,
        update_delta,
        write_delta,
    )

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = os.path.join(_SCRATCH, f"delta_diff_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(o.filter(F.col("o_orderkey") % 2 == 0), path, mode="overwrite")  # v0
    delete_delta(spark, path, "o_orderkey % 7 = 0", mode="dv")                   # v1
    update_delta(
        spark, path, "o_orderpriority = '1-URGENT'",
        {"o_totalprice": "o_totalprice * 2"},
    )                                                                            # v2
    write_delta(o.filter(F.col("o_orderkey") % 2 == 1), path, mode="append")     # v3
    return snapshot_diff(spark, path, 0, 3, ["o_orderkey"])


@register(
    "delta_incremental_view_maintenance",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE NOT (o_orderkey % 6 = 0)
    GROUP BY o_orderstatus
    """,
)
def delta_incremental_view_maintenance(spark, sf_dir):
    """Incremental materialized-view maintenance from the change feed:
    a SUM/COUNT-per-key view is first materialized from the v0
    snapshot, then brought to the v2 state by applying ONLY the
    changes (inserts add, deletes subtract — the classic delta-
    maintenance algebra for distributive aggregates), never rescanning
    the base table. At 100 TB this is the difference between an
    O(table) refresh and an O(changes) one. The maintained view must
    hash-match the direct aggregate of the final snapshot — that is
    the oracle."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import (
        delete_delta,
        read_delta,
        table_changes,
        write_delta,
    )

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(_SCRATCH, f"delta_ivm_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(o.filter(F.col("o_orderkey") % 2 == 0), path, mode="overwrite")  # v0
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    view0 = (
        read_delta(spark, path, version_as_of=0)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(dec).alias("total"),
        )
    )
    write_delta(o.filter(F.col("o_orderkey") % 2 == 1), path, mode="append")     # v1
    delete_delta(spark, path, "o_orderkey % 6 = 0", mode="dv")                   # v2

    changes = table_changes(spark, path, 1, 2)
    deltas = changes.groupBy("o_orderstatus").agg(
        F.sum(
            F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        ).cast("long").alias("dn"),
        F.sum(
            F.when(F.col("_change_type") == "insert", dec).otherwise(-dec)
        ).alias("dtotal"),
    )
    maintained = (
        view0.join(deltas, on="o_orderstatus", how="full")
        .select(
            "o_orderstatus",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            (
                F.coalesce(F.col("total"), F.lit(0).cast("decimal(18,2)"))
                + F.coalesce(F.col("dtotal"), F.lit(0).cast("decimal(18,2)"))
            ).cast("double").alias("total"),
        )
        .filter(F.col("n") > 0)
    )
    return maintained


@register(
    "delta_cdf_insert_delete",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 4) AS o_totalprice,
           'insert' AS _change_type, 1 AS _commit_version
    FROM orders WHERE o_orderkey % 2 = 1
    UNION ALL
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 4) AS o_totalprice,
           'delete' AS _change_type, 2 AS _commit_version
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def delta_cdf_insert_delete(spark, sf_dir):
    """Derived Change Data Feed (sources/delta_py.py table_changes):
    row-level changes between snapshots computed from the log alone —
    append commits yield 'insert' rows, merge-on-read DV deletes yield
    'delete' rows (the NEW deleted-set minus the OLD, executor-side),
    layout commits yield nothing, and in-place rewrites are refused
    rather than emitting false changes. The contract an incremental
    downstream consumer reads."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import (
        delete_delta,
        table_changes,
        write_delta,
    )

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(_SCRATCH, f"delta_cdf_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_delta(o.filter(F.col("o_orderkey") % 2 == 0), path, mode="overwrite")  # v0
    write_delta(o.filter(F.col("o_orderkey") % 2 == 1), path, mode="append")     # v1
    delete_delta(spark, path, "o_orderkey % 7 = 0", mode="dv")                   # v2
    ch = table_changes(spark, path, 1, 2)
    return ch.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        "_change_type",
        "_commit_version",
    )


@register(
    "iceberg_snapshot_read",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def iceberg_snapshot_read(spark, sf_dir):
    """Iceberg-spec table (pure-Python metadata: version-hint →
    metadata.json → Avro manifest list → Avro manifests → native
    parquet scan; sources/iceberg_py.py — no iceberg jar or pyiceberg
    in this env). Two commits (overwrite evens, append odds) make two
    snapshots; the current-snapshot read must see exactly the union —
    snapshot isolation via immutable metadata, oracle-checked against
    the plain table."""
    import os
    import shutil

    from python_plugins_spark.sources.iceberg_py import read_iceberg, write_iceberg

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(_SCRATCH, f"ice_orders_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg(o.filter(F.col("o_orderkey") % 2 == 0), path, mode="overwrite")
    write_iceberg(o.filter(F.col("o_orderkey") % 2 == 1), path, mode="append")
    back = read_iceberg(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "iceberg_pruned_scan",
    oracle="""
    SELECT count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def iceberg_pruned_scan(spark, sf_dir):
    """Iceberg's core scale property: the manifest walk prunes data
    files from partition values BEFORE any file is listed or opened —
    on a 100 TB table the scan list shrinks at metadata cost, not IO
    cost. Table is identity-partitioned by o_orderstatus; the eq
    predicate must leave only that partition's files (asserted), and
    the result equals the plain filtered aggregate."""
    import os
    import shutil

    from python_plugins_spark.sources.iceberg_py import (
        plan_files,
        read_iceberg,
        write_iceberg,
    )

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(_SCRATCH, f"ice_part_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg(o, path, mode="overwrite", partition_by="o_orderstatus")
    pruned = plan_files(path, eq={"o_orderstatus": "F"})
    assert pruned and len(pruned) < len(plan_files(path))
    back = read_iceberg(spark, path, eq={"o_orderstatus": "F"})
    return back.agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "profile_orders_columns",
    oracle=R.profile_columns_oracle_sql(
        "orders", ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]
    ),
)
def profile_orders_columns(spark, sf_dir):
    """One-pass column profiling (operators/relational.py
    profile_columns): row/null/exact-distinct counts + string min/max
    per column via a stack() unpivot and one aggregate — the QA step a
    training-data pipeline runs before trusting a new snapshot."""
    o = load_table(spark, "orders", sf_dir)
    return R.profile_columns(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]
    )


@register(
    "repeated_ngram_spans_docs",
    oracle=D.repeated_ngram_spans_oracle_sql("documents", "text", "doc_id", 8, 2),
)
def repeated_ngram_spans_docs(spark, sf_dir):
    """Substring-level dedup (operators/dedup.py repeated_ngram_spans):
    maximal token spans whose every 8-token window repeats >= 2 times
    corpus-wide — the relational formulation of suffix-array substring
    dedup. Feeds span-removal / doc-filtering stages in a training-data
    pipeline; exact (not probabilistic), zero UDFs."""
    docs = load_table(spark, "documents", sf_dir)
    return D.repeated_ngram_spans(docs, "text", "doc_id", n=8, min_dups=2)


@register("pq_ann_topk_rerank")  # rows-only: approximate by design
def pq_ann_topk_rerank(spark, sf_dir):
    """Product-quantization ANN (operators/similarity.py, public
    Jégou et al. 2011): 64-dim embeddings compress to 8 one-byte codes
    (32x memory cut — the difference between an in-RAM and an on-disk
    corpus index at 100 TB), queries score codes via per-query lookup
    tables (asymmetric distance), and an exact distributed re-rank
    orders the kk*10 shortlist — codes prune ~99% of the corpus,
    exact math touches only the shortlist. Approximate by design;
    recall vs exact search asserted in tests (like IVF)."""
    from python_plugins_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train_codebooks,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    books = pq_train_codebooks(emb, "embedding", dim=64, m=8, k=16)
    codes = pq_encode(emb, "vec_id", "embedding", books)
    queries = emb.orderBy("vec_id").limit(20)
    return pq_topk(
        codes, queries, "vec_id", "embedding", books, kk=10,
        rerank_vectors=emb,
    )


@register("bpe_train_merges_docs")  # rows-only: iterative argmax loop
def bpe_train_merges_docs(spark, sf_dir):
    """Distributed BPE tokenizer training (operators/tokenizer.py,
    public Sennrich et al. 2016 algorithm): ONE corpus pass builds the
    weighted distinct-word table; 12 merge rounds then run tiny
    aggregate+rewrite jobs over that vocabulary-sized table — N merges
    never rescan the corpus, which is what makes tokenizer training
    feasible at 100 TB. Deterministic (count desc, pair asc
    tie-break); verified against a pure-Python reference
    implementation in tests (no SQL oracle: an iterative argmax is not
    one DuckDB query — rows-only entry like IVF ANN)."""
    docs = load_table(spark, "documents", sf_dir)
    from python_plugins_spark.operators.tokenizer import bpe_train

    _merges, mdf = bpe_train(docs, "text", 12)
    return mdf


@register(
    "gopher_quality_rules_docs",
    oracle=TX.gopher_rules_oracle_sql("documents", "text", "doc_id"),
)
def gopher_quality_rules_docs(spark, sf_dir):
    """Gopher quality-filter verdicts (operators/text.py gopher_rules;
    public Rae et al. 2021 Table A1 constants): per-document booleans
    for word count, mean word length, symbol ratio, bullet/ellipsis
    line fractions, alphabetic-word fraction, and the stopword
    requirement, plus the conjunction — the standard pre-training
    corpus gate, as a pure projection pass."""
    docs = load_table(spark, "documents", sf_dir)
    return TX.gopher_rules(docs, "text", "doc_id")


@register(
    "mask_repeated_spans_docs",
    oracle=D.mask_repeated_spans_oracle_sql("documents", "text", "doc_id", 8, 2),
)
def mask_repeated_spans_docs(spark, sf_dir):
    """Boilerplate removal: re-emit each doc with every repeated >=
    8-token span removed (all occurrences — the span-level analogue of
    C4 sentence dedup), plus removed-token accounting for the
    pipeline's yield report. Consumes repeated_ngram_spans; the
    reassembly preserves original token order."""
    docs = load_table(spark, "documents", sf_dir)
    return D.mask_repeated_spans(docs, "text", "doc_id", n=8, min_dups=2)


@register(
    "iceberg_positional_delete_read",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE NOT (o_orderkey % 10 < 2) AND NOT (o_custkey % 9 = 0)
    GROUP BY o_orderstatus
    """,
)
def iceberg_positional_delete_read(spark, sf_dir):
    """Iceberg v2 merge-on-read DELETE (sources/iceberg_py.py
    delete_iceberg): two successive deletes commit position-delete
    parquet files (content=1 manifest entries) — no data file is
    rewritten — and the snapshot read anti-joins (file, pos) against
    ``_metadata.row_index``. Both sides of the anti-join are native
    vectorized parquet scans; the Iceberg twin of the Delta
    deletion-vector query."""
    import os
    import shutil

    from python_plugins_spark.sources.iceberg_py import (
        delete_iceberg,
        plan_files,
        read_iceberg,
        write_iceberg,
    )

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(_SCRATCH, f"ice_del_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg(o.repartition(5), path, mode="overwrite")
    before = sorted(f["path"] for f in plan_files(path))
    delete_iceberg(spark, path, "o_orderkey % 10 < 2")
    delete_iceberg(spark, path, "o_custkey % 9 = 0")
    after = sorted(f["path"] for f in plan_files(path))
    assert after == before, "position deletes must not rewrite data files"
    back = read_iceberg(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "iceberg_equality_delete_read",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderpriority <> '1-URGENT' AND NOT (o_orderkey % 10 < 2)
    GROUP BY o_orderstatus
    """,
)
def iceberg_equality_delete_read(spark, sf_dir):
    """Iceberg v2 EQUALITY deletes (content=2) composed with position
    deletes: the equality commit deletes every '1-URGENT' row by VALUE
    with no table scan at delete time (the CDC-upsert shape — a delete
    is one small parquet write + a metadata commit, whatever the table
    size), then a positional delete stacks on top. The read applies
    both merge-on-read layers: an equi-join on the equality columns
    (scoped to data files from earlier snapshots, per the spec's
    sequence-number rule) and the (file, pos) anti-join."""
    import os
    import shutil

    from python_plugins_spark.sources.iceberg_py import (
        delete_iceberg,
        equality_delete_iceberg,
        read_iceberg,
        write_iceberg,
    )

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    path = os.path.join(_SCRATCH, f"ice_eqdel_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg(o.repartition(4), path, mode="overwrite")
    keys = spark.createDataFrame([("1-URGENT",)], ["o_orderpriority"])
    equality_delete_iceberg(spark, path, keys)
    delete_iceberg(spark, path, "o_orderkey % 10 < 2")
    back = read_iceberg(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "iceberg_upsert_read",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 4 IN (1, 2) THEN -1.0
                ELSE round(o_totalprice, 4) END AS o_totalprice
    FROM orders WHERE o_orderkey % 4 IN (0, 1, 2)
    """,
)
def iceberg_upsert_read(spark, sf_dir):
    """One-commit Iceberg UPSERT (upsert_iceberg — the Flink-CDC
    shape): a single snapshot carries the equality delete on the merge
    keys AND the fresh rows; sequence scoping erases only the OLD
    versions. No table scan at write time — upsert cost is O(source)
    at any table size. Target holds %4 in (0,1); source replaces %4=1
    with sentinel values and inserts %4=2."""
    import os
    import shutil

    from python_plugins_spark.sources.iceberg_py import (
        read_iceberg,
        upsert_iceberg,
        write_iceberg,
    )

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    path = os.path.join(_SCRATCH, f"ice_ups_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg(o.filter(F.col("o_orderkey") % 4 < 2), path, mode="overwrite")
    src = (
        o.filter((F.col("o_orderkey") % 4).isin(1, 2))
        .withColumn("o_totalprice", F.lit(-1.0))
    )
    upsert_iceberg(spark, path, src, on=["o_orderkey"])
    back = read_iceberg(spark, path)
    return back.select(
        "o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice")
    )


@register(
    "iceberg_cdf_insert_delete",
    oracle="""
    SELECT o_orderkey, o_orderpriority, 'insert' AS _change_type,
           2 AS _commit_snapshot
    FROM orders WHERE o_orderkey % 2 = 1
    UNION ALL
    SELECT o_orderkey, o_orderpriority, 'delete' AS _change_type,
           3 AS _commit_snapshot
    FROM orders WHERE o_orderkey % 11 = 0
    UNION ALL
    SELECT o_orderkey, o_orderpriority, 'delete' AS _change_type,
           4 AS _commit_snapshot
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def iceberg_cdf_insert_delete(spark, sf_dir):
    """Derived CDC on the Iceberg layer (table_changes_iceberg — the
    format twin of the Delta change feed): the append snapshot yields
    'insert' rows; the position-delete snapshot yields exactly its
    newly deleted rows; the equality-delete snapshot yields every
    earlier-file row matching the delete keys. Each stamped with its
    snapshot id — the incremental-consumer contract, format two."""
    import os
    import shutil

    from python_plugins_spark.sources.iceberg_py import (
        delete_iceberg,
        equality_delete_iceberg,
        table_changes_iceberg,
        write_iceberg,
    )

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority")
    path = os.path.join(_SCRATCH, f"ice_cdf_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg(o.filter(F.col("o_orderkey") % 2 == 0), path, mode="overwrite")  # s1
    write_iceberg(o.filter(F.col("o_orderkey") % 2 == 1), path, mode="append")     # s2
    delete_iceberg(spark, path, "o_orderkey % 11 = 0")                             # s3
    equality_delete_iceberg(
        spark, path, spark.createDataFrame([("1-URGENT",)], ["o_orderpriority"])
    )                                                                              # s4
    return table_changes_iceberg(spark, path, 2, 4)


@register(
    "embedding_lsh_neardup",
    oracle=S.lsh_bucketed_neardup_oracle_sql(
        "embeddings", "vec_id", "embedding", 0.3, 8, 64
    ),
)
def embedding_lsh_neardup(spark, sf_dir):
    """The embedding near-dup SCALE path: LSH-bucket candidates (one
    equi-join) + exact cosine verification — versus the O(n^2)
    cosine_pairs baseline. Verified against a plane-literal SQL oracle
    end to end."""
    emb = load_table(spark, "embeddings", sf_dir)
    return S.lsh_bucketed_neardup(emb, "vec_id", "embedding", 0.3, n_planes=8, dim=64)


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue, count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan + conjunctive pushed filters + global
    agg — zero shuffles beyond the single-partition final sum."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@register(
    "argmax_minmax_by",
    oracle="""
    SELECT l_returnflag,
           max(struct_pack(p := l_extendedprice, k := l_orderkey)).k AS priciest_order,
           min(struct_pack(p := l_extendedprice, k := l_orderkey)).k AS cheapest_order,
           round(max(l_extendedprice), 4) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def argmax_minmax_by(spark, sf_dir):
    """argmax/argmin aggregates. Bare max_by/min_by resolve ties
    arbitrarily (engine-dependent); the lexicographic struct-max makes
    the survivor deterministic on both engines."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.max(F.struct("l_extendedprice", "l_orderkey"))["l_orderkey"].alias("priciest_order"),
        F.min(F.struct("l_extendedprice", "l_orderkey"))["l_orderkey"].alias("cheapest_order"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
    )


@register(
    "set_ops_bag_semantics",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
    INTERSECT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def set_ops_bag_semantics(spark, sf_dir):
    """INTERSECT ALL (bag semantics — duplicates preserved by
    multiplicity), the variant dropDuplicates-style set ops can't
    express."""
    c = load_table(spark, "customer", sf_dir)
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_nationkey")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    return R.intersect(rich, building, all=True)


@register(
    "udtf_tokenize",
    oracle="""
    SELECT doc_id, u.p AS pos, u.t AS token
    FROM (
      SELECT doc_id,
             unnest([{'p': i - 1, 't': tk[i]} for i in range(1, len(tk) + 1)]) AS u
      FROM (SELECT doc_id, str_split_regex(lower(trim(text)), '\\s+') AS tk
            FROM documents WHERE doc_id < 50)
    )
    """,
)
def udtf_tokenize(spark, sf_dir):
    """A real Python UDTF (table function, Spark 3.5+): one input row
    -> N (pos, token) rows — the 1->N surface as a catalog-registered
    function rather than the transform operator."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string")
    class Tokenize:
        def eval(self, doc_id, text: str):
            for i, tok in enumerate(text.strip().lower().split()):
                yield doc_id, i, tok

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 50)
    spark.udtf.register("tokenize_udtf", Tokenize)
    docs.createOrReplaceTempView("_udtf_docs")
    out = spark.sql(
        "SELECT t.doc_id, t.pos, t.token FROM _udtf_docs d, "
        "LATERAL tokenize_udtf(d.doc_id, d.text) t"
    )
    return out.select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


# =====================================================================
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
    res.persist()
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
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )


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
    import uuid

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
    name = f"cdcstream_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
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
    docs.select("doc_id").localCheckpoint().createOrReplaceTempView("_rc_docs")
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
# SQL-surface widening: lateral join, GROUP BY ALL, regression /
# bitwise aggregates, positional explode
# =====================================================================

@register(
    "lateral_join_top_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 4) AS price
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) o
    WHERE c.c_custkey <= 300
    """,
)
def lateral_join_top_orders(spark, sf_dir):
    """Correlated LATERAL subquery (Spark 3.2+): per-customer top-2
    orders expressed as a dependent join. Catalyst decorrelates it into
    a DomainJoin + window rather than N per-row subquery executions, so
    the plan is one shuffle on the correlation key — the same physical
    shape as the explicit row_number formulation, but declared the way
    an ANSI-SQL user would write it. Deterministic tie-break via
    (price DESC, orderkey)."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("_lat_customer")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 4) AS price
        FROM _lat_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM _lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) o
        WHERE c.c_custkey <= 300
        """
    )


@register(
    "group_by_all_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, count(*) AS n
    FROM orders GROUP BY ALL
    """,
)
def group_by_all_revenue(spark, sf_dir):
    """GROUP BY ALL (Spark 3.4+ / DuckDB): group keys inferred as every
    non-aggregate select item — identical semantics in both engines."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("_gba_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, count(*) AS n
        FROM _gba_orders GROUP BY ALL
        """
    )


@register(
    "regression_aggregates",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 2) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
           round(corr(l_extendedprice, l_quantity), 4) AS pearson,
           regr_count(l_extendedprice, l_quantity) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def regression_aggregates(spark, sf_dir):
    """Linear-regression aggregate family (regr_slope / intercept / r2
    / count) + Pearson correlation in one hash aggregate — the OLS
    summary statistics both engines compute from the same co-moment
    accumulators. Intercept rounds at 2dp: it sits at the scale of
    avg(price) (~1e4-1e5) where cross-engine accumulation-order noise
    (~1e-9 relative) would breach a 4dp ulp."""
    li = load_table(spark, "lineitem", sf_dir)
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 2).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("intercept"),
        F.round(F.regr_r2(y, x), 4).alias("r2"),
        F.round(F.corr(y, x), 4).alias("pearson"),
        F.regr_count(y, x).alias("n"),
    )


@register(
    "bitwise_aggregates",
    oracle="""
    SELECT o_orderstatus,
           bit_and(o_orderkey) AS key_and,
           bit_or(o_orderkey) AS key_or,
           bit_xor(o_orderkey) AS key_xor,
           count(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def bitwise_aggregates(spark, sf_dir):
    """Bitwise AND/OR/XOR aggregates — order-independent integer folds
    (bitmap-style set summaries, feature-flag intersections)."""
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
        F.bit_xor("o_orderkey").alias("key_xor"),
        F.count("*").alias("n"),
    )


@register(
    "posexplode_tokens",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {OF.sql_tokens('text')} AS toks
      FROM documents WHERE doc_id < 60
    )
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
           unnest(toks) AS tok
    FROM t
    """,
)
def posexplode_tokens(spark, sf_dir):
    """posexplode: explosion WITH ORDINALITY — the token's position
    survives the fan-out (needed whenever order carries meaning:
    n-gram reconstruction, positional weighting). DuckDB twin zips
    parallel unnests of the value and its generate_subscripts index."""
    from python_plugins_spark.functions import tokens as _tokens

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 60)
    return docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "tok")
    ).withColumn("pos", F.col("pos").cast("long"))


# =====================================================================
# Training-pipeline ops: benchmark contamination, intra-document
# repetition, domain-mix rebalancing
# =====================================================================

@register(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {OF.sql_tokens('text')} AS toks FROM documents
    ),
    s AS (SELECT doc_id, {OF.sql_word_shingles('toks', 3)} AS gs FROM t),
    e AS (SELECT DISTINCT doc_id, unnest(gs) AS g FROM s),
    b AS (SELECT DISTINCT g FROM e WHERE doc_id % 97 = 0),
    c AS (SELECT doc_id, g FROM e WHERE doc_id % 97 <> 0)
    SELECT c.doc_id, count(*) AS n_hit
    FROM c JOIN b USING (g) GROUP BY c.doc_id
    """,
)
def contamination_ngram_overlap(spark, sf_dir):
    """Benchmark-contamination check: training docs sharing word
    n-grams with a held-out eval set (here: every 97th doc stands in
    for the benchmark; production uses 8-13-grams — 3 here for signal
    density on the small synthetic corpus). Scale shape: the benchmark
    shingle set is tiny relative to the corpus, so it broadcasts —
    the corpus-side scan never shuffles, each task filters its shingles
    against the broadcast set and only (doc_id, hit) survivors reach
    the final doc_id aggregation."""
    from python_plugins_spark.functions import tokens as _tokens, word_shingles

    docs = load_table(spark, "documents", sf_dir)
    grams = docs.select(
        "doc_id", F.explode(word_shingles(_tokens(F.col("text")), 3)).alias("g")
    ).distinct()
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    cand = grams.filter(F.col("doc_id") % 97 != 0)
    return (
        cand.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )


@register(
    "repetition_ratio_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {OF.sql_tokens('text')} AS toks FROM documents
    ),
    s AS (SELECT doc_id, toks, {OF.sql_word_shingles('toks', 3)} AS gs FROM t)
    SELECT doc_id,
           len(toks) AS n_toks,
           (len(toks) - len(list_distinct(toks))) * 10000 // greatest(len(toks), 1)
             AS tok_rep_bp,
           (len(gs) - len(list_distinct(gs))) * 10000 // greatest(len(gs), 1)
             AS gram_rep_bp
    FROM s
    """,
)
def repetition_ratio_docs(spark, sf_dir):
    """Intra-document repetition: duplicated-token and duplicated-
    trigram fractions, in integer basis points — integer div on both
    engines, so no cross-engine FP rounding at all. High gram_rep_bp
    flags looping/boilerplate text, a standard pre-training quality
    gate. Pure per-row map — no shuffle."""
    from python_plugins_spark.functions import tokens as _tokens, word_shingles

    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        _tokens(F.col("text")).alias("toks"),
        word_shingles(_tokens(F.col("text")), 3).alias("gs"),
    ).select(
        "doc_id",
        F.size("toks").cast("long").alias("n_toks"),
        F.expr(
            "(size(toks) - size(array_distinct(toks))) * 10000L"
            " div greatest(size(toks), 1)"
        ).alias("tok_rep_bp"),
        F.expr(
            "(size(gs) - size(array_distinct(gs))) * 10000L"
            " div greatest(size(gs), 1)"
        ).alias("gram_rep_bp"),
    )


@register(
    "domain_mix_rebalance",
    oracle=f"""
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE ({OF.sql_hash32("'mix-' || d.doc_id::VARCHAR")} % 10000)
          < (1 + {OF.sql_hash32("'w-' || d.source")} % 3) * 2500
    """,
)
def domain_mix_rebalance(spark, sf_dir):
    """Domain-mix rebalancing: per-source sampling rates (the
    "downsample CommonCrawl, keep Wikipedia" mixing step) applied with
    a deterministic content-hash Bernoulli filter — the keep decision
    is a pure function of (doc_id, source), so it is reproducible
    across engines, runs, and task retries (no RNG state), and the
    acceptance test is all-integer: h(doc) % 10000 < rate_bp(source).
    Here rates are hash-derived (25/50/75%) in lieu of a config map.
    Scale shape: pure per-row filter on the corpus scan — no shuffle,
    no collect; a real weight table would broadcast."""
    from python_plugins_spark.functions import hash32

    docs = load_table(spark, "documents", sf_dir)
    h = hash32(F.concat(F.lit("mix-"), F.col("doc_id").cast("string")))
    rate_bp = (1 + hash32(F.concat(F.lit("w-"), F.col("source"))) % 3) * 2500
    return docs.filter(h % 10000 < rate_bp).select("doc_id", "source")


# =====================================================================
# Distributed global index, stream-static enrichment, XML codec,
# data-quality profile, token entropy
# =====================================================================

@register(
    "global_sequence_orders",
    oracle="""
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_orderkey) - 1 AS seq
    FROM orders
    """,
)
def global_sequence_orders(spark, sf_dir):
    """Contiguous 0-based global sequence in key order WITHOUT a
    single-partition window (`row_number() OVER (ORDER BY ...)` with no
    PARTITION BY collapses 100 TB onto one task). Scale formulation:
    range-partition on the key, number rows locally per partition, then
    shift each partition by the cumulative count of the partitions
    before it — the per-partition count table is tiny, so the offset
    join broadcasts. The fact data shuffles ONCE (the range
    partitioning); local numbering is the per-partition counter of
    monotonically_increasing_id taken above the in-partition sort, a
    narrow op (a window on pid would re-shuffle everything a second
    time)."""
    o = load_table(spark, "orders", sf_dir).select("o_orderkey")
    part = _global_index_part(o, "o_orderkey").localCheckpoint(eager=True)
    counts = part.groupBy("pid").agg(F.count("*").alias("cnt"))
    # cumulative offsets via a triangular join on the 16-row count
    # table (cheaper to reason about than a reduced-input window, and
    # emits no single-partition WindowExec at all)
    c2 = counts.select(F.col("pid").alias("pid2"), F.col("cnt").alias("cnt2"))
    offsets = (
        counts.join(F.broadcast(c2), F.col("pid2") <= F.col("pid"))
        .groupBy("pid", "cnt")
        .agg((F.sum("cnt2") - F.first("cnt")).alias("offset"))
        .select("pid", "offset")
    )
    return part.join(F.broadcast(offsets), "pid").select(
        "o_orderkey",
        (F.col("offset") + F.col("local_rn")).cast("long").alias("seq"),
    )


@register(
    "streaming_static_enrich",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n, round(sum(e.value), 4) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def streaming_static_enrich(spark, sf_dir):
    """Stream-static join: the streaming fact is enriched against a
    batch dimension (re-read per micro-batch; broadcast when small) and
    aggregated — the standard streaming-ETL lookup shape. The static
    side needs no watermark; state is bounded by the aggregate keys."""
    import uuid

    from python_plugins_spark.sources.io import ensure_session_confs, fix_nanos_ts
    from python_plugins_spark.streaming import read_stream_parquet, run_to_memory_sink

    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = fix_nanos_ts(
        read_stream_parquet(spark, f"{sf_dir}/events.parquet", raw_schema)
    )
    dim = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    enriched = stream.join(
        F.broadcast(dim), stream.user_id == dim.c_custkey, "inner"
    )
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value")
    )
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    return run_to_memory_sink(agg, name, output_mode="complete")


@register(
    "xml_roundtrip_orders",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 4) AS price
    FROM orders WHERE o_custkey <= 100
    """,
)
def xml_roundtrip_orders(spark, sf_dir):
    """XML codec roundtrip (Spark 4 native to_xml/from_xml): struct ->
    XML string -> parsed struct must be lossless for the typed fields.
    The oracle reads the base table directly, so any serialization
    drift (precision, escaping) breaks the hash."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 100)
    xml = o.select(
        "o_orderkey",
        F.to_xml(F.struct("o_orderstatus", "o_totalprice")).alias("x"),
    )
    parsed = xml.select(
        "o_orderkey",
        F.from_xml(
            "x", "o_orderstatus string, o_totalprice double"
        ).alias("r"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("r.o_orderstatus").alias("o_orderstatus"),
        F.round("r.o_totalprice", 4).alias("price"),
    )


@register(
    "dq_profile_orders",
    oracle="""
    SELECT 'row_count' AS check_name, count(*)::BIGINT AS metric FROM orders
    UNION ALL
    SELECT 'orderkey_dupes', count(*) - count(DISTINCT o_orderkey) FROM orders
    UNION ALL
    SELECT 'custkey_nulls', count(*) FILTER (WHERE o_custkey IS NULL) FROM orders
    UNION ALL
    SELECT 'fk_orphans', count(*) FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'nonpositive_price', count(*) FILTER (WHERE o_totalprice <= 0) FROM orders
    UNION ALL
    SELECT 'date_out_of_range', count(*) FILTER (WHERE o_orderdate > DATE '1998-12-31')
    FROM orders
    """,
)
def dq_profile_orders(spark, sf_dir):
    """Data-quality expectation suite in two aggregate jobs: the
    single-pass checks (row count, key uniqueness, null ratio, domain
    ranges) fold into ONE scan + ONE partial+final aggregate, unpivoted
    to (check_name, metric) rows; referential integrity is a broadcast
    anti-join count against the dimension. The 100 TB shape: no check
    adds a scan — they share one."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir).select("c_custkey")
    one_pass = o.agg(
        F.count("*").alias("row_count"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("orderkey_dupes"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("custkey_nulls"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpositive_price"),
        F.count(F.when(F.col("o_orderdate") > F.lit("1998-12-31").cast("date"), 1)).alias(
            "date_out_of_range"
        ),
    ).selectExpr(
        "stack(5, 'row_count', row_count, 'orderkey_dupes', orderkey_dupes,"
        " 'custkey_nulls', custkey_nulls, 'nonpositive_price', nonpositive_price,"
        " 'date_out_of_range', date_out_of_range) AS (check_name, metric)"
    )
    orphans = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("metric"))
        .select(F.lit("fk_orphans").alias("check_name"), "metric")
    )
    return one_pass.unionByName(orphans)


@register(
    "token_entropy_per_source",
    oracle=f"""
    WITH e AS (
      SELECT source, unnest({OF.sql_tokens('text')}) AS tok FROM documents
    ),
    tc AS (SELECT source, tok, count(*) AS cnt FROM e GROUP BY source, tok),
    tot AS (SELECT source, sum(cnt) AS total FROM tc GROUP BY source)
    SELECT tc.source,
           count(*) AS vocab,
           sum(tc.cnt)::BIGINT AS n_tokens,
           round(-sum((tc.cnt / tot.total) * ln(tc.cnt / tot.total)), 4)
             AS entropy_nats
    FROM tc JOIN tot USING (source)
    GROUP BY tc.source
    """,
)
def token_entropy_per_source(spark, sf_dir):
    """Unigram Shannon entropy per source — the token-diversity signal
    used to spot degenerate/templated domains in pre-training mixes.
    Two aggregations: (source, token) counts, then the entropy fold per
    source; per-source totals are a tiny aggregate broadcast back onto
    the count table."""
    from python_plugins_spark.functions import tokens as _tokens

    docs = load_table(spark, "documents", sf_dir)
    tc = (
        docs.select("source", F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    tot = tc.groupBy("source").agg(F.sum("cnt").alias("total"))
    p = F.col("cnt") / F.col("total")
    return (
        tc.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("vocab"),
            F.sum("cnt").alias("n_tokens"),
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy_nats"),
        )
    )


# =====================================================================
# Product-analytics shapes (funnel, cohort) and an iterative graph
# algorithm (PageRank) with an unrolled cross-engine oracle
# =====================================================================

@register(
    "funnel_conversion_events",
    oracle=f"""
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT v.user_id,
           strftime(v.t1, '{_STRF}') AS first_view,
           strftime(c.t2, '{_STRF}') AS first_click,
           strftime(p.t3, '{_STRF}') AS first_purchase
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
)
def funnel_conversion_events(spark, sf_dir):
    """Ordered funnel (view -> click -> purchase): each stage's
    timestamp must strictly follow the previous stage's. Three
    conditional min-aggregates chained by joins — every stage is a
    key-partitioned aggregate over the (already small) survivors of
    the previous one, so the event scan happens three times but only
    ever shuffles on user_id. Unconverted users surface with null
    later stages (left joins), not dropped rows."""
    ev = load_table(spark, "events", sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            _ts(F.col("t1")).alias("first_view"),
            _ts(F.col("t2")).alias("first_click"),
            _ts(F.col("t3")).alias("first_purchase"),
        )
    )


@register(
    "cohort_retention_events",
    oracle="""
    WITH firstday AS (
      SELECT user_id, min(ts)::DATE AS cohort_day FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, e.ts::DATE) AS offset_d
      FROM events e JOIN firstday f USING (user_id)
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day, offset_d,
           count(*) AS n_users
    FROM act WHERE offset_d <= 7 GROUP BY 1, 2
    """,
)
def cohort_retention_events(spark, sf_dir):
    """Cohort retention: users grouped by first-activity day, counted
    again at day offsets 0..7. The cohort table is per-user (small) —
    it joins back to the event stream on user_id, then a distinct on
    (cohort, offset, user) before the count so multi-event days count
    once."""
    ev = load_table(spark, "events", sf_dir)
    firstday = ev.groupBy("user_id").agg(F.to_date(F.min("ts")).alias("cohort_day"))
    act = (
        ev.join(firstday, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("offset_d"),
        )
        .distinct()
    )
    return (
        act.filter(F.col("offset_d") <= 7)
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("offset_d").cast("long").alias("offset_d"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def _pagerank_oracle_sql(iters: int = 5, d: float = 0.85) -> str:
    """Loop-unrolled PageRank as chained CTEs — DuckDB runs the exact
    double-precision recurrence the Spark loop runs (same literals,
    same operation order), so values hash-match at 6 dp."""
    edge_expr = "(json_extract_string(props, '$.k')::BIGINT * 7) % 150"
    parts = [
        f"WITH edges AS (SELECT DISTINCT user_id AS src, {edge_expr} AS dst "
        f"FROM events WHERE user_id <> {edge_expr})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM nodes)",
        "deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM edges GROUP BY src)",
        "r0 AS (SELECT node, (SELECT 1.0 / n FROM nn) AS r FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"r{i + 1} AS (SELECT n.node, "
            f"(SELECT {1 - d} / nn.n FROM nn) + {d} * coalesce(s.m, 0.0) AS r "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node, sum(r{i}.r / deg.outdeg) AS m "
            f"FROM edges e JOIN r{i} ON r{i}.node = e.src "
            f"JOIN deg ON deg.src = e.src GROUP BY e.dst) s USING (node))"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, round(r, 6) AS pr FROM r{iters}"
    )


@register("pagerank_events_graph", oracle=_pagerank_oracle_sql())
def pagerank_events_graph(spark, sf_dir):
    """Iterative PageRank (5 damped iterations) over a deterministic
    graph derived from the event stream. Each iteration is one
    shuffle-join of the rank vector with the edge list plus a
    destination-keyed aggregate — the canonical iterative-dataflow
    shape. At scale: the edge list is the invariant; persist it
    partitioned by src so every iteration's join is co-located, and
    checkpoint the rank vector every few iterations to truncate
    lineage. Dangling-node mass leaks (no redistribution) — both
    engines implement the identical recurrence, oracle unrolled as
    chained CTEs."""
    d = 0.85
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    dst = (k * 7) % 150
    edges = (
        ev.select(F.col("user_id").alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    deg = edges.groupBy("src").agg(F.count("*").cast("double").alias("outdeg"))
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("r"))
    for _ in range(5):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("outdeg")).alias("m"))
        )
        ranks = nodes.join(
            contrib, nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.lit((1 - d) / n_nodes)
                + F.lit(d) * F.coalesce(F.col("m"), F.lit(0.0))
            ).alias("r"),
        )
    return ranks.select("node", F.round("r", 6).alias("pr"))


# =====================================================================
# Function-surface completeness: distribution windows, array set ops,
# null-handling, extended string/math catalogs
# =====================================================================

@register(
    "window_distribution_funcs",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           dense_rank() OVER w AS drank
    FROM orders WHERE o_custkey <= 150
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution_funcs(spark, sf_dir):
    """Distribution window functions (percent_rank, cume_dist,
    dense_rank) — rank normalization within partitions; ordering is
    made total with the unique key so both engines rank identically."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 150)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).cast("long").alias("drank"),
    )


@register(
    "array_set_operations",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_sort(list_distinct({OF.sql_tokens('text')})) AS a,
             list_sort(list_distinct({OF.sql_word_shingles(OF.sql_tokens('text'), 1)})) AS b
      FROM documents WHERE doc_id < 40
    )
    SELECT doc_id,
           len(list_intersect(a, b)) AS n_common,
           list_sort(list_filter(a, x -> NOT list_contains(b, x))) AS only_a,
           len(a) AS n_a
    FROM t
    """,
)
def array_set_operations(spark, sf_dir):
    """Array set algebra (intersect / except / distinct / sort) — both
    engines sort the results so set semantics (unordered) hash-match.
    The two token derivations intentionally coincide, making except
    empty and intersect total — the identity is the cross-engine
    check."""
    from python_plugins_spark.functions import tokens as _tokens, word_shingles

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 40)
    a = F.sort_array(F.array_distinct(_tokens(F.col("text"))))
    b = F.sort_array(F.array_distinct(word_shingles(_tokens(F.col("text")), 1)))
    return docs.select(
        "doc_id",
        F.size(F.array_intersect(a, b)).cast("long").alias("n_common"),
        F.sort_array(F.array_except(a, b)).alias("only_a"),
        F.size(a).cast("long").alias("n_a"),
    )


@register(
    "null_handling_catalog",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CASE WHEN nullif(o_custkey % 7, 0) IS NULL THEN -1.0
                ELSE round(o_totalprice / (o_custkey % 7), 4) END AS per_mod,
           (o_custkey % 7 = 0) AS is_mod7,
           ifnull(nullif(o_orderpriority, o_orderpriority), 'same') AS always_same
    FROM orders WHERE o_custkey <= 200
    """,
)
def null_handling_catalog(spark, sf_dir):
    """Null-handling scalar catalog: nullif / coalesce / ifnull /
    nvl2-style branching — the building blocks of defensive SQL over
    dirty data."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 200)
    mod7 = F.nullif(F.col("o_custkey") % 7, F.lit(0))
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.when(mod7.isNull(), F.lit(-1.0))
        .otherwise(F.round(F.col("o_totalprice") / mod7, 4))
        .alias("per_mod"),
        (F.col("o_custkey") % 7 == 0).alias("is_mod7"),
        F.ifnull(F.nullif("o_orderpriority", F.col("o_orderpriority")), F.lit("same")).alias(
            "always_same"
        ),
    )


@register(
    "string_catalog_extended",
    oracle="""
    SELECT doc_id,
           lpad(lang, 5, '_') AS lang_pad,
           translate(lower(source), 'src', 'SRC') AS src_up,
           split_part(source, 'c', 2) AS src_num,
           reverse(lang) AS lang_rev,
           repeat(lang, 2) AS lang_twice,
           left(text, 12) AS head,
           right(text, 6) AS tail_chars,
           initcap_part
    FROM (
      SELECT *,
        CASE WHEN length(text) = 0 THEN ''
             ELSE upper(substr(text, 1, 1)) || lower(substr(text, 2)) END AS initcap_part
      FROM documents
    ) WHERE doc_id < 80
    """,
)
def string_catalog_extended(spark, sf_dir):
    """Extended string catalog: pad / translate / split_part / reverse
    / repeat / left / right + a portable first-letter capitalization
    (Spark's initcap capitalizes EVERY word — the oracle pins the
    single-word-start semantics both engines can express)."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 80)
    first_cap = F.when(F.length("text") == 0, F.lit("")).otherwise(
        F.concat(
            F.upper(F.substring("text", 1, 1)),
            F.lower(F.expr("substring(text, 2)")),
        )
    )
    return docs.select(
        "doc_id",
        F.lpad("lang", 5, "_").alias("lang_pad"),
        F.translate(F.lower("source"), "src", "SRC").alias("src_up"),
        F.split_part("source", F.lit("c"), F.lit(2)).alias("src_num"),
        F.reverse("lang").alias("lang_rev"),
        F.repeat("lang", 2).alias("lang_twice"),
        F.substring("text", 1, 12).alias("head"),
        F.expr("right(text, 6)").alias("tail_chars"),
        first_cap.alias("initcap_part"),
    )


@register(
    "math_catalog_extended",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_extendedprice < 0 THEN 0
                WHEN l_extendedprice >= 100000 THEN 21
                ELSE floor(l_extendedprice / 5000)::BIGINT + 1 END AS price_bucket,
           round(ln(l_extendedprice + 1), 4) AS ln_price,
           round(log10(l_extendedprice + 1), 4) AS log10_price,
           round(sqrt(l_quantity), 4) AS sqrt_qty,
           round(pow(l_discount, 2), 6) AS disc_sq,
           sign(l_quantity - 25) AS qty_sign,
           ceil(l_tax * 100) AS tax_pct_ceil,
           floor(l_extendedprice / 1000) AS price_k
    FROM lineitem WHERE l_orderkey < 400
    """,
)
def math_catalog_extended(spark, sf_dir):
    """Extended math catalog incl. width_bucket (equi-width histogram
    bucketing as a scalar, the vectorized path histogram_events builds
    on), logs, roots, sign, ceil/floor."""
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.width_bucket("l_extendedprice", F.lit(0), F.lit(100000), F.lit(20)).alias(
            "price_bucket"
        ),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("ln_price"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 4).alias("log10_price"),
        F.round(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.signum(F.col("l_quantity") - 25).alias("qty_sign"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
    )


@register(
    "cdc_apply_with_deletes",
    oracle=f"""
    WITH log AS (
      SELECT user_id, event_type, ts, event_id, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events
    ),
    latest AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM log
    )
    SELECT user_id, event_type, strftime(ts, '{_STRF}') AS last_ts,
           round(value, 4) AS last_value
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_with_deletes(spark, sf_dir):
    """Full CDC apply: upserts AND tombstones. Latest entry per key
    wins; if the survivor is a delete, the key vanishes from the
    snapshot (filtering deletes BEFORE the window would wrongly
    resurrect an older upsert). Same one-shuffle log compaction as the
    upsert-only variant — the tombstone check is a post-window
    filter."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "op", F.when(F.col("event_type") == "error", "D").otherwise("U")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            "event_type",
            _ts(F.col("ts")).alias("last_ts"),
            F.round(F.col("value"), 4).alias("last_value"),
        )
    )


@register(
    "ohlc_bars_events",
    oracle=f"""
    WITH w AS (
      SELECT event_type, time_bucket(INTERVAL 15 minutes, ts) AS bucket, value,
             row_number() OVER (PARTITION BY event_type, time_bucket(INTERVAL 15 minutes, ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, time_bucket(INTERVAL 15 minutes, ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, strftime(bucket, '{_STRF}') AS bucket,
           round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
           count(*) AS n
    FROM w GROUP BY event_type, bucket
    """,
)
def ohlc_bars_events(spark, sf_dir):
    """Time-series downsampling to OHLC bars (open/high/low/close per
    15-minute bucket) — first/last are made deterministic by the
    (ts, event_id) total order, computed as rank-1 markers in the same
    window pass, then folded in one hash aggregate. One shuffle; at
    stream scale this same shape runs incrementally under a watermark."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "bucket", F.window("ts", "15 minutes")["start"]
    )
    wa = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    marked = ev.select(
        "event_type",
        "bucket",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    # group on the RAW bucket (the window's partitioning) so the agg
    # reuses the window exchange; formatting after the agg — grouping
    # on the formatted string would hash differently and re-shuffle
    return (
        marked.groupBy("event_type", "bucket")
        .agg(
            F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 4).alias("close"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


# =====================================================================
# Spark-4 extensibility surfaces: custom Python DataSource, mapInArrow,
# union-by-name schema drift
# =====================================================================

@register(
    "python_datasource_readings",
    oracle="""
    SELECT x AS id, CAST(x // 250 AS INT) AS part,
           ((x * 2654435761) % 1000) / 100.0 AS val
    FROM range(1000) t(x)
    """,
)
def python_datasource_readings(spark, sf_dir):
    """Custom Python DataSource (Spark 4): a user-registered format
    with real input partitions — the Spark-idiomatic version of the
    reference's source-plugin surface (its test DAG wires MockSource
    -> evaluator -> MockSink, BasePythonTransformTest.java:215-222).
    Deterministic generator, so the 4-task parallel scan is
    value-verified against an oracle replaying the recurrence."""
    from python_plugins_spark.sources.pydatasource import register as reg_ds

    reg_ds(spark)
    return spark.read.format("synthetic_readings").load()


@register(
    "python_datasource_pushdown",
    oracle="""
    SELECT CAST(x // 250 AS INT) AS part, count(*) AS n,
           round(sum(((x * 2654435761) % 1000) / 100.0), 4) AS total
    FROM range(1000) t(x)
    WHERE CAST(x // 250 AS INT) = 2 AND x >= 520 AND x < 740
    GROUP BY 1
    """,
)
def python_datasource_pushdown(spark, sf_dir):
    """Filter pushdown INTO the custom Python DataSource (Spark 4.1
    ``pushFilters``): the part-equality predicate prunes input
    partitions before task scheduling (3 of 4 splits never exist) and
    the id range narrows row generation inside the surviving split —
    the custom-source analogue of partition pruning + predicate
    pushdown on a parquet scan. The oracle replays the recurrence with
    the same WHERE clause, proving the pushed and post-scan semantics
    agree."""
    from python_plugins_spark.sources.pydatasource import register as reg_ds

    reg_ds(spark)
    df = (
        spark.read.format("synthetic_readings")
        .load()
        .filter((F.col("part") == 2) & (F.col("id") >= 520) & (F.col("id") < 740))
    )
    return df.groupBy("part").agg(
        F.count("*").alias("n"), F.round(F.sum("val"), 4).alias("total")
    )


@register(
    "mapinarrow_filtered_net",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS net_sum,
           count(*) AS n
    FROM lineitem WHERE l_quantity >= 30 GROUP BY l_returnflag
    """,
)
def mapinarrow_filtered_net(spark, sf_dir):
    """mapInArrow: the zero-copy batch escape hatch below mapInPandas —
    user code sees raw pyarrow RecordBatches (no pandas conversion),
    the right surface for columnar libraries. The batch does the
    filter+project; the aggregate stays JVM-side."""
    import pyarrow as pa
    import pyarrow.compute as pc

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    )

    def batch_net(batches):
        for b in batches:
            t = pa.Table.from_batches([b])
            t = t.filter(pc.greater_equal(t["l_quantity"], 30))
            net = pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
            out = pa.table(
                {"l_returnflag": t["l_returnflag"], "net": net}
            )
            for ob in out.to_batches():
                yield ob

    mapped = li.mapInArrow(batch_net, "l_returnflag string, net double")
    return mapped.groupBy("l_returnflag").agg(
        F.round(F.sum("net"), 4).alias("net_sum"), F.count("*").alias("n")
    )


@register(
    "union_by_name_drift",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 4) AS price, o_orderstatus,
           NULL::VARCHAR AS o_orderpriority
    FROM orders WHERE o_custkey % 5 = 0
    UNION ALL
    SELECT o_orderkey, NULL::DOUBLE AS price, o_orderstatus, o_orderpriority
    FROM orders WHERE o_custkey % 5 = 1
    """,
)
def union_by_name_drift(spark, sf_dir):
    """Schema-drift union: two extracts with different column sets
    merged positionally-by-NAME with missing columns null-filled
    (unionByName(allowMissingColumns=True)) — the schema-evolution
    append path; a positional UNION here would silently misalign."""
    o = load_table(spark, "orders", sf_dir)
    a = o.filter(F.col("o_custkey") % 5 == 0).select(
        "o_orderkey", F.round("o_totalprice", 4).alias("price"), "o_orderstatus"
    )
    b = o.filter(F.col("o_custkey") % 5 == 1).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "collated_group_counts",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS m
      FROM documents
    )
    SELECT lower(any_value(m)) AS src, count(*) AS n
    FROM t GROUP BY m COLLATE NOCASE
    """,
)
def collated_group_counts(spark, sf_dir):
    """Collation-aware grouping (Spark 4 UTF8_LCASE ≙ DuckDB NOCASE):
    case-insensitive equality as a COLUMN PROPERTY instead of
    lower()-wrapping every comparison — pushed into the hash of the
    aggregate itself. Output canonicalized via lower(any_value):
    deterministic because all members of a collated group share one
    lowercase image."""
    docs = load_table(spark, "documents", sf_dir)
    m = F.when(F.col("doc_id") % 2 == 0, F.upper("source")).otherwise(
        F.col("source")
    )
    return (
        docs.select(m.alias("m"))
        .groupBy(F.collate(F.col("m"), "UTF8_LCASE").alias("k"))
        .agg(
            F.lower(F.any_value(F.col("m"))).alias("src"),
            F.count("*").alias("n"),
        )
        .select("src", "n")
    )


# =====================================================================
# URL parsing, PII masking, XPath, period-over-period, robust stats,
# ties-aware top-k
# =====================================================================

@register(
    "parse_url_docs",
    oracle="""
    SELECT doc_id,
           source || '.example.com' AS host,
           '/docs/' || doc_id AS path,
           'lang=' || lang AS query,
           lang AS lang_param
    FROM documents WHERE doc_id < 120
    """,
)
def parse_url_docs(spark, sf_dir):
    """URL decomposition (parse_url: HOST / PATH / QUERY / named query
    param) — the first step of URL-based corpus filtering and
    per-domain dedup. URLs are synthesized deterministically so the
    oracle can state the expected parts directly."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 120)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "mask_pii_docs",
    oracle="""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked
    FROM documents
    WHERE regexp_matches(text, '^[\\x00-\\x7F]*$') AND doc_id < 200
    """,
)
def mask_pii_docs(spark, sf_dir):
    """Structural PII masking (Spark 3.5 mask()): letters -> X/x,
    digits -> n, punctuation preserved — shape-preserving redaction
    (complementing scrub_pii_docs' pattern replacement). Restricted to
    ASCII docs because mask() classifies the full Unicode case tables
    while the oracle's character classes are ASCII."""
    docs = load_table(spark, "documents", sf_dir).filter(
        (F.col("doc_id") < 200) & F.col("text").rlike(r"^[\x00-\x7F]*$")
    )
    return docs.select("doc_id", F.mask("text").alias("masked"))


@register(
    "xpath_extract_orders",
    oracle="""
    SELECT o_orderkey, o_orderstatus AS status, CAST(o_custkey AS VARCHAR) AS cust
    FROM orders WHERE o_custkey <= 80
    """,
)
def xpath_extract_orders(spark, sf_dir):
    """XPath extraction over XML payloads (xpath_string) — the
    ingest-side complement of xml_roundtrip_orders: navigate a
    document tree by path expression. XML is built from the row, so
    the oracle states the expected extraction from the base table."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 80)
    xml = F.to_xml(F.struct("o_orderstatus", "o_custkey"))
    return o.select(
        "o_orderkey",
        F.xpath_string(xml, F.lit("ROW/o_orderstatus")).alias("status"),
        F.xpath_string(xml, F.lit("ROW/o_custkey")).alias("cust"),
    )


@register(
    "period_over_period_revenue",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority, date_trunc('month', o_orderdate) AS mon,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, strftime(mon, '%Y-%m-%d') AS mon, rev,
           round((rev - lag(rev) OVER w) / lag(rev) OVER w, 6) AS pct_change
    FROM m WINDOW w AS (PARTITION BY o_orderpriority ORDER BY mon)
    """,
)
def period_over_period_revenue(spark, sf_dir):
    """Period-over-period growth: monthly revenue per priority with
    lag-based % change. The ratio is computed from the ALREADY-rounded
    revenues, so both engines divide identical inputs — no cross-engine
    FP divergence inside the ratio."""
    o = load_table(spark, "orders", sf_dir)
    m = o.groupBy(
        "o_orderpriority", F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("rev"))
    w = Window.partitionBy("o_orderpriority").orderBy("mon")
    prev = F.lag("rev").over(w)
    return m.select(
        "o_orderpriority",
        F.date_format("mon", "yyyy-MM-dd").alias("mon"),
        "rev",
        F.round((F.col("rev") - prev) / prev, 6).alias("pct_change"),
    )


@register(
    "mad_robust_stats",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           round(any_value(med.med), 4) AS median_price,
           round(quantile_cont(abs(l.l_extendedprice - med.med), 0.5), 4) AS mad
    FROM lineitem l JOIN med USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def mad_robust_stats(spark, sf_dir):
    """Robust dispersion: median absolute deviation — a nested exact
    quantile (median of |x - group median|). Two aggregation passes
    over the fact; the per-group medians are a tiny table broadcast
    back for the deviation pass. Spark percentile() and DuckDB
    quantile_cont share linear-interpolation semantics."""
    li = load_table(spark, "lineitem", sf_dir)
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("med")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.any_value("med"), 4).alias("median_price"),
            F.round(
                F.percentile(F.abs(F.col("l_extendedprice") - F.col("med")), F.lit(0.5)),
                4,
            ).alias("mad"),
        )
    )


@register(
    "topk_with_ties_orders",
    oracle="""
    SELECT o_orderkey, price_band FROM (
      SELECT o_orderkey, floor(o_totalprice / 50000)::BIGINT AS price_band,
             rank() OVER (ORDER BY floor(o_totalprice / 50000) DESC) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def topk_with_ties_orders(spark, sf_dir):
    """Top-k WITH TIES (ANSI FETCH FIRST ... WITH TIES): every row
    tied with the k-th survives — LIMIT would nondeterministically
    drop tie members, the classic unstable-top-k bug.

    Scale formulation (no single-partition rank window, which is what
    the oracle runs): ``rank() <= k`` over ORDER BY m DESC is exactly
    ``m >= (k-th largest m, duplicates counted)``. So: take the top-k
    rows with TakeOrderedAndProject (per-partition heaps + driver
    merge of k rows), reduce them to the 1-row threshold, broadcast
    it, and filter the fact scan — two scans, zero global sorts."""
    o = load_table(spark, "orders", sf_dir)
    band = F.floor(F.col("o_totalprice") / 50000).cast("long")
    banded = o.select("o_orderkey", band.alias("price_band"))
    thr = (
        banded.orderBy(F.col("price_band").desc())
        .limit(3)
        .agg(F.min("price_band").alias("thr"))
    )
    return (
        banded.crossJoin(F.broadcast(thr))
        .filter(F.col("price_band") >= F.col("thr"))
        .select("o_orderkey", "price_band")
    )


@register(
    "transpose_pricing_summary",
    oracle="""
    WITH s AS (
      SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty,
             count(*)::DOUBLE AS count_order
      FROM lineitem GROUP BY 1
    )
    SELECT 'sum_qty' AS key,
           (SELECT sum_qty FROM s WHERE l_returnflag = 'A') AS A,
           (SELECT sum_qty FROM s WHERE l_returnflag = 'N') AS N,
           (SELECT sum_qty FROM s WHERE l_returnflag = 'R') AS R
    UNION ALL
    SELECT 'count_order',
           (SELECT count_order FROM s WHERE l_returnflag = 'A'),
           (SELECT count_order FROM s WHERE l_returnflag = 'N'),
           (SELECT count_order FROM s WHERE l_returnflag = 'R')
    """,
)
def transpose_pricing_summary(spark, sf_dir):
    """DataFrame.transpose (Spark 4): measures-as-rows presentation of
    a small aggregate — index values become columns, every measure cast
    to the common type (double). Only ever applied to POST-aggregation
    frames (a transpose of big data would pivot on unbounded
    cardinality)."""
    li = load_table(spark, "lineitem", sf_dir)
    base = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count("*").cast("double").alias("count_order"),
    )
    return base.transpose()


@register(
    "json_dropmalformed_source",
    oracle="""
    SELECT doc_id, n_chars FROM documents WHERE doc_id % 7 <> 0
    """,
)
def json_dropmalformed_source(spark, sf_dir):
    """Malformed-record policy on the JSON source: a JSONL fixture
    (deterministically derived from `documents`; every 7th line is
    truncated garbage) read under mode=DROPMALFORMED — bad lines
    vanish, good lines parse with the declared schema. The fixture
    lives in sources/fixtures.py (shared setup); the READ is the
    operator under test. PERMISSIVE + columnNameOfCorruptRecord is the
    auditing alternative (see docs)."""
    from python_plugins_spark.sources.fixtures import corrupt_jsonl

    path = corrupt_jsonl(sf_dir, variant="corrupt")
    return (
        spark.read.schema("doc_id bigint, n_chars bigint")
        .option("mode", "DROPMALFORMED")
        .json(path)
    )


@register(
    "csv_multiline_quoted_roundtrip",
    oracle="""
    SELECT doc_id, md5('a,"b"' || chr(10) || text) AS text_md5
    FROM documents WHERE doc_id < 150
    """,
)
def csv_multiline_quoted_roundtrip(spark, sf_dir):
    """CSV escaping torture test: every value is prefixed with an
    embedded comma, double-quote AND newline, written with quoting,
    and read back with multiLine=true — md5 of the round-tripped text
    must equal md5 of the constructed original. The config that makes
    it lossless (quote/escape/multiLine) is the point; default
    line-split parsing would shred these rows."""
    import os

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 150)
    dirty = docs.select(
        "doc_id",
        F.concat(F.lit('a,"b"'), F.lit("\n"), F.col("text")).alias("t"),
    )
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(_SCRATCH, f"dirty_csv_{tag}")
    dirty.write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).csv(path)
    back = (
        spark.read.schema("doc_id bigint, t string")
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
    return back.select("doc_id", F.md5(F.col("t").cast("binary")).alias("text_md5"))


@register(
    "parquet_zstd_roundtrip",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 4) AS total
    FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_returnflag
    """,
)
def parquet_zstd_roundtrip(spark, sf_dir):
    """Codec-explicit parquet sink (zstd) + read-back aggregate — the
    storage-efficiency knob for cold corpus tiers; the roundtrip proves
    codec choice never touches values."""
    import os

    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 2000)
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(_SCRATCH, f"zstd_li_{tag}")
    li.write.mode("overwrite").option("compression", "zstd").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 4).alias("total")
    )


# =====================================================================
# Training-corpus curation II: deterministic splits, chunking, EWMA,
# graph triangles (SURVEY.md §2c LLM-pipeline ops)
# =====================================================================

@register(
    "hash_split_train_test",
    oracle="""
    WITH tagged AS (
        SELECT source,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT source, split, count(*) AS n_docs
    FROM tagged GROUP BY source, split
    """,
)
def hash_split_train_test(spark, sf_dir):
    """Deterministic ~90/5/5 train/val/test split keyed on md5(doc_id) —
    the standard leakage-safe corpus split (same doc always lands in the
    same split across runs, machines, and engines; no RNG state to
    coordinate). Lexicographic compare on the first hex byte is
    engine-portable: md5 is bit-identical everywhere, so the assignment
    is too. At scale this is a narrow stateless projection — no
    shuffle for the tagging itself, one partial-agg shuffle for the
    audit counts. Reference carries no split op; this is the §2c
    training-pipeline surface."""
    docs = load_table(spark, "documents", sf_dir)
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < "e6", "train").when(h2 < "f3", "val").otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "doc_chunk_overlap",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    )
    SELECT doc_id, s AS chunk_start,
           len(t[s + 1 : s + 64]) AS n_tokens,
           md5(array_to_string(t[s + 1 : s + 64], ' ')) AS chunk_md5
    FROM toks, LATERAL (SELECT unnest(generate_series(0, len(t) - 1, 48)) AS s)
    """,
)
def doc_chunk_overlap(spark, sf_dir):
    """Sliding-window document chunking (64-token windows, stride 48 →
    16-token overlap) — the standard pre-tokenization step for context-
    bounded training samples and RAG indexing. Pure built-ins: split →
    sequence(0, n-1, 48) → explode → slice, all inside whole-stage
    codegen; no Python, no UDF. The explode is a narrow 1→N flatMap —
    no shuffle at any scale; chunk text is emitted as md5 so the gate
    compares content without hauling full strings."""
    docs = load_table(spark, "documents", sf_dir)
    toks = (
        docs.withColumn("t", F.split(F.trim("text"), r"\s+"))
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", "t")
    )
    starts = F.sequence(F.lit(0), F.size("t") - 1, F.lit(48))
    chunk = F.slice("t", F.col("chunk_start") + 1, 64)
    return (
        toks.select("doc_id", "t", F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            "chunk_start",
            F.size(chunk).alias("n_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
    )


@register(
    "triangle_count_graph",
    oracle="""
    WITH dedges AS (
        SELECT DISTINCT user_id AS src,
               (json_extract_string(props, '$.k')::BIGINT * 7) % 150 AS dst
        FROM events
        WHERE user_id <> (json_extract_string(props, '$.k')::BIGINT * 7) % 150
    ),
    ue AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM dedges
    )
    SELECT count(*) AS n_triangles,
           (SELECT count(*) FROM ue) AS n_edges
    FROM ue e1
    JOIN ue e2 ON e2.a = e1.b
    JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def triangle_count_graph(spark, sf_dir):
    """Triangle counting on the undirected event graph (same derived
    edge set as pagerank_events_graph): canonicalize edges to a<b, then
    the classic e1(a,b)⋈e2(b,c)⋈e3(a,c) with a<b<c so each triangle
    is counted exactly once. Two shuffle joins on edge endpoints; at
    scale the standard mitigation is degree-ordered orientation (each
    edge directed low-degree→high-degree) which bounds the join fan-out
    by sqrt(|E|) — the a<b canonical form here is its fixed-order
    special case. Graph metric for corpus link-analysis QA."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    dst = (k * 7) % 150
    # no pre-canonical distinct: the post-canonical one subsumes it
    # ((u,v) and (v,u) both land on (min,max)) — saves a full shuffle
    edges = (
        ev.select(F.col("user_id").alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
    )
    return tri.agg(F.count("*").alias("n_triangles")).crossJoin(
        edges.agg(F.count("*").alias("n_edges"))
    )


@register(
    "ewma_last_per_user",
    oracle="""
    WITH folded AS (
        SELECT user_id,
               count(*) AS n_events,
               list_reduce(list(value ORDER BY ts, event_id),
                           (acc, x) -> 0.2::DOUBLE * x + 0.8::DOUBLE * acc) AS ewma
        FROM events
        GROUP BY user_id
    )
    SELECT user_id, n_events, round(ewma, 4) AS ewma
    FROM folded WHERE user_id % 10 = 0
    """,
)
def ewma_last_per_user(spark, sf_dir):
    """Exponentially-weighted moving average (alpha=0.2) of each user's
    event values in time order — the recursive e_t = a*x_t + (1-a)*e_{t-1}
    smoother used for decayed engagement/quality scores. The recurrence
    is a true left fold, expressed natively as F.aggregate over the
    time-sorted collected array: one shuffle (groupBy user), fold runs
    JVM-side in codegen, no Python. Both engines fold in the identical
    element order (ts, event_id tiebreak), so doubles match bit-for-bit
    before the 4 dp round. At 100 TB the collected per-user array is the
    bound — fine for bounded per-key history; unbounded keys would move
    to applyInPandasWithState. user_id % 10 filter keeps gate output
    compact without losing fold-depth coverage."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") % 10 == 0)
    vals = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    folded = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), vals.alias("vals"))
        .select(
            "user_id",
            "n_events",
            F.round(
                F.aggregate(
                    F.slice("vals", 2, F.greatest(F.size("vals") - 1, F.lit(0))),
                    F.element_at("vals", 1),
                    lambda acc, x: F.lit(0.2) * x + F.lit(0.8) * acc,
                ),
                4,
            ).alias("ewma"),
        )
    )
    return folded


@register(
    "map_lambda_catalog",
    oracle="""
    SELECT o_orderkey,
           array_to_string(list_sort(list_filter(
               ['PRIORITY=priority:' || lower(o_orderpriority),
                'STATUS=status:' || lower(o_orderstatus)],
               s -> s NOT LIKE '%:f%')), ';') AS entries
    FROM orders WHERE o_orderkey < 500
    """,
)
def map_lambda_catalog(spark, sf_dir):
    """Map higher-order-function surface: build a MapType column, then
    transform_keys (upper), transform_values (key-prefixed lowercase),
    map_filter (drop values containing ':f'), and emit via map_entries
    as a sorted joined string so the unordered map hashes stably. All
    four lambdas run JVM-side inside codegen — the map column never
    leaves Tungsten rows. Covers the §2c scalar-function category's map
    lambda family (reference reaches nested maps only through Python
    dict access, PythonEvaluatorTest.java:298-376)."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 500)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    m = F.transform_keys(m, lambda k, v: F.upper(k))
    m = F.transform_values(m, lambda k, v: F.concat(F.lower(k), F.lit(":"), F.lower(v)))
    m = F.map_filter(m, lambda k, v: ~v.contains(":f"))
    entries = F.array_join(
        F.sort_array(
            F.transform(F.map_entries(m), lambda e: F.concat(e["key"], F.lit("="), e["value"]))
        ),
        ";",
    )
    return o.select("o_orderkey", entries.alias("entries"))


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               sqrt(list_sum(list_transform(embedding, x -> (x::DOUBLE * x::DOUBLE)))) AS l2,
               list_transform(embedding,
                              x -> trunc(x::DOUBLE / sqrt(list_sum(list_transform(embedding,
                                         y -> (y::DOUBLE * y::DOUBLE)))) * 127)::INTEGER) AS qv
        FROM embeddings
    )
    SELECT vec_id, round(l2, 4) AS l2_norm,
           list_sum(qv)::BIGINT AS q_checksum,
           list_min(qv) AS q_min, list_max(qv) AS q_max
    FROM q WHERE l2 > 0 AND vec_id % 5 = 0
    """,
)
def embedding_quantize_int8(spark, sf_dir):
    """Int8 embedding quantization (x/||x|| * 127, truncated) — the
    4x-compression step before ANN index build; storage at 100 TB of
    vectors is the real cost driver. Norm + quantize are array lambdas
    (F.aggregate / F.transform), all JVM-side, no Python: a narrow
    per-row map over the vector column, zero shuffle. Truncation (not
    round-half) is used so the int mapping is engine-exact; checksum +
    min/max per vector verify the full quantized payload without
    hauling 384 ints per row through the gate."""
    emb = load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") % 5 == 0)
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    l2 = F.sqrt(sq)
    withn = emb.select("vec_id", "embedding", l2.alias("l2")).filter(F.col("l2") > 0)
    qv = F.transform(
        "embedding",
        lambda x: (x.cast("double") / F.col("l2") * 127).cast("int"),  # cast int == trunc
    )
    return withn.select(
        "vec_id",
        F.round("l2", 4).alias("l2_norm"),
        F.aggregate(qv, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_checksum"),
        F.array_min(qv).alias("q_min"),
        F.array_max(qv).alias("q_max"),
    )


@register(
    "bigram_transitions",
    oracle="""
    WITH toks AS (
        SELECT string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    bg AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
        WHERE len(t) >= 2
    ),
    cnt AS (
        SELECT w1, w2, count(*) AS n,
               sum(count(*)) OVER (PARTITION BY w1) AS n_from
        FROM bg GROUP BY w1, w2
    )
    SELECT w1, w2, n, round(n / n_from::DOUBLE, 6) AS p
    FROM cnt ORDER BY n DESC, w1, w2 LIMIT 20
    """,
)
def bigram_transitions(spark, sf_dir):
    """Bigram language-model transition table: P(w2|w1) as bigram count
    over start-word mass, top-20 transitions. The n-gram LM is the
    classic corpus-statistics op (KenLM-style counting); shape = 1→N
    narrow explode, one partial-agg shuffle on (w1,w2), a lightweight
    window for the conditional denominator reusing the same w1
    clustering, then TakeOrderedAndProject for the global top-k (no
    full sort). Tie-break (n DESC, w1, w2) pins the selected set across
    engines."""
    docs = load_table(spark, "documents", sf_dir)
    toks = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(F.split(F.trim(F.lower("text")), r"\s+").alias("t"))
        .filter(F.size("t") >= 2)
    )
    bg = toks.select(
        F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"), "t"
    ).select(
        F.element_at("t", F.col("i")).alias("w1"),
        F.element_at("t", F.col("i") + 1).alias("w2"),
    )
    cnt = bg.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    cnt = cnt.withColumn("n_from", F.sum("n").over(Window.partitionBy("w1")))
    return (
        cnt.select(
            "w1", "w2", "n",
            F.round(F.col("n") / F.col("n_from").cast("double"), 6).alias("p"),
        )
        .orderBy(F.desc("n"), "w1", "w2")
        .limit(20)
    )


@register(
    "zorder_interleave_lineitem",
    oracle="""
    WITH z AS (
        SELECT (SELECT sum(((l_partkey % 65536) // (1::BIGINT << i) % 2) * (1::BIGINT << (2*i))
                         + ((l_suppkey % 65536) // (1::BIGINT << i) % 2) * (1::BIGINT << (2*i+1)))
                FROM unnest(generate_series(0, 15)) AS u(i)) AS zval
        FROM lineitem
    )
    SELECT zval // 65536 AS z_bucket, count(*) AS n,
           min(zval) AS z_min, max(zval) AS z_max
    FROM z GROUP BY z_bucket
    """,
)
def zorder_interleave_lineitem(spark, sf_dir):
    """Z-order (Morton) interleave of (l_partkey, l_suppkey) — the
    multi-dimensional clustering key used to lay out 100 TB so range
    predicates on EITHER dimension prune file-level min/max zones
    (Delta OPTIMIZE ZORDER's core primitive). Bit interleave is a pure
    16-step integer fold (F.aggregate over sequence(0,15)) — all
    codegen, no UDF, no shuffle for key derivation; the bucket
    histogram then shows the space-filling curve's locality (each
    bucket = one contiguous z-range you'd write as one file group)."""
    li = load_table(spark, "lineitem", sf_dir)
    x = F.col("l_partkey") % 65536
    y = F.col("l_suppkey") % 65536
    p = lambda i: F.pow(F.lit(2.0), i.cast("double")).cast("long")
    p2 = lambda i: F.pow(F.lit(4.0), i.cast("double")).cast("long")
    zval = F.aggregate(
        F.sequence(F.lit(0), F.lit(15)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + (x.cast("long") / p(i)).cast("long") % 2 * p2(i)
        + (y.cast("long") / p(i)).cast("long") % 2 * 2 * p2(i),
    )
    return (
        li.select(zval.alias("zval"))
        .groupBy((F.col("zval") / 65536).cast("long").alias("z_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
    )


@register(
    "hash_sample_per_source",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, source, rk FROM ranked WHERE rk <= 7
    """,
)
def hash_sample_per_source(spark, sf_dir):
    """Fixed-k per-group deterministic sample (k=7 docs per source),
    rank-ordered by md5(doc_id) — the reproducible 'eyeball sample'
    / eval-holdout selector: stable across runs, engines, and task
    retries, unlike rand()-based sampleBy. Hash-ordering makes the
    pick uniform over each group while staying a pure function of the
    key. Plan shape is the per-group top-k pattern: one shuffle on
    source, WindowGroupLimit pushes rk<=7 below the sort at scale so
    no group is fully sorted. Complements domain_mix_rebalance
    (rate-based Bernoulli) with count-based selection."""
    docs = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 7)
    )


@register(
    "tfidf_cosine_pairs",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(str_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (
      SELECT tf.doc_id, tf.term, tf.tf * ln(n.n_docs / df.df) AS w
      FROM tf JOIN df USING (term) CROSS JOIN n
      WHERE df.df BETWEEN 2 AND 50
    ),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM w GROUP BY 1),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(dot / (na.nn * nb.nn), 4) AS cosine
    FROM dots
    JOIN nrm na ON na.doc_id = doc_a
    JOIN nrm nb ON nb.doc_id = doc_b
    ORDER BY cosine DESC, doc_a, doc_b LIMIT 20
    """,
)
def tfidf_cosine_pairs(spark, sf_dir):
    """Sparse TF-IDF cosine similarity via inverted-index join — the
    text-side complement to dense embedding ANN: postings (doc, term,
    weight) self-join on term, partial dot products aggregate per doc
    pair, norms join back. The scale lever is pruning hot postings —
    terms with df>50 (stopwords) are dropped BEFORE the self-join,
    bounding per-term fan-out to df^2 <= 2500 (without it one stopword
    posting list of length L costs L^2 pairs). df is also the broadcast
    side. Top-20 by rounded cosine with (a,b) tie-break pins the set
    across engines."""
    from python_plugins_spark.functions import tokens as _tokens

    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.count()
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = (
        tok.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df").between(2, 50))
    )
    w = tf.join(F.broadcast(df_), on="term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("w"),
    )
    # The postings relation feeds the self-join twice plus the norm
    # aggregate: without materialization the corpus is scanned and
    # re-tokenized once per reference (16 scans at plan time). Persist
    # collapses the diamond to one tokenization — at 100 TB this is the
    # difference between 1x and 4x corpus I/O.
    w = w.persist()
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nn"))
    a = w.alias("a")
    b = w.alias("b")
    dots = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = nrm.alias("na")
    nb = nrm.alias("nb")
    return (
        dots.join(na, F.col("na.doc_id") == F.col("doc_a"))
        .join(nb, F.col("nb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.round(F.col("dot") / (F.col("na.nn") * F.col("nb.nn")), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "doc_a", "doc_b")
        .limit(20)
    )


@register(
    "event_pmi_pairs",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    nu AS (SELECT count(DISTINCT user_id)::DOUBLE AS n FROM events),
    m AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_ab
      FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT t1, t2, n_ab,
           round(ln((n_ab * nu.n) / (m1.n_t::DOUBLE * m2.n_t)), 6) AS pmi
    FROM pairs
    JOIN m m1 ON m1.event_type = t1
    JOIN m m2 ON m2.event_type = t2
    CROSS JOIN nu
    """,
)
def event_pmi_pairs(spark, sf_dir):
    """Pointwise mutual information between event types co-occurring in
    a user's history — the association-mining primitive behind feature
    co-occurrence and collocation detection: PMI = ln(P(a,b)/(P(a)P(b))).
    Shape: distinct (user,type) projection, self-join on user (bounded
    fan-out: types-per-user is small), pair counts, then two broadcast
    joins against the tiny per-type marginal table. The n_ab*N/(na*nb)
    ratio is formed in one expression so both engines evaluate the same
    double before the 6 dp round."""
    ev = load_table(spark, "events", sf_dir)
    ut = ev.select("user_id", "event_type").distinct()
    n_users = float(ev.select("user_id").distinct().count())
    m = ut.groupBy("event_type").agg(F.count("*").alias("n_t"))
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("t1"), F.col("b.event_type").alias("t2")
        )
        .agg(F.count("*").alias("n_ab"))
    )
    m1 = m.alias("m1")
    m2 = m.alias("m2")
    return (
        pairs.join(F.broadcast(m1), F.col("m1.event_type") == F.col("t1"))
        .join(F.broadcast(m2), F.col("m2.event_type") == F.col("t2"))
        .select(
            "t1", "t2", "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") * F.lit(n_users))
                    / (F.col("m1.n_t").cast("double") * F.col("m2.n_t"))
                ),
                6,
            ).alias("pmi"),
        )
    )


@register(
    "pareto_frontier_parts",
    oracle="""
    WITH pts AS (
        SELECT DISTINCT round(p_retailprice)::BIGINT AS price, p_size AS size
        FROM part
    )
    SELECT price, size FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.price <= p.price AND q.size >= p.size
          AND (q.price < p.price OR q.size > p.size)
    )
    """,
)
def pareto_frontier_parts(spark, sf_dir):
    """Pareto frontier (skyline operator): parts not dominated on
    (minimize price, maximize size). Expressed as an anti-join with the
    dominance predicate — Catalyst plans the non-equi condition as a
    broadcast nested-loop anti-join over the deduplicated point set
    (distinct first: dominance only depends on the point, so the
    quadratic step runs on |unique points|, not |rows|). At 100 TB the
    standard skyline refinement applies: pre-filter with a coarse grid
    (each cell keeps its local frontier, only cell winners enter the
    global NLJ) — the dedup here is that idea's degenerate form. All
    comparisons are integer-exact."""
    pts = (
        load_table(spark, "part", sf_dir)
        .select(
            F.round("p_retailprice").cast("long").alias("price"),
            F.col("p_size").alias("size"),
        )
        .distinct()
    )
    p = pts.alias("p")
    q = pts.alias("q")
    dominated = (
        (F.col("q.price") <= F.col("p.price"))
        & (F.col("q.size") >= F.col("p.size"))
        & ((F.col("q.price") < F.col("p.price")) | (F.col("q.size") > F.col("p.size")))
    )
    return p.join(q, dominated, "left_anti").select("price", "size")


@register(
    "file_metadata_scan",
    oracle="""
    SELECT 'orders.parquet' AS file_name, count(*) AS n_rows FROM orders
    UNION ALL SELECT 'lineitem.parquet', count(*) FROM lineitem
    UNION ALL SELECT 'part.parquet', count(*) FROM part
    """,
)
def file_metadata_scan(spark, sf_dir):
    """Hidden `_metadata` file-source column (Spark's per-file lineage
    surface): row counts keyed by originating file name across a
    multi-table scan — the debugging/audit primitive for 'which input
    file produced these rows' at 100 TB (skew hunting, bad-file
    quarantine). `_metadata.file_name` is constant-folded per split, so
    the aggregate is a near-free partial count per file; no Python and
    no extra scan of data columns (column pruning leaves only the
    virtual column)."""
    out = None
    for t in ("orders", "lineitem", "part"):
        d = (
            load_table(spark, t, sf_dir)
            .select(F.col("_metadata.file_name").alias("file_name"))
            .groupBy("file_name")
            .agg(F.count("*").alias("n_rows"))
        )
        out = d if out is None else out.unionByName(d)
    return out


# =====================================================================
# Spark 4 SQL authoring surface: SQL UDFs, pipe syntax, session
# variables, parameterized queries (§2c scalar-function category —
# the declarative counterpart of the reference's script-side helpers,
# PythonEvaluatorTest.java:359-364)
# =====================================================================

@register(
    "sql_udf_disc_charge",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS disc_total,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS charge_total
    FROM lineitem WHERE l_quantity >= 30
    GROUP BY l_returnflag
    """,
)
def sql_udf_disc_charge(spark, sf_dir):
    """Declarative SQL scalar UDFs (CREATE FUNCTION ... RETURN expr,
    Spark 4): named business expressions reused across queries with
    ZERO runtime cost — the body is inlined into the plan at analysis
    time, so the aggregate below is plain codegen arithmetic, unlike a
    Python UDF which would serialize every row. This is the right home
    for the reference's per-record helper functions
    (PythonEvaluatorTest.java:359-364) when they are pure
    expressions."""
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("_sqludf_li")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charge(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN disc_price(p, d) * (1 + t)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(disc_price(l_extendedprice, l_discount)), 4) AS disc_total,
               round(sum(charge(l_extendedprice, l_discount, l_tax)), 4) AS charge_total
        FROM _sqludf_li WHERE l_quantity >= 30
        GROUP BY l_returnflag
        """
    )


@register(
    "sql_pipe_revenue",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_pipe_revenue(spark, sf_dir):
    """SQL pipe syntax (|>, Spark 4): linear dataflow authoring where
    each stage reads top-to-bottom — the SQL-side equivalent of
    DataFrame chaining. Compiles to the identical plan as the nested
    form (same pushdown, same single partial-agg shuffle); purely an
    authoring-surface feature, so the oracle is the classic
    formulation."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("_pipe_orders")
    return spark.sql(
        """
        FROM _pipe_orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE count(*) AS n_orders,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n_orders, revenue
        """
    )


@register(
    "parameterized_sql_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE o_totalprice > 150000 AND o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY o_orderpriority
    """,
)
def parameterized_sql_orders(spark, sf_dir):
    """Named-parameter SQL binding (spark.sql(..., args=...)) — the
    injection-safe templating surface for the reference's runtime
    arguments (context.getArguments(), PythonEvaluator.java:284):
    values bind as typed literals in the parsed plan, so constant
    folding and parquet filter pushdown see them exactly like inline
    constants."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("_param_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM _param_orders
        WHERE o_totalprice > :min_price AND o_orderdate >= :since
        GROUP BY o_orderpriority
        """,
        args={"min_price": 150000, "since": "1995-01-01 00:00:00"},
    )


@register(
    "sql_scripting_threshold_search",
    oracle="""
    WITH p AS (SELECT unnest(range(0, 12)) AS e),
    c AS (SELECT e,
                 (SELECT count(*) FROM orders WHERE o_totalprice > power(10, e)) AS n
          FROM p),
    t AS (SELECT CAST(power(10, min(e)) AS BIGINT) AS threshold FROM c WHERE n < 100)
    SELECT t.threshold,
           (SELECT count(*) FROM orders o WHERE o.o_totalprice > t.threshold) AS n_above
    FROM t
    """,
)
def sql_scripting_threshold_search(spark, sf_dir):
    """SQL scripting (Spark 4 BEGIN/DECLARE/WHILE): a data-driven
    control-flow loop entirely inside the SQL engine — escalate a
    power-of-10 price threshold until fewer than 100 orders exceed it,
    then report it. Each loop iteration is one scalar-subquery
    aggregate (a distributed job); the loop variable lives in the
    script frame. The oracle replays the search declaratively over the
    candidate exponent grid."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("_script_orders")
    return spark.sql(
        """
        BEGIN
          DECLARE thr BIGINT DEFAULT 1;
          WHILE (SELECT count(*) FROM _script_orders WHERE o_totalprice > thr) >= 100 DO
            SET thr = thr * 10;
          END WHILE;
          SELECT thr AS threshold,
                 (SELECT count(*) FROM _script_orders WHERE o_totalprice > thr) AS n_above;
        END
        """
    )


@register(
    "execute_immediate_orders",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(max(o_totalprice), 4) AS max_price
    FROM orders WHERE o_totalprice > 250000 GROUP BY o_orderstatus
    """,
)
def execute_immediate_orders(spark, sf_dir):
    """EXECUTE IMMEDIATE (dynamic SQL with USING parameter binding):
    the query text arrives as a string at runtime — the lakehouse
    equivalent of the reference's script-as-config surface — with the
    threshold bound as a typed parameter, not spliced into the text
    (injection-safe, and the optimizer sees a literal)."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("_dyn_orders")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderstatus, count(*) AS n, round(max(o_totalprice), 4) AS max_price
           FROM _dyn_orders WHERE o_totalprice > ? GROUP BY o_orderstatus'
          USING 250000
        """
    )


@register(
    "session_variable_threshold",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(avg(l_quantity), 4) AS avg_qty
    FROM lineitem WHERE l_quantity > 42
    GROUP BY l_returnflag
    """,
)
def session_variable_threshold(spark, sf_dir):
    """SQL session variables (DECLARE/SET VAR, Spark 4): session-scoped
    typed state for multi-statement scripts — the runtime-parameter
    channel when queries are authored as SQL scripts rather than
    DataFrame code. The variable reference folds to a literal at
    analysis, keeping pushdown intact (PushedFilters shows the
    resolved constant)."""
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("_var_li")
    spark.sql("DECLARE OR REPLACE VARIABLE qty_cut DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR qty_cut = 42.0")
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n, round(avg(l_quantity), 4) AS avg_qty
        FROM _var_li WHERE l_quantity > qty_cut
        GROUP BY l_returnflag
        """
    )


@register(
    "python_datasource_stream",
    oracle="""
    SELECT CAST(x % 4 AS INT) AS part, count(*) AS n,
           round(sum(((x * 2654435761) % 1000) / 100.0), 4) AS total
    FROM range(1000) t(x)
    GROUP BY part
    """,
)
def python_datasource_stream(spark, sf_dir):
    """Custom Python DataSource as a STREAMING source (Spark 4
    SimpleDataSourceStreamReader): dict offsets checkpointed by the
    engine, deterministic micro-batches (100 ids each), drained with
    availableNow into a memory sink. Replaying between the same two
    offsets regenerates identical rows — the purity contract that
    makes end-to-end exactly-once recovery possible for a custom
    source. Oracle replays the full recurrence in batch."""
    import uuid

    from python_plugins_spark.sources.pydatasource import register as reg_ds
    from python_plugins_spark.streaming import run_to_memory_sink

    reg_ds(spark)
    stream = (
        spark.readStream.format("synthetic_readings")
        .option("rows_per_batch", "250")
        .option("max_id", "1000")
        .load()
    )
    agg = stream.groupBy("part").agg(
        F.count("*").alias("n"), F.round(F.sum("val"), 4).alias("total")
    )
    name = f"pyds_stream_{uuid.uuid4().hex[:8]}"
    return run_to_memory_sink(agg, name, output_mode="complete")


@register(
    "streaming_dedup_within_watermark",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id, event_type, ts FROM events
    )
    SELECT user_id, count(*) AS n_distinct
    FROM d GROUP BY user_id
    """,
)
def streaming_dedup_within_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark (Spark 3.5+): dedups records whose
    event times fall within the watermark delay of the first-seen copy —
    unlike dropDuplicates, the event-time column need not be part of
    the key and state is evicted purely by the delay, the right
    semantics for at-least-once sources that retry with slightly
    different arrival times. Single-batch drain equals batch DISTINCT,
    which the oracle checks."""
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
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "ts"])
        .groupBy("user_id")
        .agg(F.count("*").alias("n_distinct"))
    )
    name = f"stream_ddww_{uuid.uuid4().hex[:8]}"
    return run_to_memory_sink(deduped, name, output_mode="complete")


@register(
    "udtf_analyze_ngrams",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents WHERE doc_id < 60 AND length(trim(text)) > 0
    )
    SELECT doc_id,
           t[i] AS g1, t[i + 1] AS g2, t[i + 2] AS g3
    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)
    WHERE len(t) >= 3
    """,
)
def udtf_analyze_ngrams(spark, sf_dir):
    """Polymorphic Python UDTF (Spark 4 `analyze`): the output schema —
    one column per n-gram position — is computed at ANALYSIS time from
    the literal `n` argument, so the same UDTF serves any n with a
    typed, named schema (g1..gn) instead of an opaque array. This is
    the table-function face of the reference's 1->N emitter
    (PythonEvaluator.java:262-266) with compile-time shape. Rows
    stream through Arrow batches; the lateral explode is narrow (no
    shuffle)."""
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            width = int(n.value)
            st = StructType()
            for i in range(1, width + 1):
                st = st.add(f"g{i}", "string")
            return AnalyzeResult(schema=st)

        def eval(self, text: str, n: int):
            toks = text.strip().lower().split()
            for i in range(len(toks) - n + 1):
                yield tuple(toks[i : i + n])

    spark.udtf.register("doc_ngrams", NGrams)
    docs = (
        load_table(spark, "documents", sf_dir)
        .filter((F.col("doc_id") < 60) & (F.length(F.trim("text")) > 0))
    )
    docs.createOrReplaceTempView("_udtf_ng_docs")
    return spark.sql(
        """
        SELECT d.doc_id, g.g1, g.g2, g.g3
        FROM _udtf_ng_docs d,
             LATERAL doc_ngrams(d.text, 3) g
        """
    )


def _kmeans_oracle_sql(iters: int = 3) -> str:
    """Loop-unrolled Lloyd's k-means in LONG (vec_id, dim, val) form —
    pure relational algebra, so DuckDB replays the exact recurrence the
    Spark loop runs: distances and centroids are rounded (6 dp) each
    iteration, making the discrete argmin engine-stable."""
    parts = [
        """WITH v AS (
        SELECT vec_id, i AS dim, embedding[i]::DOUBLE AS val
        FROM embeddings, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)
    )""",
        """c0 AS (
        SELECT (vec_id // 10)::INT AS cid, dim, round(val, 6) AS val
        FROM v WHERE vec_id IN (0, 10, 20, 30)
    )""",
    ]
    for n in range(1, iters + 1):
        parts.append(
            f"""d{n} AS (
        SELECT v.vec_id, c.cid,
               round(sum((v.val - c.val) * (v.val - c.val)), 6) AS d2
        FROM v JOIN c{n - 1} c USING (dim) GROUP BY 1, 2
    )"""
        )
        parts.append(
            f"""a{n} AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM d{n}
        ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""c{n} AS (
        SELECT a.cid, v.dim, round(avg(v.val), 6) AS val
        FROM a{n} a JOIN v USING (vec_id) GROUP BY 1, 2
    )"""
        )
    return (
        ",\n".join(parts)
        + f"""
    SELECT c.cid, m.n_members, round(sum(c.val), 4) AS centroid_checksum
    FROM c{iters} c
    JOIN (SELECT cid, count(*) AS n_members FROM a{iters} GROUP BY 1) m USING (cid)
    GROUP BY c.cid, m.n_members"""
    )


@register("kmeans_embeddings_3iter", oracle=_kmeans_oracle_sql())
def kmeans_embeddings_3iter(spark, sf_dir):
    """Lloyd's k-means (k=4, 3 unrolled iterations) over embeddings in
    LONG relational form — the scale-honest formulation for high-dim /
    huge-N clustering: explode vectors to (vec_id, dim, val) once, then
    every iteration is (broadcast-join with the k x dims centroid
    table) -> per-(vec,centroid) distance aggregate -> windowed argmin
    -> centroid re-average. The centroid relation is tiny (k*64 rows)
    and broadcast, so each iteration shuffles only on vec_id /
    (cid,dim) aggregates — never a crossJoin of dense vectors. Per-
    iteration 6 dp rounding of distances and centroids pins the
    discrete assignment across engines (same trick as
    pagerank_events_graph); checksum output keeps the gate payload
    small. At 100 TB: persist the long table, checkpoint centroids per
    iteration (truncates lineage), and salt the argmin window if one
    vector id space is skewed."""
    emb = load_table(spark, "embeddings", sf_dir)
    v = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id", (F.col("pos") + 1).alias("dim"), F.col("x").cast("double").alias("val")
    )
    v = v.persist()
    c = (
        v.filter(F.col("vec_id").isin(0, 10, 20, 30))
        .select(
            (F.col("vec_id") / 10).cast("int").alias("cid"),
            "dim",
            F.round("val", 6).alias("val"),
        )
    )
    for _ in range(3):
        cv = F.broadcast(c.withColumnRenamed("val", "cval"))
        d = (
            v.join(cv, on="dim")
            .groupBy("vec_id", "cid")
            .agg(
                F.round(
                    F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))),
                    6,
                ).alias("d2")
            )
        )
        w = Window.partitionBy("vec_id").orderBy("d2", "cid")
        a = (
            d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid")
        )
        c = (
            a.join(v, on="vec_id")
            .groupBy("cid", "dim")
            .agg(F.round(F.avg("val"), 6).alias("val"))
        )
        a_last = a
    members = a_last.groupBy("cid").agg(F.count("*").alias("n_members"))
    return (
        c.groupBy("cid")
        .agg(F.round(F.sum("val"), 4).alias("centroid_checksum"))
        .join(members, on="cid")
        .select("cid", "n_members", "centroid_checksum")
    )


@register(
    "json_permissive_corrupt_capture",
    oracle="""
    SELECT (doc_id % 7 = 0) AS is_corrupt, count(*) AS n,
           sum(CASE WHEN doc_id % 7 <> 0 THEN n_chars END) AS good_chars
    FROM documents GROUP BY 1
    """,
)
def json_permissive_corrupt_capture(spark, sf_dir):
    """PERMISSIVE mode + columnNameOfCorruptRecord: the source-level
    dead-letter port. Malformed JSONL lines survive as NULL-parsed rows
    carrying the raw line in `_bad`, so the stream splits into a good
    port and an auditable error port — the exact semantics of the
    reference's emitError channel (PythonEvaluator.java:198-207) pushed
    down into the scan. Same deterministic fixture as
    json_dropmalformed_source (every 7th line truncated; shared setup
    in sources/fixtures.py); the audit aggregate proves no row was
    silently lost: good + corrupt counts reconcile to the corpus."""
    from python_plugins_spark.sources.fixtures import corrupt_jsonl

    path = corrupt_jsonl(sf_dir, variant="corrupt_perm")
    raw = (
        spark.read.schema("doc_id bigint, n_chars bigint, _bad string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(path)
    )
    return (
        raw.groupBy(F.col("_bad").isNotNull().alias("is_corrupt"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("_bad").isNull(), F.col("n_chars"))).alias("good_chars"),
        )
    )


@register(
    "array_sort_comparator",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS t
        FROM documents WHERE doc_id < 80 AND length(trim(text)) > 0
    )
    SELECT doc_id,
           array_to_string(list_transform(
               list_sort(list_transform(t,
                   s -> lpad(CAST(length(s) AS VARCHAR), 4, '0') || s)),
               k -> k[5:]), ' ') AS by_len
    FROM toks
    """,
)
def array_sort_comparator(spark, sf_dir):
    """array_sort with a CUSTOM comparator lambda (length asc, then
    lexicographic) — the in-row ordering surface for array columns; the
    comparator runs inside codegen, no UDF. DuckDB has no comparator
    lambdas, so the oracle proves cross-engine semantics via the
    classic key-decoration trick (prefix a zero-padded length key, sort,
    strip) — same order, two formulations. Dedup first (list_distinct)
    so ties are only between distinct equal-length tokens, fully
    resolved by the lexicographic tiebreak."""
    docs = (
        load_table(spark, "documents", sf_dir)
        .filter((F.col("doc_id") < 80) & (F.length(F.trim("text")) > 0))
    )
    t = F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
    cmp_ = lambda l, r: (
        F.when(F.length(l) < F.length(r), -1)
        .when(F.length(l) > F.length(r), 1)
        .when(l < r, -1)
        .when(l > r, 1)
        .otherwise(0)
    )
    return docs.select(
        "doc_id",
        F.array_join(F.array_sort(t, cmp_), " ").alias("by_len"),
    )


@register(
    "bigram_perplexity_docs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    bg AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
        WHERE len(t) >= 2
    ),
    cab AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2),
    ca AS (SELECT w1, sum(c_ab) AS c_a FROM cab GROUP BY 1),
    vv AS (SELECT count(DISTINCT w2) AS v FROM cab)
    SELECT bg.doc_id,
           count(*) AS n_bigrams,
           round(avg(-ln((cab.c_ab + 1.0) / (ca.c_a + vv.v))), 4) AS nll
    FROM bg
    JOIN cab USING (w1, w2) JOIN ca USING (w1) CROSS JOIN vv
    WHERE bg.doc_id < 120
    GROUP BY bg.doc_id
    """,
)
def bigram_perplexity_docs(spark, sf_dir):
    """Per-document negative log-likelihood under a corpus bigram model
    with add-one smoothing — the KenLM-style fluency/quality filter
    (high NLL = gibberish or boilerplate-free outlier, the standard
    perplexity gate in pretraining pipelines). The corpus LM (bigram +
    unigram-mass tables) is built once from the same tokenization and
    joined back to each document's bigrams on (w1,w2) — at 100 TB the
    LM tables are the small side (vocabulary-bounded) and broadcast,
    so scoring stays a map-side pipeline over the corpus scan. Scoring
    restricted to doc_id<120 keeps the gate payload bounded; the model
    is always corpus-wide."""
    docs = load_table(spark, "documents", sf_dir)
    toks = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("t"))
        .filter(F.size("t") >= 2)
    )
    bg = toks.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"), "t"
    ).select(
        "doc_id",
        F.element_at("t", F.col("i")).alias("w1"),
        F.element_at("t", F.col("i") + 1).alias("w2"),
    )
    bg = bg.persist()  # model build + scoring share one tokenization pass
    cab = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_ab"))
    ca = cab.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    v = cab.select(F.countDistinct("w2").alias("v")).first()[0]
    nll = -F.log((F.col("c_ab") + 1.0) / (F.col("c_a") + F.lit(float(v))))
    return (
        bg.filter(F.col("doc_id") < 120)
        .join(cab, on=["w1", "w2"])
        .join(ca, on="w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(nll), 4).alias("nll"),
        )
    )


@register(
    "chi_square_independence",
    oracle="""
    WITH obs AS (
        SELECT event_type, user_id % 3 AS ubucket, count(*)::DOUBLE AS o
        FROM events GROUP BY 1, 2
    ),
    margins AS (
        SELECT o.*,
               sum(o.o) OVER (PARTITION BY event_type) AS row_tot,
               sum(o.o) OVER (PARTITION BY ubucket) AS col_tot,
               sum(o.o) OVER () AS n
        FROM obs o
    )
    SELECT round(sum((o - row_tot * col_tot / n) * (o - row_tot * col_tot / n)
                     / (row_tot * col_tot / n)), 6) AS chi2,
           count(*) AS n_cells
    FROM margins
    """,
)
def chi_square_independence(spark, sf_dir):
    """Chi-square test of independence (event_type x user-bucket
    contingency table) computed relationally: observed counts in one
    partial-agg shuffle, expected counts from row/column/grand margins
    as three windows over the TINY contingency table (cells =
    |types| x |buckets|, never the event count), then one fold to the
    statistic. The pattern behind drift detection and
    feature-association screening at corpus scale: all heavy lifting
    is the one groupBy; everything after runs on cells."""
    ev = load_table(spark, "events", sf_dir)
    obs = (
        ev.groupBy("event_type", (F.col("user_id") % 3).alias("ubucket"))
        .agg(F.count("*").cast("double").alias("o"))
    )
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("ubucket")
    w_all = Window.partitionBy()
    m = obs.select(
        "o",
        F.sum("o").over(w_row).alias("row_tot"),
        F.sum("o").over(w_col).alias("col_tot"),
        F.sum("o").over(w_all).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return m.agg(
        F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6).alias("chi2"),
        F.count("*").alias("n_cells"),
    )


# =====================================================================
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
        .localCheckpoint()
    )
    for _ in range(ROUNDS):
        deg = (
            edges.select(F.explode(F.array("a", "b")).alias("node"))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        # checkpoint the (tiny) keep-set: both broadcast semi-joins
        # would otherwise independently recompute the degree aggregate
        keep = deg.filter(F.col("deg") >= K).select("node").localCheckpoint()
        edges = (
            edges.join(
                F.broadcast(keep.withColumnRenamed("node", "a")), "a", "left_semi"
            )
            .join(F.broadcast(keep.withColumnRenamed("node", "b")), "b", "left_semi")
            .localCheckpoint()
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
    st = st.persist()  # vocab table feeds sizes + both join sides
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
        SELECT value AS v,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g2
        FROM events
        WHERE event_type IN ('click', 'view') AND value IS NOT NULL
    ),
    pv AS (SELECT v, sum(g1) AS d1, sum(g2) AS d2 FROM s GROUP BY v),
    t AS (SELECT sum(d1) AS n1, sum(d2) AS n2 FROM pv),
    c AS (
        SELECT sum(d1) OVER (ORDER BY v) AS c1,
               sum(d2) OVER (ORDER BY v) AS c2
        FROM pv
    )
    SELECT round(max(abs(c1 * 1.0 / (SELECT n1 FROM t) - c2 * 1.0 / (SELECT n2 FROM t))), 6) AS ks_d,
           (SELECT n1 FROM t) AS n1,
           (SELECT n2 FROM t) AS n2
    FROM c
    """,
)
def ks_two_sample_events(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic between the `value`
    distributions of click vs view events — the drift detector a
    training pipeline runs between yesterday's and today's feature
    snapshots. Distributed shape: per-value counts FIRST (groupBy v —
    full map-side combine, ties collapsed), then one ordered window
    over the (much smaller) distinct-value set for the running ECDFs.
    At 100 TB the distinct grid, not the raw stream, pays the global
    sort; if even that is too wide, quantize v to a fixed grid first
    (binned-ECDF KS upper-bounds the error by the bin mass)."""
    ev = load_table(spark, "events", sf_dir)
    s = ev.filter(F.col("event_type").isin("click", "view") & F.col("value").isNotNull()).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g1"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("g2"),
    )
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
# Graph extensions: bounded BFS reachability, structural similarity
# =====================================================================

_GRAPH_EDGE_EXPR = "(json_extract_string(props, '$.k')::BIGINT * 7) % 150"


@register(
    "bfs_reachable_hops",
    oracle=f"""
    WITH RECURSIVE edges AS (
        SELECT DISTINCT user_id AS src, {_GRAPH_EDGE_EXPR} AS dst
        FROM events WHERE user_id <> {_GRAPH_EDGE_EXPR}
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    walk(node, d) AS (
        SELECT node, 0 FROM nodes WHERE node % 50 = 0
        UNION
        SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.d < 4
    )
    SELECT node, min(d) AS hops FROM walk GROUP BY node
    """,
)
def bfs_reachable_hops(spark, sf_dir):
    """Bounded breadth-first reachability: minimum hop count (<= 4)
    from a deterministic seed set (node % 50 == 0) over the event
    graph. Spark runs the textbook frontier loop — each hop is one
    src-keyed join + union; the final min-groupBy collapses duplicate
    discoveries. Same co-location argument as PageRank: persist edges
    partitioned by src and every hop's join is shuffle-free. The
    oracle is a depth-bounded recursive CTE with set (UNION) semantics
    so the walk stays polynomial. Lineage grows per hop — checkpoint
    the frontier every few iterations in a deep traversal."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    dst = (k * 7) % 150
    edges = (
        ev.select(F.col("user_id").alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    frontier = nodes.filter(F.col("node") % 50 == 0).select(
        "node", F.lit(0).alias("d")
    )
    reached = frontier
    for hop in range(1, 5):
        frontier = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), F.lit(hop).alias("d"))
            .distinct()
        )
        reached = reached.union(frontier)
    return reached.groupBy("node").agg(F.min("d").cast("long").alias("hops"))


@register(
    "node_jaccard_neighbors",
    oracle=f"""
    WITH e0 AS (
        SELECT DISTINCT user_id AS a, {_GRAPH_EDGE_EXPR} AS b
        FROM events WHERE user_id <> {_GRAPH_EDGE_EXPR}
    ),
    und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM e0),
    adj AS (SELECT u AS node, v AS nbr FROM und UNION SELECT v, u FROM und),
    deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
    inter AS (
        SELECT x.node AS a, y.node AS b, count(*) AS n_common
        FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
        GROUP BY x.node, y.node
    )
    SELECT i.a, i.b, i.n_common,
           round(i.n_common * 1.0 / (da.d + db.d - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN deg da ON da.node = i.a
    JOIN deg db ON db.node = i.b
    WHERE i.n_common * 1.0 / (da.d + db.d - i.n_common) >= 0.2
    """,
)
def node_jaccard_neighbors(spark, sf_dir):
    """Structural (neighbor-set Jaccard) node similarity over the
    undirected event graph — the link-prediction / entity-resolution
    primitive. The candidate generation is the wedge join (adjacency
    self-joined on the shared neighbor), which enumerates exactly the
    pairs with n_common >= 1 instead of all O(V^2) pairs — the same
    blocking idea as MinHash-LSH banding, here exact. Skew warning at
    scale: a celebrity node of degree D contributes D^2 wedges;
    cap/salt hub neighbors (or drop top-0.01% degree nodes) before the
    self-join, exactly as the LSH path caps bucket width."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    dst = (k * 7) % 150
    e0 = (
        ev.select(F.col("user_id").alias("a"), dst.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = e0.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    adj = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).union(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count("*").alias("d"))
    x = adj.alias("x")
    y = adj.alias("y")
    inter = (
        x.join(y, (F.col("x.nbr") == F.col("y.nbr")) & (F.col("x.node") < F.col("y.node")))
        .groupBy(F.col("x.node").alias("a"), F.col("y.node").alias("b"))
        .agg(F.count("*").alias("n_common"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    j = F.col("n_common") / (F.col("da") + F.col("db") - F.col("n_common"))
    return (
        inter.join(da, "a")
        .join(db, "b")
        .filter(j >= 0.2)
        .select("a", "b", "n_common", F.round(j, 6).alias("jaccard"))
    )


# =====================================================================
# Corpus reporting & containment dedup & imputation & communities
# =====================================================================

@register(
    "dataset_card_by_source",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           sum(len({OF.sql_tokens("text")})) AS total_tokens,
           round(avg(n_chars), 4) AS avg_chars,
           round(1.0 - count(DISTINCT {D.sql_fingerprint("text")}) * 1.0 / count(*), 6) AS dup_rate
    FROM documents GROUP BY source
    """,
)
def dataset_card_by_source(spark, sf_dir):
    """The per-source "dataset card" rollup a training-data pipeline
    publishes with every corpus release: document count, language
    spread, total whitespace-token volume, mean length, and the
    exact-duplicate rate (1 - distinct normalized-fingerprints /
    docs). One hash aggregate over the corpus; the two count-DISTINCTs
    expand into a single multi-distinct plan. At 100 TB, swap the
    distincts for approx_count_distinct (HLL) and this becomes a
    single map-side-combinable pass — the exact version here is the
    audit-grade variant."""
    from python_plugins_spark.functions import tokens

    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(
            "source",
            "lang",
            "n_chars",
            F.size(tokens(F.col("text"))).alias("n_tok"),
            D.fingerprint_col(F.col("text")).alias("fp"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(
                1.0 - F.countDistinct("fp") * F.lit(1.0) / F.count("*"), 6
            ).alias("dup_rate"),
        )
    )


@register(
    "ngram_containment_pairs",
    # exact all-pairs containment via inverted-index join (a zero-
    # overlap pair can never reach a positive threshold — value-
    # identical to the CROSS JOIN form, tractable oracle)
    oracle=f"""
    WITH _tok AS (SELECT doc_id, {OF.sql_tokens("text")} AS t FROM documents),
    _sh AS (SELECT doc_id, list_distinct({OF.sql_word_shingles("t", 3)}) AS s FROM _tok),
    _nz AS (SELECT * FROM _sh WHERE len(s) > 0),
    _ex AS (SELECT doc_id AS id, unnest(s) AS g FROM _nz),
    _int AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
      FROM _ex a JOIN _ex b ON a.g = b.g AND a.id <> b.id
      GROUP BY 1, 2
    ),
    _n AS (SELECT doc_id AS id, len(s) AS n FROM _nz)
    SELECT i.id_a, i.id_b,
           round(i.inter::DOUBLE / la.n::DOUBLE, 6) AS containment
    FROM _int i JOIN _n la ON la.id = i.id_a
    WHERE round(i.inter::DOUBLE / la.n::DOUBLE, 6) >= 0.6
    """,
)
def ngram_containment_pairs(spark, sf_dir):
    """Candidate-fed directional containment: EXACT prefix-filter
    candidate generation (PPJoin-style rarest-first prefixes — no
    crossJoin, no recall loss) + containment verification restricted
    to candidate pairs. The brute-force all-pairs form lives only in
    the oracle SQL; the hash match proves the prefix filter's
    exactness on real data."""
    docs = load_table(spark, "documents", sf_dir)
    return D.ngram_containment_pairs(docs, "text", "doc_id", 0.6, shingle=3)


@register(
    "locf_carry_forward",
    oracle=f"""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL 1 hour, min(ts)) AS lo,
             time_bucket(INTERVAL 1 hour, max(ts)) AS hi
      FROM events
    ),
    slots AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 hour)) AS slot FROM bounds),
    agg AS (
      SELECT time_bucket(INTERVAL 1 hour, ts) AS slot,
             round(sum(value), 4) AS total_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    joined AS (
      SELECT s.slot, a.total_value FROM slots s LEFT JOIN agg a ON s.slot = a.slot
    )
    SELECT strftime(slot, '{_STRF}') AS slot,
           coalesce(last_value(total_value IGNORE NULLS) OVER (
               ORDER BY slot ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 0.0) AS filled_value,
           (total_value IS NULL) AS was_imputed
    FROM joined
    """,
)
def locf_carry_forward(spark, sf_dir):
    """Last-observation-carried-forward imputation over the hourly
    spine — the other half of gap_fill_timeseries (zero-fill vs
    carry-forward), i.e. TimescaleDB's `locf()` gapfill mode. The
    carry is `last(value, ignorenulls=True)` over an ordered running
    frame; on the one-row-per-hour spine the global order is cheap at
    any corpus scale (partition by series key when there are many
    series). `was_imputed` keeps the imputation auditable."""
    ev = load_table(spark, "events", sf_dir)
    agg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("slot"))
        .agg(F.round(F.sum("value"), 4).alias("total_value"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("slot")
    )
    w = Window.orderBy("slot").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(agg, on="slot", how="left")
        .select(
            _ts(F.col("slot")).alias("slot"),
            F.coalesce(
                F.last("total_value", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("filled_value"),
            F.col("total_value").isNull().alias("was_imputed"),
        )
    )


def _label_prop_oracle_sql(iters: int = 4) -> str:
    """Loop-unrolled min-label propagation as chained CTEs (same
    pattern as the PageRank and k-means oracles): DuckDB runs the
    identical integer recurrence, so labels match exactly."""
    parts = [
        f"""WITH e0 AS (
        SELECT DISTINCT user_id AS a, {_GRAPH_EDGE_EXPR} AS b
        FROM events WHERE user_id <> {_GRAPH_EDGE_EXPR}
    )""",
        "und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM e0)",
        "adj AS (SELECT u AS node, v AS nbr FROM und UNION SELECT v, u FROM und)",
        "nodes AS (SELECT DISTINCT node FROM adj)",
        "l0 AS (SELECT node, node AS lbl FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"l{i + 1} AS (SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl "
            f"FROM l{i} n LEFT JOIN ("
            f"SELECT a.node, min(l.lbl) AS mn FROM adj a "
            f"JOIN l{i} l ON l.node = a.nbr GROUP BY a.node) m USING (node))"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, lbl AS community FROM l{iters}"
    )


@register("label_propagation_communities", oracle=_label_prop_oracle_sql())
def label_propagation_communities(spark, sf_dir):
    """Min-label propagation (4 synchronous rounds) over the
    undirected event graph — the cheap community/connected-component
    sketch: every node takes the minimum label among itself and its
    neighbors each round, so labels flood k hops in k rounds. Each
    round is one adjacency join + min-aggregate, the same src-keyed
    co-location story as PageRank/BFS; rounds to convergence ≈ graph
    diameter, and the fixed 4-round cut is what makes an exact
    unrolled oracle possible (the unbounded-correct variant is
    dedup.connected_components)."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    dst = (k * 7) % 150
    e0 = (
        ev.select(F.col("user_id").alias("a"), dst.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = e0.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    adj = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).union(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    labels = adj.select("node").distinct().select("node", F.col("node").alias("lbl"))
    for _ in range(4):
        nbr_min = (
            adj.join(labels.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node")
            .agg(F.min("lbl").alias("mn"))
        )
        labels = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce(F.col("mn"), F.col("lbl"))).alias("lbl"),
        )
    return labels.select("node", F.col("lbl").alias("community"))


@register(
    "observed_metrics_audit",
    oracle="""
    SELECT count(*) AS n_kept,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS kept_revenue,
           sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS n_urgent,
           round(max(o_totalprice), 4) AS max_price
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def observed_metrics_audit(spark, sf_dir):
    """Inline data-quality gate via Spark's Observation API: the
    metrics (row count, kept revenue, urgent-order count, max price)
    are accumulated ON the already-running pipeline pass — zero extra
    scans, unlike a separate audit query that re-reads the source. At
    100 TB that second scan is the entire cost of auditing; `observe`
    makes the audit free and the write-audit-publish gate (see
    write_audit_publish) can consume these metrics directly. The
    observed row is returned as a one-row DataFrame for the gate."""
    from pyspark.sql import Observation

    o = load_table(spark, "orders", sf_dir)
    obs = Observation("audit")
    kept = o.filter(F.col("o_orderstatus") == "O").observe(
        obs,
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("kept_revenue"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("n_urgent"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )
    # one action drives the pipeline; metrics ride along with it
    kept.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_kept"], m["kept_revenue"], m["n_urgent"], m["max_price"])],
        "n_kept long, kept_revenue double, n_urgent long, max_price double",
    )


@register(
    "readability_flesch_docs",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               len(str_split_regex(lower(trim(text)), '\\s+')) AS n_words,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
        FROM documents
    )
    SELECT doc_id,
           round(206.835
                 - 1.015 * (n_words::DOUBLE / ceil(n_words / 8.0))
                 - 84.6 * (n_syll::DOUBLE / n_words), 4) AS flesch
    FROM t WHERE n_words > 0
    """,
)
def readability_flesch_docs(spark, sf_dir):
    """Flesch reading-ease per document — the classic quality filter
    knob alongside quality_score. Syllables are approximated by
    vowel-group runs ([aeiouy]+), the standard cheap heuristic; the
    synthetic corpus carries no terminal punctuation (see
    sentence_split_docs), so sentences are deterministic 8-token
    pseudo-sentences (ceil(words/8)) — identical arithmetic in both
    engines. Pure narrow projection: no shuffle at all, perfectly
    scan-parallel at any corpus size."""
    t = F.lower(F.col("text"))
    n_words = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    n_syll = F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), 0))
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        "doc_id", n_words.alias("n_words"), n_syll.alias("n_syll")
    ).filter(F.col("n_words") > 0)
    flesch = (
        F.lit(206.835)
        - 1.015 * (F.col("n_words").cast("double") / F.ceil(F.col("n_words") / 8.0))
        - 84.6 * (F.col("n_syll").cast("double") / F.col("n_words"))
    )
    return base.select("doc_id", F.round(flesch, 4).alias("flesch"))


@register(
    "quality_tier_binning",
    oracle="""
    WITH q AS (
        WITH _t AS (SELECT doc_id, text AS txt, str_split_regex(lower(trim(text)), '\\s+') AS t FROM documents)
        SELECT doc_id,
               round(0.4 * least(len(t)::DOUBLE / 100.0, 1.0)
                   + 0.3 * (1.0 - length(regexp_replace(txt, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE / length(txt))
                   + 0.3 * least((len(list_filter(t, t -> list_contains(['the', 'a', 'and', 'of', 'to', 'in', 'is', 'it', 'that', 'for'], t)))::DOUBLE / len(t)::DOUBLE) * 5.0, 1.0), 6) AS quality
        FROM _t),
    toks AS (
        SELECT doc_id, len(str_split_regex(lower(trim(text)), '\\s+')) AS n_tok
        FROM documents
    ),
    tiered AS (
        SELECT q.doc_id, q.quality, t.n_tok,
               ntile(4) OVER (ORDER BY q.quality, q.doc_id) AS tier
        FROM q JOIN toks t ON q.doc_id = t.doc_id
    )
    SELECT tier, count(*) AS n_docs, sum(n_tok) AS total_tokens,
           round(avg(quality), 6) AS avg_quality
    FROM tiered GROUP BY tier
    """,
)
def quality_tier_binning(spark, sf_dir):
    """Quality-tier curriculum binning: quartile tiers over the total
    order (quality, doc_id), then token mass per tier — the "how much
    training data at each quality level" report that decides mixing
    weights.

    Scale formulation (no single-partition WindowExec): the ntile(4)
    the oracle runs is computed DISTRIBUTED — range-partition on the
    sort key, number rows locally per partition, shift by broadcast
    per-partition offsets (the global_sequence_orders pattern), then
    apply ntile's exact bucket arithmetic (first n%k tiles get one
    extra row) to the global rank. The fact data shuffles once; the
    only windows run on the 16-row per-partition count table."""
    from python_plugins_spark.operators.text import quality_score

    docs = load_table(spark, "documents", sf_dir)
    q = quality_score(docs, "text", "doc_id")
    toks = docs.select(
        "doc_id", F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n_tok")
    )
    part = _global_index_part(
        q.join(toks, "doc_id"), "quality", "doc_id"
    ).localCheckpoint(eager=True)
    counts = part.groupBy("pid").agg(F.count("*").alias("cnt"))
    # cumulative offsets via a triangular join on the 16-row count
    # table (broadcast both ways) — not even a reduced-input window,
    # so the plan carries zero single-partition WindowExec nodes
    c2 = counts.select(F.col("pid").alias("pid2"), F.col("cnt").alias("cnt2"))
    offsets = (
        counts.join(F.broadcast(c2), F.col("pid2") <= F.col("pid"))
        .groupBy("pid", "cnt")
        .agg(F.sum("cnt2").alias("cum"))
        .select("pid", (F.col("cum") - F.col("cnt")).alias("offset"))
        .crossJoin(F.broadcast(part.groupBy().agg(F.count("*").alias("n_total"))))
    )
    r = F.col("offset") + F.col("local_rn") + 1  # 1-based global rank
    n = F.col("n_total")
    base = F.floor(n / 4)
    rem = n % 4
    cut = rem * (base + 1)
    tier = (
        F.when(base == 0, r)
        .when(r <= cut, F.floor((r - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((r - 1 - cut) / base) + 1)
        .cast("int")
    )
    tiered = part.join(F.broadcast(offsets), "pid").select(
        "quality", "n_tok", tier.alias("tier")
    )
    return tiered.groupBy("tier").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


@register(
    "winnowing_fingerprints",
    oracle=f"""
    WITH _tok AS (SELECT doc_id, {OF.sql_tokens("text")} AS t FROM documents),
    _sh AS (SELECT doc_id, {OF.sql_word_shingles("t", 3)} AS s FROM _tok),
    _h AS (SELECT doc_id,
                  list_transform(s, x -> (('0x' || substr(md5(x), 1, 8))::UBIGINT)::BIGINT) AS hl
           FROM _sh WHERE len(s) >= 4),
    _w AS (
      SELECT doc_id, i AS pos, list_min(hl[i : i + 3]) AS fp
      FROM _h, LATERAL (SELECT unnest(generate_series(1, len(hl) - 3)) AS i)
    )
    SELECT doc_id, fp, min(pos)::BIGINT AS first_window
    FROM _w GROUP BY doc_id, fp
    """,
)
def winnowing_fingerprints(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS plagiarism-detection algorithm): hash every positional 3-gram,
    slide a window of 4 hashes, keep each window's minimum — guarantees
    any shared substring of >= (w + k - 1) tokens yields at least one
    shared fingerprint, at ~1/w the storage of full k-gram sets. The
    entire derivation is per-row array expressions (codegen, zero
    shuffles before the per-doc dedup aggregate) — the scale-relevant
    contrast with MinHash, which needs global permutation state."""
    from python_plugins_spark.functions import tokens, word_shingles

    K, W = 3, 4
    docs = load_table(spark, "documents", sf_dir)
    sh = word_shingles(tokens(F.col("text")), K)
    hashes = F.transform(
        sh, lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")
    )
    # materialize the hash array as a column BEFORE the sliding-window
    # pass: expression trees have no CSE across higher-order lambdas,
    # so slicing the raw `hashes` expression per window would re-run
    # the md5 array per window — O(n^2) hashing per document
    withh = docs.select("doc_id", hashes.alias("hl"))
    fps = F.when(
        F.size("hl") >= W,
        F.transform(
            F.sequence(F.lit(1), F.size("hl") - (W - 1)),
            lambda i: F.array_min(F.slice(F.col("hl"), i, W)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    exploded = withh.select("doc_id", F.posexplode(fps).alias("pos", "fp"))
    return exploded.groupBy("doc_id", "fp").agg(
        (F.min("pos") + 1).cast("long").alias("first_window")
    )


@register(
    "oov_rate_docs",
    oracle=f"""
    WITH _tok AS (SELECT doc_id, unnest({OF.sql_tokens("text")}) AS t FROM documents),
    _c AS (SELECT t, count(*) AS c FROM _tok GROUP BY t),
    _v AS (SELECT t FROM _c ORDER BY c DESC, t ASC LIMIT 500)
    SELECT doc_id, count(*) AS n_tok,
           round(1.0 - sum(CASE WHEN t IN (SELECT t FROM _v) THEN 1 ELSE 0 END)::DOUBLE
                 / count(*)::DOUBLE, 6) AS oov_rate
    FROM _tok GROUP BY doc_id
    """,
)
def oov_rate_docs(spark, sf_dir):
    """Tokenizer-vocabulary coverage gate: fraction of each document's
    tokens outside the corpus top-500 vocabulary (count desc, token asc
    tie-break — a total order, so both engines cut the same vocab).
    High OOV flags encoding damage, boilerplate markup, or
    out-of-domain text before it poisons tokenizer training. Scale
    shape: the vocabulary is a TakeOrderedAndProject top-k (heaps +
    driver merge of 500 rows) broadcast back to the exploded token
    stream — the corpus shuffles once for the per-doc aggregate."""
    from python_plugins_spark.functions import tokens

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    vocab = (
        tok.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("t").asc())
        .limit(500)
        .select("t", F.lit(1).alias("in_v"))
    )
    joined = tok.join(F.broadcast(vocab), on="t", how="left")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.round(
            1.0 - F.sum(F.coalesce(F.col("in_v"), F.lit(0))) / F.count("*"), 6
        ).alias("oov_rate"),
    )


@register(
    "pack_token_budget_bins",
    oracle=f"""
    WITH _n AS (
      SELECT source, doc_id, len({OF.sql_tokens("text")}) AS n_tok FROM documents
    ),
    _b AS (
      SELECT source, n_tok,
             floor(coalesce(sum(n_tok) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 8192)::BIGINT AS bin
      FROM _n
    )
    SELECT source, bin, count(*) AS n_docs, sum(n_tok) AS total_tokens
    FROM _b GROUP BY source, bin
    """,
)
def pack_token_budget_bins(spark, sf_dir):
    """Sequence packing for training: assign documents (in deterministic
    doc_id order within each source) to consecutive ~8192-token bins by
    cumulative token count — the batch-construction step that turns a
    ragged corpus into fixed-budget training sequences. The running sum
    is a window PARTITIONED by source (each source packs independently,
    so at 100 TB no single-partition sort exists); the bin report is
    one more aggregate on the same partitioning."""
    from python_plugins_spark.functions import tokens

    docs = load_table(spark, "documents", sf_dir)
    n = docs.select("source", "doc_id", F.size(tokens(F.col("text"))).alias("n_tok"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = n.select(
        "source",
        "n_tok",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / 8192)
        .cast("long")
        .alias("bin"),
    )
    return binned.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("total_tokens")
    )


# --------------------------------------------------------------------------
# mergeable sketches (operators/sketch.py): HLL + count-min, deterministic
# across engines so the oracle validates the approximate structure exactly
# --------------------------------------------------------------------------

def _sketch_mod():
    from python_plugins_spark.operators import sketch

    return sketch


@register(
    "hll_distinct_customers",
    oracle=None,  # set below (needs the module-level helper)
)
def hll_distinct_customers(spark, sf_dir):
    """Per-orderstatus distinct-customer estimate via the deterministic
    HyperLogLog sketch (operators/sketch.py): md5-hash registers,
    bin()-length ranks, exact-integer register sum. One map-side-
    combined aggregate; the shuffle carries <= groups x 1024 register
    rows no matter how large orders is — the sketch shape that makes
    distinct-counting a 100 TB corpus a metadata-sized problem."""
    SK = _sketch_mod()
    o = load_table(spark, "orders", sf_dir)
    regs = SK.hll_registers(o, "o_custkey", ["o_orderstatus"])
    return SK.hll_estimate(regs, ["o_orderstatus"]).select(
        "o_orderstatus", F.round("est", 4).alias("est_distinct")
    )


@register(
    "hll_merge_rollup",
    oracle=None,  # set below
)
def hll_merge_rollup(spark, sf_dir):
    """Mergeability proof, cross-engine: Spark builds ONE SKETCH PER
    ORDERPRIORITY and merges them (elementwise register max) into a
    global sketch; the DuckDB oracle computes the GLOBAL sketch
    directly. The value-hash match proves sketch merging is lossless —
    the property that lets a 100 TB pipeline keep per-day sketches and
    answer any date-range distinct query without rescanning."""
    SK = _sketch_mod()
    o = load_table(spark, "orders", sf_dir)
    per_group = SK.hll_registers(o, "o_custkey", ["o_orderpriority"])
    merged = SK.hll_merge(per_group)  # drop the group -> one global sketch
    return SK.hll_estimate(merged).select(F.round("est", 4).alias("est_distinct"))


@register(
    "countmin_priority_freq",
    oracle=None,  # set below
)
def countmin_priority_freq(spark, sf_dir):
    """Count-min frequency sketch (4 x 256 md5-derived counters) built
    over orders, probed for every priority value. All-integer and
    mergeable by counter sum; the probe join broadcasts the KB-sized
    sketch. Estimates upper-bound true counts (collisions only ever
    inflate), which the sanity pytest asserts."""
    SK = _sketch_mod()
    o = load_table(spark, "orders", sf_dir)
    sk = SK.cm_sketch(o, "o_orderpriority")
    items = o.select("o_orderpriority").distinct()
    return SK.cm_point_estimate(sk, items, "o_orderpriority").select(
        "o_orderpriority", F.col("est").alias("est_freq")
    )


def _install_sketch_oracles():
    from python_plugins_spark.operators import sketch as SK

    ORACLES["hll_distinct_customers"] = f"""
        SELECT o_orderstatus, round(est, 4) AS est_distinct
        FROM ({SK.hll_oracle_sql("orders", "o_custkey", ["o_orderstatus"])})
    """
    ORACLES["hll_merge_rollup"] = f"""
        SELECT round(est, 4) AS est_distinct
        FROM ({SK.hll_oracle_sql("orders", "o_custkey")})
    """
    ORACLES["countmin_priority_freq"] = f"""
        SELECT o_orderpriority, est AS est_freq
        FROM ({SK.cm_oracle_sql("orders", "o_orderpriority",
                                "SELECT DISTINCT o_orderpriority FROM orders",
                                "o_orderpriority")})
    """


_install_sketch_oracles()


# =====================================================================
# Retrieval suite (operators/retrieval.py): BM25, SemDeDup, RRF hybrid
# =====================================================================

def _install_retrieval_queries():
    from python_plugins_spark.operators import retrieval as RV

    @register(
        "bm25_topk_docs",
        oracle=RV.bm25_topk_oracle_sql("documents", "text", "doc_id"),
    )
    def bm25_topk_docs(spark, sf_dir):
        """Okapi BM25 top-10 docs for the corpus's 5 highest-df terms —
        the lexical-retrieval workhorse as pure relational algebra (one
        tokenization pass -> tf/dl/df aggregates; broadcast query-term
        and corpus-stats relations; per-term ranking window). See
        operators/retrieval.py for the 100 TB argument."""
        docs = load_table(spark, "documents", sf_dir)
        return RV.bm25_topk(docs, "text", "doc_id")

    @register(
        "semantic_dedup_embeddings",
        oracle=RV.semantic_dedup_oracle_sql(
            "embeddings", "vec_id", "embedding", threshold=0.35, dim=64
        ),
    )
    def semantic_dedup_embeddings(spark, sf_dir):
        """SemDeDup-style semantic dedup: LSH-cluster embeddings, drop
        any vector with an earlier intra-cluster neighbor at cosine >=
        the threshold, keep the rest. Candidates come from a bucket
        equi-join (never crossJoin); decision is one aggregated
        anti-join. The synthetic embeddings have no true near-dups
        (max pairwise cosine ~0.51), so the threshold is 0.35 — low
        enough that the DROP path is actually exercised by the gate
        (9 drops at sf0.01), not vacuously green."""
        emb = load_table(spark, "embeddings", sf_dir)
        return RV.semantic_dedup(
            emb, "vec_id", "embedding", threshold=0.35, dim=64
        )

    @register(
        "hybrid_rrf_retrieval",
        oracle=RV.rrf_hybrid_oracle_sql(
            "documents", "embeddings", "doc_id", "text", "vec_id",
            "embedding", anchor_id=0,
        ),
    )
    def hybrid_rrf_retrieval(spark, sf_dir):
        """Reciprocal-rank-fusion hybrid retrieval for "documents like
        doc 0": lexical top-50 (token overlap with the anchor) fused
        with semantic top-50 (cosine to the anchor embedding) at
        1/(60+rank) each. Both lists are TakeOrdered limits, so no
        corpus-wide single-partition window exists in the plan."""
        docs = load_table(spark, "documents", sf_dir)
        emb = load_table(spark, "embeddings", sf_dir)
        return RV.rrf_hybrid(
            docs, emb, "doc_id", "text", "vec_id", "embedding", anchor_id=0
        )


_install_retrieval_queries()


# =====================================================================
# Record linkage (operators/linkage.py): blocking + fuzzy verification
# =====================================================================

def _install_linkage_queries():
    from python_plugins_spark.operators import linkage as LK

    # Blocking design (the scale decision): customer names are a fixed
    # 9-digit zero-padded key behind a constant prefix. Splitting the
    # digits into thirds gives PIGEONHOLE-COMPLETE blocking for edit
    # distance <= 1: one edit damages at most one third, so two thirds
    # still match exactly — three passes, each an equi-join on
    # (nation, third_i, third_j), each block a handful of rows. The
    # first draft blocked on the 5-value market segment and produced
    # ~22M candidate pairs at sf0.1 (70 s of Levenshtein); this shape
    # produces thousands. Same recall guarantee, 3 orders cheaper.
    _AUG = (
        "(SELECT *, substr(c_name, 10, 3) AS nd1, substr(c_name, 13, 3) AS nd2, "
        "substr(c_name, 16, 3) AS nd3 FROM customer)"
    )
    _BLOCKS = [
        ["c_nationkey", "nd1", "nd2"],
        ["c_nationkey", "nd1", "nd3"],
        ["c_nationkey", "nd2", "nd3"],
    ]

    def _augmented(spark, sf_dir):
        c = load_table(spark, "customer", sf_dir)
        return c.withColumns(
            {
                "nd1": F.substring("c_name", 10, 3),
                "nd2": F.substring("c_name", 13, 3),
                "nd3": F.substring("c_name", 16, 3),
            }
        )

    @register(
        "fuzzy_match_customers",
        oracle=LK.fuzzy_pairs_oracle_sql(
            _AUG, "c_custkey", "c_name", _BLOCKS, max_dist=1
        ),
    )
    def fuzzy_match_customers(spark, sf_dir):
        """Entity-resolution candidate pairs: three pigeonhole blocking
        passes (nation + two of three name-digit thirds) union-deduped,
        then Levenshtein<=1 verification on candidates only — complete
        recall for same-nation single-edit matches with block sizes in
        the single digits (never an unblocked O(N^2) product)."""
        return LK.fuzzy_pairs(
            _augmented(spark, sf_dir), "c_custkey", "c_name", _BLOCKS, max_dist=1
        )

    @register(
        "entity_ids_customers",
        oracle=f"""
        WITH pairs AS ({LK.fuzzy_pairs_oracle_sql(
            _AUG, "c_custkey", "c_name", _BLOCKS, max_dist=1)}),
        best AS (SELECT id_b AS id, min(id_a) AS entity_id FROM pairs GROUP BY 1)
        SELECT c.c_custkey, coalesce(b.entity_id, c.c_custkey) AS entity_id
        FROM customer c LEFT JOIN best b ON c.c_custkey = b.id
        """,
    )
    def entity_ids_customers(spark, sf_dir):
        """Greedy one-hop canonicalization of the verified match pairs:
        each record adopts the smallest id it fuzzy-matches (full
        transitive closure is the neardup_clusters operator)."""
        c = _augmented(spark, sf_dir)
        pairs = LK.fuzzy_pairs(c, "c_custkey", "c_name", _BLOCKS, max_dist=1)
        return LK.resolve_entities(pairs, c, "c_custkey")


_install_linkage_queries()


# =====================================================================
# Format conversion (sources/convert.py): Iceberg <-> Delta, zero-copy
# =====================================================================

def _install_convert_queries():
    @register(
        "convert_iceberg_to_delta_read",
        oracle="""
        SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_orderstatus
        """,
    )
    def convert_iceberg_to_delta_read(spark, sf_dir):
        """Zero-copy format migration: an Iceberg snapshot republished
        as Delta version 0 (hard-linked data files + one metadata
        commit — the public CONVERT TO DELTA shape), then read through
        the Delta layer and checked against the plain table."""
        import os
        import shutil

        from python_plugins_spark.sources.convert import convert_iceberg_to_delta
        from python_plugins_spark.sources.delta_py import read_delta
        from python_plugins_spark.sources.iceberg_py import write_iceberg

        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        tag = os.path.basename(sf_dir.rstrip("/"))
        ice = os.path.join(_SCRATCH, f"cvq_ice_{tag}")
        dlt = os.path.join(_SCRATCH, f"cvq_delta_{tag}")
        shutil.rmtree(ice, ignore_errors=True)
        shutil.rmtree(dlt, ignore_errors=True)
        write_iceberg(o, ice, mode="overwrite")
        convert_iceberg_to_delta(ice, dlt)
        back = read_delta(spark, dlt)
        return back.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
        )

    @register(
        "convert_delta_to_iceberg_read",
        oracle="""
        SELECT o_orderpriority, count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
        FROM orders GROUP BY o_orderpriority
        """,
    )
    def convert_delta_to_iceberg_read(spark, sf_dir):
        """The reverse migration (Iceberg's snapshot/migrate shape):
        a Delta snapshot republished as Iceberg v1 metadata over
        hard-linked files, read through the Iceberg layer."""
        import os
        import shutil

        from python_plugins_spark.sources.convert import convert_delta_to_iceberg
        from python_plugins_spark.sources.delta_py import write_delta
        from python_plugins_spark.sources.iceberg_py import read_iceberg

        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        tag = os.path.basename(sf_dir.rstrip("/"))
        dlt = os.path.join(_SCRATCH, f"cvq_delta_src_{tag}")
        ice = os.path.join(_SCRATCH, f"cvq_ice_dst_{tag}")
        shutil.rmtree(dlt, ignore_errors=True)
        shutil.rmtree(ice, ignore_errors=True)
        write_delta(o, dlt, mode="overwrite")
        convert_delta_to_iceberg(dlt, ice)
        back = read_iceberg(spark, ice)
        return back.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )


_install_convert_queries()


# =====================================================================
# ML-prep suite: hashing-trick features, target encoding, k-anonymity
# =====================================================================

@register(
    "feature_hashing_docs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(str_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    )
    SELECT doc_id, {OF.sql_hash32('term')} % 256 AS bucket, count(*) AS n
    FROM tok GROUP BY 1, 2
    """,
)
def feature_hashing_docs(spark, sf_dir):
    """Hashing-trick featurization (public Weinberger et al. 2009):
    token -> md5-derived bucket in a fixed 256-dim space, counts per
    (doc, bucket). No vocabulary pass, no driver state — the property
    that makes the trick THE featurizer at corpus scale (a dictionary
    encoder needs a global vocab build + broadcast; this is one
    map-side-combined aggregate)."""
    from python_plugins_spark.functions import hash32, tokens as _tokens

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    return tok.select(
        "doc_id", (hash32(F.col("term")) % 256).alias("bucket")
    ).groupBy("doc_id", "bucket").agg(F.count("*").alias("n"))


@register(
    "target_encoding_priority",
    oracle="""
    WITH g AS (SELECT avg(o_totalprice) AS gm FROM orders)
    SELECT o_orderpriority, count(*) AS n,
           round((sum(o_totalprice) + 10.0 * g.gm) / (count(*) + 10.0), 4) AS encoded
    FROM orders CROSS JOIN g
    GROUP BY o_orderpriority, g.gm
    """,
)
def target_encoding_priority(spark, sf_dir):
    """Smoothed target (mean) encoding — the categorical-feature
    workhorse: encoded = (sum_y + m*global_mean)/(n + m), m=10. The
    global mean arrives as a broadcast one-row relation, so the whole
    encoding is one hash aggregate + a map-side join; the category
    table it produces is broadcastable back onto the fact table."""
    o = load_table(spark, "orders", sf_dir)
    gm = o.agg(F.avg("o_totalprice").alias("gm"))
    return (
        o.crossJoin(F.broadcast(gm))
        .groupBy("o_orderpriority", "gm")
        .agg(
            F.count("*").alias("n"),
            F.round(
                (F.sum("o_totalprice") + 10.0 * F.first("gm")) / (F.count("*") + 10.0),
                4,
            ).alias("encoded"),
        )
        .select("o_orderpriority", "n", "encoded")
    )


@register(
    "k_anonymity_audit",
    oracle="""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
             count(*) AS class_size
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT class_size, count(*) AS n_classes,
           sum(class_size) AS n_records
    FROM classes GROUP BY class_size
    """,
)
def k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit over quasi-identifiers (nation, segment,
    account-balance bucket): the histogram of equivalence-class sizes.
    Rows in classes of size < k are re-identification risks a privacy
    review gates on before a dataset release; the audit is two hash
    aggregates, no joins."""
    c = load_table(spark, "customer", sf_dir)
    classes = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_bucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count("*").alias("class_size"))
    )
    return classes.groupBy("class_size").agg(
        F.count("*").alias("n_classes"),
        F.sum("class_size").alias("n_records"),
    )


# =====================================================================
# Streaming online dedup: state across micro-batches in a Delta table
# =====================================================================

@register(
    "streaming_online_dedup",
    oracle=D.dedup_exact_oracle_sql(
        "documents", ["text"], "doc_id", "doc_id, lang, source"
    ),
)
def streaming_online_dedup(spark, sf_dir):
    """Online corpus dedup — the streaming form of the ingest-time
    dedup every training-data pipeline runs: documents arrive in
    micro-batches, each batch is deduped within itself (min doc_id per
    content fingerprint) AND against the fingerprints of everything
    already accepted, and survivors append atomically to a Delta
    table that doubles as the dedup state. Batches are arrival-ordered
    (file mtimes), and waves are id-ranged so first-arrival == min-id,
    making the online result equal to the batch oracle. At scale the
    anti-join runs fingerprint-vs-fingerprint (two narrow columns) and
    the state table is just the survivor set — no extra state store.
    (Cross-batch removal on data with REAL cross-wave duplicates is
    exercised by tests/test_streaming.py::test_online_dedup_cross_batch.)"""
    import os

    from python_plugins_spark.streaming.ops import online_exact_dedup

    docs = load_table(spark, "documents", sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/"))
    return online_exact_dedup(
        spark, docs, "doc_id", "text", ["doc_id", "lang", "source"],
        os.path.join(_SCRATCH, f"online_dedup_{tag}"),
    )


# =====================================================================
# Persisted ANN index: build once into Delta, search many
# =====================================================================

@register(
    "ann_lsh_index_persisted",
    oracle=S.lsh_index_search_oracle_sql(
        "embeddings", "vec_id", "embedding", k=3, n_planes=8, dim=64
    ),
)
def ann_lsh_index_persisted(spark, sf_dir):
    """Build-once/search-many ANN: the (id, bucket, vector) LSH index
    is persisted as a Delta table, then every embedding queries it —
    bucket equi-join candidates, exact cosine re-rank, top-3. The
    search never touches the raw corpus; rebuilds are index-table
    overwrites (ACID swap). Deterministic planes make it oracle-
    checkable, unlike IVF."""
    import os
    import shutil

    emb = load_table(spark, "embeddings", sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/"))
    idx = os.path.join(_SCRATCH, f"lsh_index_{tag}")
    shutil.rmtree(idx, ignore_errors=True)
    S.build_lsh_index(emb, idx, "vec_id", "embedding", n_planes=8, dim=64)
    return S.search_lsh_index(
        spark, idx, emb, "vec_id", "embedding", k=3, n_planes=8, dim=64
    )



@register(
    "delta_check_constraint_gate",
    oracle="""
    SELECT count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_totalprice > 0
    """,
)
def delta_check_constraint_gate(spark, sf_dir):
    """Delta CHECK constraints (protocol 'delta.constraints.*' keys):
    ALTER ADD verifies existing rows with one aggregate; every later
    write enforces the predicate via an observation riding the staging
    write (zero extra passes), rejecting violating batches atomically.
    Here a violating append bounces off the gate and the table's
    contents provably still satisfy the constraint."""
    import os
    import shutil

    from python_plugins_spark.sources.delta_py import (
        DeltaConstraintViolationError, add_check_constraint, read_delta,
        write_delta,
    )

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    tag = os.path.basename(sf_dir.rstrip("/"))
    p = os.path.join(_SCRATCH, f"ck_gate_{tag}")
    shutil.rmtree(p, ignore_errors=True)
    write_delta(o.filter(F.col("o_totalprice") > 0), p, mode="overwrite")
    add_check_constraint(spark, p, "price_pos", "o_totalprice > 0")
    try:
        write_delta(
            o.limit(100).select("o_orderkey", (-F.col("o_totalprice")).alias("o_totalprice")),
            p, mode="append",
        )
        raise AssertionError("constraint gate did not fire")
    except DeltaConstraintViolationError:
        pass
    back = read_delta(spark, p)
    return back.agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "recursive_cte_amortization",
    oracle="""
    WITH RECURSIVE am(o_orderkey, p, bal_u, pay_u) AS (
      SELECT o_orderkey, 0,
             CAST(round(o_totalprice * 1000000, 0) AS BIGINT),
             (CAST(round(o_totalprice * 1000000, 0) AS BIGINT) * 53 + 600) // 1200
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL
      SELECT o_orderkey, p + 1, (bal_u * 1005 + 500) // 1000 - pay_u, pay_u
      FROM am WHERE p < 24 AND bal_u > 0
    )
    SELECT o_orderkey, max(p) AS periods,
           round(min(bal_u) / 1000000.0, 6) AS final_bal
    FROM am GROUP BY o_orderkey
    """,
)
def recursive_cte_amortization(spark, sf_dir):
    """WITH RECURSIVE (Spark 4 recursive CTEs): a 24-period
    amortization schedule — per-row state recurrence (balance
    compounds 0.5%/period, fixed payment subtracts, stop on payoff)
    that plain relational algebra cannot express without loop
    unrolling. Linear recursion: each step maps the previous step's
    rows 1:1, so depth bounds the work (rows x 25, no path explosion;
    Spark's UNION ALL recursion is safe here). The recurrence runs in
    exact integer micro-units (half-up via (n*1005+500) div 1000), so
    there is no per-step float rounding to diverge between engines —
    the float-tie lesson from the first draft of this query. The
    balance strictly decreases, so min(bal) is the final balance."""
    o = load_table(spark, "orders", sf_dir)
    view = "orders_rcte_v"
    o.createOrReplaceTempView(view)
    return spark.sql(f"""
      WITH RECURSIVE am(o_orderkey, p, bal_u, pay_u) AS (
        SELECT o_orderkey, 0,
               CAST(round(o_totalprice * 1000000, 0) AS BIGINT),
               (CAST(round(o_totalprice * 1000000, 0) AS BIGINT) * 53 + 600) DIV 1200
        FROM {view} WHERE o_orderkey % 100 = 0
        UNION ALL
        SELECT o_orderkey, p + 1, (bal_u * 1005 + 500) DIV 1000 - pay_u, pay_u
        FROM am WHERE p < 24 AND bal_u > 0
      )
      SELECT o_orderkey, max(p) AS periods,
             round(min(bal_u) / CAST(1000000 AS DOUBLE), 6) AS final_bal
      FROM am GROUP BY o_orderkey
    """)


@register(
    "wrangler_recipe_customers",
    oracle="""
    SELECT c_custkey AS cust_id, upper(c_mktsegment) AS segment,
           concat(substr(c_name, 1, length(c_name) - 4), '****') AS c_name,
           CAST(trunc(c_acctbal) AS BIGINT) AS bal_int,
           CASE WHEN c_acctbal >= 5000 THEN 'high' ELSE 'normal' END AS tier
    FROM customer WHERE c_nationkey < 10
    """,
)
def wrangler_recipe_customers(spark, sf_dir):
    """Directive-recipe data prep (operators/wrangler.py): six steps —
    filter, rename, uppercase, mask-last-n, set-type, set-column —
    compile into ONE Catalyst plan (no UDFs, no per-step
    materialization), so pushdown/pruning/codegen see through the
    whole recipe. The deploy-time-validation stance matches the
    transform operator: an unknown directive fails at compile."""
    from python_plugins_spark.operators.wrangler import wrangle

    c = load_table(spark, "customer", sf_dir)
    recipe = """
    # analyst-style prep recipe
    filter-rows-on "c_nationkey < 10"
    rename c_custkey cust_id
    uppercase c_mktsegment
    mask-last-n c_name 4
    set-column bal_int "CAST(c_acctbal AS BIGINT)"
    set-column tier "CASE WHEN c_acctbal >= 5000 THEN 'high' ELSE 'normal' END"
    keep cust_id c_mktsegment c_name bal_int tier
    rename c_mktsegment segment
    """
    return wrangle(c, recipe)


@register(
    "stream_stream_left_outer_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS p_user,
           c.event_id AS click_id
    FROM events p
    LEFT JOIN events c
      ON c.event_type = 'click' AND c.user_id = p.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts
    WHERE p.event_type = 'purchase'
    """,
)
def stream_stream_left_outer_join(spark, sf_dir):
    """Stream-stream LEFT OUTER join — the watermark-emission case the
    inner join never exercises: a purchase with no click in the
    preceding 10 min must still emit (with nulls), which Spark only
    does once the GLOBAL watermark passes the row's join window. A
    sentinel second micro-batch (one far-future row per side, filtered
    back out) advances both sides' watermarks so every unmatched row
    flushes; without it the one-batch drain would silently degrade to
    an inner join. State stays bounded by the same watermark that
    gates emission."""
    import os
    import shutil
    import time as _time
    import uuid

    from python_plugins_spark.sources.io import ensure_session_confs
    from python_plugins_spark.streaming import run_to_memory_sink

    ensure_session_confs(spark)
    ev = load_table(spark, "events", sf_dir)
    max_ts = ev.agg(F.max("ts")).first()[0]
    tag = os.path.basename(sf_dir.rstrip("/"))
    waves = os.path.join(_SCRATCH, f"ssoj_waves_{tag}")
    shutil.rmtree(waves, ignore_errors=True)
    os.makedirs(waves)

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    base = ev.select(*cols)
    tmp = os.path.join(_SCRATCH, f"ssoj_tmp_{tag}")
    shutil.rmtree(tmp, ignore_errors=True)
    base.coalesce(1).write.mode("overwrite").parquet(tmp)
    now = _time.time()
    i = 0
    for f in sorted(os.listdir(tmp)):
        if f.endswith(".parquet"):
            dst = os.path.join(waves, f"wave0_{i}.parquet")
            os.replace(os.path.join(tmp, f), dst)
            os.utime(dst, (now, now))
            i += 1
    shutil.rmtree(tmp, ignore_errors=True)
    # sentinel wave: one far-future row per side, ids < 0, so both
    # streams' watermarks advance past every real join window
    import datetime as _dt

    far = max_ts + _dt.timedelta(hours=2)
    sent = spark.createDataFrame(
        [(-1, far, -1, "purchase", 0.0, "{}"), (-2, far, -2, "click", 0.0, "{}")],
        base.schema,
    )
    sent.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dst = os.path.join(waves, "wave1.parquet")
    os.replace(os.path.join(tmp, part), dst)
    os.utime(dst, (now + 20, now + 20))
    shutil.rmtree(tmp, ignore_errors=True)

    def stream():
        return (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(waves)
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
        "leftOuter",
    ).select("purchase_id", "p_user", "click_id")
    name = f"ssoj_{uuid.uuid4().hex[:8]}"
    out = run_to_memory_sink(joined, name, output_mode="append", state_partitions=4)
    return out.filter(F.col("p_user") >= 0)


@register(
    "iceberg_stream_source_read",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def iceberg_stream_source_read(spark, sf_dir):
    """Iceberg table as a STREAMING SOURCE (sources/iceberg_stream.py
    — format twin of the Delta streaming source): offsets are snapshot
    ids, micro-batch planning opens each snapshot's own immutable
    metadata and keeps only manifests added by that snapshot, and each
    added data file becomes one executor-side pyarrow task. Two append
    snapshots land first; the drained memory-sink table must equal the
    batch aggregate."""
    import os
    import shutil
    import uuid

    from python_plugins_spark.sources import iceberg_stream
    from python_plugins_spark.sources.iceberg_py import write_iceberg
    from python_plugins_spark.sources.io import ensure_session_confs

    ensure_session_confs(spark)
    iceberg_stream.register(spark)
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    table = os.path.join(
        _SCRATCH, f"istream_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(table, ignore_errors=True)
    write_iceberg(o.filter(F.col("o_orderkey") % 2 == 0), table, mode="overwrite")
    write_iceberg(o.filter(F.col("o_orderkey") % 2 == 1), table, mode="append")

    stream = (
        spark.readStream.format("iceberg_py_stream").option("path", table).load()
    )
    name = f"istream_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.table(name)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total")
    )


@register(
    "iceberg_stream_cdc_read",
    oracle="""
    SELECT 'insert' AS _change_type, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    UNION ALL
    SELECT 'delete', count(*), CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def iceberg_stream_cdc_read(spark, sf_dir):
    """Streaming CDC over an Iceberg table (iceberg_py_stream with
    readChangeFeed): the append snapshot streams as 'insert' rows, the
    position-delete snapshot streams the DELETED ROWS' VALUES as
    'delete' rows — planned from immutable snapshot metadata, read
    executor-side. Aggregated by change type against the batch
    oracle."""
    import os
    import shutil
    import uuid

    from python_plugins_spark.sources import iceberg_stream
    from python_plugins_spark.sources.iceberg_py import (
        delete_iceberg, write_iceberg,
    )
    from python_plugins_spark.sources.io import ensure_session_confs

    ensure_session_confs(spark)
    iceberg_stream.register(spark)
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    table = os.path.join(
        _SCRATCH, f"icdc_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(table, ignore_errors=True)
    write_iceberg(o, table, mode="overwrite")
    delete_iceberg(spark, table, "o_orderstatus = 'F'")

    stream = (
        spark.readStream.format("iceberg_py_stream")
        .option("path", table)
        .option("readChangeFeed", "true")
        .load()
    )
    name = f"icdc_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("_change_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


@register(
    "interleaved_multimodal_docs",
    oracle="""
    SELECT doc_id, 0 AS seq_no, 'text' AS kind,
           md5(substr(text, 1, CAST(floor(length(text) / 2) AS INT))) AS payload_ref
    FROM documents
    UNION ALL
    SELECT doc_id, 1, 'image', md5('img-' || doc_id) FROM documents
    UNION ALL
    SELECT doc_id, 2, 'text',
           md5(substr(text, CAST(floor(length(text) / 2) AS INT) + 1, length(text)))
    FROM documents
    """,
)
def interleaved_multimodal_docs(spark, sf_dir):
    """Interleaved multimodal sequence construction (the MMC4/OBELICS
    public recipe shape): each document becomes an ordered sequence of
    typed segments — text chunk, image slot, text chunk — flattened to
    (doc_id, seq_no, kind, payload_ref) rows so position and type
    survive the shuffle and the downstream packer can reassemble
    deterministically. Payloads are content-addressed (md5 refs) — the
    binary image bytes live in the multimodal suite's BinaryType
    plumbing; here the JOIN-KEY layer is what's exercised. Pure
    expressions, one projection per segment kind, no UDFs."""
    docs = load_table(spark, "documents", sf_dir)
    half = F.floor(F.length("text") / 2).cast("int")
    text_col = F.col("text")
    t0 = docs.select(
        "doc_id",
        F.lit(0).cast("int").alias("seq_no"),
        F.lit("text").alias("kind"),
        F.md5(text_col.substr(F.lit(1), half)).alias("payload_ref"),
    )
    t1 = docs.select(
        "doc_id",
        F.lit(1).cast("int").alias("seq_no"),
        F.lit("image").alias("kind"),
        F.md5(F.concat(F.lit("img-"), F.col("doc_id").cast("string"))).alias(
            "payload_ref"
        ),
    )
    t2 = docs.select(
        "doc_id",
        F.lit(2).cast("int").alias("seq_no"),
        F.lit("text").alias("kind"),
        F.md5(text_col.substr(half + 1, F.length("text"))).alias("payload_ref"),
    )
    return t0.unionByName(t1).unionByName(t2)


@register(
    "delta_cdc_stream_partitioned_read",
    oracle="""
    SELECT 'insert' AS _change_type, o_orderpriority, count(*) AS n
    FROM orders GROUP BY 2
    UNION ALL
    SELECT 'delete', o_orderpriority, count(*)
    FROM orders WHERE o_orderkey % 10 = 0 GROUP BY 2
    """,
)
def delta_cdc_stream_partitioned_read(spark, sf_dir):
    """CDC stream over a hive-PARTITIONED Delta table: inserts and
    deletion-vector deletes emit with the partition column reattached
    executor-side (data files omit it per the protocol). Aggregated by
    change type and partition value against the batch oracle — so the
    gate checks the reassembled partition values, not just row
    counts."""
    import os
    import shutil
    import uuid

    from python_plugins_spark.sources import delta_stream
    from python_plugins_spark.sources.delta_py import delete_delta, write_delta
    from python_plugins_spark.sources.io import ensure_session_confs

    ensure_session_confs(spark)
    delta_stream.register(spark)
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    table = os.path.join(
        _SCRATCH, f"cdcp_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(table, ignore_errors=True)
    write_delta(o, table, mode="overwrite", partition_by=["o_orderpriority"])
    delete_delta(spark, table, "o_orderkey % 10 = 0", mode="dv")

    stream = (
        spark.readStream.format("delta_py_stream")
        .option("path", table)
        .option("readChangeFeed", "true")
        .load()
    )
    name = f"cdcp_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("_change_type", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@register(
    "pipeline_spec_end_to_end",
    oracle="""
    WITH ev AS (
      SELECT o_orderpriority, o_totalprice * 0.1 AS fee
      FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(fee AS DECIMAL(18,6))) AS DOUBLE) AS total_fee
    FROM ev GROUP BY o_orderpriority
    """,
)
def pipeline_spec_end_to_end(spark, sf_dir):
    """The host-platform surface the reference plugin lived inside: a
    JSON pipeline document (source -> filter -> PythonEvaluator-shaped
    transform -> groupBy aggregator -> sink) interpreted by
    python_plugins_spark.pipeline.run_pipeline. The whole DAG compiles
    to one Catalyst plan per sink; the python stage uses the
    reference's exact config keys (script/schema). A reference user's
    pipeline definition ports by renaming stage types."""
    import os
    import shutil

    from python_plugins_spark.pipeline import run_pipeline
    from python_plugins_spark.sources.delta_py import read_delta

    tag = os.path.basename(sf_dir.rstrip("/"))
    sink = os.path.join(_SCRATCH, f"pipe_sink_{tag}")
    shutil.rmtree(sink, ignore_errors=True)
    spec = {
        "stages": [
            {"name": "orders", "type": "batchsource.parquet",
             "config": {"path": f"{sf_dir}/orders.parquet"}},
            {"name": "open_only", "type": "transform.filter",
             "config": {"condition": "o_orderstatus = 'O'"}},
            {"name": "fee_eval", "type": "transform.python",
             "config": {
                 "script": (
                     "def transform(record, emitter, context):\n"
                     "    emitter.emit({'o_orderpriority': record['o_orderpriority'],\n"
                     "                  'fee': record['o_totalprice'] * 0.1})\n"
                 ),
                 "schema": "o_orderpriority string, fee double",
             }},
            {"name": "by_priority", "type": "batchaggregator.groupby",
             "config": {
                 "groupByFields": ["o_orderpriority"],
                 "aggregates": [
                     {"name": "n", "function": "count", "field": "*"},
                     {"name": "fee_dec", "function": "sum", "field": "fee_dec"},
                 ],
             }},
            {"name": "sink", "type": "batchsink.delta",
             "config": {"path": sink}},
        ],
        "connections": [
            {"from": "orders", "to": "open_only"},
            {"from": "open_only", "to": "fee_eval"},
            {"from": "fee_eval", "to": "cast_fee"},
            {"from": "cast_fee", "to": "by_priority"},
            {"from": "by_priority", "to": "sink"},
        ],
    }
    # exact-decimal convention for the whole-table-magnitude sum
    spec["stages"].insert(3, {
        "name": "cast_fee", "type": "transform.wrangler",
        "config": {"directives": ['set-column fee_dec "CAST(fee AS DECIMAL(18,6))"']},
    })
    run_pipeline(spark, spec)
    back = read_delta(spark, sink)
    return back.select(
        "o_orderpriority", "n", F.col("fee_dec").cast("double").alias("total_fee")
    )


@register(
    "pipeline_router_ports",
    oracle="""
    SELECT 'rich' AS port, count(*) AS n FROM customer WHERE c_acctbal >= 5000
    UNION ALL
    SELECT 'debt', count(*) FROM customer WHERE c_acctbal < 0
    UNION ALL
    SELECT 'default', count(*) FROM customer
    WHERE NOT (c_acctbal >= 5000) AND NOT (c_acctbal < 0)
    """,
)
def pipeline_router_ports(spark, sf_dir):
    """Router stage under the oracle gate: a pipeline document splits
    customers across named ports (first-match-wins; unmatched ->
    'default'), and the per-port cardinalities must equal the batch
    predicates. Ports wire downstream via port-qualified connections
    ('route.rich'), the multi-output shape the reference's error port
    pioneered."""
    from python_plugins_spark.pipeline import run_pipeline

    frames = run_pipeline(spark, {
        "stages": [
            {"name": "src", "type": "batchsource.parquet",
             "config": {"path": f"{sf_dir}/customer.parquet"}},
            {"name": "route", "type": "transform.router",
             "config": {"ports": [
                 {"port": "rich", "condition": "c_acctbal >= 5000"},
                 {"port": "debt", "condition": "c_acctbal < 0"},
             ]}},
        ],
        "connections": [{"from": "src", "to": "route"}],
    })
    parts = [
        frames["route.rich"].select(F.lit("rich").alias("port")),
        frames["route.debt"].select(F.lit("debt").alias("port")),
        frames["route.default"].select(F.lit("default").alias("port")),
    ]
    from functools import reduce

    allp = reduce(lambda a, b: a.unionByName(b), parts)
    return allp.groupBy("port").agg(F.count("*").alias("n"))


@register(
    "tokenizer_fertility_by_lang",
    oracle="""
    WITH t AS (
      SELECT lang,
             len(str_split_regex(lower(trim(text)), '\\s+')) AS n_words,
             len(regexp_extract_all(lower(text),
                 '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_tokens
      FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           sum(n_words) AS words, sum(n_tokens) AS tokens,
           round(sum(n_tokens)::DOUBLE / sum(n_words), 6) AS fertility
    FROM t GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark, sf_dir):
    """Tokenizer fertility (tokens per whitespace word) by language —
    the vocabulary-fit diagnostic multilingual-corpus builders track
    (a language with high fertility is under-served by the tokenizer
    and over-billed in the token budget). BPE-ish regex token count
    over one projection pass; two map-side-combined aggregates."""
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select(
        "lang",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n_words"),
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
            )
        ).alias("n_tokens"),
    )
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("long").alias("words"),
        F.sum("n_tokens").cast("long").alias("tokens"),
        F.round(
            F.sum("n_tokens").cast("double") / F.sum("n_words"), 6
        ).alias("fertility"),
    )


@register(
    "temperature_sampling_allocation",
    oracle="""
    WITH avail AS (
      SELECT source,
             sum(len(str_split_regex(lower(trim(text)), '\\s+'))) AS tokens
      FROM documents GROUP BY source
    ),
    scored AS (
      SELECT source, tokens, pow(tokens, 0.5) AS w FROM avail
    ),
    tot AS (SELECT sum(tokens) AS all_tokens, sum(w) AS all_w FROM scored)
    SELECT s.source, s.tokens AS available,
           CAST(floor(0.5 * t.all_tokens * s.w / t.all_w) AS BIGINT) AS allocated,
           round(CAST(floor(0.5 * t.all_tokens * s.w / t.all_w) AS BIGINT)
                 / s.tokens::DOUBLE, 6) AS epochs
    FROM scored s CROSS JOIN tot t
    """,
)
def temperature_sampling_allocation(spark, sf_dir):
    """Temperature-based mixture allocation (the public alpha=0.5
    sampling heuristic from multilingual pretraining): each source's
    share of a token budget (here 50% of the corpus) is proportional
    to tokens^alpha, up-weighting small sources without letting big
    ones dominate. The per-source token table is tiny and the corpus
    totals arrive as a broadcast one-row relation; `epochs` > 1 flags
    a source the budget would repeat. Floor in integer tokens keeps
    both engines' discrete allocations identical."""
    docs = load_table(spark, "documents", sf_dir)
    avail = (
        docs.select(
            "source",
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n"),
        )
        .groupBy("source")
        .agg(F.sum("n").alias("tokens"))
    )
    scored = avail.withColumn("w", F.pow(F.col("tokens"), 0.5))
    tot = scored.agg(
        F.sum("tokens").alias("all_tokens"), F.sum("w").alias("all_w")
    )
    out = scored.crossJoin(F.broadcast(tot))
    alloc = F.floor(
        0.5 * F.col("all_tokens") * F.col("w") / F.col("all_w")
    ).cast("long")
    return out.select(
        "source",
        F.col("tokens").alias("available"),
        alloc.alias("allocated"),
        F.round(alloc / F.col("tokens").cast("double"), 6).alias("epochs"),
    )
