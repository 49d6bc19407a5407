"""Physical-plan assertions: the properties that decide whether a
query survives a 100x scale-up — filters reaching the parquet scan,
column pruning, broadcast joins for small dims, no accidental
cartesian products, bounded shuffle counts."""

from pyspark.sql import functions as F

from python_plugins_spark.plans import (
    count_shuffles,
    has_broadcast_join,
    has_codegen,
    plan_str,
    scan_read_schema,
)
from python_plugins_spark.queries import QUERIES
from python_plugins_spark.sources.io import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = QUERIES["filter_project_pushdown"](spark, sf_dir)
    plan = plan_str(df)
    assert "PushedFilters" in plan
    # the quantity filter must be in the pushed set, not post-scan only
    assert "GreaterThanOrEqual(l_quantity,45" in plan.replace(" ", "").replace(
        "GreaterThanOrEqual(l_quantity,45.0", "GreaterThanOrEqual(l_quantity,45"
    )


def test_column_pruning(spark, sf_dir):
    df = QUERIES["filter_project_pushdown"](spark, sf_dir)
    schemas = scan_read_schema(df)
    assert schemas, "no file scan found"
    # 16-column lineitem must be pruned to the handful we read
    assert "l_comment" not in schemas[0]
    assert "l_returnflag" in schemas[0] or "l_orderkey" in schemas[0]


def test_q1_single_shuffle(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    # scan -> partial agg -> exchange -> final agg: exactly one shuffle
    assert count_shuffles(df) == 1


def test_q3_broadcasts_customer(spark, sf_dir):
    df = QUERIES["q3_top_orders"](spark, sf_dir)
    assert has_broadcast_join(df)


def test_q5_broadcasts_dims(spark, sf_dir):
    df = QUERIES["q5_region_revenue"](spark, sf_dir)
    plan = plan_str(df)
    assert plan.count("BroadcastHashJoin") >= 2


def test_broadcast_join_no_fact_shuffle(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    # broadcast join itself introduces no Exchange on the fact side
    assert count_shuffles(joined) == 0
    assert has_broadcast_join(joined)


def test_topk_no_global_sort(spark, sf_dir):
    df = QUERIES["global_top100_orders"](spark, sf_dir)
    assert "TakeOrderedAndProject" in plan_str(df)


def test_minhash_single_shuffle_for_signature(spark, sf_dir):
    from python_plugins_spark.operators.dedup import minhash_signature

    docs = load_table(spark, "documents", sf_dir)
    sig = minhash_signature(docs, "text", "doc_id")
    # lead-window and min-agg share one hash partitioning on doc_id
    assert count_shuffles(sig) <= 1


def test_whole_stage_codegen_on_agg(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    assert has_codegen(df)


def test_sessionize_one_shuffle(spark, sf_dir):
    df = QUERIES["sessionize_events"](spark, sf_dir)
    # both window passes and the final agg share the user_id partitioning
    assert count_shuffles(df) <= 2
