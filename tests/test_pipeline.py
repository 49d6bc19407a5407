"""Pipeline-spec runner (pipeline.py): DAG interpretation, lazy
compilation, multi-input joins, error ports, and deploy-time
validation of bad documents."""

import pytest
from pyspark.sql import functions as F

from python_plugins_spark.pipeline import PipelineSpecError, run_pipeline


def test_pipeline_join_and_projection(spark, sf_dir):
    spec = {
        "stages": [
            {"name": "cust", "type": "batchsource.parquet",
             "config": {"path": f"{sf_dir}/customer.parquet"}},
            {"name": "nat", "type": "batchsource.parquet",
             "config": {"path": f"{sf_dir}/nation.parquet"}},
            {"name": "nat_p", "type": "transform.projection",
             "config": {"rename": {"n_nationkey": "c_nationkey"},
                        "select": ["c_nationkey", "n_name"]}},
            {"name": "joined", "type": "batchjoiner",
             "config": {"joinKeys": ["c_nationkey"]}},
            {"name": "agg", "type": "batchaggregator.groupby",
             "config": {"groupByFields": ["n_name"],
                        "aggregates": [
                            {"name": "n", "function": "count", "field": "*"},
                            {"name": "max_bal", "function": "max",
                             "field": "c_acctbal"}]}},
        ],
        "connections": [
            {"from": "nat", "to": "nat_p"},
            {"from": "cust", "to": "joined"},
            {"from": "nat_p", "to": "joined"},
            {"from": "joined", "to": "agg"},
        ],
    }
    frames = run_pipeline(spark, spec)
    out = frames["agg"]
    got = {r.n_name: r.n for r in out.collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    want = {
        r.n_name: r.n
        for r in cust.join(
            nat, cust.c_nationkey == nat.n_nationkey
        ).groupBy("n_name").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_pipeline_python_stage_error_port(spark, sf_dir):
    spec = {
        "stages": [
            {"name": "src", "type": "batchsource.parquet",
             "config": {"path": f"{sf_dir}/orders.parquet"}},
            {"name": "ev", "type": "transform.python",
             "config": {
                 "script": (
                     "def transform(record, emitter, context):\n"
                     "    if record['o_orderkey'] % 100 == 0:\n"
                     "        emitter.emitError({'errorCode': 7,\n"
                     "                           'errorMsg': 'mod100',\n"
                     "                           'invalidRecord': record})\n"
                     "    else:\n"
                     "        emitter.emit(record)\n"
                 ),
                 "on_error": "route",
             }},
        ],
        "connections": [{"from": "src", "to": "ev"}],
    }
    frames = run_pipeline(spark, spec)
    n_src = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    n_out = frames["ev"].count()
    n_err = frames["ev.error"].count()
    assert n_out + n_err == n_src and n_err > 0


def test_pipeline_compile_time_validation(spark, sf_dir):
    src = {"name": "s", "type": "batchsource.parquet",
           "config": {"path": f"{sf_dir}/nation.parquet"}}
    with pytest.raises(PipelineSpecError, match="cycle"):
        run_pipeline(spark, {
            "stages": [src,
                       {"name": "a", "type": "transform.filter",
                        "config": {"condition": "1=1"}},
                       {"name": "b", "type": "transform.filter",
                        "config": {"condition": "1=1"}}],
            "connections": [{"from": "a", "to": "b"}, {"from": "b", "to": "a"}],
        })
    with pytest.raises(PipelineSpecError, match="unknown type"):
        run_pipeline(spark, {
            "stages": [src, {"name": "x", "type": "transform.frobnicate",
                             "config": {}}],
            "connections": [{"from": "s", "to": "x"}],
        })
    with pytest.raises(PipelineSpecError, match="input"):
        run_pipeline(spark, {
            "stages": [src, {"name": "j", "type": "batchjoiner",
                             "config": {"joinKeys": ["k"]}}],
            "connections": [{"from": "s", "to": "j"}],
        })
    with pytest.raises(PipelineSpecError, match="unknown stage"):
        run_pipeline(spark, {
            "stages": [src],
            "connections": [{"from": "ghost", "to": "s"}],
        })


def test_pipeline_single_fused_plan(spark, sf_dir):
    """Stages must compile into ONE plan: the filter stage's predicate
    reaches the parquet scan through the projection stage."""
    from python_plugins_spark.plans import plan_str

    frames = run_pipeline(spark, {
        "stages": [
            {"name": "src", "type": "batchsource.parquet",
             "config": {"path": f"{sf_dir}/customer.parquet"}},
            {"name": "proj", "type": "transform.projection",
             "config": {"select": ["c_custkey", "c_nationkey"]}},
            {"name": "flt", "type": "transform.filter",
             "config": {"condition": "c_nationkey < 5"}},
        ],
        "connections": [{"from": "src", "to": "proj"},
                        {"from": "proj", "to": "flt"}],
    })
    plan = plan_str(frames["flt"])
    assert "PushedFilters" in plan and "c_nationkey" in plan
