"""Retrieval suite (operators/retrieval.py): semantics + the plan
properties that make BM25 / SemDeDup / RRF survive a 100x scale-up —
candidate generation by equi-join only, top-N lists via
TakeOrderedAndProject (never a corpus-wide single-partition window),
broadcast scalar/query-term relations."""

from pyspark.sql import functions as F

from python_plugins_spark.plans import plan_str
from python_plugins_spark.queries import QUERIES
from python_plugins_spark.sources.io import load_table


def test_bm25_shape_and_monotone_rank(spark, sf_dir):
    df = QUERIES["bm25_topk_docs"](spark, sf_dir)
    rows = df.collect()
    # exactly 5 query terms, each with <= 10 ranked docs, ranks 1..n
    by_term = {}
    for r in rows:
        by_term.setdefault(r.query_term, []).append(r)
    assert len(by_term) == 5
    for term, rs in by_term.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.bm25 for r in rs]
        assert scores == sorted(scores, reverse=True), term
        assert all(s > 0 for s in scores)


def test_bm25_plan_scale_safe(spark, sf_dir):
    df = QUERIES["bm25_topk_docs"](spark, sf_dir)
    plan = plan_str(df)
    assert "CartesianProduct" not in plan
    # query-term relation must arrive by broadcast, and the 5-term
    # selection must be a TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan


def test_semantic_dedup_drops_only_true_neighbors(spark, sf_dir):
    from python_plugins_spark.functions import cosine_similarity

    df = QUERIES["semantic_dedup_embeddings"](spark, sf_dir)
    out = df.collect()
    emb = load_table(spark, "embeddings", sf_dir)
    assert len(out) == emb.count()  # one verdict per vector
    dropped = [r.vec_id for r in out if not r.kept]
    # the gate threshold is tuned so drops actually occur
    assert dropped, "expected the drop path to be exercised"
    if dropped:
        e = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
        a = e.select(F.col("id").alias("ia"), F.col("v").alias("va"))
        b = e.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
        sims = (
            a.join(b, F.col("ib") < F.col("ia"))
            .filter(F.col("ia").isin(dropped))
            .select(
                "ia",
                F.round(cosine_similarity(F.col("va"), F.col("vb")), 6).alias("c"),
            )
            .groupBy("ia")
            .agg(F.max("c").alias("mx"))
            .collect()
        )
        mx = {r.ia: r.mx for r in sims}
        for d in dropped:
            assert mx.get(d, 0.0) >= 0.35, d


def test_semantic_dedup_no_cartesian(spark, sf_dir):
    df = QUERIES["semantic_dedup_embeddings"](spark, sf_dir)
    plan = plan_str(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_rrf_fuses_both_lists_via_takeordered(spark, sf_dir):
    df = QUERIES["hybrid_rrf_retrieval"](spark, sf_dir)
    plan = plan_str(df)
    # both retriever lists and the final fuse are global top-N limits
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert all(r.doc_id != 0 for r in rows)  # anchor excluded
    rrfs = [r.rrf for r in rows]
    assert rrfs == sorted(rrfs, reverse=True)
    # a doc ranked in both lists must outscore one ranked in neither
    both = [r for r in rows if r.r_lex is not None and r.r_sem is not None]
    assert both, "expected at least one doc present in both lists"


# ---------------------------------------------------- record linkage

def test_fuzzy_pairs_blocked_no_cartesian(spark, sf_dir):
    df = QUERIES["fuzzy_match_customers"](spark, sf_dir)
    plan = plan_str(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    rows = df.collect()
    assert all(r.id_a < r.id_b and r.dist <= 1 for r in rows)


def test_fuzzy_pairs_requires_blocking(spark):
    import pytest

    from python_plugins_spark.operators.linkage import fuzzy_pairs

    df = spark.range(3).select(F.col("id"), F.lit("x").alias("t"))
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "t", [])


def test_entity_ids_cover_all_records(spark, sf_dir):
    df = QUERIES["entity_ids_customers"](spark, sf_dir)
    c = load_table(spark, "customer", sf_dir)
    rows = df.collect()
    assert len(rows) == c.count()
    # entity id is never larger than the record's own id (min-adopt)
    assert all(r.entity_id <= r.c_custkey for r in rows)
