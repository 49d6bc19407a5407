"""SQL-surface widening (lateral join, GROUP BY ALL, regression aggregates), training-pipeline ops (contamination, repetition), global index, XML, funnels/cohorts, graph iteration, function-surface completeness, Spark-4 extensibility, URL/XPath/PII.

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


@register(
    "temperature_mix_weights",
    oracle="""
    WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
    t AS (SELECT sum(n_docs) AS total FROM c),
    w AS (
      SELECT source, n_docs,
             n_docs / (SELECT total * 1.0 FROM t) AS p,
             pow(n_docs / (SELECT total * 1.0 FROM t), 0.3) AS pw
      FROM c
    ),
    z AS (SELECT sum(pw) AS zsum FROM w)
    SELECT source, n_docs,
           round(p, 4) AS p,
           round(pw / (SELECT zsum FROM z), 4) AS w,
           round(least(1.0, 20000 * (pw / (SELECT zsum FROM z)) / n_docs),
                 4) AS target_rate
    FROM w ORDER BY source
    """,
)
def temperature_mix_weights(spark, sf_dir):
    """Temperature-based sampling weights w_i ∝ p_i^α (α = 0.3, the
    exponent the multilingual-pretraining literature settled on —
    XLM-R's upsampling of low-resource languages): the step that turns
    raw per-source counts into the mixture a training run actually
    draws, flattening head domains without letting tail domains
    dominate. Emits per source the raw share p, the tempered weight w,
    and the per-source acceptance rate for a 20k-document budget
    (min(1, B·w/n) — the number domain_mix_rebalance's hash-Bernoulli
    filter would consume). Scale: ONE map-side-combined count over the
    corpus; everything after runs on the |sources|-row model table.
    Floats cross engines through pow(), so all outputs round to 4 dp
    per the registry convention."""
    docs = load_table(spark, "documents", sf_dir)
    c = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    t = c.agg(F.sum("n_docs").alias("total"))
    w = c.crossJoin(F.broadcast(t)).select(
        "source", "n_docs",
        (F.col("n_docs") / (F.col("total") * 1.0)).alias("p"),
        F.pow(F.col("n_docs") / (F.col("total") * 1.0), 0.3).alias("pw"),
    )
    z = w.agg(F.sum("pw").alias("zsum"))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "source", "n_docs",
            F.round("p", 4).alias("p"),
            F.round(F.col("pw") / F.col("zsum"), 4).alias("w"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(20000) * (F.col("pw") / F.col("zsum")) / F.col("n_docs"),
                ),
                4,
            ).alias("target_rate"),
        )
        .orderBy("source")
    )


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
    part = _global_index_part(o, "o_orderkey").transform(stage_checkpoint)
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
    shape. The edge list is the invariant: it IS materialized once,
    partitioned by src, so every iteration's join is co-located, and
    the rank vector is checkpointed per iteration to truncate
    lineage (at 100 TB, use a reliable checkpoint dir so executor
    loss can't drop an iteration). Dangling-node mass leaks (no redistribution) — both
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
    # Materialize the loop invariants once: the edge list partitioned
    # on src (every iteration's rank join is then co-located) and the
    # node set; checkpoint the rank vector per iteration so the lineage
    # is one iteration deep instead of re-deriving all prior rounds
    # from the event scan (unrolled, nodes/edges appear in every round
    # and the plan grows with the iteration count).
    edges = edges.repartition("src").transform(stage_checkpoint)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .transform(stage_checkpoint)
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
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit((1 - d) / n_nodes)
                    + F.lit(d) * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("r"),
            )
            # in-loop: see stage_checkpoint_iterative — truncation is
            # load-bearing here under every stageMaterialize mode
            .transform(stage_checkpoint_iterative)
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


# Closed-form ridge regression (normal equations + Cramer solve).
# The formula fragments are SHARED between the Spark plan (selectExpr)
# and the DuckDB oracle, so both engines execute textually identical
# double arithmetic over EXACT integer Gram sums — bit-identity by
# construction, no float-summation order to disagree on.

_RIDGE_CASTS = [
    "CAST(n AS DOUBLE) + 0.001 AS a00",
    "CAST(s1 AS DOUBLE) AS a01",
    "CAST(s2 AS DOUBLE) AS a02",
    "CAST(s11 AS DOUBLE) + 0.001 AS a11",
    "CAST(s12 AS DOUBLE) AS a12",
    "CAST(s22 AS DOUBLE) + 0.001 AS a22",
    "CAST(b0 AS DOUBLE) AS c0",
    "CAST(b1 AS DOUBLE) AS c1",
    "CAST(b2 AS DOUBLE) AS c2",
    # unshifted doubles for the residual computation (R^2 evaluates
    # the ACTUAL fit, so no ridge shift here)
    "CAST(n AS DOUBLE) AS d_n",
    "CAST(s1 AS DOUBLE) AS d_s1",
    "CAST(s2 AS DOUBLE) AS d_s2",
    "CAST(s11 AS DOUBLE) AS d_s11",
    "CAST(s12 AS DOUBLE) AS d_s12",
    "CAST(s22 AS DOUBLE) AS d_s22",
    "CAST(syy AS DOUBLE) AS d_syy",
]
_RIDGE_DET = "a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02) + a02*(a01*a12 - a11*a02)"
_RIDGE_DET0 = "c0*(a11*a22 - a12*a12) - a01*(c1*a22 - a12*c2) + a02*(c1*a12 - a11*c2)"
_RIDGE_DET1 = "a00*(c1*a22 - a12*c2) - c0*(a01*a22 - a12*a02) + a02*(a01*c2 - c1*a02)"
_RIDGE_DET2 = "a00*(a11*c2 - c1*a12) - a01*(a01*c2 - c1*a02) + c0*(a01*a12 - a11*a02)"
# SSE/SST from the exact moments: SSE = y'y - 2 w'X'y + w'(X'X)w,
# SST = y'y - (sum y)^2 / n — fixed-order expressions over identical
# inputs, so R^2 is bit-identical too
_RIDGE_SSE = (
    "d_syy - 2*(w0*c0 + w1*c1 + w2*c2) + (w0*w0*d_n + w1*w1*d_s11 "
    "+ w2*w2*d_s22 + 2*w0*w1*d_s1 + 2*w0*w2*d_s2 + 2*w1*w2*d_s12)"
)
_RIDGE_SST = "d_syy - c0*c0/d_n"
_RIDGE_PRED = (
    "w0 + w1*(CAST(t1 AS DOUBLE)/CAST(n_docs AS DOUBLE)) "
    "+ w2*(CAST(t2 AS DOUBLE)/CAST(n_docs AS DOUBLE))"
)
# Logistic probe (round 11): feature expressions shared TEXTUALLY by
# the Spark query and the DuckDB oracle (the ridge-probe convention),
# so the only cross-engine differences are float-sum order and
# exp/ln rounding — both far below the 6 dp output round. `{toks}` is
# the shared tokenizer; scale factors keep plain GD stable at lr=0.8.
_LOGIT_TOKS = "split(lower(trim(text)), '\\\\s+')"
_LOGIT_TOKS_DUCK = "str_split_regex(lower(trim(text)), '\\s+')"
_LOGIT_FEATURES = {
    # (spark_sql, duckdb_sql) pairs
    "x1": (
        f"CAST(size({_LOGIT_TOKS}) AS DOUBLE)/50",
        f"CAST(len({_LOGIT_TOKS_DUCK}) AS DOUBLE)/50",
    ),
    "x2": (
        f"CAST(length(text) AS DOUBLE)/CAST(size({_LOGIT_TOKS}) AS DOUBLE)/10",
        f"CAST(length(text) AS DOUBLE)/CAST(len({_LOGIT_TOKS_DUCK}) AS DOUBLE)/10",
    ),
    "x3": (
        f"CAST(size(filter({_LOGIT_TOKS}, t -> t = 'the')) AS DOUBLE)"
        f"/CAST(size({_LOGIT_TOKS}) AS DOUBLE)*10",
        f"CAST(len(list_filter({_LOGIT_TOKS_DUCK}, t -> t = 'the')) AS DOUBLE)"
        f"/CAST(len({_LOGIT_TOKS_DUCK}) AS DOUBLE)*10",
    ),
}
_LOGIT_LABEL = "CASE WHEN n_chars >= 300 THEN 1.0 ELSE 0.0 END"
_LOGIT_LR = 0.8
_LOGIT_ITERS = 8


def logit_oracle_parts(prefix: str = "") -> list[str]:
    """The logistic probe's DuckDB CTE blocks (feature frame + the 8
    unrolled GD rounds ending in ``{prefix}w{_LOGIT_ITERS}``), shared
    between :func:`_logistic_probe_oracle`, the quality-gate
    capstone's nested oracle (lm_mining.quality_gate_end_to_end), and
    the pretraining mega-capstone. ``feat`` carries ``doc_id`` so a
    composed oracle can score per-document with the final weights;
    the training aggregates ignore it. ``prefix`` renames every CTE
    (feat/w/p/a) so a composition with the BPE rounds — which also
    define ``p{r}`` — cannot collide."""
    fx = {k: v[1] for k, v in _LOGIT_FEATURES.items()}
    q = prefix
    parts = [
        f"""{q}feat AS MATERIALIZED (
      SELECT doc_id, {fx['x1']} AS x1, {fx['x2']} AS x2, {fx['x3']} AS x3,
             {_LOGIT_LABEL} AS y
      FROM documents
    )""",
        f"{q}w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)",
    ]
    for r in range(1, _LOGIT_ITERS + 1):
        parts.append(
            f"""{q}p{r} AS (
      SELECT f.*, 1.0/(1.0 + exp(-(w.w0 + w.w1*f.x1 + w.w2*f.x2
                                   + w.w3*f.x3))) AS p
      FROM {q}feat f CROSS JOIN {q}w{r - 1} w
    )"""
        )
        parts.append(
            f"""{q}a{r} AS MATERIALIZED (
      SELECT avg(-(y*ln(p) + (1.0 - y)*ln(1.0 - p))) AS loss,
             avg(p - y) AS g0, avg((p - y)*x1) AS g1,
             avg((p - y)*x2) AS g2, avg((p - y)*x3) AS g3
      FROM {q}p{r}
    )"""
        )
        parts.append(
            f"""{q}w{r} AS MATERIALIZED (
      SELECT w.w0 - {_LOGIT_LR}*a.g0 AS w0, w.w1 - {_LOGIT_LR}*a.g1 AS w1,
             w.w2 - {_LOGIT_LR}*a.g2 AS w2, w.w3 - {_LOGIT_LR}*a.g3 AS w3,
             a.loss AS loss
      FROM {q}w{r - 1} w CROSS JOIN {q}a{r} a
    )"""
        )
    return parts


def _logistic_probe_oracle() -> str:
    parts = logit_oracle_parts()
    union = "\n    UNION ALL\n    ".join(
        f"SELECT {r} AS iter, round(w0, 6) AS w0, round(w1, 6) AS w1, "
        f"round(w2, 6) AS w2, round(w3, 6) AS w3, round(loss, 6) AS log_loss "
        f"FROM w{r}"
        for r in range(1, _LOGIT_ITERS + 1)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + union


@register("logistic_probe_docs", oracle=_logistic_probe_oracle())
def logistic_probe_docs(spark, sf_dir):
    """Distributed LOGISTIC-REGRESSION quality probe (round 11) — the
    iterative GLM the fastText/CCNet-style quality classifier family
    actually trains, complementing the closed-form ridge probe and the
    counting Naive Bayes: full-batch gradient descent (8 iterations,
    lr 0.8) predicting "long document" (n_chars >= 300) from token
    statistics (scaled token count, chars-per-token, 'the'-rate). The
    fit is real — log-loss falls 0.693 -> 0.561 and train accuracy
    reaches ~0.73 at sf0.01 — and the whole trajectory is the output:
    one row per iteration (post-update weights + pre-update loss), so
    the oracle checks CONVERGENCE, not just the final point.

    Scale shape: the feature frame materializes once; each iteration
    is ONE map-side-combined aggregate (5 doubles through the driver
    — the bounded class) and a 4-float driver update; no MLlib, no
    per-row Python. At 100 TB this is the standard multi-pass
    full-batch GD: N iterations = N corpus-scan aggregates over a
    cached projection. Oracle: the identical feature expressions
    (shared constants) with the iteration UNROLLED as materialized
    CTE rounds (the bpe/kmeans pattern); weights update unrounded in
    both engines, outputs round to 6 dp."""
    docs = load_table(spark, "documents", sf_dir)
    _feat, _w, rows = logit_train(docs)
    return spark.createDataFrame(
        rows,
        "iter int, w0 double, w1 double, w2 double, w3 double, "
        "log_loss double",
    )


def logit_train(docs):
    """The logistic probe's 8-iteration full-batch GD, extracted so
    the quality-gate capstone (lm_mining.quality_gate_end_to_end) can
    train the same classifier and score per document with the FINAL
    weights. Returns ``(feat, w, rows)`` — the checkpointed per-doc
    feature frame (doc_id, x1, x2, x3, y), the final UNROUNDED weight
    vector, and the per-iteration trajectory rows the probe query
    publishes. Scale shape as documented on logistic_probe_docs: one
    map-side-combined 5-double aggregate per iteration."""
    fx = {k: v[0] for k, v in _LOGIT_FEATURES.items()}
    # NO spread_scan here (deliberate, measured): the feature tokenize
    # is one cheap pass, but the checkpointed frame then feeds 8 tiny
    # ITERATION jobs, and a defaultParallelism-wide frame makes every
    # iteration schedule that many near-empty tasks. Interleaved A/B at
    # sf0.1: no-spread 2.03 s min vs spread 2.63 s vs spread+coalesce
    # 2.26 s for the full GD loop. At corpus scale the input already
    # carries >= parallelism partitions, so the variants coincide —
    # the spread only ever fires in the regime where it loses.
    feat = docs.selectExpr(
        "doc_id",
        f"{fx['x1']} AS x1",
        f"{fx['x2']} AS x2",
        f"{fx['x3']} AS x3",
        f"{_LOGIT_LABEL} AS y",
    ).transform(stage_checkpoint)
    w = [0.0, 0.0, 0.0, 0.0]
    rows = []
    for it in range(1, _LOGIT_ITERS + 1):
        z = (
            F.lit(w[0])
            + F.lit(w[1]) * F.col("x1")
            + F.lit(w[2]) * F.col("x2")
            + F.lit(w[3]) * F.col("x3")
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        r = feat.select(
            p.alias("p"), "x1", "x2", "x3", "y"
        ).agg(
            F.avg(
                -(F.col("y") * F.log("p")
                  + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - F.col("p")))
            ).alias("loss"),
            F.avg(F.col("p") - F.col("y")).alias("g0"),
            F.avg((F.col("p") - F.col("y")) * F.col("x1")).alias("g1"),
            F.avg((F.col("p") - F.col("y")) * F.col("x2")).alias("g2"),
            F.avg((F.col("p") - F.col("y")) * F.col("x3")).alias("g3"),
        ).collect()[0]
        w = [
            w[0] - _LOGIT_LR * r["g0"],
            w[1] - _LOGIT_LR * r["g1"],
            w[2] - _LOGIT_LR * r["g2"],
            w[3] - _LOGIT_LR * r["g3"],
        ]
        rows.append(
            (it, round(w[0], 6), round(w[1], 6), round(w[2], 6),
             round(w[3], 6), round(r["loss"], 6))
        )
    return feat, w, rows


# non-overlapping ' the ' occurrences in the space-padded lower text
# (the blocklist counting convention — identical expression text in
# both engines)
_RIDGE_X1 = (
    "CAST((length(' ' || lower(text) || ' ') - "
    "length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5 AS BIGINT)"
)


def _ridge_probe_oracle() -> str:
    casts = ", ".join(_RIDGE_CASTS)
    return f"""
    WITH f AS (
      SELECT source,
             {_RIDGE_X1} AS x1,
             len(str_split_regex(lower(trim(text)), '\\s+')) AS x2,
             n_chars AS y
      FROM documents
    ),
    g AS (
      SELECT count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
             sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
             sum(y) AS b0, sum(x1*y) AS b1, sum(x2*y) AS b2,
             sum(y*y) AS syy
      FROM f
    ),
    cst AS (SELECT {casts} FROM g),
    dets AS (SELECT *, {_RIDGE_DET} AS det, {_RIDGE_DET0} AS det0,
                    {_RIDGE_DET1} AS det1, {_RIDGE_DET2} AS det2 FROM cst),
    ws AS (SELECT *, det0/det AS w0, det1/det AS w1, det2/det AS w2
           FROM dets),
    fit AS (SELECT w0, w1, w2,
                   1 - ({_RIDGE_SSE})/({_RIDGE_SST}) AS r2 FROM ws),
    s AS (SELECT source, count(*) AS n_docs, sum(x1) AS t1, sum(x2) AS t2
          FROM f GROUP BY source)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           round({_RIDGE_PRED}, 6) AS avg_pred_chars,
           round(w0, 6) AS w0, round(w1, 6) AS w1, round(w2, 6) AS w2,
           round(r2, 6) AS r2
    FROM s, fit
    """


@register("ridge_probe_chars", oracle=_ridge_probe_oracle())
def ridge_probe_chars(spark, sf_dir):
    """Distributed CLOSED-FORM ridge regression (normal equations) —
    the linear-probe pattern of corpus curation: fit w = (X'X+λI)⁻¹X'y
    predicting document characters from token statistics (x1 =
    non-overlapping ' the ' count, x2 = whitespace token count,
    intercept), i.e. RECOVER the corpus' chars-per-token coefficient —
    the number a token-budget planner multiplies byte counts by. No
    MLlib, no iteration, no driver solve: the 3x3 Gram matrix
    accumulates in ONE map-side-combined aggregate over EXACT integer
    features (integer sums cross engines losslessly — no
    float-summation order to disagree on), Cramer's rule and the
    exact-moment R² (SSE = y'y - 2w'X'y + w'(X'X)w) run as expressions
    on the 1-row frame, and the weights broadcast onto the per-source
    scoring aggregate. The DuckDB oracle executes the SAME formula
    fragments textually (shared Python constants), so weights, R², and
    scores hash-match bit-for-bit before the 6 dp round. Scale: two
    aggregates over the corpus (Gram + per-source), one broadcast —
    the d²-sized shuffle is 10 numbers; works unchanged at 100 TB
    where an iterative fit would need multi-pass SGD."""
    docs = load_table(spark, "documents", sf_dir)
    f = docs.selectExpr(
        "source",
        f"{_RIDGE_X1} AS x1",
        "CAST(size(split(lower(trim(text)), '\\\\s+')) AS BIGINT) AS x2",
        "n_chars AS y",
    )
    g = f.agg(
        F.expr("count(*)").alias("n"),
        F.expr("sum(x1)").alias("s1"),
        F.expr("sum(x2)").alias("s2"),
        F.expr("sum(x1*x1)").alias("s11"),
        F.expr("sum(x1*x2)").alias("s12"),
        F.expr("sum(x2*x2)").alias("s22"),
        F.expr("sum(y)").alias("b0"),
        F.expr("sum(x1*y)").alias("b1"),
        F.expr("sum(x2*y)").alias("b2"),
        F.expr("sum(y*y)").alias("syy"),
    )
    fit = (
        g.selectExpr(*_RIDGE_CASTS)
        .selectExpr(
            "*",
            f"{_RIDGE_DET} AS det",
            f"{_RIDGE_DET0} AS det0",
            f"{_RIDGE_DET1} AS det1",
            f"{_RIDGE_DET2} AS det2",
        )
        .selectExpr("*", "det0/det AS w0", "det1/det AS w1", "det2/det AS w2")
        .selectExpr(
            "w0", "w1", "w2",
            f"1 - ({_RIDGE_SSE})/({_RIDGE_SST}) AS r2",
        )
    )
    s = f.groupBy("source").agg(
        F.expr("count(*)").alias("n_docs"),
        F.expr("sum(x1)").alias("t1"),
        F.expr("sum(x2)").alias("t2"),
    )
    return s.crossJoin(F.broadcast(fit)).selectExpr(
        "source",
        "CAST(n_docs AS BIGINT) AS n_docs",
        f"round({_RIDGE_PRED}, 6) AS avg_pred_chars",
        "round(w0, 6) AS w0",
        "round(w1, 6) AS w1",
        "round(w2, 6) AS w2",
        "round(r2, 6) AS r2",
    )
