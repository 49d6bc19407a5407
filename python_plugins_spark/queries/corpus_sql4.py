"""Training-corpus curation II (splits, chunking, EWMA, PMI, packing) and the Spark 4 SQL authoring surface (SQL UDFs, pipe syntax, scripting, EXECUTE IMMEDIATE).

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
from python_plugins_spark.session import stage_checkpoint


# Training-corpus curation II: deterministic splits, chunking, EWMA,
# graph triangles (SURVEY.md §2c LLM-pipeline ops)
# =====================================================================

@register(
    "corpus_shuffle_shards",
    oracle="""
    WITH k AS (
      SELECT doc_id,
             md5(concat('epoch0', ':', CAST(doc_id AS VARCHAR))) AS key
      FROM documents
    ), s AS (
      SELECT doc_id, key,
             CAST((('0x' || substr(key, 1, 8))::UBIGINT % 8) AS BIGINT)
               AS shard
      FROM k
    )
    SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard
                              ORDER BY key, doc_id) AS pos
    FROM s
    """,
)
def corpus_shuffle_shards(spark, sf_dir):
    """Deterministic GLOBAL SHUFFLE + sharding — the training-order
    randomization step before a corpus is written out as shards. Each
    doc draws a pseudorandom key md5(seed:doc_id) (re-seed per epoch by
    changing the literal — no RNG state to coordinate across 1000
    executors), its shard is the key's top 32 bits mod n_shards, and
    its position is the rank of the key WITHIN the shard. Bit-identical
    across runs, machines, and engines. Scale: ONE hash-partition
    shuffle on shard + an in-partition sort — never a global sort; at
    100 TB each shard sorts independently, which is exactly how the
    shard files would be written."""
    docs = load_table(spark, "documents", sf_dir)
    key = F.md5(
        F.concat_ws(":", F.lit("epoch0"), F.col("doc_id").cast("string"))
    )
    keyed = docs.select(
        "doc_id",
        key.alias("key"),
        F.pmod(
            F.conv(F.substring(key, 1, 8), 16, 10).cast("long"), F.lit(8)
        ).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("key", "doc_id")
    return keyed.select(
        "doc_id", "shard", F.row_number().over(w).alias("pos")
    )


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
    # df re-aggregates tf (its rows are already distinct (doc, term)
    # pairs), so the corpus is tokenized once and AQE reuses tf's
    # shuffle instead of a second explode + countDistinct pass.
    df_ = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
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
    w = w.transform(stage_checkpoint)  # released on GC, not session-lifetime
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
    v = v.transform(stage_checkpoint)  # released on GC, not session-lifetime
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
    # model build + scoring share one tokenization pass; localCheckpoint
    # so the blocks release on GC instead of accumulating across sweeps
    bg = bg.transform(stage_checkpoint)
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
    # grand total as a 1-row broadcast cross-join, not an
    # empty-partition window (registry window lint)
    tot = obs.agg(F.sum("o").alias("n"))
    m = obs.select(
        "o",
        F.sum("o").over(w_row).alias("row_tot"),
        F.sum("o").over(w_col).alias("col_tot"),
    ).crossJoin(F.broadcast(tot))
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return m.agg(
        F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6).alias("chi2"),
        F.count("*").alias("n_cells"),
    )


# Data selection (DSIR importance weights, Naive-Bayes corpus
# classifier) — SURVEY.md §2c LLM-pipeline ops, selection story
# =====================================================================

# Shared CTE chain for the DSIR pair: per-doc (doc_id, n_tok, log_w)
# under the exact smoothing the Spark operator computes.
_DSIR_PERDOC_CTES = f"""
    tok AS (
        SELECT doc_id, (lang = 'en') AS is_target,
               {OF.sql_hash32('tok')} % 256 AS b
        FROM (
            SELECT doc_id, lang,
                   unnest({OF.sql_tokens('text')}) AS tok
            FROM documents
        )
    ),
    src AS (SELECT b, count(*) AS c_s FROM tok GROUP BY b),
    tgt AS (SELECT b, count(*) AS c_t FROM tok WHERE is_target GROUP BY b),
    totals AS (
        SELECT count(*) AS n_s,
               sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS n_t
        FROM tok
    ),
    ratio AS (
        SELECT src.b,
               ln((coalesce(tgt.c_t, 0) + CAST(1.0 AS DOUBLE))
                  / CAST(totals.n_t + 256 AS DOUBLE))
             - ln((src.c_s + CAST(1.0 AS DOUBLE))
                  / CAST(totals.n_s + 256 AS DOUBLE)) AS log_r
        FROM src LEFT JOIN tgt ON src.b = tgt.b, totals
    ),
    perdoc AS (
        SELECT tok.doc_id, count(*) AS n_tok, round(sum(log_r), 4) AS log_w
        FROM tok JOIN ratio ON tok.b = ratio.b
        GROUP BY tok.doc_id
    )
"""


@register(
    "dsir_log_weights_docs",
    oracle=f"""
    WITH {_DSIR_PERDOC_CTES}
    SELECT doc_id, n_tok, log_w FROM perdoc
    """,
)
def dsir_log_weights_docs(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169)
    over the documents table: target domain = English docs, source =
    the whole corpus; hashed-unigram models with 256 buckets and
    add-one smoothing. The two bucket distributions are <=256 rows
    each and broadcast, so at 100 TB the corpus is scanned once, the
    bucket id is a map-side expression, and the only shuffle is the
    per-document sum. Reference carries no selection op; this is the
    §2c training-data-selection surface."""
    from python_plugins_spark.operators.selection import dsir_log_weights

    docs = load_table(spark, "documents", sf_dir)
    return dsir_log_weights(docs, F.col("lang") == "en", buckets=256)


@register(
    "dsir_resample_docs",
    oracle=f"""
    WITH {_DSIR_PERDOC_CTES},
    keyed AS (
        SELECT doc_id, log_w,
               ln(({OF.sql_hash32('CAST(doc_id AS VARCHAR)')} + 1)
                  / CAST(4294967297 AS DOUBLE)) / exp(log_w) AS res_key
        FROM perdoc
    ),
    ranked AS (
        SELECT doc_id, log_w,
               row_number() OVER (ORDER BY res_key DESC, doc_id) AS sel_rank
        FROM keyed
    )
    SELECT doc_id, log_w, sel_rank FROM ranked WHERE sel_rank <= 100
    """,
)
def dsir_resample_docs(spark, sf_dir):
    """DSIR end-to-end: importance weights -> derandomized
    Efraimidis-Spirakis resampling of the top 100 docs (probability
    proportional to exp(log_w), uniforms derived from md5 so the
    selected corpus is bit-reproducible across engines and reruns).
    Selection is orderBy+limit — Spark's TakeOrdered (per-partition
    top-k, k-row merge), never a global sort; the rank window runs on
    the k survivors only."""
    from python_plugins_spark.operators.selection import dsir_resample_topk

    docs = load_table(spark, "documents", sf_dir)
    return dsir_resample_topk(docs, F.col("lang") == "en", k=100, buckets=256)


@register(
    "nb_classify_docs",
    oracle=f"""
    WITH train AS (
        SELECT lang AS cls, text FROM documents WHERE doc_id % 5 <> 0
    ),
    test AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
    ),
    train_tok AS (
        SELECT cls, unnest({OF.sql_tokens('text')}) AS tok FROM train
    ),
    ctc AS (
        SELECT cls, tok, count(*) AS c_tc FROM train_tok GROUP BY cls, tok
    ),
    cc AS (SELECT cls, sum(c_tc) AS c_c FROM ctc GROUP BY cls),
    vocab_n AS (SELECT count(DISTINCT tok) AS v FROM ctc),
    priors AS (
        SELECT cls, ln(n_docs / CAST(n_total AS DOUBLE)) AS ln_prior
        FROM (SELECT cls, count(*) AS n_docs FROM train GROUP BY cls),
             (SELECT count(*) AS n_total FROM train)
    ),
    cls_const AS (
        SELECT cc.cls, priors.ln_prior,
               ln(CAST(cc.c_c + vocab_n.v AS DOUBLE)) AS ln_denom
        FROM cc, vocab_n
        JOIN priors ON priors.cls = cc.cls
    ),
    test_tok AS (
        SELECT doc_id, unnest({OF.sql_tokens('text')}) AS tok FROM test
    ),
    test_iv AS (
        SELECT doc_id, tok FROM test_tok
        JOIN (SELECT DISTINCT tok FROM ctc) vocab USING (tok)
    ),
    nd AS (
        SELECT t.doc_id, coalesce(n.n_d, 0) AS n_d
        FROM (SELECT DISTINCT doc_id FROM test) t
        LEFT JOIN (
            SELECT doc_id, count(*) AS n_d FROM test_iv GROUP BY doc_id
        ) n ON n.doc_id = t.doc_id
    ),
    sparse AS (
        SELECT doc_id, cls,
               sum(ln(c_tc + CAST(1.0 AS DOUBLE))) AS ln_hits
        FROM test_iv JOIN ctc USING (tok)
        GROUP BY doc_id, cls
    ),
    dense AS (
        SELECT nd.doc_id, cls_const.cls,
               cls_const.ln_prior + coalesce(sparse.ln_hits, CAST(0.0 AS DOUBLE))
               - nd.n_d * cls_const.ln_denom AS score
        FROM nd CROSS JOIN cls_const
        LEFT JOIN sparse ON sparse.doc_id = nd.doc_id
                        AND sparse.cls = cls_const.cls
    )
    SELECT doc_id, cls AS predicted, round(score, 4) AS score
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id
            ORDER BY round(score, 6) DESC, cls ASC
        ) AS rn
        FROM dense
    )
    WHERE rn = 1
    """,
)
def nb_classify_docs(spark, sf_dir):
    """Multinomial Naive-Bayes corpus classifier (the fastText-shaped
    quality/domain filter): train on 4/5 of the documents (class =
    lang), score the held-out 1/5. Model tables (sparse token-class
    counts, class constants) broadcast; scoring is one token equi-join
    plus a bounded (doc x class) aggregate — no dense vocab x class
    frame ever exists (ln(0+1)=0). All-OOV held-out docs get the
    prior-argmax row (n_d = 0). Reference carries no classifier op;
    §2c training-data-selection surface."""
    from python_plugins_spark.operators.selection import nb_train_score

    docs = load_table(spark, "documents", sf_dir)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    return nb_train_score(train, test, label_col="lang")


@register(
    "embedding_covariance_matrix",
    oracle=S.embedding_covariance_oracle_sql("embeddings", "embedding", 64),
)
def embedding_covariance_matrix(spark, sf_dir):
    """Distributed covariance of the embedding corpus — PCA's heavy
    half, in the shape that survives 100 TB: one Arrow-batched corpus
    pass accumulates per-task numpy Gram matrices (float64), and only
    tasks x d^2 partial rows ever shuffle (never N x d^2). Exact
    DuckDB twin of the centered-Gram formula."""
    emb = load_table(spark, "embeddings", sf_dir)
    return S.embedding_covariance(emb, "embedding", 64)


@register(
    "quality_percentile_by_source",
    oracle=TX.quality_percentile_oracle_sql(
        "documents", "text", "doc_id", "source"
    ),
)
def quality_percentile_by_source(spark, sf_dir):
    """Per-domain quality percentile (the FineWeb-style threshold-free
    filter): every document gets its percent_rank WITHIN its source,
    so 'keep each domain's top X%' works across domains with wildly
    different absolute score distributions. One window shuffle keyed
    on source; deterministic tie-break on doc_id keeps both engines'
    ranks identical."""
    docs = load_table(spark, "documents", sf_dir)
    return TX.quality_percentile(docs, "text", "doc_id", "source")


@register(
    "quality_psi_drift_sources",
    oracle=TX.quality_psi_drift_oracle_sql(
        "documents", "d.source = 'src0'", "d.source <> 'src0'",
        "text", "doc_id",
    ),
)
def quality_psi_drift_sources(spark, sf_dir):
    """Population Stability Index between src0's quality distribution
    and the rest of the corpus — the drift monitor a continuously-
    ingesting pipeline runs per batch ('did this crawl's quality
    profile shift?'). One corpus scan, two <=10-row count tables;
    add-one smoothing keeps empty bins exact on both engines."""
    docs = load_table(spark, "documents", sf_dir)
    return TX.quality_psi_drift(
        docs, F.col("source") == "src0", F.col("source") != "src0"
    )


@register("embedding_pca_project")
def embedding_pca_project(spark, sf_dir):
    """Top-8 principal-component projection of the embeddings —
    whitening/compression ahead of clustering or SemDeDup. The
    distributed pass is the covariance (oracle-checked above); the
    eigh runs on the 64x64 matrix (O(d^3), corpus-size independent)
    and the sign-fixed components broadcast into a second vectorized
    pass. No SQL oracle (eigendecomposition isn't SQL-expressible);
    tests/test_operators.py pins orthonormality, variance ordering,
    and agreement with direct numpy PCA."""
    emb = load_table(spark, "embeddings", sf_dir)
    out = S.pca_project(emb, "vec_id", "embedding", dim=64, k=8)
    return out.select(
        "vec_id", F.round(F.element_at("pc", 1), 4).alias("pc1"),
        F.round(F.element_at("pc", 2), 4).alias("pc2"),
        F.md5(F.to_json(F.col("pc"))).alias("pc_md5"),
    )


# =====================================================================


# Bloom-filter prefilter for incremental exact dedup
# =====================================================================

@register(
    "bloom_prefilter_dedup",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 400
    ),
    batch AS (
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id >= 400
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id < 30
    ),
    ck AS (SELECT DISTINCT {D.sql_fingerprint('text')} AS fp FROM corpus)
    SELECT b.doc_id, {D.sql_fingerprint('b.text')} AS fp
    FROM batch b
    WHERE {D.sql_fingerprint('b.text')} IN (SELECT fp FROM ck)
    """,
)
def bloom_prefilter_dedup(spark, sf_dir):
    """Incremental exact dedup with a Bloom-filter prefilter
    (operators/sketch.py bloom_semi_dedup): the admitted corpus folds
    ONCE into a bounded distinct-bit-positions table (<= 2^17 rows,
    broadcastable, reusable across batches); an ingest batch — the
    held-out docs plus exact copies of 30 admitted docs under fresh
    ids — screens its content fingerprints against it MAP-SIDE, and
    only the surviving "maybe" keys are verified with an exact
    semi-join (maybe side broadcast, corpus never shuffled). No false
    negatives by construction, so the emitted duplicate set is EXACT
    and the oracle is plain SQL membership with no bloom anywhere —
    hash-function independence is the contract. At 100 TB this is
    the difference between a corpus-by-batch shuffle join per batch
    and one bounded broadcast."""
    from python_plugins_spark.operators import sketch as SK

    docs = load_table(spark, "documents", sf_dir)
    fp = D.fingerprint_col(F.col("text"))
    corpus = docs.filter(F.col("doc_id") < 400).select(
        "doc_id", fp.alias("fp")
    )
    batch = (
        docs.filter(F.col("doc_id") >= 400)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), fp.alias("fp"))
        .unionByName(
            docs.filter(F.col("doc_id") < 30)
            .select((F.col("doc_id") + 2000000).alias("doc_id"), fp.alias("fp"))
        )
    )
    dups = SK.bloom_semi_dedup(batch, corpus, "fp")
    return dups.select("doc_id", "fp")
