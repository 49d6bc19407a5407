"""Retrieval operators: BM25 ranking, SemDeDup-style semantic
deduplication, and reciprocal-rank-fusion hybrid retrieval.

These extend the text/similarity suites with the three retrieval
primitives a training-data / RAG pipeline runs constantly:

- :func:`bm25_topk` — Okapi BM25 (public Robertson/Sparck-Jones
  formulation) scored entirely with relational algebra: one
  tokenization pass feeds tf, document-length, and df aggregates; the
  query-term relation and the (n_docs, avgdl) scalar row are broadcast
  so the only shuffles are the two tokenization aggregates. At 100 TB
  the vocabulary side stays << corpus and the per-query-term ranking
  is a bounded window (partitioned by query term).
- :func:`semantic_dedup` — SemDeDup (Abbas et al. 2023, public) shape:
  cluster embeddings, then drop any vector that has an earlier
  (lower-id) neighbor above a cosine threshold *within its cluster*.
  Clustering reuses the seeded random-hyperplane buckets from
  :mod:`.similarity`, so candidate generation is an equi-join on the
  bucket key — never an all-pairs crossJoin.
- :func:`rrf_hybrid` — reciprocal rank fusion (Cormack et al. 2009,
  public) of a lexical top-N list (token overlap with an anchor
  document) and a semantic top-N list (cosine to the anchor's
  embedding). Both lists are produced with TakeOrdered ``limit(N)``
  (scale-safe global top-N, no global window over the corpus); the
  rank windows then run over N = O(constant) rows.

Every operator has a DuckDB oracle builder mirroring the exact
expression tree (same parenthesization, same 6-dp rounding before any
ordering decision) so the value-hash gate pins cross-engine floats.

Reference scope note: the reference plugin (PythonEvaluator,
``/root/reference/src/main/java/io/cdap/plugin/python/transform/PythonEvaluator.java``)
has no retrieval surface; these belong to the training-data-pipeline
extension mandated by the build brief, not to §2a parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_plugins_spark.functions import cosine_similarity, tokens
from python_plugins_spark.functions import oracle_fragments as O
from python_plugins_spark.operators.similarity import (
    lsh_buckets,
    lsh_buckets_oracle_sql,
)


# --------------------------------------------------------------- BM25

def bm25_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n_query_terms: int = 5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-``k`` documents for each of the corpus's
    ``n_query_terms`` highest-df terms.

    idf = ln((N - df + 0.5) / (df + 0.5) + 1)          (Lucene's
    non-negative variant), score = idf * (tf*(k1+1)) / (tf + k1*(1 -
    b + b*dl/avgdl)). Scores are rounded to 6 dp *before* ranking and
    ties break on doc id, so the discrete top-k set is engine-stable.

    Scale: tf/dl/df are map-side-combined aggregates over one
    tokenization; the query-term relation (n_query_terms rows) and the
    (N, avgdl) scalar are broadcast; the final ranking window is
    partitioned by query term.
    """
    tok = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # dl and df re-aggregate tf instead of re-tokenizing the corpus:
    # one explode pass feeds everything, and tf's (id, term) shuffle is
    # shared by all three consumers.
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = df_.orderBy(F.col("df").desc(), F.col("term").asc()).limit(n_query_terms)
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    scored = (
        tf.join(F.broadcast(qterms), on="term")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("term").alias("query_term"),
            F.col(id_col),
            F.round(idf * (F.col("tf") * (k1 + 1.0)) / denom, 6).alias("bm25"),
        )
    )
    w = Window.partitionBy("query_term").orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_term", id_col, "bm25", F.col("rk").cast("long").alias("rk"))
    )


def bm25_topk_oracle_sql(
    table: str,
    text_col: str,
    id_col: str,
    n_query_terms: int = 5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    return f"""
    WITH tok AS (
      SELECT {id_col}, unnest(str_split_regex(lower(trim({text_col})), '\\s+')) AS term
      FROM {table}
    ),
    tf AS (SELECT {id_col}, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT {id_col}, count(*) AS dl FROM tok GROUP BY 1),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    qterms AS (SELECT term, df FROM df ORDER BY df DESC, term ASC LIMIT {n_query_terms}),
    stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
    scored AS (
      SELECT q.term AS query_term, tf.{id_col},
             round(
               ln((s.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
               * (tf.tf * ({k1} + 1.0))
               / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)),
             6) AS bm25
      FROM tf
      JOIN qterms q USING (term)
      JOIN dl USING ({id_col})
      CROSS JOIN stats s
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_term ORDER BY bm25 DESC, {id_col} ASC) AS rk
      FROM scored
    )
    SELECT query_term, {id_col}, bm25, rk FROM ranked WHERE rk <= {k}
    """


# ---------------------------------------------------------- SemDeDup

def semantic_dedup(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster, then inside each
    cluster drop any vector with an earlier (lower-id) neighbor at
    cosine >= ``threshold``. Returns (id, bucket, kept).

    The published algorithm k-means-clusters embeddings and keeps one
    representative per semantic-duplicate group; this formulation uses
    the seeded random-hyperplane buckets (:func:`.similarity.
    lsh_buckets`) as the cluster step — same intent (bound the
    pairwise comparison to intra-cluster), and the drop rule
    ("an earlier similar vector exists") is a deterministic greedy
    scan in id order, expressible without recursion.

    Scale: the bucket attaches as an expression in the vector
    projection (no (id, bucket) frame joined back on the id);
    candidate pairs come from a self-equi-join on the bucket key
    (shuffle on bucket, never crossJoin); the kept/dropped decision
    is one aggregated anti-join back to the input. Bucket skew at
    100 TB is handled the same way as the LSH near-dup path (more
    planes -> smaller buckets).
    """
    from python_plugins_spark.operators.similarity import lsh_bucket_expr

    e = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket_expr(vec_col, n_planes, seed, dim).alias("bucket"),
    )
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    bb = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    dropped = (
        a.join(bb, on="bucket")
        .filter(F.col("id_b") < F.col("id_a"))
        .filter(F.round(cosine_similarity(F.col("va"), F.col("vb")), 6) >= threshold)
        .select(F.col("id_a").alias("id"))
        .distinct()
    )
    return (
        e.join(dropped.withColumn("_drop", F.lit(True)), on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            "bucket",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
        )
    )


def semantic_dedup_oracle_sql(
    table: str,
    id_col: str,
    vec_col: str,
    threshold: float,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
) -> str:
    bucket_sql = lsh_buckets_oracle_sql(table, id_col, vec_col, n_planes, dim, seed)
    cos = O.sql_cosine_similarity("a.v", "b.v")
    return f"""
    WITH _b AS ({bucket_sql}),
    _e AS (SELECT t.{id_col} AS id, t.{vec_col} AS v, _b.bucket
           FROM {table} t JOIN _b ON t.{id_col} = _b.{id_col}),
    _dropped AS (
      SELECT DISTINCT a.id
      FROM _e a JOIN _e b ON a.bucket = b.bucket AND b.id < a.id
      WHERE round({cos}, 6) >= {threshold}
    )
    SELECT e.id AS {id_col}, e.bucket,
           (d.id IS NULL) AS kept
    FROM _e e LEFT JOIN _dropped d ON e.id = d.id
    """


# ------------------------------------------------- RRF hybrid fusion

def rrf_hybrid(
    docs: DataFrame,
    emb: DataFrame,
    doc_id: str,
    text_col: str,
    vec_id: str,
    vec_col: str,
    anchor_id: int,
    n_list: int = 50,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid retrieval for the query "documents like document
    ``anchor_id``": fuse a lexical top-``n_list`` (distinct-token
    overlap with the anchor) and a semantic top-``n_list`` (cosine to
    the anchor's embedding) with reciprocal rank fusion,
    score = 1/(rrf_k + rank_lex) + 1/(rrf_k + rank_sem) (a missing
    list contributes 0). Returns the fused top-``k``.

    Scale: both retriever lists are global top-N via ``limit`` —
    Spark plans TakeOrderedAndProject, never a single-partition window
    over the corpus; the rank windows run over the N collected
    candidates only. The anchor token set and anchor vector are
    broadcast one-row/tiny relations.
    """
    atoks = (
        docs.filter(F.col(doc_id) == anchor_id)
        .select(F.explode(tokens(F.col(text_col))).alias("term"))
        .distinct()
    )
    dtoks = (
        docs.filter(F.col(doc_id) != anchor_id)
        .select(F.col(doc_id).alias("id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .distinct()
    )
    lex_top = (
        dtoks.join(F.broadcast(atoks), on="term")
        .groupBy("id")
        .agg(F.count("*").alias("overlap"))
        .orderBy(F.col("overlap").desc(), F.col("id").asc())
        .limit(n_list)
    )
    wl = Window.orderBy(F.col("overlap").desc(), F.col("id").asc())
    lex_ranked = lex_top.withColumn("r_lex", F.row_number().over(wl)).select("id", "r_lex")

    avec = emb.filter(F.col(vec_id) == anchor_id).select(F.col(vec_col).alias("av"))
    sem_top = (
        emb.filter(F.col(vec_id) != anchor_id)
        .crossJoin(F.broadcast(avec))
        .select(
            F.col(vec_id).alias("id"),
            F.round(cosine_similarity(F.col(vec_col), F.col("av")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("id").asc())
        .limit(n_list)
    )
    ws = Window.orderBy(F.col("cos_sim").desc(), F.col("id").asc())
    sem_ranked = sem_top.withColumn("r_sem", F.row_number().over(ws)).select("id", "r_sem")

    fused = (
        lex_ranked.join(sem_ranked, on="id", how="full_outer")
        .select(
            F.col("id").alias(doc_id),
            F.col("r_lex").cast("long").alias("r_lex"),
            F.col("r_sem").cast("long").alias("r_sem"),
            F.round(
                F.coalesce(1.0 / (rrf_k + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (rrf_k + F.col("r_sem")), F.lit(0.0)),
                9,
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col(doc_id).asc())
        .limit(k)
    )
    return fused


def rrf_hybrid_oracle_sql(
    docs_table: str,
    emb_table: str,
    doc_id: str,
    text_col: str,
    vec_id: str,
    vec_col: str,
    anchor_id: int,
    n_list: int = 50,
    k: int = 10,
    rrf_k: int = 60,
) -> str:
    cos = O.sql_cosine_similarity("e.v", "a.av")
    return f"""
    WITH atoks AS (
      SELECT DISTINCT unnest(str_split_regex(lower(trim({text_col})), '\\s+')) AS term
      FROM {docs_table} WHERE {doc_id} = {anchor_id}
    ),
    dtoks AS (
      SELECT DISTINCT {doc_id} AS id,
             unnest(str_split_regex(lower(trim({text_col})), '\\s+')) AS term
      FROM {docs_table} WHERE {doc_id} <> {anchor_id}
    ),
    lex_top AS (
      SELECT id, count(*) AS overlap
      FROM dtoks JOIN atoks USING (term)
      GROUP BY id ORDER BY overlap DESC, id ASC LIMIT {n_list}
    ),
    lex_ranked AS (
      SELECT id, row_number() OVER (ORDER BY overlap DESC, id ASC) AS r_lex
      FROM lex_top
    ),
    a AS (SELECT {vec_col} AS av FROM {emb_table} WHERE {vec_id} = {anchor_id}),
    sem_top AS (
      SELECT e.{vec_id} AS id, round({cos}, 6) AS cos_sim
      FROM (SELECT {vec_id}, {vec_col} AS v FROM {emb_table}
            WHERE {vec_id} <> {anchor_id}) e
      CROSS JOIN a
      ORDER BY cos_sim DESC, id ASC LIMIT {n_list}
    ),
    sem_ranked AS (
      SELECT id, row_number() OVER (ORDER BY cos_sim DESC, id ASC) AS r_sem
      FROM sem_top
    ),
    fused AS (
      SELECT coalesce(l.id, s.id) AS {doc_id},
             l.r_lex AS r_lex, s.r_sem AS r_sem,
             round(coalesce(1.0 / ({rrf_k} + l.r_lex), 0.0)
                 + coalesce(1.0 / ({rrf_k} + s.r_sem), 0.0), 9) AS rrf
      FROM lex_ranked l FULL OUTER JOIN sem_ranked s ON l.id = s.id
    )
    SELECT {doc_id}, r_lex, r_sem, rrf FROM fused
    ORDER BY rrf DESC, {doc_id} ASC LIMIT {k}
    """
