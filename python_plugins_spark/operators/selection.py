"""Data-selection operators for training-corpus curation.

Two published selection methods re-expressed as pure DataFrame
algebra (no UDFs, no driver-side model state):

- :func:`dsir_log_weights` — Data Selection via Importance Resampling
  (Xie et al. 2023, arXiv:2302.03169): per-example importance weights
  ``log p_target(x) - log p_source(x)`` under hashed bag-of-ngrams
  unigram models with add-one smoothing. The bucket distributions are
  tiny (``buckets`` rows) and broadcast, so scoring is one map-side
  pipeline over the corpus scan plus one per-doc aggregate.
- :func:`nb_train_score` — multinomial Naive Bayes trained as pure
  aggregates (closed form: token-class counts), the classic
  fastText-shaped corpus classifier (quality / domain filter). The
  class-conditional model is vocabulary×classes sparse counts; scoring
  uses the identity ``sum_tok ln(c_tc + 1)`` needs only the SPARSE
  (token, class) pairs because ln(0 + 1) = 0 — classes a token never
  hit contribute nothing, so no dense vocab×class materialization
  ever exists.

Reference parity: the reference plugin's host platform ships corpus
ops as pipeline stages (see SURVEY §2c "LLM-pipeline ops"); these two
close the data-SELECTION gap alongside the existing dedup /
contamination / quality-rule operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_plugins_spark.functions import hash32, tokens


def dsir_log_weights(
    docs: DataFrame,
    target_cond,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
) -> DataFrame:
    """Per-document DSIR importance weights.

    ``target_cond`` is a boolean Column marking the target-domain rows
    (the distribution we want the selected corpus to resemble); the
    SOURCE distribution is the whole input. Returns
    ``(id_col, n_tok, log_w)`` where ``log_w = sum_tok
    [ln p_t(b(tok)) - ln p_s(b(tok))]`` with hashed-unigram buckets
    and add-one smoothing on both models.

    Scale: ONE corpus tokenization pass. The token stream folds
    map-side into a per-(doc, bucket) count frame (≤ |docs| × buckets
    rows, far smaller than the token stream); the bucket models, the
    corpus totals, and the per-doc weights are all re-aggregations of
    that frame, so the 100 TB text is scanned and exploded exactly
    once. The bucket/ratio table is at most ``buckets`` rows and
    broadcast; the only wide shuffle is the (doc, bucket) groupBy.

    Null-text documents contribute no tokens and are DROPPED from the
    output (``explode`` semantics) — a document with no content has no
    importance weight under either model. Callers that need a row per
    input doc should ``coalesce(text, '')`` upstream."""
    tok = docs.select(
        F.col(id_col),
        target_cond.alias("_is_target"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("b", hash32(F.col("tok")) % buckets)

    # One pass over the token stream: per-(doc, bucket) counts. Every
    # downstream quantity (bucket models, totals, per-doc sums) is a
    # re-aggregation of this much smaller frame.
    per_doc_bucket = tok.groupBy(id_col, "b").agg(
        F.count("*").alias("n_bd"),
        F.sum(F.col("_is_target").cast("long")).alias("t_bd"),
    )
    bucket = per_doc_bucket.groupBy("b").agg(
        F.sum("n_bd").alias("c_s"), F.sum("t_bd").alias("c_t")
    )
    # Corpus totals as a 1-row aggregate broadcast-crossed back onto the
    # ≤buckets-row bucket table. (Previously an unpartitioned
    # Window.partitionBy() grand total — same doubles, but the registry
    # window lint now bans empty-partition windows outright, and the
    # broadcast join states the "this side is one row" fact in the plan.)
    tot = bucket.agg(F.sum("c_s").alias("n_s"), F.sum("c_t").alias("n_t"))
    ratio = bucket.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("c_t") + 1.0) / (F.col("n_t") + F.lit(buckets)))
            - F.log((F.col("c_s") + 1.0) / (F.col("n_s") + F.lit(buckets)))
        ).alias("log_r"),
    )
    return (
        per_doc_bucket.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.sum("n_bd").alias("n_tok"),
            F.round(F.sum(F.col("n_bd") * F.col("log_r")), 4).alias("log_w"),
        )
    )


def dsir_resample_topk(
    docs: DataFrame,
    target_cond,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
) -> DataFrame:
    """DSIR's second half: importance RESAMPLING. Select ``k``
    documents with probability proportional to their importance
    weight ``w = exp(log_w)`` via the Efraimidis-Spirakis A-Res
    scheme, derandomized with md5-derived uniforms — no RNG state, so
    the same document set falls out of Spark, the SQL oracle, and any
    rerun (the reproducibility a training-corpus freeze needs).

    A-Res: each doc draws ``key = ln(u) / w`` with
    ``u = (hash32(id) + 1) / (2^32 + 1)`` in (0, 1); the k LARGEST
    keys win (equivalent to top-k of ``u^(1/w)``).

    Scale: weights come from :func:`dsir_log_weights` (one corpus
    pass + broadcast bucket models); selection is orderBy+limit —
    Spark's TakeOrdered, a per-partition top-k then a k-row driver
    merge, never a global sort."""
    w = dsir_log_weights(docs, target_cond, text_col, id_col, buckets)
    u = (hash32(F.col(id_col).cast("string")) + 1) / F.lit(4294967297.0)
    keyed = w.select(
        id_col,
        "log_w",
        (F.log(u) / F.exp(F.col("log_w"))).alias("res_key"),
    )
    topk = keyed.orderBy(F.col("res_key").desc(), F.col(id_col)).limit(k)
    # rank attachment runs on the k surviving rows only
    win = Window.orderBy(F.col("res_key").desc(), F.col(id_col))
    return (
        topk.withColumn("sel_rank", F.row_number().over(win))
        .select(id_col, "log_w", "sel_rank")
    )


def nb_train_score(
    train_docs: DataFrame,
    test_docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial Naive Bayes: train on ``train_docs`` (class =
    ``label_col``), score ``test_docs``; returns
    ``(id_col, predicted, score)`` with the argmax class per test doc
    (FP ties broken by class name — deterministic across engines).

    score(d, c) = ln prior(c)
                + sum_{tok in d ∩ vocab} ln(c_tc + 1)
                - n_d * ln(c_c + V)

    where c_tc is the token count in class c, c_c the class token
    total, V the train vocabulary size, and n_d the count of the
    test doc's in-vocabulary tokens (OOV tokens are dropped — the
    textbook multinomial-NB convention). A test doc whose tokens are
    ALL out-of-vocabulary (or whose text is null) still gets a row:
    n_d = 0 collapses the score to ln prior(c), so it predicts the
    prior-argmax class. Only SPARSE (tok, class) count pairs are ever
    materialized: ln(0+1)=0 means absent pairs contribute nothing to
    the middle term.

    Scale: the model tables (vocab-sized counts, class constants) are
    the small side and broadcast; scoring is one equi-join on token
    plus a (doc, class) aggregate — classes are bounded, so the dense
    (doc x class) frame is |test| x |classes|. Each corpus is
    tokenized ONCE: the train stream folds into the (cls, tok) model
    shuffle and the test stream into a per-(doc, tok) count shuffle,
    and every consumer re-aggregates those frames (AQE reuses the
    shared exchanges), so neither 100 TB text is scanned twice."""
    lbl = F.col(label_col)
    train_tok = train_docs.select(
        lbl.alias("cls"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    c_tc = train_tok.groupBy("cls", "tok").agg(F.count("*").alias("c_tc"))
    c_c = c_tc.groupBy("cls").agg(F.sum("c_tc").alias("c_c"))
    vocab_n = c_tc.select(F.countDistinct("tok").alias("v"))
    priors = (
        train_docs.groupBy(lbl.alias("cls"))
        .agg(F.count("*").alias("n_docs"))
        .crossJoin(
            F.broadcast(train_docs.agg(F.count("*").alias("n_total")))
        )
        .select("cls", F.log(F.col("n_docs") / F.col("n_total")).alias("ln_prior"))
    )
    cls_const = (
        c_c.crossJoin(F.broadcast(vocab_n))
        .join(priors, "cls")
        .select("cls", "ln_prior", F.log(F.col("c_c") + F.col("v")).alias("ln_denom"))
    )

    # One pass over the test token stream: fold to per-(doc, token)
    # counts first. Both downstream consumers (n_d, sparse) sit on the
    # same (doc, tok) shuffle, so AQE reuses it and the 100 TB test
    # text is tokenized exactly once.
    tv = (
        test_docs.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
        )
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("n_t"))
    )
    vocab = c_tc.select("tok").distinct()
    # Left-join from the full test-id set so all-OOV / null-text docs
    # keep a row with n_d = 0 (score degenerates to the prior).
    n_d = (
        test_docs.select(id_col)
        .distinct()
        .join(
            tv.join(F.broadcast(vocab), "tok")
            .groupBy(id_col)
            .agg(F.sum("n_t").alias("n_d")),
            id_col,
            "left",
        )
        .na.fill({"n_d": 0})
    )
    sparse = (
        tv.join(F.broadcast(c_tc), "tok")
        .groupBy(id_col, "cls")
        .agg(F.sum(F.col("n_t") * F.log(F.col("c_tc") + 1.0)).alias("ln_hits"))
    )
    dense = (
        n_d.crossJoin(F.broadcast(cls_const))
        .join(sparse, [id_col, "cls"], "left")
        .na.fill({"ln_hits": 0.0})
        .select(
            id_col,
            "cls",
            (
                F.col("ln_prior")
                + F.col("ln_hits")
                - F.col("n_d") * F.col("ln_denom")
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("score"), 6).desc(), F.col("cls").asc()
    )
    return (
        dense.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("cls").alias("predicted"),
            F.round(F.col("score"), 4).alias("score"),
        )
    )
