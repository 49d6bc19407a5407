"""Tests for the data-selection operators (operators/selection.py).

DSIR importance weights and the Naive-Bayes corpus classifier — the
§2c training-data-selection surface. Both are closed-form, so the
tests check the math against tiny hand-computed fixtures plus the
behavioral contracts (all-OOV prior fallback, determinism, tie rule).
"""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from python_plugins_spark.operators.selection import (
    dsir_log_weights,
    dsir_resample_topk,
    nb_train_score,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_dsir_hand_computed_single_bucket(spark):
    """With buckets=1 every token lands in bucket 0, so
    log_w = n_tok * [ln((n_t_tok+1)/(n_t+1)) - ln((n_s_tok+1)/(n_s+1))],
    directly checkable by hand."""
    docs = _docs(
        spark,
        [
            (1, "en", "a b c"),     # target, 3 tokens
            (2, "de", "d e"),       # source-only, 2 tokens
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dsir_log_weights(
            docs, F.col("lang") == "en", buckets=1
        ).collect()
    }
    # n_s = 5 total tokens, n_t = 3 target tokens, all in bucket 0.
    log_r = math.log((3 + 1.0) / (3 + 1)) - math.log((5 + 1.0) / (5 + 1))
    assert out[1]["n_tok"] == 3
    assert out[2]["n_tok"] == 2
    assert abs(out[1]["log_w"] - round(3 * log_r, 4)) < 1e-9
    assert abs(out[2]["log_w"] - round(2 * log_r, 4)) < 1e-9


def test_dsir_target_docs_score_higher(spark):
    """Docs made of target-domain tokens must out-weigh docs made of
    source-only tokens — the operator's entire purpose."""
    rows = [(i, "en", "alpha beta gamma delta") for i in range(20)]
    rows += [(100 + i, "de", "eins zwei drei vier") for i in range(20)]
    docs = _docs(spark, rows)
    out = {r["doc_id"]: r["log_w"] for r in dsir_log_weights(docs, F.col("lang") == "en").collect()}
    assert out[0] > out[100]


def test_dsir_null_text_dropped(spark):
    """Documented contract: null-text docs contribute no tokens and
    produce no output row."""
    docs = _docs(spark, [(1, "en", "a b"), (2, "en", None)])
    ids = {r["doc_id"] for r in dsir_log_weights(docs, F.col("lang") == "en").collect()}
    assert ids == {1}


def test_dsir_resample_matches_local_formula(spark):
    """The derandomized A-Res selection must equal the same formula
    computed locally: key = ln(u)/exp(log_w) with the md5-derived u,
    top-k by key desc. Also: deterministic across runs, ranks 1..k."""
    import hashlib

    rows = [(i, "en", "alpha beta gamma") for i in range(30)]
    rows += [(100 + i, "de", "eins zwei drei") for i in range(30)]
    docs = _docs(spark, rows)
    k = 10
    out = dsir_resample_topk(docs, F.col("lang") == "en", k=k).collect()
    assert sorted(r["sel_rank"] for r in out) == list(range(1, k + 1))

    # local recomputation from the operator's own weights
    w = {r["doc_id"]: r["log_w"] for r in
         dsir_log_weights(docs, F.col("lang") == "en").collect()}

    def key(doc_id):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967297.0
        return math.log(u) / math.exp(w[doc_id])

    want = sorted(w, key=lambda d: (-key(d), d))[:k]
    got = [r["doc_id"] for r in sorted(out, key=lambda r: r["sel_rank"])]
    assert got == want

    # determinism: a second run selects the identical set in order
    again = dsir_resample_topk(docs, F.col("lang") == "en", k=k).collect()
    assert sorted((r["doc_id"], r["sel_rank"]) for r in again) == sorted(
        (r["doc_id"], r["sel_rank"]) for r in out
    )

    # bias: target-domain docs carry higher weights, so they dominate
    target_share = sum(1 for d in got if d < 100) / k
    assert target_share >= 0.8


def test_nb_hand_computed_two_classes(spark):
    """2-class fixture small enough to verify the full score formula:
    score(d,c) = ln prior(c) + sum ln(c_tc+1) - n_d * ln(c_c + V)."""
    train = _docs(
        spark,
        [
            (1, "en", "cat dog"),
            (2, "en", "cat fish"),
            (3, "de", "hund katze"),
        ],
    )
    test = spark.createDataFrame([(10, "cat cat")], "doc_id long, text string")
    out = nb_train_score(train, test, label_col="lang").collect()
    assert len(out) == 1
    row = out[0]
    # Vocab = {cat, dog, fish, hund, katze} -> V=5.
    # en: c_cat=2, c_c=4; prior 2/3. score_en = ln(2/3) + 2*ln(3) - 2*ln(9)
    score_en = math.log(2 / 3) + 2 * math.log(2 + 1) - 2 * math.log(4 + 5)
    # de: c_cat=0 -> in-vocab but no (cat,de) pair; ln_hits=0.
    score_de = math.log(1 / 3) + 0.0 - 2 * math.log(2 + 5)
    assert score_en > score_de
    assert row["predicted"] == "en"
    assert abs(row["score"] - round(score_en, 4)) < 1e-9


def test_nb_all_oov_doc_gets_prior_argmax(spark):
    """ADVICE r5 fix: a test doc whose tokens are entirely OOV (and a
    null-text doc) must still get a row predicting the prior-argmax
    class, not vanish."""
    train = _docs(
        spark,
        [
            (1, "en", "cat dog"),
            (2, "en", "cat fish"),
            (3, "de", "hund katze"),
        ],
    )
    test = spark.createDataFrame(
        [(10, "zzz qqq"), (11, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in nb_train_score(train, test, label_col="lang").collect()}
    assert set(out) == {10, 11}
    for i in (10, 11):
        # n_d = 0 -> score = ln prior; en has the larger prior (2/3).
        assert out[i]["predicted"] == "en"
        assert abs(out[i]["score"] - round(math.log(2 / 3), 4)) < 1e-9


def test_nb_tie_breaks_by_class_name(spark):
    """Equal priors, symmetric vocab -> exact score tie; the contract
    picks the lexicographically first class, deterministically."""
    train = _docs(spark, [(1, "b", "x"), (2, "a", "y")])
    test = spark.createDataFrame([(10, "zzz")], "doc_id long, text string")
    out = nb_train_score(train, test, label_col="lang").collect()
    assert out[0]["predicted"] == "a"


def test_selection_registry_queries_run(spark, sf_dir):
    """The registry wrappers execute on real testdata with stable
    schemas (the oracle equivalence is the driver gate's job)."""
    from python_plugins_spark.queries import QUERIES

    dsir = QUERIES["dsir_log_weights_docs"](spark, sf_dir)
    assert dsir.columns == ["doc_id", "n_tok", "log_w"]
    assert dsir.count() > 0
    nb = QUERIES["nb_classify_docs"](spark, sf_dir)
    assert nb.columns == ["doc_id", "predicted", "score"]
    # one row per held-out doc, even all-OOV ones
    n_test = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 5 == 0)
        .count()
    )
    assert nb.count() == n_test
