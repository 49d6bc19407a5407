"""Text analysis operators for training-data pipelines.

All expression-only (no Python UDFs): every scorer is a deterministic
formula over built-in string/array functions, with a DuckDB oracle twin
so the driver hash-verifies each one. At 100 TB these are single
narrow projection passes — no shuffle at all until the final
aggregation a caller might add.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_plugins_spark.functions import (
    BPE_TOKEN_PATTERN,
    LANG_STOPWORDS,
    STOPWORDS_EN,
    cjk_count,
    digit_count,
    punct_count,
    stopword_hits,
    tokens,
)
from python_plugins_spark.functions import oracle_fragments as O
from python_plugins_spark.operators.dedup import fingerprint_col, sql_fingerprint


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document stats: char/token counts, mean token length,
    punctuation/digit/stopword ratios — the standard quality-filter
    features."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tokens = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, v: acc + v
    )
    out = df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(tok_chars.cast("double") / n_tokens, 6).alias("avg_token_len"),
        F.round(punct_count(t).cast("double") / F.length(t), 6).alias("punct_ratio"),
        F.round(digit_count(t).cast("double") / F.length(t), 6).alias("digit_ratio"),
        F.round(
            stopword_hits(toks, STOPWORDS_EN).cast("double") / n_tokens, 6
        ).alias("stopword_ratio"),
    )
    return out


def text_stats_oracle_sql(table: str, text_col: str, id_col: str) -> str:
    toks = O.sql_tokens(text_col)
    sw = O.sql_stopword_hits("t", STOPWORDS_EN)
    return f"""
        WITH _t AS (SELECT {id_col}, {text_col} AS txt, {toks} AS t FROM {table})
        SELECT {id_col},
               length(txt) AS n_chars,
               len(t) AS n_tokens,
               round(list_reduce(list_transform(t, x -> length(x)), (a, b) -> a + b)::DOUBLE
                     / len(t), 6) AS avg_token_len,
               round({O.sql_punct_count('txt')}::DOUBLE / length(txt), 6) AS punct_ratio,
               round({O.sql_digit_count('txt')}::DOUBLE / length(txt), 6) AS digit_ratio,
               round({sw}::DOUBLE / len(t), 6) AS stopword_ratio
        FROM _t
    """


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Composite quality score in [0,1]:
    0.4 * min(n_tokens/100, 1) + 0.3 * (1 - punct_ratio)
    + 0.3 * min(stopword_ratio * 5, 1).
    The exact formula is the contract (mirrored in the oracle)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tokens = F.size(toks).cast("double")
    punct_ratio = punct_count(t).cast("double") / F.length(t)
    sw_ratio = stopword_hits(toks, STOPWORDS_EN).cast("double") / n_tokens
    score = (
        F.lit(0.4) * F.least(n_tokens / 100.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(sw_ratio * 5.0, F.lit(1.0))
    )
    return df.select(F.col(id_col), F.round(score, 6).alias("quality"))


def quality_score_oracle_sql(table: str, text_col: str, id_col: str) -> str:
    toks = O.sql_tokens(text_col)
    sw = O.sql_stopword_hits("t", STOPWORDS_EN)
    return f"""
        WITH _t AS (SELECT {id_col}, {text_col} AS txt, {toks} AS t FROM {table})
        SELECT {id_col},
               round(0.4 * least(len(t)::DOUBLE / 100.0, 1.0)
                   + 0.3 * (1.0 - {O.sql_punct_count('txt')}::DOUBLE / length(txt))
                   + 0.3 * least(({sw}::DOUBLE / len(t)::DOUBLE) * 5.0, 1.0), 6) AS quality
        FROM _t
    """


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: CJK characters present -> 'zh'; otherwise
    the language whose stopword list scores the most token hits, ties
    broken by fixed order en > de > fr > es; no hits -> 'unknown'."""
    t = F.col(text_col)
    toks = tokens(t)
    scores = {lang: stopword_hits(toks, words) for lang, words in LANG_STOPWORDS.items()}
    # fixed priority en > de > fr > es: built innermost-out, so the
    # outermost (first-checked) CASE is 'en' and ties resolve to it.
    order = ["en", "de", "fr", "es"]
    best = F.lit("unknown")
    for lang in reversed(order):
        cond = scores[lang] >= F.greatest(
            *[scores[o] for o in order if o != lang], F.lit(1)
        )
        best = F.when(cond, F.lit(lang)).otherwise(best)
    pred = F.when(cjk_count(t) > 0, F.lit("zh")).otherwise(best)
    return df.select(F.col(id_col), pred.alias("pred_lang"))


def lang_id_oracle_sql(table: str, text_col: str, id_col: str) -> str:
    toks = O.sql_tokens(text_col)
    order = ["en", "de", "fr", "es"]
    score_sql = {
        lang: O.sql_stopword_hits("t", LANG_STOPWORDS[lang]) for lang in order
    }
    sel = ", ".join(f"{score_sql[lang]} AS sc_{lang}" for lang in order)
    best = "'unknown'"
    for lang in reversed(order):
        others = ", ".join(f"sc_{o}" for o in order if o != lang)
        best = f"CASE WHEN sc_{lang} >= greatest({others}, 1) THEN '{lang}' ELSE {best} END"
    return f"""
        WITH _t AS (SELECT {id_col}, {text_col} AS txt, {toks} AS t FROM {table}),
        _s AS (SELECT {id_col}, txt, {sel} FROM _t)
        SELECT {id_col},
               CASE WHEN {O.sql_cjk_count('txt')} > 0 THEN 'zh' ELSE {best} END AS pred_lang
        FROM _s
    """


def token_count(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token counts: whitespace words and a BPE-ish regex segmentation
    (letter runs | single digits | single punctuation) — the standard
    cheap proxy for LLM token budgeting."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(tokens(t)).cast("long").alias("n_words"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_PATTERN), 0)).cast("long").alias("n_bpe_tokens"),
    )


def token_count_oracle_sql(table: str, text_col: str, id_col: str) -> str:
    toks = O.sql_tokens(text_col)
    return f"""
        SELECT {id_col},
               len({toks}) AS n_words,
               len({O.sql_bpe_tokens(text_col)}) AS n_bpe_tokens
        FROM {table}
    """


def doc_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Content fingerprint: md5 over normalized text (dedup key), plus
    a 32-bit rolling-window min-hash ("winnowing-lite"): the minimum
    hash32 over 8-char windows of the normalized text — robust to small
    edits at the ends of a document."""
    from python_plugins_spark.functions import hash32, norm_text

    win = 8
    base = df.select(
        F.col(id_col),
        fingerprint_col(F.col(text_col)).alias("fingerprint"),
        norm_text(F.col(text_col)).alias("_nt"),
    )
    windows = F.when(
        F.length("_nt") >= win,
        F.expr(f"transform(sequence(1, length(_nt) - {win - 1}), i -> substring(_nt, i, {win}))"),
    ).otherwise(F.array(F.col("_nt")))
    return base.select(
        id_col,
        "fingerprint",
        F.array_min(F.transform(windows, hash32)).alias("min_window_hash"),
    )


def doc_fingerprint_oracle_sql(table: str, text_col: str, id_col: str) -> str:
    norm = O.sql_norm_text(text_col)
    win = 8
    return f"""
        WITH _t AS (SELECT {id_col}, {text_col}, {norm} AS nt FROM {table}),
        _w AS (
          SELECT {id_col}, {text_col},
                 CASE WHEN length(nt) >= {win}
                      THEN [substr(nt, i, {win}) for i in range(1, length(nt) - {win - 2})]
                      ELSE [nt] END AS ws
          FROM _t
        )
        SELECT {id_col},
               {sql_fingerprint(text_col)} AS fingerprint,
               list_min(list_transform(ws, w -> {O.sql_hash32('w')})) AS min_window_hash
        FROM _w
    """


def boilerplate_ngrams(
    df: DataFrame, text_col: str, id_col: str, shingle: int = 3, min_docs: int = 5
) -> DataFrame:
    """Word n-grams shared by >= ``min_docs`` distinct documents:
    the boilerplate/template-text signal. Returns (gram, n_docs)."""
    from python_plugins_spark.operators.dedup import shingle_rows

    sh = shingle_rows(df, text_col, id_col, shingle)
    return (
        sh.groupBy(F.col("_s").alias("gram"))
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def boilerplate_ngrams_oracle_sql(
    table: str, text_col: str, id_col: str, shingle: int, min_docs: int
) -> str:
    toks = O.sql_tokens(text_col)
    shingles = O.sql_word_shingles("t", shingle)
    return f"""
        WITH _tok AS (SELECT {id_col}, {toks} AS t FROM {table}),
        _sh AS (SELECT {id_col}, unnest({shingles}) AS gram FROM _tok)
        SELECT gram, count(DISTINCT {id_col}) AS n_docs
        FROM _sh GROUP BY gram HAVING count(DISTINCT {id_col}) >= {min_docs}
    """
