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
    from python_plugins_spark.sources.io import spread_scan

    t = F.col(text_col)
    toks = tokens(t)
    n_tokens = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, v: acc + v
    )
    # interpreted array HOFs per document — spread a 1-split scan
    # across the cluster first (guide §2.5)
    out = spread_scan(df).select(
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


def quality_expr(text_col: str):
    """The composite quality score as a plain Column expression, so
    callers can attach it to any projection in the SAME corpus pass —
    no separate score frame, no self-join back on the id."""
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
    return F.round(score, 6)


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Composite quality score in [0,1]:
    0.4 * min(n_tokens/100, 1) + 0.3 * (1 - punct_ratio)
    + 0.3 * min(stopword_ratio * 5, 1).
    The exact formula is the contract (mirrored in the oracle)."""
    return df.select(F.col(id_col), quality_expr(text_col).alias("quality"))


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


def quality_percentile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-GROUP percentile rank of the quality score — the
    threshold-free filtering shape (FineWeb-style): 'keep the top X%
    of each domain' survives domains with wildly different absolute
    score distributions, where one global cutoff would empty some
    sources and keep junk from others. One window shuffle on the
    group key; ties broken by id so the rank is deterministic and
    engine-portable. The score attaches as an expression in the same
    projection — one corpus scan, no score-frame self-join."""
    from pyspark.sql import Window

    j = df.select(
        id_col, group_col, quality_expr(text_col).alias("quality")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("quality").asc(), F.col(id_col).asc()
    )
    return j.select(
        id_col,
        group_col,
        "quality",
        F.round(F.percent_rank().over(w), 6).alias("q_pctile"),
    )


def quality_percentile_oracle_sql(
    table: str, text_col: str, id_col: str, group_col: str
) -> str:
    q = quality_score_oracle_sql(table, text_col, id_col)
    return f"""
    WITH _q AS ({q})
    SELECT d.{id_col}, d.{group_col}, _q.quality,
           round(percent_rank() OVER (
               PARTITION BY d.{group_col}
               ORDER BY _q.quality ASC, d.{id_col} ASC
           ), 6) AS q_pctile
    FROM {table} d JOIN _q ON d.{id_col} = _q.{id_col}
    """


def quality_psi_drift(
    df: DataFrame,
    ref_cond,
    cur_cond,
    text_col: str = "text",
    id_col: str = "doc_id",
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two corpus slices'
    quality-score distributions — the standard drift monitor for a
    continuously-ingesting pipeline ("did this crawl batch's quality
    profile shift?"). Scores bin into ``bins`` equal-width buckets on
    [0, 1]; counts take add-one smoothing so empty bins stay exact
    (no epsilon constants to mirror); contrib = (p_ref - p_cur) *
    ln(p_ref / p_cur) per bin, PSI = their sum.

    Scale: ONE corpus scan — score and bin are expressions in the
    same projection (no score-frame self-join), and a single groupBy
    folds both slices' per-bin counts at once (conditional sums).
    The slice totals re-aggregate the ≤bins-row count table, so the
    heavy aggregate runs once and AQE reuses its shuffle."""
    tagged = df.select(
        F.col(id_col),
        ref_cond.cast("long").alias("_ref"),
        cur_cond.cast("long").alias("_cur"),
        F.least(
            F.floor(quality_expr(text_col) * bins), F.lit(bins - 1)
        ).cast("int").alias("bin"),
    )
    # one wide aggregate; the null-quality bin (if any) keeps its own
    # group so the slice totals below still count every row
    counts = tagged.groupBy("bin").agg(
        F.sum("_ref").alias("c_ref"), F.sum("_cur").alias("c_cur")
    )
    n = counts.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    spark = df.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    p_ref = (F.col("c_ref") + 1.0) / (F.col("n_ref") + F.lit(bins))
    p_cur = (F.col("c_cur") + 1.0) / (F.col("n_cur") + F.lit(bins))
    return (
        grid.join(counts, "bin", "left")
        .na.fill({"c_ref": 0, "c_cur": 0})
        .crossJoin(F.broadcast(n))
        .select(
            "bin",
            F.round(p_ref, 6).alias("p_ref"),
            F.round(p_cur, 6).alias("p_cur"),
            F.round((p_ref - p_cur) * F.log(p_ref / p_cur), 6).alias(
                "psi_contrib"
            ),
        )
    )


def quality_psi_drift_oracle_sql(
    table: str,
    ref_pred: str,
    cur_pred: str,
    text_col: str,
    id_col: str,
    bins: int = 10,
) -> str:
    q = quality_score_oracle_sql(table, text_col, id_col)
    return f"""
    WITH _q AS ({q}),
    tagged AS (
        SELECT d.{id_col}, ({ref_pred}) AS _ref, ({cur_pred}) AS _cur,
               least(CAST(floor(_q.quality * {bins}) AS INT), {bins - 1}) AS bin
        FROM {table} d JOIN _q ON d.{id_col} = _q.{id_col}
    ),
    ref AS (SELECT bin, count(*) AS c_ref FROM tagged WHERE _ref GROUP BY bin),
    cur AS (SELECT bin, count(*) AS c_cur FROM tagged WHERE _cur GROUP BY bin),
    n AS (
        SELECT sum(CASE WHEN _ref THEN 1 ELSE 0 END) AS n_ref,
               sum(CASE WHEN _cur THEN 1 ELSE 0 END) AS n_cur
        FROM tagged
    ),
    grid AS (SELECT i::INT AS bin FROM range(0, {bins}) t(i))
    SELECT grid.bin,
           round((coalesce(ref.c_ref, 0) + CAST(1.0 AS DOUBLE))
                 / (n.n_ref + {bins}), 6) AS p_ref,
           round((coalesce(cur.c_cur, 0) + CAST(1.0 AS DOUBLE))
                 / (n.n_cur + {bins}), 6) AS p_cur,
           round(((coalesce(ref.c_ref, 0) + CAST(1.0 AS DOUBLE))
                  / (n.n_ref + {bins})
                - (coalesce(cur.c_cur, 0) + CAST(1.0 AS DOUBLE))
                  / (n.n_cur + {bins}))
               * ln(((coalesce(ref.c_ref, 0) + CAST(1.0 AS DOUBLE))
                     / (n.n_ref + {bins}))
                  / ((coalesce(cur.c_cur, 0) + CAST(1.0 AS DOUBLE))
                     / (n.n_cur + {bins}))), 6) AS psi_contrib
    FROM grid LEFT JOIN ref ON grid.bin = ref.bin
              LEFT JOIN cur ON grid.bin = cur.bin, n
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


# Gopher quality-filter rules (public "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher" paper, Rae et al.
# 2021, Table A1) — the deterministic subset, with the exact constants
# as the operator contract:
GOPHER_STOP_SET = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document Gopher filter verdicts: one boolean per rule plus
    the conjunction. Rules (paper constants):

    - ``ok_word_count``: 50 <= #words <= 100000
    - ``ok_mean_word_len``: 3 <= mean word length <= 10
    - ``ok_symbol_ratio``: (# '#' occurrences + # '...' occurrences)
      / #words <= 0.1
    - ``ok_bullet_lines``: <= 90% of lines start with a bullet
      ('-' or '*')
    - ``ok_ellipsis_lines``: <= 30% of lines end with '...'
    - ``ok_alpha_words``: >= 80% of words contain a letter
    - ``ok_stopwords``: contains >= 2 distinct words of
      {the, be, to, of, and, that, have, with}

    All expression-level (array HOFs — linear per document, no UDFs,
    no shuffle: a pure projection pass that composes with any
    filter/sample downstream)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_w = F.size(toks).cast("double")
    mean_wl = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
        .cast("double") / n_w
    )
    n_hash = F.size(F.split(t, "#", -1)) - 1
    n_ell = F.size(F.split(t, r"\.\.\.", -1)) - 1
    lines = F.split(t, "\n", -1)
    n_lines = F.size(lines).cast("double")
    bullet_frac = (
        F.size(F.filter(lines, lambda l: F.trim(l).rlike("^[-*]"))).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike("\\.\\.\\.$"))).cast("double")
        / n_lines
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]"))).cast("double") / n_w
    )
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOP_SET])
    n_stops = F.size(F.array_intersect(toks, stop_arr))

    rules = {
        "ok_word_count": (n_w >= 50) & (n_w <= 100000),
        "ok_mean_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "ok_symbol_ratio": ((n_hash + n_ell).cast("double") / n_w) <= 0.1,
        "ok_bullet_lines": bullet_frac <= 0.9,
        "ok_ellipsis_lines": ellipsis_frac <= 0.3,
        "ok_alpha_words": alpha_frac >= 0.8,
        "ok_stopwords": n_stops >= 2,
    }
    passes = None
    for c in rules.values():
        passes = c if passes is None else (passes & c)
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in rules.items()],
        passes.alias("passes_gopher"),
    )


def gopher_rules_oracle_sql(table: str, text_col: str, id_col: str) -> str:
    toks = O.sql_tokens(text_col)
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOP_SET)
    return f"""
        WITH _t AS (SELECT {id_col}, {text_col} AS txt, {toks} AS t FROM {table}),
        _m AS (
          SELECT {id_col},
            len(t)::DOUBLE AS n_w,
            list_reduce(list_transform(t, x -> length(x)), (a, b) -> a + b)::DOUBLE
              / len(t) AS mean_wl,
            (length(txt) - length(replace(txt, '#', ''))) AS n_hash,
            (length(txt) - length(replace(txt, '...', ''))) / 3 AS n_ell,
            str_split(txt, chr(10)) AS lines,
            len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
              / len(t) AS alpha_frac,
            len(list_intersect(t, [{stops}])) AS n_stops
          FROM _t
        )
        SELECT {id_col},
          (n_w >= 50 AND n_w <= 100000) AS ok_word_count,
          (mean_wl >= 3.0 AND mean_wl <= 10.0) AS ok_mean_word_len,
          ((n_hash + n_ell)::DOUBLE / n_w <= 0.1) AS ok_symbol_ratio,
          (len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*]')))::DOUBLE
             / len(lines) <= 0.9) AS ok_bullet_lines,
          (len(list_filter(lines, l -> regexp_matches(rtrim(l), '\\.\\.\\.$')))::DOUBLE
             / len(lines) <= 0.3) AS ok_ellipsis_lines,
          (alpha_frac >= 0.8) AS ok_alpha_words,
          (n_stops >= 2) AS ok_stopwords,
          ((n_w >= 50 AND n_w <= 100000)
           AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
           AND ((n_hash + n_ell)::DOUBLE / n_w <= 0.1)
           AND (len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*]')))::DOUBLE
                  / len(lines) <= 0.9)
           AND (len(list_filter(lines, l -> regexp_matches(rtrim(l), '\\.\\.\\.$')))::DOUBLE
                  / len(lines) <= 0.3)
           AND (alpha_frac >= 0.8)
           AND (n_stops >= 2)) AS passes_gopher
        FROM _m
    """


def canonicalize_url(url: Column) -> Column:
    """Common-Crawl-style URL canonicalization, expression-only (zero
    Python in the hot path): lowercase scheme+host, strip default
    ports (:80 http / :443 https), drop the fragment, remove utm_*
    tracking parameters, sort the surviving query parameters, and
    normalize an empty path to '/'. Two raw URLs that differ only in
    these respects canonicalize identically — the key the crawl-dedup
    group-by runs on."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = (
        F.when(
            (scheme == "https") & hostport.endswith(":443"),
            F.substring(hostport, 1, F.length(hostport) - 4),
        )
        .when(
            (scheme == "http") & hostport.endswith(":80"),
            F.substring(hostport, 1, F.length(hostport) - 3),
        )
        .otherwise(hostport)
    )
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(rawq, "&"),
        lambda p: (F.length(p) > 0) & ~p.startswith("utm_"),
    )
    q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def canonicalize_url_sql(url_expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` (same steps, DuckDB
    list lambdas)."""
    scheme = f"lower(regexp_extract({url_expr}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = f"lower(regexp_extract({url_expr}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))"
    host = (
        f"CASE WHEN {scheme} = 'https' AND {hostport} LIKE '%:443' "
        f"THEN substr({hostport}, 1, length({hostport}) - 4) "
        f"WHEN {scheme} = 'http' AND {hostport} LIKE '%:80' "
        f"THEN substr({hostport}, 1, length({hostport}) - 3) "
        f"ELSE {hostport} END"
    )
    path = (
        f"CASE WHEN regexp_extract({url_expr}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) = '' THEN '/' "
        f"ELSE regexp_extract({url_expr}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) END"
    )
    rawq = f"regexp_extract({url_expr}, '\\?([^#]*)', 1)"
    q = (
        f"array_to_string(list_sort(list_filter(str_split({rawq}, '&'), "
        f"p -> length(p) > 0 AND NOT starts_with(p, 'utm_'))), '&')"
    )
    return (
        f"({scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END)"
    )
