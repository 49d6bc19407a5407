"""Gopher/MassiveText REPETITION filters (Rae et al. 2021, table A1).

The rule set every serious pretraining pipeline runs alongside the
threshold rules in :mod:`operators.text`: documents dominated by
repeated lines, paragraphs, or n-grams are template soup / SEO spam,
and the signals are WITHIN-document statistics:

- duplicate line / paragraph fraction, and the fraction of characters
  inside those duplicates;
- top n-gram character fraction for n = 2, 3, 4 (how much of the text
  the single most repeated n-gram covers);
- duplicated n-gram character fraction for n = 5..10 (how much of the
  text is covered by ANY n-gram occurring twice or more — a position
  MASK, so overlapping occurrences are not double-counted).

Exact semantics (every number is a ratio of INTEGERS, so the DuckDB
oracle reproduces them bit-for-bit before the 6 dp round):

- lines = '\\n'-split, each trimmed, empties dropped; paragraphs =
  '\\n\\n'-split, same cleanup. dup_frac = (n - n_distinct) / n;
  dup_char_frac = sum over groups of (count-1) * len / sum of len.
- words = whitespace tokens; total_word_chars = sum of word lengths
  (separators excluded, the DataTrove convention).
- top_{n}gram_char_frac = max over n-grams occurring >= 2 times of
  count * chars(ngram) / total_word_chars (0 when nothing repeats;
  chars(ngram) = sum of its word lengths). The max is taken over the
  integer PRODUCT, so ties cannot make the result ambiguous.
- dup_{n}gram_char_frac = sum of len(word_i) over word POSITIONS i
  covered by at least one occurrence of an n-gram with count >= 2,
  / total_word_chars.

``passes_repetition`` applies the paper's thresholds (<= 0.30 / 0.30
line/para dup fraction, <= 0.20 / 0.20 char fractions, top 2/3/4-gram
<= 0.20 / 0.18 / 0.16, dup 5..10-gram <= 0.15 / 0.14 / 0.13 / 0.12 /
0.11 / 0.10).

Engine shape: one Arrow-batched pandas UDF (Counter + a position
mask per document — linear in document size) over the scan: ZERO
SHUFFLES at any corpus size, the langid/NFC precedent (the pure-
expression formulation would be an O(words^2) interpreted HOF per
document). The oracle recomputes everything relationally per doc_id
(unnest + group + join), which is slower but independent.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd  # noqa: F401 — resolves postponed type hints in pandas UDFs
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)
THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}
_METRICS = list(THRESHOLDS)


def _clean_split(text: str, sep: str) -> list[str]:
    # explicit strip set (space/tab/CR/LF) so the DuckDB oracle's
    # trim(x, ' ' || chr(9) || chr(10) || chr(13)) is char-identical
    return [p for p in (q.strip(" \t\n\r") for q in text.split(sep)) if p]


def _dup_stats(items: list[str]) -> tuple[float, float]:
    if not items:
        return 0.0, 0.0
    c = Counter(items)
    n = len(items)
    total_chars = sum(len(x) for x in items)
    dup_frac = (n - len(c)) / n
    dup_chars = sum((cnt - 1) * len(x) for x, cnt in c.items() if cnt > 1)
    return dup_frac, (dup_chars / total_chars if total_chars else 0.0)


def repetition_signals_py(text: str) -> dict[str, float]:
    """Scalar reference implementation (shared by the UDF and tests)."""
    text = text or ""
    out: dict[str, float] = {}
    out["dup_line_frac"], out["dup_line_char_frac"] = _dup_stats(
        _clean_split(text, "\n")
    )
    out["dup_para_frac"], out["dup_para_char_frac"] = _dup_stats(
        _clean_split(text, "\n\n")
    )
    words = text.split()
    wlens = [len(w) for w in words]
    total = sum(wlens)
    for n in TOP_NS:
        best = 0
        if total and len(words) >= n:
            c = Counter(tuple(words[i: i + n]) for i in range(len(words) - n + 1))
            for ng, cnt in c.items():
                if cnt >= 2:
                    prod = cnt * sum(len(w) for w in ng)
                    if prod > best:
                        best = prod
        out[f"top_{n}gram_char_frac"] = best / total if total else 0.0
    for n in DUP_NS:
        covered = 0
        if total and len(words) >= n:
            c = Counter(tuple(words[i: i + n]) for i in range(len(words) - n + 1))
            mask = [False] * len(words)
            for i in range(len(words) - n + 1):
                if c[tuple(words[i: i + n])] >= 2:
                    for j in range(i, i + n):
                        mask[j] = True
            covered = sum(w for w, m in zip(wlens, mask) if m)
        out[f"dup_{n}gram_char_frac"] = covered / total if total else 0.0
    return out


def repetition_signals_fast(text: str) -> dict[str, float]:
    """Optimized exact twin of :func:`repetition_signals_py` (the
    UDF's hot path; equivalence-tested against the scalar reference).
    Same integer arithmetic, restructured: per n the n-gram tuples
    build ONCE via C-level ``zip`` (the reference re-slices each
    window twice), char lengths come from one cumulative array instead
    of per-gram ``sum(len(w))``, and the dup-n-gram COVER merges
    sorted duplicate intervals (``cum[end]-cum[start]`` per merged
    run) instead of painting a per-position boolean mask. Bit-identical
    by construction — everything is integer counts over the same
    windows."""
    text = text or ""
    out: dict[str, float] = {}
    out["dup_line_frac"], out["dup_line_char_frac"] = _dup_stats(
        _clean_split(text, "\n")
    )
    out["dup_para_frac"], out["dup_para_char_frac"] = _dup_stats(
        _clean_split(text, "\n\n")
    )
    words = text.split()
    nw = len(words)
    cum = [0] * (nw + 1)  # cum[i] = chars in words[:i]
    for i, w in enumerate(words):
        cum[i + 1] = cum[i] + len(w)
    total = cum[nw]

    for n in TOP_NS:
        best = 0
        if total and nw >= n:
            grams = list(zip(*(words[k:] for k in range(n))))
            c = Counter(grams)
            repeated = {g for g, cnt in c.items() if cnt >= 2}
            if repeated:
                seen: dict[tuple, int] = {}
                for i, g in enumerate(grams):
                    if g in repeated and g not in seen:
                        prod = c[g] * (cum[i + n] - cum[i])
                        if prod > best:
                            best = prod
                        seen[g] = i
                        if len(seen) == len(repeated):
                            break
        out[f"top_{n}gram_char_frac"] = best / total if total else 0.0
    for n in DUP_NS:
        covered = 0
        if total and nw >= n:
            grams = list(zip(*(words[k:] for k in range(n))))
            c = Counter(grams)
            cur_end = 0
            for i, g in enumerate(grams):
                if c[g] >= 2:
                    end = i + n
                    start = i if i >= cur_end else cur_end
                    if end > start:
                        covered += cum[end] - cum[start]
                        cur_end = end
        out[f"dup_{n}gram_char_frac"] = covered / total if total else 0.0
    return out


def gopher_repetition(
    df: DataFrame,
    text_col: str,
    id_col: str,
    carry: list[str] | None = None,
) -> DataFrame:
    """(id, 13 repetition signals rounded to 6 dp, passes_repetition).
    One Arrow-batched narrow map; zero shuffles. ``carry`` lists extra
    input columns to pass through (the pipeline stage carries the
    whole row this way — a narrow projection, never a join-back)."""
    carry = [c for c in (carry or []) if c != id_col]

    @F.pandas_udf("array<double>")
    def _sig(col: pd.Series) -> pd.Series:
        rows = []
        for text in col:
            s = repetition_signals_fast(text)
            rows.append([s[m] for m in _METRICS])
        return pd.Series(rows)

    from python_plugins_spark.sources.io import spread_scan

    # round 12 (guide §2.5): the per-doc Counter passes are CPU-bound
    # Python; a 1-split scan would run them all on one core
    d = spread_scan(df).select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        _sig(F.col(text_col)).alias("_s"),
    )
    cols = [
        F.round(F.element_at("_s", i + 1), 6).alias(m)
        for i, m in enumerate(_METRICS)
    ]
    passes = None
    for i, m in enumerate(_METRICS):
        c = F.element_at("_s", i + 1) <= THRESHOLDS[m]
        passes = c if passes is None else (passes & c)
    return d.select(
        id_col, *carry, *cols, passes.alias("passes_repetition")
    )


def gopher_repetition_oracle_sql(
    table: str, text_expr: str, id_col: str
) -> str:
    """DuckDB twin: the same integer ratios computed relationally —
    unnest lines/paras/word-positions per doc, group counts, a
    DISTINCT-position cover join for the dup-n-gram masks."""
    top_sel = []
    for n in TOP_NS:
        top_sel.append(
            f"""
    top{n} AS (
      SELECT s.{id_col},
             max(g.cnt * g.nchars) AS best
      FROM (
        SELECT {id_col},
               array_to_string(ws[i : i + {n - 1}], ' ') AS ng,
               count(*) AS cnt,
               length(array_to_string(ws[i : i + {n - 1}], ' ')) - {n - 1}
                 AS nchars
        FROM wpos
        WHERE i + {n - 1} <= nw
        GROUP BY 1, 2, 4
        HAVING count(*) >= 2
      ) g JOIN src s ON s.{id_col} = g.{id_col}
      GROUP BY 1
    )"""
        )
    dup_sel = []
    for n in DUP_NS:
        dup_sel.append(
            f"""
    dup{n} AS (
      SELECT {id_col}, sum(wlen) AS covered
      FROM (
        SELECT DISTINCT o.{id_col}, j.j
        FROM (
          SELECT {id_col}, i FROM (
            SELECT {id_col}, i,
                   count(*) OVER (
                     PARTITION BY {id_col},
                     array_to_string(ws[i : i + {n - 1}], ' ')
                   ) AS cnt
            FROM wpos WHERE i + {n - 1} <= nw
          ) WHERE cnt >= 2
        ) o, LATERAL (
          SELECT unnest(generate_series(o.i, o.i + {n - 1})) AS j
        ) j
      ) cov
      JOIN (SELECT {id_col} AS wid, i, length(ws[i]) AS wlen FROM wpos) w
        ON w.wid = cov.{id_col} AND w.i = cov.j
      GROUP BY 1
    )"""
        )
    top_cols = ",\n           ".join(
        f"round(coalesce(top{n}.best, 0)::DOUBLE / nullif(s.twc, 0), 6)"
        f" AS top_{n}gram_char_frac"
        for n in TOP_NS
    )
    dup_cols = ",\n           ".join(
        f"round(coalesce(dup{n}.covered, 0)::DOUBLE / nullif(s.twc, 0), 6)"
        f" AS dup_{n}gram_char_frac"
        for n in DUP_NS
    )
    joins = "\n    ".join(
        f"LEFT JOIN top{n} ON top{n}.{id_col} = s.{id_col}" for n in TOP_NS
    ) + "\n    " + "\n    ".join(
        f"LEFT JOIN dup{n} ON dup{n}.{id_col} = s.{id_col}" for n in DUP_NS
    )
    passes = " AND ".join(
        f"(coalesce(top{n}.best, 0)::DOUBLE / nullif(s.twc, 0)"
        f" <= {THRESHOLDS[f'top_{n}gram_char_frac']})"
        for n in TOP_NS
    ) + " AND " + " AND ".join(
        f"(coalesce(dup{n}.covered, 0)::DOUBLE / nullif(s.twc, 0)"
        f" <= {THRESHOLDS[f'dup_{n}gram_char_frac']})"
        for n in DUP_NS
    )

    def dup_group(src_list: str, pref: str) -> str:
        return f"""
    {pref}g AS (
      SELECT {id_col},
             count(*) AS n, count(DISTINCT x) AS nd,
             sum(length(x)) AS chars
      FROM (SELECT {id_col}, unnest({src_list}) AS x FROM src)
      GROUP BY 1
    ),
    {pref}d AS (
      SELECT {id_col}, sum((cnt - 1) * length(x)) AS dupchars
      FROM (
        SELECT {id_col}, x, count(*) AS cnt
        FROM (SELECT {id_col}, unnest({src_list}) AS x FROM src)
        GROUP BY 1, 2
      ) WHERE cnt >= 2 GROUP BY 1
    )"""

    return f"""
    WITH src AS (
      SELECT {id_col}, {text_expr} AS txt,
             list_filter(list_transform(str_split({text_expr}, chr(10)),
                         x -> trim(x, ' ' || chr(9) || chr(10) || chr(13))),
                         x -> length(x) > 0) AS ls,
             list_filter(list_transform(
                         str_split({text_expr}, chr(10) || chr(10)),
                         x -> trim(x, ' ' || chr(9) || chr(10) || chr(13))),
                         x -> length(x) > 0) AS ps,
             list_filter(str_split_regex({text_expr}, '\\s+'),
                         x -> length(x) > 0) AS ws,
             list_reduce(list_prepend(0,
               list_transform(list_filter(str_split_regex({text_expr},
                 '\\s+'), x -> length(x) > 0), x -> length(x))),
               (a, b) -> a + b) AS twc
      FROM {table}
    ),
    wpos AS (
      SELECT {id_col}, ws, len(ws) AS nw, i
      FROM src, LATERAL (
        SELECT unnest(generate_series(1, len(ws))) AS i
      )
    ),{dup_group('ls', 'line')},{dup_group('ps', 'para')},{','.join(top_sel)},{','.join(dup_sel)}
    SELECT s.{id_col},
           round(coalesce((lineg.n - lineg.nd)::DOUBLE / nullif(lineg.n, 0), 0), 6)
             AS dup_line_frac,
           round(coalesce(lined.dupchars, 0)::DOUBLE / nullif(lineg.chars, 0), 6)
             AS dup_line_char_frac,
           round(coalesce((parag.n - parag.nd)::DOUBLE / nullif(parag.n, 0), 0), 6)
             AS dup_para_frac,
           round(coalesce(parad.dupchars, 0)::DOUBLE / nullif(parag.chars, 0), 6)
             AS dup_para_char_frac,
           {top_cols},
           {dup_cols},
           ((coalesce((lineg.n - lineg.nd)::DOUBLE / nullif(lineg.n, 0), 0)
               <= {THRESHOLDS['dup_line_frac']})
            AND (coalesce(lined.dupchars, 0)::DOUBLE / nullif(lineg.chars, 0)
               <= {THRESHOLDS['dup_line_char_frac']})
            AND (coalesce((parag.n - parag.nd)::DOUBLE / nullif(parag.n, 0), 0)
               <= {THRESHOLDS['dup_para_frac']})
            AND (coalesce(parad.dupchars, 0)::DOUBLE / nullif(parag.chars, 0)
               <= {THRESHOLDS['dup_para_char_frac']})
            AND {passes}) AS passes_repetition
    FROM src s
    LEFT JOIN lineg ON lineg.{id_col} = s.{id_col}
    LEFT JOIN lined ON lined.{id_col} = s.{id_col}
    LEFT JOIN parag ON parag.{id_col} = s.{id_col}
    LEFT JOIN parad ON parad.{id_col} = s.{id_col}
    {joins}
    """
