"""DuckDB-SQL twins of the column builders in
:mod:`python_plugins_spark.functions`.

Each fragment is a format-string producing DuckDB SQL that computes the
exact same value as its Spark twin — same md5-derived hashing, same
regexes (translated Java-regex -> RE2 where syntax differs), same
floating-point operation order. Used by the per-operator oracle-SQL
generators; the driver hash-compares Spark results against these.
"""

from __future__ import annotations

from python_plugins_spark.functions import (
    BPE_TOKEN_PATTERN,
    LANG_STOPWORDS,
    MINHASH_PRIME,
)


def sql_norm_text(col: str) -> str:
    return f"regexp_replace(lower(trim({col})), '\\s+', ' ', 'g')"


def sql_tokens(col: str) -> str:
    return f"str_split_regex(lower(trim({col})), '\\s+')"


def sql_word_shingles(toks: str, n: int) -> str:
    # DuckDB list slice t[i : i+n-1] is 1-based inclusive, matching
    # Spark's slice(t, i, n).
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"[array_to_string(({toks})[i : i + {n - 1}], ' ') "
        f"for i in range(1, len({toks}) - {n - 2})] "
        f"ELSE [] END"
    )


def sql_hash32(col: str) -> str:
    return f"(('0x' || substr(md5({col}), 1, 8))::UBIGINT)::BIGINT"


def sql_hash60(col: str) -> str:
    return f"(('0x' || substr(md5({col}), 1, 15))::UBIGINT)::BIGINT"


def sql_minhash_perm(hashes: str, a: int, b: int) -> str:
    return f"list_min(list_transform({hashes}, h -> ({a} * h + {b}) % {MINHASH_PRIME}))"


def sql_cosine_similarity(a: str, b: str) -> str:
    """Element-order sequential double-precision cosine; left-fold from
    0.0 mirrors Spark's ``aggregate`` initial value (0.0 + x == x
    exactly, so list_reduce without an init is bit-identical)."""
    dot = (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> ({a})[i]::DOUBLE * ({b})[i]::DOUBLE), (x, y) -> x + y)"
    )
    na = (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> ({a})[i]::DOUBLE * ({a})[i]::DOUBLE), (x, y) -> x + y)"
    )
    nb = (
        f"list_reduce(list_transform(range(1, len({b}) + 1), "
        f"i -> ({b})[i]::DOUBLE * ({b})[i]::DOUBLE), (x, y) -> x + y)"
    )
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def sql_punct_count(col: str) -> str:
    return f"length(regexp_replace({col}, '[A-Za-z0-9\\s]', '', 'g'))"


def sql_digit_count(col: str) -> str:
    return f"length(regexp_replace({col}, '[^0-9]', '', 'g'))"


def sql_cjk_count(col: str) -> str:
    return f"length(regexp_replace({col}, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g'))"


def sql_stopword_hits(toks: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks}, t -> list_contains([{lst}], t)))"


def sql_bpe_tokens(col: str) -> str:
    return f"regexp_extract_all({col}, '{BPE_TOKEN_PATTERN}')"


__all__ = [
    "sql_norm_text",
    "sql_tokens",
    "sql_word_shingles",
    "sql_hash32",
    "sql_hash60",
    "sql_minhash_perm",
    "sql_cosine_similarity",
    "sql_punct_count",
    "sql_digit_count",
    "sql_cjk_count",
    "sql_stopword_hits",
    "sql_bpe_tokens",
    "LANG_STOPWORDS",
]
