"""Shared scalar-expression builders (JVM-side, codegen-friendly).

Every function here returns a ``pyspark.sql.Column`` built purely from
built-in functions — no Python UDFs — so the hot path stays inside
whole-stage codegen. Each builder has a DuckDB-SQL twin in
:mod:`python_plugins_spark.functions.oracle_fragments` used by the
oracle-SQL generators; the two must stay in lockstep (same hashing
constants, same regexes, same arithmetic order) because the driver
hash-compares Spark output against DuckDB output.

Hashing design note: both engines share ``md5`` but not ``hash``
(Spark=Murmur3, DuckDB=own). All content hashing therefore derives
from md5 hex prefixes converted to integers:

- ``hash32`` — first 8 hex chars -> [0, 2^32) (minhash base)
- ``hash60`` — first 15 hex chars -> [0, 2^60) (simhash base, fits
  signed 64-bit in both engines with headroom for bit ops)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# MinHash universe: prime just above 2^32 so hash32 values need no
# pre-reduction; permutation multipliers stay < 2^16 so a*h+b < 2^48
# never overflows signed 64-bit in either engine.
MINHASH_PRIME = 4294967311

# Stopword sets for the heuristic scorers. Deliberately tiny and
# hard-coded: they are part of the operator's deterministic contract
# (mirrored literally in the oracle SQL).
STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
LANG_STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "para"),
}

BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def norm_text(col: Column) -> Column:
    """lower + trim + collapse runs of whitespace to one space."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokens of the lower-cased, trimmed text."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def word_shingles(toks: Column, n: int) -> Column:
    """n-word shingles joined by single spaces; empty array when the
    document has fewer than n tokens (guards Spark's descending
    ``sequence(1, 0)`` pitfall)."""
    make = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, make).otherwise(F.array().cast("array<string>"))


def hash32(col: Column) -> Column:
    """md5-derived 32-bit content hash as BIGINT (engine-portable)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


#: Width of :func:`hash60` in bits (15 hex chars x 4). Lives HERE,
#: beside the implementation, because the persisted span-dedup index
#: stamps it as its format version — a width change must move both or
#: the ingest equi-join silently zero-matches old indexes.
HASH60_BITS = 60


def hash60(col: Column) -> Column:
    """md5-derived 60-bit content hash as BIGINT (bit-op safe);
    width exported as :data:`HASH60_BITS`."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_perm(hashes: Column, a: int, b: int) -> Column:
    """min over the shingle-hash set of the permutation (a*h+b) mod p."""
    return F.array_min(
        F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine over two float arrays, computed element-order
    sequentially in double precision — the identical operation order
    (cast-then-multiply, left-fold add from 0.0) is mirrored in the
    oracle fragment so results match bit-for-bit."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nb = F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return dot / (F.sqrt(na) * F.sqrt(nb))


def punct_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))


def digit_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, r"[^0-9]", ""))


def cjk_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, "[^一-鿿]", ""))


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Occurrence count (not distinct) of tokens in the word set."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def json_get(col: Column, path: str) -> Column:
    """Extract a JSON field as string (reference users did this in
    Python script bodies; native here)."""
    return F.get_json_object(col, path)
