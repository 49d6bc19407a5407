"""Unicode text normalization — the first cleaning pass of every real
corpus pipeline, stdlib-only.

Web text arrives in mixed normalization forms: the same visible string
as precomposed codepoints ('é' U+00E9) or base+combining sequences
('e'+U+0301), compatibility singletons (ANGSTROM SIGN U+212B vs 'Å'
U+00C5), stray C0/C1 control characters, and tab/space soup. Exact
dedup, MinHash shingles, and tokenizers all treat those as DIFFERENT
bytes, silently splitting duplicate groups and inflating vocabularies;
normalizing FIRST is what makes every downstream content hash mean
what it claims.

The pipeline here (order is part of the contract — the SQL oracle
replays it verbatim):

1. Unicode NFC (``unicodedata.normalize`` — canonical composition;
   NFKC is offered too but has no DuckDB twin, so the oracle-checked
   registry path is NFC),
2. strip C0 controls + DEL (except ``\\t`` and ``\\n``, which step 3
   owns),
3. collapse horizontal whitespace runs (``[ \\t]+`` -> one space),
4. trim.

Spark shape: one Arrow-batched ``pandas_udf`` over the corpus scan (no
JVM Unicode-normalization builtin exists; this is the documented
Python-is-the-slow-path exception, embarrassingly parallel, zero
shuffles). Why not an expression: Spark SQL has no NFC function, and a
join against a codepoint mapping table would shuffle the corpus to
normalize it.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CONTROLS = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_HWS_RUNS = re.compile(r"[ \t]+")


def normalize_string(s: str, form: str = "NFC") -> str:
    """The scalar contract (shared by the UDF and the tests)."""
    s = unicodedata.normalize(form, s)
    s = _CONTROLS.sub("", s)
    s = _HWS_RUNS.sub(" ", s)
    return s.strip()


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    form: str = "NFC",
) -> DataFrame:
    """Append ``out_col`` = normalized ``text_col`` (nulls pass
    through). ``form`` is any ``unicodedata`` form (NFC/NFKC/NFD/NFKD);
    only NFC has an exact DuckDB oracle twin."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @F.pandas_udf("string")
    def _norm(col: pd.Series) -> pd.Series:
        return col.map(
            lambda s: None if s is None else normalize_string(s, form)
        )

    return df.withColumn(out_col, _norm(F.col(text_col)))
