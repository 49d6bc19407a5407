"""Directive-based data preparation: a tiny recipe language over
DataFrame transformations.

The reference plugin's host platform family popularized step-wise
"recipes" for interactive data prep — an analyst writes one directive
per line (rename, set-type, mask, filter ...) and the platform
compiles the recipe onto the execution engine. This module is an
original, from-scratch interpreter for a small directive vocabulary
that compiles each step to a native Spark expression, so a whole
recipe stays one Catalyst plan: column pruning, pushdown, and codegen
apply across steps exactly as if the user had written the DataFrame
code by hand. No UDFs anywhere — every directive is expression-only.

Grammar: one directive per line/list element, shell-style tokens
(quotes group words). Unknown directives raise at compile time with
the line number — recipes fail at deploy, not mid-job (the same
deploy-time-validation stance as operators/transform.py).

Vocabulary (args in <>):

    drop <col> [<col> ...]
    keep <col> [<col> ...]
    rename <old> <new>
    set-type <col> <int|long|float|double|string|boolean|date|timestamp>
    set-column <new-col> <sql-expression>
    filter-rows-on <sql-expression>        # KEEPS rows where true
    fill-null-default <col> <value>
    uppercase <col> | lowercase <col> | trim <col>
    split-to-columns <col> <delim> <new-a> <new-b>
    mask-last-n <col> <n>                  # last n chars become '*'
"""

from __future__ import annotations

import shlex

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DirectiveError(ValueError):
    """Unknown directive or bad arity — raised at recipe compile time."""


def _need(tokens: list[str], n: int, line_no: int, usage: str) -> None:
    if len(tokens) - 1 != n:
        raise DirectiveError(
            f"line {line_no}: {tokens[0]!r} takes {n} argument(s): {usage}"
        )


def wrangle(df: DataFrame, directives: list[str] | str) -> DataFrame:
    """Apply a recipe (list of directives, or one newline-separated
    string) to ``df``; returns the transformed DataFrame (one fused
    Catalyst plan — directives are plan rewrites, not passes)."""
    if isinstance(directives, str):
        directives = [
            ln for ln in (s.strip() for s in directives.splitlines())
            if ln and not ln.startswith("#")
        ]
    for line_no, raw in enumerate(directives, 1):
        toks = shlex.split(raw)
        if not toks:
            continue
        op = toks[0].lower()
        if op == "drop":
            if len(toks) < 2:
                raise DirectiveError(f"line {line_no}: drop needs columns")
            df = df.drop(*toks[1:])
        elif op == "keep":
            if len(toks) < 2:
                raise DirectiveError(f"line {line_no}: keep needs columns")
            df = df.select(*toks[1:])
        elif op == "rename":
            _need(toks, 2, line_no, "rename <old> <new>")
            df = df.withColumnRenamed(toks[1], toks[2])
        elif op == "set-type":
            _need(toks, 2, line_no, "set-type <col> <type>")
            df = df.withColumn(toks[1], F.col(toks[1]).cast(toks[2]))
        elif op == "set-column":
            _need(toks, 2, line_no, "set-column <new-col> <expr>")
            df = df.withColumn(toks[1], F.expr(toks[2]))
        elif op == "filter-rows-on":
            _need(toks, 1, line_no, "filter-rows-on <expr>")
            df = df.filter(F.expr(toks[1]))
        elif op == "fill-null-default":
            _need(toks, 2, line_no, "fill-null-default <col> <value>")
            df = df.withColumn(
                toks[1], F.coalesce(F.col(toks[1]), F.lit(toks[2]).cast(df.schema[toks[1]].dataType))
            )
        elif op in ("uppercase", "lowercase", "trim"):
            _need(toks, 1, line_no, f"{op} <col>")
            fn = {"uppercase": F.upper, "lowercase": F.lower, "trim": F.trim}[op]
            df = df.withColumn(toks[1], fn(F.col(toks[1])))
        elif op == "split-to-columns":
            _need(toks, 4, line_no, "split-to-columns <col> <delim> <a> <b>")
            import re as _re

            # the directive delimiter is LITERAL; F.split takes a Java
            # regex, so '.' or '|' unescaped would split on everything
            parts = F.split(F.col(toks[1]), _re.escape(toks[2]), 2)
            df = df.withColumn(toks[3], parts.getItem(0)).withColumn(
                toks[4], parts.getItem(1)
            )
        elif op == "mask-last-n":
            _need(toks, 2, line_no, "mask-last-n <col> <n>")
            n = int(toks[2])
            c = F.col(toks[1])
            df = df.withColumn(
                toks[1],
                F.when(F.length(c) <= n, F.repeat(F.lit("*"), F.length(c).cast("int")))
                .otherwise(
                    F.concat(
                        c.substr(F.lit(1), F.length(c) - n),
                        F.repeat(F.lit("*"), n),
                    )
                ),
            )
        else:
            raise DirectiveError(f"line {line_no}: unknown directive {op!r}")
    return df
