"""As-of (point-in-time) join — an operator Spark lacks natively.

Two implementations with identical semantics (backward-inclusive: each
left row picks the latest right row with ``right_ts <= left_ts`` per
key):

- :func:`asof_join` — the scale path: union the two sides with a side
  tag, one window pass carries the latest right payload forward, filter
  back to left rows. Exactly one shuffle on (key, ts); no per-group
  Python, no skew beyond what the key distribution already has.
- :func:`asof_join_pandas` — ``applyInPandas`` + ``pd.merge_asof`` per
  key group; simpler, used to cross-check the union-window plan in
  tests and as a template for semantics Spark expressions can't reach.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join via union + last(ignorenulls) window.

    Right rows sort before left rows at equal timestamps (side tag 0 <
    1), making the join inclusive of simultaneous right rows — matching
    ``pd.merge_asof``'s default."""
    on = list(on)
    payload = F.struct(*[F.col(c) for c in value_cols]).alias("_asof_payload")
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload,
    )
    left_cols = left.columns
    l = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
    )
    # unionByName with the left's extra columns nulled on the right side
    r_full = r
    for c in left_cols:
        if c not in on:
            r_full = r_full.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l.unionByName(r_full.select(*l.columns))
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_carried", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col(f"_carried.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Reference implementation via pd.merge_asof per key group."""
    value_cols = list(value_cols)
    out_fields = list(left.schema.fields) + [
        T.StructField(f"{c}{suffix}", right.schema[c].dataType, True) for c in value_cols
    ]
    out_schema = T.StructType(out_fields)
    l_tag = left.withColumn("_side", F.lit(1))
    r_cols = [on, right_ts] + value_cols
    r_tag = right.select(*r_cols).withColumn("_side", F.lit(0))
    # align columns for cogroup via applyInPandas on the union key
    left_names = left.columns

    def merge(key, pdfs):
        lpdf, rpdf = pdfs
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        rpdf = rpdf.sort_values(right_ts, kind="mergesort")
        renamed = rpdf[[right_ts] + value_cols].rename(
            columns={c: f"{c}{suffix}" for c in value_cols}
        )
        merged = pd.merge_asof(
            lpdf,
            renamed,
            left_on=left_ts,
            right_on=right_ts if right_ts == left_ts else right_ts,
            direction="backward",
        )
        return merged[left_names + [f"{c}{suffix}" for c in value_cols]]

    grouped = left.groupBy(on).cogroup(right.select(*r_cols).groupBy(on))
    return grouped.applyInPandas(
        lambda key, l, r: merge(key, (l, r)), out_schema
    )
