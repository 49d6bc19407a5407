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
    left_names = left.columns
    out_names = left_names + [f"{c}{suffix}" for c in value_cols]

    # Re-alias every right-side column to a fresh name: when left and
    # right derive from the same source, shared expression ids make
    # Spark prune/conflate columns across the cogroup (self-join
    # ambiguity); fresh aliases force distinct attributes.
    r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )

    def merge(lpdf, rpdf):
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        if len(rpdf) == 0:
            # empty right group: merge_asof chokes on the object-dtype
            # empty key column; emit nulls directly
            for c in value_cols:
                lpdf[f"{c}{suffix}"] = None
            return lpdf[out_names]
        rpdf = rpdf.sort_values("_r_ts", kind="mergesort")
        renamed = rpdf[["_r_ts"] + [f"_r_{c}" for c in value_cols]].rename(
            columns={f"_r_{c}": f"{c}{suffix}" for c in value_cols}
        )
        merged = pd.merge_asof(
            lpdf, renamed, left_on=left_ts, right_on="_r_ts", direction="backward"
        )
        return merged[out_names]

    grouped = left.groupBy(on).cogroup(r.groupBy(on))
    return grouped.applyInPandas(merge, out_schema)
