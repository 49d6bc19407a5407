"""Registry-wide window-shape lint (VERDICT r6 ask #1).

An unpartitioned window (``Window.orderBy(...)`` with no partitionBy)
collapses its ENTIRE input onto one task — invisible at sf0.1, fatal at
100 TB (Spark even warns ``WindowExec: No Partition Defined``). Like
``test_registry_reachability`` did for dead code, this test makes the
regression class structurally impossible: EVERY query in the registry
is built and its analyzed plan walked; a Window node with an empty
partitionSpec is only tolerated when

- a Limit bounds its input subtree (top-k re-rank — k rows on one task
  is the point), detected automatically from the plan; or
- the query is in the explicit allowlist below, each entry carrying the
  argument for why the window's input is bounded BY CONSTRUCTION at any
  corpus scale (calendar-grain spines: one row per hour/day — a decade
  of hours is 87,600 rows on one task).

Anything else fails with the offending node's plan fragment.
"""

import pytest

from python_plugins_spark.plans import unpartitioned_unbounded_windows
from python_plugins_spark.queries import QUERIES

# query -> why its unpartitioned window input is bounded by construction
BOUNDED_BY_CONSTRUCTION = {
    # Hourly spine: explode(sequence(min_hour, max_hour)) — one row per
    # hour of the corpus time range, not per event.
    "locf_carry_forward": "hourly gap-fill spine (1 row/hour)",
    "gap_interpolate_linear": "hourly interpolation spine (1 row/hour)",
    # Day-grain revenue series: groupBy(date_trunc('day')) — one row per
    # calendar day before the lag/corr windows.
    "acf_daily_revenue": "daily revenue series (1 row/day)",
}


def test_no_unpartitioned_window_over_unbounded_input(spark, sf_dir):
    offenders = {}
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # build failures belong to other tests
            pytest.fail(f"{name}: query build failed during lint: {e!r}")
        hits = unpartitioned_unbounded_windows(df)
        if hits and name not in BOUNDED_BY_CONSTRUCTION:
            offenders[name] = hits[0][:160]
    assert not offenders, (
        "single-partition WindowExec over non-limit-bounded input "
        f"(add a fix, not an allowlist entry): {offenders}"
    )


def test_allowlist_entries_still_have_windows(spark, sf_dir):
    """An allowlist entry whose window disappeared is stale — drop it
    so the allowlist only ever shrinks for live reasons."""
    for name in BOUNDED_BY_CONSTRUCTION:
        df = QUERIES[name](spark, sf_dir)
        assert unpartitioned_unbounded_windows(df), f"stale allowlist entry: {name}"
