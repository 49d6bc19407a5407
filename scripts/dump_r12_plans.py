"""Dump `.explain("formatted")` for named queries into plans/r12/
as <query>_<suffix>.txt — the round-12 optimization evidence files.

Usage: python scripts/dump_r12_plans.py <suffix> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from python_plugins_spark import get_spark
    from python_plugins_spark.queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_r12_plans")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            plan = f"PLAN DUMP FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n"
                "# NOTE: queries that build/ingest a persisted index or\n"
                "# write inside the query function show only the plan of\n"
                "# the RETURNED frame (internal passes already ran; a\n"
                "# checkpoint shows as an ExistingRDD scan). Job-level\n"
                "# evidence for those lives in OPTIMIZATION_r12.md\n"
                "# (scripts/profile_query.py output).\n\n"
            )
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
