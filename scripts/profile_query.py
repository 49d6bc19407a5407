"""Per-job profile of one registry query (round 12 optimization tool).

Runs a query standalone with the UI enabled, materializes it via the
bench's noop convention, then dumps every Spark job (description,
duration, stage input/shuffle bytes) from the UI REST API — the
"which of the N actions inside this query burns the time" view that
wall-clock alone cannot give. Usage:

    python scripts/profile_query.py <query> [sf_dir] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "true")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 1
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

    from python_plugins_spark import get_spark
    from python_plugins_spark.queries import QUERIES

    spark = get_spark("profile")
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    fn = QUERIES[name]

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # warm pass on the smallest SF (codegen/JIT), same as bench
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        try:
            materialize(fn(spark, warm_dir))
        except Exception as exc:
            print(f"# warm failed: {exc}", file=sys.stderr)

    for r in range(runs):
        jobs_before = _jobs(ui, app_id)
        seen = {j["jobId"] for j in jobs_before}
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        materialize(df)
        dt = time.perf_counter() - t0
        jobs = [j for j in _jobs(ui, app_id) if j["jobId"] not in seen]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name} run {r}: total {dt:.3f}s (plan build {t_build:.3f}s), {len(jobs)} jobs ===")
        for j in jobs:
            sub = j.get("submissionTime", "")
            dur = _dur(j)
            desc = (j.get("description") or j.get("name") or "")[:110]
            print(f"  job {j['jobId']:>4} {dur:8.3f}s  stages={j.get('numTasks', '?'):>5} tasks  {desc}")
        total_job = sum(_dur(j) for j in jobs)
        print(f"  sum(job durations) {total_job:.3f}s; gap (driver/plan) {dt - total_job:.3f}s")
    spark.stop()


def _dur(j) -> float:
    from datetime import datetime

    fmt = "%d-%m-%Y %H:%M:%S GMT" if "GMT" in str(j.get("submissionTime", "")) else None
    try:
        st = _parse(j["submissionTime"])
        en = _parse(j["completionTime"])
        return (en - st).total_seconds()
    except Exception:
        return -1.0


def _parse(s: str):
    from datetime import datetime

    return datetime.strptime(s.replace("GMT", "").strip(), "%Y-%m-%dT%H:%M:%S.%f")


def _jobs(ui: str, app_id: str):
    url = f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
    with urllib.request.urlopen(url) as fh:
        return json.load(fh)


if __name__ == "__main__":
    main()
