"""Command-line entry point: ``python -m python_plugins_spark <cmd>``.

The reference plugin is driven through CDAP's studio/REST surface; the
standalone engine equivalent is this CLI — list the operator registry,
run a query against a scale-factor directory, inspect its physical
plan, or oracle-check it, without writing driver code.

Commands:
    list [substring]         registry names (optionally filtered)
    run <name> [--sf-dir D] [--show N]
    explain <name> [--sf-dir D]
    check <name> [...] [--sf-dir D]   Spark-vs-DuckDB oracle compare
    pipeline <spec.json>              run a JSON pipeline document
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="python_plugins_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registry queries")
    p_list.add_argument("substring", nargs="?", default="")

    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            p.add_argument("--show", type=int, default=20)

    p_check = sub.add_parser("check", help="oracle-compare queries")
    p_check.add_argument("queries", nargs="+")
    p_check.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    p_pipe = sub.add_parser("pipeline", help="run a JSON pipeline document")
    p_pipe.add_argument("spec", help="path to the pipeline spec JSON")
    p_pipe.add_argument("--show", type=int, default=0,
                        help="rows of each terminal stage to print")
    p_pipe.add_argument("--explain", action="store_true",
                        help="dry-run compile and print each terminal "
                             "stage's physical plan instead of running")

    p_lin = sub.add_parser(
        "lineage",
        help="compile a pipeline document (dry run) and print its "
        "field-lineage record as JSON",
    )
    p_lin.add_argument("spec", help="path to the pipeline spec JSON")

    args = parser.parse_args(argv)

    from python_plugins_spark.queries import ORACLES, QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            if args.substring in name:
                marker = " " if name in ORACLES else "  (no oracle)"
                print(f"{name}{marker}")
        return 0

    from python_plugins_spark import get_spark

    spark = get_spark("cli")
    try:
        if args.cmd == "run":
            df = QUERIES[args.query](spark, args.sf_dir)
            df.show(args.show, truncate=False)
            print(f"# {df.count()} rows", file=sys.stderr)
            return 0
        if args.cmd == "explain":
            from python_plugins_spark.plans import plan_str

            print(plan_str(QUERIES[args.query](spark, args.sf_dir)))
            return 0
        if args.cmd == "pipeline":
            import json as _json

            from python_plugins_spark.pipeline import run_pipeline

            with open(args.spec) as fh:
                spec = _json.load(fh)
            if args.explain:
                from python_plugins_spark.plans import plan_str

                frames = run_pipeline(spark, spec, dry_run=True)
                consumed = {c["from"] for c in spec.get("connections", [])}
                for name, df in frames.items():
                    if name not in consumed and not df.isStreaming:
                        print(f"== terminal stage {name} ==")
                        print(plan_str(df))
                return 0
            frames = run_pipeline(spark, spec)
            consumed = {c["from"] for c in spec.get("connections", [])}
            for name, df in frames.items():
                if name not in consumed:
                    print(f"# terminal stage {name}: {df.count()} rows",
                          file=sys.stderr)
                    if args.show:
                        df.show(args.show, truncate=False)
            return 0
        if args.cmd == "lineage":
            import json as _json

            from python_plugins_spark.pipeline import pipeline_field_lineage

            with open(args.spec) as fh:
                spec = _json.load(fh)
            print(_json.dumps(pipeline_field_lineage(spark, spec), indent=2))
            return 0
        if args.cmd == "check":
            import os
            import subprocess

            script = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "scripts",
                "check_correctness.py",
            )
            return subprocess.call(
                [sys.executable, script, args.sf_dir] + args.queries
            )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
