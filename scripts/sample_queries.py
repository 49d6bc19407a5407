"""Stratified CORRECTNESS-sample helper.

The driver's correctness gate samples ~50 of the registry's ~385
queries per round; a uniform sample can miss exactly the queries a
round just added (round 7's nine new queries appeared only in the
local full sweep, not the driver's `CORRECTNESS_r07.json`). This
helper emits a stratified sample that always covers:

1. the N most recently ADDED queries (git-blame timestamp of each
   ``@register("name"`` line — registration recency, not file mtime);
2. at least one query per registry module (the §2c category proxy:
   core_relational, tpch_deep, warehouse, sources_sinks, lm_mining,
   corpus_sql4, sql_training, subqueries_udf, suites, graph_diag);
3. round-robin fill across modules up to the sample size, newest
   first within each module.

Usage:
    python scripts/sample_queries.py [k] [newest_n]     # default 50 15

Prints one JSON array of query names to stdout (driver-consumable);
a human-readable breakdown goes to stderr.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERY_DIR = os.path.join(REPO, "python_plugins_spark", "queries")

_REG_RE = re.compile(r"@register\(\s*$|@register\(\s*['\"](?P<name>\w+)['\"]")
_NAME_RE = re.compile(r"^\s*['\"](?P<name>\w+)['\"]")


def registration_sites() -> list[tuple[str, str, int]]:
    """(query_name, module_file, line_no) for every @register call —
    handles both ``@register("name", ...)`` and the multiline form
    where the name sits on the following line."""
    sites = []
    for fname in sorted(os.listdir(QUERY_DIR)):
        if not fname.endswith(".py") or fname.startswith("__"):
            continue
        path = os.path.join(QUERY_DIR, fname)
        lines = open(path, encoding="utf-8").read().splitlines()
        for i, line in enumerate(lines):
            m = _REG_RE.search(line)
            if not m:
                continue
            name = m.groupdict().get("name")
            if not name and i + 1 < len(lines):
                m2 = _NAME_RE.match(lines[i + 1])
                name = m2.group("name") if m2 else None
            if name:
                sites.append((name, fname, i + 1))
    return sites


def blame_times(fname: str) -> dict[int, int]:
    """line_no -> author-time epoch for one file (line-porcelain)."""
    out = subprocess.run(
        ["git", "blame", "--line-porcelain",
         os.path.join("python_plugins_spark", "queries", fname)],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    times: dict[int, int] = {}
    lineno = 0
    t = 0
    for raw in out.splitlines():
        if re.match(r"^[0-9a-f]{40} \d+ (\d+)", raw):
            lineno = int(raw.split()[2])
        elif raw.startswith("author-time "):
            t = int(raw.split()[1])
        elif raw.startswith("\t"):
            times[lineno] = t
    return times


def stratified_sample(k: int = 50, newest_n: int = 15) -> list[str]:
    sites = registration_sites()
    per_file_times: dict[str, dict[int, int]] = {}
    stamped = []
    for name, fname, line in sites:
        if fname not in per_file_times:
            try:
                per_file_times[fname] = blame_times(fname)
            except Exception:
                per_file_times[fname] = {}
        stamped.append((name, fname, per_file_times[fname].get(line, 0)))

    newest = sorted(stamped, key=lambda s: -s[2])[:newest_n]
    picked: list[str] = []
    seen: set[str] = set()
    for name, _f, _t in newest:
        if name not in seen:
            picked.append(name)
            seen.add(name)

    by_module: dict[str, list[tuple[str, int]]] = defaultdict(list)
    for name, fname, t in stamped:
        by_module[fname].append((name, t))
    for fname in by_module:
        by_module[fname].sort(key=lambda nt: -nt[1])  # newest first

    # round-robin across modules until k names are picked
    idx = {f: 0 for f in by_module}
    modules = sorted(by_module)
    while len(picked) < k:
        progressed = False
        for f in modules:
            if len(picked) >= k:
                break
            lst = by_module[f]
            while idx[f] < len(lst) and lst[idx[f]][0] in seen:
                idx[f] += 1
            if idx[f] < len(lst):
                name = lst[idx[f]][0]
                picked.append(name)
                seen.add(name)
                idx[f] += 1
                progressed = True
        if not progressed:
            break
    print(
        f"# {len(picked)} names: {newest_n} newest + per-module "
        f"round-robin over {len(modules)} modules",
        file=sys.stderr,
    )
    return picked


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    newest_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    print(json.dumps(stratified_sample(k, newest_n)))
