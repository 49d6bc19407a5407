"""One-shot mechanical split of python_plugins_spark/queries.py into a
package of section modules (run once; kept for provenance).

Layout produced:
  python_plugins_spark/queries/__init__.py   -- re-exports, imports chunks in order
  python_plugins_spark/queries/_core.py      -- registry dicts, register(), shared helpers
  python_plugins_spark/queries/<chunk>.py    -- the section bodies, unchanged

Registry contents (names, oracle strings, registration order) are
byte-identical to the monolith; only file boundaries change.
"""

import re
from pathlib import Path

SRC = Path("python_plugins_spark/queries.py")
PKG = Path("python_plugins_spark/queries")

lines = SRC.read_text().splitlines(keepends=True)

# 1-indexed [start, end] inclusive chunk ranges at section boundaries.
CHUNKS = [
    ("core_relational", 119, 1752,
     "Relational core, the transform operator family, LLM-pipeline ops, "
     "streaming, and extended relational shapes (grouping sets, windows, "
     "percentiles)."),
    ("sources_sinks", 1753, 3206,
     "Sources & sinks (partitioned/bucketed/compacted parquet, CSV, JSON, "
     "ORC, Avro, JDBC, Delta, Iceberg, Python DataSources) and the "
     "LSH-bucketed embedding near-dup scale path."),
    ("subqueries_udf", 3207, 4325,
     "TPC-H subquery/outer-join/disjunctive shapes, higher-order "
     "functions, the Python-UDF surface (pandas_udf, UDTF, mapInArrow), "
     "bucketed joins, RANGE frames, gap-filled time series, statistical "
     "aggregates."),
    ("tpch_deep", 4326, 5881,
     "Remaining TPC-H shapes (q2/q7/q8/q9/q12/q15/q20/q21), the CDAP "
     "Avro-JSON schema surface, boilerplate detection, PII scrubbing."),
    ("sql_training", 5882, 7264,
     "SQL-surface widening (lateral join, GROUP BY ALL, regression "
     "aggregates), training-pipeline ops (contamination, repetition), "
     "global index, XML, funnels/cohorts, graph iteration, function-"
     "surface completeness, Spark-4 extensibility, URL/XPath/PII."),
    ("corpus_sql4", 7265, 8510,
     "Training-corpus curation II (splits, chunking, EWMA, PMI, packing) "
     "and the Spark 4 SQL authoring surface (SQL UDFs, pipe syntax, "
     "scripting, EXECUTE IMMEDIATE)."),
    ("warehouse", 8511, 9818,
     "Warehouse lifecycle: compaction, dynamic partition overwrite, "
     "write-audit-publish, SCD2, Delta/Iceberg registry queries, "
     "distribution diagnostics, exact-distinct structures."),
    ("graph_diag", 9819, 10541,
     "Graph extensions (BFS, structural similarity, label propagation, "
     "k-core), corpus reporting, containment dedup, imputation, "
     "communities, mergeable sketches (HLL, count-min)."),
    ("suites", 10542, None,
     "Operator-suite registrations: BM25/SemDeDup/RRF retrieval, record "
     "linkage, format conversion, ML-prep, streaming online dedup, "
     "persisted ANN index, tokenizer, wrangler, pipeline runner, "
     "recursive CTEs, temperature mixtures."),
]

IMPORT_HEADER = """\
from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves postponed type hints in pandas UDFs

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from python_plugins_spark.functions import oracle_fragments as OF  # noqa: F401
from python_plugins_spark.operators import dedup as D  # noqa: F401
from python_plugins_spark.operators import multimodal as MM  # noqa: F401
from python_plugins_spark.operators import relational as R  # noqa: F401
from python_plugins_spark.operators import similarity as S  # noqa: F401
from python_plugins_spark.operators import text as TX  # noqa: F401
from python_plugins_spark.operators.asof import asof_join  # noqa: F401
from python_plugins_spark.operators.transform import python_transform  # noqa: F401
from python_plugins_spark.sources.io import load_table  # noqa: F401

from python_plugins_spark.queries._core import (  # noqa: F401
    ORACLES, QUERIES, register, _global_index_part, _ts, _STRF,
)
"""

# Cross-chunk private helpers: defined in one chunk, used in later ones.
CROSS = {
    "_neardup_edges": "core_relational",
    "_SCRATCH": "sources_sinks",
}

PKG.mkdir(exist_ok=True)

# ---- _core.py: monolith lines 1..118 (docstring, imports, dicts,
# BENCH_QUERIES, register, shared helpers)
core = "".join(lines[:118])
(PKG / "_core.py").write_text(core)

chunk_texts = {}
for name, start, end, desc in CHUNKS:
    body = "".join(lines[start - 1 : (end if end else len(lines))])
    extra = []
    for helper, home in CROSS.items():
        if home == name:
            continue
        # used (word-boundary) but not defined here?
        if re.search(rf"\b{helper}\b", body) and not re.search(
            rf"^(def {helper}\b|{helper} =)", body, re.M
        ):
            extra.append(
                f"from python_plugins_spark.queries.{home} import {helper}  # noqa: F401"
            )
    head = (
        f'"""{desc}\n\nSplit from the former queries.py; see _core for the '
        f'registry and conventions."""\n' + IMPORT_HEADER
    )
    if extra:
        head += "\n" + "\n".join(extra) + "\n"
    chunk_texts[name] = head + "\n\n" + body

for name, *_ in CHUNKS:
    (PKG / f"{name}.py").write_text(chunk_texts[name])

init = (
    '"""The engine\'s query registry — the driver-facing contract.\n\n'
    "Split into per-section modules; importing this package populates\n"
    "QUERIES/ORACLES in the same order as the former monolithic\n"
    "queries.py. See _core for the registration helper and the\n"
    "engine-portability conventions every oracle follows.\n"
    '"""\n\n'
    "from python_plugins_spark.queries._core import (  # noqa: F401\n"
    "    BENCH_QUERIES,\n    ORACLES,\n    QUERIES,\n    register,\n"
    "    _global_index_part,\n    _ts,\n    _STRF,\n)\n\n"
    "# Imported for their registration side effects, in the monolith's\n"
    "# original order (dict order is part of the driver-facing surface).\n"
)
for name, *_ in CHUNKS:
    init += f"from python_plugins_spark.queries import {name}  # noqa: F401,E402\n"
(PKG / "__init__.py").write_text(init)

SRC.unlink()
print("split complete:", [f"{n}:{len(chunk_texts[n].splitlines())}" for n, *_ in CHUNKS])
