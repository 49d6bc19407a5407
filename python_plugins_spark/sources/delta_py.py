"""Minimal Delta Lake table support, implemented from the PUBLIC Delta
transaction-log protocol (https://github.com/delta-io/delta/blob/master/PROTOCOL.md):
a Delta table is a directory of parquet data files plus a
``_delta_log/`` of ordered JSON commits containing ``protocol`` /
``metaData`` / ``add`` / ``remove`` actions; the active snapshot is
the add-set minus the remove-set after replaying commits in order.

No delta-spark jar or delta-rs exists in this environment, so the LOG
layer is implemented here in ~150 lines — but all heavy IO stays on
Spark's native parquet path: ``read_delta`` replays the log (tiny JSON
files, driver-side metadata exactly like a parquet footer) and hands
the active file list to ``spark.read.parquet``, so column pruning,
filter pushdown, and vectorized scanning work unchanged;
``write_delta`` writes parquet through Spark and then commits one JSON
log entry. Supported surface: append / overwrite atomically via the
log, snapshot reads, and time travel (``version_as_of``). Not
implemented (documented): checkpoints, deletion vectors, column
mapping, concurrent-writer conflict detection.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_LOG_DIR = "_delta_log"


def _log_path(table_path: str) -> str:
    return os.path.join(table_path, _LOG_DIR)


def _commit_files(table_path: str) -> list[tuple[int, str]]:
    log = _log_path(table_path)
    if not os.path.isdir(log):
        return []
    out = []
    for f in os.listdir(log):
        if f.endswith(".json"):
            try:
                out.append((int(f[: -len(".json")]), os.path.join(log, f)))
            except ValueError:
                continue
    return sorted(out)


def _replay(table_path: str, version_as_of: int | None = None):
    """Replay the log -> (schema_json, active file map path->add)."""
    commits = _commit_files(table_path)
    if not commits:
        raise FileNotFoundError(f"no Delta log at {_log_path(table_path)}")
    if version_as_of is not None:
        commits = [(v, p) for v, p in commits if v <= version_as_of]
        if not commits or commits[-1][0] != version_as_of:
            raise ValueError(
                f"version {version_as_of} not in log "
                f"(have {[v for v, _ in _commit_files(table_path)]})"
            )
    schema_json = None
    active: dict[str, dict] = {}
    for _, path in commits:
        with open(path) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    schema_json = action["metaData"]["schemaString"]
                elif "add" in action:
                    active[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    active.pop(action["remove"]["path"], None)
    if schema_json is None:
        raise ValueError("log contains no metaData action")
    return schema_json, active


def read_delta(
    spark: SparkSession, table_path: str, version_as_of: int | None = None
) -> DataFrame:
    """Snapshot (or time-travel) read: replay the log, scan the active
    parquet files natively. An empty snapshot returns an empty frame
    with the table schema."""
    schema_json, active = _replay(table_path, version_as_of)
    schema = T.StructType.fromJson(json.loads(schema_json))
    if not active:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(table_path, p) for p in active]
    return spark.read.schema(schema).parquet(*paths)


def table_version(table_path: str) -> int:
    commits = _commit_files(table_path)
    return commits[-1][0] if commits else -1


def write_delta(df: DataFrame, table_path: str, mode: str = "append") -> int:
    """Write a new table version; returns the committed version number.

    The parquet data is written by Spark into a staging subdir, the
    files are moved into the table root, and ONE json commit makes
    them visible atomically (readers replay only the log, so partially
    moved files are invisible until the commit lands) — the core Delta
    idea. ``mode``: 'append' adds files; 'overwrite' also removes every
    previously active file in the same commit."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(_log_path(table_path), exist_ok=True)
    version = table_version(table_path) + 1
    now_ms = int(time.time() * 1000)

    staging = os.path.join(table_path, f".staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    adds = []
    for f in sorted(os.listdir(staging)):
        if not f.endswith(".parquet"):
            continue
        name = f"part-{version:010d}-{uuid.uuid4().hex}.parquet"
        src = os.path.join(staging, f)
        dst = os.path.join(table_path, name)
        size = os.path.getsize(src)
        os.replace(src, dst)
        adds.append(
            {
                "add": {
                    "path": name,
                    "partitionValues": {},
                    "size": size,
                    "modificationTime": now_ms,
                    "dataChange": True,
                }
            }
        )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)

    actions: list[dict] = []
    if version == 0:
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": now_ms,
                }
            }
        )
    if mode == "overwrite" and version > 0:
        _, active = _replay(table_path)
        for path in active:
            actions.append(
                {
                    "remove": {
                        "path": path,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
    actions.extend(adds)

    commit = os.path.join(_log_path(table_path), f"{version:020d}.json")
    tmp = commit + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    os.replace(tmp, commit)  # atomic single-writer commit
    return version


def vacuum_delta(table_path: str) -> list[str]:
    """Delete data files no longer referenced by the CURRENT snapshot;
    returns the deleted file names. NOTE: destroys time travel to
    versions whose files are removed — exactly Delta's VACUUM
    trade-off (production adds a retention window; this minimal layer
    vacuums everything unreferenced, which suits compaction tests)."""
    _, active = _replay(table_path)
    deleted = []
    for f in os.listdir(table_path):
        if f.endswith(".parquet") and f not in active:
            os.remove(os.path.join(table_path, f))
            deleted.append(f)
    return sorted(deleted)
