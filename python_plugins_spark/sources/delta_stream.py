"""Delta table as a STRUCTURED STREAMING SOURCE (Spark 4 Python
DataSource streaming API): ``spark.readStream.format("delta_py_stream")
.option("path", table).load()`` tails the transaction log, emitting
each commit's appended rows as a micro-batch.

Shape (the full ``DataSourceStreamReader`` API, not the driver-side
Simple variant):

- **offsets are log versions** — ``{"version": N}`` means "commits
  <= N are consumed". The engine checkpoints offsets, so restart
  resumes from the last committed version: exactly-once delivery of
  each commit's rows, inherited from the log's immutability (a commit
  never changes after publication — the same property that makes
  replaying a batch between two offsets deterministic).
- **partition planning is metadata-only**: ``partitions(start, end)``
  replays just the commit JSONs in range and yields one InputPartition
  per added data file — the driver never touches row data.
- **reads are executor-side**: each task opens its one parquet file
  with pyarrow. A 1000-file commit becomes a 1000-task micro-batch.

Change semantics (same contract as the reference Delta streaming
source): the stream is the APPEND stream. Commits that remove files
raise by default — a streamed table is expected to be append-only;
``ignoreChanges=true`` instead emits just the commits' genuinely new
files (re-adds carrying deletionVector descriptors are skipped, so a
merge-on-read DELETE/UPDATE doesn't replay old rows — note UPDATE's
new-version rows DO stream, the documented ignoreChanges trade-off).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class DeltaStreamSource(DataSource):
    """Options: ``path`` (required), ``starting_version`` (default 0 —
    first batch replays the table from its beginning),
    ``ignoreChanges`` (default false)."""

    @classmethod
    def name(cls) -> str:
        return "delta_py_stream"

    def schema(self) -> T.StructType:
        from .delta_py import _replay

        schema_json, _ = _replay(self.options["path"])
        return T.StructType.fromJson(json.loads(schema_json))

    def streamReader(self, schema):
        return DeltaStreamReader(
            self.options["path"],
            int(self.options.get("starting_version", 0)),
            str(self.options.get("ignorechanges", "false")).lower() == "true",
        )


class _FilePartition(InputPartition):
    def __init__(self, abs_path: str):
        self.abs_path = abs_path


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, starting_version: int, ignore_changes: bool):
        self.table_path = table_path
        self.starting_version = starting_version
        self.ignore_changes = ignore_changes

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        from .delta_py import table_version

        return {"version": table_version(self.table_path)}

    def partitions(self, start: dict, end: dict):
        from .delta_py import _commit_files

        commits = dict(_commit_files(self.table_path))
        parts: list[_FilePartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            if v not in commits:
                continue
            adds, removes = [], []
            with open(commits[v]) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "add" in action and action["add"].get("dataChange"):
                        adds.append(action["add"])
                    elif "remove" in action and action["remove"].get("dataChange"):
                        removes.append(action["remove"])
            if removes and not self.ignore_changes:
                raise ValueError(
                    f"version {v} of {self.table_path} is not append-only "
                    "(contains removes); set ignoreChanges=true to stream "
                    "only the newly added files"
                )
            for add in adds:
                if add.get("deletionVector"):
                    continue  # re-add of an existing file (DV attach)
                parts.append(
                    _FilePartition(os.path.join(self.table_path, add["path"]))
                )
        return parts

    def read(self, partition: _FilePartition):
        import pyarrow.parquet as pq

        table = pq.read_table(partition.abs_path)
        for batch in table.to_batches():
            cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
            yield from zip(*cols)

    def commit(self, end: dict) -> None:
        pass  # the engine's checkpoint IS the consumption record


def register(spark) -> None:
    """Idempotent registration of the streaming format."""
    spark.dataSource.register(DeltaStreamSource)
