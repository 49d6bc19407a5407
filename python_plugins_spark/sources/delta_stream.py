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
    ``ignoreChanges`` (default false), ``readChangeFeed`` (default
    false — when true the stream is the CDC stream: table columns plus
    ``_change_type`` ('insert' | 'delete') and ``_commit_version``,
    derived per commit exactly like :func:`delta_py.table_changes`;
    max_versions_per_batch bounds a micro-batch's commit span)."""

    @classmethod
    def name(cls) -> str:
        return "delta_py_stream"

    def schema(self) -> T.StructType:
        from .delta_py import _replay_state

        state = _replay_state(self.options["path"])
        cdc = str(self.options.get("readchangefeed", "false")).lower() == "true"
        base = T.StructType.fromJson(json.loads(state.meta["schemaString"]))
        if cdc:
            return T.StructType(
                base.fields
                + [
                    T.StructField("_change_type", T.StringType(), False),
                    T.StructField("_commit_version", T.IntegerType(), False),
                ]
            )
        return base

    def streamReader(self, schema):
        from .delta_py import (
            _cm_map, _replay_state, column_mapping_enabled,
        )

        state = _replay_state(self.options["path"])
        cm = None
        if column_mapping_enabled(state.meta):
            base = T.StructType.fromJson(json.loads(state.meta["schemaString"]))
            cm = _cm_map(base)  # logical -> PHYSICAL file column names
        common = (
            self.options["path"],
            int(self.options.get("starting_version", 0)),
        )
        if str(self.options.get("readchangefeed", "false")).lower() == "true":
            return DeltaChangeFeedStreamReader(
                *common,
                int(self.options.get("max_versions_per_batch", 0)) or None,
                schema,
                cm,
            )
        return DeltaStreamReader(
            *common,
            str(self.options.get("ignorechanges", "false")).lower() == "true",
            schema,
            cm,
        )


def _pv_cast(v: str | None, dtype: T.DataType):
    """Partition value string (the add action's partitionValues map)
    -> Python value of the partition column's declared type."""
    if v is None or v == "__HIVE_DEFAULT_PARTITION__":
        return None
    import datetime as _dt

    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(v)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float(v)
    if isinstance(dtype, T.BooleanType):
        return v.lower() == "true"
    if isinstance(dtype, T.DateType):
        return _dt.date.fromisoformat(v)
    if isinstance(dtype, T.TimestampType):
        return _dt.datetime.fromisoformat(v)
    return v


class _FilePartition(InputPartition):
    def __init__(self, abs_path: str, pvals: dict | None = None):
        self.abs_path = abs_path
        self.pvals = pvals or {}


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, starting_version: int,
                 ignore_changes: bool, schema: T.StructType | None = None,
                 cm: dict[str, str] | None = None):
        self.table_path = table_path
        self.starting_version = starting_version
        self.ignore_changes = ignore_changes
        self.table_schema = schema
        # column mapping: files store PHYSICAL names; lookups go
        # logical -> physical (physicalName is rename-stable)
        self.cm = cm or {}

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
                    _FilePartition(
                        os.path.join(self.table_path, add["path"]),
                        add.get("partitionValues") or {},
                    )
                )
        return parts

    def read(self, partition: _FilePartition):
        import pyarrow.parquet as pq

        table = pq.read_table(partition.abs_path)
        names = (
            [self.cm.get(f.name, f.name) for f in self.table_schema.fields]
            if self.table_schema is not None
            else None
        )
        if not partition.pvals and not self.cm and (
            names is None or list(table.schema.names) == names
        ):
            for batch in table.to_batches():
                cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
                yield from zip(*cols)
            return
        # hive-partitioned: data files omit the partition columns —
        # reattach each column's constant (typed) value in declared
        # field order
        fields = self.table_schema.fields
        file_cols = {
            n: table.column(i).to_pylist()
            for i, n in enumerate(table.schema.names)
        }
        consts = {
            f.name: _pv_cast(
                partition.pvals.get(self.cm.get(f.name, f.name)), f.dataType
            )
            for f in fields
            if self.cm.get(f.name, f.name) in partition.pvals
        }
        none_col = [None] * table.num_rows
        for r in range(table.num_rows):
            # columns absent from the file (added later by schema
            # evolution) null-fill, matching the batch reader
            yield tuple(
                consts[f.name]
                if f.name in consts
                else file_cols.get(self.cm.get(f.name, f.name), none_col)[r]
                for f in fields
            )

    def commit(self, end: dict) -> None:
        pass  # the engine's checkpoint IS the consumption record


class _ChangePartition(InputPartition):
    """One CDC task: either a whole added file ('insert') or a
    DV-delta over one file ('delete' — the NEW deleted positions minus
    the OLD, decoded and diffed on the executor)."""

    def __init__(self, abs_path, change_type, version, table_path,
                 new_desc=None, old_desc=None, pvals=None):
        self.abs_path = abs_path
        self.change_type = change_type
        self.version = version
        self.table_path = table_path
        self.new_desc = new_desc
        self.old_desc = old_desc
        self.pvals = pvals or {}


class DeltaChangeFeedStreamReader(DataSourceStreamReader):
    """CDC tail of the log (streaming twin of
    :func:`delta_py.table_changes`): append commits plan one 'insert'
    partition per added file; DV-delete commits plan one 'delete'
    partition per (file, new DV, old DV) pair; layout commits plan
    nothing; in-place rewrites raise (not row-derivable)."""

    def __init__(self, table_path, starting_version, max_versions=None,
                 schema: T.StructType | None = None,
                 cm: dict[str, str] | None = None):
        self.table_path = table_path
        self.starting_version = starting_version
        self.max_versions = max_versions
        self.table_schema = schema
        self.cm = cm or {}
        self._consumed: int | None = None  # last version handed out

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        from .delta_py import table_version

        cur = table_version(self.table_path)
        if self.max_versions is not None and self._consumed is not None:
            # admission control (maxFilesPerTrigger analogue): bound a
            # micro-batch's commit span so a backlogged table drains in
            # bounded batches instead of one giant catch-up batch. The
            # cap applies from the last PLANNED version; the first
            # batch after a restart is uncapped (the reader can't see
            # the checkpointed offset until partitions() is called).
            cur = min(cur, self._consumed + self.max_versions)
        return {"version": cur}

    def partitions(self, start: dict, end: dict):
        from .delta_py import _commit_files, _replay_state

        commits = dict(_commit_files(self.table_path))
        lo, hi = start["version"] + 1, end["version"]
        self._consumed = hi
        parts: list[_ChangePartition] = []
        for v in range(lo, hi + 1):
            if v not in commits:
                continue
            adds, removes = {}, {}
            with open(commits[v]) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "add" in action:
                        adds[action["add"]["path"]] = action["add"]
                    elif "remove" in action:
                        removes[action["remove"]["path"]] = action["remove"]
            data_adds = {p: a for p, a in adds.items() if a.get("dataChange")}
            data_removes = {
                p: r for p, r in removes.items() if r.get("dataChange")
            }
            if not data_adds and not data_removes:
                continue
            dv_pairs = {
                p: a
                for p, a in data_adds.items()
                if p in data_removes and a.get("deletionVector")
            }
            plain_removes = {
                p: r for p, r in data_removes.items() if p not in dv_pairs
            }
            if plain_removes:
                raise ValueError(
                    f"version {v} rewrites files in place: CDC rows are "
                    "not derivable from the log for this commit"
                )
            old_state = _replay_state(self.table_path, v - 1) if dv_pairs else None
            for p, a in data_adds.items():
                if p in dv_pairs:
                    old_add = old_state.active.get(p, {})
                    parts.append(
                        _ChangePartition(
                            os.path.join(self.table_path, p),
                            "delete",
                            v,
                            self.table_path,
                            new_desc=a["deletionVector"],
                            old_desc=old_add.get("deletionVector"),
                            pvals=a.get("partitionValues") or {},
                        )
                    )
                elif not a.get("deletionVector"):
                    parts.append(
                        _ChangePartition(
                            os.path.join(self.table_path, p),
                            "insert",
                            v,
                            self.table_path,
                            pvals=a.get("partitionValues") or {},
                        )
                    )
        return parts

    def read(self, partition: _ChangePartition):
        import pyarrow.parquet as pq

        table = pq.read_table(partition.abs_path)
        if partition.change_type == "insert":
            rows = range(table.num_rows)
        else:
            from .delta_dv import load_dv

            new_idx = set(load_dv(partition.table_path, partition.new_desc))
            if partition.old_desc is not None:
                new_idx -= set(load_dv(partition.table_path, partition.old_desc))
            rows = sorted(new_idx)
        base_names = (
            [self.cm.get(f.name, f.name)
             for f in self.table_schema.fields[:-2]]
            if self.table_schema is not None
            else None
        )
        if not partition.pvals and not self.cm and (
            base_names is None or list(table.schema.names) == base_names
        ):
            cols = [table.column(i).to_pylist() for i in range(table.num_columns)]
            for r in rows:
                yield tuple(c[r] for c in cols) + (
                    partition.change_type,
                    partition.version,
                )
            return
        # partitioned (or schema-aware) reassembly: the CDC schema is
        # table columns + (_change_type, _commit_version); partition
        # values are constants from the add action, evolution-added
        # columns null-fill
        fields = self.table_schema.fields[:-2]
        file_cols = {
            n: table.column(i).to_pylist()
            for i, n in enumerate(table.schema.names)
        }
        consts = {
            f.name: _pv_cast(
                partition.pvals.get(self.cm.get(f.name, f.name)), f.dataType
            )
            for f in fields
            if self.cm.get(f.name, f.name) in partition.pvals
        }
        none_col = [None] * table.num_rows
        for r in rows:
            yield tuple(
                consts[f.name]
                if f.name in consts
                else file_cols.get(self.cm.get(f.name, f.name), none_col)[r]
                for f in fields
            ) + (partition.change_type, partition.version)

    def commit(self, end: dict) -> None:
        pass


def register(spark) -> None:
    """Idempotent registration of the streaming format."""
    spark.dataSource.register(DeltaStreamSource)
