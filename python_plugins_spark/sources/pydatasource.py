"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference is itself a *plugin* into a host platform's source ->
transform -> sink DAG (BasePythonTransformTest.java:215-222 wires
MockSource/MockSink around the evaluator). Spark 4's Python DataSource
API is the idiomatic Spark analogue of that extension surface: a
user-defined source registered by name, planned with real input
partitions so the scan parallelizes like any built-in format.

`SyntheticReadingsSource` emits a deterministic "sensor readings"
table — pure function of the row id, so the output is reproducible
across runs/retries and cross-checkable by a DuckDB oracle that
replays the same integer recurrence.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

N_PARTITIONS = 4
ROWS_PER_PARTITION = 250
MIX = 2654435761  # Knuth multiplicative-hash constant


class SyntheticReadingsSource(DataSource):
    """`spark.read.format("synthetic_readings")` — options:
    ``partitions`` (default 4), ``rows_per_partition`` (default 250)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_readings"

    def schema(self) -> str:
        return "id bigint, part int, val double"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticReadingsReader(
            int(self.options.get("partitions", N_PARTITIONS)),
            int(self.options.get("rows_per_partition", ROWS_PER_PARTITION)),
        )

    def simpleStreamReader(self, schema):
        return SyntheticReadingsStreamReader(
            int(self.options.get("rows_per_batch", 100)),
            int(self.options.get("max_id", 1000)),
        )


class SyntheticReadingsReader(DataSourceReader):
    """Reader with FILTER PUSHDOWN (Spark 4.1 ``pushFilters``): id
    range predicates and part equality are consumed by the source —
    range predicates narrow row GENERATION, part equality PRUNES whole
    input partitions before any task is scheduled (the custom-source
    analogue of partition pruning on a file source). Unhandled filters
    are returned to Spark and evaluated post-scan as usual."""

    def __init__(self, n_partitions: int, rows_per_partition: int) -> None:
        self.n_partitions = n_partitions
        self.rows_per_partition = rows_per_partition
        self.id_min = 0
        self.id_max_excl = n_partitions * rows_per_partition
        self.part_eq: int | None = None

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("part",) and isinstance(f, EqualTo):
                self.part_eq = int(f.value)
            elif attr == ("id",) and isinstance(f, GreaterThan):
                self.id_min = max(self.id_min, int(f.value) + 1)
            elif attr == ("id",) and isinstance(f, GreaterThanOrEqual):
                self.id_min = max(self.id_min, int(f.value))
            elif attr == ("id",) and isinstance(f, LessThan):
                self.id_max_excl = min(self.id_max_excl, int(f.value))
            elif attr == ("id",) and isinstance(f, LessThanOrEqual):
                self.id_max_excl = min(self.id_max_excl, int(f.value) + 1)
            else:
                yield f  # not handled — Spark applies it post-scan

    def partitions(self):
        # one InputPartition per surviving split: Spark schedules each
        # as a task, so the synthetic scan parallelizes exactly like a
        # file source — and pruned splits never become tasks
        parts = range(self.n_partitions)
        if self.part_eq is not None:
            parts = [p for p in parts if p == self.part_eq]
        return [InputPartition(i) for i in parts]

    def read(self, partition: InputPartition):
        base = partition.value * self.rows_per_partition
        lo = max(base, self.id_min)
        hi = min(base + self.rows_per_partition, self.id_max_excl)
        for i in range(lo, hi):
            yield (i, partition.value, ((i * MIX) % 1000) / 100.0)


def register(spark) -> None:
    """Idempotent registration of the custom format on a session (and
    of the confs the source needs — pushFilters is an opt-in surface
    and Spark errors if the reader implements it while the conf is
    off)."""
    from python_plugins_spark.sources.io import ensure_session_confs

    ensure_session_confs(spark)
    spark.dataSource.register(SyntheticReadingsSource)


class SyntheticReadingsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader for the same deterministic recurrence: each
    batch advances the offset by ``rows_per_batch`` ids. Offsets are
    plain dicts checkpointed by the engine — replaying a batch between
    the same offsets regenerates identical rows (pure function of id),
    which is exactly the contract exactly-once recovery needs from a
    source."""

    def __init__(self, rows_per_batch: int, max_id: int) -> None:
        self.rows_per_batch = rows_per_batch
        self.max_id = max_id

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.rows_per_batch, self.max_id)
        return (
            iter([(i, i % 4, ((i * MIX) % 1000) / 100.0) for i in range(lo, hi)]),
            {"next": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [(i, i % 4, ((i * MIX) % 1000) / 100.0) for i in range(start["next"], end["next"])]
        )
