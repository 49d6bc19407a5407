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
    def __init__(self, n_partitions: int, rows_per_partition: int) -> None:
        self.n_partitions = n_partitions
        self.rows_per_partition = rows_per_partition

    def partitions(self):
        # one InputPartition per split: Spark schedules each as a task,
        # so the synthetic scan parallelizes exactly like a file source
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition):
        base = partition.value * self.rows_per_partition
        for i in range(base, base + self.rows_per_partition):
            yield (i, partition.value, ((i * MIX) % 1000) / 100.0)


def register(spark) -> None:
    """Idempotent registration of the custom format on a session."""
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
