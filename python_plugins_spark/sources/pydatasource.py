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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
