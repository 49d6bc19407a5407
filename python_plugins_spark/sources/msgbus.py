"""Message-bus (Kafka-shaped) source emulation.

The host platform around the reference plugin fronts pipelines with a
message bus; no network broker exists in this environment, so this
module emulates the Kafka SOURCE API SHAPE over an append-only local
log — the point is the Spark-side surface (wire schema, partition/
offset semantics, exactly-once streaming restarts), not the broker.

Broker layout: ``<root>/<topic>/p<N>/*.log`` — each topic partition is
a directory of segment files, each segment an append-only sequence of
length-prefixed records::

    <key_len:int32 LE, -1 = null key><key bytes>
    <value_len:int32 LE><value bytes>
    <ts_ms:int64 LE>

Semantics mirrored from the real thing:

- **one writer per partition** (Kafka's own model): a DataFrame
  produce repartitions rows by key hash onto the topic's partitions,
  and each Spark task owns exactly one partition directory — no
  cross-task file contention by construction, at any scale;
- **records with the same key land in the same partition** (hash
  partitioning), preserving per-key order;
- **offsets are per-partition record indexes**; the streaming reader
  checkpoints ``{partition: consumed_count}`` through the engine, so a
  restart resumes exactly after the last committed record — the
  exactly-once contract of the real Kafka source;
- **the wire schema is the Kafka source schema**: key binary, value
  binary, topic string, partition int, offset long, timestamp.

Reads are executor-side (each InputPartition walks one partition's
segments); only offset discovery (file sizes/record counts) runs on
the driver, like a broker metadata fetch.
"""

from __future__ import annotations

import os
import struct
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), False),
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
    ]
)


def _topic_dir(root: str, topic: str) -> str:
    return os.path.join(root, topic)


def _partition_dirs(root: str, topic: str) -> list[str]:
    td = _topic_dir(root, topic)
    if not os.path.isdir(td):
        raise FileNotFoundError(f"no such topic: {topic} under {root}")
    return sorted(
        (os.path.join(td, d) for d in os.listdir(td) if d.startswith("p")),
        key=lambda p: int(os.path.basename(p)[1:]),
    )


def _encode_record(key: bytes | None, value: bytes, ts_ms: int) -> bytes:
    head = struct.pack("<i", -1 if key is None else len(key))
    if key is not None:
        head += key
    return head + struct.pack("<i", len(value)) + value + struct.pack("<q", ts_ms)


def _iter_segment(path: str):
    """Yield (key, value, ts_ms) records from one segment file."""
    with open(path, "rb") as fh:
        data = fh.read()
    pos = 0
    while pos < len(data):
        (klen,) = struct.unpack_from("<i", data, pos)
        pos += 4
        key = None
        if klen >= 0:
            key = data[pos : pos + klen]
            pos += klen
        (vlen,) = struct.unpack_from("<i", data, pos)
        pos += 4
        value = data[pos : pos + vlen]
        pos += vlen
        (ts,) = struct.unpack_from("<q", data, pos)
        pos += 8
        yield key, value, ts


def _iter_partition(pdir: str):
    """Records of one partition in offset order (segments sort by
    name — producers name them monotonically)."""
    for seg in sorted(os.listdir(pdir)):
        if seg.endswith(".log"):
            yield from _iter_segment(os.path.join(pdir, seg))


def _iter_partition_range(pdir: str, start: int, end: int):
    """(offset, key, value, ts) for offsets in [start, end) — segments
    wholly below ``start`` are SKIPPED via the record count encoded in
    their name (a resumed stream must not re-scan the log it already
    consumed; at broker scale the committed prefix dominates)."""
    base = 0
    for seg in sorted(os.listdir(pdir)):
        if not seg.endswith(".log"):
            continue
        stem = seg[: -len(".log")]
        count = int(stem.split("-", 1)[1]) if "-" in stem else None
        if count is not None and base + count <= start:
            base += count  # fully-consumed segment: name-only skip
            continue
        if base >= end:
            break
        n = 0
        for i, rec in enumerate(_iter_segment(os.path.join(pdir, seg))):
            n = i + 1
            off = base + i
            if off >= end:
                return
            if off >= start:
                yield off, *rec
        base += count if count is not None else n


def _partition_count(pdir: str) -> int:
    """Record count of a partition — a METADATA fetch, not a log
    scan: segments are named ``<seq>-<count>.log`` so the high
    watermark is a directory listing (the broker-metadata shape;
    offset discovery must not re-read a 100 TB log). Legacy unnamed
    counts fall back to walking the segment once."""
    total = 0
    for seg in sorted(os.listdir(pdir)):
        if not seg.endswith(".log"):
            continue
        stem = seg[: -len(".log")]
        if "-" in stem:
            total += int(stem.split("-", 1)[1])
        else:
            total += sum(1 for _ in _iter_segment(os.path.join(pdir, seg)))
    return total


def create_topic(root: str, topic: str, partitions: int) -> None:
    for i in range(partitions):
        os.makedirs(os.path.join(_topic_dir(root, topic), f"p{i}"), exist_ok=True)


def produce_dataframe(
    df: DataFrame,
    root: str,
    topic: str,
    key_col: str,
    value_col: str,
    ts_col: str | None = None,
    partitions: int = 4,
    segment_seq: int = 0,
) -> None:
    """Executor-side produce: rows hash-partition by key onto the
    topic's partitions; each task writes ONE partition's segment (the
    one-writer-per-partition model — no contention at any parallelism).
    Task retries are safe: the segment is staged under a temp name and
    renamed into place, so the last attempt wins with identical
    content (the write is a pure function of the partition's rows).

    Null keys are legal (the wire schema and Kafka both allow them);
    they partition by a hash of the VALUE bytes instead of Kafka's
    sticky round-robin, because retried tasks must land every record
    on the SAME partition to keep the segment write deterministic."""
    create_topic(root, topic, partitions)
    ts = (
        (F.unix_millis(F.col(ts_col)))
        if ts_col
        else F.lit(0).cast("long")
    )
    key_b = F.col(key_col).cast("binary")
    value_b = F.col(value_col).cast("binary")
    prepared = df.select(
        key_b.alias("k"),
        value_b.alias("v"),
        ts.alias("t"),
        F.pmod(
            F.crc32(F.coalesce(key_b, value_b, F.lit(b""))), F.lit(partitions)
        )
        .cast("int")
        .alias("p"),
    ).repartition(partitions, "p")

    topic_root = _topic_dir(root, topic)

    def write_batches(batches, segment_seq=segment_seq):
        """One task == one topic partition's writer. Arrow batches in
        (no per-row pickling), segments out; emits one (p, n) summary
        row per written partition."""
        import pyarrow as pa

        by_part: dict[int, list] = {}
        for b in batches:
            for k, v, t, p in zip(
                b.column("k").to_pylist(),
                b.column("v").to_pylist(),
                b.column("t").to_pylist(),
                b.column("p").to_pylist(),
            ):
                by_part.setdefault(p, []).append((t, k, v))
        written: list[tuple[int, int]] = []
        for p, rs in by_part.items():
            # a task retry must write a byte-identical segment (readers
            # may already have checkpointed offsets into it), so sort by
            # the FULL record — (ts, key) alone ties when ts_col is
            # omitted and same-key records would keep nondeterministic
            # post-shuffle arrival order
            rs.sort(key=lambda r: (r[0], r[1] or b"", r[2] or b""))
            payload = b"".join(
                _encode_record(k, v, t) for t, k, v in rs
            )
            pdir = os.path.join(topic_root, f"p{p}")
            # refuse to clobber a DIFFERENT produce that landed on the
            # same segmentSeq (same-content replace stays idempotent for
            # task retries); a colliding seq with a different record
            # count is the same mistake wearing a different filename.
            # The pre-scan catches cross-NAME collisions (same seq,
            # different count); it is check-then-act, which is fine
            # under the bus's single-producer-per-(topic, seq) model —
            # Spark retries of the same task write identical bytes. The
            # same-NAME claim below is fully atomic regardless: link(2)
            # is put-if-absent, and EEXIST re-verifies content.
            final = os.path.join(pdir, f"{segment_seq:08d}-{len(rs)}.log")
            collision_msg = (
                f"msgbus: segment seq {segment_seq} already exists in "
                f"{pdir} with different content; bump segment_seq (the "
                "batch sink derives it from the epoch id) instead of "
                "overwriting committed records"
            )
            for seg in os.listdir(pdir):
                if not seg.endswith(".log"):
                    continue
                if int(seg.split("-", 1)[0]) != segment_seq:
                    continue
                if os.path.join(pdir, seg) != final:
                    raise FileExistsError(collision_msg)
            tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}")
            try:
                with open(tmp, "wb") as fh:
                    fh.write(payload)
                try:
                    os.link(tmp, final)  # atomic put-if-absent
                except FileExistsError:
                    with open(final, "rb") as fh:
                        if fh.read() != payload:
                            raise FileExistsError(collision_msg) from None
                    # identical retry — the committed segment stands
            finally:
                try:
                    os.unlink(tmp)
                except FileNotFoundError:
                    pass
            written.append((p, len(rs)))
        if written:
            yield pa.record_batch(
                [
                    pa.array([p for p, _ in written], pa.int32()),
                    pa.array([n for _, n in written], pa.int64()),
                ],
                names=["p", "n"],
            )

    # mapInArrow keeps the produce loop on the Arrow fast path; the
    # cheap count() over the per-partition summary rows is the action
    # that drives the write (the summary is `partitions` rows, total)
    prepared.mapInArrow(write_batches, "p int, n long").count()


def append_records(
    root: str,
    topic: str,
    partition: int,
    records: list[tuple[bytes | None, bytes, int]],
) -> None:
    """Small incremental produce (driver-side test helper): appends a
    new segment after the existing ones."""
    pdir = os.path.join(_topic_dir(root, topic), f"p{partition}")
    os.makedirs(pdir, exist_ok=True)
    existing = sorted(s for s in os.listdir(pdir) if s.endswith(".log"))
    nxt = (
        int(existing[-1][: -len(".log")].split("-", 1)[0]) + 1
        if existing
        else 0
    )
    payload = b"".join(_encode_record(k, v, t) for k, v, t in records)
    tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "wb") as fh:
        fh.write(payload)
    os.replace(tmp, os.path.join(pdir, f"{nxt:08d}-{len(records)}.log"))


class _RangePartition(InputPartition):
    def __init__(self, pdir: str, topic: str, pid: int, start: int, end: int):
        self.pdir = pdir
        self.topic = topic
        self.pid = pid
        self.start = start
        self.end = end


def _emit_batches(part: _RangePartition):
    """Yield pyarrow RecordBatches of the wire schema — the Python
    DataSource's vectorized path (one Arrow batch crosses the bridge
    instead of one pickled tuple per record)."""
    import pyarrow as pa

    CHUNK = 16384
    offs: list[int] = []
    keys: list[bytes | None] = []
    vals: list[bytes] = []
    tss: list[int] = []

    def make() -> "pa.RecordBatch":
        n = len(vals)
        return pa.record_batch(
            [
                pa.array(keys, pa.binary()),
                pa.array(vals, pa.binary()),
                pa.array([part.topic] * n, pa.string()),
                pa.array([part.pid] * n, pa.int32()),
                pa.array(offs, pa.int64()),
                pa.array([t * 1000 for t in tss], pa.timestamp("us")),
            ],
            names=["key", "value", "topic", "partition", "offset", "timestamp"],
        )

    for off, key, value, ts in _iter_partition_range(
        part.pdir, part.start, part.end
    ):
        offs.append(off)
        keys.append(key)
        vals.append(value)
        tss.append(ts)
        if len(vals) >= CHUNK:
            yield make()
            offs, keys, vals, tss = [], [], [], []
    if vals:
        yield make()


class MsgBusSource(DataSource):
    """Options: ``path`` (broker root), ``topic``,
    ``starting_offsets`` ('earliest', the default, or a JSON dict)."""

    @classmethod
    def name(cls) -> str:
        return "msgbus"

    def schema(self) -> T.StructType:
        return WIRE_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return MsgBusBatchReader(self.options["path"], self.options["topic"])

    def streamReader(self, schema) -> DataSourceStreamReader:
        return MsgBusStreamReader(self.options["path"], self.options["topic"])


class MsgBusBatchReader(DataSourceReader):
    def __init__(self, root: str, topic: str):
        self.root = root
        self.topic = topic

    def partitions(self):
        return [
            _RangePartition(
                pdir, self.topic, int(os.path.basename(pdir)[1:]),
                0, _partition_count(pdir),
            )
            for pdir in _partition_dirs(self.root, self.topic)
        ]

    def read(self, partition: _RangePartition):
        yield from _emit_batches(partition)


class MsgBusStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, topic: str):
        self.root = root
        self.topic = topic

    def initialOffset(self) -> dict:
        return {
            os.path.basename(p): 0 for p in _partition_dirs(self.root, self.topic)
        }

    def latestOffset(self) -> dict:
        return {
            os.path.basename(p): _partition_count(p)
            for p in _partition_dirs(self.root, self.topic)
        }

    def partitions(self, start: dict, end: dict):
        out = []
        for pdir in _partition_dirs(self.root, self.topic):
            pname = os.path.basename(pdir)
            s, e = int(start.get(pname, 0)), int(end.get(pname, 0))
            if e > s:
                out.append(
                    _RangePartition(pdir, self.topic, int(pname[1:]), s, e)
                )
        return out

    def read(self, partition: _RangePartition):
        yield from _emit_batches(partition)

    def commit(self, end: dict) -> None:
        pass  # the engine checkpoint IS the consumption record


def register(spark: SparkSession) -> None:
    spark.dataSource.register(MsgBusSource)
