"""Avro source/sink: pure-Python object-container codec behind a
Spark 4 Python DataSource (``format("avro_py")``).

Why it exists: the reference's entire schema contract is Avro-JSON
(reference ``PythonEvaluator.java:291-297`` parses the output schema
with ``Schema.parseJson``; example schema at
``docs/PythonEvaluator-transform.md:74-83``), so a CDAP-style user's
files are disproportionately Avro — but this environment has no
``spark-avro`` DataSource jar and no pip. The core ``avro-1.12.1``
JVM jars ARE on Spark's classpath, which lets the test suite
cross-validate files written here against the reference Java reader
(``org.apache.avro.file.DataFileReader``) over py4j.

Implementation is from the PUBLIC Avro 1.12 specification only
(binary encoding: zigzag varints, length-prefixed bytes/strings,
block-encoded arrays/maps, union-by-index; object container file:
``Obj\\x01`` magic, metadata map with ``avro.schema``/``avro.codec``,
16-byte sync marker between blocks; ``null`` and ``deflate`` codecs).

Scale notes: reads parallelize one task per file (real
``InputPartition``\\s, like any file source); writes emit one
container file per partition with block-level compression. Schema
comes from the file header on read (driver-side metadata peek, same
as a parquet footer) and from the DataFrame on write via the CDAP
Avro-JSON bridge (:mod:`python_plugins_spark.schema`).
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib
from dataclasses import dataclass
from datetime import date, datetime, timedelta

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from python_plugins_spark.schema import cdap_schema_to_spark, spark_schema_to_cdap

MAGIC = b"Obj\x01"
_EPOCH_DT = datetime(1970, 1, 1)
_EPOCH_D = date(1970, 1, 1)
_BLOCK_ROWS = 4096


# ------------------------------------------------------------ varints

def _w_long(out: io.BytesIO, n: int) -> None:
    """Zigzag varint (Avro spec 'long')."""
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _r_long(buf: io.BufferedIOBase) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


# ------------------------------------------- schema-driven value codec

def _norm(node):
    """Unwrap {"type": <inner>} layers that carry no structural info."""
    if isinstance(node, dict) and node.get("type") in (
        "record",
        "array",
        "map",
        "enum",
        "fixed",
    ):
        return node
    if isinstance(node, dict) and "logicalType" in node:
        return node
    if isinstance(node, dict):
        return _norm(node["type"])
    return node


def _union_match(member, v) -> bool:
    """Does the runtime value's shape fit this union branch? Primitive
    branches match by Python type (bool checked before int — bool IS
    an int in Python); record/array/map/enum/fixed branches match by
    container shape."""
    m = _norm(member)
    if isinstance(m, dict):
        kind = m.get("type")
        if "logicalType" in m:
            lt = m["logicalType"]
            if lt == "date":
                return isinstance(v, date) and not isinstance(v, datetime)
            if lt in ("timestamp-micros", "timestamp-millis"):
                return isinstance(v, datetime)
            return isinstance(v, (int, float))
        if kind == "record":
            return isinstance(v, (tuple, list)) and len(v) == len(m["fields"])
        if kind == "array":
            return isinstance(v, (tuple, list))
        if kind == "map":
            return isinstance(v, dict)
        if kind == "enum":
            return isinstance(v, str) and v in m.get("symbols", [])
        if kind == "fixed":
            return isinstance(v, (bytes, bytearray))
        return False
    if m == "boolean":
        return isinstance(v, bool)
    if m in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if m in ("float", "double"):
        return isinstance(v, float)
    if m == "string":
        return isinstance(v, str)
    if m == "bytes":
        return isinstance(v, (bytes, bytearray))
    return False


def _encode(node, v, out: io.BytesIO) -> None:
    node = _norm(node)
    if isinstance(node, list):  # union
        if v is None:
            idx = node.index("null")
            _w_long(out, idx)
            return
        members = [(i, m) for i, m in enumerate(node) if m != "null"]
        if len(members) != 1:
            # general union: pick the FIRST branch whose shape matches
            # the runtime value (the standard Avro-library rule); an
            # int value lands in the first integer branch, etc.
            members = [
                (i, m) for i, m in members if _union_match(m, v)
            ]
            if not members:
                raise ValueError(
                    f"no union branch in {node!r} matches value "
                    f"{type(v).__name__}"
                )
        idx, member = members[0]
        _w_long(out, idx)
        _encode(member, v, out)
        return
    if isinstance(node, dict):
        logical = node.get("logicalType")
        if logical in ("timestamp-micros", "timestamp-millis"):
            if isinstance(v, datetime):
                delta = v.replace(tzinfo=None) - _EPOCH_DT
                micros = (delta.days * 86_400_000_000 + delta.seconds * 1_000_000
                          + delta.microseconds)
            else:
                micros = int(v)
            _w_long(out, micros if logical == "timestamp-micros" else micros // 1000)
            return
        if logical == "date":
            _w_long(out, (v - _EPOCH_D).days if isinstance(v, date) else int(v))
            return
        kind = node["type"]
        if kind == "record":
            if len(v) != len(node["fields"]):
                raise ValueError(
                    f"record arity mismatch: schema has {len(node['fields'])} "
                    f"fields but row has {len(v)} values"
                )
            for f, fv in zip(node["fields"], v):
                _encode(f["type"], fv, out)
            return
        if kind == "array":
            if v:
                _w_long(out, len(v))
                for item in v:
                    _encode(node["items"], item, out)
            _w_long(out, 0)
            return
        if kind == "map":
            if v:
                _w_long(out, len(v))
                for k, mv in v.items():
                    _encode("string", k, out)
                    _encode(node["values"], mv, out)
            _w_long(out, 0)
            return
        raise ValueError(f"unsupported avro node on write: {node!r}")
    if node == "null":
        return
    if node == "boolean":
        out.write(b"\x01" if v else b"\x00")
        return
    if node in ("int", "long"):
        _w_long(out, int(v))
        return
    if node == "float":
        out.write(struct.pack("<f", float(v)))
        return
    if node == "double":
        out.write(struct.pack("<d", float(v)))
        return
    if node == "bytes":
        b = bytes(v)
        _w_long(out, len(b))
        out.write(b)
        return
    if node == "string":
        b = v.encode("utf-8")
        _w_long(out, len(b))
        out.write(b)
        return
    raise ValueError(f"unsupported avro type on write: {node!r}")


def _decode(node, buf: io.BufferedIOBase):
    node = _norm(node)
    if isinstance(node, list):  # union
        idx = _r_long(buf)
        member = node[idx]
        if member == "null":
            return None
        return _decode(member, buf)
    if isinstance(node, dict):
        logical = node.get("logicalType")
        if logical in ("timestamp-micros", "timestamp-millis"):
            n = _r_long(buf)
            micros = n if logical == "timestamp-micros" else n * 1000
            return _EPOCH_DT + timedelta(microseconds=micros)
        if logical == "date":
            return _EPOCH_D + timedelta(days=_r_long(buf))
        kind = node["type"]
        if kind == "record":
            return tuple(_decode(f["type"], buf) for f in node["fields"])
        if kind == "array":
            out = []
            while True:
                n = _r_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    _r_long(buf)
                    n = -n
                for _ in range(n):
                    out.append(_decode(node["items"], buf))
        if kind == "map":
            out = {}
            while True:
                n = _r_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _r_long(buf)
                    n = -n
                for _ in range(n):
                    k = _decode("string", buf)
                    out[k] = _decode(node["values"], buf)
        raise ValueError(f"unsupported avro node on read: {node!r}")
    if node == "null":
        return None
    if node == "boolean":
        return buf.read(1) == b"\x01"
    if node in ("int", "long"):
        return _r_long(buf)
    if node == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if node == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if node == "bytes":
        return buf.read(_r_long(buf))
    if node == "string":
        return buf.read(_r_long(buf)).decode("utf-8")
    raise ValueError(f"unsupported avro type on read: {node!r}")


# ------------------------------------------------- object container IO

def _sanitize_for_avro(node):
    """Strip the CDAP 'keys' map extension (Avro maps imply string
    keys) so emitted schemas parse under the reference Java library."""
    if isinstance(node, list):
        return [_sanitize_for_avro(m) for m in node]
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            if k == "keys":
                if _norm(v) != "string":
                    raise ValueError("avro maps require string keys")
                continue
            out[k] = _sanitize_for_avro(v) if k in ("type", "fields", "items", "values") else v
        if out.get("type") == "record":
            out["fields"] = [
                {**f, "type": _sanitize_for_avro(f["type"])} for f in node["fields"]
            ]
        return out
    return node


def write_container(path: str, schema_node, rows, codec: str = "deflate") -> int:
    """Write one Avro object-container file; returns the row count."""
    schema_node = _sanitize_for_avro(schema_node)
    sync = os.urandom(16)
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema_node).encode(),
            "avro.codec": codec.encode(),
        }
        head = io.BytesIO()
        _w_long(head, len(meta))
        for k, v in meta.items():
            _encode("string", k, head)
            _encode("bytes", v, head)
        _w_long(head, 0)
        fh.write(head.getvalue())
        fh.write(sync)

        total = 0
        block = io.BytesIO()
        count = 0

        def flush():
            nonlocal block, count
            if count == 0:
                return
            data = block.getvalue()
            if codec == "deflate":
                comp = zlib.compressobj(6, zlib.DEFLATED, -15)
                data = comp.compress(data) + comp.flush()
            elif codec != "null":
                raise ValueError(f"unsupported codec {codec!r}")
            hdr = io.BytesIO()
            _w_long(hdr, count)
            _w_long(hdr, len(data))
            fh.write(hdr.getvalue())
            fh.write(data)
            fh.write(sync)
            block = io.BytesIO()
            count = 0

        for row in rows:
            _encode(schema_node, tuple(row), block)
            count += 1
            total += 1
            if count >= _BLOCK_ROWS:
                flush()
        flush()
    return total


def read_header(fh) -> tuple[dict, str, bytes]:
    """Parse container header -> (schema_node, codec, sync_marker)."""
    if fh.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _r_long(fh)
        if n == 0:
            break
        if n < 0:
            _r_long(fh)
            n = -n
        for _ in range(n):
            k = _decode("string", fh)
            meta[k] = _decode("bytes", fh)
    schema_node = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = fh.read(16)
    return schema_node, codec, sync


def read_container(path: str):
    """Yield decoded record tuples from one container file."""
    with open(path, "rb") as fh:
        schema_node, codec, sync = read_header(fh)
        while True:
            try:
                count = _r_long(fh)
            except EOFError:
                return
            size = _r_long(fh)
            data = fh.read(size)
            if codec == "deflate":
                data = zlib.decompress(data, -15)
            elif codec != "null":
                raise ValueError(f"unsupported codec {codec!r}")
            if fh.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")
            buf = io.BytesIO(data)
            for _ in range(count):
                yield _decode(schema_node, buf)


def container_schema(path: str) -> T.StructType:
    with open(path, "rb") as fh:
        schema_node, _, _ = read_header(fh)
    return cdap_schema_to_spark(schema_node)


# ----------------------------------------------------- Spark DataSource

def _list_avro_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro") and not f.startswith((".", "_"))
    )


class AvroPyDataSource(DataSource):
    """``spark.read.format("avro_py").load(dir)`` /
    ``df.write.format("avro_py").mode(...).save(dir)``."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self):
        files = _list_avro_files(self.options["path"])
        if not files:
            raise FileNotFoundError(f"no .avro files under {self.options['path']}")
        return container_schema(files[0])

    def reader(self, schema) -> DataSourceReader:
        return AvroPyReader(self.options["path"])

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        path = self.options["path"]
        codec = self.options.get("codec", "deflate")
        os.makedirs(path, exist_ok=True)
        # Two-phase commit: nothing is deleted or made visible at plan
        # time. Tasks write hidden ``.staging-<run>-*`` files; commit()
        # renames only the files named in WriterCommitMessages (so
        # retried/speculative duplicates never surface) and removes the
        # pre-existing files *after* every task has succeeded — the
        # same old-data-survives-until-job-commit guarantee a Hadoop
        # FileOutputCommitter gives the reference's spark-avro path.
        node = json.loads(spark_schema_to_cdap(schema, name="row"))
        return AvroPyWriter(path, node, codec,
                            old_files=_list_avro_files(path) if overwrite else [])


class AvroPyReader(DataSourceReader):
    def __init__(self, path: str) -> None:
        self.files = _list_avro_files(path)
        # Pin the expected schema from the first file; read() verifies
        # every other file's embedded header against it so a
        # mixed-schema directory errors instead of silently yielding
        # tuples whose field order/width disagree with the read schema.
        self.expected_node = None
        if self.files:
            with open(self.files[0], "rb") as fh:
                self.expected_node, _, _ = read_header(fh)

    def partitions(self):
        # one task per container file — parallel like any file source
        return [InputPartition(f) for f in self.files]

    def read(self, partition: InputPartition):
        with open(partition.value, "rb") as fh:
            node, _, _ = read_header(fh)
        if self.expected_node is not None and node != self.expected_node:
            raise ValueError(
                f"avro schema mismatch: {partition.value} declares a different "
                f"schema than {self.files[0]}; refusing to decode a "
                f"mixed-schema directory"
            )
        yield from read_container(partition.value)


@dataclass
class AvroCommitMessage(WriterCommitMessage):
    staged: str | None  # staging-file basename, None for an empty task


class AvroPyWriter(DataSourceWriter):
    def __init__(self, path: str, schema_node: dict, codec: str,
                 old_files: list[str] | None = None) -> None:
        self.path = path
        self.schema_node = schema_node
        self.codec = codec
        self.old_files = old_files or []
        # Unique per write job: lets commit/abort sweep exactly this
        # job's orphans (failed attempts, speculative duplicates).
        self.run_id = uuid.uuid4().hex

    def _staging_name(self) -> str:
        # leading '.' keeps staging files invisible to _list_avro_files
        return f".staging-{self.run_id}-{uuid.uuid4().hex}.avro"

    def write(self, iterator) -> WriterCommitMessage:
        name = self._staging_name()
        part = os.path.join(self.path, name)
        n = write_container(part, self.schema_node, iterator, codec=self.codec)
        if n == 0:
            os.remove(part)  # don't leave empty containers behind
            return AvroCommitMessage(staged=None)
        return AvroCommitMessage(staged=name)

    def _sweep_staging(self) -> None:
        prefix = f".staging-{self.run_id}-"
        for f in os.listdir(self.path):
            if f.startswith(prefix):
                os.remove(os.path.join(self.path, f))

    def commit(self, messages) -> None:
        committed = [m.staged for m in messages
                     if getattr(m, "staged", None) is not None]
        for name in committed:
            final = "part-" + name[len(f".staging-{self.run_id}-"):]
            os.rename(os.path.join(self.path, name),
                      os.path.join(self.path, final))
        # only now is it safe to drop the overwritten generation
        for f in self.old_files:
            if os.path.exists(f):
                os.remove(f)
        self._sweep_staging()  # orphans from failed/speculative attempts
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        # old data untouched; this job's staging files removed
        self._sweep_staging()


def register(spark) -> None:
    """Idempotent registration of the ``avro_py`` format."""
    spark.dataSource.register(AvroPyDataSource)
