"""CDAP/Avro-JSON schema string <-> Spark ``StructType`` bridge.

The reference's public schema contract is an Avro-style JSON string in
the plugin config (reference ``PythonEvaluator.java:98-101,291-297``;
example in ``docs/PythonEvaluator-transform.md:74-83``). This module
reproduces that contract on Spark types:

- primitive map per the reference codec switch
  (``PythonObjectsEncoder.java:38-68``): null/boolean/int/long/float/
  double/bytes/string.
- ``enum`` maps to string (symbol name) with a deploy-time warning —
  a strict superset of the reference codec, which rejects enum outright
  (``PythonObjectsEncoder.java:51-52,67``).
- nullability is union-with-null, i.e. ``["string","null"]`` becomes a
  nullable string field (reference models nullability the same way,
  ``BasePythonTransformTest.java:68-73``).
- a general union (e.g. ``["string","int"]``) has no Spark equivalent;
  we represent it as a tagged struct ``struct<tag:string, member_0:..,
  member_1:..>`` and document the divergence from the reference's
  order-dependent, exception-driven resolution
  (``PythonObjectsEncoder.java:78-88,203-213``) rather than replicate it.

Spark-native types with no CDAP counterpart (timestamp, date, decimal)
round-trip through ``spark_schema_to_cdap`` using Avro logical-type
annotations.
"""

from __future__ import annotations

import json
import warnings
from typing import Any

from pyspark.sql import types as T

UNION_TAG_FIELD = "tag"
UNION_MEMBER_PREFIX = "member_"

_PRIMITIVES: dict[str, T.DataType] = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}

_TO_AVRO: dict[type, str] = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BinaryType: "bytes",
    T.StringType: "string",
    T.NullType: "null",
}


class SchemaParseError(ValueError):
    """Raised at deploy time for invalid schema JSON — the Spark
    equivalent of the reference's FailureCollector path
    (``PythonEvaluator.java:219-226``)."""


def cdap_schema_to_spark(schema: str | dict | T.StructType) -> T.StructType:
    """Parse a CDAP/Avro JSON schema string into a ``StructType``.

    Accepts an already-built ``StructType`` (pass-through), a JSON
    string, or the parsed dict. Also accepts Spark DDL strings
    ("a int, b string") for convenience.
    """
    if isinstance(schema, T.StructType):
        return schema
    if isinstance(schema, str):
        stripped = schema.strip()
        if not stripped.startswith("{"):
            # Spark DDL shorthand.
            try:
                parsed = T._parse_datatype_string(stripped)
            except Exception as exc:
                raise SchemaParseError(f"invalid schema string: {exc}") from exc
            if not isinstance(parsed, T.StructType):
                raise SchemaParseError("top-level schema must be a record/struct")
            return parsed
        try:
            schema = json.loads(stripped)
        except json.JSONDecodeError as exc:
            raise SchemaParseError(f"invalid schema JSON: {exc}") from exc
    dtype, nullable = _parse_type(schema)
    if not isinstance(dtype, T.StructType):
        raise SchemaParseError("top-level schema must be a record")
    if nullable:
        # A nullable top-level record is legal Avro; Spark rows are the
        # struct itself, so nullability collapses at top level.
        pass
    return dtype


def _parse_type(node: Any) -> tuple[T.DataType, bool]:
    """Return (dtype, nullable)."""
    if isinstance(node, str):
        if node not in _PRIMITIVES:
            raise SchemaParseError(f"unsupported type name: {node!r}")
        return _PRIMITIVES[node], node == "null"
    if isinstance(node, list):
        return _parse_union(node)
    if isinstance(node, dict):
        kind = node.get("type")
        if kind == "record":
            fields = []
            for f in node.get("fields", []):
                fdtype, fnullable = _parse_type(f["type"])
                fields.append(T.StructField(f["name"], fdtype, fnullable))
            return T.StructType(fields), False
        if kind == "array":
            edtype, enullable = _parse_type(node["items"])
            return T.ArrayType(edtype, containsNull=enullable), False
        if kind == "map":
            # CDAP maps carry explicit key schemas; Avro maps imply string
            # keys. Accept both.
            keys = node.get("keys", "string")
            kdtype, _ = _parse_type(keys)
            vdtype, vnullable = _parse_type(node["values"])
            return T.MapType(kdtype, vdtype, valueContainsNull=vnullable), False
        if kind == "enum":
            # The reference codec hard-rejects enum
            # (PythonObjectsEncoder.java:51-52,67); mapping symbols to
            # their string names is a strict superset — scripts see the
            # symbol as a plain string. Warn so the relaxation is
            # visible at deploy time.
            warnings.warn(
                f"avro enum {node.get('name', '?')!r} mapped to string "
                f"(symbols: {node.get('symbols', [])}); the reference "
                "rejects enum outright",
                stacklevel=2,
            )
            return T.StringType(), False
        if isinstance(kind, (str, list, dict)) and kind is not None:
            # logical-type annotated primitive, e.g.
            # {"type":"long","logicalType":"timestamp-micros"}
            logical = node.get("logicalType")
            if logical:
                return _parse_logical(kind, logical, node), False
            return _parse_type(kind)
    raise SchemaParseError(f"unrecognized schema node: {node!r}")


def _parse_logical(kind: Any, logical: str, node: dict) -> T.DataType:
    if logical in ("timestamp-micros", "timestamp-millis"):
        return T.TimestampType()
    if logical == "date":
        return T.DateType()
    if logical == "decimal":
        return T.DecimalType(node.get("precision", 38), node.get("scale", 18))
    base, _ = _parse_type(kind)
    return base


def _parse_union(members: list) -> tuple[T.DataType, bool]:
    nullable = "null" in members
    non_null = [m for m in members if m != "null"]
    if len(non_null) == 0:
        return T.NullType(), True
    if len(non_null) == 1:
        dtype, inner_nullable = _parse_type(non_null[0])
        return dtype, nullable or inner_nullable
    # General union -> tagged struct (SURVEY.md §7 decision).
    fields = [T.StructField(UNION_TAG_FIELD, T.StringType(), False)]
    for i, member in enumerate(non_null):
        dtype, _ = _parse_type(member)
        fields.append(T.StructField(f"{UNION_MEMBER_PREFIX}{i}", dtype, True))
    return T.StructType(fields), nullable


def spark_schema_to_cdap(schema: T.StructType, name: str = "record") -> str:
    """Serialize a StructType back to a CDAP/Avro-style JSON string."""
    return json.dumps(_unparse_struct(schema, name))


def _unparse_struct(struct: T.StructType, name: str) -> dict:
    fields = []
    for i, f in enumerate(struct.fields):
        ftype = _unparse_type(f.dataType, f"{name}_{f.name}")
        if f.nullable and not isinstance(f.dataType, T.NullType):
            ftype = [ftype, "null"]
        fields.append({"name": f.name, "type": ftype})
    return {"type": "record", "name": name, "fields": fields}


def _unparse_type(dtype: T.DataType, name: str) -> Any:
    for cls, avro_name in _TO_AVRO.items():
        if isinstance(dtype, cls):
            return avro_name
    if isinstance(dtype, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dtype, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dtype, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dtype.precision,
            "scale": dtype.scale,
        }
    if isinstance(dtype, T.ArrayType):
        items = _unparse_type(dtype.elementType, name)
        if dtype.containsNull:
            items = [items, "null"]
        return {"type": "array", "items": items}
    if isinstance(dtype, T.MapType):
        values = _unparse_type(dtype.valueType, name)
        if dtype.valueContainsNull:
            values = [values, "null"]
        return {
            "type": "map",
            "keys": _unparse_type(dtype.keyType, name),
            "values": values,
        }
    if isinstance(dtype, T.StructType):
        return _unparse_struct(dtype, name)
    raise SchemaParseError(f"cannot serialize Spark type {dtype}")
