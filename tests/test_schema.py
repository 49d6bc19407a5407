"""CDAP/Avro-JSON schema bridge tests (reference contract:
PythonEvaluator.java:291-297, PythonObjectsEncoder.java type switch)."""

import json

import pytest
from pyspark.sql import types as T

from python_plugins_spark.schema import (
    SchemaParseError,
    cdap_schema_to_spark,
    spark_schema_to_cdap,
)

ALLTYPES_JSON = json.dumps(
    {
        "type": "record",
        "name": "alltypes",
        "fields": [
            {"name": "booleanField", "type": "boolean"},
            {"name": "intField", "type": "int"},
            {"name": "longField", "type": "long"},
            {"name": "floatField", "type": "float"},
            {"name": "doubleField", "type": "double"},
            {"name": "bytesField", "type": "bytes"},
            {"name": "stringField", "type": "string"},
            {"name": "nullableField", "type": ["string", "null"]},
            {"name": "mapField", "type": {"type": "map", "keys": "string", "values": "int"}},
            {"name": "arrayField", "type": {"type": "array", "items": "string"}},
            {"name": "unionField", "type": ["string", "int"]},
        ],
    }
)


def test_alltypes_parse():
    st = cdap_schema_to_spark(ALLTYPES_JSON)
    assert st["booleanField"].dataType == T.BooleanType()
    assert st["intField"].dataType == T.IntegerType()
    assert st["longField"].dataType == T.LongType()
    assert st["floatField"].dataType == T.FloatType()
    assert st["doubleField"].dataType == T.DoubleType()
    assert st["bytesField"].dataType == T.BinaryType()
    assert st["stringField"].dataType == T.StringType()
    # nullability modeled as union-with-null
    assert st["nullableField"].dataType == T.StringType()
    assert st["nullableField"].nullable
    assert st["mapField"].dataType == T.MapType(
        T.StringType(), T.IntegerType(), valueContainsNull=False
    )
    assert st["arrayField"].dataType == T.ArrayType(T.StringType(), containsNull=False)
    # general union -> tagged struct (SURVEY.md §7)
    u = st["unionField"].dataType
    assert isinstance(u, T.StructType)
    assert u.fieldNames() == ["tag", "member_0", "member_1"]


def test_enum_maps_to_string_with_warning():
    """VERDICT r2 #9: enum -> StringType (symbol name), a strict
    superset of the reference codec's hard-unsupported branch
    (PythonObjectsEncoder.java:51-52,67); the relaxation must be
    visible as a deploy-time warning."""
    import warnings

    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]}}
            ],
        }
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        st = cdap_schema_to_spark(schema)
    assert st["e"].dataType == T.StringType()
    assert any("enum 'E' mapped to string" in str(w.message) for w in caught)


def test_ddl_shorthand(spark):
    # DDL-string parsing goes through the active session's parser
    st = cdap_schema_to_spark("a int, b string")
    assert st.fieldNames() == ["a", "b"]


def test_invalid_json_fails_fast():
    with pytest.raises(SchemaParseError):
        cdap_schema_to_spark("{not json")


def test_roundtrip():
    st = cdap_schema_to_spark(ALLTYPES_JSON)
    back = cdap_schema_to_spark(spark_schema_to_cdap(st))
    assert back["mapField"].dataType == st["mapField"].dataType
    assert back["arrayField"].dataType == st["arrayField"].dataType


def test_logical_types_roundtrip():
    st = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("d", T.DateType()),
            T.StructField("dec", T.DecimalType(10, 2)),
        ]
    )
    back = cdap_schema_to_spark(spark_schema_to_cdap(st))
    assert back["ts"].dataType == T.TimestampType()
    assert back["d"].dataType == T.DateType()
    assert back["dec"].dataType == T.DecimalType(10, 2)


def test_general_union_tagged_struct():
    """Non-nullable general unions (SURVEY.md §7 hard-parts decision):
    emulated as a tagged struct of optional member fields, instead of
    replicating the reference's exception-driven member probing
    (PythonObjectsEncoder.java:78-88,203-213)."""
    s = cdap_schema_to_spark(
        '{"type":"record","name":"r","fields":['
        '{"name":"u","type":["string","long"]},'
        '{"name":"nu","type":["null","string","long"]}]}'
    )
    u = s["u"].dataType
    assert u.simpleString() == "struct<tag:string,member_0:string,member_1:bigint>"
    assert not s["u"].nullable
    assert s["nu"].nullable  # null member -> nullable tagged struct
