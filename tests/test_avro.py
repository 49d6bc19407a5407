"""Avro source/sink (sources/avro_py.py): self-roundtrip across the
type surface, and spec-compliance cross-validation against the
reference JVM implementation (org.apache.avro, on Spark's classpath)
via py4j."""

import datetime
import glob
import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_plugins_spark.sources.avro_py import (
    read_container,
    register,
    write_container,
)

SCRATCH = "/root/repo/.scratch"


def test_avro_all_types_roundtrip(spark):
    """Nested record / array / map / nullable / timestamp / date /
    binary / bool survive write->read bit-exactly."""
    register(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
            T.StructField("flag", T.BooleanType(), True),
            T.StructField("blob", T.BinaryType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("d", T.DateType(), True),
            T.StructField("tags", T.ArrayType(T.StringType()), True),
            T.StructField("attrs", T.MapType(T.StringType(), T.LongType()), True),
            T.StructField(
                "nested",
                T.StructType(
                    [
                        T.StructField("a", T.IntegerType(), True),
                        T.StructField("b", T.StringType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    rows = [
        (
            1,
            "alpha",
            1.5,
            True,
            b"\x00\xff",
            datetime.datetime(2024, 5, 1, 12, 30, 15, 123456),
            datetime.date(2024, 5, 1),
            ["x", "y"],
            {"k1": 10, "k2": 20},
            Row(a=7, b="inner"),
        ),
        (2, None, None, None, None, None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, schema)
    path = os.path.join(SCRATCH, "avro_all_types")
    df.write.format("avro_py").mode("overwrite").save(path)
    back = spark.read.format("avro_py").load(path)
    assert back.schema == schema
    got = sorted(back.collect(), key=lambda r: r.id)
    want = sorted(df.collect(), key=lambda r: r.id)
    assert got == want


def test_avro_jvm_cross_validation(spark):
    """Files written by the pure-Python codec must parse under the
    reference Java Avro library (DataFileReader + GenericDatumReader):
    proves object-container spec compliance, not just self-roundtrip."""
    register(spark)
    df = spark.range(500).select(
        F.col("id"),
        (F.col("id") * 2.5).alias("v"),
        F.concat(F.lit("row-"), F.col("id")).alias("s"),
    )
    path = os.path.join(SCRATCH, "avro_jvm_check")
    df.write.format("avro_py").mode("overwrite").save(path)
    files = sorted(glob.glob(os.path.join(path, "*.avro")))
    assert files

    jvm = spark._jvm
    total = 0
    for f in files:
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(f), jvm.org.apache.avro.generic.GenericDatumReader()
        )
        try:
            schema_fields = [
                x.name() for x in reader.getSchema().getFields()
            ]
            assert schema_fields == ["id", "v", "s"]
            while reader.hasNext():
                rec = reader.next()
                rid = rec.get("id")
                assert rec.get("v") == float(rid) * 2.5
                assert str(rec.get("s")) == f"row-{rid}"
                total += 1
        finally:
            reader.close()
    assert total == 500


def test_avro_null_codec_and_python_api(tmp_path):
    """Container-level API without Spark: null codec, block framing."""
    node = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "txt", "type": ["string", "null"]},
        ],
    }
    p = str(tmp_path / "plain.avro")
    n = write_container(p, node, [(1, "a"), (2, None), (3, "c")], codec="null")
    assert n == 3
    assert list(read_container(p)) == [(1, "a"), (2, None), (3, "c")]
