"""Multimodal column conventions: opaque binary payloads + typed metadata.

The engine's convention for image/audio/video data at 100 TB scale:

- the raw bytes live in a ``binary`` column (``payload``),
- a sibling ``StructType`` column carries typed metadata
  (``n_bytes``, ``content_md5``, ``mime``),
- decode / feature-extraction / resize / frame-sampling run as Arrow-
  batched ``mapInPandas`` stages so the bytes cross the JVM<->Python
  boundary once per batch, never per row.

Real codecs (PIL/opencv/ffmpeg) are not in this container, so the
decode step is STUBBED: ``decode_stub_features`` raises
``NotImplementedError`` unless ``fake=True``, in which case it derives
deterministic pseudo-features from the payload's md5 — making the whole
pipeline (schema, partitioning, UDF signature, batch shape) real and
testable, including against a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_TYPE = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("mime", T.StringType()),
    ]
)


def attach_payload(
    df: DataFrame, content_col: str, mime: str = "text/plain"
) -> DataFrame:
    """Wrap a column's UTF-8 bytes as a multimodal payload + metadata.
    (In a real ingest the payload would come from binaryFile / blob
    storage; the convention is identical.)"""
    payload = F.encode(F.col(content_col), "UTF-8")
    meta = F.struct(
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
        F.lit(mime).alias("mime"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


FEATURE_SCHEMA_SUFFIX = (
    "fake_width int, fake_height int, fake_channels int, fake_brightness double"
)


def decode_stub_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """'Decode' each payload and emit fixed-shape features.

    With ``fake=True``: deterministic pseudo-features from the md5 of
    the payload bytes (so the Spark<->oracle comparison exercises the
    full binary pipeline). Otherwise raises NotImplementedError — the
    real implementation would call PIL/opencv here, batch-wise.
    """
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("fake_width", T.IntegerType()),
            T.StructField("fake_height", T.IntegerType()),
            T.StructField("fake_channels", T.IntegerType()),
            T.StructField("fake_brightness", T.DoubleType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image/audio codecs not available in this environment; "
                    "pass fake=True for deterministic pseudo-decode"
                )
            out = {id_col: [], "fake_width": [], "fake_height": [],
                   "fake_channels": [], "fake_brightness": []}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                h = hashlib.md5(bytes(payload)).hexdigest()
                out[id_col].append(rid)
                out["fake_width"].append(int(h[0:2], 16))
                out["fake_height"].append(int(h[2:4], 16))
                out["fake_channels"].append(1 + int(h[4:5], 16) % 4)
                out["fake_brightness"].append(round(int(h[5:8], 16) / 4095.0, 6))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(decode, schema)


def decode_stub_features_oracle_sql(table: str, content_col: str, id_col: str) -> str:
    """DuckDB twin of the fake decode: md5 of the UTF-8 bytes drives the
    same pseudo-feature arithmetic (DuckDB md5(VARCHAR) hashes the
    string's UTF-8 bytes — the exact payload bytes Spark hashes)."""
    h = f"md5({content_col})"
    return f"""
        WITH _h AS (SELECT {id_col}, {h} AS h FROM {table})
        SELECT {id_col},
               ('0x' || substr(h, 1, 2))::INT AS fake_width,
               ('0x' || substr(h, 3, 2))::INT AS fake_height,
               (1 + ('0x' || substr(h, 5, 1))::INT % 4) AS fake_channels,
               round(('0x' || substr(h, 6, 3))::INT / 4095.0, 6) AS fake_brightness
        FROM _h
    """


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_frames: int = 4,
    frame_bytes: int = 16,
) -> DataFrame:
    """Frame-sampling plumbing: emit ``n_frames`` evenly-spaced
    byte-slices per payload (1 -> N rows, the fan-out shape a real
    video frame sampler has). Runs JVM-side — slicing bytes needs no
    Python."""
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_no")
    base = df.select(F.col(id_col), F.col(payload_col), idx)
    return base.select(
        id_col,
        "frame_no",
        F.expr(
            f"substr({payload_col}, 1 + cast(floor(frame_no * length({payload_col}) / {n_frames}) as int), {frame_bytes})"
        ).alias("frame_bytes"),
    )
