"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata structs.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
partition sizing — while the codec step is stubbed (no image/audio libs in
this container): ``decode_image`` produces a deterministic fake decode so
the pipeline shape can be validated end-to-end; swap ``_decode_bytes`` for a
PIL/ffmpeg call in production.

Scale notes:
- decode runs in ``mapInPandas`` (Arrow-batched) so bytes never cross the
  Python boundary row-at-a-time; ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds batch memory (binary payloads are large — size it down, e.g. 256).
- metadata-only queries (dimensions, format, hash) never touch the decode
  path: they read the typed metadata struct, so column pruning skips the
  binary blob entirely in parquet.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("format", StringType(), True),  # png|jpeg|wav|mp4…
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("sample_rate", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_pixels", IntegerType(), True),
        StructField("checksum", StringType(), True),
    ]
)


def _decode_bytes(payload: bytes) -> dict:
    """STUB codec: deterministic fake decode derived from the payload hash.

    Production: replace with PIL.Image.open(io.BytesIO(payload)) etc. The
    function contract (bytes → dict of decoded properties) is the real one.
    """
    if payload is None:
        return {"width": None, "height": None, "n_pixels": None, "checksum": None}
    h = hashlib.sha256(payload).hexdigest()
    width = 16 + int(h[:4], 16) % 1024
    height = 16 + int(h[4:8], 16) % 1024
    return {
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "checksum": h,
    }


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode binary payloads via Arrow-batched mapInPandas (stub codec)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                [_decode_bytes(b) for b in pdf[payload_col]],
            )
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[["media_id", "width", "height", "n_pixels", "checksum"]]

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata-only projection — never reads the binary payload column, so
    parquet column pruning skips the blobs (check ReadSchema in explain)."""
    return df.select(
        "media_id",
        "kind",
        "format",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.octet_length("payload").alias("n_bytes"),
    )


def resize_plan(df: DataFrame, max_dim: int = 256) -> DataFrame:
    """Plan resize targets from metadata only (no decode): compute the
    scale factor JVM-side; the decode+resample stage consumes this plan."""
    scale = F.least(
        F.lit(1.0),
        max_dim / F.greatest(F.col("meta.width"), F.col("meta.height")).cast("double"),
    )
    return df.select(
        "media_id",
        F.round(scale, 6).alias("scale"),
        F.ceil(F.col("meta.width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("meta.height") * scale).cast("int").alias("target_h"),
    )


def _le_uint(payload_col: str, pos: int, nbytes: int):
    """Little-endian unsigned int read from a binary column, built from
    per-byte hex→int conversions — pure JVM expressions, no UDF."""
    total = F.lit(0).cast("bigint")
    for i in range(nbytes):
        b = F.conv(
            F.hex(F.expr(f"substring({payload_col}, {pos + i}, 1)")), 16, 10
        ).cast("bigint")
        total = total + b * (256 ** i)
    return total


def bmp_dimensions(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL (non-stub) image metadata extraction for BMP payloads, entirely
    JVM-side: validate the 'BM' magic, read the little-endian width/height
    from the BITMAPINFOHEADER (byte offsets 19-22 / 23-26, 1-based) with
    per-byte hex arithmetic — no image library, no Python, whole-stage
    codegen. The pattern for any fixed-offset binary format (WAV sample
    rates, PNG IHDR after a 4-byte byteswap, …): decode headers at scan
    speed and reserve the Python/Arrow path for actual pixel work.

    Output: (media_id, is_bmp, bmp_width, bmp_height) — dimensions NULL
    for non-BMP payloads."""
    is_bmp = (F.octet_length(F.col(payload_col)) >= 26) & (
        F.expr(f"substring({payload_col}, 1, 2)") == F.lit(b"BM")
    )
    w = _le_uint(payload_col, 19, 4)
    h = _le_uint(payload_col, 23, 4)
    return df.select(
        "media_id",
        is_bmp.alias("is_bmp"),
        F.when(is_bmp, w).cast("int").alias("bmp_width"),
        F.when(is_bmp, h).cast("int").alias("bmp_height"),
    )
