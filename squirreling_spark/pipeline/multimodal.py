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


def _byte_at(payload_col: str, pos) -> "F.Column":
    """Unsigned byte value at 1-based position ``pos`` (int or Column) of a
    binary column — hex→int conversion, pure JVM expression, no UDF.
    Returns NULL past the end of the payload."""
    p = F.lit(pos) if isinstance(pos, int) else pos
    one = F.col(payload_col).substr(p, F.lit(1))
    return F.when(
        F.octet_length(one) == 1, F.conv(F.hex(one), 16, 10).cast("bigint")
    )


def _le_uint(payload_col: str, pos: int, nbytes: int):
    """Little-endian unsigned int read from a binary column, built from
    per-byte hex→int conversions — pure JVM expressions, no UDF."""
    total = F.lit(0).cast("bigint")
    for i in range(nbytes):
        total = total + _byte_at(payload_col, pos + i) * (256 ** i)
    return total


def _le_uint_at(payload_col: str, pos, nbytes: int):
    """Little-endian unsigned int read at a Column position (RIFF chunk
    walk) — same per-byte hex arithmetic as ``_le_uint``."""
    base = F.lit(pos) if isinstance(pos, int) else pos
    total = F.lit(0).cast("bigint")
    for i in range(nbytes):
        total = total + _byte_at(payload_col, base + F.lit(i)) * (256 ** i)
    return total


def _le_int32(payload_col: str, pos: int):
    """Little-endian SIGNED int32 read. BITMAPINFOHEADER width/height are
    signed (a negative height means a top-down pixel order BMP); recovering
    the sign explicitly keeps the later ``int`` cast in-range under ANSI
    mode instead of relying on non-ANSI wraparound."""
    v = _le_uint(payload_col, pos, 4)
    return F.when(v >= 2**31, v - F.lit(2**32).cast("bigint")).otherwise(v)


def _be_uint(payload_col: str, pos, nbytes: int):
    """Big-endian unsigned int read (network byte order — PNG/JPEG).
    ``pos`` may be an int or a Column (JPEG marker scan)."""
    base = F.lit(pos) if isinstance(pos, int) else pos
    total = F.lit(0).cast("bigint")
    for i in range(nbytes):
        total = total * 256 + _byte_at(payload_col, base + F.lit(i))
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
    w = _le_int32(payload_col, 19)
    h = _le_int32(payload_col, 23)
    return df.select(
        "media_id",
        is_bmp.alias("is_bmp"),
        F.when(is_bmp, w).cast("int").alias("bmp_width"),
        # signed: negative height = top-down row order; |height| is the
        # pixel count — callers decide which view they need
        F.when(is_bmp, h).cast("int").alias("bmp_height"),
    )


# JPEG SOFn markers that carry frame dimensions: C0-CF minus C4 (DHT),
# C8 (JPG extension), CC (DAC).
_SOF_MARKERS = [m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)]


def _png_cols(payload_col: str):
    """(is_png, width, height) — PNG signature is 8 fixed bytes, the IHDR
    chunk is mandatory-first, so width/height sit at fixed big-endian
    offsets 17-20 / 21-24 (1-based)."""
    is_png = (F.octet_length(F.col(payload_col)) >= 24) & (
        F.hex(F.expr(f"substring({payload_col}, 1, 8)"))
        == F.lit("89504E470D0A1A0A")
    )
    return is_png, _be_uint(payload_col, 17, 4), _be_uint(payload_col, 21, 4)


def _jpeg_scan_cols(df: DataFrame, payload_col: str, max_segments: int = 8):
    """JPEG dimensions by SOF marker scan, pure JVM expressions.

    Unlike BMP/PNG, JPEG has no fixed-offset header: the SOFn frame segment
    sits after a variable number of variable-length segments (APPn, DQT,
    COM, …), so the parse must WALK the segment chain: start after FFD8, at
    each hop read the 2-byte big-endian segment length and advance
    pos += 2 + len until a SOFn marker (height at pos+5, width at pos+7,
    big-endian) or the unroll bound. The walk is unrolled ``max_segments``
    times as chained withColumn steps — each hop's position is an aliased
    column referenced several times, which Catalyst's CollapseProject keeps
    materialized instead of inlining exponentially.

    Returns the df with (_jpg_w, _jpg_h) columns appended (NULL when no SOF
    found within the bound or the chain is malformed)."""
    out = (
        df.withColumn("_jp", F.lit(3).cast("bigint"))
        .withColumn("_jpg_w", F.lit(None).cast("bigint"))
        .withColumn("_jpg_h", F.lit(None).cast("bigint"))
    )
    for _ in range(max_segments):
        at_marker = _byte_at(payload_col, F.col("_jp")) == 0xFF
        mtype = _byte_at(payload_col, F.col("_jp") + 1)
        is_sof = at_marker & mtype.isin(_SOF_MARKERS)
        out = (
            out.withColumn(
                "_jpg_h",
                F.coalesce(
                    "_jpg_h",
                    F.when(is_sof, _be_uint(payload_col, F.col("_jp") + 5, 2)),
                ),
            )
            .withColumn(
                "_jpg_w",
                F.coalesce(
                    "_jpg_w",
                    F.when(is_sof, _be_uint(payload_col, F.col("_jp") + 7, 2)),
                ),
            )
            .withColumn(
                "_jp",
                F.when(
                    at_marker & ~mtype.isin(_SOF_MARKERS + [0xD8, 0xD9]),
                    F.col("_jp") + 2 + _be_uint(payload_col, F.col("_jp") + 2, 2),
                ),
            )
        )
    return out


def image_dimensions(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL (non-stub) image metadata extraction for BMP + PNG + JPEG +
    GIF, entirely JVM-side — magic-byte dispatch, then the per-format
    header read: BMP/GIF little-endian fixed offsets, PNG big-endian IHDR
    fixed offsets, JPEG variable-length SOF marker scan. No image library,
    no Python row path; headers decode at scan speed, reserving the
    Arrow/Python path for actual pixel work.

    Output: (media_id, fmt ∈ {bmp,png,jpeg,gif} | NULL, width, height)."""
    is_bmp = (F.octet_length(F.col(payload_col)) >= 26) & (
        F.expr(f"substring({payload_col}, 1, 2)") == F.lit(b"BM")
    )
    is_png, png_w, png_h = _png_cols(payload_col)
    is_jpeg = (F.octet_length(F.col(payload_col)) >= 4) & (
        F.hex(F.expr(f"substring({payload_col}, 1, 2)")) == F.lit("FFD8")
    )
    is_gif = (F.octet_length(F.col(payload_col)) >= 10) & (
        F.expr(f"substring({payload_col}, 1, 6)").isin(
            F.lit(b"GIF87a"), F.lit(b"GIF89a")
        )
    )
    scanned = _jpeg_scan_cols(df, payload_col)
    return scanned.select(
        "media_id",
        F.when(is_bmp, F.lit("bmp"))
        .when(is_png, F.lit("png"))
        .when(is_jpeg, F.lit("jpeg"))
        .when(is_gif, F.lit("gif"))
        .alias("fmt"),
        F.when(is_bmp, _le_int32(payload_col, 19))
        .when(is_png, png_w)
        .when(is_jpeg, F.col("_jpg_w"))
        .when(is_gif, _le_uint(payload_col, 7, 2))
        .cast("int")
        .alias("width"),
        F.when(is_bmp, _le_int32(payload_col, 23))
        .when(is_png, png_h)
        .when(is_jpeg, F.col("_jpg_h"))
        .when(is_gif, _le_uint(payload_col, 9, 2))
        .cast("int")
        .alias("height"),
    )


def wav_metadata(
    df: DataFrame, payload_col: str = "payload", max_chunks: int = 6
) -> DataFrame:
    """REAL WAV/RIFF audio metadata extraction, entirely JVM-side: after
    validating the RIFF....WAVE container magic, WALK the chunk chain
    (chunks are [4-byte id][4-byte LE size][data], padded to even sizes)
    to find the ``fmt `` chunk — channels/sample-rate/byte-rate/bits at
    fixed offsets within it — and the ``data`` chunk, whose SIZE divided
    by the byte rate gives the duration. The walk is unrolled
    ``max_chunks`` times as chained withColumn hops (same
    CollapseProject-friendly shape as the JPEG SOF scan); JUNK/LIST/fact
    chunks before ``fmt `` are skipped naturally. Only the headers are
    read — a payload truncated after the ``data`` size field still parses.

    Output: (media_id, is_wav, n_channels, sample_rate, bits_per_sample,
    duration_ms)."""
    p = F.col(payload_col)
    is_wav = (
        (F.octet_length(p) >= 36)
        & (F.expr(f"substring({payload_col}, 1, 4)") == F.lit(b"RIFF"))
        & (F.expr(f"substring({payload_col}, 9, 4)") == F.lit(b"WAVE"))
    )
    out = (
        df.withColumn("_wp", F.lit(13).cast("bigint"))  # first chunk id
        .withColumn("_fmt_at", F.lit(None).cast("bigint"))
        .withColumn("_data_sz", F.lit(None).cast("bigint"))
    )
    for _ in range(max_chunks):
        cid = p.substr(F.col("_wp"), F.lit(4))
        csize = _le_uint_at(payload_col, F.col("_wp") + 4, 4)
        out = (
            out.withColumn(
                "_fmt_at",
                F.coalesce(
                    "_fmt_at", F.when(cid == F.lit(b"fmt "), F.col("_wp"))
                ),
            )
            .withColumn(
                "_data_sz",
                F.coalesce(
                    "_data_sz", F.when(cid == F.lit(b"data"), csize)
                ),
            )
            # next chunk: header (8) + data, padded to even
            .withColumn("_wp", F.col("_wp") + 8 + csize + csize % 2)
        )
    n_channels = _le_uint_at(payload_col, F.col("_fmt_at") + 10, 2)
    sample_rate = _le_uint_at(payload_col, F.col("_fmt_at") + 12, 4)
    byte_rate = _le_uint_at(payload_col, F.col("_fmt_at") + 16, 4)
    bits = _le_uint_at(payload_col, F.col("_fmt_at") + 22, 2)
    return out.select(
        "media_id",
        is_wav.alias("is_wav"),
        F.when(is_wav, n_channels).cast("int").alias("n_channels"),
        F.when(is_wav, sample_rate).cast("int").alias("sample_rate"),
        F.when(is_wav, bits).cast("int").alias("bits_per_sample"),
        F.when(is_wav & (byte_rate > 0), F.floor(F.col("_data_sz") * 1000 / byte_rate))
        .cast("bigint")
        .alias("duration_ms"),
    )
