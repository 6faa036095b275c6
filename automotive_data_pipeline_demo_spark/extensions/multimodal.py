"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode step is STUBBED (image/audio libraries are not in this container):
``decode_image_stub`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it emits a schema-correct fake
derived from the bytes (md5-seeded dims) so the Spark-side plumbing —
schema, Arrow batch shape, ``mapInPandas`` signature, partition behavior —
is real and testable.

Scale notes: binary payloads ride in parquet as a normal column; the decode
map is a narrow ``mapInPandas`` (Arrow-batched, no shuffle). Feature columns
come back as typed struct/array columns so downstream similarity/dedup
operators (see ``similarity.py``) apply unchanged. Keep batch sizes bounded
via ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = (
    "media_id long, media_type string, n_bytes long, sha string, "
    "width int, height int, feature array<double>"
)


def attach_binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata that never needs decoding: byte length + digest.

    Pure column expressions — this is the 100 TB fast path for exact media
    dedup (group by sha) without touching Python.
    """
    return df.withColumn("n_bytes", F.octet_length(F.col(payload_col))).withColumn(
        "sha", F.sha2(F.col(payload_col), 256)
    )


def decode_media(
    df: DataFrame,
    deterministic_fake: bool = False,
    feature_dim: int = 8,
    decoder=None,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).

    ``decoder`` is the pluggable decode contract: a pure-Python callable
    ``(payload: bytes, media_type: str) -> (width, height, feature_list)``
    run payload-by-payload inside the Arrow batch loop — wrap PIL /
    torchaudio / ffmpeg here in a real deployment. Those libs are not
    installed in this container, so without a decoder,
    ``deterministic_fake`` derives dims and a feature vector from the
    payload digest, exercising the same distributed plumbing; with
    neither, the call raises ``NotImplementedError``.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Columnar per-batch work (Series.map per column), never
        # pdf.iterrows(): row boxing costs ~10x on wide Arrow batches, and
        # this function is the template real decoders get copied from.
        for pdf in batches:
            if decoder is None and not deterministic_fake:
                raise NotImplementedError(
                    "media decoding requires image/audio libs not present in "
                    "this container; pass a decoder callable or "
                    "deterministic_fake=True for the schema-correct stub"
                )
            payloads = pdf["payload"].map(
                lambda v: bytes(v) if v is not None else b""
            )
            if decoder is not None:
                decoded = [
                    decoder(p, t)
                    for p, t in zip(payloads, pdf["media_type"])
                ]
                widths = pd.Series([d[0] for d in decoded], dtype="int32")
                heights = pd.Series([d[1] for d in decoded], dtype="int32")
                features = pd.Series([list(d[2]) for d in decoded])
            else:
                digests = payloads.map(lambda p: hashlib.md5(p).digest())
                widths = digests.map(lambda d: 1 + d[0] % 64).astype("int32")
                heights = digests.map(lambda d: 1 + d[1] % 64).astype("int32")
                features = digests.map(
                    lambda d: [b / 255.0 for b in d[:feature_dim]]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": payloads.map(len).astype("int64").to_numpy(),
                    "sha": payloads.map(
                        lambda p: hashlib.sha256(p).hexdigest()
                    ).to_numpy(),
                    "width": widths.to_numpy(),
                    "height": heights.to_numpy(),
                    "feature": features.to_numpy(),
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan frame-sampling offsets from metadata only (no decode).

    Emits (media_id, frame_ms) rows — the explode is JVM-side; the decode of
    each sampled frame is a later ``decode_media`` pass over a much smaller
    row set. This ordering (plan cheap, decode sparse) is what survives video
    at scale.
    """
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )


def _be_int(payload: Column, pos: int, nbytes: int) -> Column:
    """Big-endian unsigned int from ``nbytes`` at 1-based ``pos``."""
    return F.conv(F.hex(F.substring(payload, pos, nbytes)), 16, 10).cast("long")


def _le_int(payload: Column, pos: int, nbytes: int) -> Column:
    """Little-endian unsigned int: fold bytes with ascending place value."""
    out = F.lit(0).cast("long")
    for i in range(nbytes):
        out = out + _be_int(payload, pos + i, 1) * F.lit(1 << (8 * i))
    return out


def image_dimensions(payload: Column) -> Column:
    """(format, width, height) struct parsed from fixed-offset image headers
    — PNG (IHDR big-endian at byte 17), GIF87a/89a (little-endian at 7),
    BMP (BITMAPINFOHEADER little-endian at 19) — entirely in JVM binary
    expressions: substring on the binary column, hex, and integer
    conversion. No Python, no decode library, no UDF.

    This is the 100 TB metadata fast path: dimensions, aspect-ratio
    filters, and resolution histograms over billions of stored images
    read a few header bytes per row inside whole-stage codegen (parquet
    can't prune the payload column, but nothing leaves the JVM and no
    Arrow transfer happens). Formats whose dimensions need a real segment
    scan (JPEG SOF markers sit behind variable-length segments) return a
    NULL format here and route to ``decode_media``'s pluggable decoder.

    Robustness: each branch is gated on the format's minimum header length
    (PNG 24, GIF 10, BMP 26 bytes), so a payload truncated mid-header —
    magic intact, dimension bytes missing — returns the NULL-format row
    instead of garbage dims under a confident format tag. The BMP branch
    additionally requires the DIB size field (offset 14) to be >= 40:
    every >=40-byte DIB header (BITMAPINFOHEADER 40 and its V2/V3/OS2v2/
    V4/V5 extensions 52/56/64/108/124) extends BITMAPINFOHEADER's first
    40 bytes, so width/height sit at offsets 18/22 in all of them; the
    sub-40 shapes — notably the 12-byte BITMAPCOREHEADER, which stores
    16-bit dims at offset 18 and would misparse here — route to the
    NULL-format/decode_media path instead. BMP height is a SIGNED
    little-endian int32 (negative =
    top-down DIB, biHeight); the magnitude is the pixel height, so the
    two's-complement value is folded to abs() rather than surfacing as a
    wrapped negative. The fold's one unrepresentable edge (biHeight =
    INT32_MIN, magnitude 2^31) and any width >= 2^31 would wrap through
    the final int cast — such dims surface as NULL under the 'bmp' tag
    rather than as confident negatives.
    """
    n = F.length(payload)
    hex8 = F.hex(F.substring(payload, 1, 8))
    hex6 = F.hex(F.substring(payload, 1, 6))
    hex2 = F.hex(F.substring(payload, 1, 2))
    int_max = F.lit((1 << 31) - 1)
    is_png = (n >= 24) & (hex8 == F.lit("89504E470D0A1A0A"))
    is_gif = (n >= 10) & (
        (hex6 == F.lit("474946383961")) | (hex6 == F.lit("474946383761"))
    )
    is_bmp = (
        (n >= 26)
        & (hex2 == F.lit("424D"))
        # BITMAPINFOHEADER and every extension of it (52/56/64/108/124);
        # sub-40 core headers store 16-bit dims and route to decode_media
        & (_le_int(payload, 15, 4) >= F.lit(40))
    )
    bmp_w = _le_int(payload, 19, 4)
    bmp_h_raw = _le_int(payload, 23, 4)  # unsigned fold of a signed field
    bmp_h = F.when(
        bmp_h_raw >= F.lit(1 << 31), F.lit(1 << 32) - bmp_h_raw
    ).otherwise(bmp_h_raw)
    bmp_dims_ok = (bmp_w <= int_max) & (bmp_h <= int_max)
    # same wrap hazard for PNG: IHDR dims are 4-byte big-endian and the spec
    # caps them at 2^31-1, so an over-limit (hostile) header NULLs its dims
    png_w = _be_int(payload, 17, 4)
    png_h = _be_int(payload, 21, 4)
    png_dims_ok = (png_w <= int_max) & (png_h <= int_max)
    return (
        F.when(is_png, F.struct(
            F.lit("png").alias("format"),
            F.when(png_dims_ok, png_w.cast("int")).alias("width"),
            F.when(png_dims_ok, png_h.cast("int")).alias("height"),
        ))
        .when(is_gif, F.struct(
            F.lit("gif").alias("format"),
            _le_int(payload, 7, 2).cast("int").alias("width"),
            _le_int(payload, 9, 2).cast("int").alias("height"),
        ))
        .when(is_bmp, F.struct(
            F.lit("bmp").alias("format"),
            F.when(bmp_dims_ok, bmp_w.cast("int")).alias("width"),
            F.when(bmp_dims_ok, bmp_h.cast("int")).alias("height"),
        ))
        .otherwise(F.struct(
            F.lit(None).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ))
    )
