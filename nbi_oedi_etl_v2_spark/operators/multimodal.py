"""Multimodal column plumbing (north-star extension).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, and implements decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` operators.

The decode step itself is STUBBED (the container ships no image/audio
codecs): ``decode_image_batch`` computes a deterministic fake
(dimensions + a checksum "feature" derived from the bytes) and the
real-codec seam is one clearly-marked function. Everything Spark-side
— schema, batch iteration, partition sizing, UDF signatures — is real
and tested; swapping in PIL/ffmpeg later changes only
``_decode_payload``.

Scale notes:
- payloads stay in executor memory one Arrow batch at a time
  (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak
  memory — set it low for multi-MB payloads);
- feature extraction is embarrassingly parallel; no shuffle;
- binary columns should be stored in their own parquet column chunk
  (they are, by schema) so metadata-only queries never read bytes
  (column pruning keeps scans cheap — verified in tests via
  ReadSchema).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("source_uri", T.StringType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("checksum_feature", T.DoubleType(), True),
    ]
)


def _decode_payload(payload: bytes) -> tuple[int, int, float]:
    """THE CODEC SEAM — deterministic fake decode.

    A real implementation would hand ``payload`` to PIL / libav here.
    The fake derives (width, height, feature) from the bytes so tests
    get stable, content-dependent values.
    """
    if payload is None or len(payload) == 0:
        raise NotImplementedError(
            "empty payload: real codec integration not available in this build"
        )
    w = 16 + (payload[0] % 64) * 16
    h = 16 + (payload[-1] % 64) * 16
    checksum = float(sum(payload[:256]) % 9973) / 9973.0
    return w, h, checksum


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, media_type: str = "image"
) -> DataFrame:
    """Build a media table from any table (test harness: documents →
    fake payloads). Real pipelines read payload parquet directly."""
    return df.select(
        F.col(f"`{id_col}`").cast("long").alias("media_id"),
        F.encode(F.col(f"`{text_col}`"), "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.concat(F.lit("synthetic://"), F.col(f"`{id_col}`").cast("string")).alias(
            "source_uri"
        ),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over MEDIA_SCHEMA rows →
    DECODED_SCHEMA rows. Batch-at-a-time keeps peak memory bounded
    regardless of corpus size."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_payload(bytes(p)) if p is not None else (None, None, None)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "checksum_feature": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def resize_media(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Arrow-batched resize: payload → payload' plus recorded target
    dims (MEDIA_SCHEMA in, MEDIA_SCHEMA + width/height out).

    The pixel resample is stubbed at the same codec seam as decode —
    the fake emits a deterministic fixed-length digest of the input
    bytes sized ``target_w × target_h // 64`` so downstream operators
    see realistic payload-size reduction. The Spark plumbing (binary
    in/out through Arrow, bounded batches, no shuffle) is the real
    contract.
    """
    out_schema = T.StructType(
        [*MEDIA_SCHEMA.fields,
         T.StructField("width", T.IntegerType(), True),
         T.StructField("height", T.IntegerType(), True)]
    )
    out_len = max(16, target_w * target_h // 64)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_resample(p):
            if p is None:
                return None
            b = bytes(p)
            # deterministic stretch/shrink of the byte stream to the
            # target length — the seam a real resampler replaces
            return bytes(b[i * len(b) // out_len] for i in range(out_len)) if b else b

        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [fake_resample(p) for p in pdf["payload"]]
            out["width"] = target_w
            out["height"] = target_h
            yield out

    return df.mapInPandas(resize_batches, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video payloads: emits (media_id,
    frame_index) rows without decoding — the downstream decode then
    touches only sampled frames. Demonstrates the partition-preserving
    explode pattern used for real codecs."""
    return df.where(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(100), F.lit(every_n))
        ).alias("frame_index"),
    )


def parse_png_header(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """REAL PNG header parsing — no codec library, no stub: validate
    the 8-byte PNG signature and read the IHDR fields (big-endian u32
    width/height at bytes 17-24, bit depth at 25, color type at 26)
    straight out of the binary column with JVM expressions
    (``hex`` + ``substring`` + ``conv``). Non-PNG payloads yield
    ``is_png = false`` and null dimensions instead of erroring.

    This is the metadata-extraction step a multimodal pipeline runs
    BEFORE any expensive decode (route by size/type, drop corrupt
    rows): map-only, codegen'd, zero Python. The pixel decode proper
    remains the acknowledged stub seam in ``decode_media``.
    """
    hx = F.hex(F.col(f"`{payload_col}`"))

    def be_u32(byte_off: int):
        return F.conv(F.substring(hx, (byte_off - 1) * 2 + 1, 8), 16, 10).cast("long")

    def u8(byte_off: int):
        return F.conv(F.substring(hx, (byte_off - 1) * 2 + 1, 2), 16, 10).cast("int")

    is_png = (F.length(F.col(f"`{payload_col}`")) >= 26) & (
        F.substring(hx, 1, 16) == "89504E470D0A1A0A"
    ) & (F.substring(hx, 25, 8) == "49484452")  # "IHDR"
    return df.select(
        F.col(f"`{id_col}`").alias("media_id"),
        is_png.alias("is_png"),
        F.when(is_png, be_u32(17)).alias("width"),
        F.when(is_png, be_u32(21)).alias("height"),
        F.when(is_png, u8(25)).alias("bit_depth"),
        F.when(is_png, u8(26)).alias("color_type"),
    )


def parse_wav_header(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """REAL WAV (RIFF) header parsing, little-endian, no codec lib:
    validate ``RIFF????WAVE`` + a canonical ``fmt `` chunk at byte 13
    and read audio format, channels, sample rate, and bits per sample
    from their fixed offsets. Little-endian u16/u32 are assembled by
    reversing the hex byte pairs before ``conv`` — still pure
    codegen'd JVM expressions, map-only.

    The audio twin of ``parse_png_header``: the route-before-decode
    metadata step (sample-rate buckets, mono/stereo routing, corrupt
    drop). Streams with a non-canonical chunk layout parse as
    ``is_wav = false`` rather than erroring — route those to the full
    decoder.
    """
    hx = F.hex(F.col(f"`{payload_col}`"))

    def le_bytes(byte_off: int, n: int):
        pairs = [
            F.substring(hx, (byte_off - 1 + i) * 2 + 1, 2)
            for i in reversed(range(n))
        ]
        return F.conv(F.concat(*pairs), 16, 10).cast("long")

    is_wav = (
        (F.length(F.col(f"`{payload_col}`")) >= 36)
        & (F.substring(hx, 1, 8) == "52494646")  # "RIFF"
        & (F.substring(hx, 17, 8) == "57415645")  # "WAVE"
        & (F.substring(hx, 25, 8) == "666D7420")  # "fmt "
    )
    return df.select(
        F.col(f"`{id_col}`").alias("media_id"),
        is_wav.alias("is_wav"),
        F.when(is_wav, le_bytes(21, 2).cast("int")).alias("audio_format"),
        F.when(is_wav, le_bytes(23, 2).cast("int")).alias("channels"),
        F.when(is_wav, le_bytes(25, 4)).alias("sample_rate"),
        F.when(is_wav, le_bytes(35, 2).cast("int")).alias("bits_per_sample"),
    )
