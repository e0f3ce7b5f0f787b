"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
functions over ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder derived from the bytes is used. Everything
Spark-side — schema handling, partition sizing, UDF signatures, Arrow
batch shapes — is real and tested; swapping in PIL/libsndfile later
changes one function body.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata struct carried alongside every media column
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),   # image | audio | video
    T.StructField("format", T.StringType()),       # png, wav, ...
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.StringType()),     # md5 hex of payload
])

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, "
    "width int, height int, mean_luma double"
)

AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, "
    "sample_rate int, n_samples long, rms double"
)


def decode_image(payload: bytes, fake: bool = False):
    """Decode an image payload → (width, height, mean_luma).

    STUB: real decoding needs an image library not present in this
    container. ``fake=True`` derives deterministic pseudo-dimensions
    from the payload hash so the distributed plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library (e.g. PIL); "
            "not available in this environment — pass fake=True for "
            "deterministic plumbing tests")
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = (h[2] * 256 + h[3]) / 65535.0
    return width, height, mean_luma


def decode_audio(payload: bytes, fake: bool = False):
    """STUB — see decode_image."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires an audio library; pass fake=True "
            "for deterministic plumbing tests")
    h = hashlib.md5(payload).digest()
    sample_rate = (8000, 16000, 22050, 44100)[h[0] % 4]
    n_samples = 1000 + int.from_bytes(h[1:3], "big")
    rms = h[3] / 255.0
    return sample_rate, n_samples, rms


def attach_media_meta(df: DataFrame, binary_col: str, media_type: str,
                      fmt: str) -> DataFrame:
    """Add the typed metadata struct for a binary media column —
    pure column expressions (codegen'd, no Python)."""
    payload = F.col(binary_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ),
    )


def extract_image_features(df: DataFrame, binary_col: str = "payload",
                           id_col: str = "doc_id",
                           fake: bool = True) -> DataFrame:
    """Image feature extraction over mapInPandas: Arrow-batched, one
    pandas DataFrame per partition batch. Partitioning: inherits the
    scan's partitions; for 100 TB media, repartition upstream so a
    batch of payloads fits executor memory (maxPartitionBytes tuning),
    not here."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[binary_col]
            decoded = [decode_image(bytes(p), fake=fake) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "n_bytes": payloads.map(len).astype("int64"),
                "checksum": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "mean_luma": [d[2] for d in decoded],
            })

    return df.select(id_col, binary_col).mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA)


def extract_audio_features(df: DataFrame, binary_col: str = "payload",
                           id_col: str = "doc_id",
                           fake: bool = True) -> DataFrame:
    """Audio feature extraction over mapInPandas — same Arrow-batched
    shape as extract_image_features with the audio stub decoder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[binary_col]
            decoded = [decode_audio(bytes(p), fake=fake) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "n_bytes": payloads.map(len).astype("int64"),
                "checksum": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "sample_rate": [d[0] for d in decoded],
                "n_samples": [d[1] for d in decoded],
                "rms": [d[2] for d in decoded],
            })

    return df.select(id_col, binary_col).mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA)


def resize_images(df: DataFrame, binary_col: str = "payload",
                  target: int = 224, fake: bool = True) -> DataFrame:
    """Resize plumbing: output schema mirrors input with a resized
    payload column. The fake path passes bytes through (checksummed);
    a real implementation swaps the body only."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError("real resize needs an image library")
            pdf = pdf.copy()
            pdf["resized"] = pdf[binary_col]
            pdf["target_size"] = target
            yield pdf

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", resized binary, target_size int"
    return df.mapInPandas(batches, schema=out_schema)


def sample_video_frames(df: DataFrame, binary_col: str = "payload",
                        every_n: int = 30, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing: one row in → N frame rows out
    (flat-map shape). Fake decoder emits a deterministic frame count
    derived from the payload hash."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError("real frame sampling needs a video library")
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[binary_col])
                digest = hashlib.md5(payload).hexdigest()
                n_frames = 1 + int(digest[:2], 16) % 8
                for i in range(n_frames):
                    rows.append({
                        "doc_id": row["doc_id"],
                        "frame_idx": i * every_n,
                        "frame_checksum": hashlib.md5(
                            f"{digest}:{i}".encode()).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_checksum"])

    return df.mapInPandas(
        batches, schema="doc_id long, frame_idx int, frame_checksum string")
