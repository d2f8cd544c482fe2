"""Multimodal column handling (SURVEY §2.11): image/audio/video as
opaque binary columns with typed metadata.

The Spark-side plumbing — schema, Arrow-batched ``mapInPandas``
transform, partitioning — is real and tested; the codec step itself
(image decode, audio resample, frame sampling) is stubbed behind
``NotImplementedError`` because the decode libraries are not in this
container. A deterministic byte-level feature extractor stands in so
the pipeline shape is exercised end-to-end.

Scale notes: binary payloads ride in the same parquet row groups as
their metadata; ``maxPartitionBytes`` governs batch size, and the
mapInPandas stage is shuffle-free (narrow), so throughput is
scan-bound. For very large blobs, store pointers + side files and
fetch inside the batch iterator instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, sha_hex string"
)


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in ingestion: treat the utf-8 bytes of the text column as
    an opaque media payload with typed metadata — the exact schema a
    real image/audio ingest would produce."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("application/octet-stream").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_image(payload: bytes):
    """Decode an image payload. PNG is decoded for real by the
    pure-stdlib codec (operators/pngcodec.py — zlib inflate + scanline
    unfiltering per the public spec); other formats (JPEG etc.) still
    raise, since their codecs aren't in this container. A production
    deployment swaps in libpng/libjpeg here; the Spark-side plumbing is
    unchanged by that swap."""
    data = bytes(payload)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from nabatshy_spark.operators.pngcodec import decode_png

        return decode_png(data)
    raise NotImplementedError(
        "only PNG decode is available in-container (no JPEG/video codecs)"
    )


IMAGE_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "mean_pixel double, decode_error string"
)


def image_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract over binary image payloads via
    Arrow-batched ``mapInPandas``: dimensions, channel count, mean pixel
    intensity. Undecodable payloads yield a ``decode_error`` row instead
    of failing the batch (poison-payload safety at scale).

    Narrow (shuffle-free) stage; batch size rides
    ``maxPartitionBytes``/Arrow batch sizing like the byte-level
    extractor."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    img = decode_image(payload)
                    rows.append(
                        (doc_id, img.width, img.height, img.channels,
                         float(img.pixels.mean()), None)
                    )
                except Exception as ex:
                    rows.append((doc_id, None, None, None, None, str(ex)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "mean_pixel", "decode_error",
                ],
            )

    return df.mapInPandas(batches, schema=IMAGE_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload via
    ``mapInPandas``: per-batch pandas in/out, deterministic byte-level
    features (size + sha256). This is the slot where decode +
    model-feature extraction plugs in."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha_hex": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(batches, schema=MEDIA_SCHEMA)
