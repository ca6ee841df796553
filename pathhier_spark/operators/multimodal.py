"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over mapInPandas. The actual codec step is STUBBED (the
sandbox has no image/audio libraries) behind `_decode_payload` — a
deterministic fake that derives a fixed-shape feature vector from the bytes —
but the Spark-side plumbing (schema, batch iteration, partitioning, output
shape) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16


def _decode_payload(payload: bytes) -> list[float]:
    """STUB decode: a real implementation would decode the image/audio and
    run a feature extractor (PIL / torchaudio / ffmpeg — not present in this
    container). Deterministic fake: FEATURE_DIM floats derived from a sha256
    of the bytes, in [0, 1). Raises on None to mirror codec failure."""
    if payload is None:
        raise NotImplementedError("decode of empty payload")
    h = hashlib.sha256(payload).digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_media_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: (media_id, kind, features ARRAY<FLOAT>,
    checksum STRING = md5 hex of the payload bytes — engine-portable so the
    DuckDB oracle can recompute it). Batches arrive as Arrow; one Python call
    per batch."""

    out_schema = (
        "media_id long, kind string, features array<float>, checksum string"
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ok = pdf[pdf["payload"].notna()]
            yield pd.DataFrame(
                {
                    "media_id": ok["media_id"],
                    "kind": ok["kind"],
                    "features": ok["payload"].map(_decode_payload),
                    "checksum": ok["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(_batches, schema=out_schema)


def media_from_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media table derived from the documents table: payload =
    the UTF-8 bytes of the text (an opaque binary stand-in for real codec
    bytes), kind cycles image/audio/video by id. Gives the mapInPandas
    plumbing a driver-table-sized input whose checksums a SQL oracle can
    verify (md5(payload) == md5(text))."""
    m = F.col(id_col) % 3
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(m == 0, F.lit("image"))
        .when(m == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plumbing: explode each video row into frame timestamps
    (0, every_ms, 2*every_ms, ... < duration_ms). The frame *decode* would
    happen in extract_media_features over the per-frame payload; here the
    timestamps and partitioning are the real part."""
    vids = media.filter(F.col("kind") == "video").filter(
        F.col("duration_ms").isNotNull() & (F.col("duration_ms") > 0)
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms") - 1, F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(64, 256)))
        rows.append(
            (
                i,
                kind,
                payload,
                640 if kind == "image" else None,
                480 if kind == "image" else None,
                5000 if kind == "video" else (3000 if kind == "audio" else None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
