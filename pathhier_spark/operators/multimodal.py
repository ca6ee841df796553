"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over mapInPandas. Binary PPM (P6) images get a REAL
stdlib-only decode (`decode_ppm`: header parse + per-channel pixel means);
compressed formats (JPEG/PNG/audio/video codecs — libraries absent in this
container) fall back to `_decode_payload`, a deterministic fake feature
vector, with the Spark-side plumbing (schema, batch iteration, partitioning,
output shape) identical either way.
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


def _ppm_parse(payload: bytes) -> tuple[int, int, bytes] | None:
    """Parse a binary PPM (P6) payload: header (magic, whitespace/#-comment
    tolerant, maxval 255) + raw RGB plane. Returns (width, height,
    pixel_bytes) or None when the payload is not a complete P6 image."""
    if payload is None or not payload.startswith(b"P6"):
        return None
    # header tokens: P6 <width> <height> <maxval>, separated by whitespace
    # runs; '#' starts a comment through end-of-line
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        c = payload[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c in b"#":
            while pos < n and payload[pos] not in b"\n":
                pos += 1
        else:
            start = pos
            while pos < n and payload[pos] not in b" \t\r\n#":
                pos += 1
            tokens.append(payload[start:pos])
    if len(tokens) < 3:
        return None
    try:
        width, height, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if maxval != 255 or width < 0 or height < 0:
        return None
    pos += 1  # exactly one whitespace byte after maxval, per spec
    npix = width * height
    pixels = payload[pos : pos + npix * 3]
    if len(pixels) < npix * 3:
        return None
    return (width, height, pixels)


def decode_ppm(payload: bytes) -> tuple[int, int, list[float]] | None:
    """REAL stdlib-only image decode for binary PPM (P6): parse via
    _ppm_parse, then compute the per-channel pixel means over the raw RGB
    plane. Returns (width, height, [mean_r, mean_g, mean_b]) — means
    None-padded when the image has zero pixels — or None when the payload
    is not P6 (caller falls back to the stub feature path)."""
    parsed = _ppm_parse(payload)
    if parsed is None:
        return None
    width, height, pixels = parsed
    npix = width * height
    if npix == 0:
        return (width, height, [None, None, None])
    # vectorized EXACT per-channel means (guide §4.2): int64 numpy sums are
    # the same integers a Python loop accumulates, so sum/npix is the same
    # IEEE division bit-for-bit — only ~100x faster per image
    import numpy as np

    sums = np.frombuffer(pixels, dtype=np.uint8).reshape(npix, 3).sum(
        axis=0, dtype=np.int64
    )
    means = [int(s) / npix for s in sums]
    return (width, height, means)


def resize_ppm_nearest(
    media: DataFrame, *, out_w: int, out_h: int
) -> DataFrame:
    """REAL image resize (nearest-neighbor) for P6 payloads over
    mapInPandas: source pixel of output (x, y) is
    (x*w // out_w, y*h // out_h), re-encoded as a fresh P6 with a
    canonical 'P6\\n<w> <h>\\n255\\n' header. Output: (media_id, width,
    height, payload BINARY, checksum = md5 hex of the resized payload —
    engine-portable, so a SQL oracle that rebuilds the same bytes from the
    source text verifies the resampling arithmetic itself). Non-image and
    non-P6 rows are dropped (a real pipeline routes them to their own
    codec). Map-only — one Arrow batch in, one out, no shuffle; the
    per-image work is O(out_w*out_h) regardless of source size."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("output dimensions must be positive")
    out_schema = (
        "media_id long, width int, height int, payload binary, checksum string"
    )

    def _resize(b: bytes) -> bytes | None:
        parsed = _ppm_parse(bytes(b))
        if parsed is None:
            return None
        w, h, pixels = parsed
        if w == 0 or h == 0:
            return None
        # vectorized nearest-neighbor gather (guide §4.2): the index
        # arrays are the same floor-division source coordinates the old
        # per-pixel Python loop computed, so the emitted bytes (and the
        # checksum the oracle verifies) are identical
        import numpy as np

        arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3)
        sy = (np.arange(out_h, dtype=np.int64) * h) // out_h
        sx = (np.arange(out_w, dtype=np.int64) * w) // out_w
        header = f"P6\n{out_w} {out_h}\n255\n".encode()
        return header + arr[sy][:, sx].tobytes()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ok = pdf[(pdf["kind"] == "image") & pdf["payload"].notna()]
            resized = ok["payload"].map(_resize)
            keep = resized.notna()
            yield pd.DataFrame(
                {
                    "media_id": ok["media_id"][keep],
                    "width": out_w,
                    "height": out_h,
                    "payload": resized[keep],
                    "checksum": resized[keep].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(_batches, schema=out_schema)


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: (media_id, kind, features ARRAY<FLOAT>,
    checksum STRING = md5 hex of the payload bytes — engine-portable so the
    DuckDB oracle can recompute it, plus width/height/mean_rgb from the real
    PPM decode when the payload is P6, NULL otherwise). Batches arrive as
    Arrow; one Python call per batch (batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch)."""

    out_schema = (
        "media_id long, kind string, features array<float>, checksum string,"
        " width int, height int, mean_rgb array<double>"
    )

    def _row(kind: str, b: bytes) -> tuple:
        # the image codec only runs for image rows — an audio/video payload
        # whose bytes happen to start with a parseable P6 header must NOT
        # report image dimensions
        if kind != "image":
            return (None, None, None)
        decoded = decode_ppm(bytes(b))
        if decoded is None:
            return (None, None, None)
        w, h, means = decoded
        return (w, h, means)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ok = pdf[pdf["payload"].notna()]
            dec = [
                _row(k, b) for k, b in zip(ok["kind"], ok["payload"])
            ]
            dec = pd.Series(dec, index=ok.index)
            yield pd.DataFrame(
                {
                    "media_id": ok["media_id"],
                    "kind": ok["kind"],
                    "features": ok["payload"].map(_decode_payload),
                    "checksum": ok["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "width": dec.map(lambda t: t[0]),
                    "height": dec.map(lambda t: t[1]),
                    "mean_rgb": dec.map(lambda t: t[2]),
                }
            )

    return media.mapInPandas(_batches, schema=out_schema)


def media_from_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media table derived from the documents table, kind
    cycling image/audio/video by id. IMAGE rows carry a real binary-PPM
    (P6) payload — header + the text's bytes as a 1-row RGB plane
    (npix = len//3 full pixels) — so decode_ppm exercises an actual codec
    path whose width/means a SQL oracle can recompute from the same text
    (the driver corpus is pure ASCII, so string ops == byte ops).
    Audio/video rows keep the raw UTF-8 text bytes (opaque stand-ins;
    md5(payload) == md5(text) for the oracle)."""
    m = F.col(id_col) % 3
    npix = F.floor(F.length(F.col(text_col)) / 3).cast("int")
    ppm = F.concat(
        F.lit("P6\n"),
        npix.cast("string"),
        F.lit(" 1\n255\n"),
        F.substring(F.col(text_col), 1, npix * 3),
    )
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(m == 0, F.lit("image"))
        .when(m == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(
            F.when(m == 0, ppm).otherwise(F.col(text_col)), "UTF-8"
        ).alias("payload"),
        F.when(m == 0, npix).cast("int").alias("width"),
        F.when(m == 0, F.lit(1)).cast("int").alias("height"),
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
