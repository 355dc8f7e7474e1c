"""Multimodal (binary) column plumbing — SURVEY.md I1-I5 analogs.

Media payloads are opaque ``binary`` columns with typed metadata. The
container has no image/audio libs, so decode is a clearly-marked
DETERMINISTIC FAKE: the payload is a repetition of md5(media_ref) digest
bytes, and "decoding" parses width/height/format out of the leading digest
bytes. What is REAL and under test is the Spark-side plumbing: binary column
synthesis in Catalyst expressions, Arrow transfer of binary batches through
``mapInPandas``, schema and batch shape.

Real-deployment note: swap ``decode_media_batches`` internals for PIL/ffmpeg
calls; signatures, schema, and partitioning stay identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import derive_spans as ds

FORMATS = ("jpeg", "png", "tiff", "webp")

DECODED_SCHEMA = (
    "doc_id string, media_ref string, n_bytes long, "
    "width long, height long, format string"
)


def media_payload_col(media_ref: Column) -> Column:
    """Synthetic binary payload: md5 digest bytes repeated 1+hexval(h[0])
    times (16..256 bytes). unhex(repeat(md5)) stays JVM-side."""
    h = F.md5(media_ref)
    k = F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1))  # 1..16
    return F.unhex(F.repeat(h, k))


def media_table(docs: DataFrame) -> DataFrame:
    """One row per media span with its binary payload."""
    spans = ds.derive_spans(docs)
    media = spans.select(
        "doc_id",
        F.explode(F.filter(F.col("spans"), lambda s: s["kind"] == "media")).alias("s"),
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))
    return media.withColumn("payload", media_payload_col(F.col("media_ref")))


def decode_media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """DETERMINISTIC FAKE decode: parses metadata from payload bytes.

    A real decoder (PIL.Image.open / av.open) would replace the body; the
    Arrow binary-batch plumbing is what this exercises.
    """
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "media_ref", "n_bytes", "width", "height", "format")}
        for doc_id, ref, payload in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
            b = bytes(payload)
            head = b[:16]
            out["doc_id"].append(doc_id)
            out["media_ref"].append(ref)
            out["n_bytes"].append(len(b))
            out["width"].append(64 * (1 + (head[1] >> 4)))
            out["height"].append(64 * (1 + (head[1] & 15)))
            out["format"].append(FORMATS[(head[2] >> 4) % 4])
        yield pd.DataFrame(out, columns=list(out.keys()))


def decode_media(docs: DataFrame) -> DataFrame:
    """Binary payloads -> typed media metadata via Arrow batches."""
    return media_table(docs).mapInPandas(decode_media_batches, schema=DECODED_SCHEMA)


def resize_media(docs: DataFrame, target: int = 256) -> DataFrame:
    """STUB: real image resize needs PIL/cv2 (absent in this container)."""
    raise NotImplementedError(
        "image resize requires PIL/cv2; plumbing goes through decode_media"
    )


def sample_frames(docs: DataFrame, fps: float = 1.0) -> DataFrame:
    """STUB: real video frame sampling needs ffmpeg/av (absent here)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg; plumbing goes through decode_media"
    )
