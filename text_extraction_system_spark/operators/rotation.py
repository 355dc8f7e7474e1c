"""Rotation detection over media spans (SURVEY.md A5/A6/F4/C1 analogs).

In the reference, per-page pixel work (tile deskew / dilated-contour
estimates) produces a raw angle which is then normalized, snapped to the
nearest right angle (or rejected), and gated by ``should_correct_rotation``
(``data_extract.py:386-418``). The sandbox has no pixel libs, so the raw
angle is the deterministic stub ``(hexval(md5(media_ref)[3]) * 24) - 180`` —
the downstream normalize/snap/guard pipeline is the real logic under test
and is expressed as Catalyst columns with a SQL twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import derive_spans as ds

_HEX = "0123456789abcdef"

SNAP_MAX_DIFF = 10.0
#: correction is skipped when the doc is text-dominated (reference guard:
#: word_percent > 40 -> don't rotate; data_extract.py:386-418)
TEXT_DOMINANCE_GUARD = 0.4


def raw_angle_col(media_ref: Column) -> Column:
    """Deterministic stub for the pixel-domain angle estimate."""
    hexval = F.instr(F.lit(_HEX), F.substring(F.md5(media_ref), 3, 1)) - 1
    return (hexval.cast("double") * 24.0) - 180.0


def norm_angle_col(a: Column) -> Column:
    """[-180, 180) — twin of core.angles.norm_angle."""
    m = a - F.floor(a / 360.0) * 360.0
    return F.when(m < 180.0, m).otherwise(m - 360.0)


def snap_rotation_col(a: Column, max_diff: float = SNAP_MAX_DIFF) -> Column:
    """Twin of core.angles.snap_rotation."""
    n = norm_angle_col(a)
    return F.when(
        F.abs(n - F.round(n / 90.0, 0) * 90.0) > max_diff, F.lit(0.0)
    ).otherwise(n)


def normalize_angle_90_col(a: Column) -> Column:
    """Twin of core.angles.normalize_angle_90 (inscribe into [-45, 45])."""
    sign = F.when(a < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    aa = F.abs(a)
    return sign * F.when(aa > 45.0, aa - 90.0).otherwise(aa)


def rotation_rows(docs: DataFrame) -> DataFrame:
    """Per-media-span rotation decision over the derived spans corpus."""
    spans = ds.derive_spans(docs)
    text_share = F.col("text_cover") / F.greatest(
        F.col("text_cover") + F.col("media_cover"), F.lit(1).cast("bigint")
    )
    from . import ocr  # local import to avoid cycle

    per_doc = spans.select(
        "doc_id",
        "spans",
        ocr.text_cover_col(F.col("spans")).alias("text_cover"),
        ocr.media_cover_col(F.col("spans")).alias("media_cover"),
    )
    media = per_doc.select(
        "doc_id",
        text_share.alias("text_share"),
        F.explode(F.filter(F.col("spans"), lambda s: s["kind"] == "media")).alias("s"),
    )
    raw = raw_angle_col(F.col("s.media_ref"))
    snapped = snap_rotation_col(raw)
    return media.select(
        "doc_id",
        F.col("s.offset").alias("span_offset"),
        F.col("s.media_ref").alias("media_ref"),
        raw.alias("raw_angle"),
        snapped.alias("detected_angle"),
        normalize_angle_90_col(snapped).alias("angle90"),
        ((F.abs(snapped) > 0.0) & (F.col("text_share") < TEXT_DOMINANCE_GUARD)).alias(
            "should_correct"
        ),
    )
