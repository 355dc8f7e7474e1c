"""Rotation detection over media spans (SURVEY.md A5/A6/F4/C1 analogs).

In the reference, per-page pixel work (tile deskew / dilated-contour
estimates) produces a raw angle which is then normalized, snapped to the
nearest right angle (or rejected), and gated by ``should_correct_rotation``
(``data_extract.py:386-418``). The sandbox has no cv2, so the Catalyst query
path uses the deterministic stub ``(hexval(md5(media_ref)[3]) * 24) - 180``;
``detect_rotation`` additionally carries a REAL pixel estimator — the
reference's tile-mode scheme (``ocr/rotation_detection.py:98-126``) over a
projection-profile per-tile skew — that runs whenever a PIL-like module can
decode the payload, with the stub as the never-raise fallback (the same
fence as ``multimodal._resize_payload``). The downstream normalize/snap/
guard pipeline is Catalyst columns with a SQL twin either way.
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


#: candidate skew angles for the projection-profile estimate (0.5-degree
#: grid over the deskew range — quantization is what makes "most frequent
#: tile angle" meaningful)
_SKEW_ANGLES = tuple(x / 2.0 for x in range(-90, 91))
#: tile height (reference IMAGE_PART_SIZE analog, scaled to this container's
#: small synthetic images)
TILE_PART_SIZE = 32


def stub_raw_angle(media_ref: str) -> float:
    """Python twin of ``raw_angle_col`` (the deterministic no-pixels stub)."""
    import hashlib

    return float(_HEX.index(hashlib.md5(media_ref.encode()).hexdigest()[2])) * 24.0 - 180.0


def _tile_skew(ink_ys, ink_xs) -> float | None:
    """Projection-profile skew of one tile's ink pixels: the candidate angle
    whose sheared horizontal projection has maximal variance (the standard
    projection-profile deskew criterion — sharp text-line profiles are
    high-variance). Returns None for empty tiles, like the reference's
    per-tile ``determine_skew`` (``ocr/rotation_detection.py:115-117``)."""
    import numpy as np

    if len(ink_ys) == 0:
        return None
    best_a, best_v = None, -1.0
    for a in _SKEW_ANGLES:
        idx = np.floor(ink_ys + np.tan(np.radians(a)) * ink_xs).astype(np.int64)
        prof = np.bincount(idx - idx.min())
        v = float(prof.var())
        if v > best_v:
            best_v, best_a = v, float(a)
    return best_a


def _most_frequent_tile_angle(gray, part_size: int = TILE_PART_SIZE) -> float | None:
    """The reference's tile-mode estimate (A5,
    ``ocr/rotation_detection.py:98-126`` detect_rotation_most_frequent):
    split along the longer axis into part_size tiles, estimate skew per
    tile, return the most frequent angle if any repeats, else the median —
    per-tile voting defuses documents whose global alignment fakes a skew."""
    import statistics

    import numpy as np
    from collections import Counter

    gray = np.asarray(gray, dtype=np.float64)
    if gray.ndim != 2 or gray.size == 0:
        return None
    ink = gray < gray.mean()  # Otsu-free threshold: darker-than-mean is ink
    h, w = ink.shape
    n_parts = max(round((h if h >= w else w) / part_size), 1)
    tiles = (
        [ink[i * part_size:(i + 1) * part_size] for i in range(n_parts)]
        if h >= w
        else [ink[:, i * part_size:(i + 1) * part_size] for i in range(n_parts)]
    )
    angles = []
    for t in tiles:
        ys, xs = np.nonzero(t)
        a = _tile_skew(ys.astype(np.float64), xs.astype(np.float64))
        if a is not None:
            angles.append(a)
    if not angles:
        return None
    (top_angle, top_n), = Counter(angles).most_common(1)
    if top_n > 1:
        return top_angle
    return float(statistics.median(angles))


def detect_rotation(media_ref: str, payload: bytes, image_mod=None,
                    part_size: int = TILE_PART_SIZE) -> float:
    """A5/A6 raw-angle estimate with the same never-raise fence as
    ``multimodal._resize_payload``: with a PIL-like ``image_mod``, a
    decodable payload is decoded to grayscale and run through the tile-mode
    estimator; undecodable payloads (this container's synthetic md5
    payloads) and the no-PIL case fall back to the deterministic stub —
    PIL's presence never turns a working query into a failing one, and a
    poison payload degrades instead of killing the job."""
    if image_mod is not None:
        try:
            import io

            import numpy as np

            img = image_mod.open(io.BytesIO(payload)).convert("L")
            a = _most_frequent_tile_angle(np.asarray(img), part_size)
            if a is not None:
                return a
        except Exception:
            pass  # not a decodable image -> deterministic stub
    return stub_raw_angle(media_ref)


def detected_rotation_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, media_ref, raw_angle) through the REAL payload path: Arrow
    binary batches into ``detect_rotation``. On synthetic payloads this
    equals ``raw_angle_col`` exactly (pinned by pytest); with PIL and real
    images the pixel estimate takes over, plumbing unchanged."""
    from collections.abc import Iterator

    import pandas as pd

    from . import multimodal

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image as image_mod  # pragma: no cover
        except ImportError:
            image_mod = None
        for pdf in batches:
            out = pdf[["doc_id", "media_ref"]].copy()
            out["raw_angle"] = [
                detect_rotation(ref, bytes(p), image_mod)
                for ref, p in zip(pdf["media_ref"], pdf["payload"])
            ]
            yield out

    return multimodal.media_table(docs).mapInPandas(
        gen, schema="doc_id string, media_ref string, raw_angle double"
    )


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
