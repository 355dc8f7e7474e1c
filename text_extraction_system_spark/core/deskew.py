"""Page deskew composition (SURVEY.md A2-A4, W7): glyph angle histogram ->
cluster -> weighted trimmed mean -> snap, with the reading-direction trend
fallback.

Reference behavior being modeled (re-derived, not ported):

* per-page map angle->char count, angles from the text matrix, clustered
  when closer than 3 degrees (``PDFToTextWithCoordinates.java:372-396``,
  ``cleanupAngles`` :300-335) — here ``angles.cluster_angles``;
* weighted average with 10% distance-tail trim + std-dev sanity check,
  snapped to the nearest multiple of 90 -> (pageRotation, skewAngle)
  (``getWeightedModAngle`` / ``selectDeskewAngle`` Java :398-451,
  ``WeightedCharAngle.java:25-119``);
* reading-direction trend: counts of x/y shifts between consecutive glyphs
  decide 0/90/180/270 when at least MIN_TREND_SAMPLES shifts exist
  (``getAngleByTrend`` Java :354-370);
* per-angle-cluster re-processing order: clusters are visited largest char
  count first (Java :325-335, :484) — ``processing_order``.
"""

from __future__ import annotations

import numpy as np

from . import angles

MERGE_WITHIN_DEG = 3.0
TRIM_QUANTILE = 0.1
MAX_STD_DEG = 30.0
MIN_TREND_SAMPLES = 40


def page_angle_histogram(glyph_angles: np.ndarray, decimals: int = 1) -> dict[float, int]:
    """angle->count map, angles rounded to 0.1 degree (Java r() analog)."""
    if len(glyph_angles) == 0:
        return {}
    rounded = np.round(np.asarray(glyph_angles, dtype=np.float64), decimals)
    vals, counts = np.unique(rounded, return_counts=True)
    return {float(v): int(c) for v, c in zip(vals, counts)}


def trend_rotation(dx: np.ndarray, dy: np.ndarray) -> int | None:
    """0/90/180/270 from the dominant glyph-advance direction, or None when
    fewer than MIN_TREND_SAMPLES shifts are available."""
    dx = np.asarray(dx, dtype=np.float64)
    dy = np.asarray(dy, dtype=np.float64)
    n = len(dx)
    if n < MIN_TREND_SAMPLES:
        return None
    right, left = int((dx > 0).sum()), int((dx < 0).sum())
    down, up = int((dy > 0).sum()), int((dy < 0).sum())
    horiz, vert = right + left, down + up
    if horiz >= vert:
        return 0 if right >= left else 180
    return 90 if down >= up else 270


def cluster_skew(cluster_angles_counts: list[tuple[float, int]]) -> float:
    """Trimmed weighted mean of one cluster's angles, rejected (0.0) when the
    weighted std-dev says the cluster is noise."""
    if not cluster_angles_counts:
        return 0.0
    v = np.array([a for a, _ in cluster_angles_counts], dtype=np.float64)
    w = np.array([c for _, c in cluster_angles_counts], dtype=np.float64)
    mean = angles.weighted_trimmed_mean(v, w, TRIM_QUANTILE)
    var = float((w * (v - mean) ** 2).sum() / max(w.sum(), 1e-9))
    if var ** 0.5 > MAX_STD_DEG:
        return 0.0
    return mean


def detect_page_rotation(
    glyph_angles: np.ndarray,
    dx: np.ndarray | None = None,
    dy: np.ndarray | None = None,
) -> dict:
    """Full composition -> {"rotation": multiple of 90, "skew": residual
    in [-45, 45], "clusters": [(angle, count) desc]}.

    The dominant angle cluster gives rotation+skew; when the glyph angles are
    inconclusive (no glyphs, or noise-rejected), the reading-direction trend
    decides the rotation.
    """
    hist = page_angle_histogram(np.asarray(glyph_angles, dtype=np.float64))
    clusters = angles.cluster_angles(hist, MERGE_WITHIN_DEG)
    rotation = 0.0
    skew = 0.0
    if clusters:
        dominant = clusters[0][0]
        members = [
            (a, c) for a, c in hist.items() if abs(a - dominant) <= MERGE_WITHIN_DEG * 2
        ]
        est = cluster_skew(members)
        rotation = 90.0 * angles.half_up_right_angles(angles.norm_angle(est))
        skew = angles.normalize_angle_90(angles.norm_angle(est) - rotation)
    if rotation == 0.0 and skew == 0.0 and dx is not None and dy is not None:
        t = trend_rotation(dx, dy)
        if t:
            rotation = float(t if t != 270 else -90)
    return {
        "rotation": angles.norm_angle(rotation) if rotation else 0.0,
        "skew": skew,
        "clusters": clusters,
    }


def processing_order(clusters: list[tuple[float, int]]) -> list[float]:
    """Angle-cluster visit order for the per-cluster extraction passes (W7):
    descending char count (Java :325-335, :484)."""
    return [a for a, _ in sorted(clusters, key=lambda t: (-t[1], t[0]))]
