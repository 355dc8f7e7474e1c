"""Angle-math goldens ported from the reference test suite
(ocr/tests/test_rotation_detection.py:11-47, test_data_extract.py:154-161)."""

from __future__ import annotations

from text_extraction_system_spark.core import angles


def test_weighted_avg_simple():
    assert angles.weighted_trimmed_mean([0, 10], [10, 990], 0) == 9.9
    assert angles.weighted_trimmed_mean([1.5], [2], 0) == 1.5
    assert angles.weighted_trimmed_mean([1.5], [2], 0.2) == 1.5


def test_weighted_avg_skip_tails():
    a_0 = round(angles.weighted_trimmed_mean([1, 5, 6, 100], [10, 500, 500, 10], 0), 1)
    a_1 = round(angles.weighted_trimmed_mean([1, 5, 6, 100], [10, 500, 500, 10], 0.1), 1)
    a_2 = round(
        angles.weighted_trimmed_mean([1, 5, 6, 100], [0.01, 0.49, 0.49, 0.01], 0.1), 1
    )
    a_3 = round(angles.weighted_trimmed_mean([5, 6], [0.4, 0.4], 0), 1)
    assert a_3 == 5.5
    assert a_0 > a_1
    assert a_1 == a_2 == a_3


def test_weighted_avg_short_fat_tail():
    a = round(angles.weighted_trimmed_mean([1, 5, 6], [11, 1, 100], 0.1), 3)
    assert a == 5.991
    assert round(angles.weighted_trimmed_mean([1, 5, 6], [11, 1, 100], 0), 3) < a


def test_normalize_angle_90():
    assert angles.normalize_angle_90(-5.8) == -5.8
    assert angles.normalize_angle_90(0.8) == 0.8
    assert round(angles.normalize_angle_90(90.8), 1) == 0.8
    assert angles.normalize_angle_90(88) == -2
    assert angles.normalize_angle_90(-88) == 2
    assert angles.normalize_angle_90(-92) == -2


def test_norm_angle_and_snap():
    assert angles.norm_angle(270) == -90
    assert angles.norm_angle(-270) == 90
    assert angles.norm_angle(180) == -180
    assert angles.snap_rotation(92) == 92
    assert angles.snap_rotation(45) == 0.0   # too far from any right angle
    assert angles.snap_rotation(359) == -1


def test_half_up_at_exact_45_boundaries():
    """Pins the rounding convention at odd multiples of 45 where Python
    banker's round() and the SQL twins' HALF_UP diverge: all twins use
    floor(x/90 + 0.5) (ties toward +inf)."""
    assert angles.half_up_right_angles(45.0) == 1      # banker's would give 0
    assert angles.half_up_right_angles(135.0) == 2     # banker's would give 2 too
    assert angles.half_up_right_angles(-45.0) == 0
    assert angles.half_up_right_angles(-135.0) == -1
    # snap output is convention-independent at those points (both neighbor
    # right angles are 45 away > threshold -> rejected)
    assert angles.snap_rotation(135.0) == 0.0
    assert angles.snap_rotation(-135.0) == 0.0
    # detect_page_rotation at a pure 45-degree page: half-up picks 90
    import numpy as np

    from text_extraction_system_spark.core import deskew

    res = deskew.detect_page_rotation(np.full(100, 45.0))
    assert res["rotation"] == 90.0 and res["skew"] == -45.0


def test_cluster_angles():
    clusters = angles.cluster_angles({0.0: 100, 1.0: 50, 90.0: 30, 91.5: 10})
    assert len(clusters) == 2
    (a1, c1), (a2, c2) = clusters
    assert c1 == 150 and abs(a1 - (0 * 100 + 1 * 50) / 150) < 1e-9
    assert c2 == 40
