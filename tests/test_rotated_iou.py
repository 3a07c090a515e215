"""Rotated IoU vs an independent cv2 float64 oracle + analytic cases."""
import math

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from r3det_tpu.ops import rbbox_overlaps, rotated_iou_aligned, obb_corners

PI = math.pi
RNG = np.random.RandomState(3)


def cv2_iou(b1, b2, mode='iou'):
    """Oracle: OpenCV rotated-rect intersection, float geometry."""
    r1 = ((float(b1[0]), float(b1[1])), (float(b1[2]), float(b1[3])),
          float(np.degrees(b1[4])))
    r2 = ((float(b2[0]), float(b2[1])), (float(b2[2]), float(b2[3])),
          float(np.degrees(b2[4])))
    ret, pts = cv2.rotatedRectangleIntersection(r1, r2)
    inter = 0.0
    if pts is not None and len(pts) >= 3:
        inter = cv2.contourArea(cv2.convexHull(pts))
    a1 = float(b1[2] * b1[3])
    a2 = float(b2[2] * b2[3])
    denom = a1 + a2 - inter if mode == 'iou' else a1
    return inter / max(denom, 1e-14)


def rand_boxes(n, scale=200.0):
    cx = RNG.uniform(0, scale, n)
    cy = RNG.uniform(0, scale, n)
    w = RNG.uniform(5, 80, n)
    h = RNG.uniform(5, 80, n)
    a = RNG.uniform(-PI, PI, n)
    return np.stack([cx, cy, w, h, a], -1).astype(np.float32)


def test_identity_iou_is_one():
    b = rand_boxes(32)
    iou = np.asarray(rotated_iou_aligned(jnp.asarray(b), jnp.asarray(b)))
    np.testing.assert_allclose(iou, 1.0, atol=2e-3)


def test_disjoint_iou_is_zero():
    b1 = np.array([[0., 0., 10., 10., 0.3]], np.float32)
    b2 = np.array([[100., 100., 10., 10., -0.8]], np.float32)
    iou = np.asarray(rbbox_overlaps(jnp.asarray(b1), jnp.asarray(b2)))
    assert iou[0, 0] == 0.0


def test_axis_aligned_analytic():
    # Two axis-aligned boxes overlapping on a known region
    b1 = np.array([[50., 50., 40., 20., 0.]], np.float32)   # x:30-70, y:40-60
    b2 = np.array([[70., 50., 40., 20., 0.]], np.float32)   # x:50-90, y:40-60
    inter = 20 * 20
    union = 800 + 800 - inter
    iou = np.asarray(rbbox_overlaps(jnp.asarray(b1), jnp.asarray(b2)))[0, 0]
    assert iou == pytest.approx(inter / union, abs=1e-4)
    iof = np.asarray(rbbox_overlaps(jnp.asarray(b1), jnp.asarray(b2),
                                    mode='iof'))[0, 0]
    assert iof == pytest.approx(inter / 800, abs=1e-4)


def test_cross_45deg_analytic():
    # Square vs same square rotated 45°: intersection is a regular octagon.
    s = 10.0
    b1 = np.array([[0., 0., s, s, 0.]], np.float32)
    b2 = np.array([[0., 0., s, s, PI / 4]], np.float32)
    inter = 2 * (math.sqrt(2) - 1) * s * s   # octagon area = 2(√2−1)s²
    union = 2 * s * s - inter
    iou = np.asarray(rbbox_overlaps(jnp.asarray(b1), jnp.asarray(b2)))[0, 0]
    assert iou == pytest.approx(inter / union, rel=1e-3)


def test_contained_box_iof_is_one():
    outer = np.array([[0., 0., 100., 60., 0.5]], np.float32)
    inner = np.array([[0., 0., 20., 10., -1.1]], np.float32)
    iof = np.asarray(rbbox_overlaps(jnp.asarray(inner), jnp.asarray(outer),
                                    mode='iof'))[0, 0]
    assert iof == pytest.approx(1.0, abs=1e-3)
    iou = np.asarray(rbbox_overlaps(jnp.asarray(inner), jnp.asarray(outer)))[0, 0]
    assert iou == pytest.approx(200.0 / 6000.0, rel=1e-3)


@pytest.mark.parametrize('mode', ['iou', 'iof'])
def test_matrix_matches_cv2_oracle(mode):
    b1 = rand_boxes(24)
    b2 = rand_boxes(16)
    got = np.asarray(rbbox_overlaps(jnp.asarray(b1), jnp.asarray(b2),
                                    mode=mode))
    want = np.array([[cv2_iou(x, y, mode) for y in b2] for x in b1])
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_aligned_matches_cv2_oracle():
    b1 = rand_boxes(64, scale=60.0)   # dense field → many partial overlaps
    b2 = rand_boxes(64, scale=60.0)
    got = np.asarray(rbbox_overlaps(jnp.asarray(b1), jnp.asarray(b2),
                                    is_aligned=True))
    want = np.array([cv2_iou(x, y) for x, y in zip(b1, b2)])
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_touching_edges():
    # boxes sharing exactly one edge: intersection area 0
    b1 = np.array([[0., 0., 10., 10., 0.]], np.float32)
    b2 = np.array([[10., 0., 10., 10., 0.]], np.float32)
    iou = np.asarray(rbbox_overlaps(jnp.asarray(b1), jnp.asarray(b2)))[0, 0]
    assert iou == pytest.approx(0.0, abs=1e-3)


def test_small_box_filter():
    b1 = np.array([[0., 0., 1e-4, 10., 0.]], np.float32)
    b2 = np.array([[0., 0., 10., 10., 0.]], np.float32)
    out = np.asarray(rbbox_overlaps(jnp.asarray(b1), jnp.asarray(b2),
                                    small_box_thr=1e-3))
    assert out[0, 0] == 0.0


def test_score_column_trimmed():
    b1 = np.concatenate([rand_boxes(4), np.ones((4, 1), np.float32)], -1)
    b2 = rand_boxes(4)
    out = np.asarray(rbbox_overlaps(jnp.asarray(b1), jnp.asarray(b2)))
    assert out.shape == (4, 4)


def test_empty_inputs():
    z = jnp.zeros((0, 5))
    b = jnp.asarray(rand_boxes(3))
    assert rbbox_overlaps(z, b).shape == (0, 3)
    assert rbbox_overlaps(b, z).shape == (3, 0)


def test_chunking_consistency():
    """Row chunking must not change results (n not divisible by chunk)."""
    from r3det_tpu.ops.rotated_iou import rotated_iou_pairwise
    b1 = jnp.asarray(rand_boxes(37))
    b2 = jnp.asarray(rand_boxes(5))
    full = np.asarray(rotated_iou_pairwise(b1, b2, row_chunk=64))
    chunked = np.asarray(rotated_iou_pairwise(b1, b2, row_chunk=8))
    np.testing.assert_allclose(full, chunked, atol=1e-6)


def test_obb_corners_shape():
    b = jnp.asarray(rand_boxes(6)).reshape(2, 3, 5)
    c = obb_corners(b)
    assert c.shape == (2, 3, 4, 2)
