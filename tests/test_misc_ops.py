"""Coverage for the smaller op/util surfaces: convex_sort, visualization,
FRM points=5, polygon engine NMS, rbbox2roi."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_convex_sort_orders_square():
    from r3det_tpu.ops.convex import convex_sort
    pts = jnp.asarray([[[1., 1.], [0., 0.], [0., 1.], [1., 0.],
                        [99., 99.], [98., 98.]]])
    masks = jnp.asarray([[True, True, True, True, False, False]])
    idx = np.asarray(convex_sort(pts, masks, circular=True))[0]
    assert idx.shape == (7,)
    ring = [i for i in idx[:-1] if i >= 0]
    assert len(ring) == 4 and idx[-1] == ring[0]
    # traversal must be a simple cycle around the square (area == 1)
    p = np.asarray(pts)[0][ring]
    area = 0.5 * abs(sum(p[i][0] * p[(i + 1) % 4][1] -
                         p[(i + 1) % 4][0] * p[i][1] for i in range(4)))
    assert area == pytest.approx(1.0)
    # masked slots are -1
    assert (np.asarray(idx[:-1]) == -1).sum() == 2


def test_imshow_det_rbboxes(tmp_path):
    from r3det_tpu.core.visualization import imshow_det_rbboxes
    img = np.zeros((64, 64, 3), np.uint8)
    dets = np.array([[32., 32., 20., 10., -0.4, 0.9],
                     [10., 10., 8., 4., 0.0, 0.1]], np.float32)
    out_file = str(tmp_path / 'vis.png')
    out = imshow_det_rbboxes(img, dets, np.array([0, 1]),
                             class_names=('a', 'b'), score_thr=0.3,
                             out_file=out_file)
    assert out.sum() > 0           # something got drawn
    import os
    assert os.path.exists(out_file)


def test_frm_points5_runs_and_differs_from_points1():
    from r3det_tpu.models.frm import feature_refine_sample
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(8, 40, (1, 64, 5)).astype(np.float32))
    p1 = feature_refine_sample(feat, boxes, 1 / 8, points=1)
    p5 = feature_refine_sample(feat, boxes, 1 / 8, points=5)
    assert p1.shape == p5.shape == (1, 8, 8, 4)
    assert not np.allclose(np.asarray(p1), np.asarray(p5))
    with pytest.raises(ValueError):
        feature_refine_sample(feat, boxes, 1 / 8, points=3)


def test_frm_transpose_quirk_changes_sampling():
    from r3det_tpu.models.frm import feature_refine_sample
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 2)).astype(np.float32))
    # boxes with cx != cy so the transposed read differs
    boxes = np.tile(np.array([8., 40., 16., 8., 0.2], np.float32), (64, 1))
    boxes = jnp.asarray(boxes[None])
    a = feature_refine_sample(feat, boxes, 1 / 8, transpose_quirk=True)
    b = feature_refine_sample(feat, boxes, 1 / 8, transpose_quirk=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_polygon_engine_nms_and_fallback_agree():
    from r3det_tpu.ops.polygon_geo import (_polygon_iou_np, polygon_iou,
                                           polygon_nms)
    rng = np.random.RandomState(2)
    quads = []
    for _ in range(12):
        cx, cy = rng.uniform(0, 60, 2)
        w, h = rng.uniform(10, 30, 2)
        a = rng.uniform(-math.pi, math.pi)
        c, s = math.cos(a), math.sin(a)
        pts = []
        for sx, sy in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
            dx, dy = sx * w / 2, sy * h / 2
            pts += [c * dx - s * dy + cx, s * dx + c * dy + cy]
        quads.append(pts)
    quads = np.asarray(quads)
    m_cpp = polygon_iou(quads, quads)
    m_np = _polygon_iou_np(quads, quads)
    np.testing.assert_allclose(m_cpp, m_np, atol=1e-9)
    scored = np.concatenate(
        [quads, rng.uniform(0.1, 1, (12, 1))], -1)
    keep = polygon_nms(scored, 0.3)
    assert len(keep) >= 1
    # kept boxes mutually below threshold
    kq = quads[keep]
    m = polygon_iou(kq, kq)
    off = m - np.eye(len(kq))
    assert off.max() <= 0.3 + 1e-9


def test_rbbox2roi():
    from r3det_tpu.core.rtransforms_np import rbbox2roi
    rois = rbbox2roi([np.ones((2, 5), np.float32),
                      np.zeros((0, 5), np.float32),
                      np.full((1, 6), 2.0, np.float32)])
    assert rois.shape == (3, 6)
    assert rois[0, 0] == 0 and rois[2, 0] == 2


def test_frm_fused_conv_matches_unfused():
    """fuse_convs composes conv_5_1 o conv_1_5 + conv_1_1 into one 5x5
    conv (all linear — feature_refine_module.py:66-127); same param
    tree, same outputs."""
    import jax
    import jax.numpy as jnp
    from r3det_tpu.models.frm import FeatureRefineModule
    r = np.random.RandomState(0)
    feats = tuple(jnp.asarray(r.normal(0, 1, (2, s, s, 32)).astype(
        np.float32)) for s in (16, 8))
    rois = tuple(jnp.asarray(np.stack([
        r.uniform(0, 128, (2, s * s)), r.uniform(0, 128, (2, s * s)),
        r.uniform(8, 30, (2, s * s)), r.uniform(6, 20, (2, s * s)),
        r.uniform(-1.5, 0, (2, s * s))], -1).astype(np.float32))
        for s in (16, 8))
    m0 = FeatureRefineModule(in_channels=32, featmap_strides=(8, 16))
    m1 = FeatureRefineModule(in_channels=32, featmap_strides=(8, 16),
                             fuse_convs=True)
    v = m0.init(jax.random.PRNGKey(0), feats, rois)
    o0 = m0.apply(v, feats, rois)
    o1 = m1.apply(v, feats, rois)
    for a, b in zip(o0, o1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(m1.init(jax.random.PRNGKey(0),
                                             feats, rois))
