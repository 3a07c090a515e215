"""Anchor generation, assignment, and target-building tests."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r3det_tpu.core.anchors import (PseudoAnchorGenerator, RAnchorGenerator,
                                    ranchor_inside_flags)
from r3det_tpu.core.assigner import max_iou_assign
from r3det_tpu.core.targets import TargetConfig, anchor_targets
from r3det_tpu.core.coders import DeltaXYWHAOBBoxCoder

PI = math.pi


def test_anchor_generator_retina_layout():
    gen = RAnchorGenerator(strides=[8, 16], ratios=[1.0, 0.5, 2.0],
                           octave_base_scale=4, scales_per_octave=3)
    assert gen.num_base_anchors == [9, 9]
    anchors = gen.grid_anchors([(4, 4), (2, 2)])
    assert anchors[0].shape == (4 * 4 * 9, 5)
    assert anchors[1].shape == (2 * 2 * 9, 5)
    a = anchors[0].reshape(16, 9, 5)
    # first anchor at position (0,0): ratio 1, scale 4 -> 32x32 box at origin
    np.testing.assert_allclose(a[0, 0], [0, 0, 32, 32, 0], atol=1e-4)
    # position (row 0, col 1) shifts cx by stride
    np.testing.assert_allclose(a[1, 0], [8, 0, 32, 32, 0], atol=1e-4)
    # ratio 0.5 anchor: w = 32*sqrt(2), h = 32/sqrt(2)
    np.testing.assert_allclose(a[0, 3, 2], 32 * math.sqrt(2), rtol=1e-5)
    np.testing.assert_allclose(a[0, 3, 3], 32 / math.sqrt(2), rtol=1e-5)
    # all thetas zero
    assert np.all(a[..., 4] == 0)


def test_pseudo_anchor_generator():
    gen = PseudoAnchorGenerator(strides=[8, 16])
    assert gen.num_base_anchors == [1, 1]
    with pytest.raises(NotImplementedError):
        gen.grid_anchors([(4, 4)])
    flags = gen.valid_flags([(4, 4), (2, 2)], (32, 32))
    assert flags[0].shape == (16,) and flags[0].all()


def test_inside_flags_border():
    anchors = np.array([[5., 5., 10, 10, 0.], [-10., 5., 10, 10, 0.]],
                       np.float32)
    vf = np.ones(2, bool)
    assert ranchor_inside_flags(anchors, vf, (64, 64), -1).all()
    out = ranchor_inside_flags(anchors, vf, (64, 64), 0)
    assert out[0] and not out[1]


def test_max_iou_assign_thresholds():
    # 2 gts x 4 anchors overlap matrix
    ov = jnp.asarray([[0.7, 0.45, 0.2, 0.0],
                      [0.1, 0.50, 0.0, 0.3]])
    res = max_iou_assign(ov, jnp.asarray([True, True]),
                         pos_iou_thr=0.5, neg_iou_thr=0.4,
                         match_low_quality=False)
    a = np.asarray(res.assigned)
    assert a[0] == 1          # 0.7 >= 0.5 -> gt 0
    assert a[1] == 2          # 0.5 -> gt 1 (argmax over gts)
    assert a[2] == 0          # 0.2 < 0.4 -> negative
    assert a[3] == 0          # 0.3 < 0.4 -> negative

    res2 = max_iou_assign(jnp.asarray([[0.45, 0.0]]), jnp.asarray([True]),
                          pos_iou_thr=0.5, neg_iou_thr=0.4,
                          match_low_quality=False)
    assert int(res2.assigned[0]) == -1   # [0.4, 0.5) gap -> ignore


def test_max_iou_assign_low_quality_and_padding():
    ov = jnp.asarray([[0.30, 0.10, 0.05],
                      [0.10, 0.35, 0.05],
                      [0.99, 0.99, 0.99]])       # pad row (masked out)
    mask = jnp.asarray([True, True, False])
    res = max_iou_assign(ov, mask, pos_iou_thr=0.5, neg_iou_thr=0.4,
                         min_pos_iou=0.0, match_low_quality=True)
    a = np.asarray(res.assigned)
    assert a[0] == 1          # low-quality: best anchor of gt 0
    assert a[1] == 2          # low-quality: best anchor of gt 1
    assert a[2] == 0          # nothing claims it -> negative
    assert np.all(np.asarray(res.max_overlaps) <= 0.36)  # pad ignored


def test_anchor_targets_batched():
    cfg = TargetConfig(pos_iou_thr=0.5, neg_iou_thr=0.4,
                       assign_by_circumhbbox='v1', angle_version='v1')
    coder = DeltaXYWHAOBBoxCoder(angle_range='v1')
    # anchors on a tiny grid; one gt right on top of anchor 0
    anchors = jnp.asarray([[16., 16., 32., 32., 0.],
                           [100., 100., 32., 32., 0.]])
    gt = jnp.zeros((2, 3, 5)).at[0, 0].set(
        jnp.asarray([16., 16., 30., 30., -0.1]))
    labels = jnp.zeros((2, 3), jnp.int32)
    mask = jnp.zeros((2, 3), bool).at[0, 0].set(True)
    out = anchor_targets(anchors, gt, labels, mask, coder.encode, 15, cfg)
    assert out.labels.shape == (2, 2)
    assert int(out.num_pos[0]) == 1
    assert int(out.num_pos[1]) == 0
    assert int(out.labels[0, 0]) == 0            # fg class
    assert int(out.labels[0, 1]) == 15           # bg
    # image with no gt: all background, all negative weights 1
    assert np.all(np.asarray(out.labels[1]) == 15)
    np.testing.assert_allclose(np.asarray(out.label_weights[1]), 1.0)
    # encoded target for the positive anchor decodes back to the gt
    dec = coder.decode(anchors[:1], out.bbox_targets[0, :1])
    np.testing.assert_allclose(np.asarray(dec[0]),
                               [16., 16., 30., 30., -0.1], atol=1e-3)


def test_anchor_targets_rotated_assignment():
    cfg = TargetConfig(pos_iou_thr=0.5, neg_iou_thr=0.4,
                       assign_by_circumhbbox=None, angle_version='v1')
    coder = DeltaXYWHAOBBoxCoder(angle_range='v1')
    rois = jnp.asarray([[[16., 16., 30., 20., -0.4],
                         [100., 100., 30., 20., -0.4]]])   # (1, 2, 5)
    gt = jnp.asarray([[[16., 16., 30., 20., -0.4]]])
    labels = jnp.asarray([[3]], dtype=jnp.int32)
    mask = jnp.ones((1, 1), bool)
    out = anchor_targets(rois, gt, labels, mask, coder.encode, 15, cfg,
                         per_image_anchors=True)
    assert int(out.num_pos[0]) == 1
    assert int(out.labels[0, 0]) == 3
    assert int(out.labels[0, 1]) == 15


def test_anchor_targets_random_sampler_budget():
    """RRandomSampler route (rotate_random_sampler.py): pos capped at
    num*pos_fraction, sampled negatives fill the budget, everything
    unsampled gets zero weight."""
    from r3det_tpu.core.samplers import SamplerCfg
    cfg = TargetConfig(pos_iou_thr=0.5, neg_iou_thr=0.4,
                       assign_by_circumhbbox='v1', angle_version='v1',
                       sampler=SamplerCfg(num=8, pos_fraction=0.5))
    coder = DeltaXYWHAOBBoxCoder(angle_range='v1')
    # 40 anchors in a row; gts sit on the first 6 -> 6 positives
    xs = jnp.arange(40, dtype=jnp.float32) * 40 + 16
    anchors = jnp.stack([xs, jnp.full((40,), 16.), jnp.full((40,), 32.),
                         jnp.full((40,), 32.), jnp.zeros(40)], -1)
    gt = jnp.stack([xs[:6], jnp.full((6,), 16.), jnp.full((6,), 30.),
                    jnp.full((6,), 30.), jnp.zeros(6)], -1)[None]
    labels = jnp.zeros((1, 6), jnp.int32)
    mask = jnp.ones((1, 6), bool)
    out = anchor_targets(anchors, gt, labels, mask, coder.encode, 15, cfg,
                         rng=jax.random.PRNGKey(7))
    n_pos = int(out.num_pos[0])
    n_neg = int(out.num_neg[0])
    assert n_pos <= 4                       # num * pos_fraction
    assert n_pos + n_neg <= 8               # total budget
    assert n_neg == 8 - n_pos               # negatives fill the budget
    lw = np.asarray(out.label_weights[0])
    assert (lw > 0).sum() == n_pos + n_neg  # unsampled get zero weight
    assert np.asarray(out.bbox_weights[0]).sum() == n_pos
    # requires an rng when a sampler is configured
    with pytest.raises(ValueError):
        anchor_targets(anchors, gt, labels, mask, coder.encode, 15, cfg)


def test_anchor_targets_random_sampler_keeps_scarce_positives():
    """Fewer positives than the cap: all of them stay (reference
    _sample_pos returns pos_inds unchanged when <= num_expected)."""
    from r3det_tpu.core.samplers import SamplerCfg
    cfg = TargetConfig(pos_iou_thr=0.5, neg_iou_thr=0.4,
                       assign_by_circumhbbox='v1', angle_version='v1',
                       sampler=SamplerCfg(num=16, pos_fraction=0.5))
    coder = DeltaXYWHAOBBoxCoder(angle_range='v1')
    anchors = jnp.asarray([[16., 16., 32., 32., 0.],
                           [100., 100., 32., 32., 0.],
                           [200., 100., 32., 32., 0.]])
    gt = jnp.asarray([[[16., 16., 30., 30., 0.]]])
    labels = jnp.asarray([[2]], jnp.int32)
    mask = jnp.ones((1, 1), bool)
    for seed in range(3):
        out = anchor_targets(anchors, gt, labels, mask, coder.encode, 15,
                             cfg, rng=jax.random.PRNGKey(seed))
        assert int(out.num_pos[0]) == 1
        assert int(out.labels[0, 0]) == 2
        assert int(out.num_neg[0]) == 2     # both negatives fit the budget
