"""Coder tests: encode/decode inverse property + analytic golden checks."""
import math

import numpy as np
import pytest

import jax.numpy as jnp

from r3det_tpu.core import coders
from r3det_tpu.core.rtransforms import norm_angle

PI = math.pi
RNG = np.random.RandomState(7)


def rand_obb(n, version):
    cx = RNG.uniform(100, 900, n)
    cy = RNG.uniform(100, 900, n)
    w = RNG.uniform(8, 120, n)
    h = RNG.uniform(8, 120, n)
    if version == 'v1':
        a = RNG.uniform(-PI / 2 + 1e-2, -1e-2, n)
    elif version == 'v2':
        a = RNG.uniform(-PI / 4 + 1e-2, 3 * PI / 4 - 1e-2, n)
        w, h = np.maximum(w, h), np.minimum(w, h)
    else:
        a = RNG.uniform(-PI / 2 + 1e-2, PI / 2 - 1e-2, n)
        w, h = np.maximum(w, h), np.minimum(w, h)
    return np.stack([cx, cy, w, h, a], -1).astype(np.float32)


def rand_hbb(n):
    x1 = RNG.uniform(0, 500, n)
    y1 = RNG.uniform(0, 500, n)
    w = RNG.uniform(10, 200, n)
    h = RNG.uniform(10, 200, n)
    return np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_obb_coder_roundtrip(version):
    coder = coders.DeltaXYWHAOBBoxCoder(angle_range=version)
    anchors = rand_obb(256, version)
    gt = rand_obb(256, version)
    deltas = coder.encode(jnp.asarray(anchors), jnp.asarray(gt))
    dec = np.asarray(coder.decode(jnp.asarray(anchors), deltas))
    np.testing.assert_allclose(dec[:, :2], gt[:, :2], atol=0.3)
    if version == 'v3':
        # v3 regularizes w/h — compare as multisets
        np.testing.assert_allclose(np.sort(dec[:, 2:4], -1),
                                   np.sort(gt[:, 2:4], -1), rtol=2e-3, atol=0.3)
    else:
        np.testing.assert_allclose(dec[:, 2:4], gt[:, 2:4], rtol=2e-3, atol=0.3)
    da = np.asarray(norm_angle(jnp.asarray(dec[:, 4] - gt[:, 4]), 'v3'))
    np.testing.assert_allclose(da, 0, atol=1e-3)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_hbb_coder_roundtrip(version):
    coder = coders.DeltaXYWHAHBBoxCoder(angle_range=version)
    anchors = rand_hbb(256)
    gt = rand_obb(256, version)
    deltas = coder.encode(jnp.asarray(anchors), jnp.asarray(gt))
    dec = np.asarray(coder.decode(jnp.asarray(anchors), deltas))
    np.testing.assert_allclose(dec[:, :2], gt[:, :2], atol=0.3)
    np.testing.assert_allclose(np.sort(dec[:, 2:4], -1),
                               np.sort(gt[:, 2:4], -1), rtol=2e-3, atol=0.3)
    da = np.asarray(norm_angle(jnp.asarray(dec[:, 4] - gt[:, 4]), 'v3'))
    np.testing.assert_allclose(da, 0, atol=1e-3)


def test_v1_encode_golden():
    """Hand-computed v1 deltas: plain normalized offsets."""
    anchor = jnp.asarray([[100., 200., 50., 20., -0.5]])
    gt = jnp.asarray([[110., 190., 100., 10., -0.3]])
    d = np.asarray(coders.obb2delta_v1(anchor, gt))[0]
    assert d[0] == pytest.approx(10 / 50)
    assert d[1] == pytest.approx(-10 / 20)
    assert d[2] == pytest.approx(math.log(2.0), abs=1e-6)
    assert d[3] == pytest.approx(math.log(0.5), abs=1e-6)
    assert d[4] == pytest.approx(0.2, abs=1e-6)


def test_v2_encode_projection_and_pi_scaling():
    """v2 projects (dx,dy) into the anchor frame and divides dtheta by pi."""
    theta = 0.7
    anchor = jnp.asarray([[0., 0., 10., 10., theta]])
    # gt displaced exactly along the anchor's w-axis by 5
    gx, gy = 5 * math.cos(theta), 5 * math.sin(theta)
    gt = jnp.asarray([[gx, gy, 10., 10., theta + 0.1]])
    d = np.asarray(coders.obb2delta_v2(anchor, gt))[0]
    assert d[0] == pytest.approx(0.5, abs=1e-5)
    assert d[1] == pytest.approx(0.0, abs=1e-5)
    assert d[4] == pytest.approx(0.1 / PI, abs=1e-6)


def test_v3_encode_regularizes_to_nearest_quadrant():
    """gt rotated ~pi/2 from anchor: v3 swaps gt w/h and uses the small angle."""
    anchor = jnp.asarray([[0., 0., 40., 20., 0.1]])
    gt = jnp.asarray([[0., 0., 40., 20., 0.1 + PI / 2 - 0.05]])
    d = np.asarray(coders.obb2delta_v3(anchor, gt))[0]
    # dtheta2 = (pi/2 - 0.05) + pi/2 folded -> -0.05; chosen over dtheta1
    assert d[4] == pytest.approx(-0.05, abs=1e-5)
    # w/h swapped: log(gh/pw), log(gw/ph)
    assert d[2] == pytest.approx(math.log(20 / 40), abs=1e-5)
    assert d[3] == pytest.approx(math.log(40 / 20), abs=1e-5)


def test_v3_decode_enforces_w_ge_h():
    rois = jnp.asarray(rand_obb(64, 'v3'))
    deltas = jnp.asarray(RNG.uniform(-1, 1, (64, 5)).astype(np.float32))
    out = np.asarray(coders.delta2obb_v3(rois, deltas))
    assert np.all(out[:, 2] >= out[:, 3])
    assert np.all(out[:, 4] >= -PI / 2 - 1e-6)
    assert np.all(out[:, 4] < PI / 2 + 1e-6)


def test_v2_decode_angle_range():
    rois = jnp.asarray(rand_obb(64, 'v2'))
    deltas = jnp.asarray(RNG.uniform(-1, 1, (64, 5)).astype(np.float32))
    out = np.asarray(coders.delta2obb_v2(rois, deltas))
    assert np.all(out[:, 4] >= -PI / 4 - 1e-6)
    assert np.all(out[:, 4] < 3 * PI / 4 + 1e-6)


def test_means_stds_applied():
    coder = coders.DeltaXYWHAOBBoxCoder(
        target_means=(.1, .1, 0., 0., 0.),
        target_stds=(.5, .5, 1., 1., .2), angle_range='v1')
    anchors = jnp.asarray(rand_obb(8, 'v1'))
    gt = jnp.asarray(rand_obb(8, 'v1'))
    d = coder.encode(anchors, gt)
    dec = np.asarray(coder.decode(anchors, d))
    np.testing.assert_allclose(dec[:, :4], np.asarray(gt)[:, :4],
                               rtol=1e-3, atol=0.3)


def test_decode_wh_ratio_clip():
    roi = jnp.asarray([[0., 0., 10., 10., -0.5]])
    big = jnp.asarray([[0., 0., 99., -99., 0.]])
    out = np.asarray(coders.delta2obb_v1(roi, big))[0]
    limit = abs(math.log(16 / 1000))
    assert out[2] == pytest.approx(10 * math.exp(limit), rel=1e-5)
    assert out[3] == pytest.approx(10 * math.exp(-limit), rel=1e-5)
