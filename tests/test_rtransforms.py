"""Geometry-core tests: independent analytic oracles + round trips.

Oracle strategy (SURVEY.md §4): golden values are hand-computed or produced
with cv2/numpy float64 geometry, never by re-running the code under test.
"""
import math

import numpy as np
import pytest

import jax.numpy as jnp

from r3det_tpu.core import rtransforms as rt
from r3det_tpu.core import rtransforms_np as rtn

PI = math.pi
RNG = np.random.RandomState(0)


def random_obb(n, version, wmin=4.0, wmax=80.0):
    cx = RNG.uniform(100, 900, n)
    cy = RNG.uniform(100, 900, n)
    w = RNG.uniform(wmin, wmax, n)
    h = RNG.uniform(wmin, wmax, n)
    if version == 'v1':
        # theta in (-pi/2, 0); avoid exact endpoints
        a = RNG.uniform(-PI / 2 + 1e-3, -1e-3, n)
    elif version == 'v2':
        a = RNG.uniform(-PI / 4 + 1e-3, 3 * PI / 4 - 1e-3, n)
        w2 = np.maximum(w, h)
        h = np.minimum(w, h)
        w = w2
    else:
        a = RNG.uniform(-PI / 2 + 1e-3, PI / 2 - 1e-3, n)
        w2 = np.maximum(w, h)
        h = np.minimum(w, h)
        w = w2
    return np.stack([cx, cy, w, h, a], -1).astype(np.float32)


def poly_corners_float64(obb, version):
    """Independent float64 corner oracle from first principles."""
    cx, cy, w, h, a = obb.T.astype(np.float64)
    if version == 'v1':
        # v1 parameterization: w-axis = (cos a, sin a), h-axis = (-sin a, cos a)
        ux = np.stack([np.cos(a), np.sin(a)], -1)
    else:
        ux = np.stack([np.cos(a), np.sin(a)], -1)
    uy = np.stack([-ux[:, 1], ux[:, 0]], -1)
    c = np.stack([cx, cy], -1)
    p0 = c - ux * w[:, None] / 2 - uy * h[:, None] / 2
    p1 = c + ux * w[:, None] / 2 - uy * h[:, None] / 2
    p2 = c + ux * w[:, None] / 2 + uy * h[:, None] / 2
    p3 = c - ux * w[:, None] / 2 + uy * h[:, None] / 2
    return np.concatenate([p0, p1, p2, p3], -1)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_obb2poly_matches_analytic(version):
    obb = random_obb(64, version)
    polys = np.asarray(rt.obb2poly(jnp.asarray(obb), version))
    ref = poly_corners_float64(obb, version)
    if version == 'v1':
        np.testing.assert_allclose(polys, ref, atol=1e-3)
    else:
        # v2/v3 corner order is (tl, tr, br, bl) in box frame = same set of
        # vertices; compare as sets via sorted distance matching
        got = polys.reshape(-1, 4, 2)
        want = ref.reshape(-1, 4, 2)
        for g, wv in zip(got, want):
            d = np.linalg.norm(g[:, None] - wv[None], axis=-1)
            assert d.min(axis=1).max() < 1e-2


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_poly_obb_roundtrip(version):
    obb = random_obb(128, version)
    polys = rt.obb2poly(jnp.asarray(obb), version)
    back = np.asarray(rt.poly2obb(polys, version))
    np.testing.assert_allclose(back[:, :2], obb[:, :2], atol=1e-2)
    np.testing.assert_allclose(back[:, 2:4], obb[:, 2:4], rtol=1e-3, atol=1e-2)
    # angles equal modulo the version's symmetry
    da = rt.norm_angle(back[:, 4] - obb[:, 4], 'v3')
    np.testing.assert_allclose(np.asarray(da), 0, atol=1e-3)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_poly2obb_range(version):
    polys = RNG.uniform(0, 1024, (100, 8)).astype(np.float32)
    obb = np.asarray(rt.poly2obb(jnp.asarray(polys), version))
    a = obb[:, 4]
    if version == 'v1':
        assert np.all(a <= 0) and np.all(a >= -PI / 2)
    elif version == 'v2':
        assert np.all(a >= -PI / 4 - 1e-6) and np.all(a < 3 * PI / 4 + 1e-6)
        assert np.all(obb[:, 2] >= obb[:, 3])  # w = long edge
    else:
        assert np.all(a >= -PI / 2 - 1e-6) and np.all(a < PI / 2 + 1e-6)
        assert np.all(obb[:, 2] >= obb[:, 3])


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_obb2xyxy_circumscribes(version):
    obb = random_obb(64, version)
    xyxy = np.asarray(rt.obb2xyxy(jnp.asarray(obb), version))
    corners = poly_corners_float64(obb, version).reshape(-1, 4, 2)
    xmin, ymin = corners[..., 0].min(1), corners[..., 1].min(1)
    xmax, ymax = corners[..., 0].max(1), corners[..., 1].max(1)
    np.testing.assert_allclose(xyxy[:, 0], xmin, atol=1e-2)
    np.testing.assert_allclose(xyxy[:, 1], ymin, atol=1e-2)
    np.testing.assert_allclose(xyxy[:, 2], xmax, atol=1e-2)
    np.testing.assert_allclose(xyxy[:, 3], ymax, atol=1e-2)


def test_obb2hbb_v1_slot_quirk():
    """The reference writes h-extent into the w slot and vice versa for v1
    (rtransforms.py:459-460); verify we preserve that."""
    obb = np.array([[100., 100., 40., 10., -0.3]], np.float32)
    out = np.asarray(rt.obb2hbb_v1(jnp.asarray(obb)))[0]
    cosa, sina = math.cos(-0.3), math.sin(-0.3)
    hbb_w = cosa * 40 - sina * 10
    hbb_h = -sina * 40 + cosa * 10
    assert out[2] == pytest.approx(hbb_h, abs=1e-4)   # w slot <- h extent
    assert out[3] == pytest.approx(hbb_w, abs=1e-4)   # h slot <- w extent
    assert out[4] == pytest.approx(-PI / 2)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_hbb2obb_geometry(version):
    hb = np.array([[10., 20., 110., 60.],     # wide: w=100 h=40
                   [10., 20., 50., 220.]],    # tall: w=40 h=200
                  np.float32)
    out = np.asarray(rt.hbb2obb(jnp.asarray(hb), version))
    np.testing.assert_allclose(out[0, :2], [60., 40.], atol=1e-5)
    if version == 'v1':
        # v1: always (h, w, -pi/2)
        np.testing.assert_allclose(out[0, 2:4], [40., 100.], atol=1e-5)
        assert out[0, 4] == pytest.approx(-PI / 2)
    else:
        np.testing.assert_allclose(out[0, 2:4], [100., 40.], atol=1e-5)
        assert out[0, 4] == pytest.approx(0.0)
        np.testing.assert_allclose(out[1, 2:4], [200., 40.], atol=1e-5)
        expect = PI / 2 if version == 'v2' else -PI / 2
        assert out[1, 4] == pytest.approx(expect)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_np_poly2obb_matches_jnp_semantics(version):
    obb = random_obb(32, version, wmin=6.0)
    polys = np.asarray(rt.obb2poly(jnp.asarray(obb), version))
    for i in range(len(polys)):
        got = rtn.poly2obb_np(polys[i], version)
        assert got is not None
        x, y, w, h, a = got
        assert x == pytest.approx(obb[i, 0], abs=0.1)
        assert y == pytest.approx(obb[i, 1], abs=0.1)
        assert sorted([w, h]) == pytest.approx(
            sorted([obb[i, 2], obb[i, 3]]), rel=5e-3, abs=0.1)


def test_np_poly2obb_rejects_degenerate():
    tiny = np.array([0, 0, 1, 0, 1, 1, 0, 1], np.float32)
    for v in ['v1', 'v2', 'v3']:
        assert rtn.poly2obb_np(tiny, v) is None


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_obb2poly_np_roundtrip(version):
    obb = random_obb(16, version)
    scored = np.concatenate([obb, np.ones((16, 1), np.float32)], -1)
    polys = rtn.obb2poly_np(scored, version)
    assert polys.shape == (16, 9)
    # centers recoverable
    pts = polys[:, :8].reshape(-1, 4, 2)
    np.testing.assert_allclose(pts.mean(1), obb[:, :2], atol=1e-2)
    np.testing.assert_allclose(polys[:, 8], 1.0)


def test_get_best_begin_point_prefers_tl_order():
    # A unit square given in rotated vertex order; best shift starts at (0,0)
    sq = np.array([[10., 0., 10., 10., 0., 10., 0., 0., 0.9]])
    out = rtn.get_best_begin_point(sq)
    np.testing.assert_allclose(out[0, :2], [0., 0.])
    np.testing.assert_allclose(out[0, 8], 0.9)


def test_norm_angle_ranges():
    a = np.linspace(-10, 10, 401)
    v2 = np.asarray(rt.norm_angle(jnp.asarray(a), 'v2'))
    v3 = np.asarray(rt.norm_angle(jnp.asarray(a), 'v3'))
    assert np.all(v2 >= -PI / 4 - 1e-6) and np.all(v2 < 3 * PI / 4 + 1e-6)
    assert np.all(v3 >= -PI / 2 - 1e-6) and np.all(v3 < PI / 2 + 1e-6)
    # consistency with numpy twin
    np.testing.assert_allclose(v2, rtn.norm_angle_np(a, 'v2'), atol=1e-6)


def test_rbbox2result_partition():
    dets = np.arange(30, dtype=np.float32).reshape(5, 6)
    labels = np.array([0, 2, 2, 1, 0])
    out = rtn.rbbox2result(dets, labels, 3)
    assert len(out) == 3
    assert out[0].shape == (2, 6) and out[2].shape == (2, 6)
    assert rtn.rbbox2result(np.zeros((0, 6)), np.zeros((0,)), 3)[1].shape == (0, 6)
