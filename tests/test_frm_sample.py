"""Parity tests for the banded FRM sample kernel (ops/frm_sample.py)
against the flat-gather path (models/frm.py::bilinear_sample), incl.
the budgeted out-of-window correction and the full FRM module route.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r3det_tpu.models.frm import (FeatureRefineModule, bilinear_sample,
                                  feature_refine_sample)
from r3det_tpu.ops.frm_sample import (bilinear_sample_band,
                                      bilinear_sample_stencil)


def _grids(rng, b, h, w, spread, n_far=0):
    """Sample coords near each grid cell's (axis0, axis1) index."""
    i = np.arange(h)[None, :, None]
    j = np.arange(w)[None, None, :]
    py = i + rng.uniform(-spread, spread, (b, h, w))
    px = j + rng.uniform(-spread, spread, (b, h, w))
    if n_far:
        for _ in range(n_far):
            bb = rng.randint(b)
            ii = rng.randint(h)
            jj = rng.randint(w)
            py[bb, ii, jj] = rng.uniform(-2, h + 1)
            px[bb, ii, jj] = rng.uniform(-2, w + 1)
    return py.astype(np.float32), px.astype(np.float32)


def _ref(feat, py, px):
    b, h, w, c = feat.shape
    val = bilinear_sample(feat, jnp.asarray(py.reshape(b, -1)),
                          jnp.asarray(px.reshape(b, -1)))
    return np.asarray(val.reshape(b, h, w, c))


@pytest.mark.parametrize('h,w', [(16, 16), (32, 32), (8, 8)])
def test_band_sample_in_window(h, w):
    rng = np.random.RandomState(0)
    b, c = 2, 256
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    py, px = _grids(rng, b, h, w, spread=2.5)
    ins = jnp.ones((b, h, w), bool)
    # spread 2.5 -> corners up to +-3.5 from the cell: inside a window=4
    # stencil (no correction), but the default window=2 must still be
    # value-exact via the budgeted correction gather
    val, n_out = bilinear_sample_band(feat, jnp.asarray(py),
                                      jnp.asarray(px), ins, window=4,
                                      interpret=True)
    assert int(n_out) == 0
    np.testing.assert_allclose(np.asarray(val), _ref(feat, py, px),
                               rtol=1e-5, atol=1e-5)
    val2, n_out2 = bilinear_sample_band(feat, jnp.asarray(py),
                                        jnp.asarray(px), ins,
                                        outlier_budget=4096,
                                        interpret=True)
    assert int(n_out2) > 0
    np.testing.assert_allclose(np.asarray(val2), _ref(feat, py, px),
                               rtol=1e-5, atol=1e-5)


def test_band_sample_outliers_corrected():
    rng = np.random.RandomState(1)
    b, h, w, c = 2, 16, 16, 256
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    py, px = _grids(rng, b, h, w, spread=1.5, n_far=40)
    ins = jnp.ones((b, h, w), bool)
    val, n_out = bilinear_sample_band(feat, jnp.asarray(py),
                                      jnp.asarray(px), ins,
                                      interpret=True)
    assert int(n_out) > 0
    np.testing.assert_allclose(np.asarray(val), _ref(feat, py, px),
                               rtol=1e-5, atol=1e-5)


def test_band_sample_budget_counts():
    # every point far away: n_out reports the true outlier-corner count
    rng = np.random.RandomState(2)
    b, h, w, c = 1, 8, 8, 256
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    py = np.full((b, h, w), 0.25, np.float32)
    px = np.full((b, h, w), 0.25, np.float32)
    ins = jnp.ones((b, h, w), bool)
    val, n_out = bilinear_sample_band(feat, jnp.asarray(py),
                                      jnp.asarray(px), ins,
                                      outlier_budget=1024, interpret=True)
    # points at grid cells within the window of (0,0) are in-window
    assert int(n_out) > 0
    np.testing.assert_allclose(np.asarray(val), _ref(feat, py, px),
                               rtol=1e-5, atol=1e-5)


def test_band_sample_over_budget_falls_back_exact():
    """ADVICE r3 guard: when outliers exceed the budget, the runtime
    lax.cond swaps in the flat-gather result — exact for ANY geometry —
    instead of silently truncating contributions."""
    rng = np.random.RandomState(3)
    b, h, w, c = 2, 16, 16, 256
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    py, px = _grids(rng, b, h, w, spread=1.5, n_far=120)
    ins = jnp.ones((b, h, w), bool)
    val, n_out = bilinear_sample_band(feat, jnp.asarray(py),
                                      jnp.asarray(px), ins,
                                      outlier_budget=8, interpret=True)
    assert int(n_out) > 8
    np.testing.assert_allclose(np.asarray(val), _ref(feat, py, px),
                               rtol=1e-5, atol=1e-5)
    # and without the guard the same call is NOT exact (documents what
    # exact_fallback protects against)
    val_t, _ = bilinear_sample_band(feat, jnp.asarray(py),
                                    jnp.asarray(px), ins,
                                    outlier_budget=8,
                                    exact_fallback=False, interpret=True)
    assert np.abs(np.asarray(val_t) - _ref(feat, py, px)).max() > 1e-3


@pytest.mark.parametrize('h,w', [(16, 16), (32, 32), (8, 8)])
def test_stencil_sample_matches_gather(h, w):
    # pure-XLA stencil == flat gather, in-window and with outliers
    rng = np.random.RandomState(0)
    b, c = 2, 256
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    py, px = _grids(rng, b, h, w, spread=1.5)
    ins = jnp.ones((b, h, w), bool)
    val, n_out = bilinear_sample_stencil(feat, jnp.asarray(py),
                                         jnp.asarray(px), ins)
    assert int(n_out) == 0
    np.testing.assert_allclose(np.asarray(val), _ref(feat, py, px),
                               rtol=1e-5, atol=1e-5)
    py2, px2 = _grids(rng, b, h, w, spread=1.5, n_far=30)
    val2, n_out2 = bilinear_sample_stencil(feat, jnp.asarray(py2),
                                           jnp.asarray(px2), ins)
    assert int(n_out2) > 0
    np.testing.assert_allclose(np.asarray(val2), _ref(feat, py2, px2),
                               rtol=1e-5, atol=1e-5)


def test_stencil_sample_over_budget_falls_back_exact():
    rng = np.random.RandomState(3)
    b, h, w, c = 2, 16, 16, 256
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    py, px = _grids(rng, b, h, w, spread=1.5, n_far=120)
    ins = jnp.ones((b, h, w), bool)
    val, n_out = bilinear_sample_stencil(feat, jnp.asarray(py),
                                         jnp.asarray(px), ins,
                                         outlier_budget=8)
    assert int(n_out) > 8
    np.testing.assert_allclose(np.asarray(val), _ref(feat, py, px),
                               rtol=1e-5, atol=1e-5)
    val_t, _ = bilinear_sample_stencil(feat, jnp.asarray(py),
                                       jnp.asarray(px), ins,
                                       outlier_budget=8,
                                       exact_fallback=False)
    assert np.abs(np.asarray(val_t) - _ref(feat, py, px)).max() > 1e-3


@pytest.mark.parametrize('quirk', [True, False])
def test_feature_refine_sample_stencil_route(quirk):
    # 'stencil' module route == gather route (no interpret shim needed:
    # the stencil is pure XLA and runs anywhere)
    rng = np.random.RandomState(3)
    b, h, w, c, stride = 2, 16, 16, 64, 8
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    i = np.arange(h)[None, :, None]
    j = np.arange(w)[None, None, :]
    cx = ((j + 0.5) * stride + rng.uniform(-8, 8, (b, h, w)))
    cy = ((i + 0.5) * stride + rng.uniform(-8, 8, (b, h, w)))
    boxes = np.stack([cx, cy,
                      rng.uniform(8, 60, (b, h, w)),
                      rng.uniform(8, 60, (b, h, w)),
                      rng.uniform(-1.5, 0, (b, h, w))],
                     -1).reshape(b, h * w, 5).astype(np.float32)
    boxes = jnp.asarray(boxes)
    ref = feature_refine_sample(feat, boxes, 1.0 / stride,
                                transpose_quirk=quirk)
    got = feature_refine_sample(feat, boxes, 1.0 / stride,
                                transpose_quirk=quirk,
                                sample_kernel='stencil')
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('quirk', [True, False])
def test_feature_refine_sample_kernel_route(quirk, monkeypatch):
    # the module-level route: rois decoded near anchor positions, both
    # quirk settings; kernel path == gather path
    import r3det_tpu.ops.frm_sample as fs
    orig = fs.bilinear_sample_band

    def interp(feat, py, px, ins, **kw):
        kw.setdefault('interpret', True)
        return orig(feat, py, px, ins, **kw)

    monkeypatch.setattr(fs, 'bilinear_sample_band', interp)
    rng = np.random.RandomState(3)
    b, h, w, c, stride = 2, 16, 16, 64, 8
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    i = np.arange(h)[None, :, None]
    j = np.arange(w)[None, None, :]
    cx = ((j + 0.5) * stride + rng.uniform(-8, 8, (b, h, w)))
    cy = ((i + 0.5) * stride + rng.uniform(-8, 8, (b, h, w)))
    boxes = np.stack([cx, cy,
                      rng.uniform(8, 60, (b, h, w)),
                      rng.uniform(8, 60, (b, h, w)),
                      rng.uniform(-1.5, 0, (b, h, w))],
                     -1).reshape(b, h * w, 5).astype(np.float32)
    boxes = jnp.asarray(boxes)
    ref = feature_refine_sample(feat, boxes, 1.0 / stride,
                                transpose_quirk=quirk)
    got = feature_refine_sample(feat, boxes, 1.0 / stride,
                                transpose_quirk=quirk,
                                sample_kernel=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_frm_module_kernel_flag(monkeypatch):
    # FeatureRefineModule(sample_kernel=True) == (False) end to end
    import r3det_tpu.ops.frm_sample as fs
    orig = fs.bilinear_sample_band

    def interp(feat, py, px, ins, **kw):
        kw.setdefault('interpret', True)
        return orig(feat, py, px, ins, **kw)

    monkeypatch.setattr(fs, 'bilinear_sample_band', interp)
    rng = np.random.RandomState(4)
    strides = (8, 16)
    b, c = 2, 64
    feats = [jnp.asarray(rng.randn(b, s, s, c).astype(np.float32))
             for s in (16, 8)]
    rois = []
    for lvl, (fm, st) in enumerate(zip(feats, strides)):
        h, w = fm.shape[1:3]
        i = np.arange(h)[None, :, None]
        j = np.arange(w)[None, None, :]
        cx = (j + 0.5) * st + rng.uniform(-st, st, (b, h, w))
        cy = (i + 0.5) * st + rng.uniform(-st, st, (b, h, w))
        rois.append(jnp.asarray(np.stack(
            [cx, cy, np.full_like(cx, 24.0), np.full_like(cx, 12.0),
             np.full_like(cx, -0.3)], -1).reshape(b, h * w, 5)
            .astype(np.float32)))

    def run(flag):
        m = FeatureRefineModule(in_channels=c, featmap_strides=strides,
                                sample_kernel=flag)
        v = m.init(jax.random.PRNGKey(0), feats, rois)
        return m.apply(v, feats, rois)

    a = run(False)
    bq = run(True)
    for x, y in zip(a, bq):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-4)
