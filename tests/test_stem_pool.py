"""Fused stem kernel (ops/stem_pool.py) parity vs the XLA composition."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r3det_tpu.ops.stem_pool import (stem_conv_pool_pallas,
                                     stem_conv_pool_reference)

RNG = np.random.RandomState(5)


def make_inputs(b=2, h=32, w=32):
    x = jnp.asarray(RNG.uniform(-2, 2, (b, h, w, 12)).astype(np.float32))
    k = jnp.asarray(RNG.normal(0, 0.1, (4, 4, 12, 64)).astype(np.float32))
    scale = jnp.asarray(RNG.uniform(0.5, 2, 64).astype(np.float32))
    bias = jnp.asarray(RNG.uniform(-1, 1, 64).astype(np.float32))
    return x, k, scale, bias


@pytest.mark.slow
def test_stem_kernel_matches_reference_interpret():
    x, k, scale, bias = make_inputs()
    want = np.asarray(stem_conv_pool_reference(x, k, scale, bias),
                      np.float32)
    got = np.asarray(stem_conv_pool_pallas(x, k, scale, bias,
                                           interpret=True), np.float32)
    assert got.shape == want.shape == (2, 16, 16, 64)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_stem_reference_matches_unfused_modules():
    """The XLA composition itself must equal conv->bn->relu->pool as the
    ResNet module used to compute it."""
    from flax import linen as nn
    x, k, scale, bias = make_inputs()
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1),
        [(2, 1), (2, 1)], dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = y.astype(jnp.float32) * scale + bias
    y = nn.relu(y)
    want = nn.max_pool(y, (3, 3), strides=(2, 2),
                       padding=[(1, 1), (1, 1)])
    got = np.asarray(stem_conv_pool_reference(x, k, scale, bias),
                     np.float32)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-2, rtol=2e-2)


def test_stem_s2d4_matches_reference():
    """The double-folded (48-channel) stem — the default runtime path on
    all platforms — must equal the single-fold composition in f32 and
    bf16 (it is the same math, reassociated)."""
    from r3det_tpu.ops.stem_pool import stem_conv_pool_s2d4
    x, k, scale, bias = make_inputs()
    for dtype, atol in ((jnp.float32, 1e-4), (jnp.bfloat16, 2e-2)):
        want = np.asarray(
            stem_conv_pool_reference(x, k, scale, bias, dtype=dtype),
            np.float32)
        got = np.asarray(
            stem_conv_pool_s2d4(x, k, scale, bias, dtype=dtype),
            np.float32)
        assert got.shape == want.shape == (2, 16, 16, 64)
        np.testing.assert_allclose(got, want, atol=atol, rtol=2e-2)


@pytest.mark.slow
def test_stem_kernel_grouped_matches_reference_interpret():
    from r3det_tpu.ops.stem_pool import stem_conv_pool_pallas_grouped
    x, k, scale, bias = make_inputs()
    want = np.asarray(stem_conv_pool_reference(x, k, scale, bias),
                      np.float32)
    got = np.asarray(stem_conv_pool_pallas_grouped(x, k, scale, bias,
                                                   interpret=True),
                     np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_s2d4_pallas_kernel_parity():
    """Fused s2d4 stem kernel (interpret) == XLA s2d4 composition,
    including the top-row -inf pool edge and multiple grid steps."""
    import numpy as np
    from r3det_tpu.ops.stem_pool import (stem_conv_pool_s2d4,
                                         stem_conv_pool_s2d4_pallas)
    rng = np.random.RandomState(7)
    x12 = jnp.asarray(rng.randn(2, 64, 32, 12).astype(np.float32)
                      ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(4, 4, 12, 64).astype(np.float32) * 0.1)
    s = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    ref = stem_conv_pool_s2d4(x12, k, s, b)
    out = stem_conv_pool_s2d4_pallas(x12, k, s, b, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=1e-2)


def test_fused_bottleneck_kernel_parity():
    """ops/bottleneck_fuse.py interpret == the plain XLA bottleneck
    (exact BN fold; bf16 data, f32 accumulation)."""
    import numpy as np
    from r3det_tpu.models.resnet import Bottleneck
    r = np.random.RandomState(3)
    x = jnp.asarray(r.normal(0, 1, (2, 16, 24, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    mod = Bottleneck(16, stride=1, dtype=jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats
    v = {'params': v['params'],
         'batch_stats': jax.tree.map(
             lambda a: a + jnp.asarray(
                 np.abs(r.normal(0, 0.3, a.shape)).astype(np.float32)),
             v['batch_stats'])}
    ref = mod.apply(v, x)

    from r3det_tpu.ops.bottleneck_fuse import fold_bn, fused_bottleneck
    p, s = v['params'], v['batch_stats']
    w1, b1 = fold_bn(p['conv1']['kernel'], p['bn1']['scale'],
                     p['bn1']['bias'], s['bn1']['mean'], s['bn1']['var'])
    w2, b2 = fold_bn(p['conv2']['kernel'], p['bn2']['scale'],
                     p['bn2']['bias'], s['bn2']['mean'], s['bn2']['var'])
    w3, b3 = fold_bn(p['conv3']['kernel'], p['bn3']['scale'],
                     p['bn3']['bias'], s['bn3']['mean'], s['bn3']['var'])
    out = fused_bottleneck(x, w1, b1, w2, b2, w3, b3, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=0.05)


def test_fused_flag_same_tree_and_output():
    """Bottleneck(fused=True) keeps the param tree and matches the
    unfused forward (CPU takes the XLA branch of platform_dependent)."""
    import numpy as np
    from r3det_tpu.models.resnet import Bottleneck
    r = np.random.RandomState(4)
    x = jnp.asarray(r.normal(0, 1, (1, 16, 16, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    m0 = Bottleneck(16, stride=1, dtype=jnp.bfloat16)
    m1 = Bottleneck(16, stride=1, fused=True, dtype=jnp.bfloat16)
    v0 = m0.init(jax.random.PRNGKey(1), x)
    v1 = m1.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(v0) == \
        jax.tree_util.tree_structure(v1)
    y0 = np.asarray(m0.apply(v0, x), np.float32)
    y1 = np.asarray(jax.jit(m1.apply)(v0, x), np.float32)
    np.testing.assert_allclose(y1, y0, rtol=0, atol=0.05)


def test_fused_flags_full_detector_cpu():
    """R3Det with stem_fused_kernel+fused_blocks (+int8 config) builds,
    keeps the quantized param tree, and runs the non-TPU branches."""
    import numpy as np
    from r3det_tpu.models.detectors import (DetectorConfig, StageTrainCfg,
                                            build_detector)
    cfg = DetectorConfig(
        num_classes=3, stacked_convs=1, feat_channels=32,
        backbone_depth=50, num_refine_stages=1, stage_loss_weights=(1.0,),
        quantize='static', quantize_head='static',
        s0_train=StageTrainCfg(0.5, 0.4, 0.0, 'v1'),
        sr_train=(StageTrainCfg(0.6, 0.5, 0.0, None),))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    m0 = build_detector(cfg, dtype=jnp.bfloat16)
    m1 = build_detector(cfg, dtype=jnp.bfloat16, stem_fused_kernel=True,
                        fused_blocks=True)
    v0 = jax.jit(m0.init)(jax.random.PRNGKey(0), x)
    v1 = jax.jit(m1.init)(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v0) == \
        jax.tree_util.tree_structure(v1)
    out = jax.jit(m1.apply)(v1, x)
    for lvl in out['s0'][0]:
        assert np.isfinite(np.asarray(lvl, np.float32)).all()


def test_s2d4_pallas_kernel_parity_int8():
    """Fused s2d4 stem kernel int8 path (interpret) == the XLA int8
    quantize branch (same per-channel weight / per-tensor activation
    grids; the kernel keeps exact int32 accumulation while the XLA
    branch emits bf16, hence the tolerance)."""
    import numpy as np
    from r3det_tpu.ops.stem_pool import (stem_conv_pool_s2d4,
                                         stem_conv_pool_s2d4_pallas)
    rng = np.random.RandomState(11)
    x12 = jnp.asarray(rng.randn(2, 64, 32, 12).astype(np.float32)
                      ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(4, 4, 12, 64).astype(np.float32) * 0.1)
    s = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    ref = stem_conv_pool_s2d4(x12, k, s, b, quantize=True)
    out = stem_conv_pool_s2d4_pallas(x12, k, s, b, interpret=True,
                                     quantize=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=5e-2)


def test_fused_bottleneck_q8_kernel_parity():
    """int8 fused bottleneck (interpret) == its XLA oracle with the
    same quantization grids (int32 accumulation is exact, so only f32
    epilogue rounding differs), and both land within PTQ error of the
    bf16 block."""
    import numpy as np
    from r3det_tpu.ops.bottleneck_fuse import (
        fold_bn, fused_bottleneck, fused_bottleneck_q8,
        fused_bottleneck_q8_xla)
    r = np.random.RandomState(5)
    f, c4 = 16, 64
    x = jnp.asarray(r.normal(0, 1, (2, 16, 24, c4)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w1 = jnp.asarray(r.normal(0, 0.1, (1, 1, c4, f)).astype(np.float32))
    b1 = jnp.asarray(r.normal(0, 0.1, (f,)).astype(np.float32))
    w2 = jnp.asarray(r.normal(0, 0.1, (3, 3, f, f)).astype(np.float32))
    b2 = jnp.asarray(r.normal(0, 0.1, (f,)).astype(np.float32))
    w3 = jnp.asarray(r.normal(0, 0.1, (1, 1, f, c4)).astype(np.float32))
    b3 = jnp.asarray(r.normal(0, 0.1, (c4,)).astype(np.float32))
    # calibrated ranges = true maxima of the bf16 intermediates
    xf = np.asarray(x, np.float32)
    a1 = jnp.asarray(np.abs(xf).max())
    ref_bf16 = fused_bottleneck(x, w1, b1, w2, b2, w3, b3, interpret=True)

    def mid_maxima():
        y = np.maximum(np.einsum(
            'bhwc,cf->bhwf', xf, np.asarray(w1, np.float32)[0, 0])
            + np.asarray(b1, np.float32), 0)
        import jax.numpy as jn
        y2 = jax.lax.conv_general_dilated(
            jn.asarray(y), w2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        y2 = np.maximum(np.asarray(y2) + np.asarray(b2, np.float32), 0)
        return np.abs(y).max(), np.abs(y2).max()

    m1, m2 = mid_maxima()
    a2 = jnp.asarray(m1)
    a3 = jnp.asarray(m2)
    out = fused_bottleneck_q8(x, w1, b1, w2, b2, w3, b3, a1, a2, a3,
                              interpret=True)
    oracle = fused_bottleneck_q8_xla(x, w1, b1, w2, b2, w3, b3, a1, a2, a3)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(oracle, np.float32),
                               rtol=0, atol=2e-2)
    # PTQ error vs the bf16 block stays bounded
    d = np.abs(np.asarray(out, np.float32) -
               np.asarray(ref_bf16, np.float32))
    ref_mag = np.abs(np.asarray(ref_bf16, np.float32)).max()
    assert d.max() <= 0.15 * max(ref_mag, 1.0), (d.max(), ref_mag)


def test_bottleneck_q8_static_routes_fused():
    """Bottleneck(quantize='static', fused=True) on CPU runs the q8 XLA
    oracle branch and matches the unfused QConv static path within PTQ
    tolerance (BN folding moves the weight grids slightly)."""
    import numpy as np
    from r3det_tpu.models.resnet import Bottleneck
    r = np.random.RandomState(6)
    x = jnp.asarray(r.normal(0, 1, (1, 16, 16, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    m0 = Bottleneck(16, stride=1, quantize='static', dtype=jnp.bfloat16)
    v0 = m0.init(jax.random.PRNGKey(2), x)
    # calibrate: one mutable pass records act_absmax
    _, mut = m0.apply(v0, x, mutable=['quant_stats'])
    v0 = {**v0, 'quant_stats': mut['quant_stats']}
    m1 = Bottleneck(16, stride=1, quantize='static', fused=True,
                    dtype=jnp.bfloat16)
    assert jax.tree_util.tree_structure(m1.init(jax.random.PRNGKey(2), x)
                                        ) == jax.tree_util.tree_structure(
                                            {k: v for k, v in v0.items()})
    y0 = np.asarray(m0.apply(v0, x), np.float32)
    y1 = np.asarray(jax.jit(m1.apply)(v0, x), np.float32)
    np.testing.assert_allclose(y1, y0, rtol=0,
                               atol=0.1 * max(np.abs(y0).max(), 1.0))


def test_pool_s2d4_pallas_parity():
    """Pool-only band kernel (interpret) == the XLA blocked-pool tail,
    including the -inf top edge, across several grid steps."""
    import numpy as np
    from r3det_tpu.ops.stem_pool import _pool_s2d4_xla, pool_s2d4_pallas
    rng = np.random.RandomState(13)
    y = jnp.asarray(rng.randn(2, 32, 16, 256).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ref = _pool_s2d4_xla(y)
    out = pool_s2d4_pallas(y, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_stem_s2d4_pool_kernel_flag_cpu():
    """stem_conv_pool_s2d4(pool_kernel=True) on CPU routes the XLA pool
    branch and equals the default path exactly."""
    import numpy as np
    from r3det_tpu.ops.stem_pool import stem_conv_pool_s2d4
    rng = np.random.RandomState(14)
    x12 = jnp.asarray(rng.randn(1, 64, 32, 12).astype(np.float32)
                      ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(4, 4, 12, 64).astype(np.float32) * 0.1)
    s = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    # jit both sides: the dynamic int8 activation scale rounds
    # differently eager-vs-jit (fusion choice), which is orthogonal
    # to the pool dispatch under test here
    a = jax.jit(lambda *t: stem_conv_pool_s2d4(
        *t, quantize=True))(x12, k, s, b)
    c = jax.jit(lambda *t: stem_conv_pool_s2d4(
        *t, quantize=True, pool_kernel=True))(x12, k, s, b)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(c, np.float32))
