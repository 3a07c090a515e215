"""int8 PTQ inference path (models/quant.py)."""
import numpy as np

import jax
import jax.numpy as jnp

from r3det_tpu.models.detectors import (DetectorConfig, StageTrainCfg,
                                        build_detector)
from r3det_tpu.models.quant import QConv, calibrate
from flax import linen as nn

TINY = DetectorConfig(
    num_classes=3, stacked_convs=1, feat_channels=32, backbone_depth=10,
    num_refine_stages=1, stage_loss_weights=(1.0,),
    s0_train=StageTrainCfg(0.5, 0.4, 0.0, 'v1'),
    sr_train=(StageTrainCfg(0.6, 0.5, 0.0, None),))


def test_qconv_matches_conv_within_quant_error():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.normal(0, 1, (2, 16, 16, 32)).astype(np.float32))
    conv = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                   dtype=jnp.float32)
    qconv = QConv(64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                  dtype=jnp.float32)
    v = conv.init(jax.random.PRNGKey(0), x)
    vq = qconv.init(jax.random.PRNGKey(0), x)
    # identical param tree -> shared weights
    assert jax.tree_util.tree_structure(v['params']) == \
        jax.tree_util.tree_structure(vq['params'])
    y = conv.apply(v, x)
    yq = qconv.apply({'params': v['params'],
                      'quant_stats': vq['quant_stats']}, x)
    rel = float(jnp.abs(y - yq).max() / (jnp.abs(y).max() + 1e-9))
    assert rel < 0.05, rel                  # 8-bit symmetric error bound


def test_quantized_detector_forward_and_calibration():
    """quantize=True swaps backbone+FPN convs to int8 PTQ with an
    unchanged param tree; outputs track the f32 model within int8 error
    and calibration freezes per-conv activation scales."""
    m = build_detector(TINY, dtype=jnp.float32)
    mq = build_detector(TINY._replace(quantize=True), dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).uniform(
        -2, 2, (1, 64, 64, 3)).astype(np.float32))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    vq = jax.jit(mq.init)(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v['params']) == \
        jax.tree_util.tree_structure(vq['params'])
    shared = {'params': v['params'], 'batch_stats': v['batch_stats'],
              'quant_stats': vq['quant_stats']}
    out = m.apply(v, x)
    outq = mq.apply(shared, x)
    for lvl in range(len(out['s0'][0])):
        a = np.asarray(out['s0'][0][lvl])
        b = np.asarray(outq['s0'][0][lvl])
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert rel < 0.05, (lvl, rel)

    vcal = calibrate(mq, shared, [x])
    scales = jax.tree_util.tree_leaves(vcal['quant_stats'])
    assert scales and all(float(s) > 0 for s in scales)
    outc = mq.apply(vcal, x)
    a = np.asarray(out['s0'][0][0])
    c = np.asarray(outc['s0'][0][0])
    assert np.abs(a - c).max() / (np.abs(a).max() + 1e-9) < 0.05


def test_static_scale_matches_dynamic_after_calibration():
    """quantize='static' (serving: skip the per-conv max|x| pass) is
    bit-identical to the dynamic path once calibrated on the same data
    — the recorded absmax equals the dynamic reduction's value."""
    mq = build_detector(TINY._replace(quantize=True), dtype=jnp.float32)
    ms = build_detector(TINY._replace(quantize='static'),
                        dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).uniform(
        -2, 2, (1, 64, 64, 3)).astype(np.float32))
    vq = jax.jit(mq.init)(jax.random.PRNGKey(0), x)
    vq = calibrate(mq, vq, [x])
    out_d = mq.apply(vq, x)
    out_s = ms.apply(vq, x)
    for lvl in range(len(out_d['s0'][0])):
        np.testing.assert_array_equal(np.asarray(out_d['s0'][0][lvl]),
                                      np.asarray(out_s['s0'][0][lvl]))


def test_quantized_eval_loop_runs(tmp_path):
    """The int8 serving path end-to-end: calibrate on a batch, run
    evaluate_dataset (the tools/test.py core) on a quantized model."""
    from r3det_tpu.utils.eval_loop import evaluate_dataset

    class _OneImage:
        def __len__(self):
            return 2

        def get_sample(self, i):
            r = np.random.RandomState(i)
            return {'img': r.uniform(0, 255, (64, 64, 3)).astype(
                np.float32), 'scale_factor': np.ones(4, np.float32)}

    cfg = TINY._replace(quantize=True)
    mq = build_detector(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vq = jax.jit(mq.init)(jax.random.PRNGKey(0), x)
    vq = calibrate(mq, vq, [jnp.asarray(np.random.RandomState(9).uniform(
        -2, 2, (2, 64, 64, 3)).astype(np.float32))])
    results = evaluate_dataset(vq, mq, cfg, _OneImage(), img_size=64,
                               batch_size=2)
    assert len(results) == 2
    assert all(len(per) == cfg.num_classes for per in results)


def test_qconv_bf16_output_matches_int32_path():
    """bf16 models emit the conv result directly as bf16 (in-register
    int32 accumulation, models/quant.py) — must agree with the exact
    s32 path within bf16 rounding."""
    r = np.random.RandomState(1)
    x = jnp.asarray(r.normal(0, 1, (2, 16, 16, 32)).astype(np.float32))
    q32 = QConv(64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                dtype=jnp.float32)
    qbf = QConv(64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                dtype=jnp.bfloat16)
    v = q32.init(jax.random.PRNGKey(0), x)
    y32 = q32.apply(v, x)
    ybf = qbf.apply(v, x.astype(jnp.bfloat16)).astype(jnp.float32)
    rel = float(jnp.abs(y32 - ybf).max() / (jnp.abs(y32).max() + 1e-9))
    assert rel < 0.02, rel                  # bf16 rounding only


def test_frm_convs_quantize_with_backbone_flag():
    """DetectorConfig.quantize reaches the FRM branch convs (round-3):
    the quant_stats collection grows frm conv scales and the quantized
    forward tracks the float model."""
    cfg = TINY._replace(quantize=True)
    m = build_detector(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    frm_qs = v['quant_stats']['frm_0']
    assert set(frm_qs) == {'conv_1_5', 'conv_5_1', 'conv_1_1'}, frm_qs


def test_int8_act_storage_matches_static_path():
    """int8 activation storage (Bottleneck int8_act): block inputs are
    quantized once and shared by conv1/downsample/residual. conv1's
    math is unchanged (the block-level in_absmax records the same
    max|x| its act_absmax would); only the residual picks up int8
    noise, so outputs track the plain static path within int8 error."""
    cfg = TINY._replace(quantize='static', backbone_depth=14)
    m = build_detector(cfg, dtype=jnp.float32)
    m8 = build_detector(cfg, dtype=jnp.float32, int8_act=True)
    x = jnp.asarray(np.random.RandomState(2).uniform(
        -2, 2, (1, 64, 64, 3)).astype(np.float32))
    v8 = jax.jit(m8.init)(jax.random.PRNGKey(0), x)
    v8 = calibrate(m8, v8, [x])
    # the block-level input stats exist and were recorded
    qs = v8['quant_stats']['backbone']
    inabs = [qs[k]['in_absmax'] for k in qs if k.startswith('layer')]
    assert inabs and all(float(s) > 0 for s in inabs)
    # plain static model shares params; calibrate it independently
    v = {k: v8[k] for k in ('params', 'batch_stats')}
    v['quant_stats'] = jax.jit(m.init)(
        jax.random.PRNGKey(0), x)['quant_stats']
    v = calibrate(m, v, [x])
    out = m.apply(v, x)
    out8 = m8.apply(v8, x)
    for lvl in range(len(out['s0'][0])):
        a = np.asarray(out['s0'][0][lvl])
        b = np.asarray(out8['s0'][0][lvl])
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert rel < 0.05, (lvl, rel)


def test_qconv_prequantized_input_bit_identical():
    """QConv fed a pre-quantized (int8, scale) pair reproduces the
    internal quantize-then-conv path bit-for-bit."""
    r = np.random.RandomState(3)
    x = jnp.asarray(r.normal(0, 1, (2, 8, 8, 16)).astype(np.float32))
    qconv = QConv(32, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                  dtype=jnp.float32)
    v = qconv.init(jax.random.PRNGKey(0), x)
    y = qconv.apply(v, x)
    ascale = jnp.max(jnp.abs(x)) / 127.0
    xi = jnp.clip(jnp.round(x / ascale), -127, 127).astype(jnp.int8)
    y2 = qconv.apply(v, (xi, ascale))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
