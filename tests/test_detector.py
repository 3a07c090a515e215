"""End-to-end model tests: forward shapes, loss finiteness, grad flow,
overfit trend, and inference path on tiny inputs."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r3det_tpu.models.detectors import (
    DetectorConfig, R3DET_R50_V1, RRETINANET_OBB_V3, StageTrainCfg,
    build_detector, detector_loss, detector_predict, level_anchors,
    filter_bboxes)
from r3det_tpu.models.detectors import TestCfg as InferCfg

RNG = np.random.RandomState(0)

TINY = DetectorConfig(
    num_classes=3, stacked_convs=1, feat_channels=32, backbone_depth=10,
    s0_train=StageTrainCfg(0.5, 0.4, 0.0, 'v1'),
    test=InferCfg(nms_pre=64, max_per_img=16))
TINY_R3DET = TINY._replace(
    num_refine_stages=1, stage_loss_weights=(1.0,),
    sr_train=(StageTrainCfg(0.6, 0.5, 0.0, None),))

FEATMAP_SIZES = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]


def make_batch(b=2, size=64, g=4):
    images = RNG.uniform(-1, 1, (b, size, size, 3)).astype(np.float32)
    gt = np.zeros((b, g, 5), np.float32)
    labels = np.zeros((b, g), np.int32)
    mask = np.zeros((b, g), bool)
    for i in range(b):
        n = RNG.randint(1, g + 1)
        gt[i, :n] = np.stack([
            RNG.uniform(10, size - 10, n), RNG.uniform(10, size - 10, n),
            RNG.uniform(8, 24, n), RNG.uniform(6, 16, n),
            RNG.uniform(-math.pi / 2 + 0.05, -0.05, n)], -1)
        labels[i, :n] = RNG.randint(0, 3, n)
        mask[i, :n] = True
    return (jnp.asarray(images), jnp.asarray(gt), jnp.asarray(labels),
            jnp.asarray(mask))


def init_model(cfg, images, dtype=jnp.float32):
    model = build_detector(cfg, dtype=dtype)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    return model, variables


# One forward per model family, shared by every shape/predict test below
# (compiles dominate on a 1-CPU host).

@pytest.fixture(scope='module')
def batch():
    return make_batch()


@pytest.fixture(scope='module')
def tiny_fwd(batch):
    images = batch[0]
    model, variables = init_model(TINY, images)
    out = jax.jit(model.apply)(variables, images)
    return model, variables, out


@pytest.fixture(scope='module')
def r3det_fwd(batch):
    images = batch[0]
    model, variables = init_model(TINY_R3DET, images)
    out = jax.jit(model.apply)(variables, images)
    return model, variables, out


def test_rretinanet_forward_shapes(tiny_fwd):
    out = tiny_fwd[2]
    cls_scores, bbox_preds = out['s0']
    assert len(cls_scores) == 5
    sizes = [8, 4, 2, 1, 1]
    for cls, reg, s in zip(cls_scores, bbox_preds, sizes):
        assert cls.shape == (2, s, s, 9 * 3)
        assert reg.shape == (2, s, s, 9 * 5)


def test_rretinanet_loss_finite_and_grads_flow(batch, tiny_fwd):
    images, gt, labels, mask = batch
    model, variables, _ = tiny_fwd

    def loss_fn(params):
        out = model.apply({'params': params,
                           'batch_stats': variables['batch_stats']}, images)
        losses = detector_loss(out, TINY, FEATMAP_SIZES, gt, labels, mask)
        return losses['total'], losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables['params'])
    assert np.isfinite(float(total))
    assert float(losses['s0.loss_cls']) > 0
    # head grads nonzero, frozen stem grads zero
    gflat = jax.tree_util.tree_leaves(grads['bbox_head'])
    assert any(float(jnp.abs(g).max()) > 0 for g in gflat)
    stem = jax.tree_util.tree_leaves(grads['backbone']['conv1'])
    assert all(float(jnp.abs(g).max()) == 0 for g in stem)
    # non-frozen backbone stages receive gradient
    l3 = jax.tree_util.tree_leaves(grads['backbone']['layer3_0'])
    assert any(float(jnp.abs(g).max()) > 0 for g in l3)


def test_r3det_forward_and_loss(batch, r3det_fwd):
    _, gt, labels, mask = batch
    out = r3det_fwd[2]
    assert len(out['sr']) == 1 and len(out['rois']) == 1
    # rois per level: (B, H*W, 5)
    assert out['rois'][0][0].shape == (2, 64, 5)
    losses = jax.jit(lambda o, g, l, m: detector_loss(
        o, TINY_R3DET, FEATMAP_SIZES, g, l, m))(out, gt, labels, mask)
    for k in ('s0.loss_cls', 's0.loss_bbox', 'sr0.loss_cls', 'sr0.loss_bbox'):
        assert k in losses and np.isfinite(float(losses[k]))


@pytest.mark.slow
def test_loss_decreases_overfit():
    """A few optimizer steps on one fixed batch should reduce the loss.

    Uses the production optimizer (grad-clip 35 + warmup): raw un-clipped
    SGD at high lr diverges on random init (regression grads explode) —
    that behavior matches the reference's reliance on mmcv grad clipping.
    """
    import optax
    from r3det_tpu.parallel.mesh import make_lr_schedule, make_optimizer
    images, gt, labels, mask = make_batch(b=1)
    model, variables = init_model(TINY, images)
    featmap_sizes = FEATMAP_SIZES
    tx = make_optimizer(make_lr_schedule(base_lr=5e-3, warmup_iters=2))
    params = variables['params']
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({'params': p,
                               'batch_stats': variables['batch_stats']},
                              images)
            return detector_loss(out, TINY, featmap_sizes, gt, labels,
                                 mask)['total']
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    # random-init focal loss moves slowly; assert a consistent downward
    # trend rather than a fixed percentage (catches sign/NaN bugs)
    assert losses[-1] < losses[0], losses
    assert min(losses) == losses[-1] or losses[-1] < losses[0] * 0.995, losses


def test_detector_predict_shapes(tiny_fwd):
    out = tiny_fwd[2]
    dets, labels, num = jax.jit(lambda o: detector_predict(
        o, TINY, FEATMAP_SIZES, img_shape=(64, 64)))(out)
    assert dets.shape == (2, 16, 6)
    assert labels.shape == (2, 16)
    n = np.asarray(num)
    assert np.all(n >= 0) and np.all(n <= 16)


def test_r3det_predict_uses_refine_head(r3det_fwd):
    out = r3det_fwd[2]
    dets, labels, num = jax.jit(lambda o: detector_predict(
        o, TINY_R3DET, FEATMAP_SIZES))(out)
    assert dets.shape == (2, 16, 6)


def test_filter_bboxes_picks_best_anchor():
    cfg = TINY
    coder = cfg.coder()
    anchors = level_anchors(cfg, [(2, 2)])
    b, hw, a, c = 1, 4, cfg.num_anchors, cfg.num_classes
    cls = np.full((b, 2, 2, a * c), -5.0, np.float32)
    # position 0: anchor 3 has the top score
    cls[0, 0, 0, 3 * c + 1] = 3.0
    reg = np.zeros((b, 2, 2, a * 5), np.float32)
    rois = filter_bboxes([jnp.asarray(cls)], [jnp.asarray(reg)],
                         anchors, coder, cfg)
    got = np.asarray(rois[0][0, 0])
    want = np.asarray(anchors[0].reshape(hw, a, 5)[0, 3])
    np.testing.assert_allclose(got, want, atol=1e-5)   # zero deltas => anchor
