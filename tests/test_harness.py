"""Training-harness tests: schedules, optimizer, checkpointing, config."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_lr_schedule_warmup_and_steps():
    from r3det_tpu.parallel.mesh import make_lr_schedule
    sch = make_lr_schedule(base_lr=2.5e-3, warmup_iters=500,
                           warmup_ratio=1 / 3, step_epochs=(8, 11),
                           iters_per_epoch=100)
    assert float(sch(0)) == pytest.approx(2.5e-3 / 3)
    assert float(sch(250)) == pytest.approx(2.5e-3 * (1 / 3 + 1 / 3), rel=1e-3)
    assert float(sch(600)) == pytest.approx(2.5e-3)
    assert float(sch(850)) == pytest.approx(2.5e-4, rel=1e-5)
    assert float(sch(1150)) == pytest.approx(2.5e-5, rel=1e-5)


def test_optimizer_clips_gradients():
    import optax
    from r3det_tpu.parallel.mesh import make_optimizer
    tx = make_optimizer(lambda s: 1.0, momentum=0.0, weight_decay=0.0,
                        clip_norm=1.0)
    params = {'w': jnp.zeros(3)}
    grads = {'w': jnp.asarray([30., 40., 0.])}       # norm 50 -> scaled to 1
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates['w']),
                               [-0.6, -0.8, 0.0], atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from r3det_tpu.parallel.mesh import init_train_state
    from r3det_tpu.utils.checkpoint import (restore_checkpoint,
                                            save_checkpoint)
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(x)

    m = M()
    state = init_train_state(m, jax.random.PRNGKey(0), jnp.ones((1, 3)))
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    path = save_checkpoint(str(tmp_path), 7, state)
    fresh = init_train_state(m, jax.random.PRNGKey(1), jnp.ones((1, 3)))
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 7
    np.testing.assert_allclose(
        np.asarray(restored.params['Dense_0']['kernel']),
        np.asarray(state.params['Dense_0']['kernel']))


def test_torch_resnet_converter_shapes():
    from r3det_tpu.utils.checkpoint import convert_torch_resnet
    rng = np.random.RandomState(0)
    sd = {'conv1.weight': rng.normal(size=(64, 3, 7, 7)).astype(np.float32),
          'bn1.weight': np.ones(64, np.float32),
          'bn1.bias': np.zeros(64, np.float32),
          'bn1.running_mean': np.zeros(64, np.float32),
          'bn1.running_var': np.ones(64, np.float32)}
    widths = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
    blocks = (3, 4, 6, 3)
    for s, n in enumerate(blocks):
        w, out = widths[s]
        cin = 64 if s == 0 else widths[s - 1][1]
        for b in range(n):
            pre = f'layer{s + 1}.{b}'
            c1_in = cin if b == 0 else out
            sd[f'{pre}.conv1.weight'] = np.zeros((w, c1_in, 1, 1), np.float32)
            sd[f'{pre}.conv2.weight'] = np.zeros((w, w, 3, 3), np.float32)
            sd[f'{pre}.conv3.weight'] = np.zeros((out, w, 1, 1), np.float32)
            for i in (1, 2, 3):
                cc = w if i < 3 else out
                for suffix, val in (('weight', 1.), ('bias', 0.),
                                    ('running_mean', 0.), ('running_var', 1.)):
                    sd[f'{pre}.bn{i}.{suffix}'] = np.full(cc, val, np.float32)
            if b == 0:
                sd[f'{pre}.downsample.0.weight'] = np.zeros(
                    (out, c1_in, 1, 1), np.float32)
                for suffix, val in (('weight', 1.), ('bias', 0.),
                                    ('running_mean', 0.), ('running_var', 1.)):
                    sd[f'{pre}.downsample.1.{suffix}'] = np.full(
                        out, val, np.float32)
    params, stats = convert_torch_resnet(sd, 50, stem_space_to_depth=True)
    assert params['conv1']['kernel'].shape == (4, 4, 12, 64)
    assert params['layer1_0']['conv2']['kernel'].shape == (3, 3, 64, 64)
    assert params['layer4_0']['downsample_conv']['kernel'].shape == \
        (1, 1, 1024, 2048)
    assert stats['layer1_0']['bn3']['var'].shape == (256,)


def test_stem_fold_exact():
    """Folded stem == 7x7/s2 conv, bit-level math identity (fp64 brute)."""
    from r3det_tpu.models.resnet import fold_stem_kernel
    rng = np.random.RandomState(1)
    H = 12
    x = rng.normal(size=(H, H, 2))
    w7 = rng.normal(size=(7, 7, 2, 3))

    def ref(i, j):
        s = np.zeros(3)
        for di in range(-3, 4):
            for dj in range(-3, 4):
                yi, xj = 2 * i + di, 2 * j + dj
                if 0 <= yi < H and 0 <= xj < H:
                    s += w7[di + 3, dj + 3].T @ x[yi, xj]
        return s

    wp = fold_stem_kernel(w7)
    xs = x.reshape(H // 2, 2, H // 2, 2, 2).transpose(0, 2, 1, 3, 4)\
        .reshape(H // 2, H // 2, 8)

    def fold(i, j):
        s = np.zeros(3)
        for p in range(4):
            for q in range(4):
                m, n = i + p - 2, j + q - 2
                if 0 <= m < H // 2 and 0 <= n < H // 2:
                    s += wp[p, q].T @ xs[m, n]
        return s

    for i in range(H // 2):
        for j in range(H // 2):
            np.testing.assert_allclose(ref(i, j), fold(i, j), atol=1e-12)


def test_config_delete_and_cli_override(tmp_path):
    from r3det_tpu.utils.config import Config
    base = tmp_path / 'base.py'
    base.write_text("model = dict(a=1, sub=dict(x=1, y=2))\nlr = 0.1\n")
    child = tmp_path / 'child.py'
    child.write_text("_base_ = ['./base.py']\n"
                     "model = dict(sub=dict(y=3))\n")
    cfg = Config.fromfile(str(child))
    assert cfg.model.a == 1 and cfg.model.sub.x == 1 and cfg.model.sub.y == 3
    cfg.merge_from_options({'model.sub.x': '9', 'lr': '0.5'})
    assert cfg.model.sub.x == 9 and cfg.lr == 0.5
