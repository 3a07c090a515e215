"""CLI tool smoke tests (config printing, log analysis, schedules).

Reference counterparts: tools/misc/print_config.py,
tools/analysis_tools/analyze_logs.py, configs/_base_/schedules/*.
"""
import json
import os.path as osp
import subprocess
import sys

import pytest

REPO = osp.abspath(osp.join(osp.dirname(__file__), '..'))


def run_tool(args):
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, cwd=REPO,
                          env={**__import__('os').environ,
                               'JAX_PLATFORMS': 'cpu'})


def test_print_config_resolves_bases():
    r = run_tool(['tools/misc/print_config.py',
                  'configs/r3det/r3det_r50_fpn_1x_dota_v1.py'])
    assert r.returncode == 0, r.stderr
    assert 'R3Det' in r.stdout
    assert 'optimizer' in r.stdout          # pulled in via _base_ schedule


def test_print_config_cfg_options_override():
    r = run_tool(['tools/misc/print_config.py',
                  'configs/r3det/r3det_r50_fpn_1x_dota_v1.py',
                  '--cfg-options', 'optimizer.lr=0.5'])
    assert r.returncode == 0, r.stderr
    assert '0.5' in r.stdout


@pytest.mark.parametrize('sched', ['schedule_1x', 'schedule_3x',
                                   'schedule_40e'])
def test_schedule_bases_load(sched):
    from r3det_tpu.utils.config import Config
    cfg = Config.fromfile(
        osp.join(REPO, f'configs/_base_/schedules/{sched}.py'))
    assert cfg.optimizer['lr'] == 2.5e-3
    assert cfg.lr_config['warmup_iters'] == 500
    assert cfg.evaluation['metric'] == 'mAP'
    steps = {'schedule_1x': [8, 11], 'schedule_3x': [24, 33],
             'schedule_40e': [24, 32, 38]}[sched]
    assert cfg.lr_config['step'] == steps


def test_analyze_logs_time_stats(tmp_path):
    log = tmp_path / 'train_log.jsonl'
    recs = [dict(step=i, imgs_per_sec=30 + i, lr=1e-3,
                 **{'s0.loss_cls': 1.0 / (i + 1)}) for i in range(1, 6)]
    log.write_text('\n'.join(json.dumps(r) for r in recs) + '\n')
    r = run_tool(['tools/analysis_tools/analyze_logs.py',
                  'cal_train_time', str(log)])
    assert r.returncode == 0, r.stderr
    assert 'img' in r.stdout.lower() or 'time' in r.stdout.lower()


def test_publish_checkpoint_strips_optimizer(tmp_path):
    import numpy as np
    from r3det_tpu.utils.checkpoint import (publish_checkpoint,
                                            save_checkpoint)

    class FakeState:
        params = {'w': np.ones((2, 2), np.float32)}
        batch_stats = {'m': np.zeros((2,), np.float32)}
        opt_state = {'momentum': np.ones((2, 2), np.float32)}
        step = 7
    path = save_checkpoint(str(tmp_path / 'ckpt'), 7, FakeState())
    out = publish_checkpoint(path, str(tmp_path / 'pub'))
    assert osp.exists(out)
    import orbax.checkpoint as ocp
    payload = ocp.PyTreeCheckpointer().restore(osp.abspath(out))
    assert 'params' in payload
    assert 'opt_state' not in payload


def test_builder_maps_framework_test_cfg_extensions(tmp_path):
    cfg_file = tmp_path / 'c.py'
    cfg_file.write_text(
        "_base_ = ['%s/configs/r3det/r3det_r50_fpn_1x_dota_v1.py']\n"
        "test_cfg = dict(nms_candidates=4096, approx_topk=True)\n" % REPO)
    from r3det_tpu.utils.builder import build_from_config
    from r3det_tpu.utils.config import Config
    model, det_cfg = build_from_config(Config.fromfile(str(cfg_file)))
    assert det_cfg.test.nms_candidates == 4096
    assert det_cfg.test.approx_topk is True


def test_builder_maps_kernel_flags(tmp_path):
    # serving Pallas-kernel flags are config-reachable (model dict or
    # test_cfg, utils/builder.py _KERNEL_FLAG_KEYS); FRM-only keys are
    # dropped for RRetinaNet models, which have no FRM module
    cfg_file = tmp_path / 'k.py'
    cfg_file.write_text(
        "_base_ = ['%s/configs/r3det/r3det_r50_fpn_1x_dota_v1.py']\n"
        "model = dict(frm_sample_kernel=True, stem_pool_kernel=True)\n"
        "test_cfg = dict(stem_fused_kernel=True)\n" % REPO)
    from r3det_tpu.utils.builder import build_from_config
    from r3det_tpu.utils.config import Config
    model, det_cfg = build_from_config(Config.fromfile(str(cfg_file)))
    assert model.frm_sample_kernel is True
    assert model.stem_pool_kernel is True
    assert model.stem_fused_kernel is True
    assert model.fused_blocks is False

    rr_file = tmp_path / 'krr.py'
    rr_file.write_text(
        "_base_ = ['%s/configs/rretinanet/"
        "rretinanet_obb_r50_fpn_1x_dota_v1.py']\n"
        "model = dict(frm_sample_kernel=True, fused_blocks=True)\n" % REPO)
    model, det_cfg = build_from_config(Config.fromfile(str(rr_file)))
    assert det_cfg.num_refine_stages == 0
    assert not hasattr(model, 'frm_sample_kernel')
    assert model.fused_blocks is True


def test_builder_maps_quantize_flags_and_warns_on_sampler(tmp_path):
    cfg_file = tmp_path / 'q.py'
    cfg_file.write_text(
        "_base_ = ['%s/configs/r3det/r3det_r50_fpn_1x_dota_v1.py']\n"
        "model = dict(quantize_int8='static', quantize_head_int8=True)\n"
        % REPO)
    from r3det_tpu.utils.builder import build_from_config
    from r3det_tpu.utils.config import Config
    model, det_cfg = build_from_config(Config.fromfile(str(cfg_file)))
    assert det_cfg.quantize == 'static'
    assert det_cfg.quantize_head is True

    import warnings as _w
    from r3det_tpu.utils.builder import detector_config_from_dict
    # FocalLoss + sampler: inactive, reference semantics
    # (rotate_anchor_head.py:62-64,81-86) — warn, no SamplerCfg
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter('always')
        cfg = detector_config_from_dict(
            dict(type='RRetinaNet', bbox_head=dict()),
            train_cfg=dict(sampler=dict(type='RRandomSampler', num=256)))
    assert any('sampler' in str(w.message) for w in rec)
    assert cfg.s0_train.sampler is None
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter('always')
        detector_config_from_dict(
            dict(type='RRetinaNet', bbox_head=dict()),
            train_cfg=dict(sampler=dict(type='PseudoSampler')))
    assert not any('sampler' in str(w.message) for w in rec)


def test_builder_wires_random_sampler_with_ce_loss():
    """The RRandomSampler config route (rotate_random_sampler.py:7) is
    live when the cls loss permits sampling."""
    from r3det_tpu.core.samplers import SamplerCfg
    from r3det_tpu.utils.builder import detector_config_from_dict
    cfg = detector_config_from_dict(
        dict(type='RRetinaNet',
             bbox_head=dict(loss_cls=dict(type='CrossEntropyLoss',
                                          use_sigmoid=True))),
        train_cfg=dict(sampler=dict(type='RRandomSampler', num=128,
                                    pos_fraction=0.25, neg_pos_ub=3)))
    assert cfg.loss_cls_type == 'bce'
    assert cfg.s0_train.sampler == SamplerCfg(128, 0.25, 3.0)

    # R3Det: per-stage sampler dicts, top-level key warns as dead config
    import warnings as _w
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter('always')
        cfg3 = detector_config_from_dict(
            dict(type='R3Det', num_refine_stages=1,
                 bbox_head=dict(loss_cls=dict(type='CrossEntropyLoss',
                                              use_sigmoid=True))),
            train_cfg=dict(
                s0=dict(sampler=dict(type='RRandomSampler', num=64)),
                sr=[dict()],
                sampler=dict(type='RRandomSampler', num=99)))
    assert cfg3.s0_train.sampler == SamplerCfg(64, 0.5, -1.0)
    assert cfg3.sr_train[0].sampler is None
    assert any('TOP level' in str(w.message) for w in rec)


def test_sampler_loss_path():
    """End-to-end loss with a sampler config: detector_loss runs the
    RRandomSampler route (CE cls loss), is finite, and depends on rng."""
    import jax
    import jax.numpy as jnp
    from r3det_tpu.models.detectors import build_detector, detector_loss
    from r3det_tpu.utils.builder import detector_config_from_dict
    cfg = detector_config_from_dict(
        dict(type='RRetinaNet',
             bbox_head=dict(num_classes=3, stacked_convs=1,
                            feat_channels=32,
                            anchor_generator=dict(strides=(8, 16, 32,
                                                           64, 128)),
                            loss_cls=dict(type='CrossEntropyLoss',
                                          use_sigmoid=True))),
        train_cfg=dict(sampler=dict(type='RRandomSampler', num=32,
                                    pos_fraction=0.5)))
    model = build_detector(cfg, dtype=jnp.float32)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    sizes = tuple(c.shape[1:3] for c in out['s0'][0])
    gt = jnp.asarray([[[32., 32., 16., 8., -0.3]]])
    labels = jnp.asarray([[1]], jnp.int32)
    mask = jnp.ones((1, 1), bool)
    l1 = detector_loss(out, cfg, sizes, gt, labels, mask,
                       rng=jax.random.PRNGKey(1))
    l2 = detector_loss(out, cfg, sizes, gt, labels, mask,
                       rng=jax.random.PRNGKey(2))
    assert all(jnp.isfinite(v) for v in l1.values())
    # different rng -> different sampled negatives -> different cls loss
    assert float(l1['s0.loss_cls']) != float(l2['s0.loss_cls'])
    # rng defaults when omitted (fixed key) rather than erroring
    l3 = detector_loss(out, cfg, sizes, gt, labels, mask)
    assert all(jnp.isfinite(v) for v in l3.values())
