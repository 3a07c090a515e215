#!/usr/bin/env python
"""Train a rotated detector from a config file.

Re-provides the reference's tools/train.py surface (config file +
--cfg-options + --work-dir + --resume-from) on the JAX/TPU stack:
data-parallel over every local chip via a 1-D mesh, orbax checkpoints,
text logging. Multi-host: run the same command per host after
`jax.distributed.initialize` env wiring (no launcher script needed).

Also supports --synthetic for data-free smoke/perf runs.
"""
import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Train a rotated detector')
    p.add_argument('config', help='config file path')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--resume-from', default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--max-steps', type=int, default=None,
                   help='override total steps (default: epochs * len(loader))')
    p.add_argument('--synthetic', action='store_true',
                   help='train on synthetic data (no dataset needed)')
    p.add_argument('--img-size', type=int, default=None,
                   help='override the pipeline RResize scale (default: '
                        'the config pipeline\'s img_scale, else 1024)')
    p.add_argument('--log-interval', type=int, default=50)
    p.add_argument('--pretrained-backbone', default=None,
                   help='path to a torchvision resnet .pth/.npz state dict')
    p.add_argument('--profile', default=None, metavar='DIR',
                   help='capture a jax.profiler trace of steps 10-15 into DIR')
    p.add_argument('--cfg-options', nargs='+', default=[],
                   help='key=value dotted-path config overrides')
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    # Multi-host bring-up: the reference's init_dist/NCCL launcher maps to
    # jax.distributed.initialize(), which self-configures on TPU pods and
    # reads JAX_COORDINATOR_ADDRESS/JAX_PROCESS_ID/JAX_NUM_PROCESSES
    # elsewhere. Single-host runs skip it.
    if os.environ.get('JAX_NUM_PROCESSES') or \
            os.environ.get('MEGASCALE_COORDINATOR_ADDRESS'):
        jax.distributed.initialize()

    from r3det_tpu.utils.config import Config
    from r3det_tpu.utils.builder import build_from_config
    from r3det_tpu.utils.checkpoint import (load_pretrained_backbone,
                                            restore_checkpoint,
                                            save_checkpoint)
    from r3det_tpu.parallel.mesh import (init_train_state, make_lr_schedule,
                                         make_mesh, make_optimizer,
                                         make_train_step, replicate,
                                         shard_batch)

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(dict(kv.split('=', 1) for kv in args.cfg_options))
    work_dir = args.work_dir or osp.join(
        'work_dirs', osp.splitext(osp.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)

    model, det_cfg = build_from_config(cfg)
    print(f'model: {type(model).__name__}  angle={det_cfg.angle_version}  '
          f'refine_stages={det_cfg.num_refine_stages}')
    print(f'devices: {jax.devices()}')

    # ---- data -------------------------------------------------------
    batch_size = cfg.get('data', Config({})).get('samples_per_gpu', 2) * \
        jax.local_device_count()
    # image size drives BOTH the pipeline resize and the anchor grid.
    # Default: honor the config pipeline's RResize img_scale verbatim
    # ((w, h), mmcv convention — possibly non-square) and pad every
    # sample to its divisor-rounded canvas so jit shapes stay static.
    # An explicit --img-size rewrites the pipeline scale to a square.
    cfg_scale = None                          # (w, h)
    if cfg.get('data') and cfg.data.get('train') and \
            cfg.data.train.get('pipeline'):
        for s in cfg.data.train.pipeline:
            if s.get('type') == 'RResize' and s.get('img_scale'):
                sc = s['img_scale']
                cfg_scale = (sc, sc) if isinstance(sc, int) else tuple(sc)
    if args.img_size:
        size_hw = (args.img_size, args.img_size)
    elif cfg_scale:
        size_hw = (cfg_scale[1], cfg_scale[0])
    else:
        size_hw = (1024, 1024)
    canvas = tuple(-(-d // 32) * 32 for d in size_hw)     # (h, w)
    if args.synthetic:
        from r3det_tpu.datasets.loader import SyntheticDetData
        loader = SyntheticDetData(batch_size=batch_size, size=max(canvas),
                                  num_classes=det_cfg.num_classes,
                                  version=det_cfg.angle_version,
                                  seed=args.seed)
        canvas = (max(canvas), max(canvas))   # synthetic data is square
        iters_per_epoch = 100
    else:
        from r3det_tpu.datasets.dota import DOTADataset
        from r3det_tpu.datasets.loader import DetLoader
        from r3det_tpu.datasets.transforms import TrainPipeline
        train_d = cfg.data.train
        ds = DOTADataset(train_d.ann_file,
                         train_d.get('img_prefix'),
                         version=det_cfg.angle_version,
                         classes=train_d.get('classes'))
        pipeline_cfg = [dict(s) for s in train_d.get('pipeline') or [
            dict(type='RResize', img_scale=(size_hw[1], size_hw[0])),
            dict(type='RRandomFlip', flip_ratio=0.5),
            dict(type='Normalize'), dict(type='Pad', size_divisor=32)]]
        if args.img_size:
            for s in pipeline_cfg:
                if s.get('type') == 'RResize':
                    s['img_scale'] = (args.img_size, args.img_size)
        pipeline = TrainPipeline.from_config(
            pipeline_cfg, version=det_cfg.angle_version, seed=args.seed)
        pipeline.pad_to(*canvas)              # static jit shapes
        loader = DetLoader(ds, pipeline, batch_size=batch_size,
                           seed=args.seed,
                           process_index=jax.process_index(),
                           process_count=jax.process_count())
        iters_per_epoch = len(loader)

    max_epochs = cfg.get('runner', Config({})).get('max_epochs', 12)
    total_steps = args.max_steps or max_epochs * iters_per_epoch
    opt_cfg = cfg.get('optimizer', Config({}))
    lr_cfg = cfg.get('lr_config', Config({}))
    lr_schedule = make_lr_schedule(
        base_lr=opt_cfg.get('lr', 2.5e-3),
        warmup_iters=lr_cfg.get('warmup_iters', 500),
        warmup_ratio=lr_cfg.get('warmup_ratio', 1.0 / 3),
        step_epochs=lr_cfg.get('step', [8, 11]),
        iters_per_epoch=iters_per_epoch)
    tx = make_optimizer(
        lr_schedule, momentum=opt_cfg.get('momentum', 0.9),
        weight_decay=opt_cfg.get('weight_decay', 1e-4),
        clip_norm=cfg.get('optimizer_config', Config({})).get(
            'grad_clip', Config({})).get('max_norm', 35.0))

    # ---- state ------------------------------------------------------
    mesh = make_mesh()
    sample = jnp.zeros((1,) + canvas + (3,), jnp.float32)
    state = init_train_state(model, jax.random.PRNGKey(args.seed), sample,
                             tx=tx)
    if args.pretrained_backbone:
        sd = _load_state_dict(args.pretrained_backbone)
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        variables = load_pretrained_backbone(variables, sd,
                                             det_cfg.backbone_depth)
        state = state.replace(params=variables['params'],
                              batch_stats=variables['batch_stats'])
        print(f'loaded pretrained backbone from {args.pretrained_backbone}')
    if args.resume_from:
        state = restore_checkpoint(args.resume_from, state)
        print(f'resumed from {args.resume_from} @ step {int(state.step)}')
    state = replicate(state, mesh)

    featmap_sizes = tuple((canvas[0] // s, canvas[1] // s)
                          for s in det_cfg.strides)
    step_fn = make_train_step(model, det_cfg, featmap_sizes, mesh)

    # ---- eval hook (reference EvalHook: evaluation.interval epochs) --
    eval_cfg = cfg.get('evaluation', Config({}))
    eval_interval = eval_cfg.get('interval', 0) * iters_per_epoch \
        if not args.synthetic and cfg.get('data') and \
        cfg.data.get('val') else 0
    val_ds = None

    def run_eval(state):
        nonlocal val_ds
        from r3det_tpu.datasets.dota import DOTADataset
        from r3det_tpu.utils.eval_loop import evaluate_dataset
        if val_ds is None:
            val_d = cfg.data.val
            val_ds = DOTADataset(val_d.ann_file, val_d.get('img_prefix'),
                                 version=det_cfg.angle_version,
                                 filter_empty=False,
                                 classes=val_d.get('classes'))
        variables = {'params': jax.device_get(state.params),
                     'batch_stats': jax.device_get(state.batch_stats)}
        results = evaluate_dataset(variables, model, det_cfg, val_ds,
                                   img_size=canvas, batch_size=batch_size,
                                   mesh=mesh)
        return val_ds.evaluate(results)

    # ---- loop -------------------------------------------------------
    log_path = osp.join(work_dir, 'train_log.jsonl')
    ckpt_interval = cfg.get('checkpoint_config', Config({})).get(
        'interval', 12) * iters_per_epoch
    t0 = time.time()
    step_i = int(jax.device_get(state.step))
    data_iter = iter(loader)
    with open(log_path, 'a') as logf:
        while step_i < total_steps:
            try:
                batch = next(data_iter)
            except StopIteration:
                data_iter = iter(loader)
                batch = next(data_iter)
            batch = shard_batch(batch, mesh)
            if args.profile and step_i == 10:
                jax.profiler.start_trace(args.profile)
            state, losses = step_fn(state, batch)
            step_i += 1
            if args.profile and step_i == 15:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                print(f'profiler trace -> {args.profile}')
            if step_i % args.log_interval == 0 or step_i == total_steps:
                losses = {k: float(v) for k, v in
                          jax.device_get(losses).items()}
                dt = time.time() - t0
                ips = args.log_interval * batch['image'].shape[0] / dt
                rec = dict(step=step_i, imgs_per_sec=round(ips, 2),
                           lr=float(lr_schedule(step_i)), **losses)
                print('  '.join(f'{k}={v:.4f}' if isinstance(v, float)
                                else f'{k}={v}' for k, v in rec.items()))
                logf.write(json.dumps(rec) + '\n')
                logf.flush()
                t0 = time.time()
            if step_i % max(ckpt_interval, 1) == 0 or step_i == total_steps:
                path = save_checkpoint(osp.join(work_dir, 'ckpt'), step_i,
                                       jax.device_get(state))
                print(f'checkpoint -> {path}')
            if eval_interval and (step_i % eval_interval == 0 or
                                  step_i == total_steps):
                metrics = run_eval(state)
                rec = dict(step=step_i, mode='val',
                           **{k: float(v) for k, v in metrics.items()})
                print(f'val mAP @ step {step_i}: '
                      f'{metrics.get("mAP", float("nan")):.4f}')
                logf.write(json.dumps(rec) + '\n')
                logf.flush()


def _load_state_dict(path):
    if path.endswith('.npz'):
        return dict(np.load(path))
    import torch
    sd = torch.load(path, map_location='cpu')
    return sd.get('state_dict', sd)


if __name__ == '__main__':
    main()
