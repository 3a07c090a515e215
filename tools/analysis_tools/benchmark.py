#!/usr/bin/env python
"""Inference / train-step FPS benchmark for a config.

Re-provides the reference's tools/analysis_tools/benchmark.py (2000-iter
FPS loop with device sync). Device sync on this stack = fetching a result
to host, which the loop does every iteration. ``--mode train`` times the
full jitted train step (forward + loss + backward + SGD update) on
synthetic data instead.
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))

import numpy as np


def main():
    p = argparse.ArgumentParser(description='Benchmark inference FPS')
    p.add_argument('config')
    p.add_argument('--img-size', type=int, default=1024)
    p.add_argument('--batch-size', type=int, default=1)
    p.add_argument('--max-iter', type=int, default=200)
    p.add_argument('--warmup', type=int, default=5)
    p.add_argument('--forward-only', action='store_true',
                   help='skip decode+NMS (pure network fwd)')
    p.add_argument('--mode', choices=['infer', 'train'], default='infer')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from r3det_tpu.utils.config import Config
    from r3det_tpu.utils.builder import build_from_config
    from r3det_tpu.models.detectors import detector_predict

    cfg = Config.fromfile(args.config)
    model, det_cfg = build_from_config(cfg)
    size, bs = args.img_size, args.batch_size
    featmap_sizes = tuple((size // s, size // s) for s in det_cfg.strides)
    imgs = [jnp.asarray(np.random.RandomState(i).uniform(
        -2, 2, (bs, size, size, 3)).astype(np.float32)) for i in range(4)]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs[0][:1])

    if args.mode == 'train':
        return bench_train(args, model, det_cfg, featmap_sizes)

    if args.forward_only:
        @jax.jit
        def run(v, x):
            out = model.apply(v, x)
            return sum(l.sum() for l in
                       jax.tree_util.tree_leaves((out['s0'],
                                                  out.get('sr', []))))
    else:
        @jax.jit
        def run(v, x):
            out = model.apply(v, x)
            dets, labels, num = detector_predict(
                out, det_cfg, featmap_sizes, img_shape=(size, size))
            return dets.sum()

    float(np.asarray(run(variables, imgs[0])))   # compile
    for i in range(args.warmup):
        float(np.asarray(run(variables, imgs[i % 4])))
    t0 = time.perf_counter()
    for i in range(args.max_iter):
        float(np.asarray(run(variables, imgs[i % 4])))
    dt = time.perf_counter() - t0
    fps = args.max_iter * bs / dt
    print(f'{fps:.2f} img/s ({dt / args.max_iter * 1e3:.1f} ms/iter, '
          f'batch {bs}, {size}x{size})')


def bench_train(args, model, det_cfg, featmap_sizes):
    """Train-step throughput (fwd + loss + bwd + update) on synthetic
    data — the input side of the 300 patches/s question."""
    import time

    import jax
    from r3det_tpu.datasets.loader import SyntheticDetData
    from r3det_tpu.parallel.mesh import (init_train_state, make_mesh,
                                         make_train_step, replicate,
                                         shard_batch)
    import jax.numpy as jnp

    size, bs = args.img_size, args.batch_size
    data = SyntheticDetData(batch_size=bs, size=size,
                            num_classes=det_cfg.num_classes,
                            version=det_cfg.angle_version)
    mesh = make_mesh()
    state = init_train_state(model, jax.random.PRNGKey(0),
                             jnp.zeros((1, size, size, 3), jnp.float32))
    state = replicate(state, mesh)
    step = make_train_step(model, det_cfg, featmap_sizes, mesh)
    batches = [shard_batch(data.batch(), mesh) for _ in range(4)]

    state, losses = step(state, batches[0])              # compile
    print('loss after compile:', float(losses['total']))
    for i in range(args.warmup):
        state, losses = step(state, batches[i % 4])
        float(losses['total'])
    t0 = time.perf_counter()
    for i in range(args.max_iter):
        state, losses = step(state, batches[i % 4])
        float(losses['total'])                           # host sync
    dt = time.perf_counter() - t0
    fps = args.max_iter * bs / dt
    print(f'train: {fps:.2f} img/s ({dt / args.max_iter * 1e3:.1f} '
          f'ms/step, batch {bs}, {size}x{size})')


if __name__ == '__main__':
    main()
