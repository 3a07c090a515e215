#!/usr/bin/env python
"""Inference FPS benchmark for a config.

Re-provides the reference's tools/analysis_tools/benchmark.py (2000-iter
FPS loop with device sync). Device sync on this stack = fetching a result
to host, which the loop does every iteration.
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


if __name__ == '__main__':
    main()
