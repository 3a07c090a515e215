#!/usr/bin/env python
"""FLOPs / parameter count for a config.

Re-provides the reference's get_flops.py, but TPU-native: FLOPs come from
XLA's own cost analysis of the compiled forward (exact for the lowered
program, vs the reference's per-module hook estimate).
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))

import numpy as np


def main():
    p = argparse.ArgumentParser(description='Model FLOPs and params')
    p.add_argument('config')
    p.add_argument('--shape', type=int, nargs='+', default=[1024, 1024])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from r3det_tpu.utils.config import Config
    from r3det_tpu.utils.builder import build_from_config

    cfg = Config.fromfile(args.config)
    model, det_cfg = build_from_config(cfg)
    h, w = (args.shape * 2)[:2]
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(variables['params']))

    def fwd(v, x):
        out = model.apply(v, x)
        return jax.tree_util.tree_leaves((out['s0'], out.get('sr', [])))

    lowered = jax.jit(fwd).lower(variables, x)
    try:
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = analysis.get('flops', float('nan'))
    except Exception as e:  # pragma: no cover
        print(f'cost analysis unavailable ({e})')
        flops = float('nan')
    print(f'input shape: (1, {h}, {w}, 3)')
    print(f'params: {n_params / 1e6:.2f} M')
    print(f'flops:  {flops / 1e9:.2f} GFLOPs (XLA cost analysis)')


if __name__ == '__main__':
    main()
