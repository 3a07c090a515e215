"""Inference throughput benchmark: R3Det R50-FPN on 1024x1024 patches.

Measures end-to-end jitted inference (backbone + FPN + base head + FRM +
refine head + decode + rotated NMS) in patches/sec on one chip, the
BASELINE.json north-star metric (target >= 300 patches/sec/chip on v5e).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

BASELINE_PATCHES_PER_SEC = 300.0


def main():
    from r3det_tpu.models.detectors import R3DET_R50_V1, build_detector
    from r3det_tpu.parallel.mesh import make_predict_step

    cfg = R3DET_R50_V1
    batch = 16
    size = 1024
    model = build_detector(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    # several distinct inputs: the axon execution layer caches identical
    # calls, and block_until_ready does not synchronize through the
    # tunnel — only a host fetch does. Timing below fetches every iter.
    images = [jnp.asarray(rng.uniform(-2, 2, (batch, size, size, 3))
                          .astype(np.float32)) for _ in range(4)]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0][:1])
    featmap_sizes = tuple((size // s, size // s) for s in cfg.strides)
    predict = make_predict_step(model, cfg, featmap_sizes,
                                img_shape=(size, size))

    def run(x):
        dets, labels, num = predict(variables, x)
        return float(np.asarray(dets).sum())     # forces completion

    run(images[0])                               # compile
    for i in range(2):
        run(images[i % 4])                       # warmup

    iters = 6
    t0 = time.perf_counter()
    for i in range(iters):
        run(images[i % 4])
    dt = time.perf_counter() - t0
    patches_per_sec = batch * iters / dt

    print(json.dumps({
        'metric': 'r3det_r50_infer_1024',
        'value': round(patches_per_sec, 2),
        'unit': 'patches/sec/chip',
        'vs_baseline': round(patches_per_sec / BASELINE_PATCHES_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
