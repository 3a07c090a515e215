"""Inference throughput benchmark: R3Det R50-FPN on 1024x1024 patches.

Measures end-to-end jitted inference (backbone + FPN + base head + FRM +
refine head + decode + rotated NMS) in patches/sec on one chip, the
BASELINE.json north-star metric (target >= 300 patches/sec/chip on v5e).

Flagship model: R3Det* ("tiny", stacked_convs=2) — the reference's best
published R3Det (70.86 DOTA AP vs 70.41 for stacked_convs=4;
/root/reference/configs/r3det/r3det_tiny_r50_fpn_1x_dota_v1.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Fails soft: on any error it retries with a smaller batch before giving
up, and always emits the JSON line (value 0.0 on total failure).
"""
import json
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, '.')

BASELINE_PATCHES_PER_SEC = 300.0


def run(batch, size=1024, iters=6):
    import jax
    import jax.numpy as jnp

    from r3det_tpu.models.detectors import (R3DET_R50_V1, TestCfg,
                                            build_detector)
    from r3det_tpu.parallel.mesh import make_predict_step

    # R3Det* (tiny) in the serving test config: approx_max_k candidate
    # selection (TPU PartialReduce) replaces the exact 80k-candidate
    # sort; it changes only which below-threshold candidates pad the
    # static NMS budget (see ops/nms.py docstring), worth ~15% e2e.
    cfg = R3DET_R50_V1._replace(stacked_convs=2,
                                test=TestCfg(approx_topk=True))
    model = build_detector(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    # distinct inputs: the axon execution layer caches identical calls,
    # and block_until_ready does not synchronize through the tunnel —
    # only a host fetch does. Timing fetches a scalar every iter, which
    # pays the tunnel's ~32 ms RPC floor per call: the number below
    # UNDER-reports device throughput by roughly that margin.
    images = [jnp.asarray(rng.uniform(-2, 2, (batch, size, size, 3))
                          .astype(np.float32)) for _ in range(2)]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0][:1])
    featmap_sizes = tuple((size // s, size // s) for s in cfg.strides)
    predict = make_predict_step(model, cfg, featmap_sizes,
                                img_shape=(size, size))

    def step(x):
        dets, labels, num = predict(variables, x)
        return float(np.asarray(dets[0, 0, 0]))      # forces completion

    step(images[0])                                  # compile
    for i in range(2):
        step(images[i % 2])                          # warmup

    t0 = time.perf_counter()
    for i in range(iters):
        step(images[i % 2])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    value = 0.0
    for batch in (48, 32, 16, 8):
        try:
            value = run(batch)
            break
        except Exception:
            traceback.print_exc(file=sys.stderr)
            print(f'batch {batch} failed; retrying smaller',
                  file=sys.stderr)

    print(json.dumps({
        'metric': 'r3det_tiny_r50_infer_1024',
        'value': round(value, 2),
        'unit': 'patches/sec/chip',
        'vs_baseline': round(value / BASELINE_PATCHES_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
