#!/usr/bin/env python
"""On-device A/B validation for the serving Pallas kernels.

Drives each kernel vs its XLA composition on the REAL chip: parity
first (max abs diff on a small slab fetched to host), then chained-
dispatch timing (inputs perturbed by the previous output so the axon
execution cache can't serve repeats; one host sync per timing loop —
see bench.py for the rationale).

Usage (serialize with any other TPU job — one chip, one host core):
    python tools/analysis_tools/kernel_bench.py stem
    python tools/analysis_tools/kernel_bench.py bottleneck
    python tools/analysis_tools/kernel_bench.py frm
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def chain_time(fn, x, iters=10, reps=3):
    """Median of `reps` chained-dispatch timings of fn at input x."""
    import jax
    import jax.numpy as jnp
    poke = jax.jit(lambda x, s: x.at[(0,) * x.ndim].add(
        (s * 1e-6).astype(x.dtype)))
    y = fn(x)
    s = y[(0,) * y.ndim].astype(jnp.float32)
    x1 = poke(x, s)
    y = fn(x1)                                     # warm fn + poke
    np.asarray(jax.device_get(y[(0,) * y.ndim]))

    def loop(x):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(x)
            s = y[(0,) * y.ndim].astype(jnp.float32)
            x = poke(x, s)
        np.asarray(jax.device_get(s))              # one sync
        return (time.perf_counter() - t0) / iters
    loop(x)                                        # pipeline warmup
    return min(loop(x) for _ in range(reps))


def parity(a, b, where):
    d = float(np.max(np.abs(np.asarray(jax.device_get(a), np.float32) -
                            np.asarray(jax.device_get(b), np.float32))))
    print(f'  parity[{where}] max|diff| = {d:.6f}')
    return d


def run_stem(batch=32):
    import jax.numpy as jnp
    from r3det_tpu.ops import stem_pool as sp
    rng = np.random.RandomState(0)
    # stem input in s2d2 form for a (batch, 1024, 1024, 3) image
    x = jnp.asarray(rng.uniform(-2, 2, (batch, 512, 512, 12))
                    .astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.1, (4, 4, 12, 64)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, 64).astype(np.float32))

    xla = jax.jit(lambda x: sp.stem_conv_pool_s2d4(x, k, scale, bias))
    xla_pk = jax.jit(lambda x: sp.stem_conv_pool_s2d4(
        x, k, scale, bias, pool_kernel=True))
    fused = jax.jit(lambda x: sp.stem_conv_pool_s2d4_pallas(
        x, k, scale, bias))
    fused_q8 = jax.jit(lambda x: sp.stem_conv_pool_s2d4_pallas(
        x, k, scale, bias, quantize=True))
    xla_q8 = jax.jit(lambda x: sp.stem_conv_pool_s2d4(
        x, k, scale, bias, quantize=True))

    xs = x[:1]
    print('compiling fused stem (small slab) ...', flush=True)
    parity(fused(xs), xla(xs), 'fused-bf16 vs xla (b1)')
    parity(fused_q8(xs), xla_q8(xs), 'fused-int8 vs xla-int8 (b1)')
    for name, fn in [('xla(s2d4)+xla-pool', xla),
                     ('xla(s2d4)+pool-kernel', xla_pk),
                     ('fused-stem bf16', fused),
                     ('fused-stem int8', fused_q8)]:
        dt = chain_time(fn, x)
        print(f'  {name:26s} b{batch}: {dt * 1e3:8.2f} ms', flush=True)


def run_bottleneck(batch=32):
    import jax.numpy as jnp
    from r3det_tpu.ops import bottleneck_fuse as bf
    rng = np.random.RandomState(0)
    for (h, w, c4, f, tag) in [(256, 256, 256, 64, 'C2'),
                               (128, 128, 512, 128, 'C3')]:
        x = jnp.asarray(rng.uniform(-1, 1, (batch, h, w, c4))
                        .astype(np.float32)).astype(jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(0, .05, (1, 1, c4, f)), jnp.float32)
        b1 = jnp.asarray(rng.normal(0, .1, (f,)), jnp.float32)
        w2 = jnp.asarray(rng.normal(0, .05, (3, 3, f, f)), jnp.float32)
        b2 = jnp.asarray(rng.normal(0, .1, (f,)), jnp.float32)
        w3 = jnp.asarray(rng.normal(0, .05, (1, 1, f, c4)), jnp.float32)
        b3 = jnp.asarray(rng.normal(0, .1, (c4,)), jnp.float32)
        am = (jnp.float32(1.0), jnp.float32(2.0), jnp.float32(2.0))

        def xla_ref(x):
            y = jax.lax.conv_general_dilated(
                x, w1.astype(jnp.bfloat16), (1, 1), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)
            y = jnp.maximum(y + b1, 0).astype(jnp.bfloat16)
            y = jax.lax.conv_general_dilated(
                y, w2.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)
            y = jnp.maximum(y + b2, 0).astype(jnp.bfloat16)
            y = jax.lax.conv_general_dilated(
                y, w3.astype(jnp.bfloat16), (1, 1), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)
            return jnp.maximum(y + b3 + x.astype(jnp.float32),
                               0).astype(jnp.bfloat16)

        fused = jax.jit(lambda x: bf.fused_bottleneck(
            x, w1, b1, w2, b2, w3, b3))
        fused_q8 = jax.jit(lambda x: bf.fused_bottleneck_q8(
            x, w1, b1, w2, b2, w3, b3, *am))
        xla_q8 = jax.jit(lambda x: bf.fused_bottleneck_q8_xla(
            x, w1, b1, w2, b2, w3, b3, *am))
        xla = jax.jit(xla_ref)

        xs = x[:1]
        print(f'[{tag}] compiling fused bottleneck (b1) ...', flush=True)
        parity(fused(xs), xla(xs), f'{tag} fused vs xla (b1, bf16)')
        parity(fused_q8(xs), xla_q8(xs), f'{tag} fused-q8 vs xla-q8 (b1)')
        for name, fn in [('xla 3-conv bf16', xla),
                         ('fused bf16', fused),
                         ('xla 3-conv int8', xla_q8),
                         ('fused int8', fused_q8)]:
            dt = chain_time(fn, x)
            print(f'  [{tag}] {name:18s} b{batch}: {dt * 1e3:8.2f} ms',
                  flush=True)


def run_frm(batch=32):
    import jax.numpy as jnp
    from r3det_tpu.models.frm import bilinear_sample
    from r3det_tpu.ops.frm_sample import bilinear_sample_band
    rng = np.random.RandomState(0)
    h = w = 128
    c = 256
    feat = jnp.asarray(rng.uniform(-1, 1, (batch, h, w, c))
                       .astype(np.float32)).astype(jnp.bfloat16)
    # near-coherent sample points (FRM geometry): within +-1.5 px
    py = (np.arange(h)[None, :, None] +
          rng.uniform(-1.5, 1.5, (batch, h, w))).astype(np.float32)
    px = (np.arange(w)[None, None, :] +
          rng.uniform(-1.5, 1.5, (batch, h, w))).astype(np.float32)
    py, px = jnp.asarray(py), jnp.asarray(px)
    ins = jnp.ones((batch, h, w), bool)

    band = jax.jit(lambda f: bilinear_sample_band(f, py, px, ins)[0])
    flat = jax.jit(lambda f: bilinear_sample(
        f, py.reshape(batch, -1), px.reshape(batch, -1))
        .reshape(batch, h, w, c))
    parity(band(feat[:1]), flat(feat[:1]), 'band vs flat (b1)')
    for name, fn in [('flat gather', flat), ('band kernel', band)]:
        dt = chain_time(fn, feat)
        print(f'  {name:14s} b{batch}: {dt * 1e3:8.2f} ms', flush=True)


if __name__ == '__main__':
    import jax
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    print('devices:', jax.devices(), flush=True)
    if which in ('stem', 'all'):
        run_stem()
    if which in ('bottleneck', 'all'):
        run_bottleneck()
    if which in ('frm', 'all'):
        run_frm()
