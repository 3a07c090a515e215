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
import os
import signal
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, '.')

BASELINE_PATCHES_PER_SEC = 300.0
#: default FRM sample route for the headline benchmark (see run())
_FRM_DEFAULT = '0'


def run(batch, size=1024, iters=12, quantize=False, parity_nms=False):
    import jax
    import jax.numpy as jnp

    from r3det_tpu.models.detectors import (R3DET_R50_V1, TestCfg,
                                            build_detector)
    from r3det_tpu.parallel.mesh import make_predict_step

    # R3Det* (tiny) in the serving test config: approx_max_k candidate
    # selection (TPU PartialReduce) replaces the exact 80k-candidate
    # sort; it changes only which below-threshold candidates pad the
    # static NMS budget (see ops/nms.py docstring), worth ~15% e2e.
    # The serving NMS budget pins to nms_pre (the parity default is
    # 2 * nms_pre for dense scenes; serving trades that headroom for
    # HBM + a compile identical in structure to the long-validated one
    # — this image's remote-compile service wedges on novel large
    # programs, and the driver runs this file unattended).
    # quantize='static' runs backbone+FPN convs AND the head tower
    # convs int8 (models/quant.py; final pred convs stay bf16) with
    # pre-filled activation scales — bench measures speed, and the
    # scale values don't change the program's cost; real serving
    # calibrates via tools/test.py --calibrate-int8. Measured on v5e:
    # bf16 156.6 / int8-bb 166.4 / int8-bb+head 181.0 patches/s @b32.
    q = 'static' if quantize else False
    # parity_nms: the reference-equal test configuration — exact top-k
    # candidate selection and the 2*nms_pre dense-scene budget whose
    # keep-sets match the reference on dense scenes
    # (tests/test_nms.py::test_dense_scene_candidate_budget). The
    # serving config trades that headroom for HBM + compile stability;
    # bench reports BOTH so the headline number is honest about which
    # configuration it measures.
    test = (TestCfg(approx_topk=False, nms_candidates=None) if parity_nms
            else TestCfg(approx_topk=True, nms_candidates=2000))
    cfg = R3DET_R50_V1._replace(
        stacked_convs=2, quantize=q, quantize_head=q, test=test)
    # Fused Pallas stem (conv3x3+affine+ReLU+pool in one band kernel):
    # chip-validated round 5 — isolated int8 15.99 vs 18.67 ms/b32 XLA,
    # and a one-process interleaved e2e A/B of the full serving program
    # read 198.97 (fused) vs 202.60 (XLA) ms/b32, the ~3.6 ms gap
    # stable across 3 reps. Default ON; BENCH_FUSED_STEM=0 opts out.
    # BENCH_FUSED_BLOCKS stays opt-in: its Mosaic compile wedged this
    # image's remote compile service twice (PARITY.md fragility notes).
    fused_stem = os.environ.get('BENCH_FUSED_STEM', '1') == '1'
    fused_blocks = os.environ.get('BENCH_FUSED_BLOCKS') == '1'
    pool_kernel = os.environ.get('BENCH_POOL_KERNEL', '1') == '1'
    # FRM bilinear sample: the banded Pallas stencil kernel
    # (ops/frm_sample.py) wins its round-4 ISOLATED A/B (12.4 vs
    # 30.5 ms/b32 at the stride-8 level) but LOSES in the full serving
    # graph: same-conditions e2e A/B measured 150.7 (kernel) vs 189.8
    # (flat gather) patches/s — ~39 ms/b32 of in-context cost the
    # microbenchmark never sees (the pad+relayout pair around the
    # kernel and the runtime-fallback cond boundary materialize the
    # 256 MB level-0 tensor instead of fusing into neighbors; PARITY.md
    # round-5 component map). BENCH_FRM_KERNEL: '0' flat gather,
    # '1'/'band' Pallas band kernel, 'stencil' the pure-XLA masked
    # stencil that keeps the algorithmic win without the pallas_call
    # region boundary.
    frm_env = os.environ.get('BENCH_FRM_KERNEL', _FRM_DEFAULT)
    frm_kernel = {'0': False, '1': True, 'band': True,
                  'stencil': 'stencil'}.get(frm_env, False)
    # int8 activation storage between bottlenecks (resnet.py int8_act):
    # quantize each block input once, share the int8 tensor with
    # conv1/downsample/residual so the bf16 inter-block tensors never
    # round-trip HBM — the C2/C3 bandwidth the retired fused-bottleneck
    # kernel targeted, in plain XLA. Chip-validated round 5: backbone
    # 71.3 -> 61.0 ms/b32 isolated; full serving e2e interleaved A/B
    # 193.7 -> 208.2 patches/s, stable across 3 reps. int8-only (no-op
    # under bf16 attempts).
    int8_act = os.environ.get('BENCH_INT8_ACT', '1') == '1' and bool(q)
    model = build_detector(cfg, dtype=jnp.bfloat16,
                           stem_fused_kernel=fused_stem,
                           fused_blocks=fused_blocks,
                           stem_pool_kernel=pool_kernel,
                           frm_sample_kernel=frm_kernel,
                           int8_act=int8_act)
    rng = np.random.RandomState(0)
    # distinct inputs: the axon execution layer caches identical calls,
    # and block_until_ready does not synchronize through the tunnel —
    # only a host fetch does (see `chained` below for how the timing
    # loop stays cache-proof with one final fetch).
    images = [jnp.asarray(rng.uniform(-2, 2, (batch, size, size, 3))
                          .astype(np.float32)) for _ in range(2)]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0][:1])
    if quantize:
        # pre-filled activation scales: timing-equivalent to calibrated
        # (the scale VALUE doesn't change the compiled program's cost)
        variables = dict(variables, quant_stats=jax.tree.map(
            lambda _: jnp.float32(4.0), variables['quant_stats']))
    featmap_sizes = tuple((size // s, size // s) for s in cfg.strides)
    predict = make_predict_step(model, cfg, featmap_sizes,
                                img_shape=(size, size))

    def step(x):
        dets, labels, num = predict(variables, x)
        return float(np.asarray(dets[0, 0, 0]))      # forces completion

    # one-element perturbation chains iteration i+1's input to iteration
    # i's output: every call is value-distinct (the axon execution cache
    # keys on values) and data-dependent (device executes them serially),
    # so the whole pipeline can be dispatched async and synced ONCE —
    # production-serving style — instead of paying the tunnel's ~32 ms
    # RPC floor per iteration.
    poke = jax.jit(lambda x, s: x.at[0, 0, 0, 0].add(1e-6 * s))

    step(images[0])                                  # compile predict
    x = poke(images[0], jnp.float32(1))              # compile poke
    step(x)                                          # warmup

    def chained(x, n):
        t0 = time.perf_counter()
        for i in range(n):
            dets, labels, num = predict(variables, x)
            x = poke(x, dets[0, 0, 0].astype(jnp.float32))
        np.asarray(dets[0, 0, 0])                    # one sync
        return time.perf_counter() - t0

    chained(images[1], 2)                            # pipeline warmup
    # best-of-3: tunnel noise (RPC scheduling, compile-service load on
    # the shared host) only ever makes a measurement SLOWER, so the
    # minimum is the honest throughput — round 3 recorded 189.95 for a
    # program that measures 212 on a quiet tunnel
    dt = min(chained(images[i % 2], iters) for i in range(3))
    dt_percall = None
    if os.environ.get('BENCH_PERCALL'):              # diagnostics
        t0 = time.perf_counter()
        for i in range(iters):
            step(images[i % 2])
        dt_percall = time.perf_counter() - t0
        print(f'percall: {batch * iters / dt_percall:.2f}/s  '
              f'chained: {batch * iters / dt:.2f}/s', file=sys.stderr)
    return batch * iters / dt


# generous: the remote-compile service's first compile of a process has
# been observed to take 250-500 s when the service is loaded; the alarm
# exists to catch full stalls, not slow-but-live compiles
ATTEMPT_TIMEOUT_S = int(os.environ.get('BENCH_ATTEMPT_TIMEOUT', 900))


def _alarm(signum, frame):
    raise TimeoutError(f'bench attempt exceeded {ATTEMPT_TIMEOUT_S}s '
                       '(remote compile service stall?)')


#: attempt ladder: (batch, quantize). BENCH_QUANT=1 forces int8-only,
#: =0 forces bf16-only; default tries int8 first (the serving config)
#: and degrades to the long-validated bf16 program on any failure.
#: b32 leads: since the 64-row IoU tiles cut the NMS fixed cost, b32
#: measures faster than b48 (211.9 vs 194.7 patches/s on v5e).
_QUANT_DEFAULT = [(32, True), (48, True), (32, False),
                  (16, False), (8, False)]
_BF16_ONLY = [(32, False), (48, False), (16, False), (8, False)]
_INT8_ONLY = [(32, True), (48, True), (16, True), (8, True)]


def _wait_for_tunnel(max_wait_s=900):
    """The axon tunnel + remote-compile service wedge for hours at a
    time (machine-wide; they self-heal). A benchmark started during a
    wedge records 0.0 — probe with a tiny matmul+fetch and wait out a
    bad phase before burning the attempt ladder.

    The probe MUST be a subprocess: during a wedge the axon plugin
    hangs inside backend *initialization* (a C call that never returns
    to the interpreter), so an in-process SIGALRM would never fire —
    and the main process must not touch jax before health is confirmed.
    """
    import subprocess
    probe = ("import numpy as np\nimport jax.numpy as jnp\n"
             "x = jnp.ones((128, 128))\n"
             "assert float(np.asarray(x @ x)[0, 0]) == 128.0\n")
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            # generous: a LIVE tunnel has been observed to take ~210 s
            # just to initialize the backend (round 5); only a hard
            # wedge should fail the probe
            r = subprocess.run([sys.executable, '-c', probe],
                               timeout=420, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            print('tunnel probe never succeeded; benching anyway',
                  file=sys.stderr)
            return False
        print('tunnel unhealthy; waiting 120 s for self-heal',
              file=sys.stderr)
        time.sleep(120)


def main():
    value = 0.0
    # per-attempt watchdog: this image's remote TPU compile service can
    # stall for tens of minutes; without the alarm a stalled compile
    # hangs the whole benchmark instead of degrading to a smaller batch
    # / emitting the JSON line
    signal.signal(signal.SIGALRM, _alarm)
    _wait_for_tunnel()
    attempts = {'1': _INT8_ONLY, '0': _BF16_ONLY}.get(
        os.environ.get('BENCH_QUANT', ''), _QUANT_DEFAULT)
    used = None
    for batch, quantize in attempts:
        try:
            signal.alarm(ATTEMPT_TIMEOUT_S)
            value = run(batch, quantize=quantize)
            signal.alarm(0)
            used = (batch, quantize)
            break
        except Exception:
            signal.alarm(0)
            traceback.print_exc(file=sys.stderr)
            print(f'batch {batch} quantize={quantize} failed; '
                  'retrying next config', file=sys.stderr)

    # honest pair: also measure the reference-parity NMS configuration
    # (exact top-k, 2*nms_pre candidate budget — the config whose
    # dense-scene keep-sets are proven reference-equal). Soft-fails to
    # null: it is a diagnostic rider, never the headline's failure mode.
    parity_value = None
    if used is not None and os.environ.get('BENCH_PARITY', '1') == '1':
        try:
            signal.alarm(ATTEMPT_TIMEOUT_S)
            parity_value = round(run(used[0], quantize=used[1],
                                     parity_nms=True), 2)
            signal.alarm(0)
        except Exception:
            signal.alarm(0)
            traceback.print_exc(file=sys.stderr)
            print('parity-config rider failed; headline unaffected',
                  file=sys.stderr)

    print(json.dumps({
        'metric': 'r3det_tiny_r50_infer_1024',
        'value': round(value, 2),
        'unit': 'patches/sec/chip',
        'vs_baseline': round(value / BASELINE_PATCHES_PER_SEC, 3),
        'serving_cfg': {
            'approx_topk': True, 'nms_candidates': 2000,
            'frm_kernel': os.environ.get('BENCH_FRM_KERNEL', _FRM_DEFAULT),
            'pool_kernel': os.environ.get('BENCH_POOL_KERNEL', '1') == '1',
            'fused_stem': os.environ.get('BENCH_FUSED_STEM', '1') == '1',
            'fused_blocks': os.environ.get('BENCH_FUSED_BLOCKS') == '1',
            'int8_act': os.environ.get('BENCH_INT8_ACT', '1') == '1',
        },
        'parity_cfg_value': parity_value,
    }))


if __name__ == '__main__':
    main()
