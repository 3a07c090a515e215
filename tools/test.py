#!/usr/bin/env python
"""Evaluate / format results for a rotated detector.

Re-provides the reference's tools/test.py surface: load a checkpoint,
run inference over the test set, then either --eval mAP (DOTA polygon
mAP) or --format-only (merge patches + write Task1 submission zip).
"""
import argparse
import os.path as osp
import pickle
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Test a rotated detector')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None,
                   help='orbax checkpoint dir (omit for random weights)')
    p.add_argument('--out', default=None, help='dump raw results pickle')
    p.add_argument('--eval', default=None, choices=[None, 'mAP'])
    p.add_argument('--format-only', action='store_true')
    p.add_argument('--format-dir', default='submission')
    p.add_argument('--img-size', type=int, default=None,
                   help='override the test pipeline img_scale (default: '
                        'the config test pipeline\'s scale, else 1024)')
    p.add_argument('--batch-size', type=int, default=4)
    p.add_argument('--calibrate-int8', type=int, default=0, metavar='N',
                   help='with quantize_int8 models: freeze per-conv '
                        'activation scales from N dataset batches before '
                        'inference (default: dynamic scales)')
    p.add_argument('--fused-kernels', action='store_true',
                   help='serving-only fused Pallas kernels (currently '
                        'the chip-validated s2d4 stem); inference '
                        'graphs only')
    p.add_argument('--cfg-options', nargs='+', default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from r3det_tpu.utils.config import Config
    from r3det_tpu.utils.builder import build_from_config
    from r3det_tpu.parallel.mesh import make_mesh
    from r3det_tpu.datasets.dota import DOTADataset
    from r3det_tpu.utils.eval_loop import evaluate_dataset

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(dict(kv.split('=', 1) for kv in args.cfg_options))
    # --fused-kernels opts in the chip-validated serving Pallas
    # kernels; the individual flags are also config-reachable (model
    # dict or test_cfg keys, utils/builder.py _KERNEL_FLAG_KEYS).
    # NOT included: the FRM band-sample kernel (wins its isolated A/B,
    # loses ~39 ms/b32 in the full serving graph) and the fused
    # bottleneck (its Mosaic compile wedged this image's remote
    # compile service three times — PARITY.md) — reach them explicitly
    # via the frm_sample_kernel / fused_blocks config keys.
    kernel_kwargs = dict(stem_fused_kernel=args.fused_kernels)
    model, det_cfg = build_from_config(cfg, **kernel_kwargs)

    # evaluate whatever split the config's test dict points at, like the
    # reference (/root/reference/tools/test.py:108-236) — point data.test
    # at an annotated split to --eval it
    test_d = cfg.data.test
    ds = DOTADataset(test_d.ann_file, test_d.get('img_prefix'),
                     version=det_cfg.angle_version, filter_empty=False,
                     test_mode=not args.eval,
                     classes=test_d.get('classes'))
    print(f'{len(ds)} images')

    cfg_scale = None                          # (w, h)
    for s in (test_d.get('pipeline') or []):
        if s.get('type') in ('RResize', 'MultiScaleFlipAug') and \
                s.get('img_scale'):
            sc = s['img_scale']
            sc = sc[0] if isinstance(sc, (list, tuple)) and \
                isinstance(sc[0], (list, tuple)) else sc
            cfg_scale = (sc, sc) if isinstance(sc, int) else tuple(sc)
    if args.img_size:
        hw = (args.img_size, args.img_size)
    elif cfg_scale:
        hw = (cfg_scale[1], cfg_scale[0])
    else:
        hw = (1024, 1024)
    canvas = tuple(-(-d // 32) * 32 for d in hw)
    sample = jnp.zeros((1,) + canvas + (3,), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    if args.checkpoint:
        import orbax.checkpoint as ocp
        payload = ocp.PyTreeCheckpointer().restore(
            osp.abspath(args.checkpoint))
        restored = {'params': payload['params'],
                    'batch_stats': payload.get('batch_stats', {})}
        if 'quant_stats' in variables:       # int8 serving model
            restored['quant_stats'] = payload.get(
                'quant_stats', variables['quant_stats'])
        variables = restored
        print(f'loaded {args.checkpoint}')

    if det_cfg.quantize and args.calibrate_int8:
        # freeze per-conv activation scales from real data so serving
        # skips the dynamic max|x| pass (models/quant.py)
        from r3det_tpu.datasets.transforms import Normalize, Pad, RResize
        from r3det_tpu.models.quant import calibrate
        cal_pipe = [RResize((hw[1], hw[0])), Normalize(),
                    Pad(32, fixed_size=canvas)]
        batches = []
        cal_bs = max(args.batch_size, 1)
        for start in range(0, min(args.calibrate_int8 * cal_bs, len(ds)),
                           cal_bs):
            imgs = []
            for i in range(start, min(start + cal_bs, len(ds))):
                r = ds.get_sample(i)
                for st in cal_pipe:
                    r = st(r)
                imgs.append(r['img'])
            batches.append(jnp.asarray(np.stack(imgs).astype(np.float32)))
        variables = calibrate(model, variables, batches)
        print(f'int8 activation scales calibrated over '
              f'{len(batches)} batches')

    # shard eval batches over every local device (reference multi_gpu_test
    # equivalent; see r3det_tpu/utils/eval_loop.py for the multi-host path)
    n_dev = jax.local_device_count()
    mesh = make_mesh() if n_dev > 1 else None
    bs = max(args.batch_size, n_dev)
    bs -= bs % max(n_dev, 1)
    t0 = time.time()

    def progress(done, total):
        if done % (20 * bs) < bs or done == total:
            print(f'{done}/{total}  '
                  f'({done / (time.time() - t0):.1f} img/s)')

    results = evaluate_dataset(variables, model, det_cfg, ds,
                               img_size=hw, batch_size=bs, mesh=mesh,
                               progress=progress)

    if args.out:
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)
        print(f'raw results -> {args.out}')
    if args.format_only:
        zip_path = ds.format_results(results, args.format_dir)
        print(f'submission -> {zip_path}')
    if args.eval == 'mAP':
        metrics = ds.evaluate(results)
        print({k: round(v, 4) for k, v in metrics.items()})


if __name__ == '__main__':
    main()
