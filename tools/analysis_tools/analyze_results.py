#!/usr/bin/env python
"""Render the best/worst predictions by per-image mAP.

Re-provides the reference's analyze_results.py: score each image's
detections against its annotations, then save visualizations of the
top-k and bottom-k images.
"""
import argparse
import os
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))

import numpy as np


def main():
    p = argparse.ArgumentParser(description='Analyze prediction quality')
    p.add_argument('config')
    p.add_argument('results', help='pickle from tools/test.py --out')
    p.add_argument('--show-dir', default='analyze_out')
    p.add_argument('--topk', type=int, default=10)
    args = p.parse_args()

    from r3det_tpu.utils.config import Config
    from r3det_tpu.datasets.dota import DOTADataset, eval_rbbox_map
    from r3det_tpu.core.visualization import imshow_det_rbboxes

    cfg = Config.fromfile(args.config)
    version = cfg.model.bbox_head.bbox_coder.get('angle_range', 'v1')
    val_d = cfg.data.val
    ds = DOTADataset(val_d.ann_file, val_d.get('img_prefix'),
                     version=version, filter_empty=False)
    with open(args.results, 'rb') as f:
        results = pickle.load(f)
    assert len(results) == len(ds), (len(results), len(ds))

    scores = []
    for i, (res, info) in enumerate(zip(results, ds.data_infos)):
        m, _ = eval_rbbox_map([res], [info['ann']], version=version,
                              class_names=ds.CLASSES, logger=None)
        scores.append((m, i))
    scores.sort()

    os.makedirs(osp.join(args.show_dir, 'good'), exist_ok=True)
    os.makedirs(osp.join(args.show_dir, 'bad'), exist_ok=True)
    for tag, chunk in (('bad', scores[:args.topk]),
                       ('good', scores[-args.topk:])):
        for m, i in chunk:
            info = ds.data_infos[i]
            dets = np.concatenate([
                np.concatenate([d, np.full((len(d), 1), c, np.float32)], -1)
                for c, d in enumerate(results[i]) if len(d)] or
                [np.zeros((0, 7), np.float32)])
            img = osp.join(ds.img_folder, info['filename'])
            out = osp.join(args.show_dir, tag,
                           f"{m:.3f}_{info['id']}.png")
            imshow_det_rbboxes(img, dets[:, :6],
                               dets[:, 6].astype(int),
                               class_names=ds.CLASSES, out_file=out)
    print(f'wrote top/bottom-{args.topk} visualizations to {args.show_dir}')


if __name__ == '__main__':
    main()
