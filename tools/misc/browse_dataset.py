#!/usr/bin/env python
"""Render pipeline output for dataset inspection.

Re-provides the reference's browse_dataset.py: run the train pipeline on
each sample and write the augmented image with its gt boxes drawn.
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))

import numpy as np


def main():
    p = argparse.ArgumentParser(description='Browse dataset pipeline output')
    p.add_argument('config')
    p.add_argument('--output-dir', default='browse_out')
    p.add_argument('--limit', type=int, default=20)
    args = p.parse_args()

    from r3det_tpu.utils.config import Config
    from r3det_tpu.datasets.dota import DOTADataset
    from r3det_tpu.datasets.transforms import Normalize, Pad, TrainPipeline
    from r3det_tpu.core.visualization import imshow_det_rbboxes

    cfg = Config.fromfile(args.config)
    version = cfg.model.bbox_head.bbox_coder.get('angle_range', 'v1')
    train_d = cfg.data.train
    ds = DOTADataset(train_d.ann_file, train_d.get('img_prefix'),
                     version=version)
    # interpret the config's ACTUAL pipeline (reference
    # browse_dataset.py builds its dataset from cfg.data.train too) —
    # custom flip ratios / scales / rotate params all take effect;
    # only Normalize/Pad are dropped so the previews stay in pixel space
    pipeline = TrainPipeline.from_config(
        train_d.get('pipeline', []), version=version)
    stages = [s for s in pipeline.stages
              if not isinstance(s, (Normalize, Pad))]

    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(min(args.limit, len(ds))):
        r = ds.get_sample(i)
        for s in stages:
            r = s(r)
            if r is None:
                break
        if r is None:
            continue
        out = osp.join(args.output_dir, f"{r['img_id']}.png")
        imshow_det_rbboxes(r['img'], r['gt_bboxes'], r['gt_labels'],
                           class_names=ds.CLASSES, score_thr=0,
                           out_file=out)
    print(f'wrote visualizations to {args.output_dir}')


if __name__ == '__main__':
    main()
