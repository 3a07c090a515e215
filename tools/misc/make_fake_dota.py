"""Generate a synthetic DOTA-format dataset + split for debug configs.

Paints rotated solid-color boxes of 3 classes onto noise images, writes
DOTA labelTxt polygons, then runs tools/split/img_split.py so the
result matches the layout the debug configs expect
(/tmp/fake_dota_split/trainval by default).

Used by the end-to-end dress rehearsal (PARITY.md): train
configs/debug/*_fake_dota.py from random init, evaluate with
tools/test.py, and compare the bf16 vs calibrated-int8 mAP.
Reference counterpart: none (the reference assumes real DOTA); the
image/label format matches its data/split layout (SURVEY.md §2.5).
"""
import argparse
import math
import os
import os.path as osp
import subprocess
import sys

import cv2
import numpy as np

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
CLASSES = ('plane', 'ship', 'small-vehicle')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='/tmp/fake_dota')
    p.add_argument('--split-out', default='/tmp/fake_dota_split/trainval')
    p.add_argument('--num-images', type=int, default=6)
    p.add_argument('--image-size', type=int, default=700)
    p.add_argument('--boxes-per-image', type=int, default=8)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()

    rng = np.random.RandomState(args.seed)
    os.makedirs(f'{args.out}/images', exist_ok=True)
    os.makedirs(f'{args.out}/labelTxt', exist_ok=True)
    big = args.image_size
    for i in range(args.num_images):
        img = rng.randint(40, 90, (big, big, 3)).astype(np.uint8)
        lines = []
        for _ in range(args.boxes_per_image):
            cx = rng.uniform(60, big - 60)
            cy = rng.uniform(60, big - 60)
            w, h = rng.uniform(30, 90), rng.uniform(15, 45)
            a = rng.uniform(-math.pi, math.pi)
            pts = cv2.boxPoints(((cx, cy), (w, h), math.degrees(a)))
            cv2.fillPoly(img, [pts.astype(np.int32)],
                         tuple(int(c) for c in rng.randint(120, 255, 3)))
            coords = ' '.join(f'{v:.1f}' for v in pts.reshape(-1))
            lines.append(f'{coords} {CLASSES[rng.randint(3)]} 0\n')
        cv2.imwrite(f'{args.out}/images/P{i:04d}.png', img)
        with open(f'{args.out}/labelTxt/P{i:04d}.txt', 'w') as f:
            f.writelines(lines)

    r = subprocess.run(
        [sys.executable, osp.join(REPO, 'tools/split/img_split.py'),
         '--img-dirs', f'{args.out}/images',
         '--ann-dirs', f'{args.out}/labelTxt',
         '--sizes', '512', '--gaps', '128',
         '--save-dir', args.split_out])
    sys.exit(r.returncode)


if __name__ == '__main__':
    main()
