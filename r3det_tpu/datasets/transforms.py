"""Rotation-aware data transforms (host-side numpy/cv2).

Re-provides the reference pipeline stages (r3det/datasets/pipelines/
rtransforms.py plus the mmdet stages the configs use: Normalize, Pad
size_divisor — configs/_base_/datasets/dota1_0.py:6-29), re-shaped for a
TPU input pipeline: every sample leaves the pipeline as fixed-size arrays
(image HxWx3 float32, gt padded to max_gt with a mask) ready to batch and
ship to device with zero dynamic shapes.

Samples are dicts: {'img': (H, W, 3) float32, 'gt_bboxes': (G, 5),
'gt_labels': (G,), plus bookkeeping keys}.
"""
import math
from typing import Optional, Sequence

import cv2
import numpy as np

from ..core.rtransforms_np import norm_angle_np, obb2poly_np, poly2obb_np

PI = math.pi


class RResize:
    """Resize image (keep-ratio) + rotated boxes.

    Box rule (parity: pipelines/rtransforms.py:30-40): centers scale per
    axis, w/h scale by sqrt(wx * wy) — a rotated box has no axis-aligned
    w/h, so the area-preserving geometric mean is used.
    """

    def __init__(self, img_scale):
        self.img_scale = img_scale          # (w, h) target, mmcv convention

    def __call__(self, results):
        img = results['img']
        h, w = img.shape[:2]
        max_long, max_short = max(self.img_scale), min(self.img_scale)
        scale = min(max_long / max(h, w), max_short / min(h, w))
        new_w, new_h = int(w * scale + 0.5), int(h * scale + 0.5)
        img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        w_scale, h_scale = new_w / w, new_h / h
        results['img'] = img
        results['img_shape'] = img.shape
        results['scale_factor'] = np.array(
            [w_scale, h_scale, w_scale, h_scale], np.float32)
        if 'gt_bboxes' in results and len(results['gt_bboxes']):
            b = results['gt_bboxes']
            b[:, 0] *= w_scale
            b[:, 1] *= h_scale
            b[:, 2:4] *= np.sqrt(w_scale * h_scale)
        return results


class RRandomFlip:
    """Random h/v/diagonal flip of image + (cx, cy, w, h, theta) boxes.

    Angle rules (parity: pipelines/rtransforms.py:59-89): v1 reflects via
    theta -> -pi/2 - theta with w/h swap (except theta == -pi/2); v2/v3
    via norm_angle(pi - theta).
    """

    def __init__(self, flip_ratio=0.5, direction='horizontal', version='v1',
                 rng=None):
        self.flip_ratio = flip_ratio
        self.direction = direction
        self.version = version
        self.rng = rng or np.random

    def bbox_flip(self, bboxes, img_shape, direction):
        h, w = img_shape[:2]
        flipped = bboxes.copy()
        if direction == 'horizontal':
            flipped[:, 0] = w - bboxes[:, 0] - 1
        elif direction == 'vertical':
            flipped[:, 1] = h - bboxes[:, 1] - 1
        elif direction == 'diagonal':
            flipped[:, 0] = w - bboxes[:, 0] - 1
            flipped[:, 1] = h - bboxes[:, 1] - 1
            return flipped                     # 180° rotation: angle unchanged
        else:
            raise ValueError(f'bad flip direction {direction!r}')
        if self.version == 'v1':
            rot = bboxes[:, 4] != -PI / 2
            flipped[rot, 4] = -PI / 2 - bboxes[rot, 4]
            flipped[rot, 2] = bboxes[rot, 3]
            flipped[rot, 3] = bboxes[rot, 2]
        else:
            flipped[:, 4] = norm_angle_np(PI - bboxes[:, 4], self.version)
        return flipped

    def __call__(self, results):
        if self.rng.rand() >= self.flip_ratio:
            results['flip'] = False
            return results
        results['flip'] = True
        results['flip_direction'] = self.direction
        img = results['img']
        if self.direction == 'horizontal':
            results['img'] = img[:, ::-1].copy()
        elif self.direction == 'vertical':
            results['img'] = img[::-1].copy()
        else:
            results['img'] = img[::-1, ::-1].copy()
        if 'gt_bboxes' in results and len(results['gt_bboxes']):
            results['gt_bboxes'] = self.bbox_flip(
                results['gt_bboxes'], results['img'].shape, self.direction)
        return results


class PolyRandomRotate:
    """Random in-plane rotation through polygon space.

    Parity: pipelines/rtransforms.py:92-226 — random angle in
    ±angles_range deg; snapped to {90, 180, -90, -180} when storage-tank
    (9) or roundabout (11) instances are present; boxes go obb -> poly ->
    warp -> re-fit obb; border/min-size filter; returns None when no gt
    survives (caller must resample).
    """

    def __init__(self, rotate_ratio=0.5, angles_range=180, auto_bound=False,
                 version='v3', rng=None):
        self.rotate_ratio = rotate_ratio
        self.angles_range = angles_range
        self.auto_bound = auto_bound
        self.version = version
        self.discrete_range = [90, 180, -90, -180]
        self.rng = rng or np.random

    def __call__(self, results):
        # The reference runs the angle-0 path even when NOT rotating
        # (pipelines/rtransforms.py:168-172 + :206-224): boxes still go
        # obb -> poly -> (identity) transform -> re-fit -> border/size
        # filter. Degenerate gt is filtered on every sample, and samples
        # whose gt all die still return None.
        if self.rng.rand() >= self.rotate_ratio:
            results['rotate'] = False
            angle = 0.0
        else:
            angle = 2 * self.angles_range * self.rng.rand() - \
                self.angles_range
            results['rotate'] = True
            labels = results['gt_labels']
            if np.any((labels == 9) | (labels == 11)):
                angle = self.discrete_range[self.rng.randint(4)]
        labels = results['gt_labels']
        results['rotate_angle'] = angle

        img = results['img']
        h, w = img.shape[:2]
        center = (w / 2, h / 2)
        if self.auto_bound:
            # quirk preserved: the reference feeds the DEGREE angle to
            # np.cos/np.sin when computing auto bounds
            # (pipelines/rtransforms.py:191-196)
            ac, as_ = abs(np.cos(angle)), abs(np.sin(angle))
            bound_w = int(np.rint(h * as_ + w * ac))
            bound_h = int(np.rint(h * ac + w * as_))
        else:
            bound_w, bound_h = w, h
        rm = cv2.getRotationMatrix2D(center, angle, 1)
        rm_img = cv2.getRotationMatrix2D((center[0] - 0.5, center[1] - 0.5),
                                         angle, 1)
        if results['rotate']:
            results['img'] = cv2.warpAffine(img, rm_img,
                                            (bound_w, bound_h),
                                            flags=cv2.INTER_LINEAR)
            results['img_shape'] = results['img'].shape

        gt = results['gt_bboxes']
        if len(gt) == 0:
            return None
        scored = np.concatenate([gt, np.zeros((len(gt), 1))], -1)
        polys = obb2poly_np(scored, self.version)[:, :8].reshape(-1, 2)
        polys = cv2.transform(
            polys.reshape(-1, 2)[:, None, :].astype(float),
            rm)[:, 0, :].reshape(-1, 8)
        new_boxes = []
        for p in polys:
            obb = poly2obb_np(p.astype(np.float32), self.version)
            new_boxes.append(obb if obb is not None else (0, 0, 0, 0, 0))
        new_boxes = np.array(new_boxes, np.float32)
        keep = ((new_boxes[:, 0] > 0) & (new_boxes[:, 0] < bound_w) &
                (new_boxes[:, 1] > 0) & (new_boxes[:, 1] < bound_h) &
                (new_boxes[:, 2] > 5) & (new_boxes[:, 3] > 5))
        if not keep.any():
            return None
        results['gt_bboxes'] = new_boxes[keep]
        results['gt_labels'] = labels[keep]
        return results


class Normalize:
    """Channel normalize + BGR->RGB (mmdet Normalize with to_rgb)."""

    def __init__(self, mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375), to_rgb=True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        img = results['img'].astype(np.float32)
        if self.to_rgb:
            img = img[..., ::-1]
        results['img'] = (img - self.mean) / self.std
        return results


class Pad:
    """Pad image to a size divisor (bottom/right), mmdet Pad semantics.

    ``fixed_size`` ((h, w)) pads to an exact canvas instead — the jit
    train/eval steps need every sample at one static shape, so the
    runner pins the canvas to the divisor-rounded pipeline img_scale
    (keep-ratio resize guarantees images fit inside it).
    """

    def __init__(self, size_divisor=32, pad_val=0.0, fixed_size=None):
        self.size_divisor = size_divisor
        self.pad_val = pad_val
        self.fixed_size = fixed_size

    def __call__(self, results):
        img = results['img']
        h, w = img.shape[:2]
        if self.fixed_size is not None:
            ph, pw = self.fixed_size
            assert h <= ph and w <= pw, (
                f'image {(h, w)} exceeds fixed pad canvas {(ph, pw)}')
        else:
            ph = (h + self.size_divisor - 1) // self.size_divisor * \
                self.size_divisor
            pw = (w + self.size_divisor - 1) // self.size_divisor * \
                self.size_divisor
        if (ph, pw) != (h, w):
            out = np.full((ph, pw) + img.shape[2:], self.pad_val, img.dtype)
            out[:h, :w] = img
            results['img'] = out
        results['pad_shape'] = results['img'].shape
        return results


def pad_gt(gt_bboxes, gt_labels, max_gt):
    """Pad variable gt to fixed (max_gt, 5)/(max_gt,) + mask; truncate the
    rare overflow (keeps the largest boxes, which dominate the loss)."""
    n = len(gt_bboxes)
    boxes = np.zeros((max_gt, 5), np.float32)
    labels = np.zeros((max_gt,), np.int32)
    mask = np.zeros((max_gt,), bool)
    if n == 0:
        return boxes, labels, mask
    if n > max_gt:
        order = np.argsort(-(gt_bboxes[:, 2] * gt_bboxes[:, 3]))[:max_gt]
        gt_bboxes = gt_bboxes[order]
        gt_labels = gt_labels[order]
        n = max_gt
    boxes[:n] = gt_bboxes
    labels[:n] = gt_labels
    mask[:n] = True
    return boxes, labels, mask


class TrainPipeline:
    """Composed train pipeline -> fixed-size sample dict.

    Stage order mirrors configs/_base_/datasets/dota1_0.py:6-15:
    RResize -> RRandomFlip [-> PolyRandomRotate] -> Normalize -> Pad.
    A stage returning None (PolyRandomRotate killing every gt) propagates
    None; the loader resamples.
    """

    def __init__(self, img_scale=(1024, 1024), flip_ratio=0.5, version='v1',
                 with_rotate=False, rotate_kwargs=None, max_gt=256,
                 seed=None):
        rng = np.random.RandomState(seed)
        self.stages = [RResize(img_scale),
                       RRandomFlip(flip_ratio, version=version, rng=rng)]
        if with_rotate:
            self.stages.append(PolyRandomRotate(
                version=version, rng=rng, **(rotate_kwargs or {})))
        self.stages += [Normalize(), Pad(32)]
        self.max_gt = max_gt

    @classmethod
    def from_config(cls, pipeline_cfg, version='v1', max_gt=256, seed=None):
        """Build from a config pipeline dict list — every stage's params
        (img_scale, flip_ratio, rotate_ratio, angles_range, mean/std,
        size_divisor) take effect exactly as in the reference
        (configs/_base_/datasets/dota1_0.py:6-15). Load/format/collect
        stages are the dataset's and batcher's job here, so they are
        accepted and skipped.
        """
        self = cls.__new__(cls)
        rng = np.random.RandomState(seed)
        skipped = {'LoadImageFromFile', 'LoadAnnotations',
                   'DefaultFormatBundle', 'Collect'}
        stages = []
        for s in pipeline_cfg:
            s = dict(s)
            t = s.pop('type')
            if t in skipped:
                continue
            elif t == 'RResize':
                stages.append(RResize(tuple(s['img_scale'])))
            elif t == 'RRandomFlip':
                stages.append(RRandomFlip(
                    flip_ratio=s.get('flip_ratio', 0.5),
                    direction=s.get('direction', 'horizontal'),
                    version=s.get('version', version), rng=rng))
            elif t == 'PolyRandomRotate':
                stages.append(PolyRandomRotate(
                    rotate_ratio=s.get('rotate_ratio', 0.5),
                    angles_range=s.get('angles_range', 180),
                    auto_bound=s.get('auto_bound', False),
                    version=s.get('version', version), rng=rng))
            elif t == 'Normalize':
                stages.append(Normalize(
                    mean=s.get('mean', (123.675, 116.28, 103.53)),
                    std=s.get('std', (58.395, 57.12, 57.375)),
                    to_rgb=s.get('to_rgb', True)))
            elif t == 'Pad':
                stages.append(Pad(s.get('size_divisor', 32),
                                  s.get('pad_val', 0.0)))
            else:
                raise ValueError(f'unknown pipeline stage type {t!r}')
        self.stages = stages
        self.max_gt = max_gt
        return self

    def pad_to(self, h, w):
        """Pin the Pad stage to an exact (h, w) canvas (static jit
        shapes); appends a Pad stage if the pipeline has none."""
        for stage in self.stages:
            if isinstance(stage, Pad):
                stage.fixed_size = (h, w)
                return
        self.stages.append(Pad(32, fixed_size=(h, w)))

    def __call__(self, results):
        for stage in self.stages:
            results = stage(results)
            if results is None:
                return None
        boxes, labels, mask = pad_gt(results['gt_bboxes'],
                                     results['gt_labels'], self.max_gt)
        return {'image': results['img'].astype(np.float32),
                'gt_bboxes': boxes, 'gt_labels': labels, 'gt_mask': mask}
