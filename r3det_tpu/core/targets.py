"""Training-target construction — vmapped over the batch, static shapes.

Re-provides the reference's RAnchorHead._get_targets_single / get_targets
(rotate_anchor_head.py:172-379), replacing the per-image Python
`multi_apply` loop + boolean indexing + `unmap` with one vmap over a padded
batch. Ground truth arrives as fixed-size (MAX_GT, 5) boxes + (MAX_GT,)
labels + (MAX_GT,) mask per image.

Assignment IoU backends:
- ``circum_hbb`` (base-head path, assign_by_circumhbbox — rotate_anchor_
  head.py:220-224): gts are replaced by circumscribed boxes and anchors are
  axis-aligned, so overlap reduces to cheap axis-aligned IoU — a large
  constant-factor win over running the rotated kernel on theta=0 operands.
- ``rotated`` (refine-stage path): exact rotated IoU via ops.rotated_iou.
"""
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import rtransforms as rt
from .assigner import max_iou_assign
from .samplers import SamplerCfg, random_sample
from ..ops.rotated_iou import rotated_iou_pairwise


class TargetConfig(NamedTuple):
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    pos_weight: float = -1.0
    assign_by_circumhbbox: Optional[str] = 'v1'   # None -> rotated assign
    angle_version: str = 'v1'                      # coder version
    hbb_anchors: bool = False                      # anchors are xyxy (4)
    # RRandomSampler route (rotate_random_sampler.py via rotate_anchor_
    # head.py:81-86): subsample pos/neg to a fixed budget. None ->
    # PseudoSampler (every assigned anchor participates). Requires an
    # ``rng`` arg to anchor_targets when set.
    sampler: Optional[SamplerCfg] = None


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray          # (B, A) int32, num_classes = background
    label_weights: jnp.ndarray   # (B, A) float32
    bbox_targets: jnp.ndarray    # (B, A, 5) float32 encoded deltas
    bbox_weights: jnp.ndarray    # (B, A) float32 (broadcast over 5 dims)
    num_pos: jnp.ndarray         # (B,) int32  (per image, post-sampling)
    assigned_gt: jnp.ndarray     # (B, A) int32 (-1 ignore / 0 neg / k=gt k-1)
    num_neg: jnp.ndarray = None  # (B,) int32  (per image, post-sampling)


def _hbb_iou(boxes1_xyxy, boxes2_xyxy):
    """Axis-aligned IoU (G, 4) x (A, 4) -> (G, A)."""
    x11, y11, x12, y12 = [boxes1_xyxy[:, i][:, None] for i in range(4)]
    x21, y21, x22, y22 = [boxes2_xyxy[:, i][None, :] for i in range(4)]
    iw = jnp.maximum(jnp.minimum(x12, x22) - jnp.maximum(x11, x21), 0.0)
    ih = jnp.maximum(jnp.minimum(y12, y22) - jnp.maximum(y11, y21), 0.0)
    inter = iw * ih
    a1 = jnp.maximum(x12 - x11, 0.0) * jnp.maximum(y12 - y11, 0.0)
    a2 = jnp.maximum(x22 - x21, 0.0) * jnp.maximum(y22 - y21, 0.0)
    return inter / jnp.maximum(a1 + a2 - inter, 1e-10)


def _targets_single(anchors, gt_bboxes, gt_labels, gt_mask, rng, encode_fn,
                    num_classes, cfg: TargetConfig):
    """One image. anchors (A, 5|4); gt (G, 5); labels (G,); mask (G,);
    rng: per-image PRNG key when cfg.sampler is set, else None."""
    version = cfg.angle_version
    if cfg.assign_by_circumhbbox is not None:
        # Circumscribed axis-aligned assignment (cheap fast path).
        hv = cfg.assign_by_circumhbbox
        gt_assign = rt.obb2xyxy(rt.obb2hbb(gt_bboxes, hv), hv)
        if cfg.hbb_anchors:
            anchors_assign = anchors
        else:
            anchors_assign = rt.obb2xyxy(anchors, version)
        overlaps = _hbb_iou(gt_assign, anchors_assign)
    else:
        anc5 = rt.hbb2obb(anchors, version) if cfg.hbb_anchors else anchors
        # shipped configs pair the calculator with the angle version
        # (RBboxOverlaps2D_v{1,2,3}); v2/v3 backends use the negated
        # (detectron2/mmcv) angle convention — see ops.rotated_iou
        if version != 'v1':
            from ..ops.rotated_iou import negate_theta
            overlaps = rotated_iou_pairwise(negate_theta(gt_bboxes),
                                            negate_theta(anc5))
        else:
            overlaps = rotated_iou_pairwise(gt_bboxes, anc5)

    res = max_iou_assign(overlaps, gt_mask,
                         pos_iou_thr=cfg.pos_iou_thr,
                         neg_iou_thr=cfg.neg_iou_thr,
                         min_pos_iou=cfg.min_pos_iou)
    if cfg.sampler is not None:
        # RRandomSampler route: keep <= num*pos_fraction random
        # positives, fill the budget with random negatives
        # (rotate_random_sampler.py _sample_pos/_sample_neg); anchors
        # not sampled get zero weight, exactly like the reference's
        # index-list sampling_result (rotate_anchor_head.py:241-277)
        s = cfg.sampler
        sr = random_sample(rng, res.assigned, num=s.num,
                           pos_fraction=s.pos_fraction,
                           neg_pos_ub=s.neg_pos_ub)
        pos, neg = sr.pos_mask, sr.neg_mask
    else:
        pos = res.assigned > 0
        neg = res.assigned == 0
    gt_idx = jnp.maximum(res.assigned - 1, 0)

    matched_gt = gt_bboxes[gt_idx]                         # (A, 5)
    bbox_targets = encode_fn(anchors, matched_gt)
    bbox_targets = jnp.where(pos[:, None], bbox_targets, 0.0)
    bbox_weights = pos.astype(jnp.float32)

    labels = jnp.where(pos, gt_labels[gt_idx], num_classes).astype(jnp.int32)
    pw = 1.0 if cfg.pos_weight <= 0 else cfg.pos_weight
    label_weights = jnp.where(pos, pw, 0.0) + jnp.where(neg, 1.0, 0.0)

    return (labels, label_weights.astype(jnp.float32), bbox_targets,
            bbox_weights, pos.sum().astype(jnp.int32),
            res.assigned - 1, neg.sum().astype(jnp.int32))


@partial(jax.jit, static_argnames=('encode_fn', 'num_classes', 'cfg',
                                   'per_image_anchors'))
def anchor_targets(anchors, gt_bboxes, gt_labels, gt_mask, encode_fn,
                   num_classes, cfg: TargetConfig,
                   per_image_anchors: bool = False,
                   rng=None) -> AnchorTargets:
    """Batched targets.

    Args:
      anchors: (A, 5|4) shared grid anchors, or (B, A, 5) per-image rois
        when ``per_image_anchors`` (refine stages).
      gt_bboxes: (B, G, 5); gt_labels: (B, G) int; gt_mask: (B, G) bool.
      encode_fn: coder encode, e.g. DeltaXYWHAOBBoxCoder(...).encode.
      num_classes: background label value.
      cfg: TargetConfig (hashable, static).
      rng: PRNG key, required when cfg.sampler is set (split per image).
    """
    single = partial(_targets_single, encode_fn=encode_fn,
                     num_classes=num_classes, cfg=cfg)
    if cfg.sampler is not None:
        if rng is None:
            raise ValueError('cfg.sampler is set: anchor_targets needs rng')
        rngs = jax.random.split(rng, gt_bboxes.shape[0])
    else:
        rngs = None
    in_axes = (0 if per_image_anchors else None, 0, 0, 0,
               None if rngs is None else 0)
    out = jax.vmap(single, in_axes=in_axes)(anchors, gt_bboxes, gt_labels,
                                            gt_mask, rngs)
    return AnchorTargets(labels=out[0], label_weights=out[1],
                         bbox_targets=out[2], bbox_weights=out[3],
                         num_pos=out[4], assigned_gt=out[5],
                         num_neg=out[6])


def num_total_samples(num_pos: jnp.ndarray) -> jnp.ndarray:
    """Reference normalizer: sum over images of max(num_pos, 1)
    (rotate_anchor_head.py:362)."""
    return jnp.maximum(num_pos, 1).sum().astype(jnp.float32)
