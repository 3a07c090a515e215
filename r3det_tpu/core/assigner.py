"""MaxIoU assignment over padded ground truth — fully vectorized jnp.

Re-provides mmdet's MaxIoUAssigner semantics (the reference builds it from
config, configs/r3det/r3det_r50_fpn_1x_dota_v1.py:75-96) without any
per-image Python loop: the whole batch assigns under one vmap.

Assignment codes per anchor: -1 = ignore, 0 = negative, k>0 = gt index k-1.

Padded-gt handling (the static-shape twist): gt rows beyond the per-image
count are masked out of both the argmax and the low-quality match, so the
result is identical to running mmdet on the unpadded list.

Documented deviation: mmdet's low-quality step assigns every anchor tying a
gt's best IoU even when that best IoU is 0 (min_pos_iou=0 makes the
condition `0 >= 0` true) — a degenerate case that never fires on real data
but fires constantly on padded/synthetic inputs. We additionally require
gt_max > 0.
"""
from typing import NamedTuple

import jax.numpy as jnp


class AssignResult(NamedTuple):
    assigned: jnp.ndarray        # (A,) int32: -1 ignore / 0 neg / k = gt k-1
    max_overlaps: jnp.ndarray    # (A,) float32


def max_iou_assign(overlaps: jnp.ndarray,
                   gt_mask: jnp.ndarray,
                   pos_iou_thr: float,
                   neg_iou_thr: float,
                   min_pos_iou: float = 0.0,
                   match_low_quality: bool = True,
                   gt_max_assign_all: bool = True) -> AssignResult:
    """Assign anchors to gts from a dense (G, A) overlap matrix.

    Args:
      overlaps: (G, A) IoU matrix, gt-major (mmdet orientation).
      gt_mask: (G,) bool — True for real gt rows, False for padding.
      pos_iou_thr / neg_iou_thr / min_pos_iou: mmdet thresholds.
      match_low_quality: give each gt its best anchor even below pos thr.
      gt_max_assign_all: on ties, give the gt every tying anchor.
    """
    num_gt = overlaps.shape[0]
    ov = jnp.where(gt_mask[:, None], overlaps, -1.0)

    max_overlaps = ov.max(axis=0)                       # (A,)
    argmax_overlaps = ov.argmax(axis=0)

    assigned = jnp.full(max_overlaps.shape, -1, dtype=jnp.int32)
    assigned = jnp.where((max_overlaps >= 0) & (max_overlaps < neg_iou_thr),
                         0, assigned)
    # no (valid) gt at all: every anchor is a negative, not ignored —
    # mmdet's num_gt == 0 branch; keeps background supervision alive on
    # empty images.
    assigned = jnp.where(gt_mask.any(), assigned, 0)
    assigned = jnp.where(max_overlaps >= pos_iou_thr,
                         argmax_overlaps.astype(jnp.int32) + 1, assigned)

    if match_low_quality:
        gt_max = ov.max(axis=1)                          # (G,)
        eligible = gt_mask & (gt_max >= min_pos_iou) & (gt_max > 0)
        if gt_max_assign_all:
            claims = (ov == gt_max[:, None]) & eligible[:, None]
        else:
            best_anchor = ov.argmax(axis=1)
            claims = (jnp.arange(ov.shape[1])[None, :] ==
                      best_anchor[:, None]) & eligible[:, None]
        # mmdet iterates gts in order, later gts overriding earlier ones:
        # pick the highest claiming gt index per anchor.
        gt_ids = jnp.arange(num_gt, dtype=jnp.int32)
        claimed_by = jnp.where(claims, gt_ids[:, None], -1).max(axis=0)
        assigned = jnp.where(claimed_by >= 0, claimed_by + 1, assigned)

    max_overlaps = jnp.maximum(max_overlaps, 0.0)
    return AssignResult(assigned=assigned, max_overlaps=max_overlaps)
