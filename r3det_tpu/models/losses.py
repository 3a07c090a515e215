"""Detection losses — re-provides the mmdet losses the reference configs
use (FocalLoss, SmoothL1Loss, L1Loss — SURVEY.md §2.9) as pure jnp.

All losses follow mmdet's weighted-reduce contract: elementwise loss *
weight, summed, divided by ``avg_factor``.
"""
import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits, labels, weights, num_classes, avg_factor,
                       gamma=2.0, alpha=0.25):
    """Sigmoid focal loss (RetinaNet), mmdet semantics.

    Args:
      logits: (N, C) raw class logits (C = num_classes, sigmoid head).
      labels: (N,) int in [0, C]; label == C means background (all-zero
        one-hot target) — mmdet's BG convention.
      weights: (N,) per-anchor weight.
      num_classes: C.
      avg_factor: scalar normalizer.
    """
    labels = labels.astype(jnp.int32)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = p * one_hot + (1 - p) * (1 - one_hot)
    focal_weight = (alpha * one_hot + (1 - alpha) * (1 - one_hot)) * \
        (1 - pt) ** gamma
    # numerically-stable BCE with logits
    bce = jnp.maximum(logits, 0) - logits * one_hot + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = (bce * focal_weight).sum(-1)
    return (loss * weights).sum() / jnp.maximum(avg_factor, 1.0)


def sigmoid_bce_loss(logits, labels, weights, num_classes, avg_factor):
    """Sigmoid cross-entropy, mmdet CrossEntropyLoss(use_sigmoid=True).

    The cls loss that activates the sampler route in the reference
    (rotate_anchor_head.py:62-64: FocalLoss disables sampling). Labels
    expand to one-hot with label == C -> all-zero background row
    (mmdet _expand_onehot_labels); per-anchor weights broadcast over
    classes; sum / avg_factor.
    """
    labels = labels.astype(jnp.int32)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    bce = jnp.maximum(logits, 0) - logits * one_hot + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = bce.sum(-1)
    return (loss * weights).sum() / jnp.maximum(avg_factor, 1.0)


def smooth_l1_loss(pred, target, weights, avg_factor, beta=1.0 / 9.0):
    """Smooth L1 with per-anchor weights broadcast over the box dims."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)
    if weights.ndim == loss.ndim - 1:
        weights = weights[..., None]
    return (loss * weights).sum() / jnp.maximum(avg_factor, 1.0)


def l1_loss(pred, target, weights, avg_factor):
    loss = jnp.abs(pred - target)
    if weights.ndim == loss.ndim - 1:
        weights = weights[..., None]
    return (loss * weights).sum() / jnp.maximum(avg_factor, 1.0)
