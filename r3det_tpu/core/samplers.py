"""Anchor samplers, static-shape.

Re-provides the reference's sampling layer (rotate_random_sampler.py +
mmdet PseudoSampler). The shipped configs all use FocalLoss, which routes
to PseudoSampler (rotate_anchor_head.py:62-64,81-86): every assigned
anchor participates. RRandomSampler exists for CE-loss setups: it
subsamples positives/negatives to a fixed budget — here with
score-free random masking instead of index lists (static shapes).
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplerCfg(NamedTuple):
    """Config-schema handle for RRandomSampler (hashable -> jit-static).

    Parity: rotate_random_sampler.py __init__ (num, pos_fraction,
    neg_pos_ub). ``add_gt_as_proposals`` is a proposal-based (two-stage)
    knob; anchor heads sample anchors, not proposals, so it has no
    effect in this pipeline (the reference's RAnchorHead likewise never
    passes proposals).
    """
    num: int = 256
    pos_fraction: float = 0.5
    neg_pos_ub: float = -1.0


class SampleResult(NamedTuple):
    pos_mask: jnp.ndarray     # (A,) bool
    neg_mask: jnp.ndarray     # (A,) bool


def pseudo_sample(assigned: jnp.ndarray) -> SampleResult:
    """PseudoSampler: all positives + all negatives kept."""
    return SampleResult(pos_mask=assigned > 0, neg_mask=assigned == 0)


def random_sample(rng: jax.Array, assigned: jnp.ndarray, num: int = 256,
                  pos_fraction: float = 0.5,
                  neg_pos_ub: float = -1.0) -> SampleResult:
    """RRandomSampler semantics with masks: keep at most
    num*pos_fraction random positives and fill the rest with random
    negatives. Parity: rotate_random_sampler.py (the reference shuffles
    index lists; identical distribution)."""
    pos = assigned > 0
    neg = assigned == 0
    k_pos = int(num * pos_fraction)

    def pick(rng, mask, k):
        # random scores; invalid get -inf; keep top-k by score among mask
        scores = jax.random.uniform(rng, mask.shape)
        scores = jnp.where(mask, scores, -jnp.inf)
        kth = jnp.sort(scores)[-k]
        keep = mask & (scores >= kth)
        # if mask has fewer than k entries, all of them stay
        return jnp.where(mask.sum() <= k, mask, keep)

    r1, r2 = jax.random.split(rng)
    pos_keep = pick(r1, pos, k_pos)
    n_neg_budget = num - jnp.minimum(pos_keep.sum(), k_pos)
    if neg_pos_ub > 0:
        n_neg_budget = jnp.minimum(
            n_neg_budget, (neg_pos_ub * jnp.maximum(pos_keep.sum(), 1))
            .astype(jnp.int32))
    scores = jax.random.uniform(r2, neg.shape)
    scores = jnp.where(neg, scores, -jnp.inf)
    order = jnp.argsort(-scores)
    rank = jnp.empty_like(order).at[order].set(jnp.arange(len(order)))
    neg_keep = neg & (rank < n_neg_budget)
    return SampleResult(pos_mask=pos_keep, neg_mask=neg_keep)
