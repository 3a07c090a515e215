"""convex_sort: masked convex-ordering of candidate points.

API-parity re-provision of the reference's ``convex_sort`` extension
(convex/convex_wrapper.py + convex_cuda.cu: batched masked hull ordering
over up-to-24 candidate points, returning sorted index tensors padded
with -1). The reference uses it in the aligned v3 IoU path.

TPU-native implementation: candidates of a convex-polygon boundary are
ordered by angle around their masked centroid (no sequential Graham
scan); masked slots sort to the end as -1. For inputs that are convex-
boundary candidates (the only reference use), the result is a valid
convex traversal, matching the CUDA op's contract.
"""
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=('circular',))
def convex_sort(pts, masks, circular=True):
    """pts (..., K, 2), masks (..., K) bool -> ordered indices (..., K+1)
    if circular (first index repeated to close the ring, reference
    behavior) else (..., K); invalid slots are -1."""
    x = pts[..., 0]
    y = pts[..., 1]
    mf = masks.astype(x.dtype)
    denom = jnp.maximum(mf.sum(-1, keepdims=True), 1.0)
    cx = (x * mf).sum(-1, keepdims=True) / denom
    cy = (y * mf).sum(-1, keepdims=True) / denom
    ang = jnp.arctan2(y - cy, x - cx)
    ang = jnp.where(masks, ang, jnp.inf)           # invalid sort last
    order = jnp.argsort(ang, axis=-1)
    valid_sorted = jnp.take_along_axis(masks, order, axis=-1)
    idx = jnp.where(valid_sorted, order, -1)
    if circular:
        first = idx[..., :1]
        return jnp.concatenate([idx, first], axis=-1)
    return idx
