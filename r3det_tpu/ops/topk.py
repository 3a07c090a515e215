"""Exact top-k via threshold select — a cheap, bit-exact `lax.top_k`.

The reference's test path keeps every (position, class) score pair and
lets torch.topk pick candidates (rotate_anchor_head.py get_bboxes /
bbox_nms_rotated.py). On TPU, XLA lowers `lax.top_k` at k in the
thousands to a full variadic sort of the operand — for the parity NMS
configuration that is a 32x80k-element sort per step, the single
largest cost of the exact-semantics path.

`exact_top_k` returns the same (values, indices) as `jax.lax.top_k`
(descending values, ties broken by ascending index) in three cheap
stages instead of one big sort:

1. map floats to order-isomorphic uint32 keys (sign-magnitude flip),
2. binary-search the k-th largest key with 32 masked count reductions
   (O(32n) streaming reads, no data movement),
3. compact the >=threshold set to k slots with a cumsum scatter
   (ties filled in ascending-index order, exactly torch/XLA's stable
   tie rule) and sort just those k keys.

The asymptotic trade: sort O(n log n) with heavy data movement vs
O(32n) elementwise passes + an O(k log k) sort with k << n.

Measured result (round 5, v5e, full parity-config serving graph,
interleaved e2e A/B x3): threshold select 168.3 patches/s vs
lax.top_k 172.2 — the 32 sequential masked count passes cost MORE
in context than XLA's sort at the model's n/k (16k/2k per level,
80k/4k in NMS), so both call sites keep `lax.top_k`. The op stays
as a tested, bit-exact alternative for geometries with much larger
n/k ratios (and as the recorded negative result).
"""
from functools import partial

import jax
import jax.numpy as jnp


def _sort_key_u32(x):
    """Order-isomorphic uint32 key for float x (any float dtype).

    Cast to f32 first: every narrower float embeds monotonically, so
    comparisons (and therefore selection and tie sets) are preserved.
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    flip = (bits >> 31) * jnp.uint32(0xFFFFFFFF) | jnp.uint32(0x80000000)
    return bits ^ flip


@partial(jax.jit, static_argnames=('k',))
def exact_top_k(x, k):
    """Drop-in `jax.lax.top_k(x, k)` over the last axis, same result.

    Bit-exact: identical values AND indices (stable ascending-index tie
    order) for any real float input, including +-inf and repeated
    values. Asymptotically cheaper than the sort-based lowering when
    k << n; falls back to `lax.top_k` when k is the whole axis.
    """
    n = x.shape[-1]
    if k >= n or k <= 0:
        return jax.lax.top_k(x, k)
    lead = x.shape[:-1]
    xf = x.reshape(-1, n)
    b = xf.shape[0]
    u = _sort_key_u32(xf)                                # (B, n)

    # k-th largest key: build the threshold MSB-first; keep a candidate
    # bit iff at least k keys are >= the candidate.
    def bit_step(i, t):
        cand = t | (jnp.uint32(1) << (jnp.uint32(31) - i.astype(jnp.uint32)))
        cnt = jnp.sum((u >= cand[:, None]).astype(jnp.int32), axis=-1)
        return jnp.where(cnt >= k, cand, t)

    thr = jax.lax.fori_loop(0, 32, bit_step, jnp.zeros((b,), jnp.uint32))

    # Compact the winning set into k slots: all strictly-greater keys
    # (guaranteed < k of them), then ties at the threshold in ascending
    # index order until the budget fills — the stable tie rule.
    gt = u > thr[:, None]
    eq = u == thr[:, None]
    cgt = jnp.cumsum(gt, axis=-1, dtype=jnp.int32)
    ceq = jnp.cumsum(eq, axis=-1, dtype=jnp.int32)
    ngt = cgt[:, -1:]
    pos = jnp.where(gt, cgt - 1, jnp.where(eq, ngt + ceq - 1, k))
    pos = jnp.minimum(pos, k)                            # overflow slot
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    sel = jnp.zeros((b, k + 1), jnp.int32).at[rows, pos].set(src)[:, :k]

    # Final order: stable ascending sort on the complemented key ==
    # descending values with ascending-index ties (compaction emitted
    # ascending indices within each key value).
    keys = jnp.take_along_axis(u, sel, axis=-1)
    _, sel = jax.lax.sort_key_val(~keys, sel, dimension=-1, is_stable=True)
    vals = jnp.take_along_axis(xf, sel, axis=-1)
    return (vals.reshape(lead + (k,)), sel.reshape(lead + (k,)))
