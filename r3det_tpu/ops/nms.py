"""Rotated NMS, TPU-native and shape-static.

Replaces the reference's four NMS extensions (rnms_ext "v1",
ml_nms_rotated "v2", nms_rotated_ext "v3", poly_nms — SURVEY.md §2.4)
with ONE greedy suppression core over a precomputed IoU matrix, plus
version policies:

- ``v1``  class-offset on box centers before a single class-blind pass
  (parity: rnms_wrapper.py:7-69);
- ``v2``  label-aware: IoU gated to 0 across labels
  (parity: ml_nms_rotated/src/box_iou_rotated_utils.h:319);
- ``v3``  class-offset by circumscribed-hbb extent + tiny-box skip
  (parity: nms_rotated_wrapper.py:36-98);
- ``poly`` greedy NMS on scored convex quads (parity: poly_nms_cuda.cu).

Everything is fixed-shape: inputs are padded to a static K, outputs are
padded to a static ``max_out`` with a valid-count. Greedy order-dependence
is preserved exactly by a fixpoint sweep in score order (see
``_greedy_keep``) — the same suppression semantics as the reference's
bitmask kernel + host sweep, but with no device→host sync.
"""
from functools import partial

import jax
import jax.numpy as jnp

from .rotated_iou import rotated_iou_pairwise, quad_iou_pairwise

NEG_INF = -1e30


def _greedy_keep(iou, valid, iou_thr):
    """Greedy suppression over score-desc-sorted boxes.

    iou: (K, K) pairwise IoU of the sorted boxes; valid: (K,) bool.
    Returns keep mask (K,). Exactly matches sequential greedy NMS.

    Fixpoint formulation instead of a K-step sequential sweep: iterate
    k <- valid & ~any_j (S[j, i] & k[j]) with S the strictly-upper
    suppression relation. Because suppression only flows from lower to
    higher indices (a DAG in score order), box i stabilizes one round
    after all its suppressors do, so the iteration converges to the
    exact greedy solution in (keep/suppress chain depth) rounds —
    typically < 10 — each round one cheap masked reduction, replacing
    2000 sequential dynamic-slice steps.
    """
    k = iou.shape[0]
    idx = jnp.arange(k)
    supp = (iou > iou_thr) & (idx[:, None] < idx[None, :])   # S[j, i], j<i

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(supp & keep[:, None], axis=0)
        return valid & ~suppressed, keep, it + 1

    init = (valid, jnp.zeros_like(valid), jnp.zeros((), jnp.int32))
    keep, _, _ = jax.lax.while_loop(cond, body, init)
    return keep


BLOCK_S = 256


def _greedy_keep_blocked(iou, valid, iou_thr, block=BLOCK_S):
    """Exact greedy suppression, block-sequential formulation.

    Equivalent to _greedy_keep but reads the suppression matrix ONCE:
    scan score-ordered blocks of ``block`` boxes; each step applies the
    (already final) suppression from earlier blocks in one masked
    reduction, then resolves intra-block chains with a fixpoint on the
    tiny (block, block) submatrix. The deep-chain worst case that costs
    the full-matrix fixpoint dozens of (K, K) passes costs here one
    (K, block) column slice per block plus O(chain-depth-within-block)
    passes over (block, block).
    """
    k = iou.shape[0]
    pad = (-k) % block
    if pad:
        iou = jnp.pad(iou, ((0, pad), (0, pad)))
        valid = jnp.pad(valid, (0, pad))
    kp = k + pad
    idx = jnp.arange(kp)
    supp = (iou > iou_thr) & (idx[:, None] < idx[None, :])   # S[j, i], j<i
    n_blocks = kp // block
    ridx = jnp.arange(block)

    def step(keep, b):
        start = b * block
        # suppression flowing in from earlier (final) keeps: (kp, block)
        cols = jax.lax.dynamic_slice(supp, (0, start), (kp, block))
        vblk = jax.lax.dynamic_slice(valid, (start,), (block,))
        ext = jnp.any(cols & keep[:, None], axis=0)
        init_b = vblk & ~ext
        sub = jax.lax.dynamic_slice(cols, (start, 0), (block, block))

        def cond(state):
            kb, prev, it = state
            return (it < block) & jnp.any(kb != prev)

        def body(state):
            kb, _, it = state
            suppressed = jnp.any(sub & kb[:, None], axis=0)
            return init_b & ~suppressed, kb, it + 1

        kb, _, _ = jax.lax.while_loop(
            cond, body, (init_b, jnp.zeros_like(init_b),
                         jnp.zeros((), jnp.int32)))
        keep = jax.lax.dynamic_update_slice(keep, kb, (start,))
        return keep, None

    keep0 = jnp.zeros((kp,), bool)
    keep, _ = jax.lax.scan(step, keep0, jnp.arange(n_blocks))
    return keep[:k]




STREAM_THRESHOLD = 4096      # candidates above this use the streamed sweep
STREAM_BLOCK = 512


def _greedy_keep_streamed(boxes_s, valid_s, labels_s, iou_thr, vcount,
                          label_aware, block=STREAM_BLOCK):
    """Greedy suppression without materializing the (K, K) IoU matrix.

    The dense path's (K, K) matrix is 256 MB at K=8000 — times a vmapped
    batch that OOMs HBM. Here each scan step computes one (K, block) IoU
    column slab on the fly (the valid-prefix kernel skips rows past
    min(vcount, start + block) — exactly the j < i rows greedy needs),
    applies the already-final suppression from earlier blocks, and
    resolves intra-block chains with the same tiny fixpoint as
    _greedy_keep_blocked. Peak memory O(K * block); identical keep sets.
    """
    from .pallas_iou import rotated_iou_pallas
    from .rotated_iou import rotated_iou_pairwise
    k = boxes_s.shape[0]
    pad = (-k) % block
    if pad:
        boxes_s = jnp.pad(boxes_s, ((0, pad), (0, 0)))
        valid_s = jnp.pad(valid_s, (0, pad))
        if labels_s is not None:
            labels_s = jnp.pad(labels_s, (0, pad), constant_values=-2)
    kp = k + pad
    row_idx = jnp.arange(kp)
    ridx = jnp.arange(block)

    def step(keep, b):
        start = b * block
        blk_boxes = jax.lax.dynamic_slice(boxes_s, (start, 0), (block, 5))
        v_pass = jnp.minimum(vcount, start + block)
        cols = jax.lax.platform_dependent(
            boxes_s, blk_boxes, v_pass,
            tpu=lambda ba, bb, v: rotated_iou_pallas(ba, bb,
                                                     valid_count=v),
            default=lambda ba, bb, v: rotated_iou_pairwise(
                ba, bb, backend='jnp'))
        if label_aware and labels_s is not None:
            blk_labels = jax.lax.dynamic_slice(labels_s, (start,),
                                               (block,))
            cols = jnp.where(labels_s[:, None] == blk_labels[None, :],
                             cols, 0.0)
        supp = (cols > iou_thr) & \
            (row_idx[:, None] < (start + ridx)[None, :])
        vblk = jax.lax.dynamic_slice(valid_s, (start,), (block,))
        ext = jnp.any(supp & keep[:, None], axis=0)
        init_b = vblk & ~ext
        sub = jax.lax.dynamic_slice(supp, (start, 0), (block, block))

        def cond(state):
            kb, prev, it = state
            return (it < block) & jnp.any(kb != prev)

        def body(state):
            kb, _, it = state
            suppressed = jnp.any(sub & kb[:, None], axis=0)
            return init_b & ~suppressed, kb, it + 1

        kb, _, _ = jax.lax.while_loop(
            cond, body, (init_b, jnp.zeros_like(init_b),
                         jnp.zeros((), jnp.int32)))
        keep = jax.lax.dynamic_update_slice(keep, kb, (start,))
        return keep, None

    keep0 = jnp.zeros((kp,), bool)
    keep, _ = jax.lax.scan(step, keep0, jnp.arange(kp // block))
    return keep[:k]


@partial(jax.jit, static_argnames=('max_out', 'negate_angle'))
def rnms(dets, iou_thr, max_out=2000, negate_angle=False):
    """Single-class rotated NMS on (N, 6) scored dets.

    Returns (keep_idx (max_out,) padded with -1, num_kept). Matches the
    reference v1 op's greedy semantics (rnms_kernel.cu:270-335); unlike
    the reference we do not re-sort kept indices ascending — callers use
    score order (the wrappers below gather, so order only affects
    tie-breaks in downstream truncation, which happens in score order in
    both frameworks). negate_angle=True reproduces the v3 backend
    (obb_nms / nms_rotated_ext) on single-class dets.
    """
    boxes = dets[:, :5]
    scores = dets[:, 5]
    return _nms_core(boxes, scores, iou_thr, max_out,
                     negate_angle=negate_angle)


def _nms_core(boxes, scores, iou_thr, max_out, valid=None, labels=None,
              label_aware=False, negate_angle=False, presorted=False):
    """Shared static-shape NMS: sort, IoU, greedy sweep, top-max_out.

    negate_angle: use the detectron2/mmcv angle convention for the
    suppression IoU (reference v3/'mmcv' NMS backends — see
    ops.rotated_iou.negate_theta). Gathered outputs keep original boxes.

    presorted: boxes/scores/valid already score-descending with every
    valid candidate in a prefix (multiclass feeds top_k output) — skips
    the argsort.

    Cost scales with the LIVE candidate count: invalid candidates (below
    score_thr etc.) must be encoded as scores of NEG_INF so the sort
    clusters valid boxes into a prefix; the TPU IoU kernel then skips
    every tile past that prefix (valid_count scalar prefetch), and the
    blocked sweep reads the suppression matrix once.
    """
    from .rotated_iou import negate_theta
    k = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((k,), dtype=bool)
    if presorted:
        order = jnp.arange(k)
        boxes_s = boxes
        valid_s = valid
        labels_s = labels
    else:
        order = jnp.argsort(jnp.where(valid, -scores, jnp.inf))
        boxes_s = boxes[order]
        valid_s = valid[order]                  # prefix of ones
        labels_s = labels[order] if labels is not None else None
    if negate_angle:
        boxes_s = negate_theta(boxes_s)
    # prefix length covering every valid entry (valid may have holes —
    # e.g. the v3 tiny-box skip — so last-valid+1, not sum)
    vcount = jnp.where(
        jnp.any(valid_s),
        k - jnp.argmax(valid_s[::-1]).astype(jnp.int32), 0)
    if k > STREAM_THRESHOLD:
        # large candidate budgets (dense-scene nms_candidates) stream
        # (K, block) IoU slabs instead of materializing (K, K) — the
        # dense matrix at K=8000 under a vmapped batch exceeds HBM
        keep = _greedy_keep_streamed(boxes_s, valid_s, labels_s, iou_thr,
                                     vcount, label_aware)
    else:
        from .pallas_iou import rotated_iou_pallas
        # greedy suppression reads only j < i pairs: the TPU kernel
        # skips the lower triangle at tile granularity (~2x less IoU
        # work) plus every tile past the valid prefix. Resolved per
        # lowering platform so CPU-mesh jits take the jnp path.
        iou = jax.lax.platform_dependent(
            boxes_s, vcount,
            tpu=lambda b, v: rotated_iou_pallas(b, b, upper_only=True,
                                                valid_count=v),
            default=lambda b, v: rotated_iou_pairwise(b, b,
                                                      backend='jnp'))
        if label_aware and labels_s is not None:
            same = labels_s[:, None] == labels_s[None, :]
            iou = jnp.where(same, iou, 0.0)
        keep = _greedy_keep_blocked(iou, valid_s, iou_thr)
    # Indices (into the original array) of kept boxes, in score order,
    # padded with -1.
    rank = jnp.where(keep, jnp.arange(k), k + 1)
    sel = jnp.argsort(rank)[:max_out]                 # kept first
    kept_sorted = keep[sel]
    keep_idx = jnp.where(kept_sorted, order[sel], -1)
    return keep_idx, jnp.sum(keep)


@partial(jax.jit, static_argnames=('max_out',))
def batched_rnms(boxes, scores, labels, iou_thr, max_out=2000):
    """v1 multi-class NMS.

    Parity: rnms_wrapper.py:37-69 — its label*(extent+1) center-offset
    trick makes cross-class IoU exactly 0, which is what label gating
    computes directly (equivalence is unit-tested). Returns
    (dets (max_out, 6), labels (max_out,), num_kept); invalid rows
    zeroed, labels -1.
    """
    keep_idx, n = _nms_core(boxes, scores, iou_thr, max_out, labels=labels,
                            label_aware=True)
    return _gather_dets(boxes, scores, labels, keep_idx), n


@partial(jax.jit, static_argnames=('max_out',))
def ml_nms_rotated(boxes, scores, labels, iou_thr, max_out=2000):
    """v2 multi-class NMS: label-aware IoU gating.

    Parity: ml_nms_rotated op (IoU hard-zero across labels).
    """
    keep_idx, n = _nms_core(boxes, scores, iou_thr, max_out, labels=labels,
                            label_aware=True)
    return _gather_dets(boxes, scores, labels, keep_idx), n


@partial(jax.jit, static_argnames=('max_out',))
def obb_batched_nms(boxes, scores, labels, iou_thr, max_out=2000,
                    small_box_thr=1e-3):
    """v3 multi-class NMS: tiny-box skip + detectron2/mmcv angle
    convention; label gating replaces the hbb-extent class-offset trick
    (same keep sets, see batched_rnms).

    Parity: nms_rotated_wrapper.py:36-98.
    """
    valid = jnp.minimum(boxes[:, 2], boxes[:, 3]) >= small_box_thr
    keep_idx, n = _nms_core(boxes, scores, iou_thr, max_out, valid=valid,
                            labels=labels, label_aware=True,
                            negate_angle=True)
    return _gather_dets(boxes, scores, labels, keep_idx), n


@partial(jax.jit, static_argnames=('max_out',))
def poly_nms(polys_scored, iou_thr, max_out=2000):
    """Greedy NMS on scored convex quads (N, 9). Parity: poly_nms_cuda.cu.

    Returns (keep_idx (max_out,) padded -1, num_kept).
    """
    polys = polys_scored[:, :8]
    scores = polys_scored[:, 8]
    k = polys.shape[0]
    order = jnp.argsort(-scores)
    polys_s = polys[order]
    iou = quad_iou_pairwise(polys_s, polys_s)
    keep = _greedy_keep(iou, jnp.ones((k,), bool), iou_thr)
    rank = jnp.where(keep, jnp.arange(k), k + 1)
    sel = jnp.argsort(rank)[:max_out]
    keep_idx = jnp.where(keep[sel], order[sel], -1)
    return keep_idx, jnp.sum(keep)


def _gather_dets(boxes, scores, labels, keep_idx):
    """Gather (max_out, 6) dets + (max_out,) labels; pad rows zero/-1."""
    ok = keep_idx >= 0
    safe = jnp.maximum(keep_idx, 0)
    dets = jnp.concatenate([boxes[safe], scores[safe, None]], axis=-1)
    dets = jnp.where(ok[:, None], dets, 0.0)
    out_labels = jnp.where(ok, labels[safe], -1)
    return dets, out_labels


def _select_candidates(mboxes, mscores, score_thr, k, approx_topk):
    """Per-image candidate selection over (position, class) pairs.

    Flattens per-class boxes/scores, gates by score_thr (NEG_INF
    padding), and returns the top-k candidates score-descending
    (exact lax.top_k tie order = stable ascending index):
    (boxes (k, 5), scores (k,), labels (k,), valid (k,)). When
    k >= N*C this is a full sort — every pair above score_thr
    competes, the exact reference semantics.
    """
    n, cp1 = mscores.shape
    c = cp1 - 1
    scores = mscores[:, :c]                          # drop BG column
    if mboxes.ndim == 2:
        boxes = jnp.broadcast_to(mboxes[:, None, :], (n, c, 5))
    else:
        boxes = mboxes
    flat_scores = scores.reshape(-1)
    flat_boxes = boxes.reshape(-1, 5)
    flat_labels = jnp.tile(jnp.arange(c), n)
    gated = jnp.where(flat_scores > score_thr, flat_scores, NEG_INF)
    k = min(k, flat_scores.shape[0])
    if approx_topk and k < flat_scores.shape[0]:
        top_scores, top_idx = jax.lax.approx_max_k(gated, k)
    else:
        # exact selection. ops/topk.py's threshold select was built to
        # dodge this sort but LOSES its in-context e2e A/B (168.3 vs
        # 172.2 patches/s, round 5) — lax.top_k stays.
        top_scores, top_idx = jax.lax.top_k(gated, k)
    return (flat_boxes[top_idx], top_scores, flat_labels[top_idx],
            top_scores > NEG_INF / 2)


def _sweep_dets(top_boxes, top_scores, top_labels, valid, iou_thr,
                version, max_num):
    """Greedy sweep + det gathering on score-sorted candidates."""
    if version == 'v3':
        valid = valid & (jnp.minimum(top_boxes[:, 2],
                                     top_boxes[:, 3]) >= 1e-3)
    keep_idx, num = _nms_core(top_boxes, top_scores, iou_thr, max_num,
                              valid=valid, labels=top_labels,
                              label_aware=True,
                              negate_angle=version in ('v3', 'mmcv'),
                              presorted=True)
    dets, labels_out = _gather_dets(top_boxes, top_scores, top_labels,
                                    keep_idx)
    return dets, labels_out, jnp.minimum(num, max_num)


@partial(jax.jit, static_argnames=('version', 'max_num', 'pre_topk',
                                   'approx_topk', 'small_k'))
def multiclass_nms_rotated_batched(mboxes, mscores, score_thr, iou_thr,
                                   version='v1', max_num=2000,
                                   pre_topk=2000, approx_topk=False,
                                   small_k=None):
    """Batched multiclass NMS with a runtime-adaptive EXACT sweep budget.

    The K² costs of the greedy sweep (IoU tile grid, (K, K)
    suppression materialization, scan steps) scale with the static
    candidate budget even when every candidate is padding — measured
    +17 ms/b32 going 2000 -> 4000 on an EMPTY scene (round 5). But the
    big budget only changes results when more than small_k candidates
    are live: candidates are score-sorted with a NEG_INF-padded
    suffix, so if every image's live count fits in the first small_k
    rows, sweeping just those rows is keep-set-IDENTICAL to the full
    sweep (the suffix can neither keep nor suppress). A batch-level
    `lax.cond` (unbatched predicate — stays a real cond, not a
    select) picks the branch at runtime: typical scenes pay the
    serving-budget sweep, dense scenes pay the full exact sweep, and
    the result is bit-identical to `vmap(multiclass_nms_rotated)`
    either way (tests/test_nms.py::test_adaptive_budget_*).

    mboxes: (B, N, 5) or (B, N, C, 5); mscores: (B, N, C+1).
    small_k: small-branch sweep budget; None or >= pre_topk disables
    the cond (single full-budget sweep). Clamped to >= max_num so both
    branches emit (max_num,) outputs.
    """
    kb = min(pre_topk, mscores.shape[1] * (mscores.shape[2] - 1))
    sel = jax.vmap(
        lambda bx, sc: _select_candidates(bx, sc, score_thr, kb,
                                          approx_topk))(mboxes, mscores)
    top_boxes, top_scores, top_labels, valid = sel
    sweep = partial(_sweep_dets, iou_thr=iou_thr, version=version,
                    max_num=max_num)
    if small_k is None or max(small_k, max_num) >= kb:
        return jax.vmap(sweep)(*sel)
    sk = max(small_k, max_num)

    def small(args):
        tb, ts, tl, vv = args
        return jax.vmap(sweep)(tb[:, :sk], ts[:, :sk], tl[:, :sk],
                               vv[:, :sk])

    def big(args):
        return jax.vmap(sweep)(*args)

    # valid is a per-image prefix (score-sorted, NEG_INF suffix), so
    # its sum IS the prefix length; the v3 tiny-box skip only pokes
    # holes INSIDE the prefix (applied in _sweep_dets), never extends.
    live = jnp.max(jnp.sum(valid.astype(jnp.int32), axis=1))
    return jax.lax.cond(live <= sk, small, big, sel)


@partial(jax.jit, static_argnames=('version', 'max_num', 'pre_topk',
                                   'approx_topk'))
def multiclass_nms_rotated(mboxes, mscores, score_thr, iou_thr,
                           version='v1', max_num=2000, pre_topk=2000,
                           approx_topk=False):
    """Multi-class rotated NMS over per-class scores, shape-static.

    Args:
      mboxes: (N, 5) or (N, C, 5) decoded boxes per position (shared
        across classes when (N, 5), matching the reference's shared-reg
        heads — bbox_nms_rotated.py:98-109).
      mscores: (N, C+1) class scores, background last (sigmoid-padded).
      score_thr: float score threshold (prefilter).
      iou_thr: float NMS IoU threshold.
      version: 'v1' | 'v2' | 'v3' | 'mmcv' — suppression policy
        (bbox_nms_rotated.py:45-131). 'mmcv' behaves like label-aware v2.
      max_num: output cap.
      pre_topk: static candidate budget across (position, class) pairs.
        When >= N*C no selection happens at all (exact reference
        semantics: every pair above score_thr competes).
      approx_topk: use lax.approx_max_k for the candidate selection
        (TPU PartialReduce, ~10x faster than the full sort). Only
        affects WHICH candidates enter the static budget; misses sit at
        the low-score boundary, so with a budget comfortably above the
        live count the result is identical.

    Returns (dets (max_num, 6), labels (max_num,), num_valid).
    """
    # All four reference policies are per-class NMS in disguise: the
    # v1/v3 class-offset tricks exist only because those CUDA kernels
    # lacked label gating (rnms_wrapper.py:37-69, nms_rotated_wrapper.py:
    # 79-98); with offsets, cross-class IoU is exactly 0 — identical to
    # gating labels (test_nms.py asserts the equivalence). So one
    # label-gated pass serves every version; the version selects only
    # the angle convention (v3/'mmcv' kernels rotate with the opposite
    # sign — ops.rotated_iou.negate_theta) and the v3 tiny-box skip
    # (applied in _sweep_dets).
    sel = _select_candidates(mboxes, mscores, score_thr, pre_topk,
                             approx_topk)
    return _sweep_dets(*sel, iou_thr=iou_thr, version=version,
                       max_num=max_num)
