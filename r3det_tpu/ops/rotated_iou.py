"""Rotated-box IoU, TPU-native.

Replaces the reference's three CUDA IoU extensions (rbbox_geo_kernel.cu,
box_iou_rotated_utils.h used by box_iou_rotated/ml_nms_rotated/nms_rotated —
see SURVEY.md §2.4) with ONE vectorized jnp implementation. All three
reference backends compute the same quantity — exact overlap area of two
rotated rectangles — differing only in dispatch plumbing; here the
version-specific calculators are thin wrappers (core/iou_calculators.py).

Algorithm (differs from the reference's Graham-scan approach on purpose —
this shape maps better to the VPU):

1. generate the 4 corners of each box;
2. candidate intersection-polygon vertices = up to 16 edge-pair
   intersections + up to 4 corners of A inside B + 4 of B inside A
   (fixed 24 slots + validity mask);
3. the intersection of two convex polygons is convex, so ordering the
   valid candidates by angle around their centroid yields the polygon
   boundary directly — no sequential hull scan;
4. shoelace area. Invalid slots are replaced by the first valid point,
   which contributes zero area regardless of where it sorts.

Everything is fixed-shape, fully data-parallel, and differentiable-ish
(not used for gradients; assignment only). fp32 throughout: overlap
geometry at 1024² image scale needs the mantissa (centers are shifted
to the pair's local frame first to keep precision, same trick the
reference uses in single_box_iou_rotated).
"""
from functools import partial

import jax
import jax.numpy as jnp

EPS_AREA = 1e-14


def obb_corners(boxes):
    """(..., 5) (cx, cy, w, h, theta) -> (..., 4, 2) corners.

    Corner order (tl, tr, br, bl) in the box frame rotated by
    R(theta) = [[c, -s], [s, c]]. IoU is convention-agnostic as long as
    both operands use the same corner generator.
    """
    cx, cy, w, h, t = [boxes[..., i] for i in range(5)]
    c, s = jnp.cos(t), jnp.sin(t)
    dx = jnp.stack([-w, w, w, -w], axis=-1) * 0.5
    dy = jnp.stack([-h, -h, h, h], axis=-1) * 0.5
    px = c[..., None] * dx - s[..., None] * dy + cx[..., None]
    py = s[..., None] * dx + c[..., None] * dy + cy[..., None]
    return jnp.stack([px, py], axis=-1)


def points_in_rbox(pts, box, eps=1e-5):
    """pts (..., 2) inside rotated box (5,)? Inclusive with tolerance."""
    cx, cy, w, h, t = [box[..., i] for i in range(5)]
    c, s = jnp.cos(t), jnp.sin(t)
    rx = pts[..., 0] - cx
    ry = pts[..., 1] - cy
    # rotate by -theta into the box frame
    bx = c * rx + s * ry
    by = -s * rx + c * ry
    return (jnp.abs(bx) <= w / 2 + eps) & (jnp.abs(by) <= h / 2 + eps)


def _segment_intersections(ca, cb):
    """All 16 intersection points of edges of quad ca with edges of quad cb.

    ca, cb: (4, 2) corners. Returns pts (16, 2), valid (16,).
    """
    a0 = ca                                   # (4, 2) edge starts
    a1 = jnp.roll(ca, -1, axis=0)             # edge ends
    b0 = cb
    b1 = jnp.roll(cb, -1, axis=0)
    # broadcast to (4, 4, 2): A-edge i × B-edge j
    p = a0[:, None, :]
    r = (a1 - a0)[:, None, :]
    q = b0[None, :, :]
    s = (b1 - b0)[None, :, :]
    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]       # (4, 4)
    qp = q - p
    qpxr = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    qpxs = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    denom = jnp.where(jnp.abs(rxs) < 1e-12, 1.0, rxs)
    t = qpxs / denom
    u = qpxr / denom
    ok = (jnp.abs(rxs) >= 1e-12) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = p + t[..., None] * r
    return pts.reshape(16, 2), ok.reshape(16)


def _convex_area_from_candidates(pts, valid):
    """Area of the convex polygon whose vertices are the valid candidates.

    pts (K, 2), valid (K,) bool. Invalid slots are snapped to the first
    valid point so they collapse into a zero-area degenerate vertex.
    """
    num = jnp.sum(valid)
    vf = valid.astype(pts.dtype)[:, None]
    # first valid point (fallback 0 when none — area guards on num >= 3)
    first_idx = jnp.argmax(valid)
    anchor = pts[first_idx]
    pts = jnp.where(valid[:, None], pts, anchor[None, :])
    centroid = jnp.sum(pts * vf, axis=0) / jnp.maximum(jnp.sum(vf), 1.0)
    rel = pts - centroid
    ang = jnp.arctan2(rel[:, 1], rel[:, 0])
    order = jnp.argsort(ang)
    p = pts[order]
    pn = jnp.roll(p, -1, axis=0)
    area2 = jnp.sum(p[:, 0] * pn[:, 1] - pn[:, 0] * p[:, 1])
    return jnp.where(num >= 3, jnp.abs(area2) * 0.5, 0.0)


def _pair_intersect_area(box_a, box_b):
    """Exact intersection area of two (5,) rotated boxes."""
    # Shift to a local frame around the pair midpoint for fp32 precision
    # (same precision trick as the reference's center-shift,
    # box_iou_rotated_utils.h:331-361 — different implementation).
    shift = (box_a[:2] + box_b[:2]) * 0.5
    ba = box_a.at[:2].add(-shift)
    bb = box_b.at[:2].add(-shift)
    ca = obb_corners(ba)
    cb = obb_corners(bb)
    ipts, ivalid = _segment_intersections(ca, cb)
    a_in_b = points_in_rbox(ca, bb)
    b_in_a = points_in_rbox(cb, ba)
    pts = jnp.concatenate([ipts, ca, cb], axis=0)            # (24, 2)
    valid = jnp.concatenate([ivalid, a_in_b, b_in_a], axis=0)
    return _convex_area_from_candidates(pts, valid)


def _pair_overlap(box_a, box_b, mode='iou'):
    inter = _pair_intersect_area(box_a, box_b)
    area_a = box_a[2] * box_a[3]
    area_b = box_b[2] * box_b[3]
    denom = area_a + area_b - inter if mode == 'iou' else area_a
    return inter / jnp.maximum(denom, EPS_AREA)


@partial(jax.jit, static_argnames=('mode', 'row_chunk'))
def rotated_iou_pairwise(boxes1, boxes2, mode='iou', row_chunk=1024):
    """Dense (N, M) rotated IoU/IoF matrix.

    Memory-bounded by chunking rows through ``lax.map`` — each chunk
    materializes (row_chunk, M, 24, 2) candidate buffers, keeping peak
    VMEM/HBM use flat for anchor-scale N (~200k) against padded-gt M.
    """
    n = boxes1.shape[0]
    m = boxes2.shape[0]
    if n == 0 or m == 0:
        return jnp.zeros((n, m), dtype=boxes1.dtype)
    row_chunk = min(row_chunk, max(n, 1))
    pad = (-n) % row_chunk
    b1 = jnp.pad(boxes1, ((0, pad), (0, 0)))
    b1 = b1.reshape(-1, row_chunk, 5)

    pair_fn = jax.vmap(jax.vmap(partial(_pair_overlap, mode=mode),
                                in_axes=(None, 0)), in_axes=(0, None))

    out = jax.lax.map(lambda rows: pair_fn(rows, boxes2), b1)
    return out.reshape(-1, m)[:n]


@partial(jax.jit, static_argnames=('mode',))
def rotated_iou_aligned(boxes1, boxes2, mode='iou'):
    """Elementwise IoU of aligned (N, 5) vs (N, 5)."""
    if boxes1.shape[0] == 0:
        return jnp.zeros((0,), dtype=boxes1.dtype)
    return jax.vmap(partial(_pair_overlap, mode=mode))(boxes1, boxes2)


def rbbox_overlaps(bboxes1, bboxes2, mode='iou', is_aligned=False,
                   small_box_thr=None):
    """Config-facing entry: (N, 5[+score]) x (M, 5[+score]) -> (N, M) or (N,).

    Mirrors the shared signature of the reference's three calculator
    classes (rotate_iou2d_calculator.py:8-231): trims a 6th score column,
    and optionally zeroes overlaps involving near-degenerate boxes
    (the v3 backend's min(w,h) < small_box_thr rule,
    box_iou_rotated_wrapper.py:50-60).
    """
    assert mode in ('iou', 'iof')
    if bboxes1.shape[-1] == 6:
        bboxes1 = bboxes1[..., :5]
    if bboxes2.shape[-1] == 6:
        bboxes2 = bboxes2[..., :5]
    if is_aligned:
        out = rotated_iou_aligned(bboxes1, bboxes2, mode=mode)
        if small_box_thr is not None:
            tiny = (jnp.minimum(bboxes1[:, 2], bboxes1[:, 3]) < small_box_thr) | \
                   (jnp.minimum(bboxes2[:, 2], bboxes2[:, 3]) < small_box_thr)
            out = jnp.where(tiny, 0.0, out)
        return out
    out = rotated_iou_pairwise(bboxes1, bboxes2, mode=mode)
    if small_box_thr is not None:
        tiny1 = jnp.minimum(bboxes1[:, 2], bboxes1[:, 3]) < small_box_thr
        tiny2 = jnp.minimum(bboxes2[:, 2], bboxes2[:, 3]) < small_box_thr
        out = jnp.where(tiny1[:, None] | tiny2[None, :], 0.0, out)
    return out
