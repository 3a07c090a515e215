"""Rotated-box IoU, TPU-native.

Replaces the reference's three CUDA IoU extensions (rbbox_geo_kernel.cu,
box_iou_rotated_utils.h used by box_iou_rotated/ml_nms_rotated/nms_rotated —
see SURVEY.md §2.4) with ONE vectorized jnp implementation. All three
reference backends compute the same quantity — exact overlap area of two
rotated rectangles — differing only in dispatch plumbing; here the
version-specific calculators are thin wrappers (core/iou_calculators.py).

Algorithm (deliberately different from the reference's sequential
Graham-scan — this shape maps onto the VPU):

1. generate the 4 corners of each box;
2. candidate intersection-polygon vertices = 16 edge-pair intersections
   + 4 corners of A inside B + 4 of B inside A (fixed 24 slots + mask);
3. the intersection of two convex polygons is convex, so ordering the
   valid candidates by angle around their centroid yields the polygon
   boundary directly — no sequential hull scan;
4. shoelace area. Invalid slots collapse onto the first valid point,
   contributing zero area wherever they sort.

Layout: struct-of-arrays. Candidate slots live on a LEADING axis of
shape (24, *plane) where *plane is the (rows, cols) pair grid — so the
minor-most dims are large and lane-aligned. (A first AoS version with
trailing (24, 2) dims forced XLA to pad the 2-lane axis ×64 and blew a
25 GB allocation at NMS scale; this SoA form is the fix.)

fp32 throughout; centers are shifted to each pair's local frame first
to keep fp32 precision at 1024²-image coordinate scale (same trick the
reference uses in single_box_iou_rotated, different mechanics).
"""
from functools import partial

import jax
import jax.numpy as jnp

EPS_AREA = 1e-14


def obb_corners(boxes):
    """(..., 5) (cx, cy, w, h, theta) -> (..., 4, 2) corners.

    Corner order (tl, tr, br, bl) in the box frame rotated by
    R(theta) = [[c, -s], [s, c]]. IoU is convention-agnostic as long as
    both operands use the same generator.
    """
    cx, cy, w, h, t = [boxes[..., i] for i in range(5)]
    c, s = jnp.cos(t), jnp.sin(t)
    dx = jnp.stack([-w, w, w, -w], axis=-1) * 0.5
    dy = jnp.stack([-h, -h, h, h], axis=-1) * 0.5
    px = c[..., None] * dx - s[..., None] * dy + cx[..., None]
    py = s[..., None] * dx + c[..., None] * dy + cy[..., None]
    return jnp.stack([px, py], axis=-1)


def _corner_planes(cx, cy, w, h, t):
    """Plane-form corners: five (*S,) planes -> two (4, *S) coord planes."""
    c, s = jnp.cos(t), jnp.sin(t)
    sign_x = jnp.asarray([-0.5, 0.5, 0.5, -0.5], dtype=cx.dtype)
    sign_y = jnp.asarray([-0.5, -0.5, 0.5, 0.5], dtype=cx.dtype)
    shp = (4,) + (1,) * cx.ndim
    dx = sign_x.reshape(shp) * w
    dy = sign_y.reshape(shp) * h
    px = c * dx - s * dy + cx
    py = s * dx + c * dy + cy
    return px, py


def points_in_rbox(pts, box, eps=1e-5):
    """pts (..., 2) inside rotated box (5,)? Inclusive with tolerance."""
    cx, cy, w, h, t = [box[..., i] for i in range(5)]
    c, s = jnp.cos(t), jnp.sin(t)
    rx = pts[..., 0] - cx
    ry = pts[..., 1] - cy
    bx = c * rx + s * ry
    by = -s * rx + c * ry
    return (jnp.abs(bx) <= w / 2 + eps) & (jnp.abs(by) <= h / 2 + eps)


def _points_in_quad_planes(px, py, qx, qy, eps=1e-6):
    """px, py: (P, *S) points; qx, qy: (4, *S) convex-quad corners.

    Inside iff all edge cross products share a sign (orientation-free).
    Returns (P, *S) bool.
    """
    ex = jnp.roll(qx, -1, axis=0) - qx            # (4, *S)
    ey = jnp.roll(qy, -1, axis=0) - qy
    relx = px[:, None] - qx[None]                 # (P, 4, *S)
    rely = py[:, None] - qy[None]
    cr = ex[None] * rely - ey[None] * relx
    return (cr >= -eps).all(1) | (cr <= eps).all(1)


def _edge_intersections_planes(ax, ay, bx, by):
    """All 16 edge-pair intersections of quads A and B in plane form.

    ax, ay, bx, by: (4, *S). Returns ipx, ipy (16, *S) and valid (16, *S).
    """
    a1x = jnp.roll(ax, -1, axis=0)
    a1y = jnp.roll(ay, -1, axis=0)
    b1x = jnp.roll(bx, -1, axis=0)
    b1y = jnp.roll(by, -1, axis=0)
    # broadcast A-edge i (axis 0) x B-edge j (axis 1) -> (4, 4, *S)
    px, py = ax[:, None], ay[:, None]
    rx, ry = (a1x - ax)[:, None], (a1y - ay)[:, None]
    qx, qy = bx[None], by[None]
    sx, sy = (b1x - bx)[None], (b1y - by)[None]
    rxs = rx * sy - ry * sx
    qpx, qpy = qx - px, qy - py
    denom = jnp.where(jnp.abs(rxs) < 1e-12, 1.0, rxs)
    t = (qpx * sy - qpy * sx) / denom
    u = (qpx * ry - qpy * rx) / denom
    ok = (jnp.abs(rxs) >= 1e-12) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    ipx = px + t * rx
    ipy = py + t * ry
    s = ax.shape[1:]
    return (ipx.reshape((16,) + s), ipy.reshape((16,) + s),
            ok.reshape((16,) + s))


def _convex_area_planes(cand_x, cand_y, valid):
    """Area of the convex polygon per plane site.

    cand_x/cand_y: (K, *S) candidate coords; valid: (K, *S) bool.
    Invalid slots snap to the site's first valid point (zero area).
    """
    dtype = cand_x.dtype
    vf = valid.astype(dtype)
    num = jnp.sum(vf, axis=0)
    first = jnp.argmax(valid, axis=0)                       # (*S,)
    anchor_x = jnp.take_along_axis(cand_x, first[None], axis=0)
    anchor_y = jnp.take_along_axis(cand_y, first[None], axis=0)
    x = jnp.where(valid, cand_x, anchor_x)
    y = jnp.where(valid, cand_y, anchor_y)
    denom = jnp.maximum(num, 1.0)
    cx = jnp.sum(x * vf, axis=0) / denom
    cy = jnp.sum(y * vf, axis=0) / denom
    ang = jnp.arctan2(y - cy, x - cx)
    ang, x, y = jax.lax.sort((ang, x, y), dimension=0, num_keys=1)
    xn = jnp.roll(x, -1, axis=0)
    yn = jnp.roll(y, -1, axis=0)
    area2 = jnp.sum(x * yn - xn * y, axis=0)
    return jnp.where(num >= 3, jnp.abs(area2) * 0.5, 0.0)


def _quad_intersect_area_sort(ax, ay, bx, by):
    """Candidate-point + angle-sort formulation (kept as an oracle)."""
    ipx, ipy, ivalid = _edge_intersections_planes(ax, ay, bx, by)
    a_in_b = _points_in_quad_planes(ax, ay, bx, by)
    b_in_a = _points_in_quad_planes(bx, by, ax, ay)
    cand_x = jnp.concatenate([ipx, ax, bx], axis=0)          # (24, *S)
    cand_y = jnp.concatenate([ipy, ay, by], axis=0)
    valid = jnp.concatenate([ivalid, a_in_b, b_in_a], axis=0)
    return _convex_area_planes(cand_x, cand_y, valid)


def _half_plane_clip_t(px, py, dx, dy, qx, qy, qxn, qyn, t_lo, t_hi,
                       strict=False):
    """Liang-Barsky update of segment parameter range [t_lo, t_hi] for one
    CCW half-plane (inside = left of edge q -> qn).

    ``strict`` rejects segments lying exactly ON the clip edge — used for
    the second integration pass so an exactly-shared boundary (identical
    boxes) is counted once, not twice.
    """
    ex = qxn - qx
    ey = qyn - qy
    c0 = ex * (py - qy) - ey * (px - qx)          # signed dist at t=0 (x|e|)
    dc = ex * dy - ey * dx                         # slope along the segment
    par = jnp.abs(dc) < 1e-12
    t_x = -c0 / jnp.where(par, 1.0, dc)
    # dc > 0: constraint satisfied for t >= t_x (entering)
    t_lo = jnp.where(~par & (dc > 0), jnp.maximum(t_lo, t_x), t_lo)
    t_hi = jnp.where(~par & (dc < 0), jnp.minimum(t_hi, t_x), t_hi)
    # parallel & outside: whole segment rejected
    reject = (c0 <= 0) if strict else (c0 < 0)
    t_hi = jnp.where(par & reject, -1.0, t_hi)
    return t_lo, t_hi


def _edges_in_quad_integral(ax, ay, bx, by, strict=False):
    """Gauss-Green line integral of A's edges clipped to quad B.

    Sum over A's edges of (t_hi - t_lo) * cross(P, D) where [t_lo, t_hi]
    is the Liang-Barsky intersection of the edge with B. Both quads must
    be CCW (obb corners with w, h >= 0 are). Each straight segment
    contributes cross(P0', P1') = (t_hi - t_lo) * cross(P, D) to the
    shoelace sum of the intersection boundary.
    """
    axn = jnp.roll(ax, -1, axis=0)
    ayn = jnp.roll(ay, -1, axis=0)
    bxn = jnp.roll(bx, -1, axis=0)
    byn = jnp.roll(by, -1, axis=0)
    total = None
    for i in range(4):
        px, py = ax[i], ay[i]
        dx, dy = axn[i] - px, ayn[i] - py
        t_lo = jnp.zeros_like(px)
        t_hi = jnp.ones_like(px)
        for j in range(4):
            t_lo, t_hi = _half_plane_clip_t(px, py, dx, dy,
                                            bx[j], by[j], bxn[j], byn[j],
                                            t_lo, t_hi, strict=strict)
        span = jnp.maximum(t_hi - t_lo, 0.0)
        term = span * (px * dy - py * dx)
        total = term if total is None else total + term
    return total


def _quad_intersect_area_planes(ax, ay, bx, by):
    """Intersection area of convex quads in plane form: (4, *S) x4 -> (*S).

    Boundary-integration formulation (Gauss-Green + Liang-Barsky): the
    boundary of A∩B is exactly (A-edge portions inside B) + (B-edge
    portions inside A); integrating x dy - y dx over those segments gives
    twice the signed area. No candidate buffers, no sort, no fill — a
    small live set of elementwise ops, ~4x fewer than the clip/sort
    variants and fusion-friendly. CCW corner orientation is guaranteed by
    obb corner generation (w, h >= 0).
    """
    s1 = _edges_in_quad_integral(ax, ay, bx, by, strict=False)
    s2 = _edges_in_quad_integral(bx, by, ax, ay, strict=True)
    return jnp.abs(s1 + s2) * 0.5


def _forward_fill(xs, found):
    """Per-site forward fill along axis 0: each slot takes the nearest
    FOUND slot at or before it (Hillis-Steele log-step scan); slots before
    the first found wrap to the last found slot. xs: list of (K, *S)."""
    k = found.shape[0]
    idx_shape = (k,) + (1,) * (found.ndim - 1)
    idx = jnp.arange(k).reshape(idx_shape)
    s = 1
    while s < k:
        shifted_found = jnp.roll(found, s, axis=0) & (idx >= s)
        take = ~found & shifted_found
        xs = [jnp.where(take, jnp.roll(x, s, axis=0), x) for x in xs]
        found = found | shifted_found
        s *= 2
    last = [x[-1] for x in xs]
    xs = [jnp.where(found, x, l[None]) for x, l in zip(xs, last)]
    return xs


def _quad_intersect_area_planes_clip(ax, ay, bx, by):
    """Intersection area via Sutherland–Hodgman clipping, plane form.

    NOTE: measured 10x SLOWER than the sort formulation at jnp level on
    TPU — the doubling buffers (4->64 slots) and log-step fills defeat
    XLA fusion and go HBM-bound. Kept because this is the right algorithm
    for the planned Pallas kernel, where every buffer stays in VMEM.

    Clips quad A by each of B's 4 half-planes. Buffers double per pass
    (4 -> 64 slots) with kept slot ORDER: slot 2i is vertex i (valid iff
    inside), slot 2i+1 the edge crossing (valid iff the edge crosses);
    invalid slots are forward-filled with the previous valid vertex, so
    the slot list always traverses the polygon boundary with harmless
    duplicates and the final shoelace needs no sort and no atan2. This is
    the NMS/assignment hot path: pure mul/add/select VPU ops.
    """
    # orient B's inside-tests by its signed area (corner order of callers
    # may be CW or CCW)
    bxn = jnp.roll(bx, -1, axis=0)
    byn = jnp.roll(by, -1, axis=0)
    sgn = jnp.sign(jnp.sum(bx * byn - bxn * by, axis=0))
    sgn = jnp.where(sgn == 0, 1.0, sgn)

    x, y = ax, ay
    alive = jnp.ones(ax.shape[1:], dtype=bool)
    for e in range(4):
        ex0, ey0 = bx[e], by[e]
        edx = bxn[e] - ex0
        edy = byn[e] - ey0
        c1 = sgn * (edx * (y - ey0) - edy * (x - ex0))       # (K, *S)
        xn = jnp.roll(x, -1, axis=0)
        yn = jnp.roll(y, -1, axis=0)
        c2 = sgn * (edx * (yn - ey0) - edy * (xn - ex0))
        in1 = c1 >= 0
        in2 = c2 >= 0
        denom = c1 - c2
        t = c1 / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
        t = jnp.clip(t, 0.0, 1.0)
        ix = x + t * (xn - x)
        iy = y + t * (yn - y)
        k = x.shape[0]
        # interleave: even slots = vertices, odd slots = crossings
        out_x = jnp.stack([x, ix], axis=1).reshape((2 * k,) + x.shape[1:])
        out_y = jnp.stack([y, iy], axis=1).reshape((2 * k,) + y.shape[1:])
        valid = jnp.stack([in1, in1 != in2], axis=1).reshape(
            (2 * k,) + in1.shape[1:])
        alive = alive & valid.any(axis=0)
        out_x, out_y = _forward_fill([out_x, out_y], valid)
        x, y = out_x, out_y

    xn = jnp.roll(x, -1, axis=0)
    yn = jnp.roll(y, -1, axis=0)
    area = jnp.abs(jnp.sum(x * yn - xn * y, axis=0)) * 0.5
    return jnp.where(alive, area, 0.0)


def _overlap_planes(b1, b2, mode):
    """b1 fields broadcast-shaped (*S,) x5 tuple; likewise b2."""
    cx1, cy1, w1, h1, t1 = b1
    cx2, cy2, w2, h2, t2 = b2
    # local-frame shift for fp32 precision
    mx = (cx1 + cx2) * 0.5
    my = (cy1 + cy2) * 0.5
    ax, ay = _corner_planes(cx1 - mx, cy1 - my, w1, h1, t1)
    bx, by = _corner_planes(cx2 - mx, cy2 - my, w2, h2, t2)
    inter = _quad_intersect_area_planes(ax, ay, bx, by)
    area1 = w1 * h1
    area2 = w2 * h2
    denom = area1 + area2 - inter if mode == 'iou' else \
        jnp.broadcast_to(area1, inter.shape)
    return inter / jnp.maximum(denom, EPS_AREA)


@partial(jax.jit, static_argnames=('mode', 'row_chunk', 'backend'))
def rotated_iou_pairwise(boxes1, boxes2, mode='iou', row_chunk=256,
                         backend=None):
    """Dense (N, M) rotated IoU/IoF matrix.

    backend: 'pallas' (TPU kernel, default on TPU), 'jnp' (default
    elsewhere). The jnp path is memory-bounded by chunking rows through
    ``lax.map``: each chunk materializes (row_chunk, M) planes.
    """
    n = boxes1.shape[0]
    m = boxes2.shape[0]
    if n == 0 or m == 0:
        return jnp.zeros((n, m), dtype=boxes1.dtype)
    if backend is None:
        # resolve per lowering platform (NOT jax.default_backend(): a
        # CPU-mesh jit on a TPU-default process must take the jnp path)
        from .pallas_iou import rotated_iou_pallas
        return jax.lax.platform_dependent(
            boxes1, boxes2,
            tpu=partial(rotated_iou_pallas, mode=mode),
            default=partial(rotated_iou_pairwise, mode=mode,
                            row_chunk=row_chunk, backend='jnp'))
    if backend == 'pallas':
        from .pallas_iou import rotated_iou_pallas
        return rotated_iou_pallas(boxes1, boxes2, mode=mode)
    row_chunk = min(row_chunk, max(n, 1))
    pad = (-n) % row_chunk
    b1 = jnp.pad(boxes1, ((0, pad), (0, 0)))
    b1 = b1.reshape(-1, row_chunk, 5)

    def chunk_fn(rows):
        f1 = tuple(rows[:, i][:, None] for i in range(5))      # (R, 1)
        f2 = tuple(boxes2[:, i][None, :] for i in range(5))    # (1, M)
        f1 = tuple(jnp.broadcast_to(a, (rows.shape[0], m)) for a in f1)
        f2 = tuple(jnp.broadcast_to(a, (rows.shape[0], m)) for a in f2)
        return _overlap_planes(f1, f2, mode)

    out = jax.lax.map(chunk_fn, b1)
    return out.reshape(-1, m)[:n]


@partial(jax.jit, static_argnames=('mode',))
def rotated_iou_aligned(boxes1, boxes2, mode='iou'):
    """Elementwise IoU of aligned (N, 5) vs (N, 5) -> (N,)."""
    if boxes1.shape[0] == 0:
        return jnp.zeros((0,), dtype=boxes1.dtype)
    f1 = tuple(boxes1[:, i] for i in range(5))
    f2 = tuple(boxes2[:, i] for i in range(5))
    return _overlap_planes(f1, f2, mode)


def quad_iou_pairwise(quads1, quads2):
    """Dense IoU of convex quads: (N, 8) x (M, 8) -> (N, M).

    Used by poly-NMS (reference poly_nms_cuda.cu path).
    """
    n, m = quads1.shape[0], quads2.shape[0]
    ax = jnp.broadcast_to(quads1[:, 0::2].T[:, :, None], (4, n, m))
    ay = jnp.broadcast_to(quads1[:, 1::2].T[:, :, None], (4, n, m))
    bx = jnp.broadcast_to(quads2[:, 0::2].T[:, None, :], (4, n, m))
    by = jnp.broadcast_to(quads2[:, 1::2].T[:, None, :], (4, n, m))
    inter = _quad_intersect_area_planes(ax, ay, bx, by)

    def quad_area(q):
        x = q[:, 0::2]
        y = q[:, 1::2]
        xn = jnp.roll(x, -1, axis=1)
        yn = jnp.roll(y, -1, axis=1)
        return jnp.abs(jnp.sum(x * yn - xn * y, axis=1)) * 0.5

    a1 = quad_area(quads1)[:, None]
    a2 = quad_area(quads2)[None, :]
    return inter / jnp.maximum(a1 + a2 - inter, EPS_AREA)


def negate_theta(boxes):
    """Flip a box set to the detectron2/mmcv angle convention.

    The reference's v2/v3 kernels (mmcv box_iou_rotated and the vendored
    box_iou_rotated/nms_rotated headers) generate corners with the
    opposite rotation sign from the poly2obb/obb2poly family the v1 ops
    and the evaluator use (box_iou_rotated_utils.h:63-73 vs
    rtransforms.py obb2poly_np; verified against the compiled reference
    CPU extension in tests/test_reference_parity.py). Negating theta on
    both operands reproduces those kernels exactly.
    """
    boxes = jnp.asarray(boxes)
    return jnp.concatenate([boxes[..., :4], -boxes[..., 4:5]], axis=-1)


def rbbox_overlaps(bboxes1, bboxes2, mode='iou', is_aligned=False,
                   small_box_thr=None, negate_angle=False):
    """Config-facing entry: (N, 5[+score]) x (M, 5[+score]) -> (N, M) or (N,).

    Mirrors the shared signature of the reference's three calculator
    classes (rotate_iou2d_calculator.py:8-231): trims a 6th score column,
    and optionally zeroes overlaps involving near-degenerate boxes
    (the v3 backend's min(w,h) < small_box_thr rule,
    box_iou_rotated_wrapper.py:50-60). ``negate_angle`` selects the
    detectron2/mmcv angle convention (see negate_theta) used by the
    reference's v2/v3 backends.
    """
    assert mode in ('iou', 'iof')
    if bboxes1.shape[-1] == 6:
        bboxes1 = bboxes1[..., :5]
    if bboxes2.shape[-1] == 6:
        bboxes2 = bboxes2[..., :5]
    if negate_angle:
        bboxes1 = negate_theta(bboxes1)
        bboxes2 = negate_theta(bboxes2)
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
