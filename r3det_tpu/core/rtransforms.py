"""Rotated-box geometry: the angle-representation core.

TPU-native (JAX/jnp) re-implementation of the three DOTA angle conventions
supported by the reference framework (see /root/reference/r3det/core/bbox/
rtransforms.py for the semantics being matched):

- ``v1`` (R3Det):        theta in [-pi/2, 0); w/h swap on quadrant parity.
- ``v2`` (S2ANet):       theta in [-pi/4, 3pi/4); longest-edge angle.
- ``v3`` (OBBDetection): theta in [-pi/2, pi/2); w >= h enforced.

All functions here are pure, shape-polymorphic over leading dims, and safe
under ``jax.jit`` / ``jax.vmap`` — no data-dependent control flow. Boxes are
``(..., 5)`` arrays laid out ``(cx, cy, w, h, theta)``; polygons are
``(..., 8)`` arrays laid out ``(x0, y0, x1, y1, x2, y2, x3, y3)``.

Reference parity notes are called out inline; the deliberately-preserved
quirks (e.g. the ``obb2hbb_v1`` w/h slot swap) are flagged.
"""
import math

import jax.numpy as jnp

PI = math.pi

VERSIONS = ('v1', 'v2', 'v3')


def norm_angle(angle, version):
    """Normalize angles into the canonical range of an angle version.

    Parity: reference ``norm_angle`` (rtransforms.py:789-806). v1 is the
    identity (the v1 range is produced structurally by poly2obb_v1).
    """
    if version == 'v1':
        return angle
    elif version == 'v2':
        return (angle + PI / 4) % PI - PI / 4
    elif version == 'v3':
        return (angle + PI / 2) % PI - PI / 2
    raise ValueError(f'unknown angle version {version!r}')


# ---------------------------------------------------------------------------
# poly -> obb
# ---------------------------------------------------------------------------

def _dispatch(table, version, x):
    try:
        return table[version](x)
    except KeyError:
        raise ValueError(
            f'unknown angle version {version!r}; expected one of {VERSIONS}')


def poly2obb(polys, version='v1'):
    """(..., 8) polygon -> (..., 5) oriented box, version-dispatched."""
    return _dispatch({'v1': poly2obb_v1, 'v2': poly2obb_v2,
                      'v3': poly2obb_v3}, version, polys)


def poly2obb_v1(polys):
    """R3Det convention. Parity: rtransforms.py:190-213.

    Angle from edge p0->p1 measured as atan2(-(dx), dy), folded into
    [-pi/2, 0) with a w/h swap on odd quadrants.
    """
    pts = polys.reshape(polys.shape[:-1] + (4, 2))
    cx = jnp.mean(pts[..., 0], axis=-1)
    cy = jnp.mean(pts[..., 1], axis=-1)
    w_ = jnp.linalg.norm(pts[..., 0, :] - pts[..., 1, :], axis=-1)
    h_ = jnp.linalg.norm(pts[..., 1, :] - pts[..., 2, :], axis=-1)
    theta_ = jnp.arctan2(-(pts[..., 1, 0] - pts[..., 0, 0]),
                         pts[..., 1, 1] - pts[..., 0, 1])
    # Quadrant parity: even multiples of -pi/2 keep (w,h); odd swap them.
    odd = jnp.floor(theta_ / (-PI * 0.5)) % 2 == 0
    w = jnp.where(odd, h_, w_)
    h = jnp.where(odd, w_, h_)
    # jnp.remainder matches torch.remainder: result takes the divisor's sign,
    # so theta lands in (-pi/2, 0].
    theta = jnp.remainder(theta_, -PI * 0.5)
    return jnp.stack([cx, cy, w, h, theta], axis=-1)


def _poly2obb_longest_edge(polys, version):
    """Shared v2/v3 logic: angle defined by the longest rectangle edge.

    Parity: rtransforms.py:216-277.
    """
    p = polys.reshape(polys.shape[:-1] + (8,))
    x0, y0, x1, y1, x2, y2, x3, y3 = [p[..., i] for i in range(8)]
    edge1 = jnp.sqrt((x0 - x1) ** 2 + (y0 - y1) ** 2)
    edge2 = jnp.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2)
    angle1 = jnp.arctan2(y1 - y0, x1 - x0)
    angle2 = jnp.arctan2(y3 - y0, x3 - x0)
    angle = norm_angle(jnp.where(edge1 > edge2, angle1, angle2), version)
    cx = (x0 + x2) / 2.0
    cy = (y0 + y2) / 2.0
    w = jnp.maximum(edge1, edge2)
    h = jnp.minimum(edge1, edge2)
    return jnp.stack([cx, cy, w, h, angle], axis=-1)


def poly2obb_v2(polys):
    return _poly2obb_longest_edge(polys, 'v2')


def poly2obb_v3(polys):
    return _poly2obb_longest_edge(polys, 'v3')


# ---------------------------------------------------------------------------
# obb -> poly
# ---------------------------------------------------------------------------

def obb2poly(rbboxes, version='v1'):
    """(..., 5) oriented box -> (..., 8) polygon, version-dispatched."""
    return _dispatch({'v1': obb2poly_v1, 'v2': obb2poly_v2,
                      'v3': obb2poly_v3}, version, rbboxes)


def obb2poly_v1(rb):
    """Parity: rtransforms.py:367-388 — v1 corner order (w-axis = (cos, sin),
    h-axis = (-sin, cos))."""
    cx, cy, w, h, a = [rb[..., i] for i in range(5)]
    cosa, sina = jnp.cos(a), jnp.sin(a)
    wx, wy = w / 2 * cosa, w / 2 * sina
    hx, hy = -h / 2 * sina, h / 2 * cosa
    return jnp.stack([
        cx - wx - hx, cy - wy - hy,
        cx + wx - hx, cy + wy - hy,
        cx + wx + hx, cy + wy + hy,
        cx - wx + hx, cy - wy + hy,
    ], axis=-1)


def _obb2poly_rot(rb):
    """Rotation-matrix corner generation shared by v2/v3.

    Parity: rtransforms.py:391-440. Corner order: (tl, tr, br, bl) in the
    box frame, rotated by R(theta) = [[cos, -sin], [sin, cos]].
    """
    cx, cy, w, h, a = [rb[..., i] for i in range(5)]
    cosa, sina = jnp.cos(a), jnp.sin(a)
    # Box-frame corners: x = [-w/2, w/2, w/2, -w/2], y = [-h/2, -h/2, h/2, h/2]
    dx = jnp.stack([-w, w, w, -w], axis=-1) * 0.5
    dy = jnp.stack([-h, -h, h, h], axis=-1) * 0.5
    px = cosa[..., None] * dx - sina[..., None] * dy + cx[..., None]
    py = sina[..., None] * dx + cosa[..., None] * dy + cy[..., None]
    return jnp.stack([px, py], axis=-1).reshape(rb.shape[:-1] + (8,))


obb2poly_v2 = _obb2poly_rot
obb2poly_v3 = _obb2poly_rot


# ---------------------------------------------------------------------------
# obb -> hbb (as 5-param horizontal box) and obb -> xyxy
# ---------------------------------------------------------------------------

def obb2hbb(rb, version='v1'):
    return _dispatch({'v1': obb2hbb_v1, 'v2': obb2hbb_v2,
                      'v3': obb2hbb_v3}, version, rb)


def obb2hbb_v1(rb):
    """Parity quirk preserved: the reference writes the *height* extent into
    the w slot and the *width* extent into the h slot (rtransforms.py:459-460),
    with theta = -pi/2. For v1 angles (cos>0, sin<=0) both extents are
    positive and the -pi/2 rotation re-swaps them, so the circumscribed box
    is geometrically right — but slot order matters for parity."""
    cx, cy, w, h, a = [rb[..., i] for i in range(5)]
    cosa, sina = jnp.cos(a), jnp.sin(a)
    hw = cosa * w - sina * h
    hh = -sina * w + cosa * h
    out = jnp.stack([cx, cy, hh, hw, jnp.full_like(a, -PI / 2)], axis=-1)
    return out


def obb2hbb_v2(rb):
    """Parity: rtransforms.py:465-489 — axis-aligned extent from the polygon;
    long edge goes to w; theta = pi/2 when the tall side wins, else 0."""
    polys = obb2poly_v2(rb)
    xs = polys[..., 0::2]
    ys = polys[..., 1::2]
    xmin, xmax = xs.min(-1), xs.max(-1)
    ymin, ymax = ys.min(-1), ys.max(-1)
    cx = (xmin + xmax) / 2.0
    cy = (ymin + ymax) / 2.0
    e1 = jnp.abs(xmax - xmin)
    e2 = jnp.abs(ymax - ymin)
    tall = e1 < e2
    w = jnp.where(tall, e2, e1)
    h = jnp.where(tall, e1, e2)
    a = jnp.where(tall, PI / 2.0, 0.0)
    return jnp.stack([cx, cy, w, h, a], axis=-1)


def obb2hbb_v3(rb):
    """Parity: rtransforms.py:515-537 — closed-form extent |w cos|+|h sin|,
    w>=h regularization with theta in {0, -pi/2}."""
    cx, cy, w, h, a = [rb[..., i] for i in range(5)]
    cosa, sina = jnp.cos(a), jnp.sin(a)
    ex = jnp.abs(w / 2 * cosa) + jnp.abs(h / 2 * sina)
    ey = jnp.abs(w / 2 * sina) + jnp.abs(h / 2 * cosa)
    w2, h2 = 2 * ex, 2 * ey
    wide = w2 >= h2
    return jnp.stack([
        cx, cy,
        jnp.where(wide, w2, h2),
        jnp.where(wide, h2, w2),
        jnp.where(wide, 0.0, -PI / 2),
    ], axis=-1)


def obb2xyxy(rb, version='v1'):
    return _dispatch({'v1': obb2xyxy_v1, 'v2': obb2xyxy_v2,
                      'v3': obb2xyxy_v3}, version, rb)


def obb2xyxy_v1(rb):
    """Parity: rtransforms.py:595-619. For v1 angles cos(a)>0 >= sin(a), so
    (cos*w - sin*h, -sin*w + cos*h) are the positive extents."""
    cx, cy, w, h, a = [rb[..., i] for i in range(5)]
    cosa, sina = jnp.cos(a), jnp.sin(a)
    hw = cosa * w - sina * h
    hh = -sina * w + cosa * h
    return jnp.stack([cx - hw / 2, cy - hh / 2, cx + hw / 2, cy + hh / 2],
                     axis=-1)


def obb2xyxy_v2(rb):
    polys = obb2poly_v2(rb)
    xs, ys = polys[..., 0::2], polys[..., 1::2]
    return jnp.stack([xs.min(-1), ys.min(-1), xs.max(-1), ys.max(-1)], axis=-1)


def obb2xyxy_v3(rb):
    cx, cy, w, h, a = [rb[..., i] for i in range(5)]
    cosa, sina = jnp.cos(a), jnp.sin(a)
    ex = jnp.abs(w / 2 * cosa) + jnp.abs(h / 2 * sina)
    ey = jnp.abs(w / 2 * sina) + jnp.abs(h / 2 * cosa)
    return jnp.stack([cx - ex, cy - ey, cx + ex, cy + ey], axis=-1)


# ---------------------------------------------------------------------------
# hbb (xyxy) -> obb
# ---------------------------------------------------------------------------

def hbb2obb(hb, version='v1'):
    return _dispatch({'v1': hbb2obb_v1, 'v2': hbb2obb_v2,
                      'v3': hbb2obb_v3}, version, hb)


def hbb2obb_v1(hb):
    """Parity: rtransforms.py:540-554 — (cx, cy, h, w, -pi/2)."""
    cx = (hb[..., 0] + hb[..., 2]) * 0.5
    cy = (hb[..., 1] + hb[..., 3]) * 0.5
    w = hb[..., 2] - hb[..., 0]
    h = hb[..., 3] - hb[..., 1]
    return jnp.stack([cx, cy, h, w, jnp.full_like(cx, -PI / 2)], axis=-1)


def _hbb2obb_regular(hb, tall_angle):
    cx = (hb[..., 0] + hb[..., 2]) * 0.5
    cy = (hb[..., 1] + hb[..., 3]) * 0.5
    w = hb[..., 2] - hb[..., 0]
    h = hb[..., 3] - hb[..., 1]
    wide = w >= h
    return jnp.stack([
        cx, cy,
        jnp.where(wide, w, h),
        jnp.where(wide, h, w),
        jnp.where(wide, 0.0, tall_angle),
    ], axis=-1)


def hbb2obb_v2(hb):
    """Parity: rtransforms.py:557-573 — tall boxes get theta = +pi/2."""
    return _hbb2obb_regular(hb, PI / 2)


def hbb2obb_v3(hb):
    """Parity: rtransforms.py:576-592 — tall boxes get theta = -pi/2."""
    return _hbb2obb_regular(hb, -PI / 2)
