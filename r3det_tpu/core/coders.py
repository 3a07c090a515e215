"""Delta box coders for rotated detection, all three angle conventions.

Functional jnp re-implementations of the reference coders
(/root/reference/r3det/core/bbox/coder/delta_xywha_rbbox_coder.py and
delta_xywha_hbbox_coder.py). Two coder families:

- :class:`DeltaXYWHAOBBoxCoder` — anchors are 5-param oriented boxes.
- :class:`DeltaXYWHAHBBoxCoder` — anchors are 4-param xyxy horizontal boxes
  but targets are 5-param oriented boxes (used with horizontal base anchors).

Every branch is pure jnp over ``(..., 5)`` / ``(..., 4)`` arrays and safe
under jit/vmap. The parity-critical angle arithmetic — v2's ``/pi``
normalization and ``(x + pi/4) % pi - pi/4`` folds, v3's w/h/theta
regularization and ``/(2pi)`` scaling — follows the reference exactly
(file:line cited per function).
"""
import math
from typing import Sequence, Tuple

import jax.numpy as jnp

PI = math.pi
DEFAULT_MEANS = (0., 0., 0., 0., 0.)
DEFAULT_STDS = (1., 1., 1., 1., 1.)


def _normalize(deltas, means, stds):
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    return (deltas - means) / stds


def _denormalize(deltas, means, stds):
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    return deltas * stds + means


def _unpack5(b):
    return (b[..., 0], b[..., 1], b[..., 2], b[..., 3], b[..., 4])


def _hbb_center(b):
    px = (b[..., 0] + b[..., 2]) * 0.5
    py = (b[..., 1] + b[..., 3]) * 0.5
    pw = b[..., 2] - b[..., 0]
    ph = b[..., 3] - b[..., 1]
    return px, py, pw, ph


# ---------------------------------------------------------------------------
# OBB-anchor coder (anchors: (..., 5))
# ---------------------------------------------------------------------------

def obb2delta_v1(proposals, gt, means=DEFAULT_MEANS, stds=DEFAULT_STDS):
    """Plain offsets; da = ga - pa. Parity: delta_xywha_rbbox_coder.py:105-139."""
    px, py, pw, ph, pa = _unpack5(proposals)
    gx, gy, gw, gh, ga = _unpack5(gt)
    deltas = jnp.stack([
        (gx - px) / pw,
        (gy - py) / ph,
        jnp.log(gw / pw),
        jnp.log(gh / ph),
        ga - pa,
    ], axis=-1)
    return _normalize(deltas, means, stds)


def delta2obb_v1(rois, deltas, means=DEFAULT_MEANS, stds=DEFAULT_STDS,
                 max_shape=None, wh_ratio_clip=16 / 1000):
    """Parity: delta_xywha_rbbox_coder.py:143-211 (ctr-clamp path unused by
    any shipped config and omitted)."""
    d = _denormalize(deltas, means, stds)
    dx, dy, dw, dh, da = _unpack5(d)
    px, py, pw, ph, pa = _unpack5(rois)
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    ga = pa + da
    if max_shape is not None:
        gx = jnp.clip(gx, 0, max_shape[1] - 1)
        gy = jnp.clip(gy, 0, max_shape[0] - 1)
    return jnp.stack([gx, gy, gw, gh, ga], axis=-1)


def obb2delta_v2(proposals, gt, means=DEFAULT_MEANS, stds=DEFAULT_STDS):
    """Rotated-frame projection; dtheta folded to [-pi/4, 3pi/4) then /pi.

    Parity: delta_xywha_rbbox_coder.py:215-252.
    """
    px, py, pw, ph, pa = _unpack5(proposals)
    gx, gy, gw, gh, ga = _unpack5(gt)
    cosp, sinp = jnp.cos(pa), jnp.sin(pa)
    dx = (cosp * (gx - px) + sinp * (gy - py)) / pw
    dy = (-sinp * (gx - px) + cosp * (gy - py)) / ph
    dtheta = ga - pa
    dtheta = (dtheta + PI / 4) % PI - PI / 4
    dtheta = dtheta / PI
    deltas = jnp.stack([dx, dy, jnp.log(gw / pw), jnp.log(gh / ph), dtheta],
                       axis=-1)
    return _normalize(deltas, means, stds)


def delta2obb_v2(rois, deltas, means=DEFAULT_MEANS, stds=DEFAULT_STDS,
                 wh_ratio_clip=16 / 1000):
    """Parity: delta_xywha_rbbox_coder.py:255-311."""
    d = _denormalize(deltas, means, stds)
    dx, dy, dw, dh, da = _unpack5(d)
    da = da * PI
    px, py, pw, ph, pa = _unpack5(rois)
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    cosp, sinp = jnp.cos(pa), jnp.sin(pa)
    gx = dx * pw * cosp - dy * ph * sinp + px
    gy = dx * pw * sinp + dy * ph * cosp + py
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    ga = (da + pa + PI / 4) % PI - PI / 4
    return jnp.stack([gx, gy, gw, gh, ga], axis=-1)


def obb2delta_v3(proposals, gt, means=DEFAULT_MEANS, stds=DEFAULT_STDS):
    """gt regularized to the nearest of {theta, theta+pi/2} before encoding;
    projection uses R(-pa). Parity: delta_xywha_rbbox_coder.py:314-360."""
    px, py, pw, ph, pa = _unpack5(proposals)
    gx, gy, gw, gh, ga = _unpack5(gt)
    dt1 = (ga - pa + PI / 2) % PI - PI / 2
    dt2 = (ga - pa + PI) % PI - PI / 2       # == ((ga-pa+pi/2)+pi/2)%pi - pi/2
    take1 = jnp.abs(dt1) < jnp.abs(dt2)
    gw_r = jnp.where(take1, gw, gh)
    gh_r = jnp.where(take1, gh, gw)
    dtheta = jnp.where(take1, dt1, dt2)
    cosp, sinp = jnp.cos(-pa), jnp.sin(-pa)
    dx = (cosp * (gx - px) + sinp * (gy - py)) / pw
    dy = (-sinp * (gx - px) + cosp * (gy - py)) / ph
    deltas = jnp.stack(
        [dx, dy, jnp.log(gw_r / pw), jnp.log(gh_r / ph), dtheta], axis=-1)
    return _normalize(deltas, means, stds)


def delta2obb_v3(rois, deltas, means=DEFAULT_MEANS, stds=DEFAULT_STDS,
                 wh_ratio_clip=16 / 1000):
    """Decode + w>=h regularization + angle renorm.

    Parity: delta_xywha_rbbox_coder.py:363-423.
    """
    d = _denormalize(deltas, means, stds)
    dx, dy, dw, dh, da = _unpack5(d)
    px, py, pw, ph, pa = _unpack5(rois)
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    cosp, sinp = jnp.cos(-pa), jnp.sin(-pa)
    gx = dx * pw * cosp - dy * ph * sinp + px
    gy = dx * pw * sinp + dy * ph * cosp + py
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gtheta = da + pa
    wide = gw > gh
    w_r = jnp.where(wide, gw, gh)
    h_r = jnp.where(wide, gh, gw)
    t_r = jnp.where(wide, gtheta, gtheta + PI / 2)
    t_r = (t_r + PI / 2) % PI - PI / 2
    return jnp.stack([gx, gy, w_r, h_r, t_r], axis=-1)


# ---------------------------------------------------------------------------
# HBB-anchor coder (anchors: (..., 4) xyxy; gt/decoded: (..., 5))
# ---------------------------------------------------------------------------

def hbb2delta_v1(proposals, gt, means=DEFAULT_MEANS, stds=DEFAULT_STDS):
    """da = ga raw. Parity: delta_xywha_hbbox_coder.py:113-157."""
    px, py, pw, ph = _hbb_center(proposals)
    gx, gy, gw, gh, ga = _unpack5(gt)
    deltas = jnp.stack([
        (gx - px) / pw, (gy - py) / ph,
        jnp.log(gw / pw), jnp.log(gh / ph), ga,
    ], axis=-1)
    return _normalize(deltas, means, stds)


def delta2hbb_obb_v1(rois, deltas, means=DEFAULT_MEANS, stds=DEFAULT_STDS,
                     wh_ratio_clip=16 / 1000):
    """Parity: delta_xywha_hbbox_coder.py:161-235."""
    d = _denormalize(deltas, means, stds)
    dx, dy, dw, dh, da = _unpack5(d)
    px, py, pw, ph = _hbb_center(rois)
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    return jnp.stack([
        px + pw * dx, py + ph * dy,
        pw * jnp.exp(dw), ph * jnp.exp(dh), da,
    ], axis=-1)


def hbb2delta_v2(proposals, gt, means=DEFAULT_MEANS, stds=DEFAULT_STDS):
    """da = ga / pi. Parity: delta_xywha_hbbox_coder.py:239-283."""
    px, py, pw, ph = _hbb_center(proposals)
    gx, gy, gw, gh, ga = _unpack5(gt)
    deltas = jnp.stack([
        (gx - px) / pw, (gy - py) / ph,
        jnp.log(gw / pw), jnp.log(gh / ph), ga / PI,
    ], axis=-1)
    return _normalize(deltas, means, stds)


def delta2hbb_obb_v2(rois, deltas, means=DEFAULT_MEANS, stds=DEFAULT_STDS,
                     wh_ratio_clip=16 / 1000):
    """Parity: delta_xywha_hbbox_coder.py:286-361."""
    d = _denormalize(deltas, means, stds)
    dx, dy, dw, dh, da = _unpack5(d)
    da = da * PI
    px, py, pw, ph = _hbb_center(rois)
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    ga = (da + PI / 4) % PI - PI / 4
    return jnp.stack([
        px + pw * dx, py + ph * dy,
        pw * jnp.exp(dw), ph * jnp.exp(dh), ga,
    ], axis=-1)


def hbb2delta_v3(proposals, gt, means=DEFAULT_MEANS, stds=DEFAULT_STDS):
    """gt regularized against theta=0, dtheta scaled by 1/(2pi).

    Parity: delta_xywha_hbbox_coder.py:364-413.
    """
    px, py, pw, ph = _hbb_center(proposals)
    gx, gy, gw, gh, ga = _unpack5(gt)
    dt1 = (ga + PI / 2) % PI - PI / 2
    dt2 = (ga + PI) % PI - PI / 2
    take1 = jnp.abs(dt1) < jnp.abs(dt2)
    gw_r = jnp.where(take1, gw, gh)
    gh_r = jnp.where(take1, gh, gw)
    dtheta = jnp.where(take1, dt1, dt2) / (2 * PI)
    deltas = jnp.stack([
        (gx - px) / pw, (gy - py) / ph,
        jnp.log(gw_r / pw), jnp.log(gh_r / ph), dtheta,
    ], axis=-1)
    return _normalize(deltas, means, stds)


def delta2hbb_obb_v3(rois, deltas, means=DEFAULT_MEANS, stds=DEFAULT_STDS,
                     wh_ratio_clip=16 / 1000):
    """Parity: delta_xywha_hbbox_coder.py:416-496."""
    d = _denormalize(deltas, means, stds)
    dx, dy, dw, dh, da = _unpack5(d)
    da = da * 2 * PI
    px, py, pw, ph = _hbb_center(rois)
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gtheta = (da + PI / 2) % PI - PI / 2
    wide = gw > gh
    w_r = jnp.where(wide, gw, gh)
    h_r = jnp.where(wide, gh, gw)
    t_r = jnp.where(wide, gtheta, gtheta + PI / 2)
    t_r = (t_r + PI / 2) % PI - PI / 2
    return jnp.stack([px + pw * dx, py + ph * dy, w_r, h_r, t_r], axis=-1)


# ---------------------------------------------------------------------------
# Coder classes (config-facing, stateless)
# ---------------------------------------------------------------------------

_OBB_ENCODE = {'v1': obb2delta_v1, 'v2': obb2delta_v2, 'v3': obb2delta_v3}
_OBB_DECODE = {'v1': delta2obb_v1, 'v2': delta2obb_v2, 'v3': delta2obb_v3}
_HBB_ENCODE = {'v1': hbb2delta_v1, 'v2': hbb2delta_v2, 'v3': hbb2delta_v3}
_HBB_DECODE = {'v1': delta2hbb_obb_v1, 'v2': delta2hbb_obb_v2,
               'v3': delta2hbb_obb_v3}


class DeltaXYWHAOBBoxCoder:
    """OBB(5)-anchor <-> delta(5) coder. Stateless; jit-safe methods."""

    def __init__(self,
                 target_means: Sequence[float] = DEFAULT_MEANS,
                 target_stds: Sequence[float] = DEFAULT_STDS,
                 angle_range: str = 'v1',
                 angle_version: str = None):
        self.means: Tuple[float, ...] = tuple(target_means)
        self.stds: Tuple[float, ...] = tuple(target_stds)
        # `angle_range` is the reference's config key
        # (delta_xywha_rbbox_coder.py:34); `angle_version` is this
        # framework's name for the same concept. Accept both, never a
        # silent **kwargs sink (an ignored version kwarg decodes v1).
        self.angle_range = angle_version or angle_range

    def encode(self, bboxes, gt_bboxes):
        return _OBB_ENCODE[self.angle_range](bboxes, gt_bboxes, self.means,
                                             self.stds)

    def decode(self, bboxes, pred_bboxes, max_shape=None,
               wh_ratio_clip=16 / 1000):
        fn = _OBB_DECODE[self.angle_range]
        if self.angle_range == 'v1':
            return fn(bboxes, pred_bboxes, self.means, self.stds, max_shape,
                      wh_ratio_clip)
        return fn(bboxes, pred_bboxes, self.means, self.stds, wh_ratio_clip)


class DeltaXYWHAHBBoxCoder:
    """HBB(4 xyxy)-anchor -> OBB(5) coder (horizontal base anchors)."""

    def __init__(self,
                 target_means: Sequence[float] = DEFAULT_MEANS,
                 target_stds: Sequence[float] = DEFAULT_STDS,
                 angle_range: str = 'v1',
                 angle_version: str = None):
        self.means: Tuple[float, ...] = tuple(target_means)
        self.stds: Tuple[float, ...] = tuple(target_stds)
        self.angle_range = angle_version or angle_range

    def encode(self, bboxes, gt_bboxes):
        return _HBB_ENCODE[self.angle_range](bboxes, gt_bboxes, self.means,
                                             self.stds)

    def decode(self, bboxes, pred_bboxes, max_shape=None,
               wh_ratio_clip=16 / 1000):
        return _HBB_DECODE[self.angle_range](bboxes, pred_bboxes, self.means,
                                             self.stds, wh_ratio_clip)
