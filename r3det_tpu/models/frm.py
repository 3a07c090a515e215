"""Feature Refinement Module (R3Det), TPU-native.

Re-provides the reference's FeatureRefineModule + custom CUDA sampling op
(fr/feature_refine_module.py:66-127, fr/src/feature_refine_kernel.cu):
per level, a (1x5 -> 5x1) conv branch plus a 1x1 conv branch are summed,
bilinearly sampled at each position's best-box center (points=1) or
center+4 corners (points=5), and residual-added to the input feature.

TPU-native: the sampling is a plain bilinear gather expressed in jnp —
JAX autodiff produces the scatter-add backward (deterministic on TPU,
replacing the reference's atomicAdd kernel, feature_refine_kernel.cu:
165-230). No custom VJP needed.

Reference parity quirk (feature_refine_kernel.cu:131-132 + :157-160): the
CUDA kernel reads bbox.x into its row coordinate and bbox.y into its
column coordinate — i.e. it samples at transposed coordinates. We keep
that behavior behind ``transpose_quirk`` (default True for checkpoint
parity; set False for geometrically-correct sampling).
"""
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def bilinear_sample(feat, py, px):
    """Bilinear sample feature maps at fractional (row, col) points.

    feat: (B, H, W, C); py, px: (B, N) fractional row/col coords.
    Out-of-range points contribute 0 (reference bilinear_interpolate
    boundary semantics: reject y < -1 or y > H; clamp [-1, 0) to 0).

    ONE flat gather over (B*H*W, C) with the 4 bilinear-corner index
    vectors concatenated, combined by a (4,)-contraction einsum — a
    batched per-image gather lowers much worse on TPU, and the single
    fused take + einsum combine measures ~1.45x faster than four
    separate takes on v5e (the gather is row-latency-bound; wider
    2C/4C repacked rows measured slower still).
    """
    b, h, w, c = feat.shape
    inside = (py > -1.0) & (py < h) & (px > -1.0) & (px < w)
    py = jnp.clip(py, 0.0, h - 1.0)
    px = jnp.clip(px, 0.0, w - 1.0)
    y0 = jnp.floor(py).astype(jnp.int32)
    x0 = jnp.floor(px).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (py - y0).astype(feat.dtype)
    lx = (px - x0).astype(feat.dtype)
    hy, hx = 1.0 - ly, 1.0 - lx

    flat = feat.reshape(b * h * w, c)
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]    # (B, 1)
    idx = jnp.stack([(base + y0 * w + x0).reshape(-1),
                     (base + y0 * w + x1).reshape(-1),
                     (base + y1 * w + x0).reshape(-1),
                     (base + y1 * w + x1).reshape(-1)])            # (4, BN)
    gv = jnp.take(flat, idx.reshape(-1), axis=0).reshape(4, b, -1, c)
    wts = jnp.stack([hy * hx, hy * lx, ly * hx, ly * lx])     # (4, B, N)
    val = jnp.einsum('kbn,kbnc->bnc', wts, gv)
    return jnp.where(inside[..., None], val, 0.0)


def feature_refine_sample(feat, best_bboxes, spatial_scale, points=1,
                          transpose_quirk=True, sample_kernel=False):
    """FR op for one level: feat (B, H, W, C), best_bboxes (B, H*W, 5).

    Returns feat + sum of bilinear samples at the box points (the CUDA
    kernel's ``output_val = input + sum(samples)``).

    sample_kernel routes the points=1 center sample away from the flat
    XLA gather: True/'band' uses the banded Pallas stencil kernel,
    'stencil' the pure-XLA masked-stencil form (ops/frm_sample.py) —
    same values either way (fp reassociation only; the gather path
    also rounds corner weights to feat dtype, the stencils keep f32).
    The band kernel wins isolated but loses in the full serving graph
    (PARITY.md round-5); 'stencil' fuses with its neighbors.
    """
    b, h, w, c = feat.shape
    cx = best_bboxes[..., 0] * spatial_scale
    cy = best_bboxes[..., 1] * spatial_scale
    if transpose_quirk:
        # kernel reads x into the row coord and y into the column coord
        row0, col0 = cx, cy
    else:
        row0, col0 = cy, cx
    # the band kernel's row-coherence assumption needs a square map
    # under the transpose quirk (sample row ~ column index); fall back
    # to the gather on non-square levels. Levels narrower than one
    # 128-lane vector register also stay on the gather — the kernel
    # pads W up to 128 lanes, so at W<128 it wastes the VPU while the
    # flat gather's row count (W^2) is already small.
    # band divisibility (ADVICE r4): the kernel tiles the grid's axis 0
    # (== h both with and without the quirk, since the quirk requires
    # h == w) in Tm = min(16, g0) rows and asserts g0 % Tm == 0 — shapes
    # that don't divide (e.g. 136x136 from a 1088px input) must fall
    # back to the flat gather instead of tripping the assert
    use_band = (sample_kernel in (True, 'band') and points == 1
                and w >= 128 and (h == w or not transpose_quirk)
                and h % min(16, h) == 0)
    # the pure-XLA stencil has no tile/lane-width constraints — it works
    # at every level whose grid aligns with the feature map (always,
    # modulo the quirk's square requirement)
    use_stencil = (sample_kernel == 'stencil' and points == 1
                   and (h == w or not transpose_quirk))
    if use_band or use_stencil:
        from ..ops.frm_sample import (bilinear_sample_band,
                                      bilinear_sample_stencil)
        rowg = row0.reshape(b, h, w)
        colg = col0.reshape(b, h, w)
        if transpose_quirk:
            # sample row ~= cx/stride ~= the position's COLUMN index:
            # band coherence holds in the transposed grid
            rowg = rowg.transpose(0, 2, 1)
            colg = colg.transpose(0, 2, 1)
        ins = jnp.ones(rowg.shape, bool)
        sample = (bilinear_sample_band if use_band
                  else bilinear_sample_stencil)
        val, _ = sample(feat, rowg, colg, ins)
        if transpose_quirk:
            val = val.transpose(0, 2, 1, 3)
        return feat + val
    acc = bilinear_sample(feat, row0, col0).reshape(b, h, w, c)
    if points == 5:
        bw = best_bboxes[..., 2] * spatial_scale
        bh = best_bboxes[..., 3] * spatial_scale
        a = best_bboxes[..., 4]
        cosa, sina = jnp.cos(a), jnp.sin(a)
        wx, wy = cosa * bw / 2, sina * bw / 2
        hx, hy = -sina * bh / 2, cosa * bh / 2
        # corner sign pairs applied jointly to the (w, h) axis vectors,
        # matching the kernel's p1..p4 (feature_refine_kernel.cu:146-150)
        for sw, sh in ((1, 1), (-1, 1), (-1, -1), (1, -1)):
            dx = sw * wx + sh * hx
            dy = sw * wy + sh * hy
            if transpose_quirk:
                # kernel: row = cx*scale + dy, col = cy*scale + dx
                r, cc = cx + dy, cy + dx
            else:
                r, cc = cy + dy, cx + dx
            acc = acc + bilinear_sample(feat, r, cc).reshape(b, h, w, c)
    elif points != 1:
        raise ValueError('points must be 1 or 5')
    return feat + acc


class FeatureRefineModule(nn.Module):
    """Per-level conv branches + FR sampling + residual add.

    forward(x_levels, rois_levels) where rois_levels[lvl] is (B, H*W, 5)
    best boxes in image coordinates for that level.
    """
    in_channels: int = 256
    featmap_strides: Sequence[int] = (8, 16, 32, 64, 128)
    points: int = 1
    transpose_quirk: bool = True
    # route the points=1 sample away from the flat XLA gather:
    # True/'band' = banded Pallas kernel, 'stencil' = pure-XLA masked
    # stencil (ops/frm_sample.py)
    sample_kernel: Any = False
    # compose conv_5_1 o conv_1_5 + conv_1_1 into ONE 5x5 conv per level
    # (all three are linear, no activation between them — r3det's
    # feature_refine_module.py:66-127): K5[dy,dx,ci,co] =
    # sum_m k15[dx,ci,m] k51[dy,m,co], center tap += k11. Same params,
    # same math (fp reassociation only); trades 2.3x MXU FLOPs for one
    # HBM pass instead of three. Off by default until TPU-timed.
    fuse_convs: bool = False
    # int8 PTQ on the three branch convs (models/quant.py), same
    # False | True | 'static' values as the backbone/head flags; the
    # sample gather + residual adds stay in ``dtype``
    quantize: Any = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, rois):
        assert len(feats) == len(self.featmap_strides)
        from .quant import conv_factory
        Conv = nn.Conv if self.fuse_convs else conv_factory(self.quantize)
        conv_5_1 = Conv(self.in_channels, (5, 1),
                        padding=[(2, 2), (0, 0)], dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name='conv_5_1')
        conv_1_5 = Conv(self.in_channels, (1, 5),
                        padding=[(0, 0), (2, 2)], dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name='conv_1_5')
        conv_1_1 = Conv(self.in_channels, (1, 1), dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name='conv_1_1')
        if self.fuse_convs:
            # bind the submodules on a dummy so the param tree (and
            # checkpoints) stay identical to the unfused form, then read
            # their kernels and compose
            dummy = jnp.zeros((1, 8, 8, self.in_channels), self.dtype)
            conv_1_1(conv_5_1(conv_1_5(dummy)))
            p15 = conv_1_5.variables['params']
            p51 = conv_5_1.variables['params']
            p11 = conv_1_1.variables['params']
            k15, b15 = p15['kernel'], p15['bias']
            k51, b51 = p51['kernel'], p51['bias']
            k11, b11 = p11['kernel'], p11['bias']
            # (1,5,ci,m) x (5,1,m,co) -> (5,5,ci,co)
            k5 = jnp.einsum('xim,ymo->yxio', k15[0], k51[:, 0])
            k5 = k5.at[2, 2].add(k11[0, 0])
            # bias: conv_5_1(y + b15) adds sum_m k51[:,m,o] b15[m]
            bias = b51 + b11 + jnp.einsum('ymo,m->o', k51[:, 0], b15)

            def branch(x):
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), k5.astype(self.dtype), (1, 1),
                    [(2, 2), (2, 2)],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                return y + bias.astype(self.dtype)
        else:
            def branch(x):
                return conv_5_1(conv_1_5(x)) + conv_1_1(x)

        out = []
        for lvl, (x, stride) in enumerate(zip(feats, self.featmap_strides)):
            feat = branch(x)
            scale = 1.0 / stride

            refined = feature_refine_sample(
                feat, rois[lvl], scale, self.points, self.transpose_quirk,
                sample_kernel=self.sample_kernel)
            out.append(x + refined)
        return tuple(out)
