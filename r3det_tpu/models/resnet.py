"""ResNet backbone (flax), TPU-first.

Re-provides the backbone the reference configs import from mmdet
(configs/r3det/r3det_r50_fpn_1x_dota_v1.py:8-18: ResNet-50, out_indices
(0,1,2,3), frozen_stages=1, norm_eval=True, style='pytorch').

TPU-native choices:
- NHWC layout (XLA's native conv layout on TPU).
- BatchNorm is folded to FrozenBN (scale/bias with constant running
  stats): the reference always runs BN in eval mode (`norm_eval=True`),
  so statistics are never updated — on TPU that makes BN a fusable
  elementwise affine, which XLA merges into the surrounding convs.
  Affine params stay trainable except in frozen stages.
- ``frozen_stages`` is realized functionally with stop_gradient rather
  than optimizer masking, so one optimizer covers every param.
- bf16 compute / fp32 params via the ``dtype`` field.
"""
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBN(nn.Module):
    """Affine-only BatchNorm: y = scale * (x - mean) / sqrt(var+eps) + bias.

    mean/var are non-trainable variables (collection 'batch_stats') filled
    from pretrained checkpoints; scale/bias are params.
    """
    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((self.features,)))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((self.features,)))
        inv = (scale * jax.lax.rsqrt(var.value + self.eps)).astype(self.dtype)
        b = (bias - mean.value * scale *
             jax.lax.rsqrt(var.value + self.eps)).astype(self.dtype)
        return x * inv + b


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck, 'pytorch style' (stride on the
    3x3), matching torchvision/mmcv ResNet. ``quantize`` swaps the convs
    for int8 PTQ QConv (models/quant.py) — same param tree. ``fused``
    routes identity-residual stride-1 blocks through the resident
    Pallas kernel (ops/bottleneck_fuse.py) on TPU — inference-only (no
    VJP), bf16, exact-BN-fold numerics; param tree unchanged."""
    features: int                 # bottleneck width; out = features * 4
    stride: int = 1
    quantize: bool = False
    fused: bool = False
    # int8 activation STORAGE (serving, requires quantize='static'):
    # quantize the block input once with a block-level calibrated scale
    # and share the int8 tensor between conv1, the downsample conv and
    # the residual (which reads the dequantized int8). The input's bf16
    # form then has no consumers, so XLA fuses the quantize into the
    # previous block's epilogue and the big inter-block tensors travel
    # HBM at half width — the C2/C3 bandwidth the retired fused
    # bottleneck kernel targeted, without a Pallas region.
    int8_act: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .quant import conv_factory
        Conv = conv_factory(self.quantize)
        residual = x
        conv1 = Conv(self.features, (1, 1), use_bias=False,
                     dtype=self.dtype, name='conv1')
        bn1 = FrozenBN(self.features, dtype=self.dtype, name='bn1')
        conv2 = Conv(self.features, (3, 3),
                     strides=(self.stride, self.stride),
                     padding=[(1, 1), (1, 1)], use_bias=False,
                     dtype=self.dtype, name='conv2')
        bn2 = FrozenBN(self.features, dtype=self.dtype, name='bn2')
        conv3 = Conv(self.features * 4, (1, 1), use_bias=False,
                     dtype=self.dtype, name='conv3')
        bn3 = FrozenBN(self.features * 4, dtype=self.dtype, name='bn3')

        # features cap: at F=512 (layer4) the BN-folded weights alone are
        # ~9 MB bf16, blowing the ~16 MB VMEM budget with band + accum
        can_fuse = (self.fused and self.stride == 1
                    and residual.shape[-1] == self.features * 4
                    and x.shape[1] % 8 == 0 and self.features <= 256)
        if can_fuse:
            # bind the submodules on dummies so the param tree (and
            # checkpoints, incl. int8 quant_stats) stays identical to
            # the unfused form, then read kernels and fold BN exactly
            f = self.features
            d4 = jnp.zeros((1, 8, 8, 4 * f), self.dtype)
            bn3(conv3(bn2(conv2(bn1(conv1(d4))))))
            from ..ops.bottleneck_fuse import (
                fold_bn, fused_bottleneck, fused_bottleneck_q8,
                fused_bottleneck_q8_xla)

            def folded(conv, bn):
                k = conv.variables['params']['kernel'].astype(jnp.float32)
                p = bn.variables['params']
                s = bn.variables['batch_stats']
                return fold_bn(k, p['scale'], p['bias'],
                               s['mean'], s['var'])

            w1, b1 = folded(conv1, bn1)
            w2, b2 = folded(conv2, bn2)
            w3, b3 = folded(conv3, bn3)

            if self.quantize == 'static':
                # int8 resident kernel: calibrated QConv act ranges
                # (quant_stats) + BN-folded per-channel weight quant.
                # Calibration itself must run with fused_blocks=False
                # (the kernel consumes the scales, it can't record them).
                amax = [c.variables['quant_stats']['act_absmax']
                        for c in (conv1, conv2, conv3)]
                return jax.lax.platform_dependent(
                    x.astype(jnp.bfloat16), w1, b1, w2, b2, w3, b3,
                    amax[0], amax[1], amax[2],
                    tpu=fused_bottleneck_q8,
                    default=fused_bottleneck_q8_xla).astype(self.dtype)

            def xla_ref(x, w1, b1, w2, b2, w3, b3):
                # non-TPU branch: same folded math as the kernel
                def c(x, w, b, pad):
                    y = jax.lax.conv_general_dilated(
                        x, w.astype(x.dtype), (1, 1), pad,
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                        preferred_element_type=jnp.float32)
                    return y + b
                y = nn.relu(c(x, w1, b1, 'SAME').astype(x.dtype))
                y = nn.relu(c(y, w2, b2, [(1, 1), (1, 1)]).astype(x.dtype))
                y = c(y, w3, b3, 'SAME')
                return nn.relu(y + x.astype(jnp.float32)).astype(x.dtype)

            return jax.lax.platform_dependent(
                x.astype(jnp.bfloat16), w1, b1, w2, b2, w3, b3,
                tpu=fused_bottleneck, default=xla_ref).astype(self.dtype)

        x_in = x
        if self.int8_act and self.quantize == 'static':
            # block-level input scale, calibrated like QConv's
            # act_absmax (tools/test.py --calibrate-int8 records it on
            # the same mutable pass); bench pre-fills it with the rest
            # of quant_stats
            inabs = self.variable('quant_stats', 'in_absmax',
                                  lambda: jnp.zeros((), jnp.float32))
            x32 = x.astype(jnp.float32)
            if self.is_mutable_collection('quant_stats'):
                dyn = jnp.max(jnp.abs(x32))
                inabs.value = jnp.maximum(inabs.value, dyn)
                absmax = jnp.where(inabs.value > 0, inabs.value, dyn)
            else:
                absmax = inabs.value
            ascale = jnp.maximum(absmax, 1e-8) / 127.0
            xi = jnp.clip(jnp.round(x32 / ascale),
                          -127, 127).astype(jnp.int8)
            x_in = (xi, ascale)
            residual = (xi.astype(jnp.float32) * ascale).astype(
                self.dtype)
        y = conv1(x_in)
        y = bn1(y)
        y = nn.relu(y)
        y = conv2(y)
        y = bn2(y)
        y = nn.relu(y)
        y = conv3(y)
        y = bn3(y)
        if x.shape[-1] != self.features * 4 or self.stride != 1:
            residual = Conv(self.features * 4, (1, 1),
                            strides=(self.stride, self.stride),
                            use_bias=False, dtype=self.dtype,
                            name='downsample_conv')(x_in)
            residual = FrozenBN(self.features * 4, dtype=self.dtype,
                                name='downsample_bn')(residual)
        return nn.relu(y + residual)


def space_to_depth_2x(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), packing 2x2 blocks channelwise."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def fold_stem_kernel(w7):
    """Fold a (7, 7, C, O) stride-2 stem kernel into the equivalent
    (4, 4, 4C, O) stride-1 kernel over a space-to-depth(2) input.

    Exact identity: out[i,j] = sum_{u,v in 0..7} W8[u,v] x[2i+u-4, 2j+v-4]
    with W8 = pad(w7, left/top 1); substituting u = 2p+a, v = 2q+b packs
    (a, b, c) into the new input-channel axis.
    """
    import numpy as _np
    w7 = _np.asarray(w7)
    c, o = w7.shape[2], w7.shape[3]
    w8 = _np.zeros((8, 8, c, o), w7.dtype)
    w8[1:, 1:] = w7
    # (4p+a, 4q+b) regroup: (8,8,C,O) -> (4,2,4,2,C,O) -> (4,4,2,2,C,O)
    wp = w8.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    return wp.reshape(4, 4, 4 * c, o)


class ResNet(nn.Module):
    """ResNet-50/101/152 trunk emitting C2..C5 (NHWC).

    depth 50 -> blocks (3, 4, 6, 3).

    ``stem_space_to_depth``: run the 7x7/s2 stem as an exactly-equivalent
    4x4/s1 conv over a space-to-depth(2) input. The raw 3-channel conv
    pads channels to a full 128-lane register on TPU (~42x waste;
    measured 6.8 ms of a 22 ms batch-8 backbone); the folded form runs
    on 12 channels at half resolution. Pretrained 7x7 weights convert
    via ``fold_stem_kernel`` (utils/checkpoint.py applies it).
    """
    depth: int = 50
    frozen_stages: int = 1        # 1 => stem + layer1 frozen (mmcv meaning)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    stem_space_to_depth: bool = True
    # opt-in: ops/stem_pool.py fused Pallas stem on the s2d4 form
    # (stem_conv_pool_s2d4_pallas: 9 accumulated K=48 taps — avoids the
    # 16-way 12-lane concat of the original _stem_kernel that wedges
    # this image's remote Mosaic compile service). Exact interpret-mode
    # parity with the XLA s2d4 composition.
    stem_fused_kernel: bool = False
    # int8 PTQ on the bottleneck convs (models/quant.py); the stem stays
    # in the compute dtype (tiny, and its s2d4 form is already fast)
    quantize: bool = False
    # route stride-1 identity blocks through the resident Pallas
    # bottleneck kernel (ops/bottleneck_fuse.py) — inference-only
    fused_blocks: bool = False
    # pallas band kernel for ONLY the stem's blocked maxpool (keeps the
    # XLA int8 conv on the MXU int8 path; ops/stem_pool.py::
    # pool_s2d4_pallas). Orthogonal to stem_fused_kernel.
    stem_pool_kernel: bool = False
    # int8 activation storage between bottlenecks (see Bottleneck
    # int8_act); serving-only, requires quantize='static'
    int8_act: bool = False
    dtype: Any = jnp.float32

    @property
    def stage_blocks(self) -> Tuple[int, ...]:
        # depth 10 is a 1-block-per-stage bottleneck trunk for fast
        # tests; depth 14 adds one stride-1 identity block (covers the
        # identity-residual paths the all-downsample depth 10 misses)
        return {10: (1, 1, 1, 1), 14: (2, 1, 1, 1), 50: (3, 4, 6, 3),
                101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[self.depth]

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        if self.stem_space_to_depth:
            # folded stem: conv + FrozenBN + relu + maxpool computed via
            # a second space-to-depth fold (48-channel, lane-friendly
            # K=432 contraction — ops/stem_pool.py::stem_conv_pool_s2d4;
            # measured 12.3 ms/batch-16 faster than the 12-channel conv
            # on v5e, identical numerics). Params keep the exact tree
            # paths of the module form (conv1/kernel, bn1/..), so
            # checkpoints are interchangeable.
            from ..ops.stem_pool import (stem_conv_pool_s2d4,
                                         stem_conv_pool_s2d4_pallas)
            x = space_to_depth_2x(x)
            conv1 = self.param(
                'conv1', lambda k: {'kernel': nn.initializers.lecun_normal()(
                    k, (4, 4, 12, 64), jnp.float32)})
            bn1 = self.param(
                'bn1', lambda k: {'scale': jnp.ones((64,), jnp.float32),
                                  'bias': jnp.zeros((64,), jnp.float32)})
            stats = self.variable(
                'batch_stats', 'bn1',
                lambda: {'mean': jnp.zeros((64,), jnp.float32),
                         'var': jnp.ones((64,), jnp.float32)})
            inv = bn1['scale'] * jax.lax.rsqrt(stats.value['var'] + 1e-5)
            off = bn1['bias'] - stats.value['mean'] * inv
            kern = conv1['kernel']
            if self.stem_fused_kernel and self.frozen_stages >= 0:
                # stem is frozen in every shipped config: cut gradients
                # BEFORE the platform dispatch so autodiff never tries to
                # JVP the pallas branch (it has no derivative rule)
                import functools
                q = bool(self.quantize)
                x, kern, inv, off = jax.lax.stop_gradient(
                    (x, kern, inv, off))
                x = jax.lax.platform_dependent(
                    x, kern, inv, off,
                    tpu=functools.partial(stem_conv_pool_s2d4_pallas,
                                          quantize=q),
                    default=functools.partial(stem_conv_pool_s2d4,
                                              dtype=self.dtype,
                                              quantize=q)).astype(
                                                  self.dtype)
            else:
                x = stem_conv_pool_s2d4(
                    x, kern, inv, off, dtype=self.dtype,
                    quantize=bool(self.quantize),
                    pool_kernel=self.stem_pool_kernel).astype(self.dtype)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        dtype=self.dtype, name='conv1')(x)
            x = FrozenBN(64, dtype=self.dtype, name='bn1')(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        widths = (64, 128, 256, 512)
        for stage, num_blocks in enumerate(self.stage_blocks):
            for blk in range(num_blocks):
                stride = 2 if (blk == 0 and stage > 0) else 1
                x = Bottleneck(widths[stage], stride=stride,
                               quantize=self.quantize,
                               fused=self.fused_blocks,
                               int8_act=self.int8_act, dtype=self.dtype,
                               name=f'layer{stage + 1}_{blk}')(x)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)
