"""Rotated RetinaNet head (flax).

Re-provides the reference's RRetinaHead tower (rotate_retina_head.py:51-115):
4 stacked 3x3 convs + ReLU on each of the cls/reg branches, then 3x3
prediction convs emitting num_anchors * num_classes class logits and
num_anchors * 5 box deltas per position. Cls bias initialized to the focal
prior -log((1-p)/p), p=0.01 (rotate_retina_head.py:84-92).

TPU-native: NHWC; level loop unrolled at trace time (5 levels, shared
params via scan-free weight sharing through module reuse); outputs are
(B, H, W, A*C) / (B, H, W, A*5) — position-major, matching the anchor
layout from core.anchors.
"""
import math
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn


def focal_bias_init(prior=0.01):
    b = -math.log((1 - prior) / prior)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, b, dtype)
    return init


class RRetinaHead(nn.Module):
    num_classes: int = 15
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 9
    dtype: Any = jnp.float32
    # int8 PTQ (models/quant.py) on the TOWER convs only; the final
    # retina_cls/retina_reg prediction convs always stay high-precision
    # (their logits/deltas feed decode directly). False | True | 'static'.
    quantize: Any = False

    @nn.compact
    def __call__(self, feats) -> Tuple[tuple, tuple]:
        from .quant import conv_factory
        Conv = conv_factory(self.quantize)
        conv_kw = dict(padding=[(1, 1), (1, 1)], dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01))
        cls_convs = [Conv(self.feat_channels, (3, 3), name=f'cls_conv_{i}',
                          **conv_kw) for i in range(self.stacked_convs)]
        reg_convs = [Conv(self.feat_channels, (3, 3), name=f'reg_conv_{i}',
                          **conv_kw) for i in range(self.stacked_convs)]
        retina_cls = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             bias_init=focal_bias_init(), name='retina_cls')
        retina_reg = nn.Conv(self.num_anchors * 5, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name='retina_reg')

        cls_scores, bbox_preds = [], []
        for x in feats:
            cf, rf = x, x
            for conv in cls_convs:
                cf = nn.relu(conv(cf))
            for conv in reg_convs:
                rf = nn.relu(conv(rf))
            # predictions in fp32 for stable loss/decode
            cls_scores.append(retina_cls(cf).astype(jnp.float32))
            bbox_preds.append(retina_reg(rf).astype(jnp.float32))
        return tuple(cls_scores), tuple(bbox_preds)
