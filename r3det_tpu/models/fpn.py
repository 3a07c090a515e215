"""Feature Pyramid Network (flax) — re-provides mmdet's FPN as configured
by the reference (configs/r3det/r3det_r50_fpn_1x_dota_v1.py:19-25:
in [256,512,1024,2048], out 256, start_level=1, add_extra_convs='on_input',
num_outs=5 -> P3..P7).

NHWC; nearest-neighbor top-down upsampling; extra levels from strided 3x3
convs on the last backbone input (RetinaNet style), P7 after ReLU.
"""
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


def _upsample_nearest_2x(x, target_hw):
    b, h, w, c = x.shape
    th, tw = target_hw
    # exact 2x in this pyramid; use repeat (cheap, layout-friendly)
    y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return y[:, :th, :tw, :]


class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    start_level: int = 1
    num_outs: int = 5
    add_extra_convs: str = 'on_input'
    quantize: bool = False       # int8 PTQ convs (models/quant.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        from .quant import conv_factory
        Conv = conv_factory(self.quantize)
        used = list(feats[self.start_level:])
        n = len(used)
        laterals = [
            Conv(self.out_channels, (1, 1), dtype=self.dtype,
                 name=f'lateral_{i}')(used[i])
            for i in range(n)
        ]
        for i in range(n - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(
                laterals[i], laterals[i - 1].shape[1:3])
        outs = [
            Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                 dtype=self.dtype, name=f'fpn_{i}')(laterals[i])
            for i in range(n)
        ]
        extra = self.num_outs - n
        if extra > 0:
            src = feats[-1] if self.add_extra_convs == 'on_input' else outs[-1]
            for i in range(extra):
                src = Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           name=f'extra_{i}')(
                    nn.relu(src) if i > 0 else src)
                outs.append(src)
        return tuple(outs)
