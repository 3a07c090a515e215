"""Post-training int8 quantization for the inference path.

The v5e MXU runs int8 at 394 TOPS vs 197 TFLOP/s bf16, and int8
activations halve the HBM traffic of the bandwidth-bound early ResNet
stages — the only path past the ~230 patches/s bf16 roofline
(PARITY.md speed-of-light analysis). This module provides ``QConv``, a
drop-in for ``nn.Conv`` on the backbone/FPN (heads and decode stay
bf16: their logits/regression outputs are precision-sensitive and they
already run near MXU peak).

Scheme (standard symmetric PTQ):
- weights: per-output-channel symmetric int8, quantized from the f32
  params at trace time — the param tree ('kernel', 'bias') is identical
  to nn.Conv, so checkpoints and the torchvision converter work
  unchanged;
- activations: per-tensor symmetric int8 with a CALIBRATED static scale
  stored in the 'quant_stats' collection (one scalar per conv). Running
  the model with ``mutable=['quant_stats']`` records max|x| (one
  calibration pass over any representative batch — tools/test.py
  --calibrate-int8 or a synthetic batch); uncalibrated scales fall back
  to a dynamic max|x| reduction (correct but pays an extra read of the
  activation).
- the conv itself: int8 x int8 -> int32 via
  ``lax.conv_general_dilated(..., preferred_element_type=jnp.int32)``
  (XLA's canonical MXU int8 form), dequantized by (act_scale *
  per-channel weight scale).

Reference counterpart: none (the reference serves fp32/fp16 CUDA); this
is the TPU-native serving component the >=300 patches/s target requires.
"""
from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def _quantize_weights(kernel):
    """f32 (kh, kw, ci, co) -> (int8 kernel, f32 per-co scale)."""
    kmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))          # (co,)
    scale = jnp.maximum(kmax, 1e-8) / 127.0
    ki = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return ki, scale


class QConv(nn.Module):
    """int8 symmetric-PTQ convolution, param-tree-compatible with
    nn.Conv(use_bias=False).

    ``static_scale=True`` trusts the calibrated 'quant_stats' scale and
    skips the dynamic max|x| reduction entirely — the runtime-``where``
    fallback otherwise keeps the extra full read of the activation in
    the compiled program even when calibrated (the select's both-branch
    data dependency). Requires a calibration pass first; uncalibrated
    static scales quantize everything to ~0.
    """
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = 'SAME'
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    kernel_init: Any = nn.initializers.lecun_normal()
    static_scale: bool = False

    @nn.compact
    def __call__(self, x):
        # ``x`` may be a pre-quantized (int8 tensor, f32 scale) pair —
        # the int8-activation-storage path (Bottleneck int8_act)
        # quantizes a block input ONCE and shares the int8 tensor
        # between conv1 / downsample / the residual, so the bf16 form
        # never round-trips HBM. The act_absmax variable is still
        # defined (param-tree compat with checkpoints), just unused.
        prequant = isinstance(x, tuple)
        ci = x[0].shape[-1] if prequant else x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param('kernel', self.kernel_init,
                            (kh, kw, ci, self.features))
        ki, kscale = _quantize_weights(kernel.astype(jnp.float32))
        # calibrated per-tensor activation scale; 0 = uncalibrated
        amax = self.variable('quant_stats', 'act_absmax',
                             lambda: jnp.zeros((), jnp.float32))
        if prequant:
            xi, ascale = x
        else:
            x32 = x.astype(jnp.float32)
            mutable = self.is_mutable_collection('quant_stats')
            if mutable or not self.static_scale:
                dyn = jnp.max(jnp.abs(x32))
                if mutable:
                    amax.value = jnp.maximum(amax.value, dyn)
                absmax = jnp.where(amax.value > 0, amax.value, dyn)
            else:
                absmax = amax.value
            ascale = jnp.maximum(absmax, 1e-8) / 127.0
            xi = jnp.clip(jnp.round(x32 / ascale),
                          -127, 127).astype(jnp.int8)
        pad = self.padding
        if not isinstance(pad, str):
            pad = [tuple(p) for p in pad]
        # bf16 conv output when computing in bf16: XLA does NOT fuse the
        # dequant epilogue into TPU convolutions — the accumulator buffer
        # round-trips through HBM (s32[B,H,W,C] materialized; measured
        # 537 MB per C2 bottleneck at batch 8, the dominant early-stage
        # traffic). preferred_element_type=bf16 keeps int32 MXU
        # accumulation in-register and writes bf16, halving that
        # round trip. The rounding matches the path's overall bf16
        # precision (the dequant result is cast to bf16 anyway). Exact
        # int32 is kept for f32 models (parity/debug).
        out_t = jnp.bfloat16 if self.dtype == jnp.bfloat16 else jnp.int32
        y = jax.lax.conv_general_dilated(
            xi, ki, self.strides, pad,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=out_t)
        y = y.astype(jnp.float32) * (ascale * kscale)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,))
            y = y + bias
        return y.astype(self.dtype)


def conv_factory(quantize):
    """nn.Conv-compatible constructor: QConv when quantize else nn.Conv.

    ``quantize`` is False (plain nn.Conv), True (int8, dynamic-scale
    fallback when uncalibrated) or the string 'static' (int8, trust the
    calibrated scales and skip the per-conv max|x| pass — the serving
    configuration after tools/test.py --calibrate-int8).
    """
    if not quantize:
        return nn.Conv
    static = quantize == 'static'

    def make(features, kernel_size, strides=(1, 1), padding='SAME',
             use_bias=True, dtype=jnp.bfloat16, name=None,
             kernel_init=nn.initializers.lecun_normal(), **kw):
        return QConv(features=features, kernel_size=tuple(kernel_size),
                     strides=tuple(strides) if not isinstance(
                         strides, int) else (strides, strides),
                     padding=padding, use_bias=use_bias, dtype=dtype,
                     name=name, kernel_init=kernel_init,
                     static_scale=static)
    return make


def calibrate(model, variables, sample_batches):
    """One-pass activation-range calibration.

    Runs the model over ``sample_batches`` with quant_stats mutable and
    returns variables with the recorded per-conv act_absmax filled in.
    """
    qs = variables.get('quant_stats', {})
    for x in sample_batches:
        _, mut = model.apply(variables, x, mutable=['quant_stats'])
        qs = mut['quant_stats']
        variables = dict(variables, quant_stats=qs)
    return variables
