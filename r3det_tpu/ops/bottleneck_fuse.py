"""Fused ResNet bottleneck (stride-1) as one Pallas TPU kernel.

Why: XLA runs each bottleneck as 3 convolutions plus elementwise
fusions, so every intermediate tensor round-trips HBM; in the int8
serving path the conv accumulators do too (the optimized HLO
materializes s32[B,H,W,4F] per block — 537 MB at C2 batch 8). At C2's
1024²-input resolution that traffic dominates: stage L1 measures
19.3 ms/b32 on v5e for ~0.9 TFLOP of math (11% of int8 peak). This
kernel keeps the whole block resident in VMEM:

- grid step = one (TH=8)-row band of one image, full width;
- manual halo DMA (overlapping bands cannot be BlockSpec tiles);
- conv1 (1x1) over the band incl. the 3x3 halo ring, conv2 (3x3) as 9
  accumulated K=F tap matmuls (no wide lane concat — the known Mosaic
  pathology on this image), conv3 (1x1), each with the FrozenBN affine
  folded exactly into the bf16 weights/bias at trace time;
- residual add + final ReLU against the band's center rows;
- one bf16 read of x and one bf16 write of the output per block — the
  minimum possible without cross-block fusion.

Numerics: bf16 data, f32 accumulation — the same class as the XLA
bf16 path (differs only in fp reassociation of the 3x3 tap sum).
Inference-only (no VJP); ``Bottleneck.fused`` routes here behind
``jax.lax.platform_dependent`` with the plain XLA composition as the
non-TPU branch, and the shipped configs freeze nothing downstream of
it at predict time.

Reference counterpart: torchvision/mmcv Bottleneck (SURVEY.md §2.9);
the layer math is models/resnet.py::Bottleneck.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BTL_TH = 8      # output rows per grid step


def _btl_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                out_ref, xbuf, sems, *, wc):
    """One band: out rows [r0, r0+TH) x full width of one image.

    x_hbm: (B, H+2, W+2, C4) zero-padded input; band = padded rows
    [r0, r0+TH+2) — the out rows plus the 3x3 halo ring.
    w1: (C4, F) b1: (1, F); w2: (9, F, F) taps (ky*3+kx) b2: (1, F);
    w3: (F, C4) b3: (1, C4). All BN-folded bf16, f32 biases.

    Band DMAs double-buffer across grid steps (see _stem_s2d4_kernel).
    """
    b = pl.program_id(0)
    p = pl.program_id(1)
    np_ = pl.num_programs(1)
    th = BTL_TH
    flat = b * np_ + p
    slot = jax.lax.rem(flat, 2)
    nslot = jax.lax.rem(flat + 1, 2)

    def band_copy(fl, sl):
        bb = fl // np_
        pp = jax.lax.rem(fl, np_)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(th * pp, th + 2)],
            xbuf.at[sl], sems.at[sl])

    @pl.when(flat == 0)
    def _():
        band_copy(flat, slot).start()

    @pl.when(flat + 1 < pl.num_programs(0) * np_)
    def _():
        band_copy(flat + 1, nslot).start()

    band_copy(flat, slot).wait()
    x = xbuf[slot]                               # (TH+2, W+2, C4)

    # conv1 (1x1) + bn1 + relu over the full band (conv2 needs the halo)
    a1 = jax.lax.dot_general(x, w1_ref[:], (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    a1 = jnp.maximum(a1 + b1_ref[0], 0.0).astype(x.dtype)

    # conv2 (3x3) + bn2 + relu: nine accumulated K=F taps
    acc = None
    for ky in range(3):
        for kx in range(3):
            xs = a1[ky:ky + th, kx:kx + wc, :]
            part = jax.lax.dot_general(
                xs, w2_ref[ky * 3 + kx], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    a2 = jnp.maximum(acc + b2_ref[0], 0.0).astype(x.dtype)

    # conv3 (1x1) + bn3 + residual + relu
    y = jax.lax.dot_general(a2, w3_ref[:], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b3_ref[0]
    res = x[1:th + 1, 1:wc + 1, :].astype(jnp.float32)
    out_ref[0] = jnp.maximum(y + res, 0.0).astype(out_ref.dtype)


def fold_bn(kernel, scale, bias, mean, var, eps=1e-5):
    """Fold FrozenBN into conv weights exactly: conv(x, k)*inv + off ==
    conv(x, k*inv) + off."""
    inv = scale * jax.lax.rsqrt(var + eps)
    off = bias - mean * inv
    return kernel * inv, off


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, interpret=False):
    """x: (B, H, W, C4) bf16; weights BN-folded:
    w1 (1,1,C4,F), w2 (3,3,F,F), w3 (1,1,F,C4); b* f32.
    Returns relu(conv3(relu(conv2(relu(conv1(x))))) + x).
    H must be a multiple of BTL_TH.
    """
    bsz, h, w, c4 = x.shape
    f = w1.shape[-1]
    assert h % BTL_TH == 0, (h, BTL_TH)
    # Mosaic requires the band DMA's slice extent along the sublane dim
    # (dim 2 of the HBM memref) to be 8-aligned; round the padded width
    # up and let the kernel ignore the extra zero columns.
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    w1m = w1.reshape(c4, f).astype(jnp.bfloat16)
    w2m = w2.transpose(0, 1, 2, 3).reshape(9, f, f).astype(jnp.bfloat16)
    w3m = w3.reshape(f, c4).astype(jnp.bfloat16)
    grid = (bsz, h // BTL_TH)
    out = pl.pallas_call(
        functools.partial(_btl_kernel, wc=w),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c4), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # manual DMA
            pl.BlockSpec((c4, f), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, f, f), lambda bb, pp: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, c4), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c4), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BTL_TH, w, c4),
                               lambda bb, pp: (bb, pp, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, BTL_TH + 2, wp, c4), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w1m, b1.reshape(1, f).astype(jnp.float32), w2m,
      b2.reshape(1, f).astype(jnp.float32), w3m,
      b3.reshape(1, c4).astype(jnp.float32))
    return out
