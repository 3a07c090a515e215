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


def _band_valid(p, shape, wc):
    """(TH+2, wp, F) mask: True where the band cell maps to a real image
    pixel. Band row k is absolute image row p*TH - 1 + k; column j is
    image column j - 1 (one halo/pad column each side, plus alignment
    padding on the right)."""
    h = BTL_TH * pl.num_programs(1)
    rows = BTL_TH * p - 1 + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1) - 1
    return (rows >= 0) & (rows < h) & (cols >= 0) & (cols < wc)


def _btl_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                out_ref, xbuf, a1buf, sems, *, wc):
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
    # conv2's SAME padding must see ZEROS outside the image, not
    # conv1-of-zero-pad (= relu(b1)): zero the halo ring where the
    # band row/col falls outside the real image
    a1 = jnp.where(_band_valid(p, a1.shape, wc), a1, 0)
    # stage a1 through VMEM so the 9 tap slices below are REF reads at
    # static offsets (the access pattern the stem kernel compiles with)
    # rather than shifted relayouts of a live register array — slicing
    # computed vectors at 3 sublane offsets is the prime suspect for
    # the Mosaic compile hang this kernel used to trigger
    a1buf[:] = a1

    # conv2 (3x3) + bn2 + relu: nine accumulated K=F taps
    acc = None
    for ky in range(3):
        for kx in range(3):
            xs = a1buf[ky:ky + th, kx:kx + wc, :]
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


def _q8(v, inv):
    """Symmetric int8 quantization of an f32 vector, in registers."""
    return jnp.clip(jnp.round(v * inv), -127.0, 127.0).astype(jnp.int8)


def _btl_kernel_q8(x_hbm, inv_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                   b2_ref, w3_ref, s3_ref, b3_ref, out_ref, xbuf, a1buf,
                   sems, *, wc):
    """int8 variant of _btl_kernel: the band stays bf16 in VMEM (the
    residual needs it anyway), each conv input is quantized in
    registers with its calibrated static scale (inv_ref SMEM row:
    [1/ascale1, 1/ascale2, 1/ascale3, 0]), the matmuls run int8 x int8
    -> exact int32 on the MXU, and sN_ref carries the combined
    (ascaleN * per-channel weight scale) dequant factor. The int8 grids
    match the unfused QConv path's (models/quant.py) up to BN folding:
    folding the per-channel BN factor into the weights BEFORE
    per-output-channel quantization absorbs it exactly, so the
    calibrated activation ranges transfer unchanged.
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
    x = xbuf[slot]                               # (TH+2, W+2, C4) bf16

    xi = _q8(x.astype(jnp.float32), inv_ref[0, 0])
    a1 = jax.lax.dot_general(xi, w1_ref[:], (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    a1 = jnp.maximum(a1.astype(jnp.float32) * s1_ref[0] + b1_ref[0], 0.0)
    # see _btl_kernel: conv2's SAME padding must see zeros, not relu(b1)
    a1 = jnp.where(_band_valid(p, a1.shape, wc), a1, 0.0)

    # stage the quantized conv2 input through VMEM: tap slices as REF
    # reads, not register relayouts (see _btl_kernel; int8 scratch
    # slicing is the stem kernel's proven-to-compile pattern)
    a1buf[:] = _q8(a1, inv_ref[0, 1])
    acc = None
    for ky in range(3):
        for kx in range(3):
            xs = a1buf[ky:ky + th, kx:kx + wc, :]
            part = jax.lax.dot_general(
                xs, w2_ref[ky * 3 + kx], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = part if acc is None else acc + part
    a2 = jnp.maximum(acc.astype(jnp.float32) * s2_ref[0] + b2_ref[0], 0.0)

    a2i = _q8(a2, inv_ref[0, 2])
    y = jax.lax.dot_general(a2i, w3_ref[:], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * s3_ref[0] + b3_ref[0]
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
            pltpu.VMEM((BTL_TH + 2, wp, f), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w1m, b1.reshape(1, f).astype(jnp.float32), w2m,
      b2.reshape(1, f).astype(jnp.float32), w3m,
      b3.reshape(1, c4).astype(jnp.float32))
    return out


def _wq(w):
    """Per-output-channel symmetric int8 weight quantization (f32
    (..., co) -> int8 + (co,) f32 scale) — models/quant.py scheme on
    the BN-folded kernel."""
    axes = tuple(range(w.ndim - 1))
    wmax = jnp.max(jnp.abs(w), axis=axes)
    s = jnp.maximum(wmax, 1e-8) / 127.0
    wi = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wi, s


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_bottleneck_q8(x, w1, b1, w2, b2, w3, b3, amax1, amax2, amax3,
                        interpret=False):
    """int8 serving variant of fused_bottleneck.

    x (B, H, W, C4) bf16; wN/bN BN-folded f32 weights/biases
    (fold_bn); amaxN the calibrated activation absmax of conv N's
    input (QConv quant_stats 'act_absmax'). Per-output-channel weight
    quantization happens here at trace time — folding BN before
    quantizing absorbs the per-channel BN factor into the weight scale
    exactly, so the same calibration serves both the fused and unfused
    int8 paths.
    """
    bsz, h, w, c4 = x.shape
    f = w1.shape[-1]
    assert h % BTL_TH == 0, (h, BTL_TH)
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    w1i, ks1 = _wq(w1.reshape(c4, f).astype(jnp.float32))
    w2i, ks2 = _wq(w2.reshape(9, f, f).astype(jnp.float32))
    w3i, ks3 = _wq(w3.reshape(f, c4).astype(jnp.float32))
    a1 = jnp.maximum(amax1, 1e-8) / 127.0
    a2 = jnp.maximum(amax2, 1e-8) / 127.0
    a3 = jnp.maximum(amax3, 1e-8) / 127.0
    inv = jnp.stack([1.0 / a1, 1.0 / a2, 1.0 / a3,
                     jnp.zeros_like(a1)]).reshape(1, 4).astype(jnp.float32)
    grid = (bsz, h // BTL_TH)
    out = pl.pallas_call(
        functools.partial(_btl_kernel_q8, wc=w),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c4), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # manual DMA
            pl.BlockSpec((1, 4), lambda bb, pp: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((c4, f), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, f, f), lambda bb, pp: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, c4), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c4), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c4), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BTL_TH, w, c4),
                               lambda bb, pp: (bb, pp, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, BTL_TH + 2, wp, c4), jnp.bfloat16),
            pltpu.VMEM((BTL_TH + 2, wp, f), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, inv,
      w1i, (a1 * ks1).reshape(1, f).astype(jnp.float32),
      b1.reshape(1, f).astype(jnp.float32),
      w2i, (a2 * ks2).reshape(1, f).astype(jnp.float32),
      b2.reshape(1, f).astype(jnp.float32),
      w3i, (a3 * ks3).reshape(1, c4).astype(jnp.float32),
      b3.reshape(1, c4).astype(jnp.float32))
    return out


def fused_bottleneck_q8_xla(x, w1, b1, w2, b2, w3, b3, amax1, amax2,
                            amax3):
    """XLA composition with the exact quantization grids of
    fused_bottleneck_q8 — the non-TPU platform_dependent branch and the
    parity oracle (int32 accumulation is exact, so the two differ only
    in f32 epilogue rounding)."""
    bsz, h, w, c4 = x.shape
    f = w1.shape[-1]
    w1i, ks1 = _wq(w1.reshape(c4, f).astype(jnp.float32))
    w2i, ks2 = _wq(w2.astype(jnp.float32))               # (3,3,f,f)
    w3i, ks3 = _wq(w3.reshape(f, c4).astype(jnp.float32))
    a1 = jnp.maximum(amax1, 1e-8) / 127.0
    a2 = jnp.maximum(amax2, 1e-8) / 127.0
    a3 = jnp.maximum(amax3, 1e-8) / 127.0

    # quantize with the SAME reciprocal multiply as the kernel (x * inv
    # and x / a round differently at .5 grid boundaries)
    xf = x.astype(jnp.float32)
    xi = _q8(xf, 1.0 / a1)
    y = jnp.einsum('bhwc,cf->bhwf', xi.astype(jnp.int32),
                   w1i.astype(jnp.int32))
    y = jnp.maximum(y.astype(jnp.float32) * (a1 * ks1) + b1, 0.0)
    yi = _q8(y, 1.0 / a2)
    y = jax.lax.conv_general_dilated(
        yi, w2i.reshape(3, 3, f, f), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    y = jnp.maximum(y.astype(jnp.float32) * (a2 * ks2) + b2, 0.0)
    yi = _q8(y, 1.0 / a3)
    y = jnp.einsum('bhwf,fc->bhwc', yi.astype(jnp.int32),
                   w3i.astype(jnp.int32))
    y = y.astype(jnp.float32) * (a3 * ks3) + b3
    return jnp.maximum(y + xf, 0.0).astype(jnp.bfloat16)
