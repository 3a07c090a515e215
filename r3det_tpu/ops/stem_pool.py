"""Fused ResNet stem: conv4x4/s1 (space-to-depth form) + BN + ReLU +
maxpool3x3/s2 in ONE Pallas TPU kernel.

Why: the stem is the worst op in the network for XLA on TPU. Its 12
input channels occupy 12/128 lanes, so the convolution's data path is
~10x padded; measured 15 ms of a 117 ms batch-16 forward (tiny R3Det,
1024²) for 6.4 GFLOP/img of math that is bandwidth-bound in theory
(~250 MB/img of traffic -> ~0.5 ms). The kernel:

- DMAs overlapping 20-row input windows (halo) from HBM — overlapping
  windows cannot be expressed as BlockSpec tiles;
- builds the 192-wide im2col patch matrix in VMEM (16 static shifted
  slices concatenated on the lane axis), turning the 12-channel conv
  into ONE K=192 matmul that runs near MXU speed;
- applies the folded FrozenBN affine + ReLU in registers;
- max-pools 3x3/s2 with -inf edge handling and writes the pooled
  (8, W/2, 64) row block.

Numerics match conv->bn->relu->pool exactly (same f32 accumulation);
parity is tested against the XLA composition in interpret mode (CPU)
and on TPU.

Reference counterpart: the mmcv/torchvision ResNet stem the reference
imports (SURVEY.md §2.9); the space-to-depth folding itself is
models/resnet.py::fold_stem_kernel.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CIN = 12
COUT = 64
KH = KW = 4
TILE_P = 8                      # pooled rows per grid step
CONV_ROWS = 2 * TILE_P + 1      # conv rows feeding TILE_P pooled rows
IN_ROWS = CONV_ROWS + KH - 1    # input rows incl. conv halo


def _stem_kernel(x_hbm, w_ref, scale_ref, bias_ref, out_ref, xbuf, sem, *,
                 w):
    b = pl.program_id(0)
    p = pl.program_id(1)
    # conv rows c0..c0+16 with c0 = 16p-1; padded-row start = c0+1 = 16p
    row0 = 16 * p
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, IN_ROWS)], xbuf, sem)
    cp.start()
    cp.wait()
    x = xbuf[:]                                     # (IN_ROWS, w+3, 12)

    # im2col: 16 static shifted views -> (CONV_ROWS, w, 192)
    cols = []
    for ky in range(KH):
        for kx in range(KW):
            cols.append(x[ky:ky + CONV_ROWS, kx:kx + w, :])
    patch = jnp.concatenate(cols, axis=-1)
    y = jax.lax.dot_general(
        patch.reshape(CONV_ROWS * w, KH * KW * CIN), w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (CONV_ROWS*w, 64)
    y = y.reshape(CONV_ROWS, w, COUT)
    y = y * scale_ref[0] + bias_ref[0]
    y = jnp.maximum(y, 0.0)

    # conv row c0 = 16p-1 is out of range at p == 0: mask it out of the
    # pool with -inf (pool pad semantics)
    neg = jnp.float32(-jnp.inf)
    first_global_row = 16 * p - 1
    row_ids = first_global_row + jax.lax.broadcasted_iota(
        jnp.int32, (CONV_ROWS, w, COUT), 0)
    y = jnp.where(row_ids >= 0, y, neg)

    # maxpool 3x3 stride 2 without strided slices (Mosaic lowers those
    # to unsupported gathers): full-resolution 3-neighborhood maxes via
    # static shifted slices, then stride-2 subsampling via reshape.
    wq = w // 2
    # column 3-max (pad 1 -inf both sides)
    colpad = jnp.full((CONV_ROWS, 1, COUT), neg, y.dtype)
    yc = jnp.concatenate([colpad, y, colpad], axis=1)
    cmax = jnp.maximum(jnp.maximum(yc[:, 0:w], yc[:, 1:w + 1]),
                       yc[:, 2:w + 2])               # (CONV_ROWS, w, C)
    # row 3-max
    rowpad = jnp.full((1, w, COUT), neg, y.dtype)
    yr = jnp.concatenate([rowpad, cmax, rowpad], axis=0)
    m2 = jnp.maximum(jnp.maximum(yr[0:CONV_ROWS], yr[1:CONV_ROWS + 1]),
                     yr[2:CONV_ROWS + 2])            # centered 9-max
    # pooled (p_loc, q): center = conv row 2*p_loc+1 (local), col 2q
    rows = m2[1:1 + 2 * TILE_P].reshape(TILE_P, 2, w, COUT)[:, 0]
    out = rows.reshape(TILE_P, wq, 2, COUT)[:, :, 0, :]
    out_ref[0, :, :, :] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def stem_conv_pool_pallas(x12, kernel, scale, bias, interpret=False):
    """x12: (B, H, W, 12) [s2d of the 2H x 2W x 3 image], kernel:
    (4, 4, 12, 64), scale/bias: (64,) folded FrozenBN affine.
    Returns (B, H/2, W/2, 64). H must be a multiple of 16, W of 2.
    """
    b, h, w, cin = x12.shape
    assert cin == CIN and h % (2 * TILE_P) == 0 and w % 2 == 0, x12.shape
    # rows padded (3, 2): conv row c reads padded rows c+1..c+4 and the
    # last grid step reads up to padded row 16*(h/16-1)+20 = h+4;
    # cols padded (2, 1): conv col j reads padded cols j..j+3
    xp = jnp.pad(x12.astype(jnp.bfloat16),
                 ((0, 0), (3, 2), (2, 1), (0, 0)))
    # patch-matrix weight layout must match the kernel's concat order
    # (ky, kx, cin) on the lane axis
    wmat = kernel.reshape(KH * KW * CIN, COUT).astype(jnp.bfloat16)
    scale = scale.reshape(1, COUT).astype(jnp.float32)
    bias = bias.reshape(1, COUT).astype(jnp.float32)

    grid = (b, h // (2 * TILE_P))
    out = pl.pallas_call(
        functools.partial(_stem_kernel, w=w),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, COUT),
                                       jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # manual DMA
            pl.BlockSpec((KH * KW * CIN, COUT), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, COUT), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, COUT), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_P, w // 2, COUT),
                               lambda bb, pp: (bb, pp, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((IN_ROWS, w + 3, CIN), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wmat, scale, bias)
    return out


def _stem_kernel_grouped(x_hbm, w_ref, scale_ref, bias_ref, out_ref, xbuf,
                         sem, *, w):
    """Round-3 candidate: same math as _stem_kernel but the im2col
    concat builds 4 x 48-lane pieces (one per ky, columns pre-grouped)
    and accumulates 4 K=48 matmuls — suspected to avoid the Mosaic
    relayout pathology of the 16-way 12-lane concat (see PARITY.md).
    Input layout: (B, rows, w, 48) where lane = (kx, cin) pre-grouped by
    stem_conv_pool_pallas_grouped.
    """
    b = pl.program_id(0)
    p = pl.program_id(1)
    row0 = 16 * p
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, IN_ROWS)], xbuf, sem)
    cp.start()
    cp.wait()
    x = xbuf[:]                                     # (IN_ROWS, w, 48)

    y = None
    for ky in range(KH):
        part = jax.lax.dot_general(
            x[ky:ky + CONV_ROWS].reshape(CONV_ROWS * w, KW * CIN),
            w_ref[ky], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = part if y is None else y + part
    y = y.reshape(CONV_ROWS, w, COUT)
    y = y * scale_ref[0] + bias_ref[0]
    y = jnp.maximum(y, 0.0)

    neg = jnp.float32(-jnp.inf)
    first_global_row = 16 * p - 1
    row_ids = first_global_row + jax.lax.broadcasted_iota(
        jnp.int32, (CONV_ROWS, w, COUT), 0)
    y = jnp.where(row_ids >= 0, y, neg)

    wq = w // 2
    colpad = jnp.full((CONV_ROWS, 1, COUT), neg, y.dtype)
    yc = jnp.concatenate([colpad, y, colpad], axis=1)
    cmax = jnp.maximum(jnp.maximum(yc[:, 0:w], yc[:, 1:w + 1]),
                       yc[:, 2:w + 2])
    rowpad = jnp.full((1, w, COUT), neg, y.dtype)
    yr = jnp.concatenate([rowpad, cmax, rowpad], axis=0)
    m2 = jnp.maximum(jnp.maximum(yr[0:CONV_ROWS], yr[1:CONV_ROWS + 1]),
                     yr[2:CONV_ROWS + 2])
    rows = m2[1:1 + 2 * TILE_P].reshape(TILE_P, 2, w, COUT)[:, 0]
    out = rows.reshape(TILE_P, wq, 2, COUT)[:, :, 0, :]
    out_ref[0, :, :, :] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def stem_conv_pool_pallas_grouped(x12, kernel, scale, bias,
                                  interpret=False):
    """Grouped-concat variant of stem_conv_pool_pallas (round-3
    candidate, untested on real TPU — see PARITY.md known gaps)."""
    b, h, w, cin = x12.shape
    assert cin == CIN and h % (2 * TILE_P) == 0 and w % 2 == 0, x12.shape
    xp = jnp.pad(x12.astype(jnp.bfloat16),
                 ((0, 0), (3, 2), (2, 1), (0, 0)))
    # host-side column pre-group: lane = (kx, cin), 48 wide
    x48 = jnp.concatenate([xp[:, :, kx:kx + w, :] for kx in range(KW)],
                          axis=-1)
    # weights per ky: (48, 64) with the same (kx, cin) lane order
    wk = kernel.astype(jnp.bfloat16).transpose(0, 1, 2, 3)  # (ky,kx,ci,co)
    wmat = jnp.stack([wk[ky].reshape(KW * CIN, COUT)
                      for ky in range(KH)])                 # (4, 48, 64)
    scale = scale.reshape(1, COUT).astype(jnp.float32)
    bias = bias.reshape(1, COUT).astype(jnp.float32)

    grid = (b, h // (2 * TILE_P))
    out = pl.pallas_call(
        functools.partial(_stem_kernel_grouped, w=w),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, COUT),
                                       jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((KH, KW * CIN, COUT), lambda bb, pp: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, COUT), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, COUT), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_P, w // 2, COUT),
                               lambda bb, pp: (bb, pp, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((IN_ROWS, w, KW * CIN), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x48, wmat, scale, bias)
    return out


def _s2d4_fold_indices():
    """Index map folding the (4,4,12,64) stride-1-on-s2d2 stem kernel
    into the (3,3,48,256) stride-1-on-s2d4 kernel.

    Output channel layout: oo = (dy*2+dx)*64 + o, i.e. the conv emits the
    2x2 block of 512-grid rows/cols (dy, dx) of every 256-grid cell as 4
    channel groups. Derivation: conv row r=2c+dy reads unpadded 512-rows
    u_abs = r-2+ky (pad top 2), which lands in cell c + (dy+ky-2)//2 at
    sub-row (dy+ky-2)%2; same for columns.
    """
    import numpy as _np
    tgt = _np.zeros((4, 4, 12, 2, 2, 3), _np.int64)  # cy,cx,cc index + oo
    src_idx, t_cy, t_cx, t_cc, t_g = [], [], [], [], []
    for dy in range(2):
        for dx in range(2):
            for ky in range(KH):
                for kx in range(KW):
                    u = dy + ky - 2
                    v = dx + kx - 2
                    cy, py = u // 2 + 1, u % 2
                    cx, px = v // 2 + 1, v % 2
                    for ci in range(CIN):
                        src_idx.append((ky * KW + kx) * CIN + ci)
                        t_cy.append(cy)
                        t_cx.append(cx)
                        t_cc.append((py * 2 + px) * CIN + ci)
                        t_g.append(dy * 2 + dx)
    del tgt
    return (_np.asarray(src_idx), _np.asarray(t_cy), _np.asarray(t_cx),
            _np.asarray(t_cc), _np.asarray(t_g))


def fold_stem_kernel_s2d4(kernel):
    """(4, 4, 12, 64) -> (3, 3, 48, 256) folded kernel (jnp, traceable)."""
    src_idx, t_cy, t_cx, t_cc, t_g = _s2d4_fold_indices()
    ksrc = kernel.reshape(KH * KW * CIN, COUT)[src_idx]      # (768, 64)
    k3 = jnp.zeros((3, 3, 4 * CIN, 4, COUT), kernel.dtype)
    k3 = k3.at[t_cy, t_cx, t_cc, t_g].set(ksrc)
    return k3.reshape(3, 3, 4 * CIN, 4 * COUT)


def stem_conv_pool_s2d4(x12, kernel, scale, bias, dtype=jnp.bfloat16,
                        quantize=False, pool_kernel=False):
    """XLA-only fused-stem alternative: fold the 12-channel stem once
    more (space-to-depth(2) again -> 48 channels) so the conv becomes a
    lane-friendly K=432 -> 256 contraction, then max-pool on the 2x2
    block-structured output. Numerics identical to
    stem_conv_pool_reference (same f32 accumulation; parity-tested).

    Rationale: XLA pads the 12-channel conv's data path ~10x on the
    128-wide lane axis (measured 15 ms of a 117 ms batch-16 forward);
    at 48-in/256-out the padding waste drops to ~2.7x on loads only,
    with no Pallas involvement (this image's remote Mosaic compile is
    unusable — see PARITY.md).
    """
    b, h, w, cin = x12.shape
    assert cin == CIN and h % 4 == 0 and w % 4 == 0, x12.shape
    # second space-to-depth fold: (B, H/2, W/2, 48)
    x48 = x12.reshape(b, h // 2, 2, w // 2, 2, cin).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * cin)
    k3 = fold_stem_kernel_s2d4(kernel)
    if quantize:
        # symmetric int8 PTQ (same scheme as models/quant.py): weights
        # per-output-channel, activation per-tensor with a dynamic
        # max|x| scale (input is the normalized image — one cheap extra
        # read; no calibration state needed for a single conv). Gated
        # by ResNet.quantize, i.e. the serving int8 configuration.
        k3 = k3.astype(jnp.float32)
        kmax = jnp.max(jnp.abs(k3), axis=(0, 1, 2))
        kscale = jnp.maximum(kmax, 1e-8) / 127.0
        ki = jnp.clip(jnp.round(k3 / kscale), -127,
                      127).astype(jnp.int8)
        x32 = x48.astype(jnp.float32)
        ascale = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-8) / 127.0
        xi = jnp.clip(jnp.round(x32 / ascale), -127,
                      127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xi, ki, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.bfloat16 if dtype == jnp.bfloat16
            else jnp.int32)     # see models/quant.py: avoids the s32
        y = y.astype(jnp.float32) * (ascale * kscale)   # HBM round trip
    else:
        y = jax.lax.conv_general_dilated(
            x48.astype(dtype), k3.astype(dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)     # (B, H/2, W/2, 256)
    scale4 = jnp.tile(scale.reshape(1, -1), (4, 1)).reshape(-1)
    bias4 = jnp.tile(bias.reshape(1, -1), (4, 1)).reshape(-1)
    y = y * scale4 + bias4
    y = jnp.maximum(y, 0.0).astype(dtype)
    hc, wc = h // 2, w // 2
    if (pool_kernel and dtype == jnp.bfloat16 and wc % 8 == 0
            and hc % S4_TH == 0):
        # the XLA blocked pool materializes its shifted max chain;
        # the band kernel is one bf16 read + one bf16 write
        return jax.lax.platform_dependent(
            y, tpu=pool_s2d4_pallas, default=_pool_s2d4_xla)
    return _pool_s2d4_xla(y)


def _pool_s2d4_xla(y):
    """XLA tail of stem_conv_pool_s2d4: blocked 3x3/s2 maxpool on the
    (2,2)-block-structured conv output (B, hc, wc, 4*COUT)."""
    b, hc, wc, _ = y.shape
    u = y.reshape(b, hc, wc, 2, 2, COUT)
    neg = jnp.asarray(-jnp.inf, u.dtype)
    up = jnp.pad(u, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0), (0, 0)),
                 constant_values=neg)
    # pool out(i, j) = max over 512-grid rows {2i-1, 2i, 2i+1} and cols
    # {2j-1, 2j, 2j+1}: (cell-1, sub 1), (cell, sub 0), (cell, sub 1)
    colmax = jnp.maximum(
        jnp.maximum(up[:, :, 0:wc, :, 1], up[:, :, 1:wc + 1, :, 0]),
        up[:, :, 1:wc + 1, :, 1])               # (B, hc+1, wc, 2, C)
    out = jnp.maximum(
        jnp.maximum(colmax[:, 0:hc, :, 1], colmax[:, 1:hc + 1, :, 0]),
        colmax[:, 1:hc + 1, :, 1])              # (B, hc, wc, C)
    return out


def _pool_s2d4_kernel(y_hbm, out_ref, ybuf, sems, *, wc):
    """Pool-only band kernel on the (2,2)-block-structured conv output
    y (B, hc, wc, 256): out rows [i0, i0+TH) need y rows [i0-1, i0+TH)
    (top halo only — the 3x3/s2 window reads cell rows i-1 and i).

    Two DMAs per band (the main TH rows + the single halo row; a halo
    row at absolute -1 cannot be sliced, so row 0 of the buffer is
    filled with -inf at the image top instead), double-buffered across
    grid steps. Pure VPU work: the XLA blocked pool costs ~half the
    measured stem time because its shifted max chain materializes
    full-size intermediates; here one bf16 read + one bf16 write.
    """
    b = pl.program_id(0)
    p = pl.program_id(1)
    np_ = pl.num_programs(1)
    th = S4_TH
    flat = b * np_ + p
    slot = jax.lax.rem(flat, 2)
    nslot = jax.lax.rem(flat + 1, 2)

    def copies(fl, sl):
        bb = fl // np_
        pp = jax.lax.rem(fl, np_)
        main = pltpu.make_async_copy(
            y_hbm.at[bb, pl.ds(th * pp, th)],
            ybuf.at[sl, pl.ds(1, th)], sems.at[sl, 0])
        # halo row i0-1; at pp == 0 read row 0 (dead: overwritten with
        # -inf below) to keep the slice in bounds
        hsrc = jax.lax.max(th * pp - 1, 0)
        halo = pltpu.make_async_copy(
            y_hbm.at[bb, pl.ds(hsrc, 1)],
            ybuf.at[sl, pl.ds(0, 1)], sems.at[sl, 1])
        return main, halo

    @pl.when(flat == 0)
    def _():
        for c in copies(flat, slot):
            c.start()

    @pl.when(flat + 1 < pl.num_programs(0) * np_)
    def _():
        for c in copies(flat + 1, nslot):
            c.start()

    for c in copies(flat, slot):
        c.wait()

    y = ybuf[slot].astype(jnp.float32)          # (TH+1, wc, 256)
    neg = jnp.float32(-jnp.inf)
    first_abs = th * p - 1
    row_ids = first_abs + jax.lax.broadcasted_iota(
        jnp.int32, (th + 1, wc, 256), 0)
    y = jnp.where(row_ids >= 0, y, neg)

    s00 = y[:, :, 0:64]
    s01 = y[:, :, 64:128]
    s10 = y[:, :, 128:192]
    s11 = y[:, :, 192:256]
    cell = jnp.maximum(jnp.maximum(s00, s01), jnp.maximum(s10, s11))
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (th + 1, wc, 64), 1)

    def left1(t):                               # value at cell col j-1
        return jnp.where(col_ids >= 1, pltpu.roll(t, 1, 1), neg)

    s11_l = left1(s11)
    out = jnp.maximum(cell[1:], jnp.maximum(s11_l[:-1], s10[:-1]))
    out = jnp.maximum(out, s11[:-1])
    out = jnp.maximum(out, left1(s01)[1:])
    out = jnp.maximum(out, s11_l[1:])
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def pool_s2d4_pallas(y, interpret=False):
    """Blocked 3x3/s2 maxpool on the s2d4 conv output y (B, hc, wc,
    256; channel groups (dy*2+dx)*64+o) -> (B, hc, wc, 64). Matches the
    XLA pool tail of stem_conv_pool_s2d4 exactly (pure max ops)."""
    b, hc, wc, c = y.shape
    assert c == 4 * COUT and hc % S4_TH == 0 and wc % 8 == 0, y.shape
    grid = (b, hc // S4_TH)
    return pl.pallas_call(
        functools.partial(_pool_s2d4_kernel, wc=wc),
        out_shape=jax.ShapeDtypeStruct((b, hc, wc, COUT), y.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, S4_TH, wc, COUT),
                               lambda bb, pp: (bb, pp, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, S4_TH + 1, wc, 4 * COUT), y.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(y)


def stem_conv_pool_reference(x12, kernel, scale, bias,
                             dtype=jnp.bfloat16):
    """XLA composition (conv + affine + relu + maxpool) — the jnp
    fallback and the parity oracle for the kernel.

    ``dtype`` is the compute dtype: models built with float32 (tests,
    parity/debug runs, dryrun_multichip) keep f32 numerics end-to-end
    instead of silently dropping to bf16 in the first layer.
    """
    h, w = x12.shape[1:3]
    y = jax.lax.conv_general_dilated(
        x12.astype(dtype), kernel.astype(dtype), (1, 1),
        [(2, 1), (2, 1)], dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)
    y = y * scale.reshape(1, 1, 1, -1) + bias.reshape(1, 1, 1, -1)
    y = jnp.maximum(y, 0.0).astype(dtype)
    neg = jnp.asarray(-jnp.inf, y.dtype)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=neg)
    slices = [yp[:, i:i + 2 * (h // 2):2, j:j + 2 * (w // 2):2]
              for i in range(3) for j in range(3)]
    out = slices[0]
    for s in slices[1:]:
        out = jnp.maximum(out, s)
    return out


# ---------------------------------------------------------------------------
# Fused s2d4 stem kernel: conv3x3(48->256) + affine + ReLU + blocked
# maxpool in ONE pass (the round-3 TPU candidate).
# ---------------------------------------------------------------------------

S4_TH = 8           # pooled cell rows per grid step


def _stem_s2d4_kernel(x_hbm, w_ref, scale_ref, bias_ref, out_ref, xbuf,
                      sems, *, wc):
    """One grid step: pooled cell rows [i0, i0+S4_TH) x full width.

    x_hbm: (B, H+3, W+2, 48) zero-padded s2d4 input (2 rows top, 1
    bottom, 1 col each side) in HBM; the band for step p covers padded
    rows [S4_TH*p, S4_TH*p + S4_TH+3) — conv rows [i0-1, i0+S4_TH)
    with their 3x3 halo.
    w_ref: (9, 48, 256) taps (ky*3+kx); scale/bias: (1, 256) folded
    affine tiled over the 4 subpixel groups.

    The 3x3 conv accumulates 9 K=48 matmuls (no wide lane concat — the
    16-way 12-lane concat in _stem_kernel is the known Mosaic
    pathology); the 3x3-s2 maxpool on the 2x2 block-structured output
    needs only channel-group slices, one column shift and one row
    shift, all in registers.

    Band DMAs are double-buffered across grid steps (scratch persists
    on TPU): step i waits on the copy step i-1 started for it and
    prefetches step i+1's band, so the HBM read overlaps compute.
    """
    b = pl.program_id(0)
    p = pl.program_id(1)
    np_ = pl.num_programs(1)
    t1 = S4_TH + 1
    flat = b * np_ + p
    slot = jax.lax.rem(flat, 2)
    nslot = jax.lax.rem(flat + 1, 2)

    def band_copy(fl, sl):
        bb = fl // np_
        pp = jax.lax.rem(fl, np_)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(S4_TH * pp, S4_TH + 3)],
            xbuf.at[sl], sems.at[sl])

    @pl.when(flat == 0)
    def _():
        band_copy(flat, slot).start()

    @pl.when(flat + 1 < pl.num_programs(0) * np_)
    def _():
        band_copy(flat + 1, nslot).start()

    band_copy(flat, slot).wait()
    x = xbuf[slot]                              # (TH+3, W+2, 48)

    # int8 band (serving PTQ): int8 x int8 -> exact int32 MXU
    # accumulation; the (1, 256) scale row carries the combined
    # dequant * folded-BN factor so the epilogue below is unchanged
    acc_t = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    acc = None
    for ky in range(3):
        for kx in range(3):
            xs = x[ky:ky + t1, kx:kx + wc, :]   # (T1, W, 48)
            part = jax.lax.dot_general(
                xs, w_ref[ky * 3 + kx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=acc_t)   # (T1, W, 256)
            acc = part if acc is None else acc + part
    y = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
    y = jnp.maximum(y, 0.0)                     # (T1, W, 256)

    # conv row index 0 of the band is absolute cell row i0-1; at p == 0
    # that row is outside the image: the reference pool pads with -inf
    # there (NOT conv-of-zeros)
    neg = jnp.float32(-jnp.inf)
    first_abs = S4_TH * p - 1
    row_ids = first_abs + jax.lax.broadcasted_iota(
        jnp.int32, (t1, wc, 256), 0)
    y = jnp.where(row_ids >= 0, y, neg)

    # channel layout: oo = (dy*2+dx)*64 + o  (fold_stem_kernel_s2d4)
    s00 = y[:, :, 0:64]
    s01 = y[:, :, 64:128]
    s10 = y[:, :, 128:192]
    s11 = y[:, :, 192:256]
    cell = jnp.maximum(jnp.maximum(s00, s01), jnp.maximum(s10, s11))

    # column shift as a rotate + mask: Mosaic cannot concatenate
    # vectors whose non-concat lane offsets disagree (s01/s11 are lane
    # slices at offset 64), but tpu.dynamic_rotate handles any layout
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t1, wc, 64), 1)

    def left1(t):                               # value at cell col j-1
        return jnp.where(col_ids >= 1, pltpu.roll(t, 1, 1), neg)

    # out(i,j) = max( cell(i,j), s11(i-1,j-1), s10(i-1,j), s11(i-1,j),
    #                 s01(i,j-1), s11(i,j-1) ); band row k=0 is i0-1
    s11_l = left1(s11)
    out = jnp.maximum(cell[1:], jnp.maximum(s11_l[:-1], s10[:-1]))
    out = jnp.maximum(out, s11[:-1])
    out = jnp.maximum(out, left1(s01)[1:])
    out = jnp.maximum(out, s11_l[1:])
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret', 'quantize'))
def stem_conv_pool_s2d4_pallas(x12, kernel, scale, bias, interpret=False,
                               quantize=False):
    """Fused stem on the s2d4 form. Same signature/semantics as
    stem_conv_pool_s2d4 (f32 accumulation; bf16 data) up to fp
    reassociation of the 9-tap sum. Returns (B, H/4, W/4, 64) for the
    (B, H/2, W/2, 12) s2d2 input.

    ``quantize``: symmetric int8 PTQ, the same scheme as the
    stem_conv_pool_s2d4 quantize branch (per-output-channel weight
    scales on the folded kernel, dynamic per-tensor activation scale) —
    but the int8 matmuls, dequant, affine, ReLU and maxpool all stay in
    one VMEM-resident pass, so the s32/bf16 conv accumulator never
    round-trips HBM and the band reads are int8 (half the bytes).
    """
    b, h, w, cin = x12.shape
    assert cin == CIN and h % 4 == 0 and w % 4 == 0, x12.shape
    x48 = x12.reshape(b, h // 2, 2, w // 2, 2, cin).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * cin)
    hc, wc = h // 2, w // 2
    assert hc % S4_TH == 0, (hc, S4_TH)
    # Mosaic requires the band DMA's slice extents to align with the
    # memref tiling — (8, 128) bf16, (32, 128) int8: round the padded
    # width up to the sublane tile and the channel count up to a full
    # 128 lanes (HBM already stores 48 channels physically padded to
    # 128, so the explicit zero-pad adds no bytes — it just makes the
    # padded lanes defined zeros that the zero weight rows annihilate).
    wp = -(-(wc + 2) // (32 if quantize else 8)) * (32 if quantize else 8)
    ck = -(-(4 * CIN) // 128) * 128
    k3 = fold_stem_kernel_s2d4(kernel)                  # (3, 3, 48, 256)
    scale4 = jnp.tile(scale.reshape(1, -1), (4, 1)).reshape(1, -1)
    bias4 = jnp.tile(bias.reshape(1, -1), (4, 1)).reshape(1, -1)
    if quantize:
        k3 = k3.astype(jnp.float32)
        kmax = jnp.max(jnp.abs(k3), axis=(0, 1, 2))          # (256,)
        kscale = jnp.maximum(kmax, 1e-8) / 127.0
        ki = jnp.clip(jnp.round(k3 / kscale), -127, 127).astype(jnp.int8)
        x32 = x48.astype(jnp.float32)
        ascale = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-8) / 127.0
        xi = jnp.clip(jnp.round(x32 / ascale), -127, 127).astype(jnp.int8)
        xp = jnp.pad(xi, ((0, 0), (2, 1), (1, wp - wc - 1),
                          (0, ck - 4 * CIN)))
        w9 = jnp.pad(ki.reshape(9, 4 * CIN, 4 * COUT),
                     ((0, 0), (0, ck - 4 * CIN), (0, 0)))
        scale4 = scale4 * (ascale * kscale).reshape(1, -1)
        band_t = jnp.int8
    else:
        xp = jnp.pad(x48.astype(jnp.bfloat16),
                     ((0, 0), (2, 1), (1, wp - wc - 1), (0, ck - 4 * CIN)))
        w9 = jnp.pad(k3.reshape(9, 4 * CIN, 4 * COUT),
                     ((0, 0), (0, ck - 4 * CIN), (0, 0))).astype(
                         jnp.bfloat16)
        band_t = jnp.bfloat16

    grid = (b, hc // S4_TH)
    out = pl.pallas_call(
        functools.partial(_stem_s2d4_kernel, wc=wc),
        out_shape=jax.ShapeDtypeStruct((b, hc, wc, COUT), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # manual DMA
            pl.BlockSpec((9, ck, 4 * COUT), lambda bb, pp: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * COUT), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * COUT), lambda bb, pp: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S4_TH, wc, COUT),
                               lambda bb, pp: (bb, pp, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, S4_TH + 3, wp, ck), band_t),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w9, scale4.astype(jnp.float32), bias4.astype(jnp.float32))
    return out
