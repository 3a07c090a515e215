"""Banded Pallas kernel for the FRM bilinear sample (R3Det FR op).

The FR op (reference fr/src/feature_refine_kernel.cu:112-163) bilinearly
samples the conv-branch feature map at each position's best-box center.
Expressed as a flat XLA gather this is row-latency-bound: ~34 ms/b32 on
v5e for 698k points x 4 corner rows of 512 B — 20x off the HBM
speed-of-light — because the hardware issues an independent row fetch
per corner index (PARITY.md round-3 gather A/B table).

This kernel exploits the op's spatial coherence instead: the best box at
grid position (i, j) is decoded from the anchor AT (i, j), so its center
lands within a pixel or two of the position (under the reference's
transposed-coordinate quirk, of the TRANSPOSED position (j, i) — the
caller passes grids in transposed layout so coherence holds either way).
For a band of grid rows the kernel holds the band + a +-R halo of the
feature map resident in VMEM and reconstructs the gather as a masked
stencil: for every integer shift (u, v) in the window,

    acc[a, b, :] += sum_corners w_c[a, b] * [dy_c == u][dx_c == v]
                    * feat[a + u, b + v, :]

— all VPU selects/fmas over contiguous VMEM, no per-row fetches. All
(2R+1)^2 shifts run unconditionally as masked FMAs (a data-dependent
`pl.when` skip measured slower on v5e than the FMAs it saves at R<=2).

TPU layout (the v5e-measured design, round 4): the slab lives in VMEM
TRANSPOSED as (rows, C, W) so the grid-column dim W sits on vector
LANES in both the 2D masks (Tm, G1) and the 3D slab — the mask
broadcast m[:, None, :] then replicates along sublanes (cheap) instead
of moving lane data to sublanes (a per-shift relayout that dominated
the NHWC form). The whole 25-term stencil is emitted as ONE summed
expression with no accumulator scratch, keeping every partial in vector
registers: the scratch-accumulate form re-walked 4 MB of VMEM per shift
and measured 87.7 ms for the stride-8 level of a b32 1024^2 input vs
14.9 ms for this form (flat XLA gather: ~25 ms).

Exactness: corners that fall OUTSIDE the +-R window contribute zero in
the kernel; their contribution is added back by a budgeted XLA gather
over just those corners (`jnp.nonzero(..., size=K)` + scatter-add). If
the outlier count exceeds the budget (possible for adversarial
geometry or early-training boxes decoded far off their anchor), the
default `exact_fallback=True` switches — via `lax.cond`, at runtime —
to the plain flat-gather result, so the op is exact for EVERY input;
the fallback costs nothing when the budget holds.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sample_kernel(dy0, dy1, dx0, dx1, w00, w01, w10, w11, feat_hbm,
                   out_ref, xbuf, sem, *, R, Tm, G1, C):
    b = pl.program_id(0)
    t = pl.program_id(1)
    cp = pltpu.make_async_copy(
        feat_hbm.at[b, pl.ds(t * Tm, Tm + 2 * R)], xbuf, sem)
    cp.start()
    d0, d1 = dy0[0], dy1[0]                       # (Tm, G1) int32
    e0, e1 = dx0[0], dx1[0]
    v00, v01 = w00[0], w01[0]                     # (Tm, G1) f32
    v10, v11 = w10[0], w11[0]
    cp.wait()
    acc = None
    for u in range(-R, R + 1):
        my0 = d0 == u
        my1 = d1 == u
        for v in range(-R, R + 1):
            mx0 = e0 == v
            mx1 = e1 == v
            m = (jnp.where(my0 & mx0, v00, 0.0)
                 + jnp.where(my0 & mx1, v01, 0.0)
                 + jnp.where(my1 & mx0, v10, 0.0)
                 + jnp.where(my1 & mx1, v11, 0.0))
            # row shift u: untiled-dim slice (free); col shift v: lane
            # window into the padded slab (in-register align)
            sl = xbuf[R + u:R + u + Tm, :, R + v:R + v + G1]
            term = m[:, None, :] * sl.astype(jnp.float32)
            acc = term if acc is None else acc + term
    out_ref[0] = acc.astype(out_ref.dtype)


def _corner_window_setup(feat, py, px, inside, R):
    """Shared stencil geometry: bilinear corners, in-window kernel
    weights, out-of-window masks, flat corner rows for the correction
    gather. Returns a dict of per-corner arrays, all (B, G0, G1)."""
    b, h, w, c = feat.shape
    py = py.astype(jnp.float32)
    px = px.astype(jnp.float32)
    ins = inside & (py > -1.0) & (py < h) & (px > -1.0) & (px < w)
    pyc = jnp.clip(py, 0.0, h - 1.0)
    pxc = jnp.clip(px, 0.0, w - 1.0)
    y0 = jnp.floor(pyc).astype(jnp.int32)
    x0 = jnp.floor(pxc).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = pyc - y0
    lx = pxc - x0
    hy, hx = 1.0 - ly, 1.0 - lx
    zero = jnp.zeros_like(ly)
    w00 = jnp.where(ins, hy * hx, zero)
    w01 = jnp.where(ins, hy * lx, zero)
    w10 = jnp.where(ins, ly * hx, zero)
    w11 = jnp.where(ins, ly * lx, zero)

    g = py.shape
    a_idx = jax.lax.broadcasted_iota(jnp.int32, g, 1)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, g, 2)
    dy0 = y0 - a_idx
    dy1 = y1 - a_idx
    dx0 = x0 - b_idx
    dx1 = x1 - b_idx

    # corners outside the stencil window: zero their kernel weight and
    # route them through the correction gather
    oy0 = (dy0 < -R) | (dy0 > R)
    oy1 = (dy1 < -R) | (dy1 > R)
    ox0 = (dx0 < -R) | (dx0 > R)
    ox1 = (dx1 < -R) | (dx1 > R)
    out00 = (oy0 | ox0) & (w00 != 0)
    out01 = (oy0 | ox1) & (w01 != 0)
    out10 = (oy1 | ox0) & (w10 != 0)
    out11 = (oy1 | ox1) & (w11 != 0)
    kw00 = jnp.where(out00, zero, w00)
    kw01 = jnp.where(out01, zero, w01)
    kw10 = jnp.where(out10, zero, w10)
    kw11 = jnp.where(out11, zero, w11)

    base = jax.lax.broadcasted_iota(jnp.int32, g, 0) * (h * w)
    rows = jnp.stack([base + y0 * w + x0, base + y0 * w + x1,
                      base + y1 * w + x0, base + y1 * w + x1],
                     -1).reshape(-1)
    return dict(w00=w00, w01=w01, w10=w10, w11=w11,
                kw00=kw00, kw01=kw01, kw10=kw10, kw11=kw11,
                out00=out00, out01=out01, out10=out10, out11=out11,
                dy0=dy0, dy1=dy1, dx0=dx0, dx1=dx1, rows=rows)


def _outlier_correction(feat, val, s, K, exact_fallback, grid_shape):
    """Budgeted exact correction for out-of-window corners, shared by
    the band kernel and the XLA stencil. For real FRM rois n_out is 0,
    so the machinery — jnp.nonzero(size=K) over 4N bools and a TPU
    scatter-add — hides behind lax.cond and costs one reduction on the
    hot path."""
    b, g0, g1 = grid_shape
    h, w, c = feat.shape[1], feat.shape[2], feat.shape[3]
    omask = jnp.stack([s['out00'], s['out01'], s['out10'], s['out11']],
                      -1).reshape(-1)
    n_out = jnp.sum(omask, dtype=jnp.int32)
    rows = s['rows']
    wts = jnp.stack([s['w00'], s['w01'], s['w10'], s['w11']],
                    -1).reshape(-1)

    def _correct(val):
        oidx = jnp.nonzero(omask, size=K, fill_value=0)[0]
        valid = (jax.lax.iota(jnp.int32, K) < n_out).astype(jnp.float32)
        cwts = wts[oidx] * valid
        crows = jnp.take(feat.reshape(b * h * w, c), rows[oidx], axis=0)
        contrib = (cwts[:, None]
                   * crows.astype(jnp.float32)).astype(feat.dtype)
        pts = oidx // 4
        return (val.reshape(b * g0 * g1, c).at[pts].add(contrib)
                .reshape(b, g0, g1, c))

    def _flat(val):
        # runtime guard (ADVICE r3): outliers exceeded the budget, so
        # the correction would silently truncate — recompute everything
        # via the flat gather. Exact for ANY geometry.
        gv = jnp.take(feat.reshape(b * h * w, c), rows, axis=0)
        contribs = (wts[:, None] * gv.astype(jnp.float32))
        return (contribs.reshape(b * g0 * g1, 4, c).sum(1)
                .astype(feat.dtype).reshape(b, g0, g1, c))

    if exact_fallback:
        val = jax.lax.cond(
            n_out == 0, lambda v: v,
            lambda v: jax.lax.cond(n_out > K, _flat, _correct, v), val)
    else:
        val = jax.lax.cond(n_out == 0, lambda v: v, _correct, val)
    return val, n_out


@functools.partial(jax.jit, static_argnames=('window', 'outlier_budget',
                                             'exact_fallback'))
def bilinear_sample_stencil(feat, py, px, inside, window=2,
                            outlier_budget=None, exact_fallback=True):
    """Pure-XLA masked-stencil form of the FRM bilinear sample.

    Same math as `bilinear_sample_band` — for every integer shift
    (u, v) in the +-window box, accumulate
    ``mask_uv * weight * feat[a+u, b+v, :]`` — but emitted as 25
    slice-shifted elementwise FMAs over the padded feature map instead
    of a Pallas kernel. XLA fuses the whole expression into one
    convolution-shaped loop (tile-overlapping reads, no relayout, no
    pallas_call region boundary), so unlike the band kernel it composes
    with the surrounding graph: the band kernel wins its isolated A/B
    (12.4 vs 30.5 ms/b32, round 4) yet LOSES ~39 ms/b32 in the full
    serving model (PARITY.md round-5); this form exists to keep the
    stencil's algorithmic win without the materialization boundary.

    Same shapes/semantics as bilinear_sample_band: feat (B, H, W, C),
    py/px/inside (B, G0, G1) with G0 == H and G1 == W (grid cell (a, b)
    is expected to sample near feat row a, col b); returns
    (val, n_outliers) with the same budgeted exact correction +
    runtime flat-gather fallback.
    """
    b, h, w, c = feat.shape
    _, g0, g1 = py.shape
    assert (g0, g1) == (h, w), ((g0, g1), (h, w))
    R = window
    if outlier_budget is None:
        outlier_budget = max(1024, (b * g0 * g1) // 64)

    s = _corner_window_setup(feat, py, px, inside, R)
    featp = jnp.pad(feat, ((0, 0), (R, R), (R, R), (0, 0)))
    acc = None
    for u in range(-R, R + 1):
        my0 = s['dy0'] == u
        my1 = s['dy1'] == u
        for v in range(-R, R + 1):
            mx0 = s['dx0'] == v
            mx1 = s['dx1'] == v
            m = (jnp.where(my0 & mx0, s['kw00'], 0.0)
                 + jnp.where(my0 & mx1, s['kw01'], 0.0)
                 + jnp.where(my1 & mx0, s['kw10'], 0.0)
                 + jnp.where(my1 & mx1, s['kw11'], 0.0))
            sl = jax.lax.slice(featp, (0, R + u, R + v, 0),
                               (b, R + u + h, R + v + w, c))
            term = m[..., None] * sl.astype(jnp.float32)
            acc = term if acc is None else acc + term
    val = acc.astype(feat.dtype)

    return _outlier_correction(feat, val, s, outlier_budget,
                               exact_fallback, (b, g0, g1))


@functools.partial(jax.jit, static_argnames=('window', 'outlier_budget',
                                             'exact_fallback', 'interpret'))
def bilinear_sample_band(feat, py, px, inside, window=2,
                         outlier_budget=None, exact_fallback=True,
                         interpret=False):
    """Bilinear-sample `feat` at per-grid-cell points, band-kernel style.

    feat: (B, H, W, C). py/px/inside: (B, G0, G1) fractional row/col
    sample coordinates (UNCLAMPED; reference boundary semantics applied
    here) for a G0 x G1 grid of points whose sample row is expected near
    the cell's axis-0 index and sample col near its axis-1 index (the
    caller arranges transposition for the FRM quirk). Requires G0 % 8 == 0
    or G0 the full band.

    Returns (val, n_outliers): val (B, G0, G1, C) sampled values in grid
    layout (zero where `inside` is False), and the number of corner
    contributions that fell outside the stencil window. Outliers within
    `outlier_budget` are corrected exactly by a budgeted gather; beyond
    the budget, `exact_fallback=True` (default) swaps in the flat-gather
    result at runtime so the op stays exact for any geometry.
    """
    b, h, w, c = feat.shape
    _, g0, g1 = py.shape
    R = window
    Tm = min(16, g0)
    assert g0 % Tm == 0, (g0, Tm)
    if outlier_budget is None:
        outlier_budget = max(1024, (b * g0 * g1) // 64)

    s = _corner_window_setup(feat, py, px, inside, R)

    # slab layout (B, H', C, W'): W on lanes (padded to a 128 multiple —
    # Mosaic slices need tile-aligned minor dims), C on sublanes
    wp = -(-(w + 2 * R) // 128) * 128
    featp = jnp.pad(feat, ((0, 0), (R, R), (R, wp - w - R), (0, 0)))
    featT = jnp.transpose(featp, (0, 1, 3, 2))
    grid = (b, g0 // Tm)
    plane = lambda bb, tt: (bb, tt, 0)  # noqa: E731
    plane_spec = pl.BlockSpec((1, Tm, g1), plane, memory_space=pltpu.VMEM)
    valT = pl.pallas_call(
        functools.partial(_sample_kernel, R=R, Tm=Tm, G1=g1, C=c),
        out_shape=jax.ShapeDtypeStruct((b, g0, c, g1), feat.dtype),
        grid=grid,
        in_specs=[plane_spec] * 8 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, Tm, c, g1), lambda bb, tt: (bb, tt, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Tm + 2 * R, c, wp), feat.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # the register-fused 25-term expression needs stack room beyond
        # Mosaic's conservative 16 MB scoped-VMEM default (v5e: 128 MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(s['dy0'], s['dy1'], s['dx0'], s['dx1'],
      s['kw00'], s['kw01'], s['kw10'], s['kw11'], featT)
    val = jnp.transpose(valT, (0, 1, 3, 2))

    return _outlier_correction(feat, val, s, outlier_budget,
                               exact_fallback, (b, g0, g1))
