"""Pallas TPU kernel: tiled exact rotated-box IoU.

The NMS/assignment hot path. The jnp-level IoU (rotated_iou.py) tops out
around 23M pairs/s because its 24-slot angle-sort materializes every
intermediate in HBM; this kernel keeps the whole per-tile computation in
VMEM/registers, using the Sutherland–Hodgman clip formulation (no sort,
no atan2, no gather):

- grid tile = (8 rows, 128 cols) of box pairs;
- quad corners live as Python-unrolled 2D register arrays;
- area comes from Gauss-Green boundary integration with Liang-Barsky
  segment clipping: each quad's edges are clipped to the other quad and
  contribute (t_hi - t_lo) * cross(P, D) to the shoelace sum — no vertex
  buffers, no sort, tiny live set (an earlier Sutherland-Hodgman variant
  with 64 doubling slot arrays spilled registers and ran 5x slower).

Numerics: fp32 with per-pair local-frame centering (same precision trick
as the jnp path / the reference's single_box_iou_rotated).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 8
TILE_C = 128


def _corners(cx, cy, w, h, t):
    """Four (r, c)-shaped corner coordinate arrays (tl, tr, br, bl)."""
    c = jnp.cos(t)
    s = jnp.sin(t)
    hw = w * 0.5
    hh = h * 0.5
    xs, ys = [], []
    for sx, sy in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
        dx = sx * hw
        dy = sy * hh
        xs.append(c * dx - s * dy + cx)
        ys.append(s * dx + c * dy + cy)
    return xs, ys


def _integral_area(ax, ay, bx, by):
    """Intersection area via Gauss-Green boundary integration (the same
    formulation as rotated_iou._quad_intersect_area_planes, unrolled over
    Python-level corner lists so everything stays in registers)."""
    def edges_integral(px_list, py_list, qx_list, qy_list, strict):
        total = None
        for i in range(4):
            px, py = px_list[i], py_list[i]
            dx = px_list[(i + 1) % 4] - px
            dy = py_list[(i + 1) % 4] - py
            t_lo = jnp.zeros_like(px)
            t_hi = jnp.ones_like(px)
            for j in range(4):
                qx, qy = qx_list[j], qy_list[j]
                ex = qx_list[(j + 1) % 4] - qx
                ey = qy_list[(j + 1) % 4] - qy
                c0 = ex * (py - qy) - ey * (px - qx)
                dc = ex * dy - ey * dx
                par = jnp.abs(dc) < 1e-12
                t_x = -c0 / jnp.where(par, 1.0, dc)
                t_lo = jnp.where(~par & (dc > 0),
                                 jnp.maximum(t_lo, t_x), t_lo)
                t_hi = jnp.where(~par & (dc < 0),
                                 jnp.minimum(t_hi, t_x), t_hi)
                reject = (c0 <= 0) if strict else (c0 < 0)
                t_hi = jnp.where(par & reject, -1.0, t_hi)
            span = jnp.maximum(t_hi - t_lo, 0.0)
            term = span * (px * dy - py * dx)
            total = term if total is None else total + term
        return total

    s1 = edges_integral(ax, ay, bx, by, strict=False)
    s2 = edges_integral(bx, by, ax, ay, strict=True)
    return jnp.abs(s1 + s2) * 0.5


def _iou_tile_kernel(b1_ref, b2_ref, out_ref, *, mode, upper_only=False,
                     tile_r=TILE_R, tile_c=TILE_C):
    # b1_ref: (tile_r, 5) row boxes; b2_ref: (5, tile_c) col boxes
    if upper_only:
        # greedy NMS consumes the strictly-upper triangle only: skip
        # whole tiles strictly below the diagonal (about half the grid)
        i = pl.program_id(0)
        j = pl.program_id(1)
        below_diag = (i * tile_r) >= ((j + 1) * tile_c)

        @pl.when(below_diag)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        @pl.when(jnp.logical_not(below_diag))
        def _():
            _iou_tile_body(b1_ref, b2_ref, out_ref, mode)
        return
    _iou_tile_body(b1_ref, b2_ref, out_ref, mode)


def _iou_tile_kernel_vcount(v_ref, b1_ref, b2_ref, out_ref, *, mode,
                            upper_only=False, tile_r=TILE_R,
                            tile_c=TILE_C):
    """Valid-prefix variant: tiles entirely past the first v_ref[0] rows
    or columns are zero-filled without computing. Callers sort valid
    boxes to a prefix (NMS sorts by gated score), so IoU work scales
    with the LIVE candidate count, not the static padding K."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    v = v_ref[0]
    skip = (i * tile_r >= v) | (j * tile_c >= v)
    if upper_only:
        skip |= (i * tile_r) >= ((j + 1) * tile_c)

    @pl.when(skip)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_not(skip))
    def _():
        _iou_tile_body(b1_ref, b2_ref, out_ref, mode)


def _iou_tile_body(b1_ref, b2_ref, out_ref, mode):
    f1 = [b1_ref[:, i:i + 1] for i in range(5)]          # (R, 1)
    f2 = [b2_ref[i:i + 1, :] for i in range(5)]          # (1, C)
    # local-frame shift (fp32 precision at image-coordinate scale)
    mx = (f1[0] + f2[0]) * 0.5
    my = (f1[1] + f2[1]) * 0.5
    ax, ay = _corners(f1[0] - mx, f1[1] - my, f1[2], f1[3], f1[4])
    bx, by = _corners(f2[0] - mx, f2[1] - my, f2[2], f2[3], f2[4])
    inter = _integral_area(ax, ay, bx, by)
    area1 = f1[2] * f1[3]
    area2 = f2[2] * f2[3]
    if mode == 'iou':
        denom = area1 + area2 - inter
    else:
        denom = jnp.broadcast_to(area1, inter.shape)
    out_ref[:, :] = inter / jnp.maximum(denom, 1e-14)


@functools.partial(jax.jit, static_argnames=('mode', 'interpret',
                                              'upper_only', 'tile_r'))
def rotated_iou_pallas(boxes1, boxes2, mode='iou', interpret=False,
                       upper_only=False, valid_count=None, tile_r=None):
    """Dense (N, M) rotated IoU/IoF via the tiled clip kernel.

    upper_only zeroes tiles strictly below the diagonal (valid only for
    the self-IoU consumed by greedy NMS, which reads j < i pairs).
    valid_count (traced int scalar): when given, rows/cols at index >=
    valid_count produce zeros without computing — callers must have
    sorted valid entries to a prefix. Makes NMS IoU cost track the live
    candidate count instead of the static K.
    tile_r: grid tile height; None auto-sizes. (8, 128) suits small or
    ragged problems; NMS/assignment-sized problems (n >= 256) take 64 —
    per-tile grid overhead dominates otherwise (measured on v5e at
    K=2000 x batch 32: 14.7 -> 2.5 ms/b32 skipped-path, 36.4 -> 20.6
    live)."""
    n, m = boxes1.shape[0], boxes2.shape[0]
    if n == 0 or m == 0:
        return jnp.zeros((n, m), dtype=jnp.float32)
    tr = tile_r or (64 if n >= 256 else TILE_R)
    pad_n = (-n) % tr
    pad_m = (-m) % TILE_C
    b1 = jnp.pad(boxes1.astype(jnp.float32), ((0, pad_n), (0, 0)))
    b2 = jnp.pad(boxes2.astype(jnp.float32), ((0, pad_m), (0, 0))).T
    np_, mp = n + pad_n, m + pad_m

    if valid_count is None:
        out = pl.pallas_call(
            functools.partial(_iou_tile_kernel, mode=mode,
                              upper_only=upper_only, tile_r=tr),
            out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.float32),
            grid=(np_ // tr, mp // TILE_C),
            in_specs=[
                pl.BlockSpec((tr, 5), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((5, TILE_C), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tr, TILE_C), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(b1, b2)
        return out[:n, :m]

    vc = jnp.asarray(valid_count, jnp.int32).reshape((1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(np_ // tr, mp // TILE_C),
        in_specs=[
            pl.BlockSpec((tr, 5), lambda i, j, v: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, TILE_C), lambda i, j, v: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, TILE_C), lambda i, j, v: (i, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_iou_tile_kernel_vcount, mode=mode,
                          upper_only=upper_only, tile_r=tr),
        out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(vc, b1, b2)
    return out[:n, :m]
