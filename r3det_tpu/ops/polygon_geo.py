"""Host polygon geometry: ctypes binding to the C++ float64 engine.

Re-provides `polygon_iou` (reference polygon_geo_cpu extension, used by
DOTA evaluation — dota1.py:670-681) and a greedy polygon NMS for patch
merging. Builds csrc/libpolygeo.so on first use if missing; falls back to
a pure-numpy implementation when no compiler is available.
"""
import ctypes
import os
import subprocess
import warnings

import numpy as np

_ROOT = os.path.join(os.path.dirname(__file__), '..', '..', 'csrc')
_LIB_PATH = os.path.abspath(os.path.join(_ROOT, 'libpolygeo.so'))
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(['make', '-C', os.path.abspath(_ROOT)],
                           check=True, capture_output=True)
        except Exception as e:  # pragma: no cover - build env missing
            warnings.warn(f'libpolygeo build failed ({e}); using numpy '
                          'fallback for polygon IoU')
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:  # pragma: no cover
        warnings.warn(f'libpolygeo load failed ({e}); numpy fallback')
        return None
    lib.polygon_iou_matrix.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double)]
    lib.polygon_greedy_nms.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_double, ctypes.POINTER(ctypes.c_int64)]
    lib.polygon_greedy_nms.restype = ctypes.c_int64
    _lib = lib
    return _lib


def _as_f64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def polygon_iou(polys1, polys2):
    """(N, 8) x (M, 8) -> (N, M) float64 IoU matrix (convex quads)."""
    p1 = _as_f64(polys1).reshape(-1, 8)
    p2 = _as_f64(polys2).reshape(-1, 8)
    n1, n2 = len(p1), len(p2)
    if n1 == 0 or n2 == 0:
        return np.zeros((n1, n2))
    lib = _load()
    if lib is not None:
        out = np.empty((n1, n2), np.float64)
        lib.polygon_iou_matrix(
            p1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n1,
            p2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n2,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out
    return _polygon_iou_np(p1, p2)


def polygon_nms(polys_scored, iou_thr):
    """Greedy NMS on (N, 9) scored quads -> kept indices (score order)."""
    p = _as_f64(polys_scored)
    n = len(p)
    if n == 0:
        return np.zeros((0,), np.int64)
    lib = _load()
    if lib is not None:
        keep = np.empty((n,), np.int64)
        num = lib.polygon_greedy_nms(
            p[:, :8].copy().ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            p[:, 8].copy().ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, float(iou_thr),
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return keep[:num]
    iou = _polygon_iou_np(p[:, :8], p[:, :8])
    order = np.argsort(-p[:, 8], kind='stable')
    keep, suppressed = [], np.zeros(n, bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > iou_thr
        suppressed[i] = False
    return np.asarray(keep, np.int64)


# --------------------------- numpy fallback ------------------------------

def _clip_poly(poly, a, b):
    out = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        c1 = ((b[0] - a[0]) * (cur[1] - a[1]) -
              (b[1] - a[1]) * (cur[0] - a[0]))
        c2 = ((b[0] - a[0]) * (nxt[1] - a[1]) -
              (b[1] - a[1]) * (nxt[0] - a[0]))
        if c1 >= 0:
            out.append(cur)
        if (c1 >= 0) != (c2 >= 0):
            t = c1 / (c1 - c2)
            out.append(cur + t * (nxt - cur))
    return out


def _shoelace(p):
    p = np.asarray(p)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)


def _ccw(q):
    q = q.reshape(4, 2)
    return q if _shoelace(q) >= 0 else q[::-1]


def _polygon_iou_np(p1, p2):
    out = np.zeros((len(p1), len(p2)))
    quads1 = [_ccw(q) for q in p1]
    quads2 = [_ccw(q) for q in p2]
    a1 = [abs(_shoelace(q)) for q in quads1]
    a2 = [abs(_shoelace(q)) for q in quads2]
    for i, qa in enumerate(quads1):
        for j, qb in enumerate(quads2):
            poly = list(qa)
            for e in range(4):
                if len(poly) < 3:
                    break
                poly = _clip_poly(np.asarray(poly), qb[e], qb[(e + 1) % 4])
            inter = abs(_shoelace(np.asarray(poly))) if len(poly) >= 3 else 0.0
            union = a1[i] + a2[j] - inter
            out[i, j] = inter / union if union > 1e-12 else 0.0
    return out
