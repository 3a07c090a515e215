"""Merge-NMS version-policy parity (VERDICT r2 missing #4).

The reference's cross-patch merge suppresses with the version-specific
op (/root/reference/r3det/datasets/dota1.py:47,658-661: v1 -> rnms,
v2 -> poly_nms, v3 -> obb_nms).  Our merge (_merge_one_image) always
runs f64 polygon NMS on version-generated exact corners.  These are the
same operator in different coordinates: obb2poly_np_v1 matches rnms's
corner convention, and obb2poly_np_v3 already bakes in the flipped
rotation sign of the detectron2-derived v3 kernel (rtransforms.py
obb2poly v3: -w sin / -h cos) — so the polygon keep set must equal the
reference kernel's keep set per version.  This test proves that against
the reference's own compiled CPU extensions on dense overlapping dets.
(v2's reference op IS polygon NMS on obb2poly corners — same formula we
run — so v1/v3 are the two families that need the proof.)
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip('torch')

from ref_oracle import build_nms_rotated_cpu, build_rnms_cpu  # noqa: E402

from r3det_tpu.datasets.dota import _merge_one_image  # noqa: E402

PI = np.pi


def _dense_dets(seed, n=300, num_classes=3):
    """Clustered dets (many cross-suppressions) in merged-image coords."""
    r = np.random.RandomState(seed)
    centers = r.uniform(100, 900, (12, 2))
    cx, cy = centers[r.randint(0, 12, n)].T
    cx = cx + r.uniform(-40, 40, n)
    cy = cy + r.uniform(-40, 40, n)
    dets = np.stack([
        cx, cy, r.uniform(20, 90, n), r.uniform(15, 70, n),
        r.uniform(-PI / 2 + 0.02, -0.02, n), r.uniform(0, 1, n),
        r.randint(0, num_classes, n).astype(np.float64)], -1).astype(
            np.float32)
    return dets


def _ref_merge(dets, num_classes, version, thr, rnms_ext, nmsrot_ext):
    """The reference's per-class version-op merge (dota1.py:646-661)."""
    out = []
    for lbl in range(num_classes):
        cls = dets[dets[:, 6] == lbl][:, :6]
        if len(cls) == 0:
            out.append(np.zeros((0, 6), np.float32))
            continue
        if version == 'v1':
            keep = rnms_ext.rnms(
                torch.from_numpy(np.ascontiguousarray(cls)), thr).numpy()
        else:   # v3 -> obb_nms -> nms_rotated kernel
            keep = nmsrot_ext.nms_rotated(
                torch.from_numpy(cls[:, :5].copy()),
                torch.from_numpy(cls[:, 5].copy()), thr).numpy()
        out.append(cls[np.sort(keep)])
    return out


@pytest.mark.slow
@pytest.mark.parametrize('version', ['v1', 'v3'])
def test_merge_keep_sets_match_reference_version_ops(version):
    rnms_ext = build_rnms_cpu()
    nmsrot_ext = build_nms_rotated_cpu()
    num_classes = 3
    for seed in (7, 8):
        dets = _dense_dets(seed, num_classes=num_classes)
        for thr in (0.1, 0.3):
            ours = _merge_one_image(dets, num_classes, version, thr)
            ref = _ref_merge(dets, num_classes, version, thr,
                             rnms_ext, nmsrot_ext)
            for lbl in range(num_classes):
                a = ours[lbl][np.lexsort(ours[lbl].T[::-1])] \
                    if len(ours[lbl]) else ours[lbl]
                b = ref[lbl][np.lexsort(ref[lbl].T[::-1])] \
                    if len(ref[lbl]) else ref[lbl]
                assert a.shape == b.shape, (
                    f'{version} thr={thr} cls={lbl}: kept '
                    f'{a.shape[0]} vs reference {b.shape[0]}')
                np.testing.assert_allclose(a, b, rtol=0, atol=0)
