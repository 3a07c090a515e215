"""Golden parity vs the reference's OWN code (torch CPU + C++ oracles).

Round-trip and cv2-oracle tests (test_coders/test_rtransforms) verify
self-consistency; these tests diff directly against the reference
implementation loaded from /root/reference via tests/ref_oracle.py:

- coder encode/decode, all 6 branches (OBB/HBB x v1/v2/v3)
  (delta_xywha_rbbox_coder.py:105-423, delta_xywha_hbbox_coder.py:112-493)
- rtransforms tensor + numpy geometry (rtransforms.py:49-806)
- compiled CPU extensions as NMS / polygon-IoU keep-set oracles
  (rnms_cpu.cpp, nms_rotated_cpu.cpp, polygon_geo_cpu.cpp) — marked slow
  (one-time C++ compile).
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp

from r3det_tpu.core import coders, rtransforms as rt, rtransforms_np as rtn

from ref_oracle import (REF, build_nms_rotated_cpu, build_polygon_geo,
                        build_rnms_cpu, ref_hbbox_coder, ref_rbbox_coder,
                        ref_rtransforms)

PI = np.pi
# fp32 trig/div differ by a few ulps between torch-CPU and XLA; the angle
# channel additionally goes through modular arithmetic. These bounds hold
# empirically with ~100x margin on 4k random boxes.
ATOL = 2e-5
RTOL = 2e-5

ANGLE_RANGE = {'v1': (-PI / 2, 0.0), 'v2': (-PI / 4, 3 * PI / 4),
               'v3': (-PI / 2, PI / 2)}


def rand_obb(n, version, seed, lo=5.0, hi=900.0):
    r = np.random.RandomState(seed)
    a0, a1 = ANGLE_RANGE[version]
    eps = 1e-3                       # stay off range endpoints (ulp flips)
    return np.stack([
        r.uniform(lo, hi, n), r.uniform(lo, hi, n),
        r.uniform(8, 120, n), r.uniform(6, 80, n),
        r.uniform(a0 + eps, a1 - eps, n)], -1).astype(np.float32)


def rand_hbb(n, seed):
    r = np.random.RandomState(seed)
    cx = r.uniform(50, 900, n)
    cy = r.uniform(50, 900, n)
    w = r.uniform(8, 120, n)
    h = r.uniform(6, 80, n)
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                    -1).astype(np.float32)


def rand_deltas(n, seed, scale=0.4):
    r = np.random.RandomState(seed)
    return (r.randn(n, 5) * scale).astype(np.float32)


# ---------------------------------------------------------------------------
# Coders
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_obb_coder_encode_matches_reference(version):
    mod = ref_rbbox_coder()
    ref = mod.DeltaXYWHAOBBoxCoder(angle_range=version)
    ours = coders.DeltaXYWHAOBBoxCoder(angle_version=version)
    anchors = rand_obb(4096, version, seed=1)
    gts = rand_obb(4096, version, seed=2)
    want = ref.encode(torch.from_numpy(anchors),
                      torch.from_numpy(gts)).numpy()
    got = np.asarray(ours.encode(jnp.asarray(anchors), jnp.asarray(gts)))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_obb_coder_decode_matches_reference(version):
    mod = ref_rbbox_coder()
    ref = mod.DeltaXYWHAOBBoxCoder(angle_range=version)
    ours = coders.DeltaXYWHAOBBoxCoder(angle_version=version)
    anchors = rand_obb(4096, version, seed=3)
    deltas = rand_deltas(4096, seed=4)
    want = ref.decode(torch.from_numpy(anchors),
                      torch.from_numpy(deltas)).numpy()
    got = np.asarray(ours.decode(jnp.asarray(anchors), jnp.asarray(deltas)))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


def test_obb_coder_decode_v1_max_shape_clamp():
    mod = ref_rbbox_coder()
    ref = mod.DeltaXYWHAOBBoxCoder(angle_range='v1')
    ours = coders.DeltaXYWHAOBBoxCoder(angle_version='v1')
    anchors = rand_obb(2048, 'v1', seed=5)
    deltas = rand_deltas(2048, seed=6, scale=1.0)   # push centers out
    want = ref.decode(torch.from_numpy(anchors), torch.from_numpy(deltas),
                      max_shape=(512, 512)).numpy()
    got = np.asarray(ours.decode(jnp.asarray(anchors), jnp.asarray(deltas),
                                 max_shape=(512, 512)))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


def test_obb_coder_decode_wh_ratio_clip_branch():
    mod = ref_rbbox_coder()
    for version in ('v1', 'v2', 'v3'):
        ref = mod.DeltaXYWHAOBBoxCoder(angle_range=version)
        ours = coders.DeltaXYWHAOBBoxCoder(angle_version=version)
        anchors = rand_obb(1024, version, seed=7)
        deltas = rand_deltas(1024, seed=8, scale=3.0)   # exceed ratio clip
        want = ref.decode(torch.from_numpy(anchors),
                          torch.from_numpy(deltas)).numpy()
        got = np.asarray(ours.decode(jnp.asarray(anchors),
                                     jnp.asarray(deltas)))
        np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL,
                                   err_msg=f'version={version}')


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_hbb_coder_encode_matches_reference(version):
    mod = ref_hbbox_coder()
    ref = mod.DeltaXYWHAHBBoxCoder(angle_range=version)
    ours = coders.DeltaXYWHAHBBoxCoder(angle_version=version)
    anchors = rand_hbb(4096, seed=11)
    gts = rand_obb(4096, version, seed=12)
    want = ref.encode(torch.from_numpy(anchors),
                      torch.from_numpy(gts)).numpy()
    got = np.asarray(ours.encode(jnp.asarray(anchors), jnp.asarray(gts)))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_hbb_coder_decode_matches_reference(version):
    mod = ref_hbbox_coder()
    ref = mod.DeltaXYWHAHBBoxCoder(angle_range=version)
    ours = coders.DeltaXYWHAHBBoxCoder(angle_version=version)
    anchors = rand_hbb(4096, seed=13)
    deltas = rand_deltas(4096, seed=14)
    want = ref.decode(torch.from_numpy(anchors),
                      torch.from_numpy(deltas)).numpy()
    got = np.asarray(ours.decode(jnp.asarray(anchors), jnp.asarray(deltas)))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_coder_roundtrip_cross(version):
    """our encode -> reference decode reproduces the gt (cross-impl)."""
    mod = ref_rbbox_coder()
    ref = mod.DeltaXYWHAOBBoxCoder(angle_range=version)
    ours = coders.DeltaXYWHAOBBoxCoder(angle_version=version)
    anchors = rand_obb(2048, version, seed=15)
    gts = rand_obb(2048, version, seed=16)
    deltas = np.asarray(ours.encode(jnp.asarray(anchors), jnp.asarray(gts)))
    dec = ref.decode(torch.from_numpy(anchors),
                     torch.from_numpy(deltas)).numpy()
    # v3 encode regularizes gt w/h/theta; compare via the same
    # regularization the reference applies at encode time
    if version == 'v3':
        got_wh = np.sort(dec[:, 2:4], axis=1)
        want_wh = np.sort(gts[:, 2:4], axis=1)
        np.testing.assert_allclose(got_wh, want_wh, atol=1e-2, rtol=1e-4)
    else:
        np.testing.assert_allclose(dec[:, :4], gts[:, :4], atol=1e-2,
                                   rtol=1e-4)


# ---------------------------------------------------------------------------
# rtransforms (tensor + numpy)
# ---------------------------------------------------------------------------

def test_norm_angle_matches_reference():
    mod = ref_rtransforms()
    angles = np.random.RandomState(21).uniform(
        -4 * PI, 4 * PI, 8192).astype(np.float32)
    for version in ('v1', 'v2', 'v3'):
        want = mod.norm_angle(torch.from_numpy(angles), version).numpy()
        got = np.asarray(rt.norm_angle(jnp.asarray(angles), version))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5,
                                   err_msg=f'version={version}')


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_obb2poly_tensor_matches_reference(version):
    mod = ref_rtransforms()
    boxes = rand_obb(4096, version, seed=22)
    want = mod.obb2poly(torch.from_numpy(boxes), version).numpy()
    got = np.asarray(rt.obb2poly(jnp.asarray(boxes), version))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_poly2obb_tensor_matches_reference(version):
    mod = ref_rtransforms()
    boxes = rand_obb(4096, version, seed=23)
    polys = mod.obb2poly(torch.from_numpy(boxes), version)
    want = mod.poly2obb(polys, version).numpy()
    got = np.asarray(rt.poly2obb(jnp.asarray(polys.numpy()), version))
    # angle wrap-around at range endpoints: compare via polygon geometry
    np.testing.assert_allclose(got[:, :2], want[:, :2], atol=1e-2)
    np.testing.assert_allclose(np.sort(got[:, 2:4], 1),
                               np.sort(want[:, 2:4], 1), atol=1e-2,
                               rtol=1e-4)
    d = np.abs(got[:, 4] - want[:, 4])
    assert np.minimum(d, np.abs(d - PI / 2)).max() < 1e-2


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_obb2hbb_matches_reference(version):
    mod = ref_rtransforms()
    boxes = rand_obb(4096, version, seed=24)
    want = mod.obb2hbb(torch.from_numpy(boxes), version).numpy()
    got = np.asarray(rt.obb2hbb(jnp.asarray(boxes), version))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_obb2xyxy_matches_reference(version):
    mod = ref_rtransforms()
    boxes = rand_obb(4096, version, seed=25)
    want = mod.obb2xyxy(torch.from_numpy(boxes), version).numpy()
    got = np.asarray(rt.obb2xyxy(jnp.asarray(boxes), version))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_hbb2obb_matches_reference(version):
    mod = ref_rtransforms()
    boxes = rand_hbb(4096, seed=26)
    want = mod.hbb2obb(torch.from_numpy(boxes), version).numpy()
    got = np.asarray(rt.hbb2obb(jnp.asarray(boxes), version))
    # reference hbb2obb_v1 returns (N, 1, 5) (leftover unsqueeze,
    # rtransforms.py:598-607); values are what callers consume
    np.testing.assert_allclose(got, want.reshape(-1, 5), atol=1e-4,
                               rtol=1e-5)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_poly2obb_np_matches_reference(version):
    mod = ref_rtransforms()
    boxes = rand_obb(256, version, seed=27, lo=100.0, hi=800.0)
    polys = mod.obb2poly(torch.from_numpy(boxes), version).numpy()
    for poly in polys:
        want = mod.poly2obb_np(poly.astype(np.float32), version)
        got = rtn.poly2obb_np(poly.astype(np.float32), version)
        assert (want is None) == (got is None)
        if want is not None:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
def test_obb2poly_np_matches_reference(version):
    mod = ref_rtransforms()
    boxes = rand_obb(512, version, seed=28)
    if version == 'v1':
        arg = np.concatenate(
            [boxes, np.ones((len(boxes), 1), np.float32)], 1)
        want = mod.obb2poly_np(arg, version)[:, :8]
        got = rtn.obb2poly_np(arg, version)[:, :8]
    else:
        # reference v2/v3 np variants take (n, 5) (+score col for v3)
        arg = np.concatenate(
            [boxes, np.ones((len(boxes), 1), np.float32)], 1)
        want = mod.obb2poly_np(arg, version)
        got = rtn.obb2poly_np(arg, version)
        want = np.asarray(want)[:, :8]
        got = np.asarray(got)[:, :8]
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


# ---------------------------------------------------------------------------
# Compiled CPU extension oracles (slow: one-time C++ build)
# ---------------------------------------------------------------------------

def _keep_set(keep_idx):
    keep_idx = np.asarray(keep_idx)
    return set(keep_idx[keep_idx >= 0].tolist())


@pytest.mark.slow
def test_rnms_matches_reference_cpu_ext():
    from r3det_tpu.ops.nms import rnms
    ext = build_rnms_cpu()
    r = np.random.RandomState(31)
    for trial in range(3):
        n = 200
        dets = np.stack([
            r.uniform(0, 400, n), r.uniform(0, 400, n),
            r.uniform(10, 80, n), r.uniform(8, 60, n),
            r.uniform(-PI / 2, 0, n), r.uniform(0, 1, n)], -1).astype(
                np.float32)
        for thr in (0.1, 0.3, 0.5):
            want = set(ext.rnms(torch.from_numpy(dets), thr).numpy()
                       .tolist())
            keep_idx, num = rnms(jnp.asarray(dets), thr)
            got = _keep_set(keep_idx)
            assert got == want, (f'trial={trial} thr={thr}: '
                                 f'ours-only={got - want} '
                                 f'ref-only={want - got}')


@pytest.mark.slow
def test_nms_rotated_matches_reference_cpu_ext():
    """v3 NMS keep set vs the reference's detectron2-derived CPU kernel.

    The reference wrapper sorts by score and passes radians directly
    (nms_rotated_wrapper.py:36-50); the v3 kernel rotates with the
    opposite angle sign (box_iou_rotated_utils.h:63-73), reproduced by
    negate_angle=True.
    """
    from r3det_tpu.ops.nms import rnms
    ext = build_nms_rotated_cpu()
    r = np.random.RandomState(32)
    for trial in range(3):
        n = 200
        boxes = np.stack([
            r.uniform(0, 400, n), r.uniform(0, 400, n),
            r.uniform(10, 80, n), r.uniform(8, 60, n),
            r.uniform(-PI / 2, PI / 2, n)], -1).astype(np.float32)
        scores = r.uniform(0, 1, n).astype(np.float32)
        for thr in (0.1, 0.5):
            want = set(ext.nms_rotated(torch.from_numpy(boxes),
                                       torch.from_numpy(scores),
                                       thr).numpy().tolist())
            dets = np.concatenate([boxes, scores[:, None]], -1)
            keep_idx, num = rnms(jnp.asarray(dets), thr,
                                 negate_angle=True)
            got = _keep_set(keep_idx)
            assert got == want, (f'trial={trial} thr={thr}: '
                                 f'ours-only={got - want} '
                                 f'ref-only={want - got}')


@pytest.mark.slow
def test_ml_nms_rotated_matches_reference_cpu_ext():
    """v2 (label-aware) NMS keep set vs the reference's ml_nms CPU kernel.

    The ml_nms vendored header keeps the ORIGINAL detectron2 corner
    generation (ml_nms_rotated/src/box_iou_rotated_utils.h:64-74) —
    opposite of the v3 header — which matches our kernel's convention,
    so no angle negation here.
    """
    from ref_oracle import _cpp_load
    from r3det_tpu.ops.nms import _nms_core
    # nms_rotated.h (included by the cpp) already defines the pybind
    # module and takes the address of the cuda dispatcher; provide only
    # a never-called CUDA stub so the link succeeds CPU-only.
    binding = (
        '#include <torch/extension.h>\n'
        '#include <torch/types.h>\n'
        'at::Tensor nms_rotated_cuda(const at::Tensor& dets, '
        'const at::Tensor& scores, const at::Tensor& labels, '
        'const float iou_threshold) '
        '{ TORCH_CHECK(false, "oracle build is CPU-only"); }\n')
    ext = _cpp_load(
        'ref_ml_nms_rotated_cpu',
        [os.path.join(REF,
                      'r3det/ops/ml_nms_rotated/src/nms_rotated_cpu.cpp')],
        binding,
        api_renames={
            '!dets.type().is_cuda()': '!dets.is_cuda()',
            '!scores.type().is_cuda()': '!scores.is_cuda()',
            'dets.type() == scores.type()':
                'dets.scalar_type() == scores.scalar_type()',
            'AT_DISPATCH_FLOATING_TYPES(dets.type(),':
                'AT_DISPATCH_FLOATING_TYPES(dets.scalar_type(),',
        })
    r = np.random.RandomState(35)
    n = 200
    boxes = np.stack([
        r.uniform(0, 400, n), r.uniform(0, 400, n),
        r.uniform(10, 80, n), r.uniform(8, 60, n),
        r.uniform(-PI / 4, 3 * PI / 4, n)], -1).astype(np.float32)
    scores = r.uniform(0, 1, n).astype(np.float32)
    labels = r.randint(0, 4, n).astype(np.float32)
    for thr in (0.1, 0.5):
        want = set(ext.ml_nms_rotated(
            torch.from_numpy(boxes), torch.from_numpy(scores),
            torch.from_numpy(labels), thr).numpy().tolist())
        keep_idx, _ = _nms_core(jnp.asarray(boxes), jnp.asarray(scores),
                                thr, 2000,
                                labels=jnp.asarray(labels.astype(np.int32)),
                                label_aware=True)
        got = _keep_set(keep_idx)
        assert got == want, (f'thr={thr}: ours-only={got - want} '
                             f'ref-only={want - got}')


@pytest.mark.slow
def test_box_iou_rotated_matrix_matches_reference_cpu_ext():
    """Dense v3 IoU matrix vs the reference's box_iou_rotated CPU ext."""
    from ref_oracle import _cpp_load
    from r3det_tpu.core.iou_calculators import (rbbox_overlaps_v1,
                                                rbbox_overlaps_v3)
    binding = (
        '#include <torch/extension.h>\n'
        'at::Tensor box_iou_rotated_cpu(const at::Tensor& boxes1, '
        'const at::Tensor& boxes2, const bool iou_or_iof);\n'
        'PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) '
        '{ m.def("box_iou_rotated", &box_iou_rotated_cpu); }\n')
    ext = _cpp_load(
        'ref_box_iou_rotated_cpu',
        [os.path.join(REF,
                      'r3det/ops/box_iou_rotated/src/'
                      'box_iou_rotated_cpu.cpp')],
        binding)
    r = np.random.RandomState(36)
    n = 150
    boxes = np.stack([
        r.uniform(0, 400, n), r.uniform(0, 400, n),
        r.uniform(10, 80, n), r.uniform(8, 60, n),
        r.uniform(-PI / 2, PI / 2, n)], -1).astype(np.float32)
    want = ext.box_iou_rotated(torch.from_numpy(boxes),
                               torch.from_numpy(boxes), True).numpy()
    got_v3 = np.asarray(rbbox_overlaps_v3(jnp.asarray(boxes),
                                          jnp.asarray(boxes)))
    np.testing.assert_allclose(got_v3, want, atol=5e-5)
    # sanity: the v1 calculator (no negation) must NOT match on rotated
    # boxes — if it does, the convention flag is dead code
    got_v1 = np.asarray(rbbox_overlaps_v1(jnp.asarray(boxes),
                                          jnp.asarray(boxes)))
    assert np.abs(got_v1 - want).max() > 0.01


@pytest.mark.slow
def test_polygon_iou_matches_reference_cpu_ext():
    from r3det_tpu.ops.polygon_geo import polygon_iou
    ext = build_polygon_geo()
    mod = ref_rtransforms()
    r = np.random.RandomState(33)
    boxes1 = rand_obb(64, 'v1', seed=34)
    boxes2 = rand_obb(64, 'v1', seed=35)
    p1 = mod.obb2poly(torch.from_numpy(boxes1), 'v1').double()
    p2 = mod.obb2poly(torch.from_numpy(boxes2), 'v1').double()
    want = ext.polygon_iou(p1, p2).numpy()
    got = np.asarray(polygon_iou(p1.numpy(), p2.numpy()))
    np.testing.assert_allclose(got, want, atol=1e-8)


# ---------------------------------------------------------------------------
# Data pipeline classes (datasets/pipelines/rtransforms.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('version', ['v1', 'v2', 'v3'])
@pytest.mark.parametrize('direction', ['horizontal', 'vertical', 'diagonal'])
def test_rrandomflip_bbox_flip_matches_reference(version, direction):
    from ref_oracle import ref_pipelines
    from r3det_tpu.datasets.transforms import RRandomFlip
    mod = ref_pipelines()
    ref = mod.RRandomFlip.__new__(mod.RRandomFlip)
    ref.version = version
    boxes = rand_obb(512, version, seed=41, lo=20.0, hi=500.0)
    img_shape = (600, 800, 3)
    want = ref.bbox_flip(boxes.copy(), img_shape, direction)
    ours = RRandomFlip(version=version)
    got = ours.bbox_flip(boxes.copy(), img_shape, direction)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rresize_bboxes_match_reference():
    from ref_oracle import ref_pipelines
    from r3det_tpu.datasets.transforms import RResize
    mod = ref_pipelines()
    ref = mod.RResize.__new__(mod.RResize)
    boxes = rand_obb(256, 'v1', seed=42)
    results = {'bbox_fields': ['gt_bboxes'], 'gt_bboxes': boxes.copy(),
               'scale_factor': np.array([0.5, 0.75, 0.5, 0.75], np.float32)}
    ref._resize_bboxes(results)
    want = results['gt_bboxes']

    # our RResize computes the scale from the image; apply the same
    # factors through its box rule directly
    got = boxes.copy()
    got[:, 0] *= 0.5
    got[:, 1] *= 0.75
    got[:, 2:4] *= np.sqrt(0.5 * 0.75)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # and the full __call__ path agrees on an actual resize
    img = np.zeros((200, 200, 3), np.uint8)
    r = RResize((100, 100))({'img': img, 'gt_bboxes': boxes.copy()})
    ref_results = {'bbox_fields': ['gt_bboxes'], 'gt_bboxes': boxes.copy(),
                   'scale_factor': r['scale_factor']}
    ref._resize_bboxes(ref_results)
    np.testing.assert_allclose(r['gt_bboxes'], ref_results['gt_bboxes'],
                               atol=1e-4)


@pytest.mark.parametrize('version', ['v1', 'v3'])
def test_polyrandomrotate_matches_reference(version):
    """Full __call__ diff with the same np.random draws (no class-9/11
    snap instances, so both consume exactly gate + angle)."""
    from ref_oracle import ref_pipelines
    from r3det_tpu.datasets.transforms import PolyRandomRotate
    mod = ref_pipelines()
    rng = np.random.RandomState(43)
    img = rng.randint(0, 255, (300, 400, 3)).astype(np.uint8)
    boxes = rand_obb(24, version, seed=44, lo=60.0, hi=240.0)
    labels = rng.randint(0, 5, 24).astype(np.int64)

    for seed in (0, 1, 2):
        ref = mod.PolyRandomRotate(rotate_ratio=0.7, angles_range=180,
                                   version=version)
        np.random.seed(seed)
        want = ref({'img': img.copy(), 'img_shape': img.shape,
                    'gt_bboxes': boxes.copy(), 'gt_labels': labels.copy()})
        ours = PolyRandomRotate(rotate_ratio=0.7, angles_range=180,
                                version=version, rng=np.random)
        np.random.seed(seed)
        got = ours({'img': img.copy(), 'img_shape': img.shape,
                    'gt_bboxes': boxes.copy(), 'gt_labels': labels.copy()})
        assert (want is None) == (got is None), f'seed={seed}'
        if want is None:
            continue
        assert got['rotate'] == want['rotate']
        np.testing.assert_allclose(got['rotate_angle'],
                                   want['rotate_angle'], atol=1e-9)
        np.testing.assert_array_equal(got['img'], want['img'])
        np.testing.assert_allclose(got['gt_bboxes'], want['gt_bboxes'],
                                   atol=1e-3)
        np.testing.assert_array_equal(got['gt_labels'], want['gt_labels'])
