"""Full-model loss parity vs the reference torch head (VERDICT r2 #7).

Runs the REFERENCE's RRetinaHead end-to-end on torch CPU — its own
forward tower, anchor grid, circum-hbb assignment switch, MaxIoU
assignment (rotated IoU backed by the reference's compiled f64 polygon
kernel), encode, unmap, per-level focal/smooth-L1 averaging
(rotate_anchor_head.py:170-497) — and diffs both the forward outputs
and the final loss scalars against this framework's head + head_loss on
identical weights and inputs.  This is the de-risking test for the one
number that can't be trained for in this sandbox (DOTA mAP parity): if
targets, encoding, averaging, and loss math all match at fp32 on the
same predictions, the gradient field the reference trains under is the
gradient field we train under.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_oracle import AttrDict, ref_retina_head_module  # noqa: E402

from r3det_tpu.core import coders  # noqa: E402
from r3det_tpu.models.detectors import (DetectorConfig,  # noqa: E402
                                        StageTrainCfg, head_loss,
                                        level_anchors)
from r3det_tpu.models.retina_head import RRetinaHead  # noqa: E402

NUM_CLASSES = 3
CH = 32
STACKED = 1
STRIDES = (8, 16, 32, 64, 128)
IMG = 64
FEATS = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]


def _build_ref_head(version, circum, num_classes=NUM_CLASSES):
    mod = ref_retina_head_module()
    head = mod.RRetinaHead(
        num_classes=num_classes,
        in_channels=CH,
        feat_channels=CH,
        stacked_convs=STACKED,
        assign_by_circumhbbox=version if circum else None,
        anchor_generator=dict(
            type='RAnchorGenerator', octave_base_scale=4,
            scales_per_octave=3, ratios=[1.0, 0.5, 2.0],
            strides=list(STRIDES)),
        bbox_coder=dict(
            type='DeltaXYWHAOBBoxCoder',
            target_means=(0., 0., 0., 0., 0.),
            target_stds=(1., 1., 1., 1., 1.),
            angle_range=version),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=0.11, loss_weight=1.0),
        train_cfg=AttrDict(dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0,
                          ignore_iof_thr=-1,
                          iou_calculator=dict(
                              type=f'RBboxOverlaps2D_{version}')),
            allowed_border=-1, pos_weight=-1, debug=False)))
    torch.manual_seed(0)
    head.init_weights()
    return head


def _flax_params_from_torch(head):
    """torch OIHW conv weights -> flax head params (HWIO)."""
    def conv(m):
        return {'kernel': jnp.asarray(
                    m.weight.detach().numpy().transpose(2, 3, 1, 0)),
                'bias': jnp.asarray(m.bias.detach().numpy())}
    p = {}
    for i in range(STACKED):
        p[f'cls_conv_{i}'] = conv(head.cls_convs[i].conv)
        p[f'reg_conv_{i}'] = conv(head.reg_convs[i].conv)
    p['retina_cls'] = conv(head.retina_cls)
    p['retina_reg'] = conv(head.retina_reg)
    return {'params': p}


def _fixed_inputs(seed=11):
    r = np.random.RandomState(seed)
    feats = [r.normal(0, 1, (2, h, w, CH)).astype(np.float32)
             for h, w in FEATS]
    # gt crafted to guarantee >=1 positive per image (anchor-sized boxes
    # near anchor centers), plus boxes exercising low-quality matching
    # and negatives. Two tie classes must be avoided because mmdet's
    # gt_max_assign_all low-quality match is fp-fragile on EXACT IoU
    # ties (the reference's own CPU and CUDA kernels would disagree
    # there too): (a) grid-symmetric boxes tie neighboring anchors;
    # (b) boxes fully contained in several equal-area anchors tie at
    # IoU = area_gt / area_anchor regardless of position. All boxes
    # here are off-grid and large enough to be clipped by their best
    # anchors' borders.
    gt0 = np.array([[16.4, 15.7, 31.6, 20.3, -0.31],
                    [40.6, 24.3, 28.4, 14.2, -1.17],
                    [51.7, 52.4, 40.3, 26.6, -0.72]], np.float32)
    gt1 = np.array([[24.3, 40.6, 36.5, 22.4, -0.88],
                    [47.3, 17.2, 30.5, 17.8, -0.55]], np.float32)
    lbl0 = np.array([0, 2, 1], np.int64)
    lbl1 = np.array([2, 1], np.int64)
    return feats, [gt0, gt1], [lbl0, lbl1]


def _pad_gts(gts, labels, G=4):
    B = len(gts)
    boxes = np.zeros((B, G, 5), np.float32)
    lab = np.zeros((B, G), np.int32)
    mask = np.zeros((B, G), bool)
    for i, (g, l) in enumerate(zip(gts, labels)):
        boxes[i, :len(g)] = g
        lab[i, :len(g)] = l
        mask[i, :len(g)] = True
    return boxes, lab, mask


@pytest.mark.slow
@pytest.mark.parametrize('version,circum', [
    ('v1', True), ('v1', False), ('v2', True), ('v2', False),
    ('v3', True), ('v3', False)],
    ids=['v1-hbb-assign', 'v1-rotated-assign',
         'v2-hbb-assign', 'v2-rotated-assign',
         'v3-hbb-assign', 'v3-rotated-assign'])
def test_head_forward_and_loss_match_reference(version, circum):
    ref_head = _build_ref_head(version, circum)
    feats, gts, labels = _fixed_inputs()

    # ---- reference forward + loss (torch CPU) ------------------------
    tfeats = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats]
    with torch.no_grad():
        cls_t, reg_t = ref_head(tfeats)
        metas = [dict(img_shape=(IMG, IMG, 3), pad_shape=(IMG, IMG, 3))
                 for _ in range(2)]
        losses = ref_head.loss(cls_t, reg_t,
                               [torch.from_numpy(g) for g in gts],
                               [torch.from_numpy(l) for l in labels],
                               metas)
    ref_cls = float(sum(v.item() for v in losses['loss_cls']))
    ref_bbox = float(sum(v.item() for v in losses['loss_bbox']))

    # ---- our forward on identical weights ----------------------------
    model = RRetinaHead(num_classes=NUM_CLASSES, in_channels=CH,
                       feat_channels=CH, stacked_convs=STACKED,
                       num_anchors=9)
    variables = _flax_params_from_torch(ref_head)
    cls_j, reg_j = model.apply(variables, tuple(jnp.asarray(f)
                                                for f in feats))
    for lvl in range(5):
        want = cls_t[lvl].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(cls_j[lvl]), want,
                                   atol=1e-4, rtol=1e-4)
        want = reg_t[lvl].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(reg_j[lvl]), want,
                                   atol=1e-4, rtol=1e-4)

    # ---- our loss on the same predictions ----------------------------
    cfg = DetectorConfig(
        num_classes=NUM_CLASSES, angle_version=version,
        stacked_convs=STACKED, feat_channels=CH,
        s0_train=StageTrainCfg(0.5, 0.4, 0.0,
                               version if circum else None))
    anchors = jnp.concatenate(level_anchors(cfg, tuple(FEATS)), 0)
    boxes, lab, mask = _pad_gts(gts, labels)
    coder = coders.DeltaXYWHAOBBoxCoder(cfg.target_means,
                                        cfg.target_stds, version)
    lc, lb = head_loss(cls_j, reg_j, anchors, jnp.asarray(boxes),
                       jnp.asarray(lab), jnp.asarray(mask), cfg,
                       cfg.s0_train, coder)
    got_cls, got_bbox = float(lc), float(lb)
    assert abs(got_cls - ref_cls) <= 2e-4 * max(1.0, abs(ref_cls)), (
        f'loss_cls {got_cls!r} != reference {ref_cls!r}')
    assert abs(got_bbox - ref_bbox) <= 2e-4 * max(1.0, abs(ref_bbox)), (
        f'loss_bbox {got_bbox!r} != reference {ref_bbox!r}')


@pytest.mark.slow
@pytest.mark.parametrize('nms_version', ['v1', 'v3'])
def test_get_bboxes_matches_reference(nms_version):
    """Predict-side parity: the reference's _get_bboxes_single — its own
    per-level top-nms_pre, decode, rescale-skip-angle, BG padding and
    multiclass_nms_rotated dispatch over its own op wrappers backed by
    the compiled CPU kernels (rotate_anchor_head.py:590-675 +
    bbox_nms_rotated.py) — vs this framework's detector_predict on
    identical weights and features."""
    version = 'v1'
    # v1 runs single-class: the reference's v1 batched_rnms separates
    # classes by offsetting box CENTERS by max_coordinate+1
    # (rnms_wrapper.py:60-66), which only equals true label gating while
    # every box's reach stays below the offset — P6/P7 anchors on this
    # tiny test image violate that by construction (the reference's own
    # v1 and v3 backends disagree with each other there: v3 uses sound
    # hbb-extent offsets, nms_rotated_wrapper.py:85-90). The label-gate
    # == offset equivalence at realistic box scales is covered in
    # test_nms.py; v3 below covers the multi-class dispatch.
    num_classes = 1 if nms_version == 'v1' else NUM_CLASSES
    ref_head = _build_ref_head(version, True, num_classes)
    # widen the cls logits so a random-init model produces detections
    torch.manual_seed(3)
    with torch.no_grad():
        ref_head.retina_cls.weight.mul_(40.0)
    feats, _, _ = _fixed_inputs()
    tfeats = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats]
    with torch.no_grad():
        cls_t, reg_t = ref_head(tfeats)

    from ref_oracle import AttrDict
    tcfg = AttrDict(dict(nms_pre=50, score_thr=0.01, max_per_img=100,
                         nms=dict(type=nms_version, iou_thr=0.3)))
    anchors_t = ref_head.anchor_generator.grid_priors(FEATS, device='cpu')
    ref_dets = []
    for img in range(2):
        with torch.no_grad():
            dets, labels = ref_head._get_bboxes_single(
                [cls_t[lvl][img] for lvl in range(5)],
                [reg_t[lvl][img] for lvl in range(5)],
                anchors_t, (IMG, IMG, 3), np.ones(4, np.float32), tcfg,
                rescale=False)
        ref_dets.append((dets.numpy(), labels.numpy()))

    from r3det_tpu.models.detectors import TestCfg, detector_predict
    cfg = DetectorConfig(
        num_classes=num_classes, angle_version=version,
        stacked_convs=STACKED, feat_channels=CH,
        test=TestCfg(nms_pre=50, score_thr=0.01, nms_iou_thr=0.3,
                     max_per_img=100, nms_version=nms_version,
                     nms_candidates=50 * 5 * num_classes))
    model = RRetinaHead(num_classes=num_classes, in_channels=CH,
                       feat_channels=CH, stacked_convs=STACKED,
                       num_anchors=9)
    variables = _flax_params_from_torch(ref_head)
    cls_j, reg_j = model.apply(variables, tuple(jnp.asarray(f)
                                                for f in feats))
    dets_j, labels_j, num_j = detector_predict(
        {'s0': (cls_j, reg_j)}, cfg, tuple(FEATS), img_shape=(IMG, IMG))

    for img in range(2):
        want_d, want_l = ref_dets[img]
        n = int(num_j[img])
        got_d = np.asarray(dets_j[img][:n])
        got_l = np.asarray(labels_j[img][:n])
        assert n == len(want_d), (
            f'{nms_version} img{img}: {n} dets vs reference '
            f'{len(want_d)}')
        # the reference returns keeps in candidate order, ours in score
        # order — compare as row-sorted sets (labels appended)
        got = np.concatenate([got_d, got_l[:, None].astype(np.float32)],
                             -1)
        want = np.concatenate([want_d,
                               want_l[:, None].astype(np.float32)], -1)
        got = got[np.lexsort(got.T[::-1])]
        want = want[np.lexsort(want.T[::-1])]
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
