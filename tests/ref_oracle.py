"""Load the reference implementation's pure-torch/C++ code as parity oracles.

The upstream reference lives read-only at /root/reference and depends on
mmcv/mmdet (not installed). This module stubs just enough of that import
surface to execute the reference's pure-torch math (coders, rtransforms)
and to compile its CPU extensions (rnms_cpu, nms_rotated_cpu,
polygon_geo_cpu) with torch.utils.cpp_extension. Everything here is
test-only oracle plumbing; nothing ships in the framework.

Oracles provided:
  ref_rbbox_coder()   -> /root/reference/r3det/core/bbox/coder/
                         delta_xywha_rbbox_coder.py (module)
  ref_hbbox_coder()   -> .../delta_xywha_hbbox_coder.py (module)
  ref_rtransforms()   -> .../rtransforms.py (module)
  build_rnms_cpu()    -> compiled rnms_cpu (v1 NMS, rnms/src/rcpu)
  build_nms_rotated_cpu() -> compiled nms_rotated_cpu (v3 NMS)
  build_polygon_geo() -> compiled polygon_geo_cpu (f64 polygon IoU)
"""
import functools
import importlib.util
import os
import sys
import types

REF = '/root/reference'
BUILD_ROOT = os.path.join(os.path.dirname(__file__), os.pardir,
                          '.ref_oracle_build')


def _module(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _ensure_stubs():
    if getattr(sys.modules.get('mmcv'), '_r3det_tpu_stub', False):
        return

    # the reference predates numpy 1.24 (poly2obb_np_v2 uses the removed
    # np.float alias, rtransforms.py:330); restore it for the oracle
    import numpy as np
    if not hasattr(np, 'float'):
        np.float = float

    mmcv = _module('mmcv')
    mmcv._r3det_tpu_stub = True

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]

        def deco(fn):
            return fn
        return deco
    mmcv.jit = jit

    class _Registry:
        def register_module(self, *args, **kwargs):
            if args and isinstance(args[0], type):
                return args[0]

            def deco(obj):
                return obj
            return deco

    _module('mmdet')
    _module('mmdet.core')
    _module('mmdet.core.bbox')
    builder = _module('mmdet.core.bbox.builder')
    builder.BBOX_CODERS = _Registry()
    _module('mmdet.core.bbox.coder')
    base = _module('mmdet.core.bbox.coder.base_bbox_coder')

    class BaseBBoxCoder:
        def __init__(self, *args, **kwargs):
            pass
    base.BaseBBoxCoder = BaseBBoxCoder

    # rtransforms does `from r3det.ops import convex_sort` (unused at
    # module scope beyond the import itself)
    r3 = _module('r3det')
    ops = _module('r3det.ops')

    def convex_sort(*args, **kwargs):
        raise RuntimeError('convex_sort oracle stub: CUDA-only upstream')
    ops.convex_sort = convex_sort
    r3.ops = ops


def _load_ref(relpath, name):
    _ensure_stubs()
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_rbbox_coder():
    return _load_ref('r3det/core/bbox/coder/delta_xywha_rbbox_coder.py',
                     'ref_delta_xywha_rbbox_coder')


def ref_hbbox_coder():
    return _load_ref('r3det/core/bbox/coder/delta_xywha_hbbox_coder.py',
                     'ref_delta_xywha_hbbox_coder')


def ref_rtransforms():
    return _load_ref('r3det/core/bbox/rtransforms.py', 'ref_rtransforms')


def ref_pipelines():
    """Reference dataset pipeline classes (RResize / RRandomFlip /
    PolyRandomRotate), with mmdet base classes stubbed and r3det.core
    geometry forwarded to the reference's own rtransforms module."""
    _ensure_stubs()
    rt = ref_rtransforms()
    import numpy as np
    import torch

    core = _module('r3det.core')

    def norm_angle(angle, version):
        return rt.norm_angle(torch.from_numpy(np.asarray(angle)),
                             version).numpy()
    core.norm_angle = norm_angle
    core.obb2poly_np = rt.obb2poly_np
    core.poly2obb_np = rt.poly2obb_np
    sys.modules['r3det'].core = core

    dsb = _module('mmdet.datasets')
    builder = _module('mmdet.datasets.builder')

    class _Registry:
        def register_module(self, *a, **k):
            if a and isinstance(a[0], type):
                return a[0]

            def deco(obj):
                return obj
            return deco
    builder.PIPELINES = _Registry()
    _module('mmdet.datasets.pipelines')
    tr = _module('mmdet.datasets.pipelines.transforms')

    class _Base:
        def __init__(self, *a, **k):
            pass
    tr.Resize = _Base
    tr.RandomFlip = _Base
    dsb.builder = builder

    return _load_ref('r3det/datasets/pipelines/rtransforms.py',
                     'ref_pipelines_rtransforms')


# ---------------------------------------------------------------------------
# Reference dense-head oracle (full loss pipeline, torch CPU)
# ---------------------------------------------------------------------------

class AttrDict(dict):
    """mmcv-Config-style attribute access over nested dicts."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError:
            raise AttributeError(k)
        return AttrDict(v) if isinstance(v, dict) else v

    def get(self, k, default=None):
        v = super().get(k, default)
        return AttrDict(v) if isinstance(v, dict) else v


def _ensure_head_stubs():
    """Stub the mmdet/mmcv surface rotate_anchor_head.py needs, executing
    the REFERENCE's own target/loss pipeline on torch CPU.

    Faithful re-implementations (mmdet 2.x semantics) are limited to the
    leaf utilities the reference imports from mmdet: multi_apply /
    images_to_levels / unmap, AnchorGenerator grids, MaxIoUAssigner,
    PseudoSampler, FocalLoss / SmoothL1Loss, ConvModule. Rotated IoU for
    the assigner is backed by the reference's own compiled f64
    polygon_geo kernel on reference obb2poly_np corners (the reference's
    eval-side IoU; v1 convention). Everything downstream — anchor->hbb
    assignment switch, encode, unmap, per-level averaging, focal
    weighting — is reference code (rotate_anchor_head.py:170-497).
    """
    _ensure_stubs()
    import math

    import numpy as np
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    if getattr(sys.modules.get('mmdet.core'), '_r3det_head_stub', False):
        return

    # ---- mmcv.cnn / mmcv.runner ---------------------------------------
    mmcv = sys.modules['mmcv']
    cnn = _module('mmcv.cnn')

    class ConvModule(tnn.Module):
        def __init__(self, in_ch, out_ch, k, stride=1, padding=0,
                     conv_cfg=None, norm_cfg=None):
            super().__init__()
            assert conv_cfg is None and norm_cfg is None
            self.conv = tnn.Conv2d(in_ch, out_ch, k, stride=stride,
                                   padding=padding, bias=True)
            self.activate = tnn.ReLU(inplace=True)

        def forward(self, x):
            return self.activate(self.conv(x))

    def normal_init(module, mean=0.0, std=1.0, bias=0.0):
        tnn.init.normal_(module.weight, mean, std)
        if hasattr(module, 'bias') and module.bias is not None:
            tnn.init.constant_(module.bias, bias)

    def bias_init_with_prob(prior_prob):
        return float(-math.log((1 - prior_prob) / prior_prob))

    cnn.ConvModule = ConvModule
    cnn.normal_init = normal_init
    cnn.bias_init_with_prob = bias_init_with_prob
    mmcv.cnn = cnn

    runner = _module('mmcv.runner')

    def force_fp32(*dargs, **dkw):
        def deco(fn):
            return fn
        return deco
    runner.force_fp32 = force_fp32
    mmcv.runner = runner

    # ---- mmdet.core utilities ----------------------------------------
    core = sys.modules.get('mmdet.core') or _module('mmdet.core')
    core._r3det_head_stub = True

    def multi_apply(func, *args, **kwargs):
        import functools as ft
        pfunc = ft.partial(func, **kwargs) if kwargs else func
        map_results = map(pfunc, *args)
        return tuple(map(list, zip(*map_results)))

    def images_to_levels(target, num_levels):
        target = torch.stack(target, 0)
        level_targets = []
        start = 0
        for n in num_levels:
            end = start + n
            level_targets.append(target[:, start:end])
            start = end
        return level_targets

    def unmap(data, count, inds, fill=0):
        if data.dim() == 1:
            ret = data.new_full((count, ), fill)
            ret[inds.type(torch.bool)] = data
        else:
            new_size = (count, ) + data.size()[1:]
            ret = data.new_full(new_size, fill)
            ret[inds.type(torch.bool), :] = data
        return ret

    class AnchorGenerator:
        """mmdet 2.x AnchorGenerator subset (octave scales, offset-0
        centers, position-major grid)."""

        def __init__(self, strides, ratios, scales=None,
                     octave_base_scale=None, scales_per_octave=None):
            self.strides = [(s, s) if isinstance(s, int) else tuple(s)
                            for s in strides]
            self.base_sizes = [min(s) for s in self.strides]
            if scales is None:
                octave_scales = np.array([
                    2**(i / scales_per_octave)
                    for i in range(scales_per_octave)])
                scales = octave_scales * octave_base_scale
            self.scales = torch.Tensor(scales)
            self.ratios = torch.Tensor(ratios)
            self.center_offset = 0.0
            self.base_anchors = self.gen_base_anchors()

        @property
        def num_levels(self):
            return len(self.strides)

        @property
        def num_base_anchors(self):
            return [b.size(0) for b in self.base_anchors]

        def gen_base_anchors(self):
            return [self.gen_single_level_base_anchors(bs)
                    for bs in self.base_sizes]

        def gen_single_level_base_anchors(self, base_size):
            w = h = base_size
            x_center = self.center_offset * w
            y_center = self.center_offset * h
            h_ratios = torch.sqrt(self.ratios)
            w_ratios = 1 / h_ratios
            ws = (w * w_ratios[:, None] * self.scales[None, :]).view(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).view(-1)
            return torch.stack([
                x_center - 0.5 * ws, y_center - 0.5 * hs,
                x_center + 0.5 * ws, y_center + 0.5 * hs], dim=-1)

        def _meshgrid(self, x, y):
            xx = x.repeat(len(y))
            yy = y.view(-1, 1).repeat(1, len(x)).view(-1)
            return xx, yy

        def single_level_grid_priors(self, featmap_size, level_idx,
                                     dtype=torch.float32, device='cpu'):
            base_anchors = self.base_anchors[level_idx].to(device, dtype)
            feat_h, feat_w = featmap_size
            stride_w, stride_h = self.strides[level_idx]
            shift_x = torch.arange(0, feat_w, device=device) * stride_w
            shift_y = torch.arange(0, feat_h, device=device) * stride_h
            shift_xx, shift_yy = self._meshgrid(shift_x, shift_y)
            shifts = torch.stack(
                [shift_xx, shift_yy, shift_xx, shift_yy], dim=-1).to(dtype)
            all_anchors = base_anchors[None, :, :] + shifts[:, None, :]
            return all_anchors.view(-1, 4)

        def grid_priors(self, featmap_sizes, device='cpu'):
            return [self.single_level_grid_priors(featmap_sizes[i], i,
                                                  device=device)
                    for i in range(self.num_levels)]

        def valid_flags(self, featmap_sizes, pad_shape, device='cpu'):
            flags = []
            for i in range(self.num_levels):
                feat_h, feat_w = featmap_sizes[i]
                h, w = pad_shape[:2]
                valid_feat_h = min(int(np.ceil(h / self.strides[i][1])),
                                   feat_h)
                valid_feat_w = min(int(np.ceil(w / self.strides[i][0])),
                                   feat_w)
                valid_x = torch.zeros(feat_w, dtype=torch.bool,
                                      device=device)
                valid_y = torch.zeros(feat_h, dtype=torch.bool,
                                      device=device)
                valid_x[:valid_feat_w] = 1
                valid_y[:valid_feat_h] = 1
                vxx, vyy = self._meshgrid(valid_x, valid_y)
                valid = vxx & vyy
                valid = valid[:, None].expand(
                    valid.size(0), self.num_base_anchors[i]).reshape(-1)
                flags.append(valid)
            return flags

    class AssignResult:
        def __init__(self, num_gts, gt_inds, max_overlaps, labels):
            self.num_gts = num_gts
            self.gt_inds = gt_inds
            self.max_overlaps = max_overlaps
            self.labels = labels

    class MaxIoUAssigner:
        """mmdet 2.x MaxIoUAssigner (defaults: gt_max_assign_all=True,
        match_low_quality=True)."""

        def __init__(self, pos_iou_thr, neg_iou_thr, min_pos_iou=0.0,
                     ignore_iof_thr=-1, iou_calculator=None,
                     gt_max_assign_all=True, match_low_quality=True):
            self.pos_iou_thr = pos_iou_thr
            self.neg_iou_thr = neg_iou_thr
            self.min_pos_iou = min_pos_iou
            self.ignore_iof_thr = ignore_iof_thr
            self.gt_max_assign_all = gt_max_assign_all
            self.match_low_quality = match_low_quality
            self.iou_calculator = build_iou_calculator(
                iou_calculator or dict(type='BboxOverlaps2D'))

        def assign(self, bboxes, gt_bboxes, gt_bboxes_ignore=None,
                   gt_labels=None):
            assert gt_bboxes_ignore is None or gt_bboxes_ignore.numel() == 0
            overlaps = self.iou_calculator(gt_bboxes, bboxes)
            num_gts, num_bboxes = overlaps.size(0), overlaps.size(1)
            assigned_gt_inds = overlaps.new_full((num_bboxes, ), -1,
                                                 dtype=torch.long)
            if num_gts == 0 or num_bboxes == 0:
                max_overlaps = overlaps.new_zeros((num_bboxes, ))
                assigned_gt_inds[:] = 0
                labels = None if gt_labels is None else \
                    overlaps.new_full((num_bboxes, ), -1, dtype=torch.long)
                return AssignResult(num_gts, assigned_gt_inds,
                                    max_overlaps, labels)
            max_overlaps, argmax_overlaps = overlaps.max(dim=0)
            gt_max_overlaps, gt_argmax_overlaps = overlaps.max(dim=1)
            assigned_gt_inds[(max_overlaps >= 0)
                             & (max_overlaps < self.neg_iou_thr)] = 0
            pos_inds = max_overlaps >= self.pos_iou_thr
            assigned_gt_inds[pos_inds] = argmax_overlaps[pos_inds] + 1
            if self.match_low_quality:
                for i in range(num_gts):
                    if gt_max_overlaps[i] >= self.min_pos_iou:
                        if self.gt_max_assign_all:
                            max_iou_inds = \
                                overlaps[i, :] == gt_max_overlaps[i]
                            assigned_gt_inds[max_iou_inds] = i + 1
                        else:
                            assigned_gt_inds[gt_argmax_overlaps[i]] = i + 1
            if gt_labels is not None:
                assigned_labels = assigned_gt_inds.new_full(
                    (num_bboxes, ), -1)
                pos = torch.nonzero(assigned_gt_inds > 0,
                                    as_tuple=False).squeeze()
                if pos.numel() > 0:
                    assigned_labels[pos] = gt_labels[
                        assigned_gt_inds[pos] - 1]
            else:
                assigned_labels = None
            return AssignResult(num_gts, assigned_gt_inds, max_overlaps,
                                assigned_labels)

    class SamplingResult:
        def __init__(self, pos_inds, neg_inds, bboxes, gt_bboxes,
                     assign_result):
            self.pos_inds = pos_inds
            self.neg_inds = neg_inds
            self.pos_bboxes = bboxes[pos_inds]
            self.pos_assigned_gt_inds = \
                assign_result.gt_inds[pos_inds] - 1
            if gt_bboxes.numel() == 0:
                self.pos_gt_bboxes = gt_bboxes.new_zeros(
                    (0, gt_bboxes.size(-1)))
            else:
                self.pos_gt_bboxes = gt_bboxes[
                    self.pos_assigned_gt_inds.long(), :]

    class PseudoSampler:
        def __init__(self, context=None, **kwargs):
            pass

        def sample(self, assign_result, bboxes, gt_bboxes, **kwargs):
            pos_inds = torch.nonzero(
                assign_result.gt_inds > 0,
                as_tuple=False).squeeze(-1).unique()
            neg_inds = torch.nonzero(
                assign_result.gt_inds == 0,
                as_tuple=False).squeeze(-1).unique()
            return SamplingResult(pos_inds, neg_inds, bboxes, gt_bboxes,
                                  assign_result)

    class BboxOverlaps2D:
        """Plain horizontal-box IoU (mmdet formula, (x1,y1,x2,y2))."""

        def __call__(self, bboxes1, bboxes2, mode='iou',
                     is_aligned=False):
            area1 = (bboxes1[:, 2] - bboxes1[:, 0]) * \
                (bboxes1[:, 3] - bboxes1[:, 1])
            area2 = (bboxes2[:, 2] - bboxes2[:, 0]) * \
                (bboxes2[:, 3] - bboxes2[:, 1])
            lt = torch.max(bboxes1[:, None, :2], bboxes2[None, :, :2])
            rb = torch.min(bboxes1[:, None, 2:], bboxes2[None, :, 2:])
            wh = (rb - lt).clamp(min=0)
            overlap = wh[..., 0] * wh[..., 1]
            union = area1[:, None] + area2[None, :] - overlap
            return overlap / union.clamp(min=1e-6)

    class RBboxOverlapsPolyOracle:
        """Rotated IoU via the reference's own compiled f64 polygon
        kernel on reference obb2poly corners.

        version follows the reference kernel families (PARITY.md "Angle
        -convention parity"): v1 rbbox_geo shares the poly-family corner
        convention; the v2/v3 box_iou_rotated kernels rotate with the
        OPPOSITE sign, reproduced by negating theta on both operands.
        Exact for the axis-aligned hbb-assign fast path in every
        version."""

        def __init__(self, version='v1'):
            self.version = version

        def __call__(self, bboxes1, bboxes2, mode='iou',
                     is_aligned=False, version=None):
            rt = ref_rtransforms()
            geo = build_polygon_geo()
            if bboxes1.size(-1) == 6:
                bboxes1 = bboxes1[..., :5]
            if bboxes2.size(-1) == 6:
                bboxes2 = bboxes2[..., :5]
            n1, n2 = bboxes1.size(0), bboxes2.size(0)
            if n1 == 0 or n2 == 0:
                return bboxes1.new_zeros((n1, n2))

            def corners(b):
                b = b.detach()
                if self.version in ('v2', 'v3'):
                    b = torch.cat([b[:, :4], -b[:, 4:5]], dim=1)
                return rt.obb2poly(b, 'v1').double().contiguous()
            return geo.polygon_iou(corners(bboxes1),
                                   corners(bboxes2)).float()

    class FocalLoss(tnn.Module):
        """mmdet sigmoid focal loss (py_sigmoid_focal_loss formula)."""

        def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25,
                     loss_weight=1.0):
            super().__init__()
            assert use_sigmoid
            self.gamma = gamma
            self.alpha = alpha
            self.loss_weight = loss_weight

        def forward(self, pred, target, weight=None, avg_factor=None):
            num_classes = pred.size(1)
            t = F.one_hot(target, num_classes + 1)[:, :num_classes].type_as(
                pred)
            pred_sigmoid = pred.sigmoid()
            pt = (1 - pred_sigmoid) * t + pred_sigmoid * (1 - t)
            focal_weight = (self.alpha * t + (1 - self.alpha) *
                            (1 - t)) * pt.pow(self.gamma)
            loss = F.binary_cross_entropy_with_logits(
                pred, t, reduction='none') * focal_weight
            if weight is not None:
                loss = loss * weight.view(-1, 1)
            return self.loss_weight * loss.sum() / avg_factor

    class SmoothL1Loss(tnn.Module):
        def __init__(self, beta=1.0, loss_weight=1.0):
            super().__init__()
            self.beta = beta
            self.loss_weight = loss_weight

        def forward(self, pred, target, weight=None, avg_factor=None):
            diff = torch.abs(pred - target)
            loss = torch.where(diff < self.beta,
                               0.5 * diff * diff / self.beta,
                               diff - 0.5 * self.beta)
            if weight is not None:
                loss = loss * weight
            return self.loss_weight * loss.sum() / avg_factor

    # ---- builders -----------------------------------------------------
    def build_iou_calculator(cfg):
        cfg = dict(cfg)
        t = cfg.pop('type')
        if t == 'BboxOverlaps2D':
            return BboxOverlaps2D()
        if t.startswith('RBboxOverlaps2D'):
            version = t.rsplit('_', 1)[-1] if '_' in t else 'v1'
            return RBboxOverlapsPolyOracle(version)
        raise KeyError(t)

    def build_assigner(cfg, **kw):
        cfg = dict(cfg)
        assert cfg.pop('type') == 'MaxIoUAssigner'
        return MaxIoUAssigner(**cfg)

    def build_sampler(cfg, context=None):
        cfg = dict(cfg)
        assert cfg.pop('type') == 'PseudoSampler'
        return PseudoSampler(context=context)

    def build_bbox_coder(cfg):
        cfg = dict(cfg)
        t = cfg.pop('type')
        if t == 'DeltaXYWHAOBBoxCoder':
            return ref_rbbox_coder().DeltaXYWHAOBBoxCoder(**cfg)
        if t == 'DeltaXYWHAHBBoxCoder':
            return ref_hbbox_coder().DeltaXYWHAHBBoxCoder(**cfg)
        raise KeyError(t)

    def build_prior_generator(cfg):
        cfg = dict(cfg)
        t = cfg.pop('type')
        assert t in ('RAnchorGenerator', 'AnchorGenerator'), t
        heads_pkg = _ref_heads_pkg()
        rag = importlib.import_module(
            'ref_r3det_core_anchor.ranchor_generator')
        del heads_pkg
        return rag.RAnchorGenerator(**cfg)

    def build_loss(cfg):
        cfg = dict(cfg)
        t = cfg.pop('type')
        if t == 'FocalLoss':
            return FocalLoss(**cfg)
        if t == 'SmoothL1Loss':
            return SmoothL1Loss(**cfg)
        raise KeyError(t)

    core.build_assigner = build_assigner
    core.build_bbox_coder = build_bbox_coder
    core.build_prior_generator = build_prior_generator
    core.build_sampler = build_sampler
    core.images_to_levels = images_to_levels
    core.multi_apply = multi_apply
    core.unmap = unmap

    anchor_mod = _module('mmdet.core.anchor')
    anchor_mod.AnchorGenerator = AnchorGenerator
    anchor_builder = _module('mmdet.core.anchor.builder')

    class _Reg:
        def register_module(self, *a, **k):
            if a and isinstance(a[0], type):
                return a[0]

            def deco(obj):
                return obj
            return deco
    anchor_builder.ANCHOR_GENERATORS = _Reg()

    models = _module('mmdet.models')
    mbuilder = _module('mmdet.models.builder')
    mbuilder.HEADS = _Reg()
    mbuilder.build_loss = build_loss
    models.builder = mbuilder
    _module('mmdet.models.dense_heads')
    bdh = _module('mmdet.models.dense_heads.base_dense_head')

    class BaseDenseHead(tnn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
    bdh.BaseDenseHead = BaseDenseHead

    # ---- r3det.core surface the heads import -------------------------
    rt = ref_rtransforms()
    r3core = sys.modules.get('r3det.core') or _module('r3det.core')
    r3core.obb2hbb = rt.obb2hbb
    rutils = _load_ref('r3det/core/anchor/rutils.py', 'ref_r3det_rutils')
    r3core.ranchor_inside_flags = rutils.ranchor_inside_flags

    # the reference's own multiclass_nms_rotated dispatch
    # (post_processing/bbox_nms_rotated.py) over its own op wrappers,
    # with the compiled CPU kernels behind them — the full reference
    # get_bboxes path runs on CPU
    r3core.multiclass_nms_rotated = _ref_multiclass_nms_rotated()
    sys.modules['r3det'].core = r3core


@functools.cache
def _ref_multiclass_nms_rotated():
    """Load bbox_nms_rotated.py with the reference's rnms/nms_rotated
    python wrappers bound to the compiled CPU extensions."""
    # packages so the wrappers' `from . import <ext>` resolves to the
    # compiled CPU modules
    rnms_pkg = _module('ref_rnms_pkg')
    rnms_pkg.__path__ = [os.path.join(REF, 'r3det/ops/rnms')]
    sys.modules['ref_rnms_pkg.rnms_ext'] = build_rnms_cpu()
    rnms_wrapper = importlib.import_module('ref_rnms_pkg.rnms_wrapper')

    nrot_pkg = _module('ref_nmsrot_pkg')
    nrot_pkg.__path__ = [os.path.join(REF, 'r3det/ops/nms_rotated')]
    sys.modules['ref_nmsrot_pkg.nms_rotated_ext'] = build_nms_rotated_cpu()
    nrot_wrapper = importlib.import_module(
        'ref_nmsrot_pkg.nms_rotated_wrapper')

    ops = sys.modules['r3det.ops']
    ops.batched_rnms = rnms_wrapper.batched_rnms
    ops.obb_batched_nms = nrot_wrapper.obb_batched_nms

    def ml_nms_rotated(*a, **k):
        raise NotImplementedError('v2 multiclass path not oracle-wired')
    ops.ml_nms_rotated = ml_nms_rotated

    mmcv_ops = _module('mmcv.ops')

    def _mmcv_nms_rotated(*a, **k):
        raise NotImplementedError("'mmcv' NMS branch is CUDA-only")
    mmcv_ops.nms_rotated = _mmcv_nms_rotated
    sys.modules['mmcv'].ops = mmcv_ops

    bnr = _load_ref('r3det/core/post_processing/bbox_nms_rotated.py',
                    'ref_bbox_nms_rotated')
    return bnr.multiclass_nms_rotated


def _ref_heads_pkg():
    """Package shells so the reference's relative imports resolve."""
    for pkg_name, path in (
            ('ref_r3det_heads', 'r3det/models/dense_heads'),
            ('ref_r3det_core_anchor', 'r3det/core/anchor')):
        if pkg_name not in sys.modules:
            pkg = _module(pkg_name)
            pkg.__path__ = [os.path.join(REF, path)]
    return sys.modules['ref_r3det_heads']


def ref_retina_head_module():
    """The reference's rotate_retina_head module, loss pipeline intact."""
    _ensure_head_stubs()
    _ref_heads_pkg()
    return importlib.import_module('ref_r3det_heads.rotate_retina_head')


# ---------------------------------------------------------------------------
# Reference CPU extensions (compiled on demand, cached in .ref_oracle_build)
# ---------------------------------------------------------------------------

def _cpp_load(name, sources, binding_src=None, api_renames=None):
    """Compile reference C++ sources as a test oracle.

    api_renames: optional {old: new} replacements applied to a copy of
    each source in the build dir — ONLY for deprecated-torch-API renames
    (e.g. ``.type()`` -> ``.scalar_type()``) so pre-1.5-era code builds
    against torch 2.x. Algorithmic content is never touched.
    """
    from torch.utils import cpp_extension
    build_dir = os.path.join(BUILD_ROOT, name)
    os.makedirs(build_dir, exist_ok=True)
    include_dirs = sorted({os.path.dirname(s) for s in sources})
    if api_renames:
        patched = []
        for src in sources:
            text = open(src).read()
            for old, new in api_renames.items():
                text = text.replace(old, new)
            dst = os.path.join(build_dir,
                               'patched_' + os.path.basename(src))
            if not os.path.exists(dst) or open(dst).read() != text:
                with open(dst, 'w') as f:
                    f.write(text)
            patched.append(dst)
        sources = patched
    if binding_src is not None:
        binding_path = os.path.join(build_dir, f'{name}_binding.cpp')
        if (not os.path.exists(binding_path) or
                open(binding_path).read() != binding_src):
            with open(binding_path, 'w') as f:
                f.write(binding_src)
        sources = sources + [binding_path]
    return cpp_extension.load(name=name, sources=sources,
                              build_directory=build_dir,
                              extra_include_paths=include_dirs,
                              verbose=False)


@functools.cache
def build_rnms_cpu():
    """Reference v1 rotated NMS (rnms/src/rcpu/rnms_cpu.cpp)."""
    binding = (
        '#include <torch/extension.h>\n'
        'torch::Tensor rnms_cpu(const torch::Tensor &dets_tsr, '
        'const float threshold);\n'
        'PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) '
        '{ m.def("rnms", &rnms_cpu, "reference v1 rotated NMS (CPU)"); }\n')
    return _cpp_load(
        'ref_rnms_cpu',
        [os.path.join(REF, 'r3det/ops/rnms/src/rcpu/rnms_cpu.cpp')],
        binding)


@functools.cache
def build_nms_rotated_cpu():
    """Reference v3 rotated NMS (nms_rotated/src/nms_rotated_cpu.cpp)."""
    binding = (
        '#include <torch/extension.h>\n'
        'at::Tensor nms_rotated_cpu(const at::Tensor& dets, '
        'const at::Tensor& scores, const float iou_threshold);\n'
        'PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) '
        '{ m.def("nms_rotated", &nms_rotated_cpu, '
        '"reference v3 rotated NMS (CPU)"); }\n')
    return _cpp_load(
        'ref_nms_rotated_cpu',
        [os.path.join(REF,
                      'r3det/ops/nms_rotated/src/nms_rotated_cpu.cpp')],
        binding)


@functools.cache
def build_polygon_geo():
    """Reference f64 polygon IoU (polygon_geo/src/polygon_geo_cpu.cpp).

    Ships its own PYBIND11_MODULE; no binding shim needed.
    """
    return _cpp_load(
        'ref_polygon_geo_cpu',
        [os.path.join(REF, 'r3det/ops/polygon_geo/src/polygon_geo_cpu.cpp')])
