"""Config-facing rotated IoU calculators.

Re-provides the reference's three registry classes
(rotate_iou2d_calculator.py:8-231). All three reference backends compute
the rotated-overlap quantity through different CUDA extensions; here they
share ops.rotated_iou and differ in two policies:

- angle convention: the v1 backend (rbbox_geo) generates corners like
  obb2poly (our kernel's native convention); the v2 backend
  (mmcv.ops.box_iou_rotated) and v3 backend (vendored detectron2-modified
  box_iou_rotated_ext) rotate with the opposite sign
  (box_iou_rotated_utils.h:63-73). ``negate_angle`` reproduces each
  exactly (verified vs the compiled reference CPU extension in
  tests/test_reference_parity.py).
- the v3 small-box rule: overlaps involving boxes with min(w, h) < 1e-3
  are zeroed (box_iou_rotated_wrapper.py:50-60).
"""
from ..ops.rotated_iou import rbbox_overlaps


class RBboxOverlaps2D_v1:
    """v1 (rbbox_geo backend equivalent)."""

    small_box_thr = None
    negate_angle = False

    def __call__(self, bboxes1, bboxes2, mode='iou', is_aligned=False):
        return rbbox_overlaps(bboxes1, bboxes2, mode=mode,
                              is_aligned=is_aligned,
                              small_box_thr=self.small_box_thr,
                              negate_angle=self.negate_angle)

    def __repr__(self):
        return self.__class__.__name__ + '()'


class RBboxOverlaps2D_v2(RBboxOverlaps2D_v1):
    """v2 (mmcv.ops.box_iou_rotated backend equivalent)."""

    negate_angle = True


class RBboxOverlaps2D_v3(RBboxOverlaps2D_v1):
    """v3 (detectron2-derived backend + small-box zeroing,
    box_iou_rotated_wrapper.py:50-60)."""

    small_box_thr = 1e-3
    negate_angle = True


def rbbox_overlaps_v1(bboxes1, bboxes2, mode='iou', is_aligned=False):
    return RBboxOverlaps2D_v1()(bboxes1, bboxes2, mode, is_aligned)


def rbbox_overlaps_v2(bboxes1, bboxes2, mode='iou', is_aligned=False):
    return RBboxOverlaps2D_v2()(bboxes1, bboxes2, mode, is_aligned)


def rbbox_overlaps_v3(bboxes1, bboxes2, mode='iou', is_aligned=False):
    return RBboxOverlaps2D_v3()(bboxes1, bboxes2, mode, is_aligned)
