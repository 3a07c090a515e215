from .rotated_iou import (  # noqa: F401
    rbbox_overlaps, rotated_iou_pairwise, rotated_iou_aligned,
    points_in_rbox, obb_corners,
)
