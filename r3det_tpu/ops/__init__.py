from .rotated_iou import (  # noqa: F401
    rbbox_overlaps, rotated_iou_pairwise, rotated_iou_aligned,
    points_in_rbox, obb_corners,
)
from .nms import (  # noqa: F401
    rnms, batched_rnms, ml_nms_rotated, obb_batched_nms, poly_nms,
    multiclass_nms_rotated,
)
from .convex import convex_sort  # noqa: F401
from .polygon_geo import polygon_iou, polygon_nms  # noqa: F401
