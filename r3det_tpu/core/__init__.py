from .rtransforms import (  # noqa: F401
    norm_angle, poly2obb, obb2poly, obb2hbb, obb2xyxy, hbb2obb,
    poly2obb_v1, poly2obb_v2, poly2obb_v3,
    obb2poly_v1, obb2poly_v2, obb2poly_v3,
    obb2hbb_v1, obb2hbb_v2, obb2hbb_v3,
    obb2xyxy_v1, obb2xyxy_v2, obb2xyxy_v3,
    hbb2obb_v1, hbb2obb_v2, hbb2obb_v3,
)
from .rtransforms_np import (  # noqa: F401
    poly2obb_np, obb2poly_np, get_best_begin_point, rbbox2result,
    rbbox2roi, norm_angle_np,
)
from .coders import (  # noqa: F401
    DeltaXYWHAOBBoxCoder, DeltaXYWHAHBBoxCoder,
)
from .iou_calculators import (  # noqa: F401
    RBboxOverlaps2D_v1, RBboxOverlaps2D_v2, RBboxOverlaps2D_v3,
    rbbox_overlaps_v1, rbbox_overlaps_v2, rbbox_overlaps_v3,
)
from .anchors import (  # noqa: F401
    RAnchorGenerator, PseudoAnchorGenerator, ranchor_inside_flags,
)
from .assigner import max_iou_assign, AssignResult  # noqa: F401
from .samplers import pseudo_sample, random_sample  # noqa: F401
from .visualization import imshow_det_rbboxes  # noqa: F401
