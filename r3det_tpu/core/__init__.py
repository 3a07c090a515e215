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
    norm_angle_np,
)
from .coders import (  # noqa: F401
    DeltaXYWHAOBBoxCoder, DeltaXYWHAHBBoxCoder,
)
