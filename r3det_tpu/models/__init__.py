from .losses import sigmoid_focal_loss, smooth_l1_loss, l1_loss  # noqa: F401
from .resnet import ResNet  # noqa: F401
from .fpn import FPN  # noqa: F401
from .retina_head import RRetinaHead  # noqa: F401
from .frm import FeatureRefineModule  # noqa: F401
from .detectors import RRetinaNet, R3Det, build_detector  # noqa: F401
