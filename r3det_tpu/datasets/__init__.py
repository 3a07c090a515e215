from .transforms import (  # noqa: F401
    RResize, RRandomFlip, PolyRandomRotate, Normalize, Pad,
    TrainPipeline, pad_gt,
)
from .dota import DOTADataset, eval_rbbox_map  # noqa: F401
