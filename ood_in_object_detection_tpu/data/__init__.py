from .dataset import DetectionDataset, PaddedBatcher, Label  # noqa: F401
from .letterbox import letterbox_np, letterbox_jax, scale_boxes_back  # noqa: F401
