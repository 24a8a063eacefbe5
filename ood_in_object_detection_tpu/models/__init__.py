from .yolo import YOLODetector, build_model, model_forward  # noqa: F401
from .head import decode_detections, make_anchors, REG_MAX, STRIDES  # noqa: F401
