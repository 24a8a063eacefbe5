from .boxes import box_iou, xywh2xyxy, xyxy2xywh, box_area  # noqa: F401
from .nms import Detections, batched_nms  # noqa: F401
from .roi_align import batched_roi_align_1x1, roi_align_1x1_single_level  # noqa: F401
