from .boxes import box_iou, xywh2xyxy, xyxy2xywh, box_area  # noqa: F401
from .nms import Detections, batched_nms, suppress_and_select  # noqa: F401
from .fused_detect import FusedDetections, fused_detect  # noqa: F401
from .roi_align import batched_roi_align_1x1, roi_align_1x1_single_level  # noqa: F401
