"""TPU compute ops: box geometry, DFL decode, letterbox, batched NMS."""

from .boxes import (  # noqa: F401
    bbox_iou,
    bbox_ciou,
    box_iou_matrix,
    dist2bbox,
    bbox2dist,
    make_anchors,
    xywh2xyxy,
    xyxy2xywh,
)
from .decode import decode_predictions, dfl_expectation  # noqa: F401
from .letterbox import letterbox_batch, letterbox_params  # noqa: F401
from .nms import batched_nms  # noqa: F401
