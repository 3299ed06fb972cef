"""Flax YOLO11 model zoo (n/s/m/l/x).

From-scratch TPU-native implementation of the YOLO11 detection architecture
whose capability the reference reaches only through the ultralytics dependency
(reference: core/training.py:63-64, default model
ultralytics/cfg/models/11/yolo11.yaml at ui/pages/training.py:345).
"""

from .yolo11 import YOLO11, YOLO11_SCALES, build_yolo11  # noqa: F401
from .yolov8 import YOLOv8, YOLOV8_SCALES  # noqa: F401
from .yolov12 import YOLOv12, YOLOV12_SCALES  # noqa: F401
from .registry import build_detector, make_detector, parse_model_spec  # noqa: F401
from .torch_import import (  # noqa: F401
    export_state_dict,
    import_state_dict,
    infer_arch,
    read_torch_checkpoint,
)
