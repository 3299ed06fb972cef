"""Model-family registry: spec string -> detector module.

The reference's training page passes a free-form ultralytics model spec
(reference: ui/pages/training.py:345 default
"ultralytics/cfg/models/11/yolo11.yaml"; any family ultralytics ships is
accepted by core/training.py:63). Here the supported families are YOLO11
(default), YOLOv8, and YOLOv12, all emitting the identical per-level head
contract, so every downstream stage (loss, trainer, NMS, metrics, serving,
int8) is family-agnostic.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp

from .yolo11 import YOLO11, YOLO11_SCALES
from .yolov8 import YOLOv8, YOLOV8_SCALES
from .yolov12 import YOLOv12, YOLOV12_SCALES

FAMILIES = {
    "yolo11": (YOLO11, YOLO11_SCALES),
    "yolov8": (YOLOv8, YOLOV8_SCALES),
    "yolo12": (YOLOv12, YOLOV12_SCALES),
}


def parse_model_spec(model: str) -> Tuple[str, str]:
    """'yolo11n' | 'yolov8s.yaml' | '.../yolo12x.yaml' -> (family, scale).

    Unknown specs default to ('yolo11', 'n') — the reference UI default.
    """
    stem = Path(str(model)).stem.lower()
    if "yolov12" in stem or "yolo12" in stem:
        family = "yolo12"
    elif "yolov8" in stem or "yolo8" in stem:
        family = "yolov8"
    else:
        family = "yolo11"
    if stem in set("nsmlx"):  # bare scale letter (defaults family)
        return family, stem
    if "yolo" in stem:  # scale letter only trusted on a yolo-looking spec
        for s in "nsmlx":
            if stem.endswith(s):
                return family, s
    return family, "n"


def infer_arch_from_tree(params) -> Tuple[str, str]:
    """(family, scale) from a checkpoint's parameter tree.

    Family: the first PAN stage's module index is family-unique (YOLOv12's
    head starts at h11, YOLO11 has the C2PSA stage b10, YOLOv8's head starts
    at h12). Scale: stem width; m/l pairs that share width are split by
    backbone depth (l has 2 inner modules in b2). Mirrors
    torch_import.infer_arch, which does the same over ultralytics keys.
    """
    if "h11" in params:
        family = "yolo12"
    elif "b10" in params:
        family = "yolo11"
    else:
        family = "yolov8"
    stem = int(jnp.shape(params["b0"]["conv"]["kernel"])[-1])
    if family == "yolov8":
        by_stem = {16: "n", 32: "s", 48: "m", 64: "l", 80: "x"}
    else:  # yolo11 and yolo12 share the width/depth scale table
        by_stem = {16: "n", 32: "s", 96: "x",
                   64: "l" if "m1" in params["b2"] else "m"}
    if stem not in by_stem:
        raise ValueError(f"unrecognized {family} stem width {stem}")
    return family, by_stem[stem]


def make_detector(family: str, scale: str, nc: int,
                  dtype=jnp.float32, remat: bool = False):
    """Instantiate the (un-initialized) detector module."""
    cls, scales = FAMILIES[family]
    if scale not in scales:
        raise ValueError(f"{family} has no scale '{scale}'")
    return cls(nc=nc, scale=scale, dtype=dtype, remat=remat)


def build_detector(
    model_spec: str = "yolo11n",
    nc: int = 80,
    imgsz: int = 640,
    dtype=jnp.float32,
    seed: int = 0,
):
    """Create model + jit-init variables for any registered family/scale.

    Jitted init for the same reason as build_yolo11: one compiled program
    instead of thousands of eager ops through a tunneled backend.
    """
    family, scale = parse_model_spec(model_spec)
    model = make_detector(family, scale, nc, dtype=dtype)
    dummy = jnp.zeros((1, imgsz, imgsz, 3), dtype)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(seed), dummy
    )
    return model, variables
