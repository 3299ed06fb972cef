"""YOLOv8 detection network (n/s/m/l/x) in Flax linen.

Second model family next to YOLO11 (models/yolo11.py): the reference's
engine accepts any ultralytics model spec in its 模型/权重路径 field
(reference: ui/pages/training.py:345, core/training.py:63), and v8 is the
family migrating users most commonly hold trained checkpoints for. Topology
follows the public YOLOv8 architecture: C2f CSP blocks (our C3k2 with
c3k=False and inner bottleneck expansion 1.0 — identical CSP structure),
SPPF, PAN head, and the legacy decoupled Detect head (plain 3x3 convs in the
cls branch, no C2PSA attention stage). Same TPU-first construction as
YOLO11: NHWC, bf16 compute / fp32 params, static shapes, reshape-broadcast
upsampling; TAL/DFL/NMS and the trainer are shared unchanged.

Scale table (depth, width, max_channels):
  n: (0.33, 0.25, 1024)  s: (0.33, 0.50, 1024)  m: (0.67, 0.75, 768)
  l: (1.00, 1.00, 512)   x: (1.00, 1.25, 512)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import C3k2, ConvBN, SPPF, upsample2x
from .yolo11 import DetectHead, _depth, _width

YOLOV8_SCALES: Dict[str, Tuple[float, float, int]] = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}


class YOLOv8(nn.Module):
    """Full YOLOv8 detector. Same output contract as YOLO11.__call__:
    per-level (box_dist [(B,H,W,64)], cls_logits [(B,H,W,nc)]) at strides
    8/16/32 — so loss, NMS, metrics, trainer, and serving paths are shared."""

    nc: int = 80
    scale: str = "n"
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # same heavy-block rematerialization lever as YOLO11

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth, width, max_ch = YOLOV8_SCALES[self.scale]
        w = lambda c: _width(c, width, max_ch)
        d = lambda n: _depth(n, depth)
        dt = self.dtype
        if self.remat and train:
            Block = nn.remat(C3k2, static_argnums=(2,))
            Sppf = nn.remat(SPPF, static_argnums=(2,))
            Head = nn.remat(DetectHead, static_argnums=(2,))
        else:
            Block, Sppf, Head = C3k2, SPPF, DetectHead

        def c2f(feats, n, shortcut, name):
            # C2f == C3k2 with plain Bottleneck inners at expansion 1.0
            return Block(
                feats, n, False, 0.5, shortcut, inner_e=1.0, dtype=dt, name=name
            )

        # Backbone
        x = ConvBN(w(64), 3, 2, dtype=dt, name="b0")(x, train)          # P1/2
        x = ConvBN(w(128), 3, 2, dtype=dt, name="b1")(x, train)         # P2/4
        x = c2f(w(128), d(3), True, "b2")(x, train)
        x = ConvBN(w(256), 3, 2, dtype=dt, name="b3")(x, train)         # P3/8
        p3 = c2f(w(256), d(6), True, "b4")(x, train)
        x = ConvBN(w(512), 3, 2, dtype=dt, name="b5")(p3, train)        # P4/16
        p4 = c2f(w(512), d(6), True, "b6")(x, train)
        x = ConvBN(w(1024), 3, 2, dtype=dt, name="b7")(p4, train)       # P5/32
        x = c2f(w(1024), d(3), True, "b8")(x, train)
        p5 = Sppf(w(1024), 5, dtype=dt, name="b9")(x, train)

        # Head (PAN)
        x = jnp.concatenate([upsample2x(p5), p4], axis=-1)
        h12 = c2f(w(512), d(3), False, "h12")(x, train)
        x = jnp.concatenate([upsample2x(h12), p3], axis=-1)
        h15 = c2f(w(256), d(3), False, "h15")(x, train)
        x = ConvBN(w(256), 3, 2, dtype=dt, name="h16")(h15, train)
        x = jnp.concatenate([x, h12], axis=-1)
        h18 = c2f(w(512), d(3), False, "h18")(x, train)
        x = ConvBN(w(512), 3, 2, dtype=dt, name="h19")(h18, train)
        x = jnp.concatenate([x, p5], axis=-1)
        h21 = c2f(w(1024), d(3), False, "h21")(x, train)

        ch = (w(256), w(512), w(1024))
        return Head(self.nc, ch, legacy=True, dtype=dt, name="detect")(
            (h15, h18, h21), train
        )
