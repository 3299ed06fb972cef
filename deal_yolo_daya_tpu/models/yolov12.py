"""YOLOv12 detection network (n/s/m/l/x) in Flax linen.

Third model family next to YOLO11/YOLOv8: the reference's engine accepts any
ultralytics model spec in its 模型/权重路径 field (reference:
ui/pages/training.py:345, core/training.py:63), and its pinned ultralytics
8.4.18 ships YOLO12. Topology follows the public attention-centric YOLOv12
architecture: C3k2 early backbone, A2C2f (R-ELAN with area attention) at
P4/P5 and through the PAN head, no SPPF/C2PSA, and the same decoupled
DFL Detect head as YOLO11 — so TAL/DFL/NMS, the trainer, serving, and int8
paths are shared unchanged.

TPU-first notes: area attention is batched softmax attention over
(N/area)-token chunks. At inference on TPU it runs as a fused VMEM-resident
Pallas kernel (ops/pallas/area_attention.py — the round-5 trace showed the
einsum formulation HBM-bound at 77% of roofline, scores bouncing through
HBM; the kernel halves device bytes, +33-48% e2e); training keeps the
einsum path for XLA autodiff. NHWC, bf16 compute / fp32 params, static
shapes; the `area` chunking is a pure reshape.

Scale table (depth, width, max_channels):
  n: (0.50, 0.25, 1024)  s: (0.50, 0.50, 1024)  m: (0.50, 1.00, 512)
  l: (1.00, 1.00, 512)   x: (1.00, 1.50, 512)
m/l/x use C3k inners in every C3k2; l/x add the learned-gamma residual to
every attention A2C2f and drop its MLP ratio to 1.2 (the public l/x config).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import A2C2f, C3k2, ConvBN, upsample2x
from .yolo11 import DetectHead, _depth, _width

YOLOV12_SCALES: Dict[str, Tuple[float, float, int]] = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}


class YOLOv12(nn.Module):
    """Full YOLOv12 detector. Same output contract as YOLO11.__call__:
    per-level (box_dist [(B,H,W,64)], cls_logits [(B,H,W,nc)]) at strides
    8/16/32 — loss, NMS, metrics, trainer, and serving paths are shared."""

    nc: int = 80
    scale: str = "n"
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # same heavy-block rematerialization lever as YOLO11

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth, width, max_ch = YOLOV12_SCALES[self.scale]
        c3k_all = self.scale in ("m", "l", "x")
        res = self.scale in ("l", "x")          # gamma residual on attention
        mlp = 1.2 if res else 2.0               # stages (public l/x config)
        w = lambda c: _width(c, width, max_ch)
        d = lambda n: _depth(n, depth)
        dt = self.dtype
        if self.remat and train:
            Block = nn.remat(C3k2, static_argnums=(2,))
            A2 = nn.remat(A2C2f, static_argnums=(2,))
            Head = nn.remat(DetectHead, static_argnums=(2,))
        else:
            Block, A2, Head = C3k2, A2C2f, DetectHead

        def a2c2f(feats, n, a2, area, name):
            return A2(
                feats, n, a2, area, residual=res, mlp_ratio=mlp,
                dtype=dt, name=name,
            )

        # Backbone
        x = ConvBN(w(64), 3, 2, dtype=dt, name="b0")(x, train)          # P1/2
        x = ConvBN(w(128), 3, 2, dtype=dt, name="b1")(x, train)         # P2/4
        x = Block(w(256), d(2), c3k_all, 0.25, dtype=dt, name="b2")(x, train)
        x = ConvBN(w(256), 3, 2, dtype=dt, name="b3")(x, train)         # P3/8
        p3 = Block(w(512), d(2), c3k_all, 0.25, dtype=dt, name="b4")(x, train)
        x = ConvBN(w(512), 3, 2, dtype=dt, name="b5")(p3, train)        # P4/16
        p4 = a2c2f(w(512), d(4), True, 4, "b6")(x, train)
        x = ConvBN(w(1024), 3, 2, dtype=dt, name="b7")(p4, train)       # P5/32
        p5 = a2c2f(w(1024), d(4), True, 1, "b8")(x, train)

        # Head (PAN; indices follow the public yolo12 module list)
        x = jnp.concatenate([upsample2x(p5), p4], axis=-1)
        h11 = a2c2f(w(512), d(2), False, 1, "h11")(x, train)
        x = jnp.concatenate([upsample2x(h11), p3], axis=-1)
        h14 = a2c2f(w(256), d(2), False, 1, "h14")(x, train)
        x = ConvBN(w(256), 3, 2, dtype=dt, name="h15")(h14, train)
        x = jnp.concatenate([x, h11], axis=-1)
        h17 = a2c2f(w(512), d(2), False, 1, "h17")(x, train)
        x = ConvBN(w(512), 3, 2, dtype=dt, name="h18")(h17, train)
        x = jnp.concatenate([x, p5], axis=-1)
        h20 = Block(w(1024), d(2), True, 0.5, dtype=dt, name="h20")(x, train)

        ch = (w(256), w(512), w(1024))
        return Head(self.nc, ch, dtype=dt, name="detect")(
            (h14, h17, h20), train
        )
