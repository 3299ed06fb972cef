"""Box geometry ops (model side): IoU/CIoU, coordinate transforms, anchors.

All functions are shape-polymorphic jnp ops designed for vmap/jit — no Python
branches on data. Replaces capability reached via torchvision/ultralytics ops
in the reference's dependency stack (SURVEY §2.2).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh / 2
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    lt, rb = x[..., :2], x[..., 2:4]
    return jnp.concatenate([(lt + rb) / 2, rb - lt], axis=-1)


def bbox_iou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise IoU of xyxy boxes (broadcasting)."""
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area1 = (box1[..., 2] - box1[..., 0]) * (box1[..., 3] - box1[..., 1])
    area2 = (box2[..., 2] - box2[..., 0]) * (box2[..., 3] - box2[..., 1])
    return inter / (area1 + area2 - inter + eps)


def bbox_ciou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete-IoU (elementwise, broadcasting): IoU - center-dist/diag - alpha*v."""
    iou = bbox_iou(box1, box2, eps)
    cw = jnp.maximum(box1[..., 2], box2[..., 2]) - jnp.minimum(box1[..., 0], box2[..., 0])
    ch = jnp.maximum(box1[..., 3], box2[..., 3]) - jnp.minimum(box1[..., 1], box2[..., 1])
    c2 = cw**2 + ch**2 + eps
    b1c = (box1[..., :2] + box1[..., 2:4]) / 2
    b2c = (box2[..., :2] + box2[..., 2:4]) / 2
    rho2 = jnp.sum((b2c - b1c) ** 2, axis=-1)
    # Aspect term in f32 regardless of input dtype: near perfect overlap
    # (iou -> 1, v -> 0) the alpha denominator v - iou + 1 underflows to 0 in
    # bf16 (spacing ~0.004 around 1), which would rank perfect anchors last.
    f32 = jnp.float32
    w1 = (box1[..., 2] - box1[..., 0]).astype(f32)
    h1 = (box1[..., 3] - box1[..., 1]).astype(f32)
    w2 = (box2[..., 2] - box2[..., 0]).astype(f32)
    h2 = (box2[..., 3] - box2[..., 1]).astype(f32)
    v = (4 / math.pi**2) * (
        jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))
    ) ** 2
    iou_f = iou.astype(f32)
    # alpha is a constant trade-off coefficient (no gradient)
    alpha = jax.lax.stop_gradient(v / jnp.maximum(v - iou_f + (1 + eps), eps))
    return iou - (rho2 / c2 + (alpha * v).astype(iou.dtype))


def box_iou_matrix(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """(N,4) x (M,4) xyxy -> (N,M) IoU."""
    return bbox_iou(a[:, None, :], b[None, :, :], eps)


def make_anchors(
    imgsz: Tuple[int, int],
    strides: Sequence[int] = (8, 16, 32),
    offset: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor centers (in feature-grid units scaled by stride later) for each
    level. Returns (anchor_points (A,2) in grid units, stride_per_anchor (A,1))."""
    h, w = imgsz
    points: List[jnp.ndarray] = []
    stride_arr: List[jnp.ndarray] = []
    for s in strides:
        fh, fw = h // s, w // s
        ys = (jnp.arange(fh, dtype=jnp.float32) + offset)
        xs = (jnp.arange(fw, dtype=jnp.float32) + offset)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        points.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        stride_arr.append(jnp.full((fh * fw, 1), float(s), jnp.float32))
    return jnp.concatenate(points, axis=0), jnp.concatenate(stride_arr, axis=0)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray, xywh: bool = False) -> jnp.ndarray:
    """(l,t,r,b) distances from anchor centers -> boxes (grid units)."""
    lt, rb = distance[..., :2], distance[..., 2:4]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(bbox: jnp.ndarray, anchor_points: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """xyxy (grid units) -> clamped (l,t,r,b) distances for DFL targets."""
    x1y1, x2y2 = bbox[..., :2], bbox[..., 2:4]
    dist = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return jnp.clip(dist, 0, reg_max - 1 - 0.01)
