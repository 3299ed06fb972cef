"""Head-output decoding: DFL expectation + anchor decode to pixel boxes.

Fixed-shape, jit-friendly: each level's (B,H,W,64)+(B,H,W,nc) maps are
flattened and concatenated to (B, A, ...) with A = sum(H_i*W_i) known at
trace time.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .boxes import dist2bbox, make_anchors

REG_MAX = 16


def dfl_expectation(box_dist: jnp.ndarray) -> jnp.ndarray:
    """(..., 4*REG_MAX) logits -> (..., 4) expected l,t,r,b distances."""
    shape = box_dist.shape[:-1]
    logits = box_dist.reshape(*shape, 4, REG_MAX)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    return jnp.sum(probs * bins, axis=-1)


def flatten_levels(
    box_levels: Sequence[jnp.ndarray], cls_levels: Sequence[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-level NHWC maps -> (B, A, 4*REG_MAX), (B, A, nc)."""
    b = box_levels[0].shape[0]
    box = jnp.concatenate(
        [x.reshape(b, -1, x.shape[-1]) for x in box_levels], axis=1
    )
    cls = jnp.concatenate(
        [x.reshape(b, -1, x.shape[-1]) for x in cls_levels], axis=1
    )
    return box, cls


def decode_predictions(
    box_levels: Sequence[jnp.ndarray],
    cls_levels: Sequence[jnp.ndarray],
    imgsz: Tuple[int, int],
    strides: Sequence[int] = (8, 16, 32),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw head outputs -> (boxes_xyxy_pixels (B,A,4), scores (B,A,nc) sigmoid)."""
    box, cls = flatten_levels(box_levels, cls_levels)
    anchor_points, stride_per = make_anchors(imgsz, strides)
    dist = dfl_expectation(box)
    boxes = dist2bbox(dist, anchor_points[None], xywh=False) * stride_per[None]
    scores = jax.nn.sigmoid(cls.astype(jnp.float32))
    return boxes, scores
