"""Vectorized box math for the annotation pipeline.

The reference's IoU quality filter runs an O(rows x boxes^2) pure-Python loop
(reference: core/processor.py:368-376). Here rows are packed into padded
fixed-shape arrays (rows, MAX_BOXES, 4) + validity mask and the pairwise-IoU
"hit" decision is one jitted JAX op, vmapped over rows and chunked so
million-row tables stream through device memory.
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def pack_boxes(
    box_lists: Sequence[Sequence[Tuple[float, float, float, float]]],
    max_boxes: int | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack ragged per-row box lists into (N, M, 4) float32 + (N, M) bool mask."""
    n = len(box_lists)
    if max_boxes is None:
        max_boxes = max((len(b) for b in box_lists), default=0)
    max_boxes = max(max_boxes, 1)
    boxes = np.zeros((n, max_boxes, 4), dtype=np.float32)
    mask = np.zeros((n, max_boxes), dtype=bool)
    for i, row in enumerate(box_lists):
        m = min(len(row), max_boxes)
        if m:
            boxes[i, :m] = np.asarray(row[:m], dtype=np.float32)
            mask[i, :m] = True
    return boxes, mask


def pairwise_iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """(M, 4) xyxy -> (M, M) IoU with the reference's exact edge semantics:
    zero intersection -> 0, zero union -> 0."""
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.maximum(0.0, x2 - x1) * jnp.maximum(0.0, y2 - y1)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = area[:, None] + area[None, :] - inter
    safe_union = jnp.where(union != 0, union, 1.0)
    iou = jnp.where((inter > 0) & (union != 0), inter / safe_union, 0.0)
    return iou


def _row_hit(boxes: jnp.ndarray, mask: jnp.ndarray, min_boxes: int, thr: float) -> jnp.ndarray:
    """True if the row has >= min_boxes valid boxes and any distinct valid
    pair with IoU >= thr."""
    count = jnp.sum(mask)
    iou = pairwise_iou_matrix(boxes)
    m = boxes.shape[0]
    pair_mask = mask[:, None] & mask[None, :] & ~jnp.eye(m, dtype=bool)
    any_high = jnp.any(pair_mask & (iou >= thr))
    return (count >= min_boxes) & any_high


@partial(jax.jit, static_argnames=("min_boxes",))
def _hits_batch(boxes: jnp.ndarray, mask: jnp.ndarray, min_boxes: int, thr: jnp.ndarray) -> jnp.ndarray:
    return jax.vmap(lambda b, m: _row_hit(b, m, min_boxes, thr))(boxes, mask)


def _high_iou_hits_numpy(
    boxes: np.ndarray, mask: np.ndarray, min_boxes: int, thr: float, chunk: int = 4096
) -> np.ndarray:
    """Vectorized host implementation (same semantics as the device path)."""
    n, m, _ = boxes.shape
    out = np.zeros((n,), bool)
    eye = np.eye(m, dtype=bool)
    for s in range(0, n, chunk):
        b = boxes[s : s + chunk]
        mk = mask[s : s + chunk]
        x1 = np.maximum(b[:, :, None, 0], b[:, None, :, 0])
        y1 = np.maximum(b[:, :, None, 1], b[:, None, :, 1])
        x2 = np.minimum(b[:, :, None, 2], b[:, None, :, 2])
        y2 = np.minimum(b[:, :, None, 3], b[:, None, :, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area = (b[:, :, 2] - b[:, :, 0]) * (b[:, :, 3] - b[:, :, 1])
        union = area[:, :, None] + area[:, None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = np.where((inter > 0) & (union != 0), inter / np.where(union != 0, union, 1), 0.0)
        pair = mk[:, :, None] & mk[:, None, :] & ~eye
        hit = (mk.sum(1) >= min_boxes) & np.any(pair & (iou >= thr), axis=(1, 2))
        out[s : s + len(b)] = hit
    return out


# Measured round 2 (bench_datakit): after trimming the packed width to the
# table's real max box count, the vectorized numpy path does 40k rows in
# 0.02 s while the jitted path pays a 412 s (!) XLA:CPU compile for 0.26 s
# warm runs — and on the axon backend it adds tunnel transfers. Host numpy
# is therefore the default at every size; the device path stays available
# for genuinely huge packed widths via DYD_IOU_JAX_MIN_ROWS.
JAX_MIN_ROWS = int(os.environ.get("DYD_IOU_JAX_MIN_ROWS", 10**9))


def high_iou_hits(
    boxes: np.ndarray,
    mask: np.ndarray,
    min_boxes: int = 2,
    iou_threshold: float = 0.98,
    chunk: int = 8192,
) -> np.ndarray:
    """Per-row hit flags for the IoU quality filter.

    Large tables stream through the jitted device kernel in fixed-size
    chunks (the million-row on-device path); small tables take the
    vectorized numpy path, which beats paying an XLA compile.
    """
    n = boxes.shape[0]
    if n == 0:
        return np.zeros((0,), dtype=bool)
    if n < JAX_MIN_ROWS:
        return _high_iou_hits_numpy(boxes, mask, min_boxes, iou_threshold)
    out = np.zeros((n,), dtype=bool)
    thr = jnp.float32(iou_threshold)
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        b = boxes[start:end]
        m = mask[start:end]
        if end - start < chunk and n > chunk:
            pad = chunk - (end - start)
            b = np.concatenate([b, np.zeros((pad,) + b.shape[1:], b.dtype)])
            m = np.concatenate([m, np.zeros((pad,) + m.shape[1:], m.dtype)])
        res = np.asarray(_hits_batch(jnp.asarray(b), jnp.asarray(m), min_boxes, thr))
        out[start:end] = res[: end - start]
    return out
