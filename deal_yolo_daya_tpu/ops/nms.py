"""Batched fixed-shape NMS for TPU.

No dynamic shapes anywhere: candidates are pre-reduced with top_k, greedy
suppression runs as a lax.fori_loop of max_det steps (exact greedy NMS — each
step selects the best remaining box and suppresses its overlaps), outputs are
padded to max_det with a validity count. Class-aware via the coordinate-offset
trick. Replaces the torchvision NMS capability in the reference's dependency
stack (SURVEY §2.2).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import bbox_iou

MAX_WH = 7680.0


def _nms_single(
    boxes: jnp.ndarray,      # (A, 4) xyxy
    scores: jnp.ndarray,     # (A, nc)
    conf_thres: float,
    iou_thres: float,
    pre_topk: int,
    max_det: int,
    class_agnostic: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    num_anchors = boxes.shape[0]
    k = min(pre_topk, num_anchors)

    best_score = jnp.max(scores, axis=-1)
    best_cls = jnp.argmax(scores, axis=-1)
    valid = best_score >= conf_thres

    cand_scores, cand_idx = jax.lax.top_k(jnp.where(valid, best_score, -1.0), k)
    cand_boxes = boxes[cand_idx]
    cand_cls = best_cls[cand_idx]
    cand_valid = cand_scores > 0

    offset_boxes = cand_boxes
    if not class_agnostic:
        offset_boxes = cand_boxes + (cand_cls[:, None].astype(jnp.float32) * MAX_WH)

    def body(i, state):
        avail, out_boxes, out_scores, out_cls, n_det = state
        masked = jnp.where(avail, cand_scores, -1.0)
        j = jnp.argmax(masked)
        ok = masked[j] > 0
        sel_box = offset_boxes[j]
        iou = bbox_iou(sel_box[None, :], offset_boxes)
        suppress = iou > iou_thres
        avail = avail & ~(suppress & ok)
        avail = avail.at[j].set(False)
        out_boxes = out_boxes.at[i].set(jnp.where(ok, cand_boxes[j], 0.0))
        out_scores = out_scores.at[i].set(jnp.where(ok, cand_scores[j], 0.0))
        out_cls = out_cls.at[i].set(jnp.where(ok, cand_cls[j], -1))
        n_det = n_det + ok.astype(jnp.int32)
        return avail, out_boxes, out_scores, out_cls, n_det

    init = (
        cand_valid,
        jnp.zeros((max_det, 4), jnp.float32),
        jnp.zeros((max_det,), jnp.float32),
        jnp.full((max_det,), -1, jnp.int32),
        jnp.int32(0),
    )
    _, out_boxes, out_scores, out_cls, n_det = jax.lax.fori_loop(
        0, max_det, body, init
    )
    return out_boxes, out_scores, out_cls, n_det


@partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "pre_topk", "max_det", "class_agnostic"),
)
def batched_nms(
    boxes: jnp.ndarray,      # (B, A, 4) xyxy pixels
    scores: jnp.ndarray,     # (B, A, nc) sigmoid scores
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    pre_topk: int = 1000,
    max_det: int = 300,
    class_agnostic: bool = False,
):
    """Exact greedy NMS over a batch. Returns (boxes (B,max_det,4),
    scores (B,max_det), classes (B,max_det), num_det (B,))."""
    fn = partial(
        _nms_single,
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        pre_topk=pre_topk,
        max_det=max_det,
        class_agnostic=class_agnostic,
    )
    return jax.vmap(fn)(boxes.astype(jnp.float32), scores.astype(jnp.float32))
