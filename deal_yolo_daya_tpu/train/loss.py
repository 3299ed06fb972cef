"""Detection loss: Task-Aligned Assignment + CIoU + DFL + BCE.

Fixed-shape JAX implementation of the v8/v11 detection loss family the
reference reaches through ultralytics (SURVEY §2.2). All dynamic selection is
mask-based (SURVEY §7 hard part (a)): the assigner does per-GT top-k with
scatter-built masks, conflict resolution by max-overlap, and score
normalization — no boolean indexing, so the whole loss jits and vmaps.

Conventions:
- pd_scores: (B, A, nc) raw logits; pd_dist: (B, A, 4*REG_MAX) DFL logits.
- gt boxes arrive padded (B, N, 4) xyxy pixels with (B, N) validity mask.
- Assignment runs in pixel space; box/DFL losses in feature-grid units.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox2dist, bbox_ciou, dist2bbox, make_anchors
from ..ops.decode import REG_MAX, dfl_expectation, flatten_levels


class LossConfig(NamedTuple):
    nc: int = 80
    box_gain: float = 7.5
    cls_gain: float = 0.5
    dfl_gain: float = 1.5
    tal_topk: int = 10
    tal_alpha: float = 0.5
    tal_beta: float = 6.0
    # ultralytics' v8DetectionLoss returns `loss.sum() * batch_size`, so its
    # gradient magnitude grows with batch size and lr0=0.01-style configs are
    # tuned against that. Our default keeps the total normalized by the
    # target-score sum only (batch-size invariant — better-behaved under DP
    # where the psum'd grad is already a global mean). Set batch_scale=True
    # to reproduce the ultralytics scale when transferring hyperparameters
    # 1:1 (docs/PARITY.md "Loss scale semantics").
    batch_scale: bool = False


def select_candidates_in_gts(
    anchor_xy: jnp.ndarray,  # (A, 2) pixel centers
    gt_bboxes: jnp.ndarray,  # (B, N, 4) xyxy pixels
    eps: float = 1e-9,
) -> jnp.ndarray:
    """(B, N, A) bool: anchor center strictly inside gt box."""
    lt = anchor_xy[None, None, :, :] - gt_bboxes[:, :, None, :2]
    rb = gt_bboxes[:, :, None, 2:4] - anchor_xy[None, None, :, :]
    return jnp.min(jnp.concatenate([lt, rb], axis=-1), axis=-1) > eps


def task_aligned_assign(
    pd_scores: jnp.ndarray,   # (B, A, nc) sigmoid probabilities
    pd_bboxes: jnp.ndarray,   # (B, A, 4) xyxy pixels (decoded, detached)
    anchor_xy: jnp.ndarray,   # (A, 2) pixel centers
    gt_labels: jnp.ndarray,   # (B, N) int
    gt_bboxes: jnp.ndarray,   # (B, N, 4) xyxy pixels
    mask_gt: jnp.ndarray,     # (B, N) bool
    nc: int,
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (target_bboxes (B,A,4) pixels, target_scores (B,A,nc),
    fg_mask (B,A) bool, target_gt_idx (B,A))."""
    b, n, _ = gt_bboxes.shape
    a = pd_bboxes.shape[1]

    # Alignment metric: cls-score^alpha * CIoU^beta per (gt, anchor).
    # The (B, N, A) metric tensors dominate loss-time HBM traffic; they are
    # ranking-only (inside stop_gradient), so compute them in bf16 — the same
    # precision the reference engine's AMP autocast gives its assigner.
    mdt = jnp.bfloat16
    # one-hot matmul instead of a gather: rides the MXU and avoids the
    # TPU-hostile dynamic-index path (same trick as _dfl_loss)
    gt_label_onehot = jax.nn.one_hot(
        jnp.clip(gt_labels, 0, nc - 1), nc, dtype=mdt
    )  # (B, N, nc)
    gt_label_scores = jnp.einsum(
        "bnc,bac->bna", gt_label_onehot, pd_scores.astype(mdt)
    )  # (B, N, A)
    overlaps = jnp.clip(
        bbox_ciou(
            gt_bboxes.astype(mdt)[:, :, None, :],
            pd_bboxes.astype(mdt)[:, None, :, :],
        ),
        0.0,
    )  # (B, N, A) bf16
    align_metric = (gt_label_scores ** alpha) * (overlaps ** beta)

    mask_in_gts = select_candidates_in_gts(anchor_xy, gt_bboxes)
    candidate_metric = jnp.where(mask_in_gts & mask_gt[:, :, None], align_metric, 0.0)

    # per-GT top-k candidates -> (B, N, A) mask.
    # Validity is PER GT, not per candidate: if the GT's best metric exceeds
    # eps, all its top-k candidates are kept even when their own metric is
    # ~0 — this is what bootstraps box learning at init, when scores are
    # prior-initialized tiny and metric = score^0.5 * overlap^6 ~ 1e-10.
    #
    # Only membership in the top-k matters here, never the order — so instead
    # of lax.top_k (a full 8400-sort per (b, gt): 2.5 ms/step = 5.6% of the
    # n b32 train step in the round-3 trace) plus an index scatter, take k
    # successive argmaxes and mark them in place. argmax breaks ties by
    # lowest index, exactly top_k's tie rule, so the selected SET is
    # identical; each pass is a VPU reduce + compare at HBM speed.
    anchor_iota = jnp.arange(a)
    work = candidate_metric
    gt_has_candidate = jnp.max(work, axis=-1, keepdims=True) > eps
    mask_topk = jnp.zeros((b, n, a), dtype=bool)
    for _ in range(topk):
        sel = anchor_iota[None, None, :] == jnp.argmax(work, axis=-1)[:, :, None]
        mask_topk |= sel
        work = jnp.where(sel, -1.0, work)
    mask_topk &= gt_has_candidate

    mask_pos = mask_topk & mask_in_gts & mask_gt[:, :, None]  # (B, N, A)

    # Conflict resolution: anchor claimed by several GTs -> GT with max overlap
    fg_counts = jnp.sum(mask_pos, axis=1)  # (B, A)
    max_overlap_gt = jnp.argmax(jnp.where(mask_pos, overlaps, -1.0), axis=1)  # (B, A)
    is_multi = fg_counts > 1
    single_gt = jnp.argmax(mask_pos, axis=1)  # (B, A)
    target_gt_idx = jnp.where(is_multi, max_overlap_gt, single_gt)
    fg_mask = fg_counts > 0

    # Rebuild a conflict-free positive mask; the same one-hot drives every
    # target gather below as an einsum over the small N axis (gathers with
    # per-anchor indices are the slow path on TPU)
    assign_onehot = jax.nn.one_hot(target_gt_idx, n, dtype=jnp.float32)  # (B, A, N)
    mask_pos = (
        assign_onehot.transpose(0, 2, 1) * fg_mask[:, None, :]
    ).astype(bool)  # (B, N, A)

    # Gather targets via the assignment one-hot
    target_bboxes = jnp.einsum("ban,bnd->bad", assign_onehot, gt_bboxes)  # (B, A, 4)
    target_scores = jnp.einsum(
        "ban,bnc->bac",
        assign_onehot,
        jax.nn.one_hot(jnp.clip(gt_labels, 0, nc - 1), nc, dtype=jnp.float32),
    )  # (B, A, nc)
    target_scores = target_scores * fg_mask[:, :, None]

    # Normalize: per-GT max align metric -> scale one-hot scores
    align_metric = align_metric * mask_pos
    pos_align = jnp.max(align_metric, axis=-1, keepdims=True)          # (B, N, 1)
    pos_overlap = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)  # (B, N, 1)
    norm_align = jnp.max(
        align_metric * pos_overlap / (pos_align + eps), axis=1
    )  # (B, A)
    target_scores = target_scores * norm_align[:, :, None]

    return target_bboxes, target_scores, fg_mask, target_gt_idx


def _bce_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with logits (stable). Runs in the
    logits' dtype (bf16 under amp); callers accumulate the sum in f32."""
    targets = targets.astype(logits.dtype)
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _dfl_loss(pd_dist: jnp.ndarray, target_dist: jnp.ndarray) -> jnp.ndarray:
    """Distribution focal loss: CE against the two integer bins bracketing the
    target, linearly weighted. pd_dist (..., 4, REG_MAX), target (..., 4).

    Formulated as -sum(logp * two_hot(target)): per-element gathers along the
    lane (minor) dimension are pathological on TPU — take_along_axis here
    measured 37 ms/step of a 106 ms train step (b32@640); the two-hot
    elementwise form fuses into the softmax and costs ~nothing.
    """
    tl = jnp.floor(target_dist)
    wr = target_dist - tl
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(pd_dist.astype(jnp.float32), axis=-1)
    bins = jnp.arange(REG_MAX, dtype=target_dist.dtype)
    left = jnp.clip(tl, 0, REG_MAX - 1)[..., None]
    right = jnp.clip(tl + 1, 0, REG_MAX - 1)[..., None]
    two_hot = (bins == left) * wl[..., None] + (bins == right) * wr[..., None]
    ce = -jnp.sum(logp * two_hot, axis=-1)
    return jnp.mean(ce, axis=-1)  # mean over the 4 sides


def detection_loss(
    box_levels,
    cls_levels,
    gt_labels: jnp.ndarray,   # (B, N)
    gt_bboxes: jnp.ndarray,   # (B, N, 4) xyxy pixels
    gt_mask: jnp.ndarray,     # (B, N) bool
    imgsz: Tuple[int, int],
    config: LossConfig = LossConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total detection loss + per-component breakdown (box/cls/dfl, the
    results.csv column contract)."""
    pd_dist, pd_scores = flatten_levels(box_levels, cls_levels)  # (B,A,64),(B,A,nc)
    pd_dist = pd_dist.astype(jnp.float32)
    # pd_scores stays in model dtype (bf16 under amp): BCE is elementwise with
    # f32 accumulation; the (B, A, nc) tensor dominates loss bandwidth
    anchor_points, stride_per = make_anchors(imgsz)  # grid units, (A,1)
    anchor_xy_px = anchor_points * stride_per

    # Decode predicted boxes (grid units), detach for assignment in pixels
    dist_exp = dfl_expectation(pd_dist)  # (B, A, 4)
    pd_bboxes_grid = dist2bbox(dist_exp, anchor_points[None])
    pd_bboxes_px = jax.lax.stop_gradient(pd_bboxes_grid * stride_per[None])

    target_bboxes_px, target_scores, fg_mask, _ = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pd_scores)),
        pd_bboxes_px,
        anchor_xy_px,
        gt_labels,
        gt_bboxes,
        gt_mask,
        nc=config.nc,
        topk=config.tal_topk,
        alpha=config.tal_alpha,
        beta=config.tal_beta,
    )

    target_scores_sum = jnp.maximum(jnp.sum(target_scores), 1.0)

    # Classification: BCE over all anchors/classes
    cls_loss = (
        jnp.sum(_bce_logits(pd_scores, target_scores), dtype=jnp.float32)
        / target_scores_sum
    )

    # Box: CIoU on foreground, weighted by assigned score mass
    target_bboxes_grid = target_bboxes_px / stride_per[None]
    weight = jnp.sum(target_scores, axis=-1) * fg_mask  # (B, A)
    ciou = bbox_ciou(pd_bboxes_grid, target_bboxes_grid)  # (B, A)
    box_loss = jnp.sum((1.0 - ciou) * weight) / target_scores_sum

    # DFL on foreground
    target_dist = bbox2dist(target_bboxes_grid, anchor_points[None], REG_MAX)  # (B,A,4)
    dfl = _dfl_loss(
        pd_dist.reshape(*pd_dist.shape[:-1], 4, REG_MAX), target_dist
    )  # (B, A)
    dfl_loss = jnp.sum(dfl * weight) / target_scores_sum

    total = (
        config.box_gain * box_loss
        + config.cls_gain * cls_loss
        + config.dfl_gain * dfl_loss
    )
    if config.batch_scale:
        total = total * pd_scores.shape[0]
    return total, {
        "box_loss": box_loss,
        "cls_loss": cls_loss,
        "dfl_loss": dfl_loss,
        "num_fg": jnp.sum(fg_mask.astype(jnp.float32)),
    }
