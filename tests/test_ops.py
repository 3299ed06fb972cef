"""Ops tests: box math, anchors, decode, letterbox, NMS."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_yolo_daya_tpu.ops import (
    batched_nms,
    bbox_ciou,
    bbox_iou,
    box_iou_matrix,
    bbox2dist,
    dist2bbox,
    dfl_expectation,
    letterbox_batch,
    letterbox_params,
    make_anchors,
    xywh2xyxy,
    xyxy2xywh,
)


def test_xywh_xyxy_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0, 100, (32, 4)), jnp.float32)
    np.testing.assert_allclose(xyxy2xywh(xywh2xyxy(x)), x, atol=1e-4)


def test_iou_basic():
    a = jnp.array([[0, 0, 10, 10]], jnp.float32)
    b = jnp.array([[5, 5, 15, 15]], jnp.float32)
    iou = bbox_iou(a, b)
    np.testing.assert_allclose(iou, [25 / 175], atol=1e-6)
    np.testing.assert_allclose(bbox_iou(a, a), [1.0], atol=1e-5)


def test_ciou_bounds_and_identity():
    a = jnp.array([[0, 0, 10, 10]], jnp.float32)
    assert float(bbox_ciou(a, a)[0]) == pytest.approx(1.0, abs=1e-5)
    far = jnp.array([[100, 100, 110, 110]], jnp.float32)
    # disjoint boxes: CIoU < 0 (center distance penalty)
    assert float(bbox_ciou(a, far)[0]) < 0


def test_make_anchors():
    pts, strides = make_anchors((64, 64))
    assert pts.shape == (8 * 8 + 4 * 4 + 2 * 2, 2)
    np.testing.assert_allclose(pts[0], [0.5, 0.5])
    assert float(strides[0, 0]) == 8.0
    assert float(strides[-1, 0]) == 32.0


def test_dist2bbox_bbox2dist_roundtrip():
    pts, _ = make_anchors((64, 64))
    dist = jnp.asarray(np.random.default_rng(0).uniform(0.5, 3, (pts.shape[0], 4)), jnp.float32)
    boxes = dist2bbox(dist, pts)
    back = bbox2dist(boxes, pts, 16)
    np.testing.assert_allclose(back, dist, atol=1e-4)


def test_dfl_expectation_peaky_logits():
    logits = np.full((1, 4, 16), -20.0, np.float32)
    logits[0, :, 5] = 20.0  # delta at bin 5
    out = dfl_expectation(jnp.asarray(logits.reshape(1, 64)))
    np.testing.assert_allclose(out, [[5, 5, 5, 5]], atol=1e-3)


def test_letterbox_params():
    r, px, py = letterbox_params(480, 640, 640)
    assert r == 1.0
    assert (px, py) == (0, 80)


def test_letterbox_batch_content_and_fill():
    img = np.zeros((2, 100, 200, 3), np.float32)
    img[:, :, :, 0] = 255.0
    r, px, py = letterbox_params(100, 200, 64)
    out = letterbox_batch(
        jnp.asarray(img),
        jnp.full((2,), r, jnp.float32),
        jnp.asarray([[px, py]] * 2, jnp.float32),
        64,
    )
    assert out.shape == (2, 64, 64, 3)
    # center has content (red), top band has fill 114
    assert float(out[0, 32, 32, 0]) == pytest.approx(255.0, abs=1.0)
    assert float(out[0, 0, 32, 0]) == pytest.approx(114.0)
    assert float(out[0, 0, 32, 1]) == pytest.approx(114.0)


def test_nms_suppresses_overlaps_keeps_distinct():
    boxes = jnp.asarray(
        [[[0, 0, 10, 10], [0.5, 0.5, 10.5, 10.5], [50, 50, 60, 60], [0, 0, 0, 0]]],
        jnp.float32,
    )
    scores = np.zeros((1, 4, 2), np.float32)
    scores[0, 0, 0] = 0.9   # box A cls 0
    scores[0, 1, 0] = 0.8   # overlaps A, same class -> suppressed
    scores[0, 2, 1] = 0.7   # distinct
    ob, osc, ocl, nd = batched_nms(
        boxes, jnp.asarray(scores), conf_thres=0.25, iou_thres=0.5, pre_topk=4, max_det=4
    )
    assert int(nd[0]) == 2
    np.testing.assert_allclose(osc[0, :2], [0.9, 0.7], atol=1e-6)
    assert ocl[0, :2].tolist() == [0, 1]
    np.testing.assert_allclose(ob[0, 0], [0, 0, 10, 10], atol=1e-5)


def test_nms_class_aware_vs_agnostic():
    # identical boxes, different classes: kept when class-aware, merged when agnostic
    boxes = jnp.asarray([[[0, 0, 10, 10], [0, 0, 10, 10]]], jnp.float32)
    scores = np.zeros((1, 2, 2), np.float32)
    scores[0, 0, 0] = 0.9
    scores[0, 1, 1] = 0.8
    _, _, _, nd_aware = batched_nms(boxes, jnp.asarray(scores), pre_topk=2, max_det=2)
    _, _, _, nd_agn = batched_nms(
        boxes, jnp.asarray(scores), pre_topk=2, max_det=2, class_agnostic=True
    )
    assert int(nd_aware[0]) == 2
    assert int(nd_agn[0]) == 1


def test_nms_greedy_cascade_exactness():
    # B overlaps A (suppressed); C overlaps B but not A -> exact greedy keeps C
    boxes = jnp.asarray(
        [[[0, 0, 10, 10], [4, 0, 14, 10], [8, 0, 18, 10]]], jnp.float32
    )
    scores = np.zeros((1, 3, 1), np.float32)
    scores[0, :, 0] = [0.9, 0.8, 0.7]
    ob, osc, ocl, nd = batched_nms(
        boxes, jnp.asarray(scores), conf_thres=0.1, iou_thres=0.4, pre_topk=3, max_det=3
    )
    assert int(nd[0]) == 2
    np.testing.assert_allclose(osc[0, :2], [0.9, 0.7], atol=1e-6)


def test_nms_pallas_suppress_parity():
    # fused VMEM kernel (interpret mode on CPU) must match the XLA solve
    # bit-for-bit on a dense random scene, including cascades and padding
    rng = np.random.default_rng(7)
    B, A = 2, 256
    cx = rng.uniform(20, 200, (B, A))
    cy = rng.uniform(20, 200, (B, A))
    w = rng.uniform(4, 60, (B, A))
    h = rng.uniform(4, 60, (B, A))
    boxes = jnp.asarray(
        np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1), jnp.float32
    )
    scores = jnp.asarray(rng.uniform(0, 1, (B, A, 3)).astype(np.float32))
    ref = batched_nms(boxes, scores, 0.3, 0.45, pre_topk=128, use_pallas=False)
    got = batched_nms(boxes, scores, 0.3, 0.45, pre_topk=128, use_pallas=True)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_letterbox_border_replication():
    # upscaling: the first content pixel must replicate the border, not blend
    # toward the second source pixel
    img = np.zeros((1, 4, 4, 3), np.float32)
    img[0, :, 0] = 100.0   # first column distinct
    img[0, :, 1:] = 200.0
    out = letterbox_batch(
        jnp.asarray(img), jnp.asarray([4.0]), jnp.asarray([[0.0, 0.0]]), 16
    )
    # output x=0 maps to src_x=(0.5)/4-0.5=-0.375 -> pure border pixel
    assert float(out[0, 8, 0, 0]) == pytest.approx(100.0, abs=0.5)
