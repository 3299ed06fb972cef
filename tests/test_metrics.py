"""mAP metric tests: perfect/partial/empty prediction scenarios."""

import numpy as np
import pytest

from deal_yolo_daya_tpu.train.metrics import (
    DetMetrics,
    compute_ap,
    confusion_matrix,
    iou_matrix,
    match_predictions,
)


def test_iou_matrix():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    m = iou_matrix(a, b)
    np.testing.assert_allclose(m, [[1.0, 0.0]], atol=1e-5)


def test_compute_ap_perfect():
    # ultralytics-exact: the appended (recall=1, precision=0) sentinel caps a
    # perfect single-prediction AP at 0.995 under 101-point interpolation
    assert compute_ap(np.array([1.0]), np.array([1.0])) == pytest.approx(0.995, abs=1e-6)


def test_perfect_predictions_map_one():
    m = DetMetrics(nc=2)
    gt_b = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
    gt_c = np.array([0, 1])
    m.update(gt_b.copy(), np.array([0.9, 0.8]), gt_c.copy(), gt_b, gt_c)
    res = m.compute()
    assert res["map50"] == pytest.approx(0.995, abs=1e-6)
    assert res["map"] == pytest.approx(0.995, abs=1e-6)
    assert res["precision"] == pytest.approx(1.0, abs=1e-6)
    assert res["recall"] == pytest.approx(1.0, abs=1e-6)


def test_wrong_class_is_fp():
    m = DetMetrics(nc=2)
    gt_b = np.array([[0, 0, 10, 10]], np.float32)
    m.update(gt_b.copy(), np.array([0.9]), np.array([1]), gt_b, np.array([0]))
    res = m.compute()
    assert res["map50"] == 0.0


def test_loose_box_counts_at_low_iou_only():
    m = DetMetrics(nc=1)
    gt_b = np.array([[0, 0, 10, 10]], np.float32)
    # IoU vs gt = 50/150 ≈ 0.33 -> no match even at 0.5
    pred_loose = np.array([[0, 0, 15, 10]], np.float32)  # IoU = 100/150*... = 2/3
    res_m = DetMetrics(nc=1)
    res_m.update(pred_loose, np.array([0.9]), np.array([0]), gt_b, np.array([0]))
    res = res_m.compute()
    assert res["map50"] > 0      # IoU 0.667 >= 0.5 matches
    assert res["map"] < res["map50"]  # but fails the strict thresholds


def test_no_predictions():
    m = DetMetrics(nc=1)
    m.update(
        np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0, np.int64),
        np.array([[0, 0, 10, 10]], np.float32), np.array([0]),
    )
    res = m.compute()
    assert res["map"] == 0.0


def test_duplicate_predictions_second_is_fp():
    m = DetMetrics(nc=1)
    gt_b = np.array([[0, 0, 10, 10]], np.float32)
    preds = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    m.update(preds, np.array([0.9, 0.8]), np.array([0, 0]), gt_b, np.array([0]))
    tp = m.tps[0]
    assert tp[0, 0] and not tp[1, 0]


def test_confusion_matrix_layout():
    gt_b = np.array([[0, 0, 10, 10]], np.float32)
    preds = [(gt_b, np.array([0.9]), np.array([0]))]
    gts = [(gt_b, np.array([1]))]
    cm = confusion_matrix(preds, gts, nc=2)
    assert cm[0, 1] == 1  # predicted 0, true 1
    # missed/fp: none
    assert cm.sum() == 1


def test_curves_shape_and_semantics():
    # two classes, one perfect pred each -> PR curve precision 1.0 until the
    # sentinel tail; F1 curve rises to its max at the prediction confidence
    m = DetMetrics(nc=3)
    gt_b = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
    gt_c = np.array([0, 2])
    m.update(gt_b.copy(), np.array([0.9, 0.6]), gt_c.copy(), gt_b, gt_c)
    res = m.compute()
    curves = res["curves"]
    assert curves["px"].shape == (1000,)
    # only GT-present classes get rows
    np.testing.assert_array_equal(curves["classes"], [0, 2])
    for key in ("py", "p", "r", "f1"):
        assert curves[key].shape == (2, 1000)
    # precision-over-recall: perfect detector => precision 1.0 at recall 0.5
    i_mid = 500
    assert curves["py"][0, i_mid] == pytest.approx(1.0)
    # recall-vs-confidence: 1.0 below the pred conf, 0.0 above it
    assert curves["r"][0, 100] == pytest.approx(1.0)   # conf 0.1 < 0.9
    assert curves["r"][0, 950] == pytest.approx(0.0)   # conf 0.95 > 0.9
    # f1 at low confidence = 1.0 for the perfect detector
    assert curves["f1"][0, 100] == pytest.approx(1.0, abs=1e-3)


def test_curve_and_gallery_artifacts(tmp_path):
    from deal_yolo_daya_tpu.train.artifacts import RunDir

    m = DetMetrics(nc=2)
    gt_b = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
    gt_c = np.array([0, 1])
    m.update(gt_b.copy(), np.array([0.9, 0.8]), gt_c.copy(), gt_b, gt_c)
    res = m.compute()

    run = RunDir(str(tmp_path), "train")
    run.plot_pr_curves(res, ["a", "b"])
    for f in ("PR_curve.png", "F1_curve.png", "P_curve.png", "R_curve.png"):
        assert (run.path / f).exists(), f

    imgs = np.full((2, 32, 32, 3), 128, np.uint8)
    boxes = np.array([[[2, 2, 20, 20]], [[4, 4, 28, 28]]], np.float32)
    scores = np.array([[0.9], [0.8]], np.float32)
    classes = np.zeros((2, 1), np.int32)
    nd = np.array([1, 1])
    run.save_val_batch_predictions(imgs, boxes, scores, classes, nd, ["a"], batch_idx=1)
    run.save_val_batch_predictions(imgs, boxes, None, classes, nd, ["a"], batch_idx=1)
    assert (run.path / "val_batch1_pred.jpg").exists()
    assert (run.path / "val_batch1_labels.jpg").exists()
