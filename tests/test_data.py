"""Input-pipeline tests: dataset indexing, augmentation, batch shapes."""

from pathlib import Path

import numpy as np
import pytest
import yaml

from deal_yolo_daya_tpu.train.augment import AugmentConfig, hsv_jitter, mosaic4, random_affine
from deal_yolo_daya_tpu.train.data import DataLoader, Prefetcher, YoloDataset


def make_dataset(tmp_path, n_train=8, n_val=4, imgsz=64, nc=2):
    """Synthetic YOLO-layout dataset: solid background + colored box objects."""
    import cv2

    root = tmp_path / "ds"
    names = [f"c{i}" for i in range(nc)]
    rng = np.random.default_rng(3)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img = np.full((imgsz, imgsz, 3), 60, np.uint8)
            lines = []
            for b in range(rng.integers(1, 3)):
                cls = int(rng.integers(0, nc))
                w, h = int(rng.integers(12, 24)), int(rng.integers(12, 24))
                x = int(rng.integers(0, imgsz - w))
                y = int(rng.integers(0, imgsz - h))
                color = (255, 0, 0) if cls == 0 else (0, 255, 0)
                img[y : y + h, x : x + w] = color
                lines.append(
                    f"{cls} {(x + w / 2) / imgsz:.6f} {(y + h / 2) / imgsz:.6f} "
                    f"{w / imgsz:.6f} {h / imgsz:.6f}"
                )
            cv2.imwrite(str(root / "images" / split / f"{i}.jpg"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            (root / "labels" / split / f"{i}.txt").write_text("\n".join(lines))
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.dump({
        "path": str(root), "train": "images/train", "val": "images/val",
        "test": "images/test", "nc": nc, "names": names,
    }))
    return data_yaml


def test_dataset_indexing(tmp_path):
    data_yaml = make_dataset(tmp_path)
    ds = YoloDataset.from_yaml(str(data_yaml), "train")
    assert len(ds) == 8
    assert ds.nc == 2
    boxes, cls = ds.boxes_xyxy(0, 64, 64)
    assert boxes.shape[1] == 4
    assert (boxes >= 0).all() and (boxes <= 64).all()


def test_loader_batch_shapes(tmp_path):
    data_yaml = make_dataset(tmp_path)
    ds = YoloDataset.from_yaml(str(data_yaml), "train")
    loader = DataLoader(ds, batch_size=4, imgsz=64, augment=True, seed=1, max_boxes=16)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b.images.shape == (4, 64, 64, 3)
    assert b.images.dtype == np.uint8
    assert b.gt_boxes.shape == (4, 16, 4)
    assert b.gt_classes.shape == (4, 16)
    assert b.gt_mask.shape == (4, 16)
    # boxes within the canvas
    assert (b.gt_boxes[b.gt_mask] >= 0).all()
    assert (b.gt_boxes[b.gt_mask] <= 64).all()


def test_loader_determinism(tmp_path):
    data_yaml = make_dataset(tmp_path)
    ds = YoloDataset.from_yaml(str(data_yaml), "train")
    l1 = list(DataLoader(ds, 4, 64, augment=True, seed=7).epoch(2))
    l2 = list(DataLoader(ds, 4, 64, augment=True, seed=7).epoch(2))
    np.testing.assert_array_equal(l1[0].images, l2[0].images)
    np.testing.assert_array_equal(l1[0].gt_boxes, l2[0].gt_boxes)


def test_val_loader_meta_and_full_coverage(tmp_path):
    data_yaml = make_dataset(tmp_path)
    ds = YoloDataset.from_yaml(str(data_yaml), "val")
    loader = DataLoader(ds, 4, 64, augment=False, keep_meta=True)
    batches = list(loader.epoch(0))
    assert sum(1 for b in batches for m in b.meta if m) == 4
    path, (oh, ow), r, pad = batches[0].meta[0]
    assert (oh, ow) == (64, 64)
    assert r == 1.0


def test_mosaic4_output(tmp_path):
    rng = np.random.default_rng(0)
    imgs = [np.full((48, 64, 3), c, np.uint8) for c in (50, 100, 150, 200)]
    boxes = [np.array([[4, 4, 20, 20]], np.float32) for _ in range(4)]
    classes = [np.array([0]) for _ in range(4)]
    img, b, c = mosaic4(imgs, boxes, classes, 64, rng, AugmentConfig())
    assert img.shape == (64, 64, 3)
    assert b.shape[1] == 4 if len(b) else True
    assert len(b) == len(c)


def test_hsv_jitter_preserves_shape_dtype():
    rng = np.random.default_rng(0)
    img = np.random.default_rng(1).integers(0, 255, (32, 32, 3), np.uint8)
    out = hsv_jitter(img, rng, AugmentConfig())
    assert out.shape == img.shape and out.dtype == np.uint8


def test_random_affine_filters_degenerate(tmp_path):
    rng = np.random.default_rng(0)
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[0, 0, 1, 1]], np.float32)  # tiny box -> filtered
    out, b, c = random_affine(
        img, boxes, np.array([0]), rng, AugmentConfig(scale=0.0, translate=0.0), 64
    )
    assert len(b) == 0


def test_prefetcher_propagates_items_and_errors(tmp_path):
    def gen():
        yield 1
        yield 2

    assert list(Prefetcher(gen())) == [1, 2]

    def bad():
        yield 1
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        list(Prefetcher(bad()))


def test_mixup_blend_and_label_union():
    from deal_yolo_daya_tpu.train.augment import mixup

    rng = np.random.default_rng(0)
    a = np.zeros((32, 32, 3), np.uint8)
    b = np.full((32, 32, 3), 200, np.uint8)
    ba = np.array([[1, 1, 10, 10]], np.float32)
    bb = np.array([[5, 5, 20, 20]], np.float32)
    img, boxes, classes = mixup(a, ba, np.array([0]), b, bb, np.array([1]), rng)
    assert img.shape == a.shape
    # blended value strictly between the sources (beta(32,32) ~ 0.5)
    assert 50 < int(img[0, 0, 0]) < 150
    assert boxes.shape == (2, 4)
    assert classes.tolist() == [0, 1]


def test_loader_mixup_path(tmp_path):
    from deal_yolo_daya_tpu.train.augment import AugmentConfig

    data_yaml = make_dataset(tmp_path)
    ds = YoloDataset.from_yaml(str(data_yaml), "train")
    loader = DataLoader(
        ds, 4, 64, augment=True, seed=1, max_boxes=32,
        aug_config=AugmentConfig(mixup=1.0),
    )
    b = next(iter(loader.epoch(0)))
    assert b.images.shape == (4, 64, 64, 3)
    assert b.gt_mask.any()
