"""Host-side augmentation pipeline: mosaic, random affine, HSV, flip.

Capability parity with the ultralytics augmentation stack the reference
configures via train kwargs (mosaic/close_mosaic/augment defaults; reference:
ui/pages/training.py:352-368). Runs on host CPU in numpy/cv2 — the TPU sees
only fixed-shape, already-letterboxed batches, keeping the device graph
static (SURVEY §7 hard part (c) resolved host-side; the device-side fused
normalize lives in the trainer).

All randomness flows through an explicit numpy Generator for reproducibility
(seed knob, reference app default seed=42).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


@dataclass
class AugmentConfig:
    mosaic: float = 1.0
    mixup: float = 0.0
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    fliplr: float = 0.5
    flipud: float = 0.0
    bgr: float = 0.0


def resize_keep_ratio(img: np.ndarray, target: int) -> Tuple[np.ndarray, float]:
    """Resize so the long side == target."""
    h, w = img.shape[:2]
    r = target / max(h, w)
    if r != 1.0:
        img = cv2.resize(img, (round(w * r), round(h * r)), interpolation=cv2.INTER_LINEAR)
    return img, r


def hsv_jitter(img: np.ndarray, rng: np.random.Generator, cfg: AugmentConfig) -> np.ndarray:
    """Random HSV gain jitter (uint8 in/out)."""
    if cfg.hsv_h == cfg.hsv_s == cfg.hsv_v == 0:
        return img
    gains = rng.uniform(-1, 1, 3) * [cfg.hsv_h, cfg.hsv_s, cfg.hsv_v] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    x = np.arange(256, dtype=np.int16)
    lut_h = ((x * gains[0]) % 180).astype(np.uint8)
    lut_s = np.clip(x * gains[1], 0, 255).astype(np.uint8)
    lut_v = np.clip(x * gains[2], 0, 255).astype(np.uint8)
    img_hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v)))
    return cv2.cvtColor(img_hsv, cv2.COLOR_HSV2RGB)


def random_affine(
    img: np.ndarray,
    boxes: np.ndarray,   # (N, 4) xyxy pixels
    classes: np.ndarray,
    rng: np.random.Generator,
    cfg: AugmentConfig,
    out_size: int,
    border: Tuple[int, int] = (0, 0),
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Scale/translate (+optional rotate/shear) affine with box transform and
    degenerate-box filtering."""
    h, w = img.shape[:2]

    # Build transform: center -> rotate/scale/shear -> translate
    c = np.eye(3)
    c[0, 2] = -w / 2
    c[1, 2] = -h / 2
    a = rng.uniform(-cfg.degrees, cfg.degrees)
    s = rng.uniform(1 - cfg.scale, 1 + cfg.scale)
    r = np.eye(3)
    r[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    sh = np.eye(3)
    sh[0, 1] = math.tan(rng.uniform(-cfg.shear, cfg.shear) * math.pi / 180)
    sh[1, 0] = math.tan(rng.uniform(-cfg.shear, cfg.shear) * math.pi / 180)
    t = np.eye(3)
    t[0, 2] = rng.uniform(0.5 - cfg.translate, 0.5 + cfg.translate) * out_size
    t[1, 2] = rng.uniform(0.5 - cfg.translate, 0.5 + cfg.translate) * out_size
    m = t @ sh @ r @ c

    img = cv2.warpAffine(
        img, m[:2], dsize=(out_size, out_size), borderValue=(114, 114, 114)
    )

    if len(boxes) == 0:
        return img, boxes.reshape(0, 4), classes

    n = len(boxes)
    corners = np.ones((n * 4, 3))
    corners[:, :2] = boxes[:, [0, 1, 2, 1, 2, 3, 0, 3]].reshape(n * 4, 2)
    corners = corners @ m.T
    corners = corners[:, :2].reshape(n, 8)
    xs = corners[:, [0, 2, 4, 6]]
    ys = corners[:, [1, 3, 5, 7]]
    new_boxes = np.stack(
        [xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1
    )
    new_boxes[:, [0, 2]] = new_boxes[:, [0, 2]].clip(0, out_size)
    new_boxes[:, [1, 3]] = new_boxes[:, [1, 3]].clip(0, out_size)

    # filter: min size 2px, area preserved >= 10%, aspect < 100
    bw = new_boxes[:, 2] - new_boxes[:, 0]
    bh = new_boxes[:, 3] - new_boxes[:, 1]
    old_area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]) * (s**2)
    keep = (
        (bw > 2) & (bh > 2)
        & (bw * bh / (old_area + 1e-16) > 0.1)
        & (np.maximum(bw / (bh + 1e-16), bh / (bw + 1e-16)) < 100)
    )
    return img, new_boxes[keep], classes[keep]


def mosaic4(
    images: Sequence[np.ndarray],
    boxes_list: Sequence[np.ndarray],     # per-image (N, 4) xyxy pixels
    classes_list: Sequence[np.ndarray],
    imgsz: int,
    rng: np.random.Generator,
    cfg: AugmentConfig,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Classic 4-image mosaic: 2x canvas, random center, then affine-crop back
    to imgsz x imgsz."""
    s = imgsz
    canvas = np.full((2 * s, 2 * s, 3), 114, dtype=np.uint8)
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    all_boxes, all_classes = [], []

    for i in range(4):
        img, r = resize_keep_ratio(images[i], s)
        h, w = img.shape[:2]
        if i == 0:   # top-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
        elif i == 1:  # top-right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, 2 * s), yc
            x1b, y1b = 0, h - (y2a - y1a)
        elif i == 2:  # bottom-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(2 * s, yc + h)
            x1b, y1b = w - (x2a - x1a), 0
        else:         # bottom-right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, 2 * s), min(2 * s, yc + h)
            x1b, y1b = 0, 0
        x2b, y2b = x1b + (x2a - x1a), y1b + (y2a - y1a)
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]

        if len(boxes_list[i]):
            b = boxes_list[i] * r
            b = b + [x1a - x1b, y1a - y1b, x1a - x1b, y1a - y1b]
            all_boxes.append(b)
            all_classes.append(classes_list[i])

    boxes = np.concatenate(all_boxes, 0) if all_boxes else np.zeros((0, 4), np.float32)
    classes = np.concatenate(all_classes, 0) if all_classes else np.zeros((0,), np.int64)
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, 2 * s)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, 2 * s)

    return random_affine(
        canvas, boxes, classes, rng, cfg, out_size=imgsz, border=(-s // 2, -s // 2)
    )


def mixup(
    img1: np.ndarray, boxes1: np.ndarray, cls1: np.ndarray,
    img2: np.ndarray, boxes2: np.ndarray, cls2: np.ndarray,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Blend two samples with a Beta(32, 32) weight; labels are unioned."""
    r = rng.beta(32.0, 32.0)
    img = (img1.astype(np.float32) * r + img2.astype(np.float32) * (1 - r)).astype(
        np.uint8
    )
    boxes = np.concatenate([boxes1, boxes2], 0) if len(boxes1) or len(boxes2) else boxes1
    classes = np.concatenate([cls1, cls2], 0) if len(cls1) or len(cls2) else cls1
    return img, boxes, classes


def flips(
    img: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.Generator,
    cfg: AugmentConfig,
) -> Tuple[np.ndarray, np.ndarray]:
    h, w = img.shape[:2]
    if cfg.fliplr > 0 and rng.random() < cfg.fliplr:
        img = np.ascontiguousarray(img[:, ::-1])
        if len(boxes):
            boxes = boxes.copy()
            boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    if cfg.flipud > 0 and rng.random() < cfg.flipud:
        img = np.ascontiguousarray(img[::-1])
        if len(boxes):
            boxes = boxes.copy()
            boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
    if cfg.bgr > 0 and rng.random() < cfg.bgr:
        # channel-swap aug (ultralytics `bgr`); geometry untouched
        img = np.ascontiguousarray(img[..., ::-1])
    return img, boxes
