"""Synthetic detection dataset generator (YOLO layout).

Produces images of colored shapes (circle / square / triangle) on textured
backgrounds with exact box labels — a self-contained stand-in for COCO128 in
network-less environments, used for end-to-end training-quality validation
and benchmarks. Deterministic given --seed.

Usage: python tools/synth_dataset.py --out /tmp/shapes --train 600 --val 100 --imgsz 320
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import yaml

NAMES = ["circle", "square", "triangle"]
COLORS = [(220, 60, 60), (60, 200, 80), (70, 90, 230)]


def draw_shape(img: np.ndarray, cls: int, cx: int, cy: int, r: int, rng) -> tuple:
    import cv2

    color = tuple(int(c + rng.integers(-25, 25)) for c in COLORS[cls])
    if cls == 0:
        cv2.circle(img, (cx, cy), r, color, -1)
    elif cls == 1:
        cv2.rectangle(img, (cx - r, cy - r), (cx + r, cy + r), color, -1)
    else:
        pts = np.array([[cx, cy - r], [cx - r, cy + r], [cx + r, cy + r]], np.int32)
        cv2.fillPoly(img, [pts], color)
    return cx - r, cy - r, cx + r, cy + r


def make_image(imgsz: int, rng) -> tuple:
    import cv2

    # textured background
    base = rng.integers(30, 120, 3)
    img = np.full((imgsz, imgsz, 3), base, np.uint8)
    noise = rng.normal(0, 18, (imgsz, imgsz, 3))
    img = np.clip(img.astype(np.int16) + noise.astype(np.int16), 0, 255).astype(np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 0)

    boxes, classes = [], []
    n_obj = int(rng.integers(1, 5))
    occupied = []
    for _ in range(n_obj):
        cls = int(rng.integers(0, 3))
        r = int(rng.integers(imgsz // 14, imgsz // 5))
        cx = int(rng.integers(r + 2, imgsz - r - 2))
        cy = int(rng.integers(r + 2, imgsz - r - 2))
        # reject heavy overlap with already-placed objects
        ok = all(
            max(0, min(cx + r, x2) - max(cx - r, x1))
            * max(0, min(cy + r, y2) - max(cy - r, y1))
            < 0.3 * (2 * r) ** 2
            for x1, y1, x2, y2 in occupied
        )
        if not ok:
            continue
        x1, y1, x2, y2 = draw_shape(img, cls, cx, cy, r, rng)
        occupied.append((x1, y1, x2, y2))
        boxes.append((x1, y1, x2, y2))
        classes.append(cls)
    return img, boxes, classes


def generate(out: Path, n_train: int, n_val: int, imgsz: int, seed: int = 0) -> Path:
    import cv2

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        (out / "images" / split).mkdir(parents=True, exist_ok=True)
        (out / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img, boxes, classes = make_image(imgsz, rng)
            cv2.imwrite(
                str(out / "images" / split / f"{i:05d}.jpg"),
                cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
            )
            lines = [
                f"{c} {(x1 + x2) / 2 / imgsz:.6f} {(y1 + y2) / 2 / imgsz:.6f} "
                f"{(x2 - x1) / imgsz:.6f} {(y2 - y1) / imgsz:.6f}"
                for (x1, y1, x2, y2), c in zip(boxes, classes)
            ]
            (out / "labels" / split / f"{i:05d}.txt").write_text("\n".join(lines))
    data_yaml = out / "data.yaml"
    data_yaml.write_text(yaml.dump({
        "path": str(out), "train": "images/train", "val": "images/val",
        "nc": len(NAMES), "names": NAMES,
    }, sort_keys=False))
    return data_yaml


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=600)
    ap.add_argument("--val", type=int, default=100)
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    path = generate(Path(args.out), args.train, args.val, args.imgsz, args.seed)
    print(path)
