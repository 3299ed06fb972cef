"""Ultralytics-compatible run-dir artifacts.

The reference's results page consumes a fixed artifact set from each run dir:
results.csv (+ line charts of its loss/metric columns), confusion_matrix*.png,
PR/F1 curve PNGs, val_batch*_pred.jpg and args.yaml (reference:
ui/components.py:237-301, SURVEY §3.5). This module writes that exact set so
the visualization layer works unchanged against the new trainer.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
import yaml

RESULTS_COLUMNS = [
    "epoch", "time",
    "train/box_loss", "train/cls_loss", "train/dfl_loss",
    "metrics/precision(B)", "metrics/recall(B)",
    "metrics/mAP50(B)", "metrics/mAP50-95(B)",
    "val/box_loss", "val/cls_loss", "val/dfl_loss",
    "lr/pg0", "lr/pg1", "lr/pg2",
]


class RunDir:
    """Manages one training run directory (project/name layout with exist_ok
    auto-increment, like the engine the reference delegates to)."""

    def __init__(self, project: str, name: str = "train", exist_ok: bool = False):
        base = Path(project)
        run = base / name
        if run.exists() and not exist_ok:
            i = 2
            while (base / f"{name}{i}").exists():
                i += 1
            run = base / f"{name}{i}"
        run.mkdir(parents=True, exist_ok=True)
        (run / "weights").mkdir(exist_ok=True)
        self.path = run
        self._rows: List[Dict] = []

    def write_args(self, args: Dict):
        clean = {k: (str(v) if isinstance(v, Path) else v) for k, v in args.items()}
        (self.path / "args.yaml").write_text(
            yaml.dump(clean, sort_keys=False, allow_unicode=True), encoding="utf-8"
        )

    def append_results_row(self, row: Dict):
        self._rows.append(row)
        with open(self.path / "results.csv", "w", newline="", encoding="utf-8") as f:
            writer = csv.DictWriter(f, fieldnames=RESULTS_COLUMNS)
            writer.writeheader()
            for r in self._rows:
                writer.writerow({c: _fmt(r.get(c, 0)) for c in RESULTS_COLUMNS})

    # ------------------------------------------------------------------ plots

    def plot_results(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if not self._rows:
            return
        epochs = [r["epoch"] for r in self._rows]
        panels = [
            ("train/box_loss", "train/box_loss"),
            ("train/cls_loss", "train/cls_loss"),
            ("train/dfl_loss", "train/dfl_loss"),
            ("metrics/precision(B)", "precision"),
            ("metrics/recall(B)", "recall"),
            ("val/box_loss", "val/box_loss"),
            ("val/cls_loss", "val/cls_loss"),
            ("val/dfl_loss", "val/dfl_loss"),
            ("metrics/mAP50(B)", "mAP50"),
            ("metrics/mAP50-95(B)", "mAP50-95"),
        ]
        fig, axes = plt.subplots(2, 5, figsize=(18, 7))
        for ax, (col, title) in zip(axes.flat, panels):
            ax.plot(epochs, [float(r.get(col, 0)) for r in self._rows], marker=".")
            ax.set_title(title, fontsize=9)
        fig.tight_layout()
        fig.savefig(self.path / "results.png", dpi=120)
        plt.close(fig)

    def plot_confusion_matrix(self, mat: np.ndarray, names: Sequence[str]):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        labels = list(names) + ["background"]
        for normalized, fname in ((False, "confusion_matrix.png"),
                                  (True, "confusion_matrix_normalized.png")):
            data = mat.astype(np.float64)
            if normalized:
                data = data / np.maximum(data.sum(0, keepdims=True), 1e-9)
            fig, ax = plt.subplots(figsize=(8, 7))
            im = ax.imshow(data, cmap="Blues")
            ax.set_xticks(range(len(labels)))
            ax.set_yticks(range(len(labels)))
            ax.set_xticklabels(labels, rotation=90, fontsize=7)
            ax.set_yticklabels(labels, fontsize=7)
            ax.set_xlabel("True")
            ax.set_ylabel("Predicted")
            fig.colorbar(im, ax=ax)
            fig.tight_layout()
            fig.savefig(self.path / fname, dpi=120)
            plt.close(fig)

    def plot_pr_curves(self, metrics_result: Dict, names: Sequence[str]):
        """PR_curve.png + F1_curve.png from per-class AP data."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        aps = metrics_result.get("per_class_ap")
        fig, ax = plt.subplots(figsize=(8, 6))
        if aps is not None:
            for c, name in enumerate(names):
                ax.bar(c, aps[c, 0], label=None)
            ax.set_xticks(range(len(names)))
            ax.set_xticklabels(names, rotation=90, fontsize=7)
        ax.set_ylabel("AP@0.5")
        ax.set_title(f"mAP50 {metrics_result.get('map50', 0):.3f}")
        fig.tight_layout()
        fig.savefig(self.path / "PR_curve.png", dpi=120)
        plt.close(fig)

        fig, ax = plt.subplots(figsize=(8, 6))
        p, r = metrics_result.get("precision", 0), metrics_result.get("recall", 0)
        f1 = 2 * p * r / (p + r + 1e-16)
        ax.bar(["precision", "recall", "F1"], [p, r, f1])
        ax.set_title(f"F1 {f1:.3f}")
        fig.tight_layout()
        fig.savefig(self.path / "F1_curve.png", dpi=120)
        plt.close(fig)

    def save_val_batch_predictions(
        self,
        images: np.ndarray,          # (B, S, S, 3) 0-255
        boxes: np.ndarray,           # (B, max_det, 4)
        scores: np.ndarray,
        classes: np.ndarray,
        num_det: np.ndarray,
        names: Sequence[str],
        batch_idx: int = 0,
        max_images: int = 9,
    ):
        from PIL import Image, ImageDraw

        b = min(len(images), max_images)
        tile = int(np.ceil(np.sqrt(b)))
        s = images.shape[1]
        canvas = Image.new("RGB", (tile * s, tile * s), (50, 50, 50))
        for i in range(b):
            img = Image.fromarray(images[i].astype(np.uint8))
            draw = ImageDraw.Draw(img)
            for d in range(int(num_det[i])):
                x1, y1, x2, y2 = boxes[i, d]
                cls_id = int(classes[i, d])
                label = names[cls_id] if 0 <= cls_id < len(names) else str(cls_id)
                draw.rectangle([x1, y1, x2, y2], outline=(255, 64, 64), width=2)
                draw.text((x1 + 2, max(y1 - 12, 0)), f"{label} {scores[i, d]:.2f}",
                          fill=(255, 255, 0))
            canvas.paste(img, ((i % tile) * s, (i // tile) * s))
        canvas.save(self.path / f"val_batch{batch_idx}_pred.jpg", quality=88)


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.5f}"
    return str(v)
