"""Input pipeline: YOLO-layout dataset reader + augmenting batch loader with
background prefetch to device.

Consumes exactly the dataset contract datakit produces (images/{split},
labels/{split}/*.txt with normalized `cid cx cy w h` lines, data.yaml —
reference: core/processor.py:1045-1070). Batches are fixed-shape: images
(B, S, S, 3) float32 0-255, labels padded to MAX_BOXES with a validity mask,
so the jitted train step never recompiles. A double-buffered background
thread keeps the device fed (SURVEY §7 hard part (e)).
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import yaml

from ..ops.letterbox import letterbox_numpy
from .augment import (
    AugmentConfig,
    flips,
    hsv_jitter,
    mixup,
    mosaic4,
    random_affine,
    resize_keep_ratio,
)

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

MAX_BOXES = 128
IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff"}


def load_image(path: str) -> np.ndarray:
    """Decode to RGB uint8 (cv2 fast path, PIL fallback)."""
    if cv2 is not None:
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is not None:
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


@dataclass
class YoloDataset:
    """Index over one split of a YOLO-layout dataset."""

    root: Path
    split: str
    names: List[str]
    images: List[Path] = field(default_factory=list)
    labels: List[np.ndarray] = field(default_factory=list)  # (N,5) cls,cx,cy,w,h norm

    @classmethod
    def from_yaml(cls, data_yaml: str, split: str = "train") -> "YoloDataset":
        data_yaml = Path(data_yaml)
        data = yaml.safe_load(data_yaml.read_text(encoding="utf-8"))
        root_value = data.get("path")
        root = Path(root_value) if root_value else data_yaml.parent
        if not root.is_absolute():
            root = (data_yaml.parent / root).resolve()
        names = data.get("names") or []
        if isinstance(names, dict):
            names = [names[k] for k in sorted(names)]
        split_rel = data.get(split) or f"images/{split}"
        img_dir = root / split_rel

        ds = cls(root=root, split=split, names=list(names))
        if not img_dir.exists():
            return ds
        for img_path in sorted(img_dir.iterdir()):
            if img_path.suffix.lower() not in IMAGE_EXTS:
                continue
            label_path = (
                Path(str(img_path.parent).replace("images", "labels", 1))
                / f"{img_path.stem}.txt"
            )
            rows = []
            if label_path.exists():
                for line in label_path.read_text(encoding="utf-8").splitlines():
                    parts = line.split()
                    if len(parts) >= 5:
                        rows.append([float(v) for v in parts[:5]])
            ds.images.append(img_path)
            ds.labels.append(
                np.asarray(rows, np.float32).reshape(-1, 5)
                if rows else np.zeros((0, 5), np.float32)
            )
        return ds

    def __len__(self) -> int:
        return len(self.images)

    @property
    def nc(self) -> int:
        return len(self.names)

    def enable_cache(self):
        """Cache decoded images in RAM (the reference's `cache` train flag)."""
        self._cache: Dict[int, np.ndarray] = {}

    def image(self, idx: int) -> np.ndarray:
        cache = getattr(self, "_cache", None)
        if cache is not None:
            img = cache.get(idx)
            if img is None:
                img = load_image(self.images[idx])
                cache[idx] = img
            return img
        return load_image(self.images[idx])

    def boxes_xyxy(self, idx: int, w: int, h: int) -> Tuple[np.ndarray, np.ndarray]:
        """Denormalized xyxy pixel boxes + class ids for image idx."""
        lab = self.labels[idx]
        if len(lab) == 0:
            return np.zeros((0, 4), np.float32), np.zeros((0,), np.int64)
        cls = lab[:, 0].astype(np.int64)
        cx, cy, bw, bh = lab[:, 1] * w, lab[:, 2] * h, lab[:, 3] * w, lab[:, 4] * h
        boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1)
        return boxes.astype(np.float32), cls


@dataclass
class RawBatch:
    """Host-minimal batch for the on-device augmentation path: images are
    keep-ratio resized into a fixed (S, S) buffer, top-left anchored."""

    images: np.ndarray        # (B, S, S, 3) uint8 RGB, fill 114
    hw: np.ndarray            # (B, 2) float32 content (h, w) inside buffer
    gt_boxes: np.ndarray      # (B, M, 4) xyxy in buffer coords
    gt_classes: np.ndarray    # (B, M) int32
    gt_mask: np.ndarray       # (B, M) bool


@dataclass
class Batch:
    images: np.ndarray        # (B, S, S, 3) uint8 RGB
    gt_boxes: np.ndarray      # (B, M, 4) xyxy pixels in letterboxed frame
    gt_classes: np.ndarray    # (B, M) int32
    gt_mask: np.ndarray       # (B, M) bool
    meta: Optional[list] = None  # per-image (path, orig_hw, scale, pad) for val


def _pad_labels(boxes: np.ndarray, classes: np.ndarray, max_boxes: int):
    m = min(len(boxes), max_boxes)
    out_b = np.zeros((max_boxes, 4), np.float32)
    out_c = np.zeros((max_boxes,), np.int32)
    out_m = np.zeros((max_boxes,), bool)
    if m:
        out_b[:m] = boxes[:m]
        out_c[:m] = classes[:m]
        out_m[:m] = True
    return out_b, out_c, out_m


class DataLoader:
    """Augmenting batch iterator with deterministic seeding.

    mosaic applies with prob cfg.mosaic (disabled automatically when
    ``mosaic_off`` — the close_mosaic schedule hook); otherwise the image is
    letterboxed. Fixed output shapes throughout.
    """

    def __init__(
        self,
        dataset: YoloDataset,
        batch_size: int,
        imgsz: int = 640,
        augment: bool = True,
        aug_config: Optional[AugmentConfig] = None,
        seed: int = 0,
        max_boxes: int = MAX_BOXES,
        shuffle: Optional[bool] = None,
        drop_last: Optional[bool] = None,
        keep_meta: bool = False,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.imgsz = imgsz
        self.augment = augment
        self.cfg = aug_config or AugmentConfig()
        self.seed = seed
        self.max_boxes = max_boxes
        self.shuffle = augment if shuffle is None else shuffle
        self.drop_last = augment if drop_last is None else drop_last
        self.keep_meta = keep_meta
        self.mosaic_off = False

    def __len__(self) -> int:
        n = len(self.ds)
        if self.drop_last:
            return max(n // self.batch_size, 1) if n else 0
        return (n + self.batch_size - 1) // self.batch_size

    def _mosaic_sample(self, idx: int, rng: np.random.Generator):
        others = rng.integers(0, len(self.ds), 3)
        idxs = [idx, *others.tolist()]
        imgs, bxs, cls = [], [], []
        for j in idxs:
            img = self.ds.image(j)
            h, w = img.shape[:2]
            b, c = self.ds.boxes_xyxy(j, w, h)
            imgs.append(img)
            bxs.append(b)
            cls.append(c)
        return mosaic4(imgs, bxs, cls, self.imgsz, rng, self.cfg)

    def _load_one(self, idx: int, rng: np.random.Generator):
        use_mosaic = (
            self.augment and not self.mosaic_off and rng.random() < self.cfg.mosaic
        )
        if use_mosaic:
            img, boxes, classes = self._mosaic_sample(idx, rng)
            if self.cfg.mixup > 0 and rng.random() < self.cfg.mixup:
                j = int(rng.integers(0, len(self.ds)))
                img2, boxes2, classes2 = self._mosaic_sample(j, rng)
                img, boxes, classes = mixup(
                    img, boxes, classes, img2, boxes2, classes2, rng
                )
            meta = None
        else:
            img = self.ds.image(idx)
            h, w = img.shape[:2]
            boxes, classes = self.ds.boxes_xyxy(idx, w, h)
            canvas, r, (px, py) = letterbox_numpy(img, self.imgsz)
            if len(boxes):
                boxes = boxes * r
                boxes = boxes + [px, py, px, py]
            meta = (str(self.ds.images[idx]), (h, w), r, (px, py))
            img = canvas
            if self.augment:
                img, boxes, classes = random_affine(
                    img, boxes, classes, rng, self.cfg, self.imgsz
                )
                meta = None
        if self.augment:
            img = hsv_jitter(img, rng, self.cfg)
            img, boxes = flips(img, boxes, rng, self.cfg)
        return img, boxes, classes, meta

    def epoch(self, epoch_idx: int = 0, n_workers: int = 8) -> Iterator[Batch]:
        n = len(self.ds)
        if n == 0:
            return
        rng = np.random.default_rng(self.seed + 1000 * epoch_idx)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        nb = len(self)

        def build_one(args):
            # per-sample deterministic RNG -> parallel-safe, reproducible
            slot, i = args
            sample_rng = np.random.default_rng(
                (self.seed, epoch_idx, int(slot)) if self.augment
                else (self.seed, int(i))
            )
            img, boxes, classes, meta = self._load_one(int(i), sample_rng)
            pb, pc, pm = _pad_labels(boxes, classes, self.max_boxes)
            # uint8 to the device (4x less host->device traffic); the train
            # step casts+normalizes on-chip.
            return np.ascontiguousarray(img, dtype=np.uint8), pb, pc, pm, meta

        with cf.ThreadPoolExecutor(max_workers=n_workers) as pool:
            for b in range(nb):
                idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                if len(idxs) == 0:
                    break
                # pad final partial batch by wrapping (masked downstream)
                while len(idxs) < self.batch_size:
                    idxs = np.concatenate(
                        [idxs, order[: self.batch_size - len(idxs)]]
                    )
                slots = [(b * self.batch_size + j, i) for j, i in enumerate(idxs)]
                # decode/augment in parallel (cv2/PIL release the GIL)
                results = list(pool.map(build_one, slots))
                images, gtb, gtc, gtm, metas = zip(*results)
                yield Batch(
                    images=np.stack(images),
                    gt_boxes=np.stack(gtb),
                    gt_classes=np.stack(gtc),
                    gt_mask=np.stack(gtm),
                    meta=list(metas) if self.keep_meta else None,
                )


    def load_raw(self, i):
        """Decode + keep-ratio resize one sample onto an imgsz canvas (no
        augmentation): (u8 canvas, f32 (h, w), padded boxes/classes/mask)."""
        s = self.imgsz
        img = self.ds.image(int(i))
        h0, w0 = img.shape[:2]
        img, r = resize_keep_ratio(img, s)
        h, w = img.shape[:2]
        buf = np.full((s, s, 3), 114, np.uint8)
        buf[:h, :w] = img
        boxes, classes = self.ds.boxes_xyxy(int(i), w0, h0)
        if len(boxes):
            boxes = boxes * r
        pb, pc, pm = _pad_labels(boxes, classes, self.max_boxes)
        return buf, np.float32((h, w)), pb, pc, pm

    def raw_chunks(self, chunk_size: int = 256, n_workers: int = 8):
        """Ordered pass over the whole dataset in stacked chunks — the feed
        for the trainer's HBM-resident dataset cache (upload once, gather
        batches on device every epoch)."""
        n = len(self.ds)
        with cf.ThreadPoolExecutor(max_workers=n_workers) as pool:
            for start in range(0, n, chunk_size):
                rows = list(pool.map(self.load_raw, range(start, min(start + chunk_size, n))))
                images, hw, gtb, gtc, gtm = zip(*rows)
                yield (np.stack(images), np.stack(hw), np.stack(gtb),
                       np.stack(gtc), np.stack(gtm))

    def epoch_indices(self, epoch_idx: int = 0) -> Iterator[np.ndarray]:
        """The per-batch dataset indices an epoch_raw epoch would use (short
        final batch wrapped to full size). Shared by epoch_raw and the
        trainer's device-cache path so both see identical sampling."""
        n = len(self.ds)
        if n == 0:
            return
        rng = np.random.default_rng(self.seed + 1000 * epoch_idx)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        for b in range(len(self)):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            if len(idxs) == 0:
                break
            while len(idxs) < self.batch_size:
                idxs = np.concatenate(
                    [idxs, order[: self.batch_size - len(idxs)]]
                )
            yield idxs

    def epoch_raw(self, epoch_idx: int = 0, n_workers: int = 8) -> Iterator[RawBatch]:
        """Decode-and-resize-only epoch for device-side augmentation: the host
        does one keep-ratio resize per image; mosaic/affine/HSV/flip happen on
        the TPU (train.device_augment.augment_batch)."""
        build_one = self.load_raw
        with cf.ThreadPoolExecutor(max_workers=n_workers) as pool:
            for idxs in self.epoch_indices(epoch_idx):
                results = list(pool.map(build_one, idxs))
                images, hw, gtb, gtc, gtm = zip(*results)
                yield RawBatch(
                    images=np.stack(images),
                    hw=np.stack(hw),
                    gt_boxes=np.stack(gtb),
                    gt_classes=np.stack(gtc),
                    gt_mask=np.stack(gtm),
                )


class Prefetcher:
    """Background-thread prefetch: overlaps host decode/augment with device
    compute. Yields batches from a bounded queue (double/triple buffered).

    `transfer` (optional) runs on each item inside the worker thread —
    pass the device_put/bucketing closure so H2D upload overlaps the train
    loop instead of serializing with it. Through the axon tunnel the upload
    is the epoch critical path (~750 MB/s: 157 ms for a b32@640 uint8
    batch vs a 47 ms train step — PERF.md round 2); queue depth then bounds
    device-resident staging memory, so keep it small."""

    def __init__(self, loader_iter: Iterator[Batch], depth: int = 3,
                 transfer=None):
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: Optional[BaseException] = None

        def _worker():
            try:
                for item in loader_iter:
                    self._queue.put(item if transfer is None else transfer(item))
            except BaseException as e:  # propagate into consumer
                self._err = e
            finally:
                self._queue.put(self._done)

        self._thread = threading.Thread(target=_worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is self._done:
                if self._err is not None:
                    raise self._err
                return
            yield item
