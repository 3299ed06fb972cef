"""High-level model API mirroring the engine surface the reference calls:
``YOLO(model).train(data=..., **kwargs)`` (reference: core/training.py:63-64,
83-84), plus predict()/val() for inference and evaluation.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np


class Detections:
    """Per-image prediction result: xyxy boxes in original-image pixels."""

    def __init__(self, path, image, boxes, scores, classes, names):
        self.path = path
        self.image = image            # RGB uint8 original image
        self.boxes = boxes            # (n, 4) xyxy
        self.scores = scores          # (n,)
        self.classes = classes        # (n,) int
        self.names = names
        self.save_path = None         # set by predict(save=True)

    def __len__(self):
        return len(self.boxes)

    def to_records(self) -> List[Dict[str, Any]]:
        """One dict per detection (the ultralytics Results.summary() shape):
        name / class / confidence / box{x1,y1,x2,y2} in original pixels."""
        out = []
        for (x1, y1, x2, y2), s, c in zip(self.boxes, self.scores, self.classes):
            c = int(c)
            out.append({
                "name": (self.names[c] if 0 <= c < len(self.names) else str(c)),
                "class": c,
                "confidence": round(float(s), 5),
                "box": {"x1": round(float(x1), 2), "y1": round(float(y1), 2),
                        "x2": round(float(x2), 2), "y2": round(float(y2), 2)},
            })
        return out

    def to_json(self, **dumps_kwargs) -> str:
        """JSON string of to_records() (ultralytics Results.to_json analog)."""
        import json

        return json.dumps(self.to_records(), ensure_ascii=False,
                          **dumps_kwargs)

    def to_df(self):
        """pandas DataFrame of to_records() (Results.to_df analog)."""
        import pandas as pd

        return pd.DataFrame(self.to_records())

    def plot(self) -> np.ndarray:
        """Annotated copy of the image (red boxes + class/conf labels,
        CJK-capable font fallback like the pipeline visualizer)."""
        from PIL import Image, ImageDraw

        from .datakit.visualize import _get_font

        img = Image.fromarray(self.image)
        draw = ImageDraw.Draw(img)
        font = _get_font(size=14)
        for (x1, y1, x2, y2), s, c in zip(self.boxes, self.scores, self.classes):
            name = self.names[int(c)] if 0 <= int(c) < len(self.names) else str(int(c))
            draw.rectangle([x1, y1, x2, y2], outline=(255, 64, 64), width=2)
            draw.text(
                (x1 + 2, max(y1 - 12, 0)), f"{name} {s:.2f}",
                fill=(255, 255, 0), font=font,
            )
        return np.asarray(img)

    def save(self, path):
        from PIL import Image

        Image.fromarray(self.plot()).save(path)
        return path


class YOLO:
    """TPU-native YOLO model handle (families: yolo11, yolov8, yolo12;
    also accepts trained checkpoints — an ultralytics .pt path or an orbax
    weights dir — and loads them).

    >>> model = YOLO("yolo11n")
    >>> model.train(data="data.yaml", epochs=10, imgsz=640)
    >>> results = model.predict(["img.jpg"])
    """

    def __init__(self, model: str = "yolo11n", nc: int = 80, imgsz: int = 640):
        from .models.registry import parse_model_spec

        self.model_spec = str(model)
        self.family, self.scale = parse_model_spec(self.model_spec)
        self.nc = nc
        self.imgsz = imgsz
        self.names: List[str] = [str(i) for i in range(nc)]
        self._model = None
        self._variables = None
        self._weights_loaded = False  # True after load/from_ultralytics/
                                      # from_export: train() fine-tunes
        self.trainer = None
        ckpt = Path(self.model_spec)
        if self.model_spec.endswith(".pt"):
            # the ultralytics YOLO('best.pt') surface: load the weights now
            # (a silent random-init fallback would return garbage detections)
            if not ckpt.exists():
                raise FileNotFoundError(f"模型权重文件不存在：{model}")
            loaded = YOLO.from_ultralytics(ckpt, imgsz=imgsz)
            self.__dict__.update(loaded.__dict__)
            self.model_spec = str(model)  # keep the user's spec for args.yaml
        elif ckpt.exists() and ckpt.is_dir():
            self.load(ckpt)

    # ------------------------------------------------------------------ build

    def _ensure_built(self, nc: Optional[int] = None):
        import jax.numpy as jnp

        from .models import build_detector

        if self._model is None or (nc is not None and nc != self.nc):
            if nc is not None:
                self.nc = nc
            self._model, self._variables = build_detector(
                f"{self.family}{self.scale}", nc=self.nc, imgsz=self.imgsz,
                dtype=jnp.bfloat16,
            )
            self._infer_jit = None  # compiled against the old model/imgsz

    def _fused_vars(self):
        """BN-folded inference variables (with the 1/255 input normalization
        folded into the stem kernel), cached per weights identity.

        predict()/serve run the fused program (BN reduced to a bias add, raw
        0..255 input feed); the cache keys on the _variables object so
        load()/train()/import invalidate it for free. The fold itself runs
        jitted: eagerly multiplying ~100 kernels through the axon tunnel
        costs ~50 ms per op (PERF.md rule 1). Export bundles keep plain
        BN-folded weights (no input fold) for artifact compatibility.
        """
        import functools

        import jax

        from .models.yolo11 import fuse_conv_bn

        cur = getattr(self, "_fused_cache", None)
        if cur is not None and cur[0] is self._variables:
            return cur[1]
        fused = jax.jit(
            functools.partial(fuse_conv_bn, input_scale=1.0 / 255.0)
        )(self._variables)
        self._fused_cache = (self._variables, fused)
        return fused

    @classmethod
    def from_ultralytics(cls, ckpt, imgsz: int = 640) -> "YOLO":
        """Build a model from a trained ultralytics YOLO11/YOLOv8 checkpoint.

        `ckpt` is a .pt path (loaded without ultralytics installed — see
        models/torch_import.py) or an already-loaded torch/numpy state dict.
        Scale and nc are inferred from the weights; class names carry over
        when the checkpoint has them. This is the migration path for users
        of the reference, whose trained artifacts are ultralytics best.pt
        files (reference: core/training.py:63-64).
        """
        from .models.torch_import import (
            import_state_dict,
            infer_arch,
            read_torch_checkpoint,
        )

        meta: Dict[str, Any] = {}
        if isinstance(ckpt, (str, Path)):
            sd, meta = read_torch_checkpoint(ckpt)
        else:
            sd = dict(ckpt)
        family, scale, nc = infer_arch(sd)
        self = cls(f"{family}{scale}", nc=nc, imgsz=imgsz)
        self._ensure_built()
        self._variables, report = import_state_dict(sd, self._variables)
        self.import_report = report
        self._weights_loaded = True
        names = meta.get("names")
        if names:
            self.names = [names.get(i, str(i)) for i in range(nc)]
        return self

    def load(self, ckpt_path) -> "YOLO":
        """Load weights from an orbax checkpoint dir saved by the trainer."""
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            ckpt = ckptr.restore(Path(ckpt_path).resolve())
        params = ckpt.get("ema_params") or ckpt["params"]
        leaf_nc = None
        try:
            leaf_nc = np.shape(params["detect"]["cls0_2"]["bias"])[0]
        except Exception:
            pass
        if leaf_nc:
            self.nc = int(leaf_nc)
        try:
            # the tree knows what it is — a bare YOLO(ckpt_dir) carries no
            # family/scale in its spec string
            from .models.registry import infer_arch_from_tree

            self.family, self.scale = infer_arch_from_tree(params)
            self._model = None  # rebuild against the inferred architecture
        except (KeyError, ValueError, TypeError):
            pass  # non-standard tree: keep the spec-derived architecture
        self._ensure_built()
        self._variables = {
            "params": params,
            "batch_stats": ckpt["batch_stats"],
        }
        self._weights_loaded = True
        return self

    # ------------------------------------------------------------------ train

    def train(self, data: str, **kwargs) -> Dict[str, Any]:
        from .train.trainer import TrainConfig, Trainer

        cfg = TrainConfig(model=self.model_spec, data=data)
        known = {f.name for f in dataclasses.fields(TrainConfig)}
        for k, v in kwargs.items():
            if k in known:
                setattr(cfg, k, v)
            else:
                cfg.extra[k] = v
        # fine-tune when weights were explicitly loaded (from_ultralytics /
        # load / from_export); a fresh spec trains from random init
        init_vars = self._variables if self._weights_loaded else None
        self.trainer = Trainer(cfg, init_variables=init_vars)
        result = self.trainer.train()
        # adopt trained EMA weights + class names for subsequent predict()
        self.nc = self.trainer.nc
        self.names = self.trainer.names
        self.imgsz = cfg.imgsz
        self._model = self.trainer.model
        import jax

        self._variables = {
            "params": jax.device_get(self.trainer.state.ema_params),
            "batch_stats": jax.device_get(self.trainer.state.batch_stats),
        }
        self.save_dir = result["save_dir"]
        self._weights_loaded = True  # a further train() continues from these
        return result

    # ---------------------------------------------------------------- predict

    #: video containers predict() plays through cv2 (ultralytics predictor
    #: source parity: predict("video.mp4") runs per-frame detection)
    VIDEO_SUFFIXES = frozenset(
        {".mp4", ".avi", ".mov", ".mkv", ".m4v", ".webm", ".wmv", ".mpg",
         ".mpeg"}
    )

    @staticmethod
    def _fetch_url_source(url: str) -> Path:
        """Download an http(s) predict source into the shared URL cache
        (datakit's retry/backoff downloader); repeat calls on the same URL
        reuse the cached file. Raises FileNotFoundError when unreachable."""
        import tempfile

        from .datakit.download import ensure_image_cached

        cache = Path(tempfile.gettempdir()) / "dyd_predict_cache"
        cache.mkdir(parents=True, exist_ok=True)
        local = ensure_image_cached(url, cache)
        if local is None:
            raise FileNotFoundError(f"无法下载输入源：{url}")
        return local

    def predict(
        self,
        source: Union[str, Path, np.ndarray, Sequence],
        conf: float = 0.25,
        iou: float = 0.7,
        max_det: int = 300,
        batch_size: int = 64,  # larger batches amortize per-call latency
                               # (b128 is 3x b32 through the axon tunnel —
                               # PERF.md round 2); short batches are padded
        classes: Optional[Sequence[int]] = None,  # keep only these class ids
        agnostic_nms: bool = False,
        stream: bool = False,  # yield Detections lazily (ultralytics stream=)
        save: bool = False,    # write annotated outputs (ultralytics save=)
        save_dir: Union[str, Path, None] = None,  # default runs/predict
    ):
        """Run detection over images, directories, arrays, or a video file.

        Mirrors the ultralytics predictor surface the reference delegates to:
        ``source`` may be an image path, a directory, an ndarray, a sequence
        of those, or a **video file** (decoded frame-by-frame through cv2 and
        batched through the same compiled program). Directory sources
        iterate image files only (videos inside a directory are skipped —
        pass the video path directly). ``stream=True`` returns a generator
        instead of a list (frames/images are loaded per batch, so long
        videos never materialize in memory); ``save=True`` writes annotated
        images — or, for video, one annotated video with the source fps —
        under ``save_dir`` (default ``runs/predict``, auto-incremented to
        ``predict2``… when it already exists), recording each output path on
        ``Detections.save_path``. With ``stream=True`` on a video, the saved
        mp4 is finalized only when the generator is fully consumed (or
        closed) — an abandoned generator leaves it unplayable until GC runs
        the writer's release.
        """
        import jax
        import jax.numpy as jnp

        from .ops.decode import decode_predictions
        from .ops.letterbox import letterbox_numpy
        from .ops.nms import batched_nms
        from .train.data import load_image

        self._ensure_built()
        model, imgsz = self._model, self.imgsz
        # BN-folded program unless quantized (the quant tree was calibrated
        # against its own fold; quantized_apply closes over it)
        variables = (self._variables if getattr(self, "_quant", None)
                     else self._fused_vars())

        is_video = False
        if isinstance(source, (str, Path)) and str(source).startswith(
            ("http://", "https://")
        ):
            # ultralytics predictor parity: http(s) sources download to a
            # cache first (the reference's rows carry image URLs too —
            # core/utils.py:44-55), then flow through the local-file path,
            # so a URL ending .mp4 plays as video.
            source = self._fetch_url_source(str(source))
        if isinstance(source, (str, Path)):
            p = Path(source)
            if p.suffix.lower() in self.VIDEO_SUFFIXES:
                if not p.is_file():
                    raise FileNotFoundError(f"视频文件不存在：{source}")
                is_video, sources = True, [p]
            else:
                sources = sorted(
                    q for q in p.iterdir()
                    if q.suffix.lower() in {".jpg", ".jpeg", ".png", ".bmp",
                                            ".webp"}
                ) if p.is_dir() else [p]
        elif isinstance(source, np.ndarray):
            sources = [source]
        else:
            sources = [
                self._fetch_url_source(s)
                if isinstance(s, (str, Path)) and str(s).startswith(
                    ("http://", "https://"))
                else s
                for s in source
            ]

        # the jitted program is cached on the instance: a fresh closure per
        # predict() call would retrace + reload the executable every time
        # (conf/iou ride as traced scalars, so threshold sweeps reuse it;
        # max_det is static — a new value compiles once)
        if getattr(self, "_infer_jit", None) is None:
            quant = getattr(self, "_quant", None)
            if quant is not None:
                from .models.quant import quantized_apply

                q_apply = quantized_apply(self._model, *quant)

                def _infer(variables, images, conf_t, iou_t, max_det,
                           agnostic=False):
                    x = images.astype(jnp.bfloat16) / 255.0
                    box, cls = q_apply(x)  # calibrated convs run int8
                    boxes, scores = decode_predictions(box, cls, (imgsz, imgsz))
                    return batched_nms(
                        boxes, scores, conf_thres=conf_t, iou_thres=iou_t,
                        pre_topk=1000, max_det=max_det,
                        class_agnostic=agnostic,
                    )
            else:
                def _infer(variables, images, conf_t, iou_t, max_det,
                           agnostic=False):
                    # raw 0..255 feed: the 1/255 is folded into the fused
                    # stem kernel (_fused_vars) — the explicit divide costs
                    # a full image-tensor layout copy on TPU (PERF.md r5)
                    x = images.astype(jnp.bfloat16)
                    box, cls = self._model.apply(variables, x, train=False)
                    boxes, scores = decode_predictions(box, cls, (imgsz, imgsz))
                    return batched_nms(
                        boxes, scores, conf_thres=conf_t, iou_thres=iou_t,
                        pre_topk=1000, max_det=max_det,
                        class_agnostic=agnostic,
                    )
            self._infer_jit = jax.jit(
                _infer, static_argnames=("max_det", "agnostic")
            )

        def infer(images):
            return self._infer_jit(
                variables, images, jnp.float32(conf), jnp.float32(iou),
                max_det=max_det, agnostic=agnostic_nms,
            )

        def prepare(chunk):
            """Host stage: decode + letterbox one chunk of path / ndarray /
            (label, ndarray) items into a padded batch."""
            imgs, metas = [], []
            for src in chunk:
                if isinstance(src, tuple):
                    label, img = src
                elif isinstance(src, np.ndarray):
                    label, img = None, src
                else:
                    label, img = str(src), load_image(src)
                canvas, r, (px, py) = letterbox_numpy(img, imgsz)
                imgs.append(canvas)
                metas.append((label, img, r, (px, py)))
            batch = np.stack(imgs)
            if len(batch) < batch_size:
                pad = np.zeros(
                    (batch_size - len(batch), imgsz, imgsz, 3), batch.dtype
                )
                batch = np.concatenate([batch, pad])
            return batch, metas

        def finish(handles, metas):
            """Pull the device results for one dispatched batch and map boxes
            back to original-image pixels."""
            ob, osc, ocl, nd = map(np.asarray, handles)
            out = []
            for i, (label, img, r, (px, py)) in enumerate(metas):
                n = int(nd[i])
                boxes, bsc, bcl = ob[i, :n].copy(), osc[i, :n], ocl[i, :n]
                if classes is not None and n:
                    # ultralytics `classes` filter: keep the listed ids only
                    keep = np.isin(bcl, np.asarray(list(classes)))
                    boxes, bsc, bcl = boxes[keep], bsc[keep], bcl[keep]
                    n = len(boxes)
                if n:
                    boxes -= [px, py, px, py]
                    boxes /= r
                    h, w = img.shape[:2]
                    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
                    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
                out.append(Detections(
                    path=label,
                    image=img,
                    boxes=boxes,
                    scores=bsc,
                    classes=bcl,
                    names=self.names,
                ))
            return out

        def pipelined(chunk_iter):
            """Software pipeline over chunks: jax dispatch is async, so
            dispatching batch N then decoding batch N+1 on the host overlaps
            the (1-core) decode with device compute; the result pull for N
            happens only when N+1 is already in flight."""
            pending = None
            for chunk in chunk_iter:
                batch, metas = prepare(chunk)
                handles = infer(jnp.asarray(batch))
                if pending is not None:
                    yield from finish(*pending)
                pending = (handles, metas)
            if pending is not None:
                yield from finish(*pending)

        out_dir = None
        if save:
            if save_dir is not None:
                out_dir = Path(save_dir)
            else:
                # ultralytics semantics: the default run dir auto-increments
                # (runs/predict, runs/predict2, …) so repeat calls never
                # overwrite earlier outputs
                out_dir, k = Path("runs") / "predict", 2
                while out_dir.exists():
                    out_dir = Path("runs") / f"predict{k}"
                    k += 1
            out_dir.mkdir(parents=True, exist_ok=True)

        if is_video:
            gen = self._predict_video(
                sources[0], pipelined, batch_size, out_dir
            )
        else:
            def _gen_images():
                chunks = (
                    sources[s : s + batch_size]
                    for s in range(0, len(sources), batch_size)
                )
                used = set()
                for j, det in enumerate(pipelined(chunks)):
                    if out_dir is not None:
                        name = (Path(det.path).name if det.path
                                else f"image{j}.jpg")
                        # distinct sources sharing a basename (or an ndarray
                        # fallback name shadowing a real file) must not
                        # overwrite each other
                        stem, suf = Path(name).stem, Path(name).suffix
                        final, n = name, 1
                        while final in used:
                            final = f"{stem}_{n}{suf}"
                            n += 1
                        used.add(final)
                        det.save_path = det.save(out_dir / final)
                    yield det

            gen = _gen_images()
        return gen if stream else list(gen)

    def _predict_video(self, path, pipelined, batch_size, out_dir):
        """Frame generator for video sources: cv2 decode (BGR→RGB) →
        batched detection through the software pipeline (frame decode for
        chunk N+1 overlaps the device running chunk N); with ``out_dir``
        set, re-encodes the annotated frames at the source fps as
        ``<stem>_pred.mp4``."""
        from .train.data import cv2

        if cv2 is None:  # pragma: no cover - cv2 is in the baked image
            raise RuntimeError("视频推理需要 opencv-python (cv2)")
        cap = cv2.VideoCapture(str(path))
        if not cap.isOpened():
            raise RuntimeError(f"无法打开视频：{path}")
        writer = None
        save_path = None
        if out_dir is not None:
            fps = cap.get(cv2.CAP_PROP_FPS) or 0.0
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            save_path = Path(out_dir) / f"{Path(path).stem}_pred.mp4"
            writer = cv2.VideoWriter(
                str(save_path), cv2.VideoWriter_fourcc(*"mp4v"),
                fps if fps > 0 else 30.0, (w, h),
            )
            if not writer.isOpened():
                cap.release()
                raise RuntimeError(
                    f"无法创建视频输出 (mp4v codec): {save_path}"
                )

        def frame_chunks():
            frames, idx, done = [], 0, False
            while not done:
                ok, bgr = cap.read()
                if ok:
                    frames.append((
                        f"{path}#frame{idx}",
                        cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB),
                    ))
                    idx += 1
                else:
                    done = True
                if frames and (len(frames) == batch_size or done):
                    yield frames
                    frames = []

        try:
            for det in pipelined(frame_chunks()):
                if writer is not None:
                    writer.write(cv2.cvtColor(det.plot(), cv2.COLOR_RGB2BGR))
                    det.save_path = save_path
                yield det
        finally:
            cap.release()
            if writer is not None:
                writer.release()

    # ------------------------------------------------------------------ int8

    def quantize_int8(self, calib_source, max_images: int = 64,
                      batch_size: int = 16) -> "YOLO":
        """Switch predict() to the post-training int8 (w8a8) serving path.

        ``calib_source`` accepts the same forms as predict() (directory,
        paths, arrays); a few dozen representative images calibrate the
        per-conv activation ranges. Weights quantize per-output-channel over
        the BN-folded kernels; depthwise and detect-head logit convs stay
        full precision (models/quant.py). Measured on v5e: int8 matmuls
        run ~2x bf16 but XLA's conv lowering only reaches ~1.1x, so this
        path trades ~4% throughput for 4x-smaller weights (PERF.md round 5).
        """
        import jax.numpy as jnp

        from .models.quant import quantize_int8 as _quantize
        from .models.yolo11 import fuse_conv_bn
        from .ops.letterbox import letterbox_numpy
        from .train.data import load_image

        self._ensure_built()
        if isinstance(calib_source, (str, Path)):
            p = Path(calib_source)
            srcs = sorted(
                q for q in p.iterdir()
                if q.suffix.lower() in {".jpg", ".jpeg", ".png", ".bmp", ".webp"}
            ) if p.is_dir() else [p]
        elif isinstance(calib_source, np.ndarray):
            srcs = [calib_source]
        else:
            srcs = list(calib_source)
        srcs = srcs[:max_images]
        if not srcs:
            raise ValueError("quantize_int8 needs at least one calibration image")

        fused = fuse_conv_bn(self._variables)

        def batches():
            for start in range(0, len(srcs), batch_size):
                imgs = []
                for src in srcs[start:start + batch_size]:
                    img = src if isinstance(src, np.ndarray) else load_image(src)
                    canvas, _, _ = letterbox_numpy(img, self.imgsz)
                    imgs.append(canvas)
                yield jnp.asarray(
                    np.stack(imgs).astype(np.float32) / 255.0
                ).astype(jnp.bfloat16)

        qtree = _quantize(self._model, fused, batches())
        self._quant = (fused, qtree)
        self._infer_jit = None  # predict() re-jits onto the int8 path
        return self

    # ----------------------------------------------------------------- export

    def export(self, out_dir) -> "Path":
        """Write a serving bundle: BN-folded inference variables + metadata
        (scale, nc, names, imgsz). Load with YOLO.from_export()."""
        import json as _json

        import jax
        import orbax.checkpoint as ocp

        from .models.yolo11 import fuse_conv_bn

        self._ensure_built()
        out_dir = Path(out_dir).resolve()
        fused = fuse_conv_bn(jax.device_get(self._variables))
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(out_dir / "variables", fused, force=True)
        quant = getattr(self, "_quant", None)
        if quant is not None:
            # int8 calibration round-trips with the bundle: {path string ->
            # {w_int8, w_scale, a_scale}} (orbax-friendly nested dict)
            qsave = {
                "/".join(p): jax.device_get(q) for p, q in quant[1].items()
            }
            with ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(out_dir / "quant", qsave, force=True)
        (out_dir / "meta.json").write_text(_json.dumps({
            "family": self.family,
            "scale": self.scale,
            "nc": self.nc,
            "names": list(self.names),
            "imgsz": self.imgsz,
            "fused": True,
            "int8": quant is not None,
        }, ensure_ascii=False))
        return out_dir

    def export_stablehlo(
        self,
        out_dir,
        batch_size: Optional[int] = None,
        max_det: int = 300,
        use_pallas: bool = False,
    ) -> "Path":
        """Write a portable compiled serving artifact: the FULL inference
        program (uint8 NHWC letterboxed batch -> NMS'd detections) serialized
        as StableHLO via jax.export, weights baked in as constants.

        The artifact is loadable by any JAX process via
        ``YOLO.load_stablehlo`` (or ``jax.export.deserialize`` directly —
        this package is not needed at serving time) and compiles for CPU and
        TPU. conf/iou stay runtime scalars, so a serving frontend can sweep
        thresholds without re-export. batch_size=None (default) exports a
        SYMBOLIC batch dimension — one artifact serves every batch size
        (each distinct size compiles once at load). ``use_pallas=True``
        embeds the fused
        Mosaic NMS kernel and makes the artifact TPU-only; the default uses
        the portable XLA formulation. Replaces the ``model.export()`` serving
        capability the reference delegates to ultralytics (SURVEY §2.2)."""
        import json as _json

        import jax
        import jax.numpy as jnp
        from jax import export as jexport

        from .models.yolo11 import fuse_conv_bn
        from .ops.decode import decode_predictions
        from .ops.nms import batched_nms

        if use_pallas and jax.default_backend() != "tpu":
            # the interpret flag inside batched_nms resolves at trace time:
            # exporting from a CPU process would silently bake the Pallas
            # INTERPRETER into the artifact instead of the Mosaic kernel
            raise ValueError(
                "use_pallas=True requires exporting from a TPU-backed "
                f"process (current backend: {jax.default_backend()}); "
                "the portable default (use_pallas=False) works everywhere"
            )
        self._ensure_built()
        model, imgsz = self._model, self.imgsz
        fused = fuse_conv_bn(jax.device_get(self._variables))

        def serve(images, conf, iou):
            x = images.astype(jnp.bfloat16) / 255.0
            box, cls = model.apply(fused, x, train=False)
            boxes, scores = decode_predictions(box, cls, (imgsz, imgsz))
            return batched_nms(
                boxes, scores, conf_thres=conf, iou_thres=iou,
                pre_topk=1000, max_det=max_det, use_pallas=use_pallas,
            )

        if batch_size is None:
            if use_pallas:
                # vmapped pallas_call needs a concrete grid: a symbolic batch
                # dim dies in lowering with a bare AssertionError
                raise ValueError(
                    "use_pallas=True requires a concrete batch_size "
                    "(the Mosaic NMS kernel's grid cannot be symbolic)"
                )
            (bdim,) = jexport.symbolic_shape("b")
        else:
            bdim = batch_size
        args = (
            jax.ShapeDtypeStruct((bdim, imgsz, imgsz, 3), jnp.uint8),
            jax.ShapeDtypeStruct((), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),
        )
        platforms = None if use_pallas else ("cpu", "tpu")
        from .models import blocks as _blocks

        # the portable artifact must not bake Mosaic kernels: pin the
        # area-attention auto gate off while lowering (yolo12 on a TPU
        # process would otherwise embed the TPU-only attention kernel);
        # use_pallas=True artifacts are TPU-only anyway, keep the gate auto
        _saved_gate = _blocks.AATTN_PALLAS
        if not use_pallas:
            _blocks.AATTN_PALLAS = False
        try:
            exported = jexport.export(
                jax.jit(serve), platforms=platforms
            )(*args)
        finally:
            _blocks.AATTN_PALLAS = _saved_gate

        out_dir = Path(out_dir).resolve()
        out_dir.mkdir(parents=True, exist_ok=True)
        (out_dir / "model.stablehlo").write_bytes(exported.serialize())
        (out_dir / "meta.json").write_text(_json.dumps({
            "family": self.family,
            "scale": self.scale,
            "nc": self.nc,
            "names": list(self.names),
            "imgsz": self.imgsz,
            "batch_size": batch_size,
            "max_det": max_det,
            "outputs": ["boxes", "scores", "classes", "num_det"],
            "inputs": ["images_u8_nhwc", "conf", "iou"],
            "platforms": list(platforms) if platforms else [jax.default_backend()],
        }, ensure_ascii=False))
        return out_dir

    @staticmethod
    def load_stablehlo(bundle_dir):
        """Load an export_stablehlo artifact; returns (callable, meta). The
        callable maps (images_u8, conf, iou) -> (boxes, scores, classes,
        num_det) and runs on whatever backend JAX selects."""
        import json as _json

        import jax
        from jax import export as jexport

        bundle_dir = Path(bundle_dir).resolve()
        exported = jexport.deserialize(
            (bundle_dir / "model.stablehlo").read_bytes()
        )
        meta = _json.loads((bundle_dir / "meta.json").read_text())
        return jax.jit(exported.call), meta

    @classmethod
    def from_export(cls, bundle_dir) -> "YOLO":
        """Load a serving bundle written by export()."""
        import json as _json

        import orbax.checkpoint as ocp

        bundle_dir = Path(bundle_dir).resolve()
        meta = _json.loads((bundle_dir / "meta.json").read_text())
        family = meta.get("family", "yolo11")  # pre-registry bundles: yolo11
        model = cls(f"{family}{meta['scale']}", nc=meta["nc"], imgsz=meta["imgsz"])
        model.names = meta["names"]
        model._ensure_built()
        with ocp.PyTreeCheckpointer() as ckptr:
            model._variables = ckptr.restore(bundle_dir / "variables")
        model._weights_loaded = True
        if meta.get("int8"):
            import jax.numpy as jnp

            with ocp.PyTreeCheckpointer() as ckptr:
                qsave = ckptr.restore(bundle_dir / "quant")
            qtree = {
                tuple(k.split("/")): {
                    "w_int8": jnp.asarray(q["w_int8"], jnp.int8),
                    "w_scale": jnp.asarray(q["w_scale"], jnp.float32),
                    "a_scale": jnp.float32(q["a_scale"]),
                }
                for k, q in qsave.items()
            }
            # variables in the bundle are already BN-folded
            model._quant = (model._variables, qtree)
        return model

    # -------------------------------------------------------------------- val

    def val(self, data: str, int8: bool = False, **kwargs) -> Dict[str, float]:
        from .train.trainer import TrainConfig, Trainer

        cfg = TrainConfig(model=self.model_spec, data=data, val=True)
        for k, v in kwargs.items():
            if hasattr(cfg, k):
                setattr(cfg, k, v)
        eval_apply = None
        if int8:
            if getattr(self, "_quant", None) is None:
                raise ValueError("call quantize_int8() before val(int8=True)")
            from .models.quant import quantized_apply

            eval_apply = quantized_apply(self._model, *self._quant)
        trainer = Trainer(cfg, eval_apply=eval_apply)
        if self._variables is not None:
            import jax.numpy as jnp

            trainer.state = trainer.state._replace(
                params=self._variables["params"],
                ema_params=self._variables["params"],
                batch_stats=self._variables["batch_stats"],
            )
        metrics, losses = trainer.validate(save_artifacts=False)
        return metrics
