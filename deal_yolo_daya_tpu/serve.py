"""Production serving: concurrent micro-batching inference engine + HTTP
frontend.

The reference's serving story ends at ultralytics ``model.export()``
(reference: pyproject.toml:21 — TensorRT/ONNX artifacts for an external
server). Here serving is first-class: requests from any number of client
threads are coalesced into device batches, because on TPU — especially
through a tunneled backend — per-call dispatch latency dominates small
batches (PERF.md round 2: b128 is ~3x b32 img/s on the same chip). A
deadline-based micro-batcher is the standard way to buy that factor for
online traffic.

Design (TPU-first):

- Fixed-shape buckets: a request batch is padded up to a power-of-two
  bucket size (1, 2, 4, ... max_batch). Each bucket compiles ONCE; the
  number of executables is log2(max_batch)+1, not one per request count.
- The dispatcher thread drains the queue, forms the largest ready batch,
  and dispatches. JAX dispatch is async: the engine keeps up to
  ``max_in_flight`` device batches pending and fans results back through
  per-request futures from a completion worker, so host pre/post-processing
  (letterbox, box un-mapping) overlaps device execution.
- conf/iou ride as traced scalars (one executable serves any threshold);
  max_det is static.

Usage::

    eng = Engine(YOLO("yolo11n"))            # or YOLO.from_export(dir)
    with eng:
        fut = eng.submit(rgb_u8_array)       # returns concurrent Future
        dets = fut.result()                  # api.Detections
    print(eng.stats())

    serve_http(eng, port=8000)               # stdlib HTTP frontend:
    # POST /predict  (image bytes; ?conf=&iou=)  -> JSON detections
    # GET  /healthz, /stats
"""

from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class _Request:
    image: np.ndarray               # original RGB uint8 (H, W, 3)
    canvas: np.ndarray              # letterboxed (imgsz, imgsz, 3)
    ratio: float
    pad: Tuple[int, int]
    future: Future
    t_submit: float


@dataclass
class ServeStats:
    """Rolling serving metrics (thread-safe snapshots via Engine.stats)."""

    requests: int = 0
    completed: int = 0
    errors: int = 0
    batches: int = 0
    padded_slots: int = 0
    batch_sizes: List[int] = field(default_factory=list)
    latencies_ms: List[float] = field(default_factory=list)

    def snapshot(self) -> Dict[str, float]:
        lat = sorted(self.latencies_ms[-2048:])
        n = len(lat)
        out = {
            "requests": self.requests,
            "completed": self.completed,
            "errors": self.errors,
            "batches": self.batches,
            "avg_batch": (sum(self.batch_sizes[-2048:]) /
                          max(len(self.batch_sizes[-2048:]), 1)),
            "pad_fraction": (self.padded_slots /
                             max(self.padded_slots + self.completed, 1)),
        }
        if n:
            out["p50_ms"] = lat[n // 2]
            out["p95_ms"] = lat[min(n - 1, int(n * 0.95))]
        return out


class Engine:
    """Micro-batching inference engine over an ``api.YOLO`` handle.

    Parameters
    ----------
    model:        a built (or buildable) api.YOLO; its imgsz/weights/int8
                  state define the serving program.
    max_batch:    largest device batch (power of two recommended).
    max_wait_ms:  how long the oldest queued request may wait for the batch
                  to fill before dispatching a partial batch.
    max_in_flight: device batches allowed pending before the dispatcher
                  blocks (2 = classic double buffering).
    conf, iou:    default thresholds (overridable per request).
    """

    def __init__(self, model, max_batch: int = 32, max_wait_ms: float = 5.0,
                 max_in_flight: int = 2, conf: float = 0.25, iou: float = 0.7,
                 max_det: int = 300):
        model._ensure_built()
        self.model = model
        self.imgsz = int(model.imgsz)
        self.max_batch = max(1, int(max_batch))
        self.max_wait_s = max_wait_ms / 1e3
        self.conf, self.iou, self.max_det = conf, iou, max_det
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._pending: "queue.Queue" = queue.Queue(maxsize=max(1, max_in_flight))
        self._stats = ServeStats()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []
        self._infer = None  # built lazily on first batch (jit program)

    # ------------------------------------------------------------------ build

    def _build(self):
        import jax
        import jax.numpy as jnp

        from .ops.decode import decode_predictions
        from .ops.nms import batched_nms

        model, imgsz = self.model._model, self.imgsz
        quant = getattr(self.model, "_quant", None)
        # BN-folded program unless quantized (quant calibrated its own fold)
        variables = (self.model._variables if quant
                     else self.model._fused_vars())
        if quant is not None:
            from .models.quant import quantized_apply

            apply_fn = quantized_apply(model, *quant)

            def net(images):
                # quant calibrated on 0..1 inputs: divide before the convs
                return apply_fn(images / 255.0)
        else:
            def net(images):
                # raw 0..255 feed — 1/255 folded into the fused stem kernel
                # (the explicit divide costs an image-sized layout copy)
                return model.apply(variables, images, train=False)

        def _serve(images, conf_t, iou_t):
            x = images.astype(jnp.bfloat16)
            box, cls = net(x)
            boxes, scores = decode_predictions(box, cls, (imgsz, imgsz))
            return batched_nms(
                boxes, scores, conf_thres=conf_t, iou_thres=iou_t,
                pre_topk=1000, max_det=self.max_det,
            )

        self._infer = jax.jit(_serve)
        self._jnp = jnp

    def _bucket(self, n: int) -> int:
        b = 1
        while b < n:
            b <<= 1
        return min(b, self.max_batch)

    # ------------------------------------------------------------------ API

    def start(self):
        if self._threads:
            return self
        self._stop.clear()
        for name, fn in (("dyd-serve-dispatch", self._dispatch_loop),
                         ("dyd-serve-complete", self._complete_loop)):
            t = threading.Thread(target=fn, name=name, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.shutdown()

    def shutdown(self, timeout: float = 30.0):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=timeout)
        # under the lock, so a submit() racing the guard either lands its
        # request before this drain (and gets failed here) or sees the
        # cleared thread list and raises — never an unwatched queue entry
        with self._lock:
            self._threads.clear()
            while True:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                req.future.set_exception(RuntimeError("engine shut down"))

    def warmup(self, buckets: Optional[List[int]] = None):
        """Compile every bucket executable before taking traffic.

        Each power-of-two bucket size is a distinct XLA program; on a
        tunnel-attached TPU one compile can cost tens of seconds, which
        otherwise lands on the first unlucky live requests (the round-5
        serve bench measured p50 = 22 s because buckets 2/4/16/32 compiled
        mid-window). Call once at deploy time, before or after ``start()``.
        """
        with self._lock:
            if self._infer is None:
                self._build()
        jnp = self._jnp
        if buckets is None:
            buckets, b = [], 1
            while b < self.max_batch:
                buckets.append(b)
                b <<= 1
            buckets.append(self.max_batch)
        for n in buckets:
            x = jnp.asarray(
                np.zeros((n, self.imgsz, self.imgsz, 3), np.uint8))
            out = self._infer(
                x, jnp.float32(self.conf), jnp.float32(self.iou))
            np.asarray(out[3])  # block until this bucket's program is live
        return self

    def submit(self, image: np.ndarray, conf: Optional[float] = None,
               iou: Optional[float] = None) -> Future:
        """Enqueue one RGB uint8 (H, W, 3) image; resolves to Detections.

        Letterboxing happens on the caller's thread (scales across client
        threads; the single dispatcher stays device-bound). Per-request
        conf/iou would splinter batches, so they are engine-level here;
        pass at construction or use separate engines per threshold policy.
        """
        if conf is not None or iou is not None:
            # traced scalars are per-BATCH; honoring per-request values
            # inside a shared batch would re-run NMS per distinct pair.
            raise ValueError(
                "per-request conf/iou not supported; configure the Engine "
                "(thresholds are batch-wide traced scalars)"
            )
        from .ops.letterbox import letterbox_numpy

        if image.ndim != 3 or image.shape[-1] != 3:
            raise ValueError(f"expected (H, W, 3) RGB image, got {image.shape}")
        canvas, r, pad = letterbox_numpy(image, self.imgsz)
        fut: Future = Future()
        req = _Request(image, canvas, r, pad, fut, time.perf_counter())
        with self._lock:
            if self._stop.is_set() and not self._threads:
                # post-shutdown submits would otherwise queue forever with
                # no dispatcher left to fail them; guard+put share the lock
                # with shutdown's drain, so no request can slip between
                raise RuntimeError("engine is shut down")
            self._stats.requests += 1
            self._queue.put(req)
        return fut

    def stats(self) -> Dict[str, float]:
        with self._lock:
            return self._stats.snapshot()

    # ------------------------------------------------------------ internals

    def _dispatch_loop(self):
        import jax  # noqa: F401  (device work happens on this thread)

        with self._lock:  # warmup() may be building on another thread
            if self._infer is None:
                self._build()
        jnp = self._jnp
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            # under backpressure the queue already holds a backlog — take it
            # without consulting the deadline (load must GROW batches, not
            # shrink them to singles because the oldest request aged out)
            while len(batch) < self.max_batch:
                try:
                    batch.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            deadline = first.t_submit + self.max_wait_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            bucket = self._bucket(len(batch))
            canvases = np.stack([r.canvas for r in batch])
            if bucket > len(batch):
                canvases = np.concatenate([
                    canvases,
                    np.zeros((bucket - len(batch), self.imgsz, self.imgsz, 3),
                             canvases.dtype),
                ])
            # async dispatch: hand device arrays to the completion worker
            # and immediately go form the next batch
            out = self._infer(
                jnp.asarray(canvases),
                jnp.float32(self.conf), jnp.float32(self.iou),
            )
            with self._lock:
                self._stats.batches += 1
                self._stats.batch_sizes.append(len(batch))
                self._stats.padded_slots += bucket - len(batch)
            self._pending.put((batch, out))  # blocks at max_in_flight
        # drain marker for the completion worker
        self._pending.put(None)

    def _complete_loop(self):
        from .api import Detections

        while True:
            item = self._pending.get()
            if item is None:
                break
            batch, out = item
            try:
                ob, osc, ocl, nd = map(np.asarray, out)  # blocks on device
            except Exception as e:  # device failure: fail the whole batch
                with self._lock:
                    self._stats.errors += len(batch)
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
                continue
            t_done = time.perf_counter()
            for i, r in enumerate(batch):
                n = int(nd[i])
                boxes = ob[i, :n].copy()
                if n:
                    px, py = r.pad
                    boxes -= [px, py, px, py]
                    boxes /= r.ratio
                    h, w = r.image.shape[:2]
                    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
                    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
                det = Detections(
                    path=None, image=r.image, boxes=boxes,
                    scores=osc[i, :n], classes=ocl[i, :n],
                    names=self.model.names,
                )
                if not r.future.cancelled():
                    r.future.set_result(det)
                with self._lock:
                    self._stats.completed += 1
                    self._stats.latencies_ms.append((t_done - r.t_submit) * 1e3)


# ---------------------------------------------------------------------- HTTP


def serve_http(engine: Engine, host: str = "127.0.0.1", port: int = 8000,
               block: bool = True):
    """Minimal stdlib HTTP frontend over an Engine.

    POST /predict (body = JPEG/PNG/BMP/WebP bytes) -> JSON
      {"boxes": [[x1,y1,x2,y2],...], "scores": [...], "classes": [...],
       "names": [...], "num": N}
    GET /healthz -> {"ok": true}; GET /stats -> ServeStats snapshot.

    Returns the ThreadingHTTPServer (caller owns shutdown when block=False).
    """
    import io
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from PIL import Image

    engine.start()

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: dict):
            body = json.dumps(payload, ensure_ascii=False).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                self._json(200, {"ok": True})
            elif self.path.startswith("/stats"):
                self._json(200, engine.stats())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if not self.path.startswith("/predict"):
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length)
                img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
                det = engine.submit(img).result(timeout=120)
                self._json(200, {
                    "boxes": np.asarray(det.boxes, np.float64).round(2).tolist(),
                    "scores": np.asarray(det.scores, np.float64).round(4).tolist(),
                    "classes": np.asarray(det.classes, np.int64).tolist(),
                    "names": [
                        det.names[int(c)] if 0 <= int(c) < len(det.names)
                        else str(int(c))
                        for c in det.classes
                    ],
                    "num": len(det),
                })
            except Exception as e:  # surface the failure to the client
                self._json(500, {"error": str(e)})

        def log_message(self, *args):  # quiet access log
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    if block:
        try:
            server.serve_forever()
        finally:
            server.server_close()
            engine.shutdown()
    return server
