"""Serving engine (serve.py): micro-batching, parity with predict(),
stats, shutdown semantics, and the stdlib HTTP frontend."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from deal_yolo_daya_tpu.api import YOLO
from deal_yolo_daya_tpu.serve import Engine, serve_http


@pytest.fixture(scope="module")
def handle():
    y = YOLO("yolo11n", nc=3, imgsz=64)
    y._ensure_built()
    return y


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (48 + 4 * i, 64, 3), np.uint8) for i in range(8)]


def test_engine_results_match_predict(handle, images):
    # the engine's program (letterbox -> net -> decode -> NMS -> unmap) must
    # produce the same detections as api.YOLO.predict for the same inputs;
    # conf=0.001 so random-weight logits actually yield boxes to compare
    want = handle.predict(images, conf=0.001, iou=0.7, batch_size=8)
    eng = Engine(handle, max_batch=4, max_wait_ms=20.0, conf=0.001, iou=0.7)
    with eng:
        futs = [eng.submit(im) for im in images]
        got = [f.result(timeout=600) for f in futs]
    assert [len(g) for g in got] == [len(w) for w in want]
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g.boxes, np.float32), np.asarray(w.boxes, np.float32),
            atol=0.1,
        )
        np.testing.assert_array_equal(g.classes, w.classes)


def test_engine_warmup_precompiles_buckets(handle, images):
    # warmup() must compile every bucket program before traffic (deploy-time
    # cold-start avoidance) and work both before and after start()
    eng = Engine(handle, max_batch=4, max_wait_ms=5.0, conf=0.001)
    eng.warmup()  # before start(): builds + compiles buckets 1, 2, 4
    with eng:
        f = eng.submit(images[0])
        assert f.result(timeout=600) is not None
        eng.warmup([2])  # after start(): idempotent, no queue interaction
    s = eng.stats()
    assert s["completed"] == 1 and s["errors"] == 0


def test_engine_batches_bursts(handle, images):
    eng = Engine(handle, max_batch=4, max_wait_ms=200.0)
    with eng:
        futs = [eng.submit(im) for im in images]
        for f in futs:
            f.result(timeout=600)
    s = eng.stats()
    assert s["completed"] == len(images)
    assert s["errors"] == 0
    # a burst of 8 with a generous window must coalesce into b4 batches,
    # not 8 singles
    assert s["avg_batch"] > 1.5
    assert s["p50_ms"] > 0


def test_engine_concurrent_clients(handle, images):
    eng = Engine(handle, max_batch=4, max_wait_ms=5.0)
    results = {}

    def client(i):
        results[i] = eng.submit(images[i % len(images)]).result(timeout=600)

    with eng:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
    assert len(results) == 12
    assert eng.stats()["completed"] == 12


def test_engine_rejects_bad_input_and_per_request_thresholds(handle):
    eng = Engine(handle, max_batch=2)
    with pytest.raises(ValueError, match="RGB"):
        eng.submit(np.zeros((64, 64), np.uint8))
    with pytest.raises(ValueError, match="conf/iou"):
        eng.submit(np.zeros((64, 64, 3), np.uint8), conf=0.5)


def test_shutdown_fails_queued_requests(handle):
    eng = Engine(handle, max_batch=2)
    # never started: queued request must be failed by shutdown, not hang
    fut = eng.submit(np.zeros((48, 64, 3), np.uint8))
    eng.shutdown()
    with pytest.raises(RuntimeError, match="shut down"):
        fut.result(timeout=10)
    # post-shutdown submits must be rejected up front, not queued forever
    with pytest.raises(RuntimeError, match="shut down"):
        eng.submit(np.zeros((48, 64, 3), np.uint8))


def test_http_frontend(handle, images):
    from PIL import Image

    eng = Engine(handle, max_batch=4, max_wait_ms=5.0, conf=0.001)
    server = serve_http(eng, host="127.0.0.1", port=0, block=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read()) == {"ok": True}

        buf = io.BytesIO()
        Image.fromarray(images[0]).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert set(out) >= {"boxes", "scores", "classes", "names", "num"}
        assert out["num"] == len(out["boxes"]) == len(out["scores"])

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            stats = json.loads(r.read())
        assert stats["completed"] >= 1

        # malformed body -> structured 500, not a hung socket
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"not an image",
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=60)
        assert ei.value.code == 500
    finally:
        server.shutdown()
        server.server_close()
        eng.shutdown()
