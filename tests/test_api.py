"""api.YOLO surface tests: predict shapes, coordinate mapping, plot/save."""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from deal_yolo_daya_tpu.api import YOLO, Detections


def test_predict_on_array_and_file(tmp_path):
    model = YOLO("yolo11n", nc=3, imgsz=64)
    img = np.random.default_rng(0).integers(0, 255, (48, 80, 3), dtype=np.uint8)
    p = tmp_path / "im.png"
    Image.fromarray(img).save(p)

    dets_arr = model.predict(img, conf=0.9)
    dets_file = model.predict(str(p), conf=0.9)
    assert len(dets_arr) == 1 and len(dets_file) == 1
    d = dets_file[0]
    assert d.path == str(p)
    assert d.image.shape == (48, 80, 3)
    # boxes (possibly none at conf .9 untrained) are in original-image space
    if len(d):
        assert (d.boxes[:, [0, 2]] <= 80).all()
        assert (d.boxes[:, [1, 3]] <= 48).all()


def test_predict_directory_batching(tmp_path):
    model = YOLO("yolo11n", nc=2, imgsz=64)
    for i in range(3):
        Image.fromarray(
            np.full((32, 32, 3), 90 + i, np.uint8)
        ).save(tmp_path / f"{i}.jpg")
    dets = model.predict(tmp_path, conf=0.99, batch_size=2)
    assert len(dets) == 3
    assert [Path(d.path).name for d in dets] == ["0.jpg", "1.jpg", "2.jpg"]


def test_detections_plot_and_save(tmp_path):
    img = np.zeros((40, 40, 3), np.uint8)
    d = Detections(
        path=None, image=img,
        boxes=np.array([[5, 5, 30, 30]], np.float32),
        scores=np.array([0.8], np.float32),
        classes=np.array([0]),
        names=["猫"],
    )
    out = d.plot()
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn
    path = d.save(tmp_path / "out.jpg")
    assert Path(path).stat().st_size > 0


def test_parse_scale_variants():
    from deal_yolo_daya_tpu.train.trainer import parse_scale

    assert parse_scale("yolo11n") == "n"
    assert parse_scale("yolo11x.yaml") == "x"
    assert parse_scale("/models/yolo11m.yaml") == "m"
    assert parse_scale("s") == "s"
    assert parse_scale("unknown_model") == "n"


def test_stablehlo_export_roundtrip(tmp_path):
    import jax.numpy as jnp
    import numpy as np

    model = YOLO("yolo11n", nc=2, imgsz=64)
    model._ensure_built()
    bundle = model.export_stablehlo(tmp_path / "shlo", batch_size=2, max_det=16)
    assert (bundle / "model.stablehlo").exists()

    fn, meta = YOLO.load_stablehlo(bundle)
    assert meta["platforms"] == ["cpu", "tpu"]
    imgs = np.random.default_rng(2).integers(0, 255, (2, 64, 64, 3), np.uint8)
    ob, osc, ocl, nd = fn(jnp.asarray(imgs), jnp.float32(0.001), jnp.float32(0.7))
    assert ob.shape == (2, 16, 4) and osc.shape == (2, 16)

    # the deserialized program matches the live inference path exactly
    import jax

    from deal_yolo_daya_tpu.models.yolo11 import fuse_conv_bn
    from deal_yolo_daya_tpu.ops.decode import decode_predictions
    from deal_yolo_daya_tpu.ops.nms import batched_nms

    fused = fuse_conv_bn(jax.device_get(model._variables))
    x = jnp.asarray(imgs).astype(jnp.bfloat16) / 255.0
    box, cls = model._model.apply(fused, x, train=False)
    b, s = decode_predictions(box, cls, (64, 64))
    ref = batched_nms(b, s, 0.001, 0.7, pre_topk=1000, max_det=16,
                      use_pallas=False)
    for r, g in zip(ref, (ob, osc, ocl, nd)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g), atol=1e-5)

    # conf is a runtime scalar: sweeping it reuses the same artifact
    _, _, _, nd_hi = fn(jnp.asarray(imgs), jnp.float32(0.9), jnp.float32(0.7))
    assert int(nd_hi.sum()) <= int(nd.sum())

    # default export carries a SYMBOLIC batch dim: one artifact, any batch
    bundle2 = model.export_stablehlo(tmp_path / "shlo_sym", max_det=16)
    fn2, meta2 = YOLO.load_stablehlo(bundle2)
    assert meta2["batch_size"] is None
    for bs in (1, 3):
        imgs_n = np.random.default_rng(bs).integers(
            0, 255, (bs, 64, 64, 3), np.uint8
        )
        ob_n, _, _, nd_n = fn2(jnp.asarray(imgs_n), jnp.float32(0.001),
                               jnp.float32(0.7))
        assert ob_n.shape == (bs, 16, 4)

    # exporting the Mosaic kernel from a non-TPU process must refuse loudly
    # (it would silently bake the Pallas interpreter into the artifact)
    import jax as _jax
    import pytest

    if _jax.default_backend() != "tpu":
        with pytest.raises(ValueError, match="use_pallas"):
            model.export_stablehlo(tmp_path / "bad", use_pallas=True)


def test_export_and_reload_roundtrip(tmp_path):
    import numpy as np

    model = YOLO("yolo11n", nc=2, imgsz=64)
    model.names = ["猫", "狗"]
    img = np.random.default_rng(1).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    before = model.predict(img, conf=0.001, max_det=10)[0]

    bundle = model.export(tmp_path / "bundle")
    assert (bundle / "meta.json").exists()

    loaded = YOLO.from_export(bundle)
    assert loaded.names == ["猫", "狗"]
    assert loaded.nc == 2
    after = loaded.predict(img, conf=0.001, max_det=10)[0]
    # BN folding preserves inference outputs
    assert len(before) == len(after)
    if len(before):
        np.testing.assert_allclose(before.boxes, after.boxes, atol=1.0)


def test_detections_to_records_json_df():
    from deal_yolo_daya_tpu.api import Detections

    det = Detections(
        path=None, image=np.zeros((32, 32, 3), np.uint8),
        boxes=np.array([[1.0, 2.0, 10.0, 12.0], [3.0, 4.0, 8.0, 9.0]]),
        scores=np.array([0.9, 0.5]), classes=np.array([1, 0]),
        names=["猫", "dog"],
    )
    recs = det.to_records()
    assert [r["name"] for r in recs] == ["dog", "猫"]
    assert recs[0]["box"] == {"x1": 1.0, "y1": 2.0, "x2": 10.0, "y2": 12.0}
    import json

    parsed = json.loads(det.to_json())
    assert parsed == recs and "猫" in det.to_json()
    df = det.to_df()
    assert list(df["confidence"]) == [0.9, 0.5]


def test_predict_classes_filter_and_agnostic_nms():
    model = YOLO("yolo11n", nc=3, imgsz=64)
    img = np.random.default_rng(2).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    allcls = model.predict(img, conf=0.001, max_det=20)[0]
    only0 = model.predict(img, conf=0.001, max_det=20, classes=[0])[0]
    assert (np.asarray(only0.classes) == 0).all()
    n0 = int((np.asarray(allcls.classes) == 0).sum())
    assert len(only0) == n0
    # agnostic NMS suppresses across classes -> never MORE detections
    agn = model.predict(img, conf=0.001, max_det=20, agnostic_nms=True)[0]
    assert len(agn) <= len(allcls)


def test_predict_video_stream_and_save(tmp_path):
    """Video source parity with the ultralytics predictor: frames decode
    through cv2, batch through the same compiled program, stream=True is
    lazy, and save=True re-encodes an annotated video at the source fps."""
    cv2 = pytest.importorskip("cv2")
    vid = tmp_path / "clip.mp4"
    rng = np.random.default_rng(3)
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 12, (80, 48))
    frames = rng.integers(0, 255, (5, 48, 80, 3), dtype=np.uint8)
    for f in frames:
        w.write(f)
    w.release()

    model = YOLO("yolo11n", nc=2, imgsz=64)
    gen = model.predict(
        vid, conf=0.001, max_det=5, batch_size=2, stream=True,
        save=True, save_dir=tmp_path / "out",
    )
    import types

    assert isinstance(gen, types.GeneratorType)  # stream=True is lazy
    dets = list(gen)
    assert len(dets) == 5
    assert [d.path for d in dets] == [f"{vid}#frame{i}" for i in range(5)]
    assert all(d.image.shape == (48, 80, 3) for d in dets)
    for d in dets:
        if len(d):
            assert (d.boxes[:, [0, 2]] <= 80).all()
            assert (d.boxes[:, [1, 3]] <= 48).all()
    out = tmp_path / "out" / "clip_pred.mp4"
    assert dets[0].save_path == out and out.stat().st_size > 0
    cap = cv2.VideoCapture(str(out))
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
    assert abs(cap.get(cv2.CAP_PROP_FPS) - 12) < 0.5  # source fps carried over
    cap.release()

    with pytest.raises(FileNotFoundError):
        model.predict(tmp_path / "missing.mp4")


def test_predict_image_save_and_stream(tmp_path):
    model = YOLO("yolo11n", nc=2, imgsz=64)
    img = np.random.default_rng(4).integers(0, 255, (32, 40, 3), dtype=np.uint8)
    p = tmp_path / "a.png"
    Image.fromarray(img).save(p)
    dets = model.predict(
        [str(p), img], conf=0.001, max_det=5,
        save=True, save_dir=tmp_path / "pred",
    )
    assert len(dets) == 2
    assert dets[0].save_path == tmp_path / "pred" / "a.png"
    assert dets[1].save_path == tmp_path / "pred" / "image1.jpg"
    assert all(d.save_path.stat().st_size > 0 for d in dets)
    # stream=True yields the same results lazily
    streamed = list(model.predict([img], conf=0.001, max_det=5, stream=True))
    assert len(streamed) == 1 and streamed[0].save_path is None


def test_predict_save_name_collisions_and_default_dir(tmp_path, monkeypatch):
    """Duplicate output basenames get _N suffixes instead of overwriting,
    and the default save_dir auto-increments like ultralytics run dirs."""
    model = YOLO("yolo11n", nc=2, imgsz=64)
    img = np.random.default_rng(5).integers(0, 255, (32, 40, 3), dtype=np.uint8)
    d1, d2 = tmp_path / "d1", tmp_path / "d2"
    d1.mkdir(), d2.mkdir()
    Image.fromarray(img).save(d1 / "same.png")
    Image.fromarray(img).save(d2 / "same.png")
    # a real file named like the ndarray fallback (image2.jpg for index 2)
    Image.fromarray(img).save(d1 / "image2.jpg")
    dets = model.predict(
        [str(d1 / "same.png"), str(d2 / "same.png"), img,
         str(d1 / "image2.jpg")],
        conf=0.001, max_det=5, save=True, save_dir=tmp_path / "o",
    )
    names = [d.save_path.name for d in dets]
    assert names == ["same.png", "same_1.png", "image2.jpg", "image2_1.jpg"]
    assert all(d.save_path.stat().st_size > 0 for d in dets)

    # default save_dir: runs/predict, then runs/predict2, ...
    monkeypatch.chdir(tmp_path)
    first = model.predict([img], conf=0.001, max_det=5, save=True)
    assert (first[0].save_path.parent.resolve()
            == (tmp_path / "runs" / "predict").resolve())
    second = model.predict([img], conf=0.001, max_det=5, save=True)
    assert (second[0].save_path.parent.resolve()
            == (tmp_path / "runs" / "predict2").resolve())


def test_predict_url_source(tmp_path, monkeypatch):
    """http(s) predict sources download through the datakit cache
    (ultralytics predictor accepts URLs; reference rows carry image URLs,
    core/utils.py:44-55). Second call must hit the cache, not the network."""
    import io
    import tempfile

    from deal_yolo_daya_tpu.datakit import download

    img = np.random.default_rng(1).integers(0, 255, (32, 40, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    payload = buf.getvalue()
    calls = {"n": 0}

    class _Resp:
        content = payload

        def raise_for_status(self):
            pass

    def fake_get(url, stream=True, timeout=15):
        calls["n"] += 1
        return _Resp()

    monkeypatch.setattr(download.requests, "get", fake_get)
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))

    model = YOLO("yolo11n", nc=2, imgsz=64)
    url = "http://host/remote_img.jpg"
    dets = model.predict(url, conf=0.99)
    assert len(dets) == 1 and calls["n"] == 1
    assert dets[0].image.shape == (32, 40, 3)
    assert Path(dets[0].path).name == "remote_img.jpg"

    # mixed list source + cache hit: no second download of the same URL
    dets2 = model.predict([url, img], conf=0.99)
    assert len(dets2) == 2 and calls["n"] == 1

    # unreachable URL surfaces as FileNotFoundError, not a silent skip
    def dead_get(url, stream=True, timeout=15):
        raise IOError("no route")

    monkeypatch.setattr(download.requests, "get", dead_get)
    monkeypatch.setattr(download.time, "sleep", lambda s: None)
    with pytest.raises(FileNotFoundError):
        model.predict("http://host/missing.jpg", conf=0.99)
