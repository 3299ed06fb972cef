"""Annotation visualizer tests (step 9) — offline, local-path sources."""

import json

import numpy as np
import pandas as pd
from PIL import Image

from deal_yolo_daya_tpu.datakit.visualize import download_and_draw_annotations
from deal_yolo_daya_tpu.datakit.labels import LABEL_JSON_COL, NEW_LABEL_JSON_COL


def _ann(objs, w, h):
    return json.dumps({"width": w, "height": h, "objects": [
        {"name": n, "polygon": {"ptList": [{"x": x, "y": y} for x, y in pts]}}
        for n, pts in objs]}, ensure_ascii=False)


def test_draw_rect_and_polygon(tmp_path):
    img_path = tmp_path / "im.jpg"
    Image.new("RGB", (200, 150), (80, 80, 80)).save(img_path)
    orig = _ann([("多边形", [(20, 20), (120, 30), (100, 100)])], 200, 150)
    conv = _ann([("多边形", [(20, 20), (120, 100)])], 200, 150)
    df = pd.DataFrame([{
        "source": str(img_path),
        LABEL_JSON_COL: orig,
        NEW_LABEL_JSON_COL: conv,
    }])
    csv = tmp_path / "in.csv"
    df.to_csv(csv, index=False, encoding="utf-8-sig")

    result = download_and_draw_annotations(str(csv), str(tmp_path))
    assert result["success"] == 1 and result["fail"] == 0
    out = np.asarray(Image.open(tmp_path / "annotated_images" / "im.jpg"))
    # red (original polygon) and green (converted box) pixels exist
    red = (out[:, :, 0] > 200) & (out[:, :, 1] < 90) & (out[:, :, 2] < 90)
    green = (out[:, :, 1] > 200) & (out[:, :, 0] < 90) & (out[:, :, 2] < 90)
    assert red.any() and green.any()


def test_missing_columns_graceful(tmp_path):
    csv = tmp_path / "bad.csv"
    pd.DataFrame([{"source": "x.jpg"}]).to_csv(csv, index=False, encoding="utf-8-sig")
    assert download_and_draw_annotations(str(csv), str(tmp_path)) is None


def test_max_images_limit(tmp_path):
    rows = []
    for i in range(4):
        p = tmp_path / f"{i}.jpg"
        Image.new("RGB", (40, 40)).save(p)
        rows.append({
            "source": str(p),
            LABEL_JSON_COL: _ann([("a", [(1, 1), (10, 10)])], 40, 40),
            NEW_LABEL_JSON_COL: _ann([("a", [(1, 1), (10, 10)])], 40, 40),
        })
    csv = tmp_path / "in.csv"
    pd.DataFrame(rows).to_csv(csv, index=False, encoding="utf-8-sig")
    result = download_and_draw_annotations(str(csv), str(tmp_path), max_images=2)
    assert result["success"] == 2
