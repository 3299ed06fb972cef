"""Annotated-image visualization (pipeline step 9, "download").

Draws original annotations in red and converted 2-point bboxes in green with
class-name text; rectangles for 2-point lists, polygons otherwise; CJK font
fallback chain (reference: core/processor.py:409-514). Host-side PIL by design
— drawing never belongs on the TPU. Downloads are warmed concurrently first.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import pandas as pd
from PIL import Image, ImageDraw, ImageFont

from .download import prefetch_images
from .labels import LABEL_JSON_COL, NEW_LABEL_JSON_COL, parse_data_objects


def _get_font(size: int = 48):
    for name in ("simhei.ttf", "Arial Unicode.ttf"):
        try:
            return ImageFont.truetype(name, size)
        except Exception:
            continue
    return ImageFont.load_default()


def _draw_annotation_boxes(json_str, color, draw, font):
    data, objects, error = parse_data_objects(json_str)
    if error:
        return
    for obj in objects:
        if not isinstance(obj, dict):
            continue
        name = obj.get("name", "未知类别")
        ptlist = obj.get("polygon", {}).get("ptList", [])
        points = [
            (p["x"], p["y"])
            for p in ptlist
            if isinstance(p, dict) and p.get("x") is not None and p.get("y") is not None
        ]
        if len(points) < 2:
            continue
        try:
            if len(points) == 2:
                (x1, y1), (x2, y2) = points
                draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
                anchor = (x1, y1 - 20)
            else:
                draw.polygon(points, outline=color, width=2)
                anchor = (min(p[0] for p in points), min(p[1] for p in points) - 20)
            text_bbox = draw.textbbox(anchor, name, font=font)
            draw.rectangle(text_bbox, fill=(255, 255, 255, 180))
            draw.text(anchor, name, font=font, fill=color)
        except Exception:
            continue


def download_and_draw_annotations(
    input_csv_path,
    output_dir: Optional[str] = None,
    download_dir: Optional[str] = None,
    result_dir: Optional[str] = None,
    max_images: Optional[int] = None,
    timeout: int = 15,
):
    base_dir = Path(output_dir) if output_dir else Path(os.getcwd())
    download_dir = Path(download_dir) if download_dir else (base_dir / "downloaded_images")
    result_dir = Path(result_dir) if result_dir else (base_dir / "annotated_images")
    download_dir.mkdir(parents=True, exist_ok=True)
    result_dir.mkdir(parents=True, exist_ok=True)

    try:
        df = pd.read_csv(input_csv_path, encoding="utf-8-sig")
    except Exception as e:
        print(f"读取CSV失败：{e}")
        return

    required_cols = ["source", LABEL_JSON_COL, NEW_LABEL_JSON_COL]
    if any(col not in df.columns for col in required_cols):
        print("CSV缺少必要列")
        return

    font = _get_font()
    rows = df if max_images is None else df.head(max_images)

    # Concurrent download warm-up (the reference downloads serially per row).
    sources = [str(s) for s in rows["source"].dropna().tolist()]
    prefetch_images(sources, download_dir, timeout=timeout)

    from .download import ensure_image_cached

    success_count = 0
    fail_count = 0
    for idx, row in df.iterrows():
        if max_images is not None and success_count + fail_count >= max_images:
            break
        source_url = row["source"]
        img_filename = (
            str(source_url).split("/")[-1] if "/" in str(source_url) else f"image_{idx}.jpg"
        )
        result_path = result_dir / img_filename

        # same cache-key rules as the prefetch (query strings stripped);
        # also retries the download if the warm-up missed this row
        local_path = ensure_image_cached(str(source_url), download_dir, timeout=timeout)
        if local_path is None or not Path(local_path).exists():
            fail_count += 1
            continue
        try:
            with Image.open(local_path) as img:
                draw = ImageDraw.Draw(img)
                _draw_annotation_boxes(row[LABEL_JSON_COL], (255, 0, 0), draw, font)
                _draw_annotation_boxes(row[NEW_LABEL_JSON_COL], (0, 255, 0), draw, font)
                img.save(result_path)
            success_count += 1
        except Exception:
            fail_count += 1

    print(f"可视化完成：成功 {success_count} 张，失败 {fail_count} 张")
    return {"success": success_count, "fail": fail_count, "result_dir": result_dir}
