"""YOLO dataset generation + label-count statistics.

Per-category Excel (train/val/test sheets) -> standard YOLO11 dataset layout
(images/{split}, labels/{split}, data.yaml). Artifact contract matches the
reference (core/processor.py:893-1163): same directory naming/dedup, class
ordering (sorted-unique with user class_order override), resume-by-label-file,
skipped-row audit Excel, 50-row progress cadence, and the generator's
unclamped 6-decimal ``cid cx cy w h`` label lines (core/processor.py:1045-1052
— distinct from the clamped standalone converter in labels.py).

Improvement over the reference: images for a whole split are prefetched
concurrently before the row loop (download.prefetch_images) instead of
serial in-loop downloads.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import pandas as pd
import yaml
from PIL import Image

from ..utils import xlsx
from ..utils.naming import safe_dataset_dir_name, safe_image_stem
from .download import ensure_image_cached, prefetch_images
from .labels import (
    LABEL_JSON_COL,
    NEW_LABEL_JSON_COL,
    extract_boxes_with_labels,
)


def write_label_lines(filtered_boxes, class_id: int, width: float, height: float):
    """YOLO label lines for one image (no clamping, zero-size boxes dropped)."""
    lines = []
    for _, x1, y1, x2, y2 in filtered_boxes:
        x1, x2 = min(x1, x2), max(x1, x2)
        y1, y2 = min(y1, y2), max(y1, y2)
        bw = max(x2 - x1, 0.0)
        bh = max(y2 - y1, 0.0)
        if bw <= 0 or bh <= 0:
            continue
        lines.append(
            f"{class_id} {(x1 + x2) / 2 / width:.6f} {(y1 + y2) / 2 / height:.6f} "
            f"{bw / width:.6f} {bh / height:.6f}"
        )
    return lines


def generate_yolo_datasets_from_excels(
    category_excels: list,
    output_dir: str,
    image_cache_dir: Optional[str] = None,
    source_col: str = "source",
    label_col: str = "分类标签",
    json_col_primary: str = NEW_LABEL_JSON_COL,
    json_col_fallback: str = LABEL_JSON_COL,
    width_col: str = "width",
    height_col: str = "height",
    download_images: bool = True,
    random_seed: int = 42,
    class_order: Optional[list] = None,
    resume: bool = True,
    progress_callback=None,
    prefetch_workers: int = 16,
):
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    cache_dir = Path(image_cache_dir) if image_cache_dir else (output_dir / "image_cache")
    cache_dir.mkdir(parents=True, exist_ok=True)

    datasets = []
    dataset_name_map = {}
    skipped = []
    dataset_stats = {}
    total_rows = 0
    processed_rows = 0
    downloaded_images = 0
    used_dir_names = set()
    last_info = None

    # Pre-pass: total row count for progress reporting.
    # Cache keys are normalized via Path() so './x.xlsx' and 'x.xlsx' agree
    # with the main loop's rebound Path(excel_path).
    sheet_cache = {}
    for excel_path in category_excels:
        if not excel_path or not Path(excel_path).exists():
            continue
        book = xlsx.read_workbook(excel_path, sheet_name=None)
        sheet_cache[str(Path(excel_path))] = book
        for split in ("train", "val", "test"):
            if split in book:
                total_rows += len(book[split])

    for idx_excel, excel_path in enumerate(category_excels):
        if not excel_path or not Path(excel_path).exists():
            continue
        excel_path = Path(excel_path)
        category_name = excel_path.stem
        base_dir_name = safe_dataset_dir_name(category_name, f"category_{idx_excel:03d}")
        dir_name = base_dir_name
        suffix = 1
        while dir_name in used_dir_names:
            dir_name = f"{base_dir_name}_{suffix}"
            suffix += 1
        used_dir_names.add(dir_name)
        dataset_dir = output_dir / dir_name
        dataset_name_map[dataset_dir.name] = category_name

        images_root = dataset_dir / "images"
        labels_root = dataset_dir / "labels"
        for split in ("train", "val", "test"):
            (images_root / split).mkdir(parents=True, exist_ok=True)
            (labels_root / split).mkdir(parents=True, exist_ok=True)

        book = sheet_cache[str(excel_path)]
        split_sheets = [s for s in ("train", "val", "test") if s in book]

        all_labels = []
        for split in split_sheets:
            df_split = book[split]
            if label_col in df_split.columns:
                all_labels.extend(str(v) for v in df_split[label_col].dropna())

        classes = sorted(dict.fromkeys(all_labels))
        if class_order:
            ordered = [c for c in class_order if c in classes]
            classes = ordered + [c for c in classes if c not in ordered]
        class_to_id = {name: i for i, name in enumerate(classes)}

        dataset_stats[category_name] = {"train": 0, "val": 0, "test": 0}

        for split in split_sheets:
            df_split = book[split].sample(frac=1, random_state=random_seed).reset_index(drop=True)

            if download_images and source_col in df_split.columns:
                # Concurrent cache warm-up for every row we will touch.
                sources = [
                    str(s) for s in df_split[source_col].dropna().tolist() if s
                ]
                prefetch_images(sources, cache_dir, max_workers=prefetch_workers)

            for idx, row in df_split.iterrows():
                last_info = (
                    processed_rows, total_rows, downloaded_images, category_name,
                    split, f"idx_{idx}", "", excel_path.name, idx,
                )
                if progress_callback and processed_rows % 50 == 0:
                    progress_callback(*last_info)

                source = row.get(source_col)
                if not source or (isinstance(source, float) and pd.isna(source)):
                    skipped.append({"category": category_name, "reason": "缺少source", "split": split})
                    processed_rows += 1
                    continue

                label_value = str(row.get(label_col, ""))
                if not label_value or label_value not in class_to_id:
                    skipped.append({"category": category_name, "reason": "缺少或无效分类标签", "split": split})
                    processed_rows += 1
                    continue

                image_stem = safe_image_stem(str(source), idx)
                label_path = labels_root / split / f"{image_stem}.txt"

                if resume and label_path.exists() and label_path.stat().st_size > 0:
                    dataset_stats[category_name][split] += 1
                    processed_rows += 1
                    continue

                json_str = row.get(json_col_primary) or row.get(json_col_fallback)
                boxes = extract_boxes_with_labels(json_str)
                filtered_boxes = [b for b in boxes if b[0] == label_value]
                if not filtered_boxes:
                    skipped.append({"category": category_name, "reason": "无匹配标签框", "split": split})
                    processed_rows += 1
                    continue

                image_path = None
                if download_images:
                    image_path = ensure_image_cached(str(source), cache_dir)
                elif Path(str(source)).exists():
                    image_path = Path(str(source))

                width = row.get(width_col)
                height = row.get(height_col)
                if isinstance(width, float) and pd.isna(width):
                    width = None
                if isinstance(height, float) and pd.isna(height):
                    height = None
                if (not width or not height) and image_path:
                    try:
                        with Image.open(image_path) as img:
                            width, height = img.size
                    except Exception:
                        pass
                if not width or not height:
                    skipped.append({"category": category_name, "reason": "缺少图像尺寸", "split": split})
                    processed_rows += 1
                    continue

                out_image = images_root / split / (
                    f"{image_stem}{image_path.suffix if image_path else '.jpg'}"
                )
                if image_path:
                    if not out_image.exists():
                        try:
                            out_image.write_bytes(Path(image_path).read_bytes())
                            downloaded_images += 1
                        except Exception:
                            skipped.append({"category": category_name, "reason": "图片写入失败", "split": split})
                            processed_rows += 1
                            continue
                else:
                    skipped.append({"category": category_name, "reason": "图片下载失败", "split": split})
                    processed_rows += 1
                    continue

                label_lines = write_label_lines(
                    filtered_boxes, class_to_id[label_value], width, height
                )
                if label_lines:
                    label_path.write_text("\n".join(label_lines), encoding="utf-8")
                    dataset_stats[category_name][split] += 1
                else:
                    skipped.append({"category": category_name, "reason": "标注框无效", "split": split})

                processed_rows += 1

        data_yaml = dataset_dir / "data.yaml"
        data_yaml.write_text(
            yaml.dump(
                {
                    "path": str(dataset_dir),
                    "train": "images/train",
                    "val": "images/val",
                    "test": "images/test",
                    "nc": len(classes),
                    "names": classes,
                },
                sort_keys=False,
                allow_unicode=True,
            ),
            encoding="utf-8",
        )
        datasets.append(dataset_dir)

    skipped_path = output_dir / "yolo_skipped.xlsx"
    xlsx.to_excel(
        pd.DataFrame(skipped if skipped else [{"category": "无", "reason": "无", "split": "无"}]),
        skipped_path,
    )

    if progress_callback and last_info is not None:
        # The reference crashes here on undefined locals (core/processor.py:1076-1077);
        # we report the final progress tuple instead.
        progress_callback(*last_info)

    return {
        "datasets": datasets,
        "skipped": skipped_path,
        "stats": dataset_stats,
        "total": total_rows,
        "processed": processed_rows,
        "downloaded": downloaded_images,
        "dataset_name_map": dataset_name_map,
    }


def summarize_yolo_label_counts(dataset_dirs):
    """Per split and label: image/box counts and percentages for generated
    datasets; returns (nested stats dict, flat DataFrame)
    (reference: core/processor.py:1089-1163)."""
    stats = {}
    flat_rows = []
    for dataset_dir in dataset_dirs or []:
        if not dataset_dir:
            continue
        dataset_path = Path(dataset_dir)
        if not dataset_path.exists():
            continue

        names = []
        data_yaml = dataset_path / "data.yaml"
        if data_yaml.exists():
            try:
                data = yaml.safe_load(data_yaml.read_text(encoding="utf-8"))
                names = data.get("names") or []
            except Exception:
                pass

        dataset_key = dataset_path.name
        split_stats = {}
        total_images_all = 0
        total_img_counts: dict = {}
        total_box_counts: dict = {}

        for split in ("train", "val", "test"):
            label_dir = dataset_path / "labels" / split
            img_counts: dict = {}
            box_counts: dict = {}
            total_images = 0
            if label_dir.exists():
                for txt_path in label_dir.glob("*.txt"):
                    total_images += 1
                    try:
                        lines = txt_path.read_text(encoding="utf-8", errors="ignore").splitlines()
                    except Exception:
                        continue
                    labels_in_image = set()
                    for line in lines:
                        parts = line.strip().split()
                        if not parts:
                            continue
                        try:
                            class_id = int(float(parts[0]))
                            label_name = names[class_id] if class_id < len(names) else str(class_id)
                            labels_in_image.add(label_name)
                            box_counts[label_name] = box_counts.get(label_name, 0) + 1
                        except Exception:
                            continue
                    for label in labels_in_image:
                        img_counts[label] = img_counts.get(label, 0) + 1

            split_stats[split] = {
                "total_images": total_images,
                "label_counts": img_counts,
                "box_counts": box_counts,
            }
            total_images_all += total_images
            for label, count in img_counts.items():
                total_img_counts[label] = total_img_counts.get(label, 0) + count
            for label, count in box_counts.items():
                total_box_counts[label] = total_box_counts.get(label, 0) + count

            for label in set(img_counts) | set(box_counts):
                flat_rows.append({
                    "数据集": dataset_key, "split": split, "标签": label,
                    "图片数量": img_counts.get(label, 0),
                    "标注框数量": box_counts.get(label, 0),
                    "占比%": f"{(img_counts.get(label, 0) / total_images * 100):.1f}%" if total_images else "0.0%",
                    "split总图片数": total_images,
                })

        split_stats["all"] = {
            "total_images": total_images_all,
            "label_counts": total_img_counts,
            "box_counts": total_box_counts,
        }
        stats[dataset_key] = split_stats

        for label in set(total_img_counts) | set(total_box_counts):
            flat_rows.append({
                "数据集": dataset_key, "split": "all", "标签": label,
                "图片数量": total_img_counts.get(label, 0),
                "标注框数量": total_box_counts.get(label, 0),
                "占比%": f"{(total_img_counts.get(label, 0) / total_images_all * 100):.1f}%" if total_images_all else "0.0%",
                "split总图片数": total_images_all,
            })

    return stats, pd.DataFrame(flat_rows)
