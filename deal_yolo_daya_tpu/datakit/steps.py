"""The 9-step annotation pipeline (steps 1-6 + split + unclassified summary).

Signatures, artifact names and console-output style match the reference
(reference: core/processor.py:26-891) so the UI and saved run configs work
unchanged; internals are columnar: each JSON label cell is parsed exactly once
and numeric filtering runs as vectorized array ops (see boxes.py).
"""

from __future__ import annotations

import copy
import json
import os
import re
import shutil
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

from ..utils import xlsx
from ..utils.naming import safe_filename
from . import boxes as boxops
from .labels import (
    LABEL_JSON_COL,
    NEW_LABEL_JSON_COL,
    extract_two_point_boxes,
    parse_data_objects,
    polygon_to_bbox_points,
    replace_label_tokens,
    split_label_cell,
    split_object_labels,
)

# ---------------------------------------------------------------------------
# Step 1: merge
# ---------------------------------------------------------------------------


def merge_all_csv_in_folder(
    folder_path,
    output_file="merged_csv.csv",
    encoding="utf-8-sig",
    chunk_size: int = 100000,
    progress_callback=None,
):
    """Streaming merge of all *.csv in a folder; adds a ``source_file`` column.

    Progress callback signature (10 args): (file_idx, n_files, file_name,
    total_rows, file_rows, chunk_idx, file_size, file_bytes, total_bytes,
    total_bytes_read) — byte-accurate for UI ETA cards
    (reference: core/processor.py:53-65, 84-96).
    """
    if not os.path.exists(folder_path):
        raise FileNotFoundError(f"文件夹不存在：{folder_path}")

    csv_files = list(Path(folder_path).glob("*.csv"))
    if not csv_files:
        print(f"警告：文件夹 {folder_path} 中未找到CSV文件")
        return None

    print(f"找到 {len(csv_files)} 个CSV文件，开始合并...")
    output_file = str(output_file)
    Path(output_file).parent.mkdir(parents=True, exist_ok=True)
    header_written = False
    total_rows = 0
    total_bytes = sum(f.stat().st_size for f in csv_files)
    completed_bytes = 0

    for file_idx, csv_file in enumerate(csv_files, start=1):
        try:
            file_size = csv_file.stat().st_size
            if progress_callback:
                progress_callback(
                    file_idx, len(csv_files), csv_file.name, total_rows,
                    0, 0, file_size, 0, total_bytes, completed_bytes,
                )
            file_rows = 0
            with open(csv_file, "r", encoding=encoding, errors="ignore") as f:
                for chunk_idx, df in enumerate(
                    pd.read_csv(f, parse_dates=False, chunksize=chunk_size), start=1
                ):
                    df["source_file"] = os.path.basename(csv_file)
                    df.to_csv(
                        output_file,
                        index=False,
                        encoding=encoding,
                        mode="a" if header_written else "w",
                        header=not header_written,
                    )
                    header_written = True
                    rows = len(df)
                    file_rows += rows
                    total_rows += rows
                    if progress_callback:
                        file_bytes = f.tell()
                        progress_callback(
                            file_idx, len(csv_files), csv_file.name, total_rows,
                            file_rows, chunk_idx, file_size, file_bytes,
                            total_bytes, completed_bytes + file_bytes,
                        )
            print(f"成功读取：{csv_file.name}（{file_rows}行）")
            completed_bytes += file_size
        except Exception as e:
            print(f"读取失败 {csv_file.name}：{str(e)}")
            continue

    if not header_written:
        print("错误：没有可合并的有效CSV数据")
        return None

    print(f"\n合并完成！共 {total_rows} 行数据")
    print(f"输出文件：{os.path.abspath(output_file)}")
    return total_rows


# ---------------------------------------------------------------------------
# Step 2: dedup by source
# ---------------------------------------------------------------------------


def deduplicate_csv_by_source(
    csv_path: str,
    output_file: Optional[str] = "deduplicate_result.csv",
    encoding: str = "utf-8-sig",
    keep: str = "first",
    verbose: bool = True,
) -> pd.DataFrame:
    if not os.path.exists(csv_path):
        raise FileNotFoundError(f"CSV文件不存在：{csv_path}")
    if not csv_path.endswith(".csv"):
        raise ValueError(f"文件不是CSV格式：{csv_path}（请传入.csv后缀的文件）")

    try:
        df = pd.read_csv(csv_path, encoding=encoding, parse_dates=False)
        if verbose:
            print(f"成功读取CSV文件：{os.path.basename(csv_path)}")
            print(f"读取后原始数据行数：{len(df)}")
    except Exception as e:
        raise Exception(f"读取CSV文件失败：{str(e)}") from e

    if "source" not in df.columns:
        raise KeyError(
            f"CSV文件中未找到'source'列，请检查列名是否正确（当前列名：{list(df.columns)}）"
        )

    original_count = len(df)
    deduplicated = df.drop_duplicates(subset=["source"], keep=keep, ignore_index=True)

    if verbose:
        print(f"去重策略：按'source'列保留{keep}条数据")
        print(f"去除重复数据行数：{original_count - len(deduplicated)}")
        print(f"去重后剩余数据行数：{len(deduplicated)}")

    if output_file is not None:
        try:
            out_dir = os.path.dirname(output_file)
            if out_dir:
                os.makedirs(out_dir, exist_ok=True)
            deduplicated.to_csv(output_file, index=False, encoding=encoding)
            if verbose:
                print(f"去重后的文件已保存至：{os.path.abspath(output_file)}")
        except Exception as e:
            raise Exception(f"保存去重文件失败：{str(e)}") from e

    return deduplicated


# ---------------------------------------------------------------------------
# Step 3: reference-set filter
# ---------------------------------------------------------------------------


def remove_duplicates_between_csv(
    main_csv: str,
    ref_csv: str,
    output_csv: str = "filtered_main.csv",
    compare_col: str = "source",
    encoding: str = "utf-8-sig",
    verbose: bool = True,
) -> pd.DataFrame:
    for csv_path in (main_csv, ref_csv):
        if not os.path.exists(csv_path):
            raise FileNotFoundError(f"文件不存在：{csv_path}")
        if not csv_path.endswith(".csv"):
            raise ValueError(f"文件不是CSV格式：{csv_path}（请传入.csv后缀文件）")

    try:
        df_main = pd.read_csv(main_csv, encoding=encoding, parse_dates=False)
        df_ref = pd.read_csv(ref_csv, encoding=encoding, parse_dates=False)
        if verbose:
            print(f"读取主文件：{len(df_main)}行")
            print(f"读取参考文件：{len(df_ref)}行")
    except Exception as e:
        raise Exception(f"读取CSV失败：{str(e)}") from e

    if compare_col not in df_main.columns:
        raise KeyError(f"主文件中未找到列 '{compare_col}'")
    if compare_col not in df_ref.columns:
        raise KeyError(f"参考文件中未找到列 '{compare_col}'")

    ref_values = set(df_ref[compare_col].dropna().astype(str))
    is_duplicate = df_main[compare_col].astype(str).isin(ref_values)
    df_filtered = df_main[~is_duplicate].copy()

    if verbose:
        print(f"去重依据列：{compare_col}")
        print(f"参考文件中唯一值数量：{len(ref_values)}")
        print(f"剔除重复行数：{len(df_main) - len(df_filtered)}")
        print(f"保留行数：{len(df_filtered)}")

    try:
        out_dir = os.path.dirname(output_csv)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        df_filtered.to_csv(output_csv, index=False, encoding=encoding)
        if verbose:
            print(f"结果已保存至：{os.path.abspath(output_csv)}")
    except Exception as e:
        raise Exception(f"保存结果失败：{str(e)}") from e

    return df_filtered


def overwrite_reference_with_result(result_csv: str, ref_csv: str):
    if not os.path.exists(result_csv):
        raise FileNotFoundError(f"结果文件不存在：{result_csv}")
    shutil.copy2(result_csv, ref_csv)


# ---------------------------------------------------------------------------
# Step 4: polygon -> bbox (ptList replace)
# ---------------------------------------------------------------------------


def process_csv_replace_ptlist(
    input_csv_path: str,
    output_csv_path: str = "processed_replaced_ptlist.csv",
    excluded_output_file: Optional[str] = "processed_excluded.csv",
):
    """Replace each object's polygon ptList with its 2-point axis-aligned bbox.

    Single-parse columnar pass: one json.loads per row produces both the
    rewritten JSON (new column 新_结果字段-目标检测标签配置) and the image
    width/height columns (the reference parses each cell twice —
    core/processor.py:283, 294).
    """
    try:
        df = pd.read_csv(input_csv_path, encoding="utf-8-sig")
        print(f"成功读取CSV，共 {len(df)} 行数据")
    except FileNotFoundError:
        print(f"错误：未找到文件 {input_csv_path}")
        return None
    except Exception as e:
        print(f"读取失败：{e}")
        return None

    if LABEL_JSON_COL not in df.columns:
        print(f"错误：CSV缺少列 '{LABEL_JSON_COL}'")
        return None

    keep_mask = df[LABEL_JSON_COL].notna()
    filtered_df = df[keep_mask].copy()
    excluded_df = df[~keep_mask].copy()

    new_jsons, widths, heights = [], [], []
    for json_str in filtered_df[LABEL_JSON_COL].tolist():
        if not isinstance(json_str, str):
            new_jsons.append(None)
            widths.append(None)
            heights.append(None)
            continue
        try:
            data = json.loads(json_str)
        except json.JSONDecodeError:
            new_jsons.append(None)
            widths.append(None)
            heights.append(None)
            continue
        except Exception:
            new_jsons.append(None)
            widths.append(None)
            heights.append(None)
            continue
        widths.append(data.get("width"))
        heights.append(data.get("height"))
        updated_objects = []
        for obj in data.get("objects", []):
            if not isinstance(obj, dict):
                continue
            updated = obj.copy()
            polygon = dict(updated.get("polygon") or {})
            polygon["ptList"] = polygon_to_bbox_points(
                (obj.get("polygon") or {}).get("ptList", [])
            )
            updated["polygon"] = polygon
            updated_objects.append(updated)
        data["objects"] = updated_objects
        new_jsons.append(json.dumps(data, ensure_ascii=False))

    filtered_df[NEW_LABEL_JSON_COL] = new_jsons
    filtered_df["width"] = widths
    filtered_df["height"] = heights

    result_cols = ["source", LABEL_JSON_COL, NEW_LABEL_JSON_COL, "width", "height"]
    existing_cols = [c for c in result_cols if c in filtered_df.columns]

    Path(output_csv_path).parent.mkdir(parents=True, exist_ok=True)
    filtered_df[existing_cols].to_csv(output_csv_path, index=False, encoding="utf-8-sig")

    if excluded_output_file is not None:
        Path(excluded_output_file).parent.mkdir(parents=True, exist_ok=True)
        excluded_df.to_csv(excluded_output_file, index=False, encoding="utf-8-sig")

    return {
        "filtered_rows": len(filtered_df),
        "excluded_rows": len(excluded_df),
        "excluded_output": excluded_output_file,
    }


# ---------------------------------------------------------------------------
# Step 5: IoU quality filter (vectorized)
# ---------------------------------------------------------------------------


def filter_by_box_count_and_iou(
    input_csv_path,
    high_iou_csv="high_iou_0.98.csv",
    other_csv="other_data.csv",
    min_boxes: int = 2,
    iou_threshold: float = 0.98,
):
    """Split rows into suspected-duplicate-annotation rows (any box pair with
    IoU >= threshold and >= min_boxes boxes) vs clean rows.

    Replaces the reference's per-row O(n^2) Python loop
    (core/processor.py:368-376) with one packed (rows, M, M) IoU computed as
    a jitted, vmapped JAX op in chunks (boxes.high_iou_hits).
    """
    try:
        df = pd.read_csv(input_csv_path, encoding="utf-8-sig")
    except Exception as e:
        print(f"读取失败：{e}")
        return

    if NEW_LABEL_JSON_COL not in df.columns:
        print(f"错误：缺少必要列 {NEW_LABEL_JSON_COL}")
        return

    rows = df[NEW_LABEL_JSON_COL].tolist()
    # Cap the packed width: one outlier row with hundreds of boxes would
    # inflate the (rows, M, M) IoU tensors quadratically. Saturated rows
    # (count == cap, i.e. possibly truncated) are re-checked exactly via the
    # per-row Python/numpy path below.
    M_CAP = 64
    native = None
    try:
        from ..runtime import scan_boxes_native

        native = scan_boxes_native(rows, two_point_only=True, max_boxes=M_CAP)
    except Exception:
        native = None
    if native is not None:
        packed, mask, counts, _ = native
        saturated = np.flatnonzero(counts >= M_CAP)
    else:
        box_lists = [extract_two_point_boxes(v) for v in rows]
        saturated = np.flatnonzero(np.asarray([len(b) for b in box_lists]) > M_CAP)
        box_lists = [b[:M_CAP] for b in box_lists]
        packed, mask = boxops.pack_boxes(box_lists, max_boxes=M_CAP)
    hits = boxops.high_iou_hits(packed, mask, min_boxes=min_boxes, iou_threshold=iou_threshold)
    for i in saturated:
        full = extract_two_point_boxes(rows[int(i)])
        b, m = boxops.pack_boxes([full])
        hits[int(i)] = bool(
            boxops.high_iou_hits(b, m, min_boxes=min_boxes, iou_threshold=iou_threshold)[0]
        )

    Path(high_iou_csv).parent.mkdir(parents=True, exist_ok=True)
    Path(other_csv).parent.mkdir(parents=True, exist_ok=True)

    df[hits].to_csv(high_iou_csv, index=False, encoding="utf-8-sig")
    df[~hits].to_csv(other_csv, index=False, encoding="utf-8-sig")


# ---------------------------------------------------------------------------
# Step 6: label mapping
# ---------------------------------------------------------------------------


def replace_labels_by_mapping(
    input_csv_path: str,
    mapping_excel_path: str,
    output_csv_path: str,
    sheet_name: Optional[str] = None,
    old_col: Optional[str] = None,
    new_col: Optional[str] = None,
    json_columns: Optional[list] = None,
    diff_excel_path: Optional[str] = None,
    unmatched_excel_path: Optional[str] = None,
    sample_size: int = 30,
):
    """Rename labels via a 2-column Excel map; emits diff Excel, unmatched-label
    histogram Excel and a 10-field summary (reference: core/processor.py:516-652)."""
    df = pd.read_csv(input_csv_path, encoding="utf-8-sig")
    mapping_df = xlsx.read_workbook(mapping_excel_path, sheet_name if sheet_name else 0)

    if not old_col or not new_col:
        cols = list(mapping_df.columns)
        if len(cols) < 2:
            raise ValueError("标签对照表至少需要两列")
        old_col = old_col or cols[0]
        new_col = new_col or cols[1]

    label_map = {}
    for _, row in mapping_df.iterrows():
        old_label = str(row.get(old_col, "")).strip()
        new_label = str(row.get(new_col, "")).strip()
        if old_label and old_label.lower() != "nan" and new_label and new_label.lower() != "nan":
            label_map[old_label] = new_label

    if json_columns is None:
        json_columns = [c for c in (NEW_LABEL_JSON_COL, LABEL_JSON_COL) if c in df.columns]

    counters = dict(
        total_objects=0, total_labels=0, replaced_labels=0,
        replaced_objects=0, replaced_rows=0, invalid_json_rows=0,
        missing_name_objects=0,
    )
    unmatched_counter: dict = {}
    diff_rows: list = []

    present_cols = [c for c in json_columns if c in df.columns]
    col_values = {c: df[c].tolist() for c in present_cols}
    sources = df["source"].tolist() if "source" in df.columns else [None] * len(df)

    for i in range(len(df)):
        row_replaced = False
        for col in present_cols:
            json_str = col_values[col][i]
            if json_str is None or not isinstance(json_str, str) or not json_str:
                continue
            try:
                data = json.loads(json_str)
            except json.JSONDecodeError:
                counters["invalid_json_rows"] += 1
                continue
            objects = data.get("objects")
            if not isinstance(objects, list):
                continue
            row_diff = []
            for obj in objects:
                if not isinstance(obj, dict):
                    continue
                counters["total_objects"] += 1
                raw_name = obj.get("name")
                if raw_name is None:
                    counters["missing_name_objects"] += 1
                    continue
                for lbl in split_object_labels(raw_name):
                    if lbl not in label_map:
                        unmatched_counter[lbl] = unmatched_counter.get(lbl, 0) + 1
                new_name, replaced, label_count = replace_label_tokens(raw_name, label_map)
                counters["total_labels"] += label_count
                if replaced > 0:
                    obj["name"] = new_name
                    counters["replaced_labels"] += replaced
                    counters["replaced_objects"] += 1
                    row_replaced = True
                if raw_name != new_name:
                    row_diff.append((raw_name, new_name))
            data["objects"] = objects
            col_values[col][i] = json.dumps(data, ensure_ascii=False)
            if row_diff:
                diff_rows.append({
                    "source": sources[i],
                    "column": col,
                    "before": "；".join(p[0] for p in row_diff),
                    "after": "；".join(p[1] for p in row_diff),
                })
        if row_replaced:
            counters["replaced_rows"] += 1

    for col in present_cols:
        df[col] = col_values[col]

    output_csv_path = Path(output_csv_path)
    output_csv_path.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(output_csv_path, index=False, encoding="utf-8-sig")

    diff_path = None
    if diff_excel_path:
        diff_path = Path(diff_excel_path)
        xlsx.to_excel(pd.DataFrame(diff_rows), diff_path)

    unmatched_path = None
    if unmatched_excel_path:
        unmatched_path = Path(unmatched_excel_path)
        if unmatched_counter:
            unmatched_df = pd.DataFrame(
                [{"标签": k, "数量": v} for k, v in unmatched_counter.items()]
            ).sort_values("数量", ascending=False)
        else:
            unmatched_df = pd.DataFrame(columns=["标签", "数量"])
        xlsx.to_excel(unmatched_df, unmatched_path)

    summary = {
        "total_rows": len(df),
        "replaced_rows": counters["replaced_rows"],
        "total_objects": counters["total_objects"],
        "replaced_objects": counters["replaced_objects"],
        "total_labels": counters["total_labels"],
        "replaced_labels": counters["replaced_labels"],
        "invalid_json_rows": counters["invalid_json_rows"],
        "missing_name_objects": counters["missing_name_objects"],
        "mapping_size": len(label_map),
        "unmatched_labels": len(unmatched_counter),
    }
    return {
        "output_csv": output_csv_path,
        "summary": summary,
        "diff": diff_path,
        "unmatched": unmatched_path,
        "sample_diff": diff_rows[:sample_size],
    }


# ---------------------------------------------------------------------------
# Step 7: rule-based category split (with row explosion)
# ---------------------------------------------------------------------------


def split_dataset_by_rules(
    input_csv_path: str,
    rules_excel_path: str,
    output_dir: str,
    rule_mode: str = "wide",
    sheet_name: Optional[str] = None,
    label_col: Optional[str] = None,
    category_col: Optional[str] = None,
    json_columns: Optional[list] = None,
    train_ratio: float = 0.8,
    val_ratio: float = 0.1,
    test_ratio: float = 0.1,
    random_seed: int = 42,
):
    """Explode rows (object x label -> one single-object row), assign categories
    by rules Excel, shuffle deterministically, write 3-sheet train/val/test
    Excel per category plus unclassified/split_counts audits
    (reference: core/processor.py:654-831)."""
    if not os.path.exists(input_csv_path):
        raise FileNotFoundError(f"输入CSV不存在：{input_csv_path}")
    if not os.path.exists(rules_excel_path):
        raise FileNotFoundError(f"规则Excel不存在：{rules_excel_path}")

    ratio_sum = train_ratio + val_ratio + test_ratio
    train_ratio, val_ratio, test_ratio = (
        train_ratio / ratio_sum, val_ratio / ratio_sum, test_ratio / ratio_sum,
    )

    df = pd.read_csv(input_csv_path, encoding="utf-8-sig")

    if json_columns is None:
        json_columns = [c for c in (NEW_LABEL_JSON_COL, LABEL_JSON_COL) if c in df.columns]

    rules_df = xlsx.read_workbook(rules_excel_path, sheet_name if sheet_name else 0)
    label_to_category: dict = {}
    if rule_mode == "wide":
        for col in rules_df.columns:
            category = str(col).strip()
            if not category:
                continue
            for cell in rules_df[col].dropna():
                for label in split_label_cell(cell):
                    label_to_category[label] = category
    elif rule_mode == "two_column":
        for _, row in rules_df.iterrows():
            label = str(row.get(label_col, "")).strip()
            category = str(row.get(category_col, "")).strip()
            if label and category and label.lower() != "nan" and category.lower() != "nan":
                label_to_category[label] = category

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    category_rows: dict = {}
    unclassified_rows: list = []
    split_counts_rows: list = []

    for _, row in df.iterrows():
        json_str = None
        for col in json_columns:
            if col in row and isinstance(row[col], str) and row[col]:
                json_str = row[col]
                break

        data, objects, error = parse_data_objects(json_str)
        if error or not objects:
            row_copy = row.copy()
            row_copy["无法分类原因"] = error or "标注字段objects为空"
            unclassified_rows.append(row_copy)
            split_counts_rows.append({
                "source": row.get("source"),
                "原始标签组合": "",
                "拆分条数": 0,
                "是否可分类": "否",
                "无法分类原因": error or "标注字段objects为空",
            })
            continue

        raw_label_set = set()
        for obj in objects:
            if isinstance(obj, dict) and obj.get("name"):
                raw_label_set.update(split_object_labels(obj.get("name")))
        raw_label_combo = "，".join(sorted(raw_label_set)) if raw_label_set else ""

        row_expand_count = 0
        row_reason_set: set = set()
        any_classified = False

        for obj in objects:
            if not isinstance(obj, dict):
                continue
            labels = split_object_labels(obj.get("name"))
            if not labels:
                row_copy = row.copy()
                row_copy["无法分类原因"] = "标注框缺少name字段"
                unclassified_rows.append(row_copy)
                continue

            for label in labels:
                if label not in label_to_category:
                    row_copy = row.copy()
                    row_copy["无法分类原因"] = f"标签{label}未在规则中定义"
                    row_copy["无法分类标签"] = label
                    unclassified_rows.append(row_copy)
                    row_reason_set.add(f"标签{label}未在规则中定义")
                    continue

                category = label_to_category[label]
                new_row = row.copy()
                obj_copy = copy.deepcopy(obj)
                obj_copy["name"] = label
                new_data = {k: v for k, v in data.items() if k != "objects"}
                new_data["objects"] = [obj_copy]
                new_json = json.dumps(new_data, ensure_ascii=False)
                for col in json_columns:
                    if col in df.columns:
                        new_row[col] = new_json
                new_row["分类标签"] = label
                new_row["分类类别"] = category
                new_row["原始标签组合"] = raw_label_combo
                category_rows.setdefault(category, []).append(new_row)
                any_classified = True
                row_expand_count += 1

        if not any_classified:
            row_copy = row.copy()
            row_copy["无法分类原因"] = (
                "；".join(sorted(row_reason_set)) if row_reason_set else "标签无法匹配规则"
            )
            unclassified_rows.append(row_copy)

        status = "部分可分类" if row_reason_set else "是"
        if not any_classified:
            status = "否"
        split_counts_rows.append({
            "source": row.get("source"),
            "原始标签组合": raw_label_combo,
            "拆分条数": row_expand_count,
            "是否可分类": status,
            "无法分类原因": "；".join(sorted(row_reason_set)),
        })

    category_files = []
    category_counts = {}
    for category, rows in category_rows.items():
        if not rows:
            continue
        category_counts[category] = len(rows)
        cat_df = pd.DataFrame(rows)
        cat_df = cat_df.sample(frac=1, random_state=random_seed).reset_index(drop=True)
        n_total = len(cat_df)
        n_train = int(n_total * train_ratio)
        n_val = int(n_total * val_ratio)
        out_path = output_dir / f"{safe_filename(category)}.xlsx"
        xlsx.write_workbook(out_path, {
            "train": cat_df.iloc[:n_train],
            "val": cat_df.iloc[n_train:n_train + n_val],
            "test": cat_df.iloc[n_train + n_val:],
        })
        category_files.append(out_path)

    unclassified_path = output_dir / "unclassified.xlsx"
    xlsx.to_excel(pd.DataFrame(unclassified_rows), unclassified_path)
    split_counts_path = output_dir / "split_counts.xlsx"
    xlsx.to_excel(pd.DataFrame(split_counts_rows), split_counts_path)

    return {
        "output_dir": output_dir,
        "category_files": category_files,
        "unclassified": unclassified_path,
        "split_counts": split_counts_path,
        "summary": {
            "categories": len(category_rows),
            "classified": sum(category_counts.values()),
            "unclassified": len(unclassified_rows),
            "category_counts": category_counts,
        },
    }


# ---------------------------------------------------------------------------
# Unclassified summarizer
# ---------------------------------------------------------------------------


def summarize_unclassified(
    unclassified_excel_path: str,
    output_dir: str,
    json_columns: Optional[list] = None,
):
    """Aggregate unclassified rows by reason/label into a 3-sheet summary Excel
    (reference: core/processor.py:833-891)."""
    if not os.path.exists(unclassified_excel_path):
        raise FileNotFoundError(f"无法分类文件不存在：{unclassified_excel_path}")

    df = xlsx.read_workbook(unclassified_excel_path, 0)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    reason_col = "无法分类原因"
    if reason_col not in df.columns:
        df[reason_col] = "未知原因"

    reason_counts = df[reason_col].fillna("未知原因").value_counts().reset_index()
    reason_counts.columns = ["原因", "数量"]

    label_counter: dict = {}
    reason_label_counter: dict = {}
    reason_label_pattern = re.compile(r"^标签(.+?)(未在规则中定义)$")

    for _, row in df.iterrows():
        reason = row.get(reason_col, "未知原因")
        labels = []
        if "无法分类标签" in df.columns:
            labels = split_object_labels(row.get("无法分类标签"))
        if not labels:
            match = reason_label_pattern.match(str(reason))
            if match:
                labels = [match.group(1)]
            else:
                label_counter["无标签"] = label_counter.get("无标签", 0) + 1
                key = ("无标签", reason)
                reason_label_counter[key] = reason_label_counter.get(key, 0) + 1
                continue
        for label in labels:
            label_counter[label] = label_counter.get(label, 0) + 1
            key = (label, reason)
            reason_label_counter[key] = reason_label_counter.get(key, 0) + 1

    label_summary = pd.DataFrame(
        [{"标签": k, "数量": v} for k, v in label_counter.items()]
    ).sort_values("数量", ascending=False) if label_counter else pd.DataFrame(columns=["标签", "数量"])
    reason_label_summary = pd.DataFrame(
        [{"标签": k[0], "原因": k[1], "数量": v} for k, v in reason_label_counter.items()]
    ).sort_values("数量", ascending=False) if reason_label_counter else pd.DataFrame(columns=["标签", "原因", "数量"])

    out_path = output_dir / "unclassified_summary.xlsx"
    xlsx.write_workbook(out_path, {
        "reason_summary": reason_counts,
        "label_summary": label_summary,
        "reason_label": reason_label_summary,
    })
    return out_path
