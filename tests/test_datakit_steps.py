"""Golden-file tests for the 9-step annotation pipeline.

Covers the behavioral contracts of reference core/processor.py components 4-13
(SURVEY §2.1): merge/dedup/ref-filter/poly2bbox/IoU-filter/label-map/split/
yolo-gen/label-counts — all offline (local-file `source` paths, no network).
"""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from deal_yolo_daya_tpu.datakit import (
    deduplicate_csv_by_source,
    filter_by_box_count_and_iou,
    generate_yolo_datasets_from_excels,
    merge_all_csv_in_folder,
    overwrite_reference_with_result,
    process_csv_replace_ptlist,
    remove_duplicates_between_csv,
    replace_labels_by_mapping,
    split_dataset_by_rules,
    summarize_unclassified,
    summarize_yolo_label_counts,
)
from deal_yolo_daya_tpu.datakit.labels import (
    LABEL_JSON_COL,
    NEW_LABEL_JSON_COL,
    replace_label_tokens,
    split_object_labels,
)
from deal_yolo_daya_tpu.utils import xlsx

JCOL = LABEL_JSON_COL
NJCOL = NEW_LABEL_JSON_COL


def label_json(objects, width=100, height=80):
    return json.dumps(
        {
            "width": width,
            "height": height,
            "objects": [
                {
                    "name": name,
                    "polygon": {"ptList": [{"x": x, "y": y} for x, y in pts]},
                }
                for name, pts in objects
            ],
        },
        ensure_ascii=False,
    )


# --- Step 1: merge -----------------------------------------------------------


def test_merge_all_csv(tmp_path):
    folder = tmp_path / "in"
    folder.mkdir()
    pd.DataFrame({"source": ["a", "b"], "v": [1, 2]}).to_csv(
        folder / "one.csv", index=False, encoding="utf-8-sig"
    )
    pd.DataFrame({"source": ["c"], "v": [3]}).to_csv(
        folder / "two.csv", index=False, encoding="utf-8-sig"
    )
    out = tmp_path / "merged.csv"
    calls = []
    total = merge_all_csv_in_folder(
        folder, out, progress_callback=lambda *a: calls.append(a)
    )
    assert total == 3
    df = pd.read_csv(out, encoding="utf-8-sig")
    assert len(df) == 3
    assert set(df["source_file"]) == {"one.csv", "two.csv"}
    # 10-arg byte-accurate callback signature
    assert all(len(c) == 10 for c in calls)
    assert calls[-1][8] >= calls[-1][9] - 1  # total_bytes >= bytes_read


def test_merge_empty_folder(tmp_path):
    folder = tmp_path / "empty"
    folder.mkdir()
    assert merge_all_csv_in_folder(folder, tmp_path / "o.csv") is None


def test_merge_missing_folder(tmp_path):
    with pytest.raises(FileNotFoundError):
        merge_all_csv_in_folder(tmp_path / "nope", tmp_path / "o.csv")


# --- Step 2: dedup -----------------------------------------------------------


def test_dedup_keeps_first(tmp_path):
    src = tmp_path / "in.csv"
    pd.DataFrame({"source": ["a", "b", "a", "c", "b"], "v": [1, 2, 3, 4, 5]}).to_csv(
        src, index=False, encoding="utf-8-sig"
    )
    out = tmp_path / "dedup.csv"
    result = deduplicate_csv_by_source(str(src), str(out), verbose=False)
    assert result["source"].tolist() == ["a", "b", "c"]
    assert result["v"].tolist() == [1, 2, 4]
    assert pd.read_csv(out)["source"].tolist() == ["a", "b", "c"]


def test_dedup_requires_source_column(tmp_path):
    src = tmp_path / "bad.csv"
    pd.DataFrame({"x": [1]}).to_csv(src, index=False)
    with pytest.raises(KeyError):
        deduplicate_csv_by_source(str(src), None, verbose=False)


# --- Step 3: ref filter ------------------------------------------------------


def test_ref_filter(tmp_path):
    main = tmp_path / "main.csv"
    ref = tmp_path / "ref.csv"
    pd.DataFrame({"source": ["a", "b", "c", "d"]}).to_csv(main, index=False)
    pd.DataFrame({"source": ["b", "d", "zz"]}).to_csv(ref, index=False)
    out = tmp_path / "filtered.csv"
    result = remove_duplicates_between_csv(str(main), str(ref), str(out), verbose=False)
    assert result["source"].tolist() == ["a", "c"]

    overwrite_reference_with_result(str(out), str(ref))
    assert pd.read_csv(ref)["source"].tolist() == ["a", "c"]


# --- Step 4: poly -> bbox ----------------------------------------------------


def test_replace_ptlist_polygon_to_bbox(tmp_path):
    src = tmp_path / "in.csv"
    poly = label_json(
        [("cat", [(10, 20), (30, 5), (25, 40)])], width=640, height=480
    )
    two_pt = label_json([("dog", [(1, 2), (3, 4)])])
    pd.DataFrame(
        {"source": ["p1.jpg", "p2.jpg", "p3.jpg"], JCOL: [poly, two_pt, None]}
    ).to_csv(src, index=False, encoding="utf-8-sig")

    out = tmp_path / "out.csv"
    excluded = tmp_path / "excluded.csv"
    result = process_csv_replace_ptlist(str(src), str(out), str(excluded))
    assert result == {
        "filtered_rows": 2,
        "excluded_rows": 1,
        "excluded_output": str(excluded),
    }

    df = pd.read_csv(out, encoding="utf-8-sig")
    assert list(df.columns) == ["source", JCOL, NJCOL, "width", "height"]
    new_data = json.loads(df[NJCOL][0])
    assert new_data["objects"][0]["polygon"]["ptList"] == [
        {"x": 10, "y": 5},
        {"x": 30, "y": 40},
    ]
    assert df["width"][0] == 640 and df["height"][0] == 480
    assert len(pd.read_csv(excluded)) == 1


# --- Step 5: IoU filter ------------------------------------------------------


def test_iou_filter_splits_rows(tmp_path):
    src = tmp_path / "in.csv"
    # near-duplicate pair (IoU ~0.9998) -> hit at 0.98
    dup = label_json([
        ("a", [(0, 0), (100, 100)]),
        ("b", [(0, 0), (100.01, 100.01)]),
    ])
    # disjoint boxes -> clean
    clean = label_json([("a", [(0, 0), (10, 10)]), ("b", [(50, 50), (60, 60)])])
    # single box -> below min_boxes -> clean
    single = label_json([("a", [(0, 0), (100, 100)])])
    rows = pd.DataFrame({
        "source": ["d.jpg", "c.jpg", "s.jpg"],
        NJCOL: [dup, clean, single],
    })
    rows.to_csv(src, index=False, encoding="utf-8-sig")

    high = tmp_path / "high.csv"
    other = tmp_path / "other.csv"
    filter_by_box_count_and_iou(str(src), str(high), str(other))

    high_df = pd.read_csv(high, encoding="utf-8-sig")
    other_df = pd.read_csv(other, encoding="utf-8-sig")
    assert high_df["source"].tolist() == ["d.jpg"]
    assert other_df["source"].tolist() == ["c.jpg", "s.jpg"]


def test_iou_filter_identical_zero_area_boxes_not_hit(tmp_path):
    # reference semantics: zero intersection area -> IoU 0 even for identical
    # degenerate boxes (core/processor.py:333-334)
    src = tmp_path / "in.csv"
    degenerate = label_json([
        ("a", [(5, 5), (5, 5)]),
        ("b", [(5, 5), (5, 5)]),
    ])
    pd.DataFrame({"source": ["z.jpg"], NJCOL: [degenerate]}).to_csv(
        src, index=False, encoding="utf-8-sig"
    )
    high = tmp_path / "high.csv"
    other = tmp_path / "other.csv"
    filter_by_box_count_and_iou(str(src), str(high), str(other))
    assert len(pd.read_csv(other, encoding="utf-8-sig")) == 1
    assert len(pd.read_csv(high, encoding="utf-8-sig")) == 0


# --- Step 6: label mapping ---------------------------------------------------


def test_replace_label_tokens_dedup_sort():
    new, replaced, count = replace_label_tokens("b,a，b;c", {"b": "a"})
    # tokens [b, a, b, c] -> map -> [a, a, a, c] -> dedup+sort -> "a,c"
    assert new == "a,c"
    assert replaced == 2
    assert count == 4


def test_replace_labels_by_mapping(tmp_path):
    src = tmp_path / "in.csv"
    j1 = label_json([("老猫", [(0, 0), (10, 10)])])
    j2 = label_json([("dog,老猫", [(0, 0), (10, 10)])])
    j3 = label_json([("unmapped", [(0, 0), (10, 10)])])
    pd.DataFrame({
        "source": ["1.jpg", "2.jpg", "3.jpg"],
        NJCOL: [j1, j2, j3],
    }).to_csv(src, index=False, encoding="utf-8-sig")

    mapping = tmp_path / "map.xlsx"
    xlsx.to_excel(pd.DataFrame({"旧": ["老猫"], "新": ["猫"]}), mapping)

    out = tmp_path / "out.csv"
    diff = tmp_path / "diff.xlsx"
    unmatched = tmp_path / "unmatched.xlsx"
    result = replace_labels_by_mapping(
        str(src), str(mapping), str(out),
        diff_excel_path=str(diff), unmatched_excel_path=str(unmatched),
    )
    s = result["summary"]
    assert s["total_rows"] == 3
    assert s["replaced_rows"] == 2
    assert s["replaced_labels"] == 2
    assert s["mapping_size"] == 1
    assert s["unmatched_labels"] == 2  # dog, unmapped

    df = pd.read_csv(out, encoding="utf-8-sig")
    assert json.loads(df[NJCOL][0])["objects"][0]["name"] == "猫"
    assert json.loads(df[NJCOL][1])["objects"][0]["name"] == "dog,猫"
    assert json.loads(df[NJCOL][2])["objects"][0]["name"] == "unmapped"

    unmatched_df = xlsx.read_workbook(unmatched, 0)
    assert set(unmatched_df["标签"]) == {"dog", "unmapped"}


# --- Step 7: rule-based split ------------------------------------------------


def _rules_xlsx(tmp_path):
    rules = tmp_path / "rules.xlsx"
    xlsx.to_excel(
        pd.DataFrame({"pets": ["猫,狗", None], "wild": ["狼", "鹰"]}), rules
    )
    return rules


def test_split_dataset_by_rules(tmp_path):
    src = tmp_path / "in.csv"
    rows = []
    for i in range(10):
        rows.append({
            "source": f"img_{i}.jpg",
            NJCOL: label_json([("猫", [(0, 0), (10, 10)]), ("狼", [(20, 20), (30, 30)])]),
        })
    rows.append({"source": "bad.jpg", NJCOL: "not json"})
    rows.append({
        "source": "unk.jpg",
        NJCOL: label_json([("恐龙", [(0, 0), (5, 5)])]),
    })
    pd.DataFrame(rows).to_csv(src, index=False, encoding="utf-8-sig")

    out_dir = tmp_path / "split"
    result = split_dataset_by_rules(
        str(src), str(_rules_xlsx(tmp_path)), str(out_dir),
        train_ratio=0.8, val_ratio=0.1, test_ratio=0.1, random_seed=42,
    )
    assert result["summary"]["categories"] == 2
    assert result["summary"]["classified"] == 20  # 10 rows x 2 objects
    assert result["summary"]["category_counts"] == {"pets": 10, "wild": 10}

    pets = xlsx.read_workbook(out_dir / "pets.xlsx", sheet_name=None)
    assert set(pets.keys()) == {"train", "val", "test"}
    assert len(pets["train"]) == 8 and len(pets["val"]) == 1 and len(pets["test"]) == 1
    # exploded rows carry single-object JSON + audit columns
    row0 = pets["train"].iloc[0]
    data = json.loads(row0[NJCOL])
    assert len(data["objects"]) == 1
    assert row0["分类标签"] == "猫"
    assert row0["分类类别"] == "pets"

    counts = xlsx.read_workbook(result["split_counts"], 0)
    assert len(counts) == 12
    uncls = xlsx.read_workbook(result["unclassified"], 0)
    # bad json row + per-label row for 恐龙 + row-level "nothing classified" row
    assert len(uncls) == 3

    # deterministic given seed
    result2 = split_dataset_by_rules(
        str(src), str(_rules_xlsx(tmp_path)), str(tmp_path / "split2"),
        random_seed=42,
    )
    pets2 = xlsx.read_workbook(tmp_path / "split2" / "pets.xlsx", sheet_name=None)
    assert pets2["train"]["source"].tolist() == pets["train"]["source"].tolist()


def test_summarize_unclassified(tmp_path):
    uncls = tmp_path / "unclassified.xlsx"
    xlsx.to_excel(
        pd.DataFrame({
            "source": ["a", "b", "c"],
            "无法分类原因": ["标签恐龙未在规则中定义", "JSON解析失败", "标签恐龙未在规则中定义"],
        }),
        uncls,
    )
    out = summarize_unclassified(str(uncls), str(tmp_path))
    book = xlsx.read_workbook(out, sheet_name=None)
    assert set(book.keys()) == {"reason_summary", "label_summary", "reason_label"}
    label_summary = book["label_summary"]
    row = label_summary[label_summary["标签"] == "恐龙"]
    assert row["数量"].tolist() == [2]


# --- Step 8: YOLO dataset generation ----------------------------------------


def _make_image(path, w=64, h=48):
    Image.new("RGB", (w, h), (120, 30, 200)).save(path)


def test_yolo_gen_nan_primary_claims_row(tmp_path):
    """Reference parity (processor.py:918 `row.get(primary) or
    row.get(fallback)`): float NaN is TRUTHY, so an empty-cell (NaN) primary
    column CLAIMS its row and the row is skipped — it must NOT fall back to
    the original label column. An empty-string primary DOES fall back."""
    import numpy as np

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    imgs = []
    for i in range(3):
        p = img_dir / f"im{i}.jpg"
        _make_image(p)
        imgs.append(str(p))
    fallback_cell = label_json([("猫", [(4, 4), (32, 24)])], width=64, height=48)
    rows = [
        # row 0: normal primary — processed
        {"source": imgs[0], "分类标签": "猫",
         NJCOL: fallback_cell, JCOL: fallback_cell},
        # row 1: NaN primary + valid fallback — must be SKIPPED (NaN claims)
        {"source": imgs[1], "分类标签": "猫",
         NJCOL: np.nan, JCOL: fallback_cell},
        # row 2: empty-string primary — falls back, processed
        {"source": imgs[2], "分类标签": "猫",
         NJCOL: "", JCOL: fallback_cell},
    ]
    excel = tmp_path / "cats.xlsx"
    xlsx.write_workbook(excel, {"train": pd.DataFrame(rows)})
    result = generate_yolo_datasets_from_excels(
        [str(excel)], str(tmp_path / "yolo")
    )
    # reference semantics: every row counts as processed; the NaN-primary
    # row lands in the skipped audit (无匹配标签框) and writes no label file
    assert result["total"] == 3 and result["processed"] == 3
    ds = result["datasets"][0]
    labels = sorted(p.name for p in (ds / "labels" / "train").glob("*.txt"))
    assert len(labels) == 2
    assert all("im1" not in name for name in labels)
    audit = xlsx.read_workbook(result["skipped"], 0)
    assert len(audit) == 1 and audit.iloc[0]["reason"] == "无匹配标签框"


def test_generate_yolo_datasets(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = {"train": [], "val": [], "test": []}
    for i in range(6):
        img = img_dir / f"im{i}.jpg"
        _make_image(img)
        split = "train" if i < 4 else ("val" if i == 4 else "test")
        rows[split].append({
            "source": str(img),
            "分类标签": "猫" if i % 2 == 0 else "狗",
            NJCOL: label_json(
                [("猫" if i % 2 == 0 else "狗", [(4, 4), (32, 24)])],
                width=64, height=48,
            ),
            "width": 64,
            "height": 48,
        })
    excel = tmp_path / "pets.xlsx"
    xlsx.write_workbook(excel, {k: pd.DataFrame(v) for k, v in rows.items()})

    out_dir = tmp_path / "yolo"
    result = generate_yolo_datasets_from_excels([str(excel)], str(out_dir))
    assert result["total"] == 6
    assert result["processed"] == 6
    ds = result["datasets"][0]
    assert ds.name == "pets"

    import yaml

    data = yaml.safe_load((ds / "data.yaml").read_text(encoding="utf-8"))
    assert data["nc"] == 2
    assert data["names"] == ["狗", "猫"]  # sorted unique
    assert data["train"] == "images/train"

    train_labels = sorted((ds / "labels" / "train").glob("*.txt"))
    assert len(train_labels) == 4
    line = train_labels[0].read_text().splitlines()[0]
    parts = line.split()
    assert len(parts) == 5
    cx, cy, w, h = map(float, parts[1:])
    assert abs(cx - (4 + 32) / 2 / 64) < 1e-5
    assert abs(h - (24 - 4) / 48) < 1e-5
    assert len(list((ds / "images" / "train").iterdir())) == 4

    # resume: second run skips existing labels, stats identical
    result2 = generate_yolo_datasets_from_excels([str(excel)], str(out_dir))
    assert result2["stats"] == result["stats"]
    assert result2["downloaded"] == 0

    # label-count statistics
    stats, flat = summarize_yolo_label_counts([str(ds)])
    assert stats["pets"]["train"]["total_images"] == 4
    assert stats["pets"]["all"]["box_counts"] == {"猫": 3, "狗": 3}
    assert not flat.empty


def test_generate_yolo_class_order_override(tmp_path):
    img = tmp_path / "im.jpg"
    _make_image(img)
    df = pd.DataFrame([{
        "source": str(img),
        "分类标签": "猫",
        NJCOL: label_json([("猫", [(1, 1), (10, 10)])], width=64, height=48),
        "width": 64, "height": 48,
    }])
    excel = tmp_path / "c.xlsx"
    xlsx.write_workbook(excel, {"train": df})
    out = generate_yolo_datasets_from_excels(
        [str(excel)], str(tmp_path / "y"), class_order=["猫"]
    )
    import yaml

    data = yaml.safe_load((out["datasets"][0] / "data.yaml").read_text(encoding="utf-8"))
    assert data["names"][0] == "猫"


def test_iou_filter_many_box_row_exact(tmp_path):
    # a row with more boxes than the packed cap still gets an exact verdict:
    # 80 disjoint boxes plus one near-duplicate pair at the END of the list
    objs = [(f"c{i}", [(i * 200, 0), (i * 200 + 50, 50)]) for i in range(80)]
    objs.append(("dup", [(0, 1000), (100, 1100)]))
    objs.append(("dup2", [(0, 1000), (100.001, 1100.001)]))
    src = tmp_path / "in.csv"
    pd.DataFrame({"source": ["big.jpg"], NJCOL: [label_json(objs, 99999, 99999)]}).to_csv(
        src, index=False, encoding="utf-8-sig"
    )
    high = tmp_path / "h.csv"
    other = tmp_path / "o.csv"
    filter_by_box_count_and_iou(str(src), str(high), str(other))
    assert len(pd.read_csv(high, encoding="utf-8-sig")) == 1  # the dup pair found
