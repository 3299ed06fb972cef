"""Datakit columnar-vs-rowloop benchmark (VERDICT round-1 item #1).

Generates a synthetic N-row annotation CSV and times steps 4-7 twice:
1. the shipped columnar implementations (native scan + splice rewriting)
2. a row-loop baseline reproducing the reference's shape (json.loads per
   row, per-object Python work, json.dumps per row — the pattern at
   /root/reference/src/deal_yolo_data/core/processor.py:283, 565, 711)

Usage: python tools/bench_datakit.py [n_rows]
"""

import json
import random
import sys
import time
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deal_yolo_daya_tpu.datakit import steps  # noqa: E402
from deal_yolo_daya_tpu.datakit.labels import (  # noqa: E402
    LABEL_JSON_COL,
    NEW_LABEL_JSON_COL,
    replace_label_tokens,
    split_object_labels,
)
from deal_yolo_daya_tpu.utils import xlsx  # noqa: E402

LABELS = ["猫", "狗", "狼", "鹰", "鹿", "兔", "car", "truck", "person", "bike"]


def synth_csv(path: Path, n: int, seed: int = 0):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        n_obj = rng.randint(1, 4)
        objs = []
        for _ in range(n_obj):
            name = rng.choice(LABELS)
            if rng.random() < 0.2:
                name += "," + rng.choice(LABELS)
            x, y = rng.uniform(0, 500), rng.uniform(0, 500)
            w, h = rng.uniform(10, 200), rng.uniform(10, 200)
            pts = [{"x": round(x, 2), "y": round(y, 2)},
                   {"x": round(x + w, 2), "y": round(y + h, 2)}]
            if rng.random() < 0.3:  # polygon with extra points
                pts.append({"x": round(x + w / 2, 2), "y": round(y + h / 2, 2)})
            objs.append({"name": name, "polygon": {"ptList": pts}})
        cell = json.dumps(
            {"width": 1920, "height": 1080, "objects": objs}, ensure_ascii=False
        )
        rows.append({"source": f"http://host/img_{i}.jpg", LABEL_JSON_COL: cell})
    pd.DataFrame(rows).to_csv(path, index=False, encoding="utf-8-sig")


# --- row-loop baselines (reference shape, measurement only) -----------------


def rowloop_step4(in_csv, out_csv):
    df = pd.read_csv(in_csv, encoding="utf-8-sig")
    new_jsons, widths, heights = [], [], []
    for cell in df[LABEL_JSON_COL].tolist():
        try:
            data = json.loads(cell)
        except Exception:
            new_jsons.append(None); widths.append(None); heights.append(None)
            continue
        widths.append(data.get("width")); heights.append(data.get("height"))
        for obj in data.get("objects", []):
            pts = (obj.get("polygon") or {}).get("ptList", [])
            xs = [p["x"] for p in pts if p.get("x") is not None]
            ys = [p["y"] for p in pts if p.get("y") is not None]
            if xs and ys:
                obj["polygon"]["ptList"] = [
                    {"x": min(xs), "y": min(ys)}, {"x": max(xs), "y": max(ys)}
                ]
        new_jsons.append(json.dumps(data, ensure_ascii=False))
    df[NEW_LABEL_JSON_COL] = new_jsons
    df["width"] = widths
    df["height"] = heights
    df.to_csv(out_csv, index=False, encoding="utf-8-sig")


def rowloop_step5(in_csv, hi_csv, other_csv, min_boxes=2, thr=0.98):
    df = pd.read_csv(in_csv, encoding="utf-8-sig")
    hits = []
    for cell in df[NEW_LABEL_JSON_COL].tolist():
        boxes = []
        try:
            data = json.loads(cell)
            for obj in data.get("objects", []):
                pts = (obj.get("polygon") or {}).get("ptList", [])
                if len(pts) == 2 and all(
                    p.get("x") is not None and p.get("y") is not None for p in pts
                ):
                    x1, x2 = sorted((pts[0]["x"], pts[1]["x"]))
                    y1, y2 = sorted((pts[0]["y"], pts[1]["y"]))
                    boxes.append((x1, y1, x2, y2))
        except Exception:
            pass
        hit = False
        if len(boxes) >= min_boxes:
            for a in range(len(boxes)):
                for b in range(a + 1, len(boxes)):
                    ax1, ay1, ax2, ay2 = boxes[a]
                    bx1, by1, bx2, by2 = boxes[b]
                    iw = min(ax2, bx2) - max(ax1, bx1)
                    ih = min(ay2, by2) - max(ay1, by1)
                    if iw <= 0 or ih <= 0:
                        continue
                    inter = iw * ih
                    ua = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
                    if ua > 0 and inter / ua >= thr:
                        hit = True
                        break
                if hit:
                    break
        hits.append(hit)
    df[pd.Series(hits)].to_csv(hi_csv, index=False, encoding="utf-8-sig")
    df[~pd.Series(hits)].to_csv(other_csv, index=False, encoding="utf-8-sig")


def rowloop_step6(in_csv, label_map, out_csv):
    df = pd.read_csv(in_csv, encoding="utf-8-sig")
    # the reference maps BOTH label columns (processor.py:547-567)
    for col in (NEW_LABEL_JSON_COL, LABEL_JSON_COL):
        if col not in df.columns:
            continue
        vals = df[col].tolist()
        for i, cell in enumerate(vals):
            if not isinstance(cell, str) or not cell:
                continue
            try:
                data = json.loads(cell)
            except Exception:
                continue
            objects = data.get("objects")
            if not isinstance(objects, list):
                continue
            for obj in objects:
                if not isinstance(obj, dict) or obj.get("name") is None:
                    continue
                new_name, replaced, _ = replace_label_tokens(obj["name"], label_map)
                if replaced:
                    obj["name"] = new_name
            vals[i] = json.dumps(data, ensure_ascii=False)
        df[col] = vals
    df.to_csv(out_csv, index=False, encoding="utf-8-sig")


def rowloop_step7(in_csv, rules, out_dir):
    df = pd.read_csv(in_csv, encoding="utf-8-sig")
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    category_rows = {}
    for _, row in df.iterrows():
        cell = row.get(NEW_LABEL_JSON_COL)
        if not isinstance(cell, str):
            continue
        try:
            data = json.loads(cell)
        except Exception:
            continue
        for obj in data.get("objects", []):
            if not isinstance(obj, dict):
                continue
            for label in split_object_labels(obj.get("name")):
                cat = rules.get(label)
                if cat is None:
                    continue
                new_row = row.copy()
                oc = json.loads(json.dumps(obj))
                oc["name"] = label
                nd = {k: v for k, v in data.items() if k != "objects"}
                nd["objects"] = [oc]
                new_row[NEW_LABEL_JSON_COL] = json.dumps(nd, ensure_ascii=False)
                new_row["分类标签"] = label
                new_row["分类类别"] = cat
                category_rows.setdefault(cat, []).append(new_row)
    for cat, rows in category_rows.items():
        cdf = pd.DataFrame(rows).sample(frac=1, random_state=42)
        n = len(cdf)
        xlsx.write_workbook(out_dir / f"{cat}.xlsx", {
            "train": cdf.iloc[:int(n * .8)],
            "val": cdf.iloc[int(n * .8):int(n * .9)],
            "test": cdf.iloc[int(n * .9):],
        })


def timeit(fn, *args, **kw):
    t0 = time.perf_counter()
    fn(*args, **kw)
    return time.perf_counter() - t0


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    # --columnar-only: skip the reference-shaped row-loop baselines (at the
    # 1M-row north-star scale they run for over an hour)
    columnar_only = "--columnar-only" in sys.argv
    n = int(args[0]) if args else 1_000_000
    import tempfile

    root = Path(tempfile.mkdtemp(prefix="dk_bench_"))
    src = root / "raw.csv"
    print(f"generating {n} synthetic rows ...", flush=True)
    synth_csv(src, n)

    label_map = {"猫": "cat", "狗": "dog", "狼": "wolf"}
    rules = {lbl: ("pets" if i % 2 == 0 else "wild") for i, lbl in enumerate(
        LABELS + ["cat", "dog", "wolf"])}
    map_xlsx = root / "map.xlsx"
    xlsx.to_excel(pd.DataFrame({"旧": list(label_map), "新": list(label_map.values())}), map_xlsx)
    rules_xlsx = root / "rules.xlsx"
    xlsx.to_excel(pd.DataFrame({
        "pets": [",".join(k for k, v in rules.items() if v == "pets")],
        "wild": [",".join(k for k, v in rules.items() if v == "wild")],
    }), rules_xlsx)

    results = {}
    results["columnar_s4"] = timeit(
        steps.process_csv_replace_ptlist, str(src), str(root / "c4.csv"), str(root / "c4x.csv"))
    if not columnar_only:
        results["rowloop_s4"] = timeit(rowloop_step4, str(src), str(root / "r4.csv"))
    results["columnar_s5"] = timeit(
        steps.filter_by_box_count_and_iou, str(root / "c4.csv"),
        str(root / "c5h.csv"), str(root / "c5o.csv"))
    if not columnar_only:
        results["rowloop_s5"] = timeit(
            rowloop_step5, str(root / "c4.csv"), str(root / "r5h.csv"), str(root / "r5o.csv"))
    results["columnar_s6"] = timeit(
        steps.replace_labels_by_mapping, str(root / "c5o.csv"), str(map_xlsx),
        str(root / "c6.csv"))
    if not columnar_only:
        results["rowloop_s6"] = timeit(
            rowloop_step6, str(root / "c5o.csv"), label_map, str(root / "r6.csv"))
    results["columnar_s7"] = timeit(
        steps.split_dataset_by_rules, str(root / "c6.csv"), str(rules_xlsx),
        str(root / "c7"))
    if not columnar_only:
        results["rowloop_s7"] = timeit(
            rowloop_step7, str(root / "c6.csv"), rules, str(root / "r7"))
    # step 8 (YOLO generator) read-back: plan + skip-audit over the split
    # workbooks (sources are synthetic, downloads off). No rowloop
    # counterpart — the point is that the chain is consumable end-to-end
    # (the round-2 reader could not even parse these workbooks at 1M rows).
    from deal_yolo_daya_tpu.datakit import yolo_dataset  # noqa: E402

    cat_xlsx = [
        str(p) for p in (root / "c7").glob("*.xlsx")
        if p.name not in ("unclassified.xlsx", "split_counts.xlsx")
    ]
    results["columnar_s8_readback"] = timeit(
        yolo_dataset.generate_yolo_datasets_from_excels, cat_xlsx,
        str(root / "c8"), download_images=False)

    print(f"\n=== datakit bench, n={n} ===")
    print(f"step s8 read-back: columnar {results['columnar_s8_readback']:8.2f}s")
    total_c = total_r = 0.0
    for s in ("s4", "s5", "s6", "s7"):
        c = results[f"columnar_{s}"]
        total_c += c
        if columnar_only:
            print(f"step {s}: columnar {c:8.2f}s")
            continue
        r = results[f"rowloop_{s}"]
        total_r += r
        print(f"step {s}: columnar {c:8.2f}s   rowloop {r:8.2f}s   speedup {r / c:6.1f}x")
    if columnar_only:
        print(f"TOTAL  : columnar {total_c:8.2f}s")
        print(json.dumps({"n": n, **{k: round(v, 3) for k, v in results.items()},
                          "total_columnar": round(total_c, 2)}))
    else:
        print(f"TOTAL  : columnar {total_c:8.2f}s   rowloop {total_r:8.2f}s   "
              f"speedup {total_r / total_c:6.1f}x")
        print(json.dumps({"n": n, **{k: round(v, 3) for k, v in results.items()},
                          "speedup_total": round(total_r / total_c, 2)}))


if __name__ == "__main__":
    main()
