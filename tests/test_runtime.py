"""Native labelscan tests: parity with the Python parser + throughput sanity."""

import json
import time

import numpy as np
import pytest

from deal_yolo_daya_tpu.datakit.labels import (
    extract_boxes_with_labels,
    extract_two_point_boxes,
)
from deal_yolo_daya_tpu.runtime import get_lib, scan_boxes_native

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native labelscan unavailable (no g++)"
)


def ann(objs, w=320, h=240, extra=None):
    data = {"width": w, "height": h, "objects": [
        {"name": n, "polygon": {"ptList": [{"x": x, "y": y} for x, y in pts]},
         **(extra or {})}
        for n, pts in objs]}
    return json.dumps(data, ensure_ascii=False)


CASES = [
    ann([("猫", [(1, 2), (30, 40)])]),
    ann([("a,b", [(5, 5), (10, 2), (7, 30)]), ("c", [(0, 0), (1, 1)])]),
    ann([("tricky\"}]{[", [(3, 3), (9, 9)])]),          # braces inside strings
    ann([("x", [(3, 3)])]),                                 # 1-point
    ann([("neg", [(-5.5, -2.25), (10.125, 20.5)])]),
    '{"objects": []}',
    '{"width": 100}',
    "not json at all {{{",
    None,
    "",
    json.dumps({"objects": [{"name": "nopoly"}]}),
    json.dumps({"objects": [{"name": "nullpt",
                             "polygon": {"ptList": [{"x": None, "y": 5}, {"x": 1, "y": 2}]}}]}),
]


def test_two_point_parity():
    out = scan_boxes_native(CASES, two_point_only=True, max_boxes=8)
    boxes, mask, counts, wh = out
    for i, row in enumerate(CASES):
        expected = extract_two_point_boxes(row)
        assert counts[i] == len(expected), (i, row)
        got = boxes[i][mask[i]]
        np.testing.assert_allclose(got, np.asarray(expected, np.float32).reshape(-1, 4), atol=1e-5)


def test_polygon_bbox_parity():
    out = scan_boxes_native(CASES, two_point_only=False, max_boxes=8)
    boxes, mask, counts, wh = out
    for i, row in enumerate(CASES):
        expected = [b[1:] for b in extract_boxes_with_labels(row)
                    if b[0]]  # labeled objects only
        # native mode does not require a name -> it may return more boxes
        # than the labeled extraction; compare against name-agnostic parse
        import json as _json

        try:
            data = _json.loads(row) if isinstance(row, str) else None
        except Exception:
            data = None
        ref = []
        if isinstance(data, dict):
            for obj in data.get("objects", []):
                if not isinstance(obj, dict):
                    continue
                ptlist = (obj.get("polygon") or {}).get("ptList", [])
                xs = [p["x"] for p in ptlist
                      if isinstance(p, dict) and p.get("x") is not None]
                ys = [p["y"] for p in ptlist
                      if isinstance(p, dict) and p.get("y") is not None]
                if xs and ys:
                    ref.append((min(xs), min(ys), max(xs), max(ys)))
        assert counts[i] == len(ref), (i, row)
        got = boxes[i][mask[i]]
        np.testing.assert_allclose(got, np.asarray(ref, np.float32).reshape(-1, 4), atol=1e-4)


def test_width_height_extraction():
    out = scan_boxes_native([ann([("a", [(0, 0), (1, 1)])], w=777, h=555)],
                            two_point_only=True)
    _, _, _, wh = out
    np.testing.assert_allclose(wh[0], [777, 555])
    out2 = scan_boxes_native(['{"objects": []}'], two_point_only=True)
    np.testing.assert_allclose(out2[3][0], [-1, -1])


def test_throughput_vs_python():
    rows = [ann([("c" + str(i % 5), [(i % 50, i % 40), (i % 50 + 20, i % 40 + 30)]),
                 ("d", [(5, 5), (25, 35)])]) for i in range(20000)]
    t0 = time.perf_counter()
    native = scan_boxes_native(rows, two_point_only=True, max_boxes=8)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    py = [extract_two_point_boxes(r) for r in rows]
    t_py = time.perf_counter() - t0
    assert native[2].sum() == sum(len(b) for b in py)
    # informative: native should win clearly on this workload
    print(f"native {t_native*1000:.1f}ms vs python {t_py*1000:.1f}ms "
          f"({t_py/max(t_native,1e-9):.1f}x)")
    assert t_native < t_py


def test_native_rewrite_matches_python_splice():
    """The C++ step-4 applier (rewrite_ptlists_rows) must be byte-identical
    to the Python per-object splice path, including Python-repr float text
    (int collapse < 2^53, sci form iff decimal exponent > 16 or < -4,
    trailing .0 in fixed form)."""
    import deal_yolo_daya_tpu.runtime as rt
    from deal_yolo_daya_tpu.datakit import columnar

    tricky = [
        0.0, -0.0, 1.0, -7.0, 10.5, 0.1, 1/3, 1e-5, 0.0001, 123.456,
        2.5, -2.25, 1e15, 1e16, 9007199254740992.0, 9007199254740991.0,
        1.2345678901234567e16, 1e22, 1e-300, 2.2250738585072014e-308,
        -1.5e-7, 3.141592653589793, 255.9999999999999,
    ]
    cells = []
    for i in range(0, len(tricky) - 1, 2):
        a, b = tricky[i], tricky[i + 1]
        cells.append(json.dumps({
            "width": 100, "height": 100,
            "objects": [
                {"name": "k", "polygon": {"ptList": [
                    {"x": a, "y": b}, {"x": b, "y": a}, {"x": 0, "y": 0}]}},
                {"name": "empty-poly", "polygon": {}},
                {"name": "no-poly"},
                {"name": "null-pts", "polygon": {"ptList": [
                    {"x": None, "y": None}]}},
            ],
        }))
    table = columnar.build_table(cells)
    assert table.native, "native scanner required for this parity test"
    got = columnar.rewrite_ptlists(table)

    # Python reference: force the pure-Python splice branch
    orig = rt.rewrite_ptlists_native
    rt.rewrite_ptlists_native = lambda *a, **k: None
    try:
        want = columnar.rewrite_ptlists(columnar.build_table(cells))
    finally:
        rt.rewrite_ptlists_native = orig
    assert got == want
    # and every rewritten cell must stay valid JSON with 2-point ptLists
    for text in got:
        data = json.loads(text)
        for obj in data["objects"]:
            assert len(obj["polygon"]["ptList"]) == 2


def test_native_matcher_matches_numpy():
    """The C++ val matcher must reproduce the numpy greedy matcher exactly
    (same pair order, same stable-descending tie rule)."""
    import deal_yolo_daya_tpu.runtime as rt
    from deal_yolo_daya_tpu.train import metrics as M

    rng = np.random.default_rng(11)
    for trial in range(30):
        n_pred = int(rng.integers(0, 40))
        n_gt = int(rng.integers(0, 12))
        pb = rng.uniform(0, 80, (n_pred, 4)).astype(np.float32)
        pb[:, 2:] += pb[:, :2]
        gb = rng.uniform(0, 80, (n_gt, 4)).astype(np.float32)
        gb[:, 2:] += gb[:, :2]
        # overlap some preds with gts so matches actually occur
        for k in range(min(n_pred, n_gt)):
            pb[k] = gb[k] + rng.normal(0, 3, 4).astype(np.float32)
        pc = rng.integers(0, 3, n_pred).astype(np.int32)
        gc = rng.integers(0, 3, n_gt).astype(np.int32)
        native = rt.match_predictions_native(
            pb, pc, gb, gc, M.IOU_THRESHOLDS.astype(np.float32))
        if native is None:
            pytest.skip("native lib unavailable")
        orig = rt.match_predictions_native
        rt.match_predictions_native = lambda *a, **k: None
        try:
            ref = M.match_predictions(pb, pc, gb, gc)
        finally:
            rt.match_predictions_native = orig
        np.testing.assert_array_equal(native, ref, err_msg=f"trial {trial}")


def test_blob_rows_parity_with_list_mode():
    """Zero-copy Arrow BlobRows input must produce identical tables/rewrites
    to the per-row bytes list path."""
    import json

    import pandas as pd

    from deal_yolo_daya_tpu.datakit import columnar
    from deal_yolo_daya_tpu.runtime import BlobRows, get_lib

    if get_lib() is None:
        pytest.skip("native labelscan unavailable (no g++)")
    cells = [
        json.dumps({"width": 10, "height": 20, "objects": [
            {"name": "猫,狗", "polygon": {"ptList": [
                {"x": 1, "y": 2}, {"x": 3.5, "y": 4}]}}]}, ensure_ascii=False),
        None, "not json", "",
        json.dumps({"objects": []}),
    ] * 40
    t_list = columnar.build_table(list(cells))
    t_blob = columnar.build_table(pd.Series(cells, dtype=object))
    assert isinstance(t_blob.raw, BlobRows)
    assert (t_list.status == t_blob.status).all()
    assert t_list.names == t_blob.names
    assert (t_list.spans == t_blob.spans).all()
    for i in range(len(cells)):
        assert t_blob.raw[i] == t_list.raw[i]
    assert columnar.rewrite_ptlists(t_list) == columnar.rewrite_ptlists(t_blob)
    objs = np.arange(t_list.m)
    lbls = np.array(["X"] * t_list.m, object)
    assert columnar.extract_single_objects(t_list, objs, lbls) == \
        columnar.extract_single_objects(t_blob, objs, lbls)
