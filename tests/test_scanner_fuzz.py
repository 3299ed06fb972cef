"""Adversarial fuzz: the native scanner must equal the pure-Python scan.

Randomized annotation cells — CJK + escape-heavy names (ensure_ascii both
ways produces \\uXXXX sequences), missing/None/typed-wrong fields, polygon
shape degeneracies, plus mutations into malformed JSON — are scanned through
both build_table paths and every semantic column is compared. For canonical
(json.dumps-formatted) cells the byte-splice rewriters must also reproduce
the pure-Python re-serialization exactly.
"""

import json
import random

import numpy as np
import pytest

from deal_yolo_daya_tpu.datakit import columnar


def _rand_name(rng):
    pool = ["猫", "狗,兔", 'a"b', "x\\y", "t\nn", "emoji🐈", "semi;colon",
            "plain", "", "s p a c e", "amp&lt"]
    return rng.choice(pool)


def _rand_point(rng):
    r = rng.random()
    if r < 0.55:
        return {"x": round(rng.uniform(-50, 500), 2), "y": rng.randint(0, 400)}
    if r < 0.7:
        return {"x": None, "y": rng.randint(0, 10)}
    if r < 0.8:
        return {"y": 5.5}            # missing x
    if r < 0.9:
        return {"x": "oops", "y": 1}  # non-numeric
    return "not a dict"


def _rand_obj(rng):
    obj = {}
    r = rng.random()
    if r < 0.75:
        obj["name"] = _rand_name(rng)
    elif r < 0.85:
        obj["name"] = None
    elif r < 0.92:
        obj["name"] = rng.choice([5, 1.5, True, ["l"]])
    # else: missing name
    r = rng.random()
    if r < 0.7:
        obj["polygon"] = {"ptList": [_rand_point(rng)
                                     for _ in range(rng.randint(0, 5))]}
    elif r < 0.78:
        obj["polygon"] = {}
    elif r < 0.84:
        obj["polygon"] = {"ptList": "not a list"}
    elif r < 0.9:
        obj["polygon"] = None
    # else: missing polygon
    if rng.random() < 0.15:
        obj["extra"] = {"nested": [1, {"deep": "val,ue"}]}
    return obj


def _rand_cell(rng):
    r = rng.random()
    if r < 0.06:
        return None
    if r < 0.10:
        return rng.choice(["", "not json", "[1, 2, 3]", '"just a string"',
                           "123", "{broken", '{"objects": [}'])
    data = {}
    if rng.random() < 0.85:
        data["width"] = rng.choice([1920, 640.5, "1024", None])
    if rng.random() < 0.85:
        data["height"] = rng.choice([1080, 0, -5.5])
    r = rng.random()
    if r < 0.8:
        data["objects"] = [_rand_obj(rng) if rng.random() < 0.9 else
                           rng.choice(["str", 7, None, [1]])
                           for _ in range(rng.randint(0, 4))]
    elif r < 0.9:
        data["objects"] = rng.choice(["not list", {"a": 1}, 3])
    # else: objects missing
    text = json.dumps(data, ensure_ascii=bool(rng.random() < 0.5))
    if rng.random() < 0.08:  # mutate into invalid JSON
        cut = rng.randint(0, max(len(text) - 1, 1))
        text = text[:cut] + rng.choice(["", "}", "]]", '"'])
    return text


@pytest.fixture(scope="module")
def fuzz_cells():
    rng = random.Random(1234)
    return [_rand_cell(rng) for _ in range(800)]


def test_scanner_fuzz_table_parity(fuzz_cells):
    from deal_yolo_daya_tpu.runtime import get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    t_nat = columnar.build_table(list(fuzz_cells))
    assert t_nat.native
    t_py = columnar._py_scan(fuzz_cells)
    np.testing.assert_array_equal(t_nat.status, t_py.status)
    np.testing.assert_array_equal(t_nat.objects_kind, t_py.objects_kind)
    np.testing.assert_array_equal(t_nat.row_flags, t_py.row_flags)
    np.testing.assert_array_equal(t_nat.wh, t_py.wh)
    np.testing.assert_array_equal(t_nat.obj_offsets, t_py.obj_offsets)
    np.testing.assert_array_equal(t_nat.obj_row, t_py.obj_row)
    assert t_nat.names == t_py.names
    np.testing.assert_array_equal(t_nat.name_kind, t_py.name_kind)
    np.testing.assert_array_equal(t_nat.flags, t_py.flags)
    np.testing.assert_array_equal(t_nat.npts, t_py.npts)
    ok = t_nat.bbox_ok()
    np.testing.assert_array_equal(ok, t_py.bbox_ok())
    np.testing.assert_allclose(t_nat.box[ok], t_py.box[ok])


def test_scanner_fuzz_rewrite_parity(fuzz_cells):
    """Byte-splice rewrite must be SEMANTICALLY identical to the pure-Python
    re-serialization (loads-equality: the splice deliberately preserves the
    source's escape style and inserts missing polygons at the front of the
    object, both JSON-equivalent; byte-level preservation has its own
    targeted tests)."""
    from deal_yolo_daya_tpu.runtime import get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    table = columnar.build_table(list(fuzz_cells))
    rewritten = columnar.rewrite_ptlists(table)
    checked = 0
    for i, (cell, out) in enumerate(zip(fuzz_cells, rewritten)):
        if not isinstance(cell, str):
            assert out is None
            continue
        try:
            json.loads(cell)
        except Exception:
            assert out is None
            continue
        if table.status[i] != columnar.ROW_OK:
            assert out is None
            continue
        expected = columnar._py_rewrite_ptlists_cell(cell)
        assert json.loads(out) == json.loads(expected), f"row {i}: {cell!r}"
        checked += 1
    assert checked > 300  # the generator must actually exercise the path
