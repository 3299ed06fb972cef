"""Round-trip tests for the minimal xlsx engine."""

import math

import numpy as np
import pandas as pd
import pytest

from deal_yolo_daya_tpu.utils import xlsx


def test_roundtrip_single_sheet(tmp_path):
    df = pd.DataFrame({
        "标签": ["猫", "狗,兔", "fish|bird"],
        "数量": [1, 22, 333],
        "ratio": [0.5, 1.25, -3.0],
    })
    path = tmp_path / "t.xlsx"
    xlsx.to_excel(df, path)
    back = xlsx.read_workbook(path, 0)
    assert list(back.columns) == ["标签", "数量", "ratio"]
    assert back["标签"].tolist() == ["猫", "狗,兔", "fish|bird"]
    assert back["数量"].tolist() == [1, 22, 333]
    assert back["ratio"].tolist() == [0.5, 1.25, -3.0]


def test_roundtrip_multi_sheet_and_sheet_names(tmp_path):
    path = tmp_path / "multi.xlsx"
    sheets = {
        "train": pd.DataFrame({"a": [1, 2]}),
        "val": pd.DataFrame({"a": [3]}),
        "test": pd.DataFrame({"a": []}),
    }
    xlsx.write_workbook(path, sheets)
    assert xlsx.sheet_names(path) == ["train", "val", "test"]
    book = xlsx.read_workbook(path, sheet_name=None)
    assert book["train"]["a"].tolist() == [1, 2]
    assert book["val"]["a"].tolist() == [3]
    assert len(book["test"]) == 0


def test_nan_and_none_cells(tmp_path):
    df = pd.DataFrame({"x": [1.0, float("nan"), 3.0], "y": ["a", None, "c"]})
    path = tmp_path / "nan.xlsx"
    xlsx.to_excel(df, path)
    back = xlsx.read_workbook(path, 0)
    assert back["x"][0] == 1.0
    assert math.isnan(float(back["x"][1]))
    assert back["y"].tolist()[0] == "a"
    assert back["y"].tolist()[2] == "c"


def test_xml_escaping_and_whitespace(tmp_path):
    df = pd.DataFrame({"t": ['<a href="x">&stuff</a>', "  padded  "]})
    path = tmp_path / "esc.xlsx"
    xlsx.to_excel(df, path)
    back = xlsx.read_workbook(path, 0)
    assert back["t"][0] == '<a href="x">&stuff</a>'
    assert back["t"][1] == "  padded  "


def test_excel_file_shim(tmp_path):
    path = tmp_path / "shim.xlsx"
    xlsx.write_workbook(path, {"only": pd.DataFrame({"z": [9]})})
    xf = xlsx.ExcelFile(path)
    assert xf.sheet_names == ["only"]
    assert xf.parse("only")["z"].tolist() == [9]


def test_excel_writer_context(tmp_path):
    path = tmp_path / "writer.xlsx"
    with xlsx.ExcelWriter(path) as w:
        w.write(pd.DataFrame({"a": [1]}), sheet_name="s1")
        w.write(pd.DataFrame({"b": [2]}), sheet_name="s2")
    assert xlsx.sheet_names(path) == ["s1", "s2"]


# ---------------------------------------------------------------------------
# Native sheet writer parity (labelscan.cpp::sheet_xml vs the Python writer)
# ---------------------------------------------------------------------------


NATIVE_PARITY_FRAMES = [
    # typed columns with every cell-format edge the Python writer handles
    pd.DataFrame({
        "s": ["猫,狗", " lead", "trail\t", "", None, 'a&b<c>"d', "multi\nline", "x" * 50],
        "f": [1.5, float("nan"), float("inf"), float("-inf"), 5.0, -0.0, 1e16, 1.23456789012345e-7],
        "i": np.arange(8, dtype=np.int64) * 123456789,
        "b": [True, False] * 4,
    }),
    # object column with mixed types -> per-cell RAW fallback
    pd.DataFrame({"o": [1, 2.5, "str", None, float("nan"), True, 7, "，分隔"]}),
    pd.DataFrame(index=range(3)),  # zero columns, row tags only
    pd.DataFrame(),  # fully empty
    pd.DataFrame({"t": pd.to_datetime(["2024-01-01", "2025-06-15"]),
                  "c": pd.Categorical(["x", "y"])}),  # exotic dtypes
    pd.DataFrame({"s": pd.array(["a", None, "b"], dtype="str"),
                  "n": pd.array([1, None, 3], dtype="float64")}),
    pd.DataFrame({"oi": np.array([1, 2, 3], dtype=object),
                  "of": np.array([1.0, None, float("nan")], dtype=object),
                  "on": [None, None, None]}),
]


@pytest.mark.parametrize("idx", range(len(NATIVE_PARITY_FRAMES)))
def test_native_sheet_writer_parity(idx):
    from deal_yolo_daya_tpu.runtime import get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    df = NATIVE_PARITY_FRAMES[idx]
    assert xlsx._sheet_part(df) == xlsx._sheet_xml(df).encode("utf-8")


def test_native_sheet_writer_parity_with_index():
    from deal_yolo_daya_tpu.runtime import get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    df = pd.DataFrame({"v": [1.0, 2.0]}, index=pd.Index(["a", "b"], name="idx"))
    got = xlsx._sheet_part(df, index=True)
    assert got == xlsx._sheet_xml(df, index=True).encode("utf-8")


def test_native_sheet_reader_matches_elementtree(tmp_path):
    """The C++ sheet parser must reproduce the ElementTree reader exactly
    (values, headers, NaN coercion) on every writer edge case."""
    import json
    import os
    import subprocess
    import sys

    from deal_yolo_daya_tpu.runtime import get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    df = pd.DataFrame({
        "s": ["猫,狗", " lead", "trail\t", "", None, 'a&b<c>"d', "multi\nline", "x" * 40],
        "f": [1.5, float("nan"), float("inf"), -float("inf"), 5.0, -0.0, 1e16, 1.23e-7],
        "i": (np.arange(8, dtype=np.int64) * 1234567) - 99,
        "b": [True, False] * 4,
    })
    path = tmp_path / "edge.xlsx"
    xlsx.write_workbook(path, {"t": df})
    native = xlsx.read_workbook(path, 0)
    script = (
        "import json, sys, pandas as pd\n"
        "from deal_yolo_daya_tpu.utils import xlsx\n"
        f"df = xlsx.read_workbook({str(path)!r}, 0)\n"
        "print(json.dumps([[None if (isinstance(v, float) and v != v) else"
        " (repr(v) if isinstance(v, float) else v) for v in row]"
        " for row in df.itertuples(index=False)], ensure_ascii=False))\n"
    )
    env = dict(os.environ, DYD_NO_NATIVE="1")
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, check=True)
    et_rows = json.loads(out.stdout.strip().splitlines()[-1])
    nat_rows = [
        [None if (isinstance(v, float) and v != v) else
         (repr(v) if isinstance(v, float) else v) for v in row]
        for row in native.itertuples(index=False)
    ]
    assert nat_rows == et_rows


def test_xlsx_roundtrip_fuzz(tmp_path):
    """Randomized write -> read roundtrips through the native writer AND
    native reader: values and NaN placement must survive exactly."""
    import random

    rng = random.Random(99)
    pool_str = ["猫,狗", "", " pad ", 'q"x', "a&b<c>", "line\nbreak", "🐈",
                "None", "标签;值"]
    for trial in range(8):
        n = rng.randint(0, 25)
        cols = {}
        for ci in range(rng.randint(1, 4)):
            kind = rng.choice(["str", "float", "int", "bool", "mixed"])
            name = f"c{ci}_{kind}"
            if kind == "str":
                cols[name] = [rng.choice(pool_str) if rng.random() > .15
                              else None for _ in range(n)]
            elif kind == "float":
                cols[name] = [rng.choice([1.5, -0.25, 1e16, 5.0,
                                          float("nan")])
                              for _ in range(n)]
            elif kind == "int":
                cols[name] = [rng.randint(-2 ** 40, 2 ** 40) for _ in range(n)]
            elif kind == "bool":
                cols[name] = [rng.random() > .5 for _ in range(n)]
            else:
                cols[name] = [rng.choice([7, 2.5, "x", None, True])
                              for _ in range(n)]
        df = pd.DataFrame({k: pd.Series(v, dtype=object)
                           for k, v in cols.items()})
        path = tmp_path / f"f{trial}.xlsx"
        xlsx.write_workbook(path, {"s": df})
        back = xlsx.read_workbook(path, 0)
        assert list(back.columns) == list(df.columns)
        assert len(back) == len(df)
        for c in df.columns:
            for got, want in zip(back[c].tolist(), df[c].tolist()):
                if want is None or (isinstance(want, float) and want != want):
                    assert pd.isna(got), (c, got, want)
                else:
                    assert got == want, (c, got, want)


def test_reader_is_text_inside_numeric_cell_no_overflow():
    """<is> runs inside a t="n" cell must not overflow the arena (the pass-1
    count used to skip them) and the <v> value must win, like ElementTree."""
    from deal_yolo_daya_tpu.runtime import sheet_parse_native

    big = "A" * 4096
    xml = (
        '<?xml version="1.0"?><worksheet><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>'
        f'<row r="2"><c r="A2"><is><t>{big}</t></is><v>7</v></c></row>'
        "</sheetData></worksheet>"
    ).encode()
    parsed = sheet_parse_native(xml)
    if parsed is None:
        pytest.skip("native lib unavailable")
    df = xlsx._df_from_native(parsed, [])
    assert df.iloc[0, 0] == 7


def test_writer_uint64_beyond_int64(tmp_path):
    """uint64 values above int64 max must keep their exact digits in the
    sheet XML (the int64 fast path would wrap to a negative number); the
    reader's float round-trip precision loss is the same as ElementTree's."""
    import zipfile

    df = pd.DataFrame({"u": np.array([2 ** 63 + 5, 1], dtype=np.uint64)})
    path = tmp_path / "u.xlsx"
    xlsx.write_workbook(path, {"s": df})
    sheet = zipfile.ZipFile(path).read("xl/worksheets/sheet1.xml")
    assert str(2 ** 63 + 5).encode() in sheet
    assert b"-922337" not in sheet


def test_reader_hex_value_stays_text():
    """Python float('0x1A') raises, so the value must stay text — strtod
    would happily parse it to 26."""
    from deal_yolo_daya_tpu.runtime import sheet_parse_native

    xml = (
        '<?xml version="1.0"?><worksheet><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>'
        '<row r="2"><c r="A2"><v>0x1A</v></c></row>'
        "</sheetData></worksheet>"
    ).encode()
    parsed = sheet_parse_native(xml)
    if parsed is None:
        pytest.skip("native lib unavailable")
    df = xlsx._df_from_native(parsed, [])
    assert df.iloc[0, 0] == "0x1A"
