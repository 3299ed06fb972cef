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
