"""Native CSV writer parity vs pandas to_csv (utils/csvio.py)."""

import random
import string

import numpy as np
import pandas as pd
import pytest

from deal_yolo_daya_tpu.utils.csvio import write_csv


def _assert_parity(df, tmp_path, encoding="utf-8-sig"):
    p_nat, p_pd = tmp_path / "nat.csv", tmp_path / "pd.csv"
    write_csv(df, p_nat, encoding=encoding)
    df.to_csv(p_pd, index=False, encoding=encoding)
    assert p_nat.read_bytes() == p_pd.read_bytes()


EDGE_FRAMES = [
    pd.DataFrame({
        "a": ["plain", "with,comma", 'with"quote', "with\nnl", "with\rcr",
              "", None, " lead", "tab\t", "uni猫，分"],
        "b": [1.5, 5.0, float("nan"), float("inf"), -float("inf"), 1e16,
              1.23e-7, -0.0, 123456789.123456789, 2 ** 53 + 1.0],
        "c": np.arange(10, dtype=np.int64) * -987654321,
        "d": [True, False] * 5,
    }),
    pd.DataFrame({"single": ["", None, "x", "a,b"]}),  # "" quoting rule
    pd.DataFrame({"n": [None, None]}),
    pd.DataFrame(),
    pd.DataFrame({"a": [], "b": []}),
    pd.DataFrame({"s": pd.array(["a", None, "b"], dtype="str"),
                  "i": pd.array([1, None, 3], dtype="Int64"),
                  "f": pd.array([1.5, None, 2.0], dtype="Float64"),
                  "bo": pd.array([True, None, False], dtype="boolean")}),
    pd.DataFrame({'w,eird"name\n': [1, 2]}),
    # pandas-fallback columns must still match (they ARE pandas)
    pd.DataFrame({"t": pd.to_datetime(["2024-01-01", "2025-06-15"]),
                  "f32": np.array([0.1, 0.2], np.float32)}),
    pd.DataFrame({"m": [1, 2.5, "x,y", None, True]}),
    # mixed int/float object column (step-4 width/height shape): int-ness
    # must survive per cell (640 stays 640, 2.0 stays 2.0)
    pd.DataFrame({"w": pd.Series([640, 1.5, None, float("nan"), 0, -7, 2.0,
                                  2 ** 62], dtype=object),
                  "s": ["a", "b", None, "d", "e", "f,g", "h", "i"]}),
]


@pytest.mark.parametrize("idx", range(len(EDGE_FRAMES)))
def test_csv_parity_edges(idx, tmp_path):
    _assert_parity(EDGE_FRAMES[idx], tmp_path)


def test_csv_parity_plain_utf8(tmp_path):
    _assert_parity(pd.DataFrame({"a": ["猫", "x,y"]}), tmp_path, encoding="utf-8")


def test_csv_parity_fuzz(tmp_path):
    rng = random.Random(7)
    chars = string.ascii_letters + ',"\n\r\t 猫，；'

    def rand_str():
        return "".join(rng.choice(chars) for _ in range(rng.randint(0, 12)))

    for _ in range(12):
        n = rng.randint(0, 40)
        cols = {}
        for ci in range(rng.randint(1, 5)):
            kind = rng.choice(["str", "f64", "i64", "bool", "obj_str"])
            if kind == "str":
                cols[f"c{ci}"] = pd.Series(
                    [rand_str() if rng.random() > .15 else None for _ in range(n)],
                    dtype="str" if n else object)
            elif kind == "obj_str":
                cols[f"c{ci}"] = pd.Series(
                    [rand_str() if rng.random() > .15 else
                     (None if rng.random() > .5 else float("nan"))
                     for _ in range(n)], dtype=object)
            elif kind == "f64":
                cols[f"c{ci}"] = pd.Series(
                    [rng.choice([rng.uniform(-1e20, 1e20), float("nan"),
                                 float("inf"), 5.0, -0.0,
                                 rng.random() * 10 ** rng.randint(-20, 20)])
                     for _ in range(n)], dtype=np.float64)
            elif kind == "i64":
                cols[f"c{ci}"] = pd.Series(
                    [rng.randint(-2 ** 62, 2 ** 62) for _ in range(n)],
                    dtype=np.int64)
            else:
                cols[f"c{ci}"] = pd.Series(
                    [rng.random() > .5 for _ in range(n)], dtype=bool)
        _assert_parity(pd.DataFrame(cols), tmp_path)


def test_fast_reader_parity(tmp_path):
    """read_csv(heavy=...) must match pd.read_csv values/dtypes bit-exactly
    on the shapes the pipeline moves (JSON strings, URLs, numerics, NAs)."""
    from deal_yolo_daya_tpu.utils.csvio import read_csv

    rng = random.Random(3)
    rows = []
    for i in range(300):
        rows.append({
            "source": f"http://h/i_{i}.jpg" if rng.random() > .1 else None,
            "label": ('{"a": %d, "t": "x,y\\"q\\""}' % i) if rng.random() > .1 else None,
            "w": rng.choice([640, 1.5, None, -3, 2.0, 1e308, 1e-300,
                             0.1234567890123456789, float("nan")]),
            "h": rng.randint(-2 ** 40, 2 ** 40),
            "note": rng.choice(["ok", "None", "with,comma", 'q"uote', "", None,
                                "multi\nline", "True", "2024-01-01"]),
        })
    p = tmp_path / "t.csv"
    pd.DataFrame(rows).to_csv(p, index=False, encoding="utf-8-sig")

    got = read_csv(p, heavy=("source", "label"))
    ref = pd.read_csv(p, encoding="utf-8-sig")
    assert list(got.columns) == list(ref.columns)
    assert len(got) == len(ref)
    for c in got.columns:
        a = got[c].to_numpy(dtype=object).tolist()
        b = ref[c].to_numpy(dtype=object).tolist()
        for x, y in zip(a, b):
            if pd.isna(y):
                assert pd.isna(x), (c, x, y)
            else:
                assert x == y, (c, x, y)  # floats must be BIT-equal
    # numeric dtypes must match exactly (they decide downstream write bytes)
    for c in ("w", "h"):
        assert got[c].dtype == ref[c].dtype


def test_fast_reader_fallbacks(tmp_path):
    from deal_yolo_daya_tpu.utils.csvio import read_csv

    # no heavy columns present -> plain pandas result
    p = tmp_path / "a.csv"
    pd.DataFrame({"x": [1, 2], "y": ["a", "b"]}).to_csv(
        p, index=False, encoding="utf-8-sig")
    df = read_csv(p, heavy=("label",))
    assert df["x"].tolist() == [1, 2] and df["y"].tolist() == ["a", "b"]
    # duplicate headers -> pandas mangling preserved
    p2 = tmp_path / "b.csv"
    p2.write_text("a,a\n1,2\n", encoding="utf-8")
    df2 = read_csv(p2, encoding="utf-8", heavy=("a",))
    assert list(df2.columns) == ["a", "a.1"]


def test_write_float32_extension_dtype_parity(tmp_path):
    _assert_parity(
        pd.DataFrame({"a": pd.array([0.1, None, 2.5], dtype="Float32")}),
        tmp_path,
    )


def test_fast_reader_numeric_looking_heavy_column(tmp_path):
    """A declared-heavy column holding numeric text must round-trip exactly
    like pandas (typed + reformatted), not stay verbatim strings."""
    from deal_yolo_daya_tpu.utils.csvio import read_csv, write_csv

    p = tmp_path / "n.csv"
    p.write_text("source,label\n1.50,a\n007,b\n", encoding="utf-8")
    got = read_csv(p, encoding="utf-8", heavy=("source", "label"))
    ref = pd.read_csv(p, encoding="utf-8")
    assert got["source"].dtype == ref["source"].dtype
    assert got["source"].tolist() == ref["source"].tolist()
    out_a, out_b = tmp_path / "a.csv", tmp_path / "b.csv"
    write_csv(got, out_a, encoding="utf-8")
    ref.to_csv(out_b, index=False, encoding="utf-8")
    assert out_a.read_bytes() == out_b.read_bytes()


def test_native_path_engages_for_arrow_backed_columns(tmp_path):
    """Arrow-backed (ArrowDtype) string columns — what the hybrid fast reader
    produces for heavy columns — must classify natively, not silently fall
    back to pandas formatting. pa.array() on such a Series returns a
    CHUNKED array; before round 4 the classifier raised on it inside the
    callers' try/except, so every fast-read frame paid the 62 s/1M-row
    pandas to_csv (found by the s6 profile)."""
    import pyarrow as pa

    from deal_yolo_daya_tpu.utils.csvio import _col_spec, write_csv

    s = pd.Series(
        pa.chunked_array([["a", "b"], ["c,d", None]], type=pa.large_string())
        .to_pandas(types_mapper=pd.ArrowDtype)
    )
    spec = _col_spec(s)
    assert spec is not None, "Arrow-backed string column fell back to pandas"
    # and the write itself stays byte-identical to pandas
    df = pd.DataFrame({"x": s, "y": [1, 2, 3, 4]})
    out_a, out_b = tmp_path / "a.csv", tmp_path / "b.csv"
    write_csv(df, out_a, encoding="utf-8")
    df.to_csv(out_b, index=False, encoding="utf-8")
    assert out_a.read_bytes() == out_b.read_bytes()
