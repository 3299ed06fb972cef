"""Fast CSV writing with pandas ``to_csv`` byte parity.

``pd.DataFrame.to_csv`` renders every cell through Python-level formatting —
the dominant cost of the CSV-heavy datakit steps at 1M rows (~17 s/write).
``write_csv`` routes frames whose columns are natively expressible
(str / float64 / int64 / bool, plus their nullable-Arrow variants) through
the C++ writer (runtime/labelscan.cpp::csv_write) and falls back to pandas
for anything else — so the output bytes are identical either way:
QUOTE_MINIMAL quoting ({',', '"', '\\n', '\\r'} triggers, quote doubling),
repr() floats, NaN/None -> empty, True/False bools, single-column empty
fields as "" (reference artifact contract: core/processor.py to_csv calls).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Union

import numpy as np
import pandas as pd

_QUOTE_TRIGGERS = (",", '"', "\n", "\r")
_EMPTY_BLOB = b"\x00"


def _addr_of(b: bytes) -> int:
    import ctypes

    return ctypes.cast(b, ctypes.c_void_p).value or 0


def _quote(field: str) -> str:
    if any(ch in field for ch in _QUOTE_TRIGGERS):
        return '"' + field.replace('"', '""') + '"'
    return field


def _col_spec(values: pd.Series):
    """(spec, keepalive) for one column, or None when pandas must format it
    (float32, datetimes, mixed object cells, huge uints, ...)."""
    import pyarrow as pa

    from ..runtime import XLSX_BOOL, XLSX_F64, XLSX_I64, XLSX_STR

    dt = values.dtype
    if isinstance(dt, np.dtype):
        if dt == bool:
            return {"kind": XLSX_BOOL, "i64": values.to_numpy().astype(np.int64)}, []
        if dt.kind == "i":
            return {"kind": XLSX_I64, "i64": values.to_numpy(np.int64)}, []
        if dt.kind == "u":
            v = values.to_numpy()
            if v.size and v.max() > np.iinfo(np.int64).max:
                return None
            return {"kind": XLSX_I64, "i64": v.astype(np.int64)}, []
        if dt == np.float64:
            return {"kind": XLSX_F64, "f64": values.to_numpy(np.float64)}, []
        if dt != object:  # float32/f16 repr differs; datetimes format specially
            return None

    trusted = not (isinstance(dt, np.dtype) and dt == object)
    obj = None if trusted else values.to_numpy(dtype=object)
    try:
        arr = pa.array(obj if obj is not None else values, from_pandas=True)
    except Exception:
        return None

    def exact(py_type) -> bool:
        if trusted:
            return True
        for v in obj:
            if type(v) is py_type or v is None:
                continue
            if type(v) is float and v != v:  # NaN null
                continue
            return False
        return True

    def valid_mask():
        if not arr.null_count:
            return None
        return arr.is_valid().to_numpy(zero_copy_only=False).astype(np.uint8)

    t = arr.type
    if pa.types.is_null(t):
        return {"kind": XLSX_F64, "f64": np.full(len(arr), np.nan)}, []
    if (pa.types.is_string(t) or pa.types.is_large_string(t)) and exact(str):
        arr = arr.cast(pa.large_string())
        if arr.offset:
            return None
        bufs = arr.buffers()  # [validity, offsets(int64 x n+1), data]
        blob = bufs[2]
        return (
            {
                "kind": XLSX_STR,
                "blob": blob.address if blob is not None else _addr_of(_EMPTY_BLOB),
                "off": bufs[1].address,
                "valid": valid_mask(),
            },
            [arr, bufs],
        )
    if pa.types.is_integer(t) and exact(int):
        valid = valid_mask()
        try:
            vals = arr.cast(pa.int64()).fill_null(0).to_numpy(zero_copy_only=False)
        except Exception:
            return None
        return {"kind": XLSX_I64, "i64": vals, "valid": valid}, []
    if pa.types.is_floating(t) and exact(float):
        vals = arr.cast(pa.float64()).to_numpy(zero_copy_only=False)
        return {"kind": XLSX_F64, "f64": vals}, []
    if pa.types.is_boolean(t) and exact(bool):
        valid = valid_mask()
        vals = arr.fill_null(False).to_numpy(zero_copy_only=False).astype(np.int64)
        return {"kind": XLSX_BOOL, "i64": vals, "valid": valid}, []
    if not trusted and (pa.types.is_floating(t) or pa.types.is_integer(t)):
        # mixed int/float object column (e.g. step-4 width/height): a 3-state
        # per-cell tag keeps int-ness (pandas writes 640, not 640.0)
        from ..runtime import CSV_NUMOBJ

        n = len(obj)
        tag = np.zeros(n, np.uint8)
        i64 = np.zeros(n, np.int64)
        f64 = np.zeros(n, np.float64)
        for k, v in enumerate(obj):
            tv = type(v)
            if tv is int:
                if not (-(2 ** 63) <= v < 2 ** 63):
                    return None
                tag[k] = 1
                i64[k] = v
            elif tv is float:
                if v == v:  # NaN stays tag 0 (empty)
                    tag[k] = 2
                    f64[k] = v
            elif v is not None:
                return None
        return {"kind": CSV_NUMOBJ, "i64": i64, "f64": f64, "valid": tag}, []
    return None


def _write_native(df: pd.DataFrame, path: Path, encoding: str) -> bool:
    from ..runtime import csv_write_native, get_lib

    if get_lib() is None:
        return False
    try:
        specs, keep = [], []
        for i in range(df.shape[1]):  # positional: duplicate names stay safe
            r = _col_spec(df.iloc[:, i])
            if r is None:
                return False
            spec, ka = r
            specs.append(spec)
            keep.extend(ka)
        header = (",".join(_quote(str(c)) for c in df.columns) + "\n").encode("utf-8")
        with open(path, "wb") as f:
            if encoding.lower().replace("_", "-") == "utf-8-sig":
                f.write(b"\xef\xbb\xbf")
            ok = csv_write_native(len(df), specs, header, f)
        del keep
        return ok
    except Exception:
        return False


def write_csv(
    df: pd.DataFrame,
    path: Union[str, Path],
    encoding: str = "utf-8-sig",
    index: bool = False,
) -> Path:
    """``df.to_csv(path, index=index, encoding=encoding)`` — native when the
    frame allows it, pandas otherwise; identical bytes either way."""
    path = Path(path)
    norm = encoding.lower().replace("_", "-")
    native_ok = (
        not index
        and os.linesep == "\n"
        and norm in ("utf-8", "utf-8-sig")
        and _write_native(df, path, encoding)
    )
    if not native_ok:
        df.to_csv(path, index=index, encoding=encoding)
    return path
