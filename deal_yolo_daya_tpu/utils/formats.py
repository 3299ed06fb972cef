"""Display formatting helpers (reference: core/utils.py:16-141)."""

from __future__ import annotations

import json
import math

import pandas as pd


def format_bytes(value) -> str:
    if value is None:
        return "-"
    units = ["B", "KB", "MB", "GB", "TB"]
    size = float(value)
    idx = 0
    while size >= 1024 and idx < len(units) - 1:
        size /= 1024
        idx += 1
    return f"{size:.2f} {units[idx]}"


def format_duration(seconds) -> str:
    if seconds is None or seconds < 0:
        return "-"
    seconds = int(seconds)
    hours, rem = divmod(seconds, 3600)
    minutes, secs = divmod(rem, 60)
    if hours > 0:
        return f"{hours:02d}:{minutes:02d}:{secs:02d}"
    return f"{minutes:02d}:{secs:02d}"


def format_int(value) -> str:
    return "-" if value is None else f"{value:,}"


def format_ratio(numerator, denominator) -> str:
    if numerator is None or denominator in (None, 0):
        return "-"
    return f"{(numerator / denominator) * 100:.1f}%"


def safe_dataframe(df: pd.DataFrame) -> pd.DataFrame:
    """Coerce object cells to strings so Arrow-based UIs can render any frame."""

    def _coerce(value):
        if value is None:
            return ""
        if isinstance(value, float) and math.isnan(value):
            return ""
        if isinstance(value, (dict, list)):
            return json.dumps(value, ensure_ascii=False)
        if isinstance(value, (bytes, bytearray)):
            try:
                return value.decode("utf-8", errors="ignore")
            except Exception:
                return value.hex()
        return str(value)

    out = df.copy()
    for col in out.columns:
        if out[col].dtype == "object":
            out[col] = out[col].map(_coerce)
    return out
