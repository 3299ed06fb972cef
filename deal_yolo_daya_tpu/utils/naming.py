"""Filesystem-safe naming helpers (reference: core/utils.py:525-529, 627-633, 712-724)."""

from __future__ import annotations

import re
from pathlib import Path


def safe_filename(value: str, default: str = "train") -> str:
    if not value:
        return default
    cleaned = re.sub(r"[^A-Za-z0-9._-]+", "_", str(value)).strip("_")
    return cleaned or default


def safe_dataset_dir_name(category_name, default_name: str) -> str:
    if not category_name:
        return default_name
    return safe_filename(str(category_name))


def safe_image_stem(source_url, idx) -> str:
    """Unique, filesystem-safe image stem derived from a URL/path + row index."""
    if not source_url:
        return f"img_{idx}"
    try:
        stem = Path(Path(str(source_url)).name).stem
        if "?" in stem:
            stem = stem.split("?")[0]
        return f"{safe_filename(stem)}_{idx}"
    except Exception:
        return f"img_{idx}"
