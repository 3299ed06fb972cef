"""Typed key=value line parsing for advanced training overrides.

(reference: core/utils.py:531-567; consumed at ui/pages/training.py:479-483)
Value coercion order: JSON -> bool -> none/null -> float/int -> raw string.
"""

from __future__ import annotations

import json
from typing import Dict, List, Tuple


def parse_kv_lines(text: str) -> Tuple[Dict[str, object], List[str]]:
    options: Dict[str, object] = {}
    errors: List[str] = []
    if not text:
        return options, errors
    for raw_line in text.splitlines():
        line = raw_line.strip()
        if not line or line.startswith("#"):
            continue
        if "=" not in line:
            errors.append(f"无法解析：{raw_line}")
            continue
        key, raw_value = line.split("=", 1)
        key, raw_value = key.strip(), raw_value.strip()
        if not key:
            errors.append(f"参数名为空：{raw_line}")
            continue
        try:
            options[key] = json.loads(raw_value)
            continue
        except Exception:
            pass
        lowered = raw_value.lower()
        if lowered in {"true", "false"}:
            options[key] = lowered == "true"
        elif lowered in {"none", "null"}:
            options[key] = None
        else:
            try:
                options[key] = float(raw_value) if "." in raw_value else int(raw_value)
            except Exception:
                options[key] = raw_value
    return options, errors
