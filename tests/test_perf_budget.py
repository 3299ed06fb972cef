"""Datakit perf-budget + byte-stability regression guard (VERDICT r3 item 6).

The columnar/native datakit wins (24x @50k vs the reference-shaped rowloop,
PERF.md round 3) previously lived only in prose — nothing failed CI when a
native path silently fell back to pure Python. Two guards:

- a golden byte-stability test at small n: every chain artifact's content
  hash is pinned (xlsx hashed by inner parts — the zip container embeds
  wall-time timestamps);
- a slow-marked wall-clock budget on the 50k 4-step chain, with ~5x
  headroom over the measured 5.9-6.6 s to absorb the 1-core host's throttle
  noise (PERF.md round 3b: up to 3x run-to-run). The reference-shaped
  rowloop takes 140-160 s at this size, so a fallback regression trips it
  even at maximum throttle.
"""

import hashlib
import json
import sys
import time
import zipfile
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import bench_datakit as bd  # noqa: E402

from deal_yolo_daya_tpu import runtime  # noqa: E402
from deal_yolo_daya_tpu.datakit import steps  # noqa: E402
from deal_yolo_daya_tpu.utils import xlsx  # noqa: E402

GOLDEN = Path(__file__).parent / "golden" / "datakit_chain_hashes.json"

LABEL_MAP = {"猫": "cat", "狗": "dog", "狼": "wolf"}
RULES = {
    lbl: ("pets" if i % 2 == 0 else "wild")
    for i, lbl in enumerate(bd.LABELS + list(LABEL_MAP.values()))
}


def _fixtures(root: Path):
    map_x = root / "map.xlsx"
    xlsx.to_excel(
        pd.DataFrame({"旧": list(LABEL_MAP), "新": list(LABEL_MAP.values())}), map_x
    )
    rules_x = root / "rules.xlsx"
    xlsx.to_excel(
        pd.DataFrame({
            cat: [",".join(k for k, v in RULES.items() if v == cat)]
            for cat in ("pets", "wild")
        }),
        rules_x,
    )
    return map_x, rules_x


def _run_chain(root: Path, n: int) -> float:
    """synth -> s4 -> s5 -> s6 -> s7; returns chain seconds (synth excluded)."""
    src = root / "raw.csv"
    bd.synth_csv(src, n)
    map_x, rules_x = _fixtures(root)
    t0 = time.perf_counter()
    steps.process_csv_replace_ptlist(
        str(src), str(root / "c4.csv"), str(root / "c4_excluded.csv"))
    steps.filter_by_box_count_and_iou(
        str(root / "c4.csv"), str(root / "c5_hi.csv"), str(root / "c5_other.csv"))
    steps.replace_labels_by_mapping(
        str(root / "c5_other.csv"), str(map_x), str(root / "c6.csv"),
        diff_excel_path=str(root / "c6_diff.xlsx"),
        unmatched_excel_path=str(root / "c6_unmatched.xlsx"))
    steps.split_dataset_by_rules(
        str(root / "c6.csv"), str(rules_x), str(root / "c7"))
    return time.perf_counter() - t0


def _content_hash(path: Path) -> str:
    """md5 of the artifact's CONTENT: raw bytes for CSV, sorted inner parts
    for xlsx (the zip container embeds write-time timestamps)."""
    h = hashlib.md5()
    if path.suffix == ".xlsx":
        with zipfile.ZipFile(path) as zf:
            for name in sorted(zf.namelist()):
                h.update(name.encode())
                h.update(zf.read(name))
    else:
        h.update(path.read_bytes())
    return h.hexdigest()


def _artifact_hashes(root: Path) -> dict:
    out = {}
    for p in sorted(root.rglob("*")):
        if p.is_file() and p.suffix in (".csv", ".xlsx") and p.name != "raw.csv":
            out[str(p.relative_to(root))] = _content_hash(p)
    return out


def test_datakit_chain_bytes_golden(tmp_path):
    """Every chain artifact is byte-stable against the committed golden set
    (regenerate with: python tests/test_perf_budget.py regen)."""
    _run_chain(tmp_path, 300)
    got = _artifact_hashes(tmp_path)
    want = json.loads(GOLDEN.read_text())
    assert got == want


@pytest.mark.slow
def test_datakit_chain_perf_budget(tmp_path):
    assert runtime.get_lib() is not None, (
        "native labelscan library failed to load — the datakit steps would "
        "silently run their pure-Python fallbacks"
    )
    dt = _run_chain(tmp_path, 50_000)
    assert dt <= 30.0, (
        f"50k 4-step chain took {dt:.1f}s (budget 30s; measured 5.9-6.6s "
        f"round 3 — a >5x regression means a native path stopped engaging)"
    )


if __name__ == "__main__" and "regen" in sys.argv:
    import tempfile

    root = Path(tempfile.mkdtemp(prefix="dk_golden_"))
    _run_chain(root, 300)
    GOLDEN.parent.mkdir(parents=True, exist_ok=True)
    GOLDEN.write_text(json.dumps(_artifact_hashes(root), indent=1,
                                 ensure_ascii=False) + "\n")
    print(f"wrote {GOLDEN}")
