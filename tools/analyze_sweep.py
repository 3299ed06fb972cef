"""Summarize a tools/tpu_sweep.sh output directory into a PERF.md-ready
markdown table.

Usage: python tools/analyze_sweep.py [/tmp/sweep_r4]

Each stage log is scanned for its most informative lines: the bench JSON
line, bench_train "full_step ... ms" rows, probe_int8 ratios, autobatch
suggestions, serve p50/p95, and the augment A/B rows. Stages that timed out
or errored are listed with their tail so nothing fails silently.
"""

import json
import re
import sys
from pathlib import Path


def tail(path: Path, n: int = 3) -> str:
    try:
        lines = path.read_text(errors="replace").strip().splitlines()
        return " | ".join(lines[-n:])
    except OSError:
        return "<unreadable>"


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_r4")
    logs = sorted(out.glob("*.log"))
    if not logs:
        print(f"no logs under {out}")
        return
    rows = []
    problems = []
    for log in logs:
        text = log.read_text(errors="replace")
        name = log.stem
        picked = []
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    j = json.loads(line)
                    picked.append(
                        f"{j['metric']}={j['value']:.1f} {j.get('unit', '')} "
                        f"(vs_baseline {j.get('vs_baseline', 0):.2f})"
                        + (f" ERROR: {j['error']}" if j.get("error") else "")
                    )
                    for k, v in j.items():
                        if k.startswith(("int8_", "trained_", "chunked_",
                                         "infer_mfu", "train_mfu")):
                            picked.append(f"  {k}={v}")
                except (ValueError, KeyError):
                    pass
            elif re.search(
                r"(full_step|img/s|ms/step|ms/batch|p50|p95|suggested|"
                r"speedup|ratio|GiB at b=|-> batch)", line
            ) and not line.startswith(("WARNING", "E08", "I08")):
                picked.append(line)
        if not picked:
            problems.append((name, tail(log)))
        else:
            rows.append((name, picked[:8]))

    print(f"## Sweep summary — {out}\n")
    for name, picked in rows:
        print(f"### {name}")
        for p in picked:
            print(f"- {p}")
        print()
    if problems:
        print("### stages with no recognizable output (timeout/error?)")
        for name, t in problems:
            print(f"- {name}: {t}")


if __name__ == "__main__":
    main()
