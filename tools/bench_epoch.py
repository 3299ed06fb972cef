"""End-to-end epoch WALL-rate drive on the real chip (shapes2k @640).

The step-rate benches (bench.py, bench_train.py) time the compiled step in
isolation; this tool measures what a user sees — img/s over whole epochs
including input gather, device augmentation, per-step dispatch, validation,
logging, and checkpointing — and reports it against the isolated step rate
so the wall/step gap (PERF.md round 3: dispatch latency through the axon
tunnel) stays an audited number. A/B lever: --steps-per-dispatch (1 =
per-step dispatch; 0 = trainer auto, lax.scan K steps into one device call).

Reference analog: the engine epoch loop the UI wraps
(/root/reference/src/deal_yolo_data/core/training.py:63-64); its wall rate
IS its step rate because torch dispatch is local. Ours must earn that back
through chunked dispatch.

Usage: python tools/bench_epoch.py [--epochs 6] [--batch 32] [--imgsz 640]
       [--train-n 2016] [--steps-per-dispatch 0] [--val-period 1]
"""

from __future__ import annotations

import argparse
import io
import re
import subprocess
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def ensure_dataset(root: Path, train_n: int, val_n: int, imgsz: int) -> Path:
    out = root / f"shapes{train_n}_{imgsz}"
    if (out / "data.yaml").exists():
        return out
    print(f"[bench_epoch] generating {train_n}+{val_n} synth images @{imgsz} "
          f"-> {out} (one-time, host-bound)")
    subprocess.run(
        [sys.executable, str(Path(__file__).parent / "synth_dataset.py"),
         "--out", str(out), "--train", str(train_n), "--val", str(val_n),
         "--imgsz", str(imgsz)],
        check=True,
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--train-n", type=int, default=2016)
    ap.add_argument("--val-n", type=int, default=300)
    ap.add_argument("--val-period", type=int, default=1)
    ap.add_argument("--steps-per-dispatch", type=int, default=0,
                    help="0 = trainer auto (scan-chunked); 1 = per-step")
    ap.add_argument("--scale", default="n")
    ap.add_argument("--data-root", default="/tmp/dyd_bench")
    args = ap.parse_args()

    data_dir = ensure_dataset(
        Path(args.data_root), args.train_n, args.val_n, args.imgsz)

    from deal_yolo_daya_tpu.train.trainer import train_run

    spd = None if args.steps_per_dispatch == 0 else args.steps_per_dispatch
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

    t0 = time.time()
    with redirect_stdout(Tee()):
        result = train_run(
            f"yolo11{args.scale}", str(data_dir / "data.yaml"),
            epochs=args.epochs, imgsz=args.imgsz, batch=args.batch,
            val_period=args.val_period, steps_per_dispatch=spd,
            cache="device", device_augment=True, time_phases=True,
            project="/tmp/dyd_bench/runs", name="epoch_drive",
            exist_ok=True, workers=2,
        )
    wall = time.time() - t0

    rates = [float(m) for m in re.findall(r"([\d.]+) img/s", buf.getvalue())]
    # steady state: drop epoch 1 (compiles + cache upload ride on it)
    steady = sorted(rates[1:]) if len(rates) > 1 else rates
    med = steady[len(steady) // 2] if steady else 0.0
    step_ms = None
    m = re.search(r"step ([\d.]+) ms", buf.getvalue())
    if m:
        step_ms = float(m.group(1))
    print(
        f"[bench_epoch] scale={args.scale} imgsz={args.imgsz} "
        f"batch={args.batch} spd={'auto' if spd is None else spd} "
        f"val_period={args.val_period}: epochs img/s={['%.0f' % r for r in rates]} "
        f"steady-median={med:.1f} img/s, total wall {wall:.1f} s, "
        f"final mAP50={result.get('metrics', {}).get('map50', float('nan')):.3f}"
    )


if __name__ == "__main__":
    main()
